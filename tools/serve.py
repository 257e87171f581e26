"""HTTP serving of a 1-step distilled sampler (new capability — the
reference has no serving path; this framework targets production serving,
so latency-critical inference is exposed as a service).

  python -m tools.serve --config config/mnist.yaml --model consistency --port 8000

Endpoints:
  GET  /healthz             -> {"status": "ok", "model": ..., "warm": true}
  POST /generate            -> body: hint PNG bytes (grayscale or RGB,
                               resized to im_size); response: sample PNG,
                               X-Latency-Ms header.
  POST /generate?steps=N    -> multi-step consistency sampling.
  POST /generate_batch      -> body: npz with array "hints"
                               (B, im_size, im_size, hint_channels) float32;
                               response: npz with "samples" (B, ..., C).

Serving model: a ThreadingHTTPServer so PNG/npz codec work overlaps across
requests, with a single device lock around generation (one chip, one
in-flight computation — queued requests wait).  Batch shapes are padded up
to the next power-of-two bucket (<= --max-batch) so every request hits one
of a small set of precompiled programs instead of triggering a recompile.
The model is compiled once per bucket at startup (AOT warmup) so request
latency is pure device execution + codec.
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from controlnet_tpu import cli, config as cfg


def build_generator(args, config):
    model_config = cfg.model_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]
    im_channels = model_config["im_channels"]
    im_size = model_config["im_size"]
    # Multi-chip serving: replicate params, shard request batches over the
    # data axis (only buckets divisible by the axis — small buckets stay
    # single-device; the shape-bucketed compile cache handles both).
    mesh = cli.mesh_or_none()

    if args.model == "consistency":
        from controlnet_tpu.models.consistency import ConsistencyDistilled
        from tools.sample_consistency_controlnet_distilled import load_student

        model = ConsistencyDistilled(im_channels, model_config, use_ddpm_teacher=False)
        params = cli.put_replicated(load_student(task_name, model), mesh)

        def generate(hint, key, steps=1):
            return model.generate({"student": params}, hint,
                                  (hint.shape[0], im_size, im_size, im_channels), key, steps)

    elif args.model == "dmd":
        from controlnet_tpu.models.dmd import DistributionMatchingControlNet
        from tools.sample_distribution_matching_controlnet_distilled import load_student

        diffusion_config = cfg.diffusion_params(config)
        T = diffusion_config["num_timesteps"]
        student = DistributionMatchingControlNet(im_channels, model_config)
        params = cli.put_replicated(load_student(task_name, student, use_best=True), mesh)

        def generate(hint, key, steps=1):
            del steps
            b = hint.shape[0]
            x_t = jax.random.normal(key, (b, im_size, im_size, im_channels))
            t = jnp.full((b,), T - 1, jnp.int32)
            return student(params, x_t, t, hint)

    else:
        raise ValueError(f"unknown model {args.model}")

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_data = mesh.shape["data"]
        batch_sh = NamedSharding(mesh, PartitionSpec("data"))
        inner = generate

        def generate(hint, key, steps=1):
            if hint.shape[0] % n_data == 0:  # static shape under jit
                hint = jax.lax.with_sharding_constraint(hint, batch_sh)
            return inner(hint, key, steps)

    gen = jax.jit(generate, static_argnames="steps")
    return gen, im_size, im_channels, model_config["hint_channels"]


def _bucket(b: int, max_batch: int) -> int:
    """Next power-of-two >= b, capped at max_batch (static-shape bucketing).

    The cap is exact: with a non-power-of-two ``max_batch`` the final bucket
    is max_batch itself (never the next power of two above it) — the
    operator's memory cap must not be silently exceeded."""
    n = 1
    while n < b and n * 2 <= max_batch:
        n *= 2
    return n if n >= b else max_batch


def make_server(args, config, warm: bool = True) -> ThreadingHTTPServer:
    """Build the (not yet running) HTTP server; tests drive it in-thread."""
    gen, im_size, im_channels, hint_channels = build_generator(args, config)
    max_batch = getattr(args, "max_batch", 8)
    # Bounded allowlist for the jit-static steps argument: total compiled
    # programs are capped at buckets x max_steps (warmup covers steps=1, the
    # hot path; other allowed values compile once on first use).
    max_steps = getattr(args, "max_steps", 8)

    if warm:
        # AOT warmup: compile every batch bucket before serving (powers of
        # two up to max_batch, plus max_batch itself when it isn't one).
        buckets, b = [], 1
        while b <= max_batch:
            buckets.append(b)
            b *= 2
        if buckets[-1] != max_batch:
            buckets.append(max_batch)
        for b in buckets:
            warm_hint = jnp.zeros((b, im_size, im_size, hint_channels))
            jax.block_until_ready(gen(warm_hint, jax.random.PRNGKey(0), 1))

    device_lock = threading.Lock()
    key_state = {"key": jax.random.PRNGKey(args.seed)}

    def run(hints: np.ndarray, steps: int) -> tuple[np.ndarray, float]:
        """Pad to bucket, generate under the device lock, unpad.  Returns
        (samples, device_latency_ms)."""
        b = hints.shape[0]
        nb = _bucket(b, max_batch)
        if nb != b:
            hints = np.concatenate(
                [hints, np.zeros((nb - b,) + hints.shape[1:], hints.dtype)])
        with device_lock:
            key_state["key"], k = jax.random.split(key_state["key"])
            t0 = time.time()
            out = np.asarray(jax.block_until_ready(gen(jnp.asarray(hints), k, steps)))
            latency_ms = (time.time() - t0) * 1000.0
        return out[:b], latency_ms

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet
            pass

        def _reply(self, code: int, body: bytes, ctype: str, extra: dict | None = None):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (extra or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                body = json.dumps({"status": "ok", "model": args.model,
                                   "warm": warm, "max_batch": max_batch,
                                   "max_steps": max_steps}).encode()
                self._reply(200, body, "application/json")
            else:
                self._reply(404, b"", "text/plain")

        def do_POST(self):
            # steps is a jit static argument: any new value compiles a new
            # program while holding the device lock, so unparseable or
            # out-of-range values are a 400, not a recompile (ADVICE r3).
            # Parsed from the query string by exact name — substring matching
            # would misread e.g. ?num_steps=4.
            from urllib.parse import parse_qs, urlparse

            steps = 1
            qs = parse_qs(urlparse(self.path).query)
            if "steps" in qs:
                try:
                    steps = int(qs["steps"][-1])
                except ValueError:
                    self._reply(400, b"steps must be an integer", "text/plain")
                    return
                if not 1 <= steps <= max_steps:
                    self._reply(
                        400, f"steps must be in [1, {max_steps}]".encode(),
                        "text/plain")
                    return
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)

            if self.path.startswith("/generate_batch"):
                try:
                    with np.load(io.BytesIO(raw)) as z:
                        hints = np.asarray(z["hints"], np.float32)
                except Exception as e:
                    self._reply(400, f"bad npz body: {e}".encode(), "text/plain")
                    return
                if (hints.ndim != 4 or hints.shape[0] < 1
                        or hints.shape[0] > max_batch
                        or hints.shape[1:] != (im_size, im_size, hint_channels)):
                    self._reply(400, f"bad hints shape {hints.shape}".encode(), "text/plain")
                    return
                samples, latency_ms = run(hints, steps)
                buf = io.BytesIO()
                np.savez_compressed(buf, samples=samples)
                self._reply(200, buf.getvalue(), "application/octet-stream",
                            {"X-Latency-Ms": f"{latency_ms:.2f}"})
                return

            if not self.path.startswith("/generate"):
                self._reply(404, b"", "text/plain")
                return
            try:
                img = Image.open(io.BytesIO(raw)).convert("L").resize((im_size, im_size))
            except Exception as e:
                self._reply(400, f"bad image body: {e}".encode(), "text/plain")
                return
            hint = np.asarray(img, np.float32) / 255.0
            hint = np.repeat(hint[None, :, :, None], hint_channels, axis=-1)
            sample, latency_ms = run(hint, steps)

            out = np.clip((sample[0] + 1.0) / 2.0, 0, 1)
            out8 = (out * 255).astype(np.uint8)
            im = Image.fromarray(out8[:, :, 0] if out8.shape[-1] == 1 else out8)
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            self._reply(200, buf.getvalue(), "image/png",
                        {"X-Latency-Ms": f"{latency_ms:.2f}"})

    return ThreadingHTTPServer((args.host, args.port), Handler)


def main(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    server = make_server(args, config)
    print(f"model compiled; serving {args.model} on port {args.port}")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Serve a 1-step distilled sampler over HTTP")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml")
    parser.add_argument("--model", choices=["consistency", "dmd"], default="consistency")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-batch", dest="max_batch", type=int, default=16,
                        help="largest batch bucket (default 16 — the measured "
                             "per-chip throughput optimum, "
                             "docs/artifacts/tpu_batch_sweep_r4.json)")
    parser.add_argument("--max-steps", dest="max_steps", type=int, default=8,
                        help="largest allowed ?steps= value (bounds the jit compile cache)")
    main(parser.parse_args())
