"""HTTP serving of a 1-step distilled sampler or a few-step DDIM teacher
(new capability — the reference has no serving path; this framework targets
production serving, so latency-critical inference is exposed as a service).

  python -m tools.serve --config config/mnist.yaml --model consistency --port 8000

Endpoints:
  GET  /healthz             -> {"status": "ok", "model": ..., "warm": true}
  POST /generate            -> body: hint PNG bytes (grayscale or RGB,
                               resized to im_size); response: sample PNG,
                               X-Latency-Ms header.
  POST /generate?steps=N    -> multi-step consistency sampling, or the
                               solver step count under --model
                               ddim_controlnet / dpm_controlnet.
  POST /generate_batch      -> body: npz with array "hints"
                               (B, im_size, im_size, hint_channels) float32;
                               response: npz with "samples" (B, ..., C).

Serving model: a ThreadingHTTPServer so PNG/npz codec work overlaps across
requests, with a single dispatcher thread owning the device (one chip, one
in-flight computation).  Requests are DYNAMICALLY BATCHED across clients
(VERDICT r4 weak #5): the dispatcher coalesces queued requests with the
same ``steps`` into one device call of up to --max-batch rows — while the
device computes batch k, new arrivals accumulate for batch k+1, so under
concurrent load the chip sees full buckets instead of a serial stream of
single-row calls.  A small arrival window (--batch-window-ms) additionally
lets near-simultaneous requests join one dispatch while the device is
idle.  Batch shapes are padded up to the next power-of-two bucket
(<= --max-batch) so every request hits one of a small set of precompiled
programs instead of triggering a recompile.  The model is compiled once
per bucket at startup (AOT warmup) so request latency is pure device
execution + codec.
"""

from __future__ import annotations

import argparse
import collections
import io
import json
import queue
import threading
import time
from dataclasses import dataclass, field
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

    elif args.model in ("ddim_controlnet", "dpm_controlnet"):
        # Few-step serving of the (non-distilled) DDPM ControlNet teacher
        # checkpoint: no extra training required — the same ckpt the
        # 1000-step sample tools use, at ?steps= model evaluations per image.
        # ``steps`` is jit-static, so building the sampler (sample/ddim.py
        # DDIM eta=0 or sample/dpm.py DPM-Solver++ 2M) happens at trace time
        # and its inner jit inlines; hint features are hoisted out of the
        # scan by the factory contract.
        from controlnet_tpu.models.controlnet import ControlNet
        from controlnet_tpu.sample import make_few_step_sampler
        from controlnet_tpu.schedules.linear import make_linear_schedule
        from tools.train_ddpm_controlnet import load_controlnet_params

        diffusion_config = cfg.diffusion_params(config)
        sched = make_linear_schedule(diffusion_config["num_timesteps"],
                                     diffusion_config["beta_start"],
                                     diffusion_config["beta_end"])
        cn = ControlNet(im_channels, model_config, model_locked=True)
        params = cli.put_replicated(
            load_controlnet_params(task_name, train_config["controlnet_ckpt_name"],
                                   cn, fallback_unet_ckpt=train_config["ddpm_ckpt_name"]),
            mesh)
        solver = args.model.split("_")[0]  # "ddim" | "dpm"

        def generate(hint, key, steps=1):
            feats = cn.hint_features(params, hint)
            sampler = make_few_step_sampler(
                solver, lambda p, x, t, f: cn(p, x, t, hint_features=f), sched,
                (hint.shape[0], im_size, im_size, im_channels), num_steps=steps)
            x0, _traj = sampler(params, key, feats)  # traj unused -> DCE'd
            # clamp to the image range like the sample tools' artifacts (few-
            # step x0 estimates can slightly overshoot)
            return jnp.clip(x0, -1.0, 1.0)

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

    # Teacher solvers walk a subsequence of the diffusion schedule, so steps
    # can never exceed num_timesteps — report that cap so the handler can
    # 400 out-of-range requests instead of 500ing inside jit tracing.
    steps_cap = (cfg.diffusion_params(config)["num_timesteps"]
                 if args.model.endswith("_controlnet") else None)
    gen = jax.jit(generate, static_argnames="steps")
    return gen, im_size, im_channels, model_config["hint_channels"], steps_cap


def _bucket(b: int, max_batch: int) -> int:
    """Next power-of-two >= b, capped at max_batch (static-shape bucketing).

    The cap is exact: with a non-power-of-two ``max_batch`` the final bucket
    is max_batch itself (never the next power of two above it) — the
    operator's memory cap must not be silently exceeded."""
    n = 1
    while n < b and n * 2 <= max_batch:
        n *= 2
    return n if n >= b else max_batch


@dataclass
class _Request:
    """One client's generation request, parked until its batch resolves."""

    hints: np.ndarray  # (n, H, W, C)
    steps: int
    event: threading.Event = field(default_factory=threading.Event)
    samples: np.ndarray | None = None
    latency_ms: float = 0.0
    batch_rows: int = 0
    error: Exception | None = None
    cancelled: bool = False  # submit() timed out; do not spend device time


class _MicroBatcher:
    """Cross-request dynamic batching in front of one device.

    One dispatcher thread pulls requests off a queue and coalesces those
    with the same jit-static ``steps`` value into a single device call of
    up to ``max_batch`` rows.  Two mechanisms fill batches:

    * backpressure coalescing: while the device executes batch k, arrivals
      queue up and are drained (non-blocking) into batch k+1 — this is
      where the throughput win under sustained concurrency comes from and
      costs idle requests nothing;
    * an arrival window: after the first request of a batch, up to
      ``window_ms`` is spent waiting for near-simultaneous requests so a
      burst hitting an idle device still shares one dispatch (0 disables).

    Requests that don't fit the current batch (different steps, or rows
    would exceed max_batch) are deferred in FIFO order to the next batch.
    """

    def __init__(self, run_fn, max_batch: int, window_ms: float):
        self._run = run_fn
        self._max_batch = max_batch
        self._window_s = max(0.0, window_ms) / 1000.0
        self._queue: queue.Queue = queue.Queue()
        self._pending: collections.deque = collections.deque()
        self._drain_lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="serve-microbatcher")
        self._thread.start()

    def stop(self) -> None:
        self._stop = True
        self._thread.join(timeout=5.0)
        # Fail any still-parked requests instead of leaving their handler
        # threads (and clients) to sit out the full submit timeout.
        self._fail_parked()

    def _fail_parked(self) -> None:
        """Complete every queued/pending request with a shutdown error.
        Lock-guarded so stop() and late submit() calls can both drain
        without double-completing a request."""
        with self._drain_lock:
            leftovers = list(self._pending)
            self._pending.clear()
            while True:
                try:
                    leftovers.append(self._queue.get_nowait())
                except queue.Empty:
                    break
        for r in leftovers:
            r.error = RuntimeError("server shutting down")
            r.event.set()

    def submit(self, hints: np.ndarray, steps: int,
               timeout: float = 600.0) -> tuple[np.ndarray, float, int]:
        """Enqueue and block until the batch containing this request ran.
        Returns (samples, device_latency_ms, dispatched_batch_rows)."""
        if self._stop:
            raise RuntimeError("server shutting down")
        req = _Request(hints, steps)
        self._queue.put(req)
        if self._stop:
            # stop() may have run its drain between the check above and the
            # put — with the dispatcher gone, nothing else would ever
            # complete this request; drain again so it fails fast instead
            # of sitting out the full timeout (handler threads keep running
            # through server_close under ThreadingHTTPServer).
            self._fail_parked()
        if not req.event.wait(timeout):
            # Mark dead so the dispatcher sheds it instead of burning a
            # device call on a result nobody will read (self-sustaining
            # backlog under overload otherwise).
            req.cancelled = True
            raise TimeoutError("generation timed out in the batching queue")
        if req.error is not None:
            raise req.error
        return req.samples, req.latency_ms, req.batch_rows

    # ---- dispatcher thread ----
    def _loop(self) -> None:
        pending = self._pending
        while not self._stop:
            if pending:
                head = pending.popleft()
            else:
                try:
                    head = self._queue.get(timeout=0.1)
                except queue.Empty:
                    continue
            if head.cancelled:
                continue
            group, rows = [head], head.hints.shape[0]
            deferred = []
            deadline = time.monotonic() + self._window_s
            while rows < self._max_batch:
                if pending:
                    nxt = pending.popleft()
                else:
                    remaining = deadline - time.monotonic()
                    try:
                        # drain immediately-available items even after the
                        # window closed (block=False); they are already here
                        nxt = self._queue.get(block=remaining > 0,
                                              timeout=max(remaining, 0.0))
                    except queue.Empty:
                        break
                if nxt.cancelled:
                    continue
                if (nxt.steps != head.steps
                        or rows + nxt.hints.shape[0] > self._max_batch):
                    deferred.append(nxt)
                    continue
                group.append(nxt)
                rows += nxt.hints.shape[0]
            pending.extendleft(reversed(deferred))
            self._dispatch(group, rows)

    def _dispatch(self, group: list, rows: int) -> None:
        try:
            hints = (group[0].hints if len(group) == 1
                     else np.concatenate([r.hints for r in group]))
            samples, latency_ms = self._run(hints, group[0].steps)
            off = 0
            for r in group:
                n = r.hints.shape[0]
                r.samples = samples[off:off + n]
                off += n
                r.latency_ms = latency_ms
                r.batch_rows = rows
                r.event.set()
        except Exception as e:  # surfaced per request as a 500
            for r in group:
                r.error = e
                r.event.set()


def make_server(args, config, warm: bool = True) -> ThreadingHTTPServer:
    """Build the (not yet running) HTTP server; tests drive it in-thread."""
    gen, im_size, im_channels, hint_channels, steps_cap = build_generator(args, config)
    max_batch = getattr(args, "max_batch", 8)
    # Bounded allowlist for the jit-static steps argument: total compiled
    # programs are capped at buckets x max_steps (warmup covers steps=1, the
    # hot path; other allowed values compile once on first use).  For the
    # few-step teacher models the schedule length is a hard cap on top of
    # the operator's --max-steps (a ladder cannot exceed num_timesteps).
    max_steps = getattr(args, "max_steps", 8)
    if steps_cap is not None:
        max_steps = min(max_steps, steps_cap)

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

    key_state = {"key": jax.random.PRNGKey(args.seed)}

    def run(hints: np.ndarray, steps: int) -> tuple[np.ndarray, float]:
        """Pad to bucket, generate, unpad.  Only the batcher's dispatcher
        thread calls this, so device access is single-flight by
        construction.  Returns (samples, device_latency_ms)."""
        b = hints.shape[0]
        nb = _bucket(b, max_batch)
        if nb != b:
            hints = np.concatenate(
                [hints, np.zeros((nb - b,) + hints.shape[1:], hints.dtype)])
        key_state["key"], k = jax.random.split(key_state["key"])
        t0 = time.time()
        out = np.asarray(jax.block_until_ready(gen(jnp.asarray(hints), k, steps)))
        latency_ms = (time.time() - t0) * 1000.0
        return out[:b], latency_ms

    # --no-dynamic-batching: coalescing cap 1 = the pre-round-5 behavior
    # (every request its own serialized device call); the A/B control for
    # scripts/tpu_serve_bench.py and an operational escape hatch.
    coalesce_cap = max_batch if getattr(args, "dynamic_batching", True) else 1
    batcher = _MicroBatcher(run, coalesce_cap,
                            getattr(args, "batch_window_ms", 2.0))

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
                                   "max_steps": max_steps,
                                   "batch_window_ms": getattr(
                                       args, "batch_window_ms", 2.0)}).encode()
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
                try:
                    samples, latency_ms, rows = batcher.submit(hints, steps)
                except Exception as e:
                    self._reply(500, f"generation failed: {e}".encode(), "text/plain")
                    return
                buf = io.BytesIO()
                np.savez_compressed(buf, samples=samples)
                self._reply(200, buf.getvalue(), "application/octet-stream",
                            {"X-Latency-Ms": f"{latency_ms:.2f}",
                             "X-Batch-Rows": str(rows)})
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
            try:
                sample, latency_ms, rows = batcher.submit(hint, steps)
            except Exception as e:
                self._reply(500, f"generation failed: {e}".encode(), "text/plain")
                return

            out = np.clip((sample[0] + 1.0) / 2.0, 0, 1)
            out8 = (out * 255).astype(np.uint8)
            im = Image.fromarray(out8[:, :, 0] if out8.shape[-1] == 1 else out8)
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            self._reply(200, buf.getvalue(), "image/png",
                        {"X-Latency-Ms": f"{latency_ms:.2f}",
                         "X-Batch-Rows": str(rows)})

    class Server(ThreadingHTTPServer):
        def server_close(self):
            batcher.stop()
            super().server_close()

    return Server((args.host, args.port), Handler)


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
    parser.add_argument("--model",
                        choices=["consistency", "dmd", "ddim_controlnet",
                                 "dpm_controlnet"],
                        default="consistency",
                        help="distilled 1-step students, or ddim_controlnet / "
                             "dpm_controlnet: few-step sampling from the "
                             "non-distilled ControlNet teacher ckpt (?steps= "
                             "= solver step count; dpm is second-order — "
                             "matched quality at roughly half the DDIM steps; "
                             "raise --max-steps for quality-critical serving)")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-batch", dest="max_batch", type=int, default=16,
                        help="largest batch bucket (default 16 — the measured "
                             "per-chip throughput optimum, "
                             "docs/artifacts/tpu_batch_sweep_r4.json)")
    parser.add_argument("--max-steps", dest="max_steps", type=int, default=8,
                        help="largest allowed ?steps= value (bounds the jit compile cache)")
    parser.add_argument("--no-dynamic-batching", dest="dynamic_batching",
                        action="store_false",
                        help="serialize one request per device call "
                             "(pre-round-5 behavior; A/B control)")
    parser.add_argument("--batch-window-ms", dest="batch_window_ms", type=float,
                        default=2.0,
                        help="arrival window for cross-request dynamic batching: "
                             "after the first request of a batch, wait up to this "
                             "long for more before dispatching (0 disables; "
                             "coalescing while the device is busy always happens)")
    main(parser.parse_args())
