"""Minimal HTTP serving of a 1-step distilled sampler (new capability —
the reference has no serving path; this framework targets production
serving, so latency-critical inference is exposed as a service).

  python -m tools.serve --config config/mnist.yaml --model consistency --port 8000

Endpoints:
  GET  /healthz            -> {"status": "ok", "model": ..., "warm": true}
  POST /generate           -> body: hint PNG bytes (grayscale or RGB,
                              resized to im_size); response: sample PNG.
  POST /generate?steps=N   -> multi-step consistency sampling.

The model is compiled once at startup (AOT warmup) so request latency is
pure device execution + PNG codec.
"""

from __future__ import annotations

import argparse
import io
import json
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

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

    if args.model == "consistency":
        from controlnet_tpu.models.consistency import ConsistencyDistilled
        from tools.sample_consistency_controlnet_distilled import load_student

        model = ConsistencyDistilled(im_channels, model_config, use_ddpm_teacher=False)
        params = load_student(task_name, model)

        def generate(hint, key, steps=1):
            return model.generate({"student": params}, hint,
                                  (hint.shape[0], im_size, im_size, im_channels), key, steps)

        gen = jax.jit(generate, static_argnames="steps")
    elif args.model == "dmd":
        from controlnet_tpu.models.dmd import DistributionMatchingControlNet
        from tools.sample_distribution_matching_controlnet_distilled import load_student

        diffusion_config = cfg.diffusion_params(config)
        T = diffusion_config["num_timesteps"]
        student = DistributionMatchingControlNet(im_channels, model_config)
        params = load_student(task_name, student, use_best=True)

        def generate(hint, key, steps=1):
            del steps
            b = hint.shape[0]
            x_t = jax.random.normal(key, (b, im_size, im_size, im_channels))
            t = jnp.full((b,), T - 1, jnp.int32)
            return student(params, x_t, t, hint)

        gen = jax.jit(generate, static_argnames="steps")
    else:
        raise ValueError(f"unknown model {args.model}")

    return gen, im_size, im_channels, model_config["hint_channels"]


def main(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    gen, im_size, im_channels, hint_channels = build_generator(args, config)

    # AOT warmup: compile before serving.
    warm_hint = jnp.zeros((1, im_size, im_size, hint_channels))
    jax.block_until_ready(gen(warm_hint, jax.random.PRNGKey(0), 1))
    print(f"model compiled; serving {args.model} on port {args.port}")

    key_holder = {"key": jax.random.PRNGKey(args.seed)}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet
            pass

        def do_GET(self):
            if self.path.startswith("/healthz"):
                body = json.dumps({"status": "ok", "model": args.model, "warm": True}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self.send_response(404)
                self.end_headers()

        def do_POST(self):
            if not self.path.startswith("/generate"):
                self.send_response(404)
                self.end_headers()
                return
            steps = 1
            if "steps=" in self.path:
                steps = max(1, int(self.path.split("steps=")[1].split("&")[0]))
            length = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(length)
            img = Image.open(io.BytesIO(raw)).convert("L").resize((im_size, im_size))
            hint = np.asarray(img, np.float32) / 255.0
            hint = np.repeat(hint[None, :, :, None], hint_channels, axis=-1)

            key_holder["key"], k = jax.random.split(key_holder["key"])
            t0 = time.time()
            sample = np.asarray(jax.block_until_ready(gen(jnp.asarray(hint), k, steps)))
            latency_ms = (time.time() - t0) * 1000.0

            out = np.clip((sample[0] + 1.0) / 2.0, 0, 1)
            out8 = (out * 255).astype(np.uint8)
            im = Image.fromarray(out8[:, :, 0] if out8.shape[-1] == 1 else out8)
            buf = io.BytesIO()
            im.save(buf, format="PNG")
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("X-Latency-Ms", f"{latency_ms:.2f}")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    server = HTTPServer((args.host, args.port), Handler)
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
    main(parser.parse_args())
