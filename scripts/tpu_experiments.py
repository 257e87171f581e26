"""Serialized TPU perf experiments — ONE process, one device claim.

Runs, in order, on the real chip:
  1. MNIST DDPM 1000-step sampler, batch 64, f32 (baseline)
  2. same with the Pallas attention kernel disabled (XLA attention)
  3. same with bf16 activation compute
  4. bf16 + XLA attention (interaction)
  5. CelebHQ-ish LDM UNet single forward step timing (the big-model case)

Prints one JSON line per experiment.  Run:  python scripts/tpu_experiments.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"),
)

from controlnet_tpu.models.unet import UNet
from controlnet_tpu.sample.ddpm import make_ddpm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule

MNIST_MP = dict(
    im_channels=1, im_size=28, hint_channels=3,
    down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
    down_sample=[True, True, False], time_emb_dim=128,
    num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4,
)

LDM_MP = dict(
    hint_channels=3, down_channels=[256, 384, 512, 768], mid_channels=[768, 512],
    down_sample=[True, True, True], attn_down=[True, True, True],
    time_emb_dim=512, norm_channels=32, num_heads=16, conv_out_channels=128,
    num_down_layers=2, num_mid_layers=2, num_up_layers=2,
)


def bench_sampler(batch: int, steps: int, dtype, tag: str):
    sched = make_linear_schedule(steps, 1e-4, 0.02)
    unet = UNet(1, MNIST_MP)
    params = unet.init(jax.random.PRNGKey(0))
    shape = (batch, 28, 28, 1)
    sampler = make_ddpm_sampler(lambda p, x, t: unet(p, x, t), sched, shape,
                                record_every=steps, compute_dtype=dtype)
    jax.block_until_ready(sampler(params, jax.random.PRNGKey(1))[0])
    t0 = time.time()
    x0, _ = sampler(params, jax.random.PRNGKey(2))
    jax.block_until_ready(x0)
    dt = time.time() - t0
    print(json.dumps({"exp": tag, "samples_per_sec": round(batch / dt, 3),
                      "ms_per_step": round(dt / steps * 1e3, 3)}), flush=True)
    return batch / dt


def bench_ldm_forward(batch: int, dtype, tag: str):
    unet = UNet(4, LDM_MP)
    params = unet.init(jax.random.PRNGKey(0))
    x = jnp.zeros((batch, 32, 32, 4), dtype or jnp.float32)
    t = jnp.zeros((batch,), jnp.int32)
    f = jax.jit(lambda p, x, t: unet(p, x, t))
    jax.block_until_ready(f(params, x, t))
    t0 = time.time()
    for _ in range(10):
        out = f(params, x, t)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / 10
    print(json.dumps({"exp": tag, "ms_per_fwd": round(dt * 1e3, 3),
                      "fwd_per_sec_per_sample": round(1.0 / dt / batch, 4)}), flush=True)


def bench_ldm_controlnet_sampling(batch: int, steps: int, dtype, tag: str):
    """The BASELINE.json north-star config: 1000-step CelebHQ LDM ControlNet
    sampling (latent 32x32x4, full-res canny hint through the strided hint
    encoder)."""
    from controlnet_tpu.models.controlnet import ControlNet

    sched = make_linear_schedule(steps, 0.0015, 0.0195, ldm_scheduler=True)
    cn = ControlNet(4, LDM_MP, model_locked=True, down_sample_factor=32)
    params = cn.init(jax.random.PRNGKey(0))
    shape = (batch, 32, 32, 4)
    hint = jnp.zeros((batch, 1024, 1024, 3), jnp.float32)
    hint_feats = jax.jit(cn.hint_features)(params, hint)  # encoded once
    sampler = make_ddpm_sampler(lambda p, x, t, f: cn(p, x, t, hint_features=f),
                                sched, shape, record_every=steps, compute_dtype=dtype)
    jax.block_until_ready(sampler(params, jax.random.PRNGKey(1), hint_feats)[0])
    t0 = time.time()
    x0, _ = sampler(params, jax.random.PRNGKey(2), hint_feats)
    jax.block_until_ready(x0)
    dt = time.time() - t0
    print(json.dumps({"exp": tag, "samples_per_sec": round(batch / dt, 4),
                      "ms_per_step": round(dt / steps * 1e3, 3),
                      "s_total": round(dt, 2)}), flush=True)


def main():
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    steps = int(os.environ.get("EXP_STEPS", "1000"))
    batch = int(os.environ.get("EXP_BATCH", "64"))

    bench_sampler(batch, steps, None, "mnist_f32_pallas")

    os.environ["CONTROLNET_TPU_DISABLE_PALLAS"] = "1"
    bench_sampler(batch, steps, None, "mnist_f32_xla_attn")

    bench_sampler(batch, steps, jnp.bfloat16, "mnist_bf16_xla_attn")

    del os.environ["CONTROLNET_TPU_DISABLE_PALLAS"]
    bench_sampler(batch, steps, jnp.bfloat16, "mnist_bf16_pallas")

    bench_ldm_forward(16, None, "ldm_fwd_f32_b16")
    bench_ldm_forward(16, jnp.bfloat16, "ldm_fwd_bf16_b16")

    if os.environ.get("EXP_LDM_SAMPLING", "1") == "1":
        lb = int(os.environ.get("EXP_LDM_BATCH", "4"))
        bench_ldm_controlnet_sampling(lb, steps, jnp.bfloat16, "ldm_controlnet_bf16")


if __name__ == "__main__":
    main()
