"""Serialized TPU perf experiments for the transposed-layout (TL) path —
ONE process, one device claim (the shared chip wedges if claims overlap).

A/Bs the channel-padding fix (ops/tl_conv.py + ops/pallas_conv.py) on the
flagship MNIST DDPM 1000-step sampler and on the north-star CelebHQ LDM
ControlNet config.  Prints one JSON line per experiment.

Run:  python scripts/tpu_tl_bench.py            (full set)
      python scripts/tpu_tl_bench.py mnist      (mnist-only)
      python scripts/tpu_tl_bench.py ldm        (ldm-only)
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

from controlnet_tpu.models.controlnet import ControlNet
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

BATCH = 64
STEPS = 1000


def _time(fn, *args):
    jax.block_until_ready(fn(*args)[0])  # compile
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out[0])
    return time.time() - t0


def report(tag: str, batch: int, dt: float, steps: int = STEPS):
    print(json.dumps({
        "experiment": tag,
        "samples_per_sec_chip": round(batch / dt, 3),
        "ms_per_step": round(1000.0 * dt / steps, 4),
    }), flush=True)


def mnist_case(tag: str, tl: bool, dtype, disable_pallas_conv: bool = False):
    if disable_pallas_conv:
        os.environ["CONTROLNET_TPU_DISABLE_PALLAS_CONV"] = "1"
    else:
        os.environ.pop("CONTROLNET_TPU_DISABLE_PALLAS_CONV", None)
    sched = make_linear_schedule(STEPS, 1e-4, 0.02)
    unet = UNet(1, MNIST_MP)
    params = unet.init(jax.random.PRNGKey(0))
    fwd = unet.forward_tl if tl else unet.__call__
    sampler = make_ddpm_sampler(lambda p, x, t: fwd(p, x, t), sched,
                                (BATCH, 28, 28, 1), record_every=STEPS,
                                compute_dtype=dtype)
    dt = _time(sampler, params, jax.random.PRNGKey(1))
    report(tag, BATCH, dt)


def ldm_case(tag: str, tl: bool, dtype=jnp.bfloat16):
    nb = 4
    sched = make_linear_schedule(STEPS, 0.0015, 0.0195, ldm_scheduler=True)
    cn = ControlNet(4, LDM_MP, model_locked=True, down_sample_factor=32)
    params = cn.init(jax.random.PRNGKey(0))
    hint = jnp.zeros((nb, 1024, 1024, 3))
    feats = jax.jit(cn.hint_features)(params, hint)
    fwd = cn.forward_tl if tl else cn.__call__
    sampler = make_ddpm_sampler(
        lambda p, x, t, f: fwd(p, x, t, hint_features=f),
        sched, (nb, 32, 32, 4), record_every=STEPS, compute_dtype=dtype,
    )
    dt = _time(sampler, params, jax.random.PRNGKey(1), feats)
    report(tag, nb, dt)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(json.dumps({"devices": [str(d) for d in jax.devices()]}), flush=True)
    if which in ("all", "mnist"):
        mnist_case("mnist_nhwc_f32", tl=False, dtype=None)
        mnist_case("mnist_tl_xla_f32", tl=True, dtype=None, disable_pallas_conv=True)
        mnist_case("mnist_tl_pallas_f32", tl=True, dtype=None)
        mnist_case("mnist_tl_pallas_bf16", tl=True, dtype=jnp.bfloat16)
        mnist_case("mnist_tl_xla_bf16", tl=True, dtype=jnp.bfloat16, disable_pallas_conv=True)
    if which in ("all", "ldm"):
        ldm_case("ldm_cn_nhwc_bf16", tl=False)
        ldm_case("ldm_cn_tl_bf16", tl=True)


if __name__ == "__main__":
    main()
