"""Root-level DMD smoke script (parity with the reference's
test_distribution_matching.py:19-163 — run directly via
``python test_distribution_matching.py``; the real CI lives in tests/).

Checks, mirroring the reference's four:
  1. DistributionMatchingControlNet forward output shape on random tensors
  2. Distilled wrapper construction (random teacher when no checkpoint)
  3. distillation_loss returns a finite, differentiable scalar
  4. parameter-count ratio student vs ControlNet stays in a sane band

Prints check marks and a summary banner; returns booleans rather than
asserting, like the reference.  Pass ``--tiny`` to run on a small config
(seconds on CPU) instead of the full mnist config.
"""

import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS", ""))

import jax
import jax.numpy as jnp

from controlnet_tpu import config as cfg
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.dmd import (
    DistributionMatchingControlNet,
    DistributionMatchingDistilled,
)

TINY = dict(im_channels=1, im_size=8, hint_channels=3,
            down_channels=[8, 16, 16], mid_channels=[16, 16],
            down_sample=[True, False], time_emb_dim=8,
            num_down_layers=1, num_mid_layers=1, num_up_layers=1, num_heads=2)


def test_distribution_matching_model(mp):
    print("Testing DistributionMatchingControlNet forward...")
    im, size = mp["im_channels"], mp["im_size"]
    model = DistributionMatchingControlNet(im, mp)
    p = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, size, size, im))
    hint = jnp.zeros((2, size, size, mp["hint_channels"]))
    out = jax.jit(lambda p, x, t, h: model(p, x, t, h))(p, x, jnp.array([5, 9]), hint)
    ok = out.shape == x.shape and bool(jnp.all(jnp.isfinite(out)))
    print(("✓" if ok else "✗") + f" forward shape {out.shape}")
    return ok


def test_distilled_wrapper_and_loss(mp):
    print("Testing DistributionMatchingDistilled + distillation_loss...")
    im, size = mp["im_channels"], mp["im_size"]
    model = DistributionMatchingDistilled(im, mp)
    p = model.init(jax.random.PRNGKey(0))
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (2, size, size, im), minval=-1, maxval=1)
    hint = jnp.zeros((2, size, size, mp["hint_channels"]))
    t = jnp.array([5, 9])

    def loss_fn(student):
        total, *_ = model.distillation_loss({**p, "student": student}, x0 + 0.1, t, hint, x0)
        return total

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p["student"])
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(grads))))
    ok = bool(jnp.isfinite(loss)) and gnorm > 0
    print(("✓" if ok else "✗") + f" distillation_loss {float(loss):.4f}, grad norm {gnorm:.4f}")
    return ok


def test_model_compatibility(mp):
    print("Testing student/ControlNet parameter-count compatibility...")
    im = mp["im_channels"]
    cn = ControlNet(im, mp)
    st = DistributionMatchingControlNet(im, mp)
    n_cn = sum(a.size for a in jax.tree.leaves(cn.init(jax.random.PRNGKey(0))))
    n_st = sum(a.size for a in jax.tree.leaves(st.init(jax.random.PRNGKey(0))))
    ratio = n_st / n_cn
    ok = 0.3 < ratio < 1.2
    mark = "✓" if ok else "✗"
    print(f"{mark} ControlNet params {n_cn:,} | student params {n_st:,} | ratio {ratio:.2f}")
    if not (0.9 <= ratio <= 1.1):
        print("  (note: student ~= one UNet; ControlNet carries a frozen trunk + control copy)")
    return ok


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--tiny", action="store_true", help="small config (fast on CPU)")
    parser.add_argument("--config", default="config/mnist.yaml")
    args = parser.parse_args()

    mp = TINY if args.tiny else cfg.model_params(cfg.load_config(args.config))

    results = [
        test_distribution_matching_model(mp),
        test_distilled_wrapper_and_loss(mp),
        test_model_compatibility(mp),
    ]
    print("=" * 50)
    if all(results):
        print("All distribution-matching checks passed ✓")
        sys.exit(0)
    print("Some checks FAILED ✗")
    sys.exit(1)
