"""Classifier-free guidance at sampling time.

Additive capability: the reference ships the CFG *training* helpers
(utils/diffusion_utils.py:21-46 — Bernoulli condition dropping) but never
wires them into any trainer or sampler (SURVEY.md component #19: "defined
but never called by any tool").  This module closes the loop: a wrapper
that turns any conditional ``eps_fn(params, x, t, hint)`` into a guided
one, composing unchanged with every sampling loop in ``sample/``
(ancestral, DDIM, DPM-Solver++ — they all consume the same eps_fn
contract) and therefore with the LDM latent path and multi-chip mesh
sharding for free.

Guidance (Ho & Salimans 2022):
    eps = eps_uncond + s * (eps_cond - eps_uncond)
with s the guidance scale (s=1 is the plain conditional model, s=0 the
unconditional one).  The "unconditional" branch is the model evaluated on
the *null* condition — for image/hint conditioning that is the zeroed
hint, exactly the null used by ``drop_image_condition`` during training.

TPU-first shape: the conditional and unconditional branches are evaluated
in ONE model call on a doubled batch (concat along the batch axis), not
two sequential calls — the MXU sees one 2B-batch matmul stream per layer,
which keeps its utilization at the large-batch point of the throughput
envelope instead of paying two half-size dispatches.  Under a mesh the
doubled batch keeps the same data-axis sharding (2B stays divisible
whenever B is).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_cfg_eps_fn(eps_fn: Callable, guidance_scale: float,
                    batched: bool = True) -> Callable:
    """Wrap a conditional ``eps_fn(params, x, t, hint)`` for classifier-free
    guidance.

    The returned function has the SAME signature the samplers expect —
    ``cfg_eps(params, x, t, hint_pair)`` — except the hint argument is now
    a ``(hint_cond, hint_null)`` pair (any matching pytrees: raw hints or
    precomputed hint feature maps).  A tuple is itself a pytree, so the
    samplers' hint plumbing (compute-dtype cast, batch-sharding
    constraints in sample/common.py) applies leaf-wise without changes.

    ``batched=True`` (default) runs both branches in one 2B-batch model
    call; ``batched=False`` runs two B-batch calls — same math, lower peak
    activation memory for batch sizes near the HBM ceiling (the CelebHQ
    1024^2-hint regime, docs/artifacts/tpu_batch_sweep_r4.json).
    """
    scale = float(guidance_scale)

    def cfg_eps(params, x, t, hint_pair):
        hint_cond, hint_null = hint_pair
        if batched:
            x2 = jnp.concatenate([x, x], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            h2 = jax.tree.map(lambda c, u: jnp.concatenate([c, u], axis=0),
                              hint_cond, hint_null)
            eps2 = eps_fn(params, x2, t2, h2)
            eps_c, eps_u = jnp.split(eps2, 2, axis=0)
        else:
            eps_c = eps_fn(params, x, t, hint_cond)
            eps_u = eps_fn(params, x, t, hint_null)
        return eps_u + scale * (eps_c - eps_u)

    return cfg_eps


def null_hint_features(hint_features_fn: Callable, params, hint_shape,
                       batch: int, dtype=jnp.float32):
    """Hint feature maps of the all-zero (null) hint, tiled to ``batch``.

    The null hint is identical for every sample, so the hint encoder runs
    ONCE at batch 1 and the result is broadcast — for the CelebHQ LDM
    ControlNet that skips ``batch-1`` evaluations of the 1024^2 strided
    conv stack.  ``hint_shape`` is the per-sample hint shape (H, W, C).
    """
    null = jnp.zeros((1, *hint_shape), dtype)
    feats = hint_features_fn(params, null)
    reps = (batch,) + (1,) * (feats.ndim - 1)
    return jnp.tile(feats, reps)
