"""Fused multi-head attention kernel for TPU (Pallas/Mosaic).

Workload: spatial-token attention with short sequences (L <= ~1024 tokens,
head_dim 8..128) — see ops/attention.py.  The whole (L, L) score matrix for
one (batch, head) slice fits comfortably in VMEM (1024^2 f32 = 4 MB), so the
kernel computes softmax(QK^T/sqrt(d))V for one slice per grid step with no
HBM round-trip for the scores, which is the entire win at these sizes
(flash-style streaming softmax is unnecessary).

Inputs are padded to TPU tile boundaries (lanes=128) by the wrapper; padded
key tokens are masked to -inf before the softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_kv: int):
    q = q_ref[0].astype(jnp.float32)  # (Lq_pad, D_pad)
    k = k_ref[0].astype(jnp.float32)  # (Lk_pad, D_pad)
    v = v_ref[0].astype(jnp.float32)

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    # Mask padded key tokens.
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
    scores = jnp.where(col < l_kv, scores, -1e30)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)

    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """softmax(QK^T/sqrt(d))V. q: (B, H, Lq, D), k/v: (B, H, Lk, D).

    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU) —
    used by tests to validate the kernel math without TPU hardware."""
    b, h, lq, d = q.shape
    lk = k.shape[2]
    scale = 1.0 / (d**0.5)

    lq_p = _round_up(lq, 128)
    lk_p = _round_up(lk, 128)
    d_p = _round_up(d, 128)

    def pad(x, l_p):
        return jnp.pad(
            x.reshape(b * h, x.shape[2], d),
            ((0, 0), (0, l_p - x.shape[2]), (0, d_p - d)),
        )

    qp, kp, vp = pad(q, lq_p), pad(k, lk_p), pad(v, lk_p)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, l_kv=lk),
        out_shape=jax.ShapeDtypeStruct((b * h, lq_p, d_p), q.dtype),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, lq_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lq_p, d_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * h) * (lq_p * lk_p * d_p + lq_p * lk_p * d_p),
            bytes_accessed=(b * h) * (lq_p + 2 * lk_p + lq_p) * d_p * 4,
            transcendentals=(b * h) * lq_p * lk_p,
        ),
    )(qp, kp, vp)

    return out.reshape(b, h, lq_p, d_p)[:, :, :lq, :d]
