"""Fused multi-head attention kernel for TPU (Pallas/Mosaic).

Workload: spatial-token attention with short sequences (L <= ~1024 tokens)
and SMALL head dims (8..64) — see ops/attention.py.  Two design points:

* The whole (L, L) score matrix for one (batch, head) slice fits VMEM
  (1024^2 f32 = 4 MB), so softmax(QK^T/sqrt(d))V is computed with no HBM
  round-trip for the scores — the entire win at these sizes (the XLA path
  writes ~L^2 * B * H floats of probabilities to HBM per layer).

* q/k/v are laid out TRANSPOSED, (head_dim, L): the lane (last, 128-wide)
  dimension is the long L axis and head_dim sits on sublanes (8/16-wide).
  The naive (L, head_dim) layout pads head_dim 16 -> 128 on the lane axis —
  measured 8x wasted FLOPs + DMA, making the kernel SLOWER than XLA.  With
  the transposed layout both matmuls contract over unpadded dims:
      scores  = q_t^T k_t   : contract head_dim (sublane)
      out_t   = v_t probs^T : contract L_k      (lane)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel_t(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_kv: int, group: int):
    """Each program handles ``group`` (batch, head) slices via an in-kernel
    loop — amortizing per-grid-step overhead (dominant at these tiny
    per-slice shapes) while keeping only one (Lq, Lk) score matrix live in
    VMEM at a time."""

    def body(g, _):
        q = q_ref[g].astype(jnp.float32)  # (dh_p, Lq_p)
        k = k_ref[g].astype(jnp.float32)  # (dh_p, Lk_p)
        v = v_ref[g].astype(jnp.float32)

        # scores (Lq_p, Lk_p): contract the head dim (sublane axis, unpadded)
        scores = jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, dimension=1)
        scores = jnp.where(col < l_kv, scores, -1e30)

        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)

        # out_t (dh_p, Lq_p): contract L_k (lane axis)
        o_ref[g] = jax.lax.dot_general(
            v, probs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, group, body, 0)


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
    d_p = _round_up(d, 16)  # sublane tile (16 covers f32 and bf16)

    def to_t(x, l, l_p):
        # (B, H, L, D) -> (B*H, D_p, L_p), head-dim on sublanes
        xt = x.transpose(0, 1, 3, 2).reshape(b * h, d, l)
        return jnp.pad(xt, ((0, 0), (0, d_p - d), (0, l_p - l)))

    qt, kt, vt = to_t(q, lq, lq_p), to_t(k, lk, lk_p), to_t(v, lk, lk_p)

    # Group slices per program: amortize grid-step overhead, bounded by a
    # VMEM budget (blocks + one live score matrix + softmax intermediate).
    budget = 10 * 1024 * 1024
    scores_bytes = 2 * lq_p * lk_p * 4
    per_slice = (2 * lq_p + 2 * lk_p) * d_p * 4
    group = max(1, min(b * h, (budget - scores_bytes) // max(per_slice, 1)))
    while (b * h) % group != 0:
        group -= 1

    out_t = pl.pallas_call(
        functools.partial(_attn_kernel_t, scale=scale, l_kv=lk, group=group),
        out_shape=jax.ShapeDtypeStruct((b * h, d_p, lq_p), q.dtype),
        grid=((b * h) // group,),
        in_specs=[
            pl.BlockSpec((group, d_p, lq_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, d_p, lk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, d_p, lk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((group, d_p, lq_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (b * h) * (lq_p * lk_p * d_p * 2),
            bytes_accessed=(b * h) * (2 * lq_p + 2 * lk_p) * d_p * 4,
            transcendentals=(b * h) * lq_p * lk_p,
        ),
    )(qt, kt, vt)

    # (B*H, D_p, L_p) -> (B, H, Lq, D)
    out = out_t[:, :d, :lq].reshape(b, h, d, lq).transpose(0, 1, 3, 2)
    return out
