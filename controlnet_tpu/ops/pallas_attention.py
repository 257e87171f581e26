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

from controlnet_tpu import tuning


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _attn_kernel_t(q_ref, k_ref, v_ref, o_ref, *, scale: float, l_q: int,
                   l_kv: int, group: int):
    """Each program handles ``group`` (batch, head) slices via an in-kernel
    loop — amortizing per-grid-step overhead (dominant at these tiny
    per-slice shapes) while keeping only one (Lq, Lk) score matrix live in
    VMEM at a time.

    Pad-column handling: scores at columns >= l_kv are set to -1e30 via an
    iota-generated mask (jnp.where fuses into the VPU passes — no slice
    copies; a static slice scores[:, :l_kv] with l_kv=784 materialized an
    unaligned 896-lane copy per reduction and blew the 16MB scoped-VMEM
    stack in the backward kernel).  With the finite mask the row max m is
    the true valid max, exp(-1e30 - m) underflows to exactly 0, the
    denominator is >= exp(0) = 1 (no NaN for arbitrarily negative valid
    scores — ADVICE round 2), and pad columns of probs are exactly 0.
    Only the l_q valid rows (sublane granule 8) enter the softmax.
    """
    lq_p = q_ref.shape[2]
    rows = l_q if (l_q % 8 == 0) else lq_p

    # Operands are upcast to f32: keeping bf16 inputs bf16 through the MXU
    # was A/B-tested (round 2) and is perf-neutral at every model shape
    # here — the kernel is bound by the small-K output traversal and the
    # VPU softmax, not matmul rate — so the higher-precision form stays.

    def _scores(g):
        q = q_ref[g].astype(jnp.float32)  # (dh_p, Lq_p)
        k = k_ref[g].astype(jnp.float32)  # (dh_p, Lk_p)
        return jax.lax.dot_general(
            q[:, :rows], k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale

    def _finish(g, scores):
        if l_kv < scores.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < l_kv, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        probs = e / denom
        v = v_ref[g].astype(jnp.float32)
        # out_t (dh_p, rows): contract L_k (lane axis)
        o_ref[g, :, :rows] = jax.lax.dot_general(
            v, probs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)

    if tuning.get("attn_pipe") and group > 1:
        # software-pipelined unrolled body: slice g+1's MXU scores matmul is
        # independent of slice g's VPU softmax, so the fully unrolled
        # dataflow lets the Mosaic scheduler overlap the units.
        s_prev = _scores(0)
        for g in range(1, group):
            s_cur = _scores(g)
            _finish(g - 1, s_prev)
            s_prev = s_cur
        _finish(group - 1, s_prev)
    else:
        def body(g, _):
            _finish(g, _scores(g))
            return 0

        jax.lax.fori_loop(0, group, body, 0)


def _attn_bwd_kernel_t(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                       *, scale: float, l_kv: int, group: int, chunk: int):
    """Backward: recompute probs (cheap at these sizes, avoids storing the
    (Lq, Lk) matrix as a residual), then the standard softmax-attention
    gradients, all in the transposed (head_dim, L) layout.

    Uses the same iota-masked softmax as the forward (pad columns -> -1e30
    before the reductions) so the recomputed probs match the forward
    bit-for-bit; pad columns of probs are exactly 0, so dv/dk pad lanes and
    dq contributions from the pad region vanish.

    The query axis is processed in ``chunk``-row chunks (dk/dv accumulate
    across chunks; each chunk owns its dq rows).  The software pipeline
    keeps two (chunk, Lk) score/dP pairs live — at L = 1024 the unchunked
    pipeline held 4 full 4 MB matrices (16 MB) and blew the 16 MB
    scoped-VMEM stack limit; chunking bounds the live set regardless of
    sequence length."""
    lq_p = q_ref.shape[2]
    n_chunks = lq_p // chunk

    def _bwd_scores(g, c):
        q = q_ref[g][:, c * chunk:(c + 1) * chunk].astype(jnp.float32)  # (d_p, chunk)
        k = k_ref[g].astype(jnp.float32)                                # (d_p, Lk_p)
        scores = jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        dp = jax.lax.dot_general(  # dP (chunk, Lk) = dO_c^T V — contract head dim
            do_ref[g][:, c * chunk:(c + 1) * chunk].astype(jnp.float32),
            v_ref[g].astype(jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        return scores, dp

    def _bwd_finish(g, c, scores, dp):
        sl = slice(c * chunk, (c + 1) * chunk)
        q = q_ref[g][:, sl].astype(jnp.float32)
        k = k_ref[g].astype(jnp.float32)
        do = do_ref[g][:, sl].astype(jnp.float32)  # (d_p, chunk)

        if l_kv < scores.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < l_kv, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        probs = e / denom  # (chunk, Lk_p)

        # dV_t (d, Lk) = dO_c (d, chunk) @ P_c (chunk, Lk) — accumulated
        dv_c = jax.lax.dot_general(
            do, probs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)

        ds = probs * (dp - jnp.sum(dp * probs, axis=-1, keepdims=True))

        # dQ_t (d, chunk) = scale * K_t (d, Lk) @ dS_c^T (Lk, chunk)
        dq_ref[g, :, sl] = (scale * jax.lax.dot_general(
            k, ds, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )).astype(dq_ref.dtype)
        # dK_t (d, Lk) = scale * Q_c (d, chunk) @ dS_c (chunk, Lk) — accumulated
        dk_c = (scale * jax.lax.dot_general(
            q, ds, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )).astype(dk_ref.dtype)
        if c == 0:
            dv_ref[g] = dv_c
            dk_ref[g] = dk_c
        else:
            dv_ref[g] = dv_ref[g] + dv_c
            dk_ref[g] = dk_ref[g] + dk_c

    units = [(g, c) for g in range(group) for c in range(n_chunks)]
    if tuning.get("attn_pipe") and len(units) > 1:
        # same software pipeline as the forward: unit u+1's MXU matmuls
        # (scores, dP) overlap unit u's VPU softmax/ds work.
        prev_u, prev = units[0], _bwd_scores(*units[0])
        for u in units[1:]:
            cur = _bwd_scores(*u)
            _bwd_finish(*prev_u, *prev)
            prev_u, prev = u, cur
        _bwd_finish(*prev_u, *prev)
    else:
        def body(g, _):
            for c in range(n_chunks):
                scores, dp = _bwd_scores(g, c)
                _bwd_finish(g, c, scores, dp)
            return 0

        jax.lax.fori_loop(0, group, body, 0)


def _dims_t(qt, kt):
    b, h, d, lq = qt.shape
    lk = kt.shape[3]
    return b, h, lq, lk, d, _round_up(lq, 128), _round_up(lk, 128), _round_up(d, 16)


def _pad_t(x4, l_p, d_p):
    """(B, H, dh, L) -> padded (B*H, d_p, L_p) — reshape only, no transpose."""
    b, h, d, l = x4.shape
    return jnp.pad(x4.reshape(b * h, d, l), ((0, 0), (0, d_p - d), (0, l_p - l)))


def _unpad_t(xt, b, h, l, d):
    return xt[:, :d, :l].reshape(b, h, d, l)


# Grouping, swept END-TO-END on the MNIST 1000-step sampler (v5e, round 2):
# with the sequential fori_loop body the group size is perf-neutral up to
# ~8 and worse beyond (9.8 samples/s at 1-4, 8.9 at 64) — but with the
# software-PIPELINED unrolled body (slice g+1's MXU scores matmul overlaps
# slice g's VPU softmax) group=2 -> 13.2 and group=4 -> 13.3 samples/s, a
# 35% end-to-end model win; group=8 regresses (12.3, VMEM pressure).  So:
# pipeline by default, cap the group at 4, and size the budget so the hot
# shapes (L<=1024) actually reach group 4.
# Budget/cap are knobs (tuning.attn_vmem_bytes / attn_group_cap), read at
# trace time by _pick_group.


def _pick_chunk(lq_p: int, lk_p: int) -> int:
    """Query-chunk rows for the backward kernel.  Small score matrices run
    unchunked (the proven round-2 configuration); above 3.5 MB the pipelined
    live set (two score/dP pairs) would exceed the 16 MB scoped-VMEM stack,
    so pick the largest 128-multiple divisor of lq_p whose (chunk, Lk)
    chunk stays under 2 MB f32."""
    if lq_p * lk_p * 4 <= int(3.5 * 1024 * 1024):
        return lq_p
    for chunk in range(lq_p, 0, -128):
        if lq_p % chunk == 0 and chunk * lk_p * 4 <= 2 * 1024 * 1024:
            return chunk
    return 128


def _pick_group(bh: int, lq_p: int, lk_p: int, d_p: int, n_bufs: int) -> int:
    """Largest divisor of bh, capped at tuning.attn_group_cap, whose
    double-buffered blocks + live score matrices fit the VMEM budget."""
    scores_bytes = 3 * lq_p * lk_p * 4
    per_slice = 2 * n_bufs * (lq_p + lk_p) * d_p * 4  # x2: double buffering
    group = max(1, min(bh, tuning.get("attn_group_cap"),
                       (tuning.get("attn_vmem_bytes") - scores_bytes)
                       // max(per_slice, 1)))
    while bh % group != 0:
        group -= 1
    return group


@functools.lru_cache(maxsize=2)
def _make_fused_attention_t(interpret: bool):
    @jax.custom_vjp
    def f(qt, kt, vt):
        return _fused_attention_fwd_impl(qt, kt, vt, interpret)

    def fwd(qt, kt, vt):
        return _fused_attention_fwd_impl(qt, kt, vt, interpret), (qt, kt, vt)

    def bwd(res, dout):
        return _fused_attention_bwd(interpret, res, dout)

    f.defvjp(fwd, bwd)
    return f


def fused_attention_t(qt: jax.Array, kt: jax.Array, vt: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Transposed-layout attention core: qt/kt/vt are (B, H, dh, L) — the
    layout the kernel wants natively (head_dim on sublanes), so producing
    it straight from the projection einsum avoids any copies.  Returns
    (B, H, dh, Lq).  Differentiable (custom VJP, Pallas backward)."""
    return _make_fused_attention_t(bool(interpret))(qt, kt, vt)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """softmax(QK^T/sqrt(d))V. q: (B, H, Lq, D), k/v: (B, H, Lk, D).

    Convenience wrapper over ``fused_attention_t`` (transposes at the
    boundary; gradients flow through the transposes)."""
    out_t = fused_attention_t(
        q.transpose(0, 1, 3, 2), k.transpose(0, 1, 3, 2), v.transpose(0, 1, 3, 2),
        interpret,
    )
    return out_t.transpose(0, 1, 3, 2)


def _fused_attention_fwd_impl(qt4, kt4, vt4, interpret):
    b, h, lq, lk, d, lq_p, lk_p, d_p = _dims_t(qt4, kt4)
    scale = 1.0 / (d**0.5)
    qt, kt, vt = _pad_t(qt4, lq_p, d_p), _pad_t(kt4, lk_p, d_p), _pad_t(vt4, lk_p, d_p)
    group = _pick_group(b * h, lq_p, lk_p, d_p, n_bufs=2)

    out_t = pl.pallas_call(
        functools.partial(_attn_kernel_t, scale=scale, l_q=lq, l_kv=lk, group=group),
        out_shape=jax.ShapeDtypeStruct((b * h, d_p, lq_p), qt4.dtype),
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
    return _unpad_t(out_t, b, h, lq, d)


def _fused_attention_bwd(interpret, res, dout):
    qt4, kt4, vt4 = res
    b, h, lq, lk, d, lq_p, lk_p, d_p = _dims_t(qt4, kt4)
    scale = 1.0 / (d**0.5)
    qt, kt, vt = _pad_t(qt4, lq_p, d_p), _pad_t(kt4, lk_p, d_p), _pad_t(vt4, lk_p, d_p)
    dot_t = _pad_t(dout, lq_p, d_p)
    group = _pick_group(b * h, lq_p, lk_p, d_p, n_bufs=4)
    chunk = _pick_chunk(lq_p, lk_p)

    dqt, dkt, dvt = pl.pallas_call(
        functools.partial(_attn_bwd_kernel_t, scale=scale, l_kv=lk, group=group,
                          chunk=chunk),
        out_shape=(
            jax.ShapeDtypeStruct((b * h, d_p, lq_p), qt4.dtype),
            jax.ShapeDtypeStruct((b * h, d_p, lk_p), kt4.dtype),
            jax.ShapeDtypeStruct((b * h, d_p, lk_p), vt4.dtype),
        ),
        grid=((b * h) // group,),
        in_specs=[
            pl.BlockSpec((group, d_p, lq_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, d_p, lk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, d_p, lk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, d_p, lq_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((group, d_p, lq_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, d_p, lk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((group, d_p, lk_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * (b * h) * (lq_p * lk_p * d_p * 2),
            bytes_accessed=3 * (b * h) * (2 * lq_p + 2 * lk_p) * d_p * 4,
            transcendentals=(b * h) * lq_p * lk_p,
        ),
    )(qt, kt, vt, dot_t)

    return (_unpad_t(dqt, b, h, lq, d), _unpad_t(dkt, b, h, lk, d), _unpad_t(dvt, b, h, lk, d))


# ---------------------------------------------------------------------------
# Fused-projection attention (round 4, VERDICT r3 next #2a): qkv projection +
# per-head attention + output projection in ONE kernel, so the (B, 3D, L)
# qkv tensor and the (B, D, L) attention output never round-trip to HBM.
# Targets the ~4%-of-step projection/boundary traffic left after round 3.
# Forward-only (sampling/serving path) — training keeps the custom-VJP
# kernel above.  Dispatch is opt-in via CONTROLNET_TPU_ATTN_FUSED_PROJ=1
# (ops/attention.py) pending the end-to-end TPU A/B.
# ---------------------------------------------------------------------------


def _attn_proj_kernel(x_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, o_ref,
                      *, scale: float, num_heads: int, dh: int, l_q: int,
                      pipe: bool):
    """One program = one batch element.  x_ref: (L_p, C_p) post-norm tokens;
    wqkv_ref: (C_p, 3D_p); bqkv_ref: (3D_p, 1); wo_ref: (D_p, C_p);
    bo_ref: (1, C_p); o_ref: (L_p, C_p) attention output in token layout
    (residual add happens outside).

    qkv is computed TRANSPOSED — (3D, L) = wqkv^T x^T via one dot_general —
    so per-head q/k/v slices are sublane rows (dh a multiple of 8 for every
    model config: d/heads in {16, 32, 48, 64}), exactly the layout the
    per-head score/out matmuls want (same reasoning as _attn_kernel_t).
    Pad columns beyond l_q get the -1e30 iota mask treatment."""
    # Memory policy (what fits the L=1024,C=384 layer under the 16MB
    # scoped-vmem limit on v5e — a full-f32 variant overflowed by 1.5MB):
    # the big whole-tensor residents (qkv, per-head outputs) live in the
    # input dtype (bf16 on the sampling path — the same precision at which
    # the unfused path round-trips them through HBM), while the score /
    # softmax math upcasts only tiny (dh, L) per-head slices to f32.
    x = x_ref[0]                       # (L_p, C_p)
    wqkv = wqkv_ref[:, :]              # (C_p, 3D_p padded)
    # (3D_p, L) = contract C: wqkv dim0 with x dim1.  Mosaic requires a
    # 32-bit matmul accumulator, so the dot emits f32 and the result is
    # rounded to the narrow dtype immediately — the f32 copy is transient
    # (dead before the per-head loop), unlike a persistent f32 qkv.
    qkv = (jax.lax.dot_general(
        wqkv, x, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        + bqkv_ref[:, :].astype(jnp.float32)).astype(x.dtype)
    d = num_heads * dh          # true (unpadded) model dim; slices use it

    def _scores(h):
        q = qkv[h * dh:(h + 1) * dh, :].astype(jnp.float32)  # (dh, L_p)
        k = qkv[d + h * dh:d + (h + 1) * dh, :].astype(jnp.float32)
        return jax.lax.dot_general(
            q, k, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # (L_p, L_p)

    ones_row = jnp.ones((1, qkv.shape[1]), jnp.float32)

    def _finish(h, scores, out_slices):
        if l_q < scores.shape[-1]:
            col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where(col < l_q, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        # probs = e / rowsum is never materialized — that third (L, L) f32
        # overflows scoped vmem at L=1024.  Contract V against the raw e
        # and normalize the tiny (dh, L) output instead; the row sums come
        # out in transposed (1, L) layout via a ones-vector MXU reduction.
        denom_t = jax.lax.dot_general(
            ones_row, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (1, L): sum_k e[j,k]
        v = qkv[2 * d + h * dh:2 * d + (h + 1) * dh, :].astype(jnp.float32)
        # out_h (dh, L_q rows on lanes): contract L_k; stored narrow so the
        # concatenated (D, L) tensor stays within scoped vmem (see above)
        out_e = jax.lax.dot_general(
            v, e, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_slices.append((out_e / denom_t).astype(qkv.dtype))

    out_slices: list = []
    if pipe and num_heads > 1:
        # software pipeline across heads: head h+1's MXU scores matmul
        # overlaps head h's VPU softmax (same pattern as _attn_kernel_t)
        s_prev = _scores(0)
        for h in range(1, num_heads):
            s_cur = _scores(h)
            _finish(h - 1, s_prev, out_slices)
            s_prev = s_cur
        _finish(num_heads - 1, s_prev, out_slices)
    else:
        for h in range(num_heads):
            _finish(h, _scores(h), out_slices)

    out_t = jnp.concatenate(out_slices, axis=0)  # (D, L_p)
    dp = wo_ref.shape[0]
    if out_t.shape[0] < dp:  # D padded on the weight side only
        out_t = jnp.pad(out_t, ((0, dp - out_t.shape[0]), (0, 0)))
    # (L, C) = contract D: out_t dim0 with wo dim0.  out_t casts to the
    # weight dtype first (bf16 on the sampling path) — same precision as
    # the unfused path, which hands the attention output to the out
    # projection through HBM in compute dtype; accumulation stays f32.
    y = jax.lax.dot_general(
        out_t.astype(wo_ref.dtype), wo_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (y + bo_ref[:, :]).astype(o_ref.dtype)


def fused_proj_fits(l: int, c: int, d: int, itemsize: int = 2) -> bool:
    """Whether the mono-kernel's per-program footprint fits the 16MB scoped
    VMEM limit.  Empirically calibrated on v5e: the L=1024, C=384 north-star
    layer allocates 16.4-17.5M across several dtype-policy variants (every
    one over the limit), while L<=512 layers sit far below it.  The estimate
    charges two live (L, L) f32 score-sized temporaries, the transient-f32 +
    resident-narrow qkv, and the operand/output blocks, against a 14MB
    budget (2MB slack for Mosaic relayouts/spills)."""
    l_p, c_p = _round_up(l, 128), _round_up(c, 128)
    d3_p = _round_up(3 * d, 128)
    softmax = 2 * l_p * l_p * 4
    qkv = d3_p * l_p * (4 + itemsize)
    blocks = (2 * l_p * c_p + c_p * d3_p + _round_up(d, 8) * c_p) * itemsize
    return softmax + qkv + blocks <= 14 * 1024 * 1024


def fused_attention_proj(x: jax.Array, wqkv: jax.Array, bqkv: jax.Array,
                         wo: jax.Array, bo: jax.Array, num_heads: int,
                         interpret: bool = False) -> jax.Array:
    """Self-attention with both projections fused: x (B, L, C) post-norm
    tokens -> (B, L, C) attention output (caller adds the residual).

    wqkv: (C, 3D) concatenated q/k/v projection; bqkv: (3D,); wo: (D, C);
    bo: (C,).  Forward-only (no VJP) — inference/sampling path."""
    b, l, c = x.shape
    d3 = wqkv.shape[1]
    d = d3 // 3
    dh = d // num_heads
    assert dh % 8 == 0, f"head_dim {dh} must be a sublane multiple"
    scale = 1.0 / (dh ** 0.5)
    l_p, c_p, d_p = _round_up(l, 128), _round_up(c, 128), _round_up(d, 8)
    d3_p = _round_up(d3, 128)  # lane dim of the wqkv block

    xp = jnp.pad(x, ((0, 0), (0, l_p - l), (0, c_p - c)))
    # weights and the qkv bias ride VMEM in the input dtype (see kernel
    # docstring: f32 copies overflow scoped vmem at the L=1024,C=384
    # layer; a f32 bias would promote the whole qkv tensor back to f32).
    # bo stays f32 — it adds to the already-f32 projection accumulator.
    wqkv_p = jnp.pad(wqkv.astype(x.dtype), ((0, c_p - c), (0, d3_p - d3)))
    bqkv_p = jnp.pad(bqkv.astype(x.dtype), (0, d3_p - d3))[:, None]
    wo_p = jnp.pad(wo.astype(x.dtype), ((0, d_p - d), (0, c_p - c)))
    bo_p = jnp.pad(bo.astype(jnp.float32), (0, c_p - c))[None, :]
    # pipeline doubles live score matrices; cap at the proven 3.5MB point
    pipe = (l_p * l_p * 4) <= int(3.5 * 1024 * 1024)

    out = pl.pallas_call(
        functools.partial(_attn_proj_kernel, scale=scale, num_heads=num_heads,
                          dh=dh, l_q=l, pipe=pipe),
        out_shape=jax.ShapeDtypeStruct((b, l_p, c_p), x.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, l_p, c_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c_p, d3_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d3_p, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d_p, c_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, l_p, c_p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (l_p * c_p * d3 + num_heads * 2 * l_p * l_p * dh
                           + l_p * d_p * c_p),
            bytes_accessed=b * (2 * l_p * c_p * 4) + (c_p * d3 + d_p * c_p) * 4,
            transcendentals=b * num_heads * l_p * l_p,
        ),
    )(xp, wqkv_p, bqkv_p, wo_p, bo_p)
    return out[:, :l, :c]
