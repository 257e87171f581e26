"""Fused im2col 3x3 convolution kernel (Pallas/Mosaic) in transposed layout.

Companion to ops/tl_conv.py: activations are (C, B, L) with the flat
(batch*spatial) axis on lanes.  The XLA einsum path there materializes the
(9C, B*L) im2col tensor in HBM — 9x the activation traffic, which dominates
at these sizes (the matmul itself is ~10 us, the HBM round-trip ~10x that).
This kernel builds the im2col block in VMEM scratch and feeds the MXU
directly:

    per grid step (a group of G images, TN = G*l_pad lanes):
      xpad   (C, TN+2S)  <- x block, zero-padded ends     (VMEM scratch)
      cols   (9C, TN)    <- 9 masked lane-shifts of xpad  (VMEM scratch)
      out    (O, TN)     <- W_flat (O, 9C) @ cols + b     (one MXU matmul)

Mosaic requires block lane counts divisible by 128, so each image's L=H*W
lanes are padded to a per-image stride ``l_pad`` chosen so G*l_pad is
128-aligned with minimal waste (e.g. 7x7 -> L=49 padded to 52 at G=32
instead of 128: 1.06x).  Masks are computed in-kernel from an iota — a tap
is valid iff it stays inside the logical image, which kills row wrap,
cross-image bleed on the flat axis, AND reads from the per-image pad lanes.
Blocks hold whole images so no halo is needed: any tap that would cross a
block edge is exactly a masked tap.

Backward is a custom VJP in plain XLA ops (standard conv gradients:
dx = conv(dout, rot180(w) with I/O swapped), dw from the im2col einsum) —
training steps are not the bottleneck this kernel targets; sampling is.
"""

from __future__ import annotations

import functools
import math

from controlnet_tpu import tuning

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _conv_kernel(x_ref, w_ref, b_ref, o_ref, xpad, cols, *,
                 hw: tuple[int, int], l_pad: int, tn: int, c: int):
    h, w = hw
    l = h * w
    s = w + 1
    xpad[:, s : s + tn] = x_ref[:, :]
    xpad[:, :s] = jnp.zeros((c, s), x_ref.dtype)
    xpad[:, s + tn :] = jnp.zeros((c, s), x_ref.dtype)

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, tn), 1)
    pos = idx % l_pad  # position inside the (padded) image
    xcol = pos % w
    yrow = pos // w
    live = pos < l  # not a per-image pad lane
    for t, (dy, dx) in enumerate(_TAPS):
        m = live & (xcol + dx >= 0) & (xcol + dx < w) & (yrow + dy >= 0) & (yrow + dy < h)
        sh = dy * w + dx
        cols[t * c : (t + 1) * c, :] = xpad[:, s + sh : s + sh + tn] * m.astype(x_ref.dtype)

    acc = jnp.dot(w_ref[:, :], cols[:, :], preferred_element_type=jnp.float32)
    o_ref[:, :] = (acc + b_ref[:, :]).astype(o_ref.dtype)


def _plan(batch: int, l: int, cin: int, cout: int, itemsize: int):
    """Pick (G images per block, per-image lane stride l_pad): G | batch,
    G*l_pad % 128 == 0 (Mosaic block constraint), working set within the
    VMEM budget, minimizing padded-lane waste then maximizing G.
    Returns None when nothing fits."""

    def fits(g: int, lp: int) -> bool:
        tn = g * lp
        total = (9 * cin * tn  # cols scratch
                 + cin * (tn + 2 * (l + 1))  # xpad scratch
                 + 2 * (cin + cout) * tn  # double-buffered in/out blocks
                 + cout * 9 * cin) * itemsize
        return total <= tuning.get("conv_vmem_bytes")

    best = None  # (waste_ratio, -g, g, l_pad)
    for g in range(1, min(batch, 64) + 1):
        if batch % g:
            continue
        m = 128 // math.gcd(g, 128)
        lp = ((l + m - 1) // m) * m
        if not fits(g, lp):
            continue
        cand = (lp / l, -g, g, lp)
        if best is None or cand < best:
            best = cand
    return None if best is None else (best[2], best[3])


def pallas_conv3x3_applicable(x: jax.Array, cin: int, cout: int,
                              hw: tuple[int, int]) -> bool:
    """Kernel preconditions: TPU backend, a feasible (G, l_pad) plan, and
    tile-aligned channel counts for the dtype."""
    if tuning.get("disable_pallas") or tuning.get("disable_pallas_conv"):
        return False
    if jax.default_backend() != "tpu":
        return False
    c, b, l = x.shape
    sub = {jnp.float32.dtype: 8, jnp.bfloat16.dtype: 16}.get(jnp.dtype(x.dtype))
    if sub is None or cin % sub or cout % sub:
        return False
    return _plan(b, l, cin, cout, jnp.dtype(x.dtype).itemsize) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _conv3x3(w_hwio, bias, x, hw, interpret):
    return _conv3x3_fwd_impl(w_hwio, bias, x, hw, interpret)


def _conv3x3_fwd_impl(w_hwio, bias, x, hw, interpret=False):
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    c, b, l = x.shape
    plan = _plan(b, l, cin, cout, jnp.dtype(x.dtype).itemsize)
    assert plan is not None, "check pallas_conv3x3_applicable first"
    g, l_pad = plan
    tn = g * l_pad
    w_flat = w_hwio.transpose(3, 0, 1, 2).reshape(cout, 9 * cin).astype(x.dtype)
    b_col = (jnp.zeros((cout,), jnp.float32) if bias is None else bias.astype(jnp.float32))[:, None]
    xf = x if l_pad == l else jnp.pad(x, ((0, 0), (0, 0), (0, l_pad - l)))
    xf = xf.reshape(c, b * l_pad)

    out = pl.pallas_call(
        functools.partial(_conv_kernel, hw=hw, l_pad=l_pad, tn=tn, c=cin),
        out_shape=jax.ShapeDtypeStruct((cout, b * l_pad), x.dtype),
        grid=(b // g,),
        in_specs=[
            pl.BlockSpec((cin, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 9 * cin), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cout, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((cin, tn + 2 * (hw[1] + 1)), x.dtype),
            pltpu.VMEM((9 * cin, tn), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * cout * 9 * cin * b * l_pad,
            bytes_accessed=(cin + cout) * b * l_pad * jnp.dtype(x.dtype).itemsize,
            transcendentals=0,
        ),
    )(xf, w_flat, b_col)
    out = out.reshape(cout, b, l_pad)
    return out if l_pad == l else out[:, :, :l]


def _conv3x3_fwd(w_hwio, bias, x, hw, interpret):
    return _conv3x3_fwd_impl(w_hwio, bias, x, hw, interpret), (w_hwio, bias, x)


def _conv3x3_bwd(hw, interpret, res, dout):
    from controlnet_tpu.ops.tl_conv import _shifted_taps, conv3x3_tl

    w_hwio, bias, x = res
    cin, cout = w_hwio.shape[2], w_hwio.shape[3]
    # dx: full correlation with the 180-degree-rotated, I/O-swapped kernel.
    w_rot = w_hwio[::-1, ::-1].transpose(0, 1, 3, 2)  # (3,3,O,I)
    dx = conv3x3_tl(w_rot, None, dout, hw, use_pallas=False)
    # dw[o, tap*I+i] = sum_n cols[tap*I+i, n] dout[o, n]
    cols = _shifted_taps(x, hw, list(_TAPS))  # (9C, B, L)
    dw_flat = jnp.einsum("kbl,obl->ok", cols, dout, preferred_element_type=jnp.float32)
    dw = dw_flat.reshape(cout, 3, 3, cin).transpose(1, 2, 3, 0).astype(w_hwio.dtype)
    db = None if bias is None else dout.astype(jnp.float32).sum(axis=(1, 2)).astype(bias.dtype)
    return dw, db, dx.astype(x.dtype)


_conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def pallas_conv3x3_tl(w_hwio: jax.Array, bias: jax.Array | None, x: jax.Array,
                      hw: tuple[int, int], interpret: bool = False) -> jax.Array:
    """3x3 stride-1 pad-1 conv on (C, B, L) activations — fused VMEM im2col.
    Check ``pallas_conv3x3_applicable`` first; differentiable.  ``interpret``
    runs the Pallas interpreter (CPU CI coverage)."""
    return _conv3x3(w_hwio, bias, x, hw, interpret)
