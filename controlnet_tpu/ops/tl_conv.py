"""Transposed-layout (TL) convolutions: the channel-padding fix.

Problem (measured in round 1, BASELINE.md): NHWC convs put channels on the
128-wide lane axis, so the MNIST-scale UNet (C = 32..256) pads every conv's
channel dims up to 128 lanes — XLA-compiled physical FLOPs were 4.7x the
logical 119 GFLOP/step.  The round-1 attention kernel already proved the
fix: lay the LONG axis on lanes and the short axis on sublanes.

TL activations are ``(C, B, L)`` with ``L = H*W``: channels on sublanes
(8-wide: C = 32/64/... pad-free) and the flattened (batch, spatial) axis on
lanes — B*L is tens of thousands wide, so lane padding is negligible and
every conv collapses to ONE large matmul

    out (C_out, B*L) = W_flat (C_out, K) @ cols (K, B*L)

with K = taps*C_in (3x3: K = 9C; 4x4-stride-2 via space-to-depth: K = 16C;
ConvTranspose-4x4-s2 via 4 parity sub-convs: K = 4C each).  K pads only on
the weight operand's lane axis (288 -> 384: 1.33x), so physical FLOPs are
~1.4x logical instead of 4.7x.

im2col is built with shifts of the zero-padded flat (C, B*L) buffer plus
validity masks (a spatial (dy, dx) tap is a flat shift by ``dy*W + dx``;
row/column masks kill wrap-around across rows and image boundaries).  The
hot stride-1 3x3 case also has a Pallas kernel that stages the im2col block
in VMEM and never round-trips it through HBM
(ops/pallas_conv.pallas_conv3x3_tl); the XLA einsum path here is the
always-correct fallback and the reference for its parity tests.

Numerics match ``nn.layers.Conv2d`` / ``ConvTranspose2d`` (NHWC, XLA conv)
to float tolerance — proven in tests/test_tl_parity.py.  Reference parity
chain: those layers match torch (tests/test_torch_parity.py), so TL output
== reference output (models/unet_base.py:341-374 et al.).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def to_tl(x_nhwc: Array) -> Array:
    """(B, H, W, C) -> (C, B, H*W)."""
    b, h, w, c = x_nhwc.shape
    return x_nhwc.reshape(b, h * w, c).transpose(2, 0, 1)


def from_tl(x_tl: Array, hw: tuple[int, int]) -> Array:
    """(C, B, H*W) -> (B, H, W, C)."""
    c, b, _ = x_tl.shape
    h, w = hw
    return x_tl.transpose(1, 2, 0).reshape(b, h, w, c)


def _tap_mask(hw: tuple[int, int], dy: int, dx: int, dtype) -> Array:
    """(1, 1, L) validity mask for tap (dy, dx): kills row wrap-around and
    (via dy) top/bottom off-image reads, which otherwise bleed into the
    previous/next image on the flat (B*L) axis."""
    h, w = hw
    l = h * w
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, 1, l), 2)
    x = idx % w
    y = idx // w
    ok = (x + dx >= 0) & (x + dx < w) & (y + dy >= 0) & (y + dy < h)
    return ok.astype(dtype)


def _shifted_taps(x: Array, hw: tuple[int, int], taps: list[tuple[int, int]]) -> Array:
    """Stack masked spatial shifts of x (C, B, L) tap-major along channels.

    Returns (len(taps)*C, B, L); tap (dy, dx) holds x[:, :, y+dy, x+dx]
    (zero outside the image).
    """
    c, b, l = x.shape
    h, w = hw
    pad = w + 1  # max |dy*W + dx| over 3x3 taps
    flat = x.reshape(c, b * l)
    fp = jnp.pad(flat, ((0, 0), (pad, pad)))
    cols = []
    for dy, dx in taps:
        s = dy * w + dx
        sl = jax.lax.slice(fp, (0, pad + s), (c, pad + s + b * l)).reshape(c, b, l)
        cols.append(sl * _tap_mask(hw, dy, dx, x.dtype))
    return jnp.concatenate(cols, axis=0)


def _matmul_tl(w_flat: Array, cols: Array, bias: Array | None) -> Array:
    out = jnp.einsum("ok,kbl->obl", w_flat, cols, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)[:, None, None]
    return out.astype(cols.dtype)


def conv3x3_tl(w_hwio: Array, bias: Array | None, x: Array,
               hw: tuple[int, int], use_pallas: bool = True) -> Array:
    """3x3 stride-1 pad-1 conv on TL activations (C, B, L).

    Equals Conv2d(k=3, p=1) on the NHWC view (nn/layers.py:53-105).
    ``use_pallas`` routes to the fused VMEM-im2col kernel when shapes fit;
    the XLA einsum path is the always-correct fallback.
    """
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 3 and kw == 3
    if use_pallas:
        from controlnet_tpu.ops.pallas_conv import (
            pallas_conv3x3_applicable,
            pallas_conv3x3_tl,
        )

        if pallas_conv3x3_applicable(x, cin, cout, hw):
            return pallas_conv3x3_tl(w_hwio, bias, x, hw)
    taps = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    cols = _shifted_taps(x, hw, taps)
    w_flat = w_hwio.transpose(3, 0, 1, 2).reshape(cout, 9 * cin).astype(x.dtype)
    return _matmul_tl(w_flat, cols, bias)


def conv1x1_tl(w_hwio: Array, bias: Array | None, x: Array) -> Array:
    """1x1 conv = plain channel matmul (zero convs, skip projections)."""
    w_flat = w_hwio[0, 0].T.astype(x.dtype)  # (O, I)
    return _matmul_tl(w_flat, x, bias)


def _space_to_depth_tl(x: Array, hw: tuple[int, int]) -> Array:
    """(C, B, H*W) -> (4C, B, (H/2)*(W/2)); channel index = (a*2+b)*C + c
    where (a, b) is the pixel's offset inside its 2x2 block."""
    c, b, _ = x.shape
    h, w = hw
    x = x.reshape(c, b, h // 2, 2, w // 2, 2)  # (C,B,u,a,v,bb)
    x = x.transpose(3, 5, 0, 1, 2, 4)  # (a,bb,C,B,u,v)
    return x.reshape(4 * c, b, (h // 2) * (w // 2))


def _strided_conv_tl(w_hwio: Array, bias: Array | None, x: Array,
                     hw: tuple[int, int]) -> Array:
    """kxk stride-2 pad-1 conv on TL activations — exact reformulation:
    space-to-depth by 2, then each of the k*k kernel taps reads one s2d
    channel group at one (du, dv) offset on the half-res grid — K =
    k*k*C_in, a well-shaped contraction.

    Derivation: input row 2u+ky-1 = 2(u+du)+a with a=(ky+1)%2,
    du=(ky-1-a)/2, so ky -> (a, du) = 0:(1,-1) 1:(0,0) 2:(1,0) 3:(0,1).
    """
    kh, kw, cin, cout = w_hwio.shape
    h, w = hw
    h2, w2 = h // 2, w // 2
    c, b, _ = x.shape
    assert c == cin, (
        f"channel mismatch: x has {c} channels, kernel expects {cin} "
        "(the s2d group slices would silently read wrong channels)")
    l2 = h2 * w2
    g = _space_to_depth_tl(x, hw).reshape(4 * cin, b * l2)
    pad = w2 + 1
    gp = jnp.pad(g, ((0, 0), (pad, pad)))

    def ktap(k: int) -> tuple[int, int]:
        a = (k + 1) % 2
        return a, (k - 1 - a) // 2

    cols, wparts = [], []
    for ky in range(kh):
        a, du = ktap(ky)
        for kx in range(kw):
            bb, dv = ktap(kx)
            grp = (a * 2 + bb) * cin
            s = du * w2 + dv
            sl = jax.lax.slice(gp, (grp, pad + s), (grp + cin, pad + s + b * l2))
            cols.append(sl.reshape(cin, b, l2) * _tap_mask((h2, w2), du, dv, x.dtype))
            wparts.append(w_hwio[ky, kx])  # (I, O)
    cols = jnp.concatenate(cols, axis=0)  # (k*k*C, B, L/4)
    w_flat = jnp.concatenate(wparts, axis=0).T.astype(x.dtype)  # (O, k*k*C)
    return _matmul_tl(w_flat, cols, bias)


def downconv4_tl(w_hwio: Array, bias: Array | None, x: Array,
                 hw: tuple[int, int]) -> Array:
    """4x4 stride-2 pad-1 conv (the DownBlock downsample, nn/blocks.py:137)
    on TL activations (K = 16*C_in, e.g. 512 for C=32)."""
    assert w_hwio.shape[:2] == (4, 4)
    return _strided_conv_tl(w_hwio, bias, x, hw)


def conv3x3s2_tl(w_hwio: Array, bias: Array | None, x: Array,
                 hw: tuple[int, int]) -> Array:
    """3x3 stride-2 pad-1 conv (the LDM hint-encoder downsample,
    models/controlnet.py:52-62 / reference controlnet_ldm.py:45-79) on TL
    activations — the layout that keeps low-channel full-res hint features
    pad-free (NHWC at C=16, 1024^2 lane-pads 8x and OOMs HBM)."""
    assert w_hwio.shape[:2] == (3, 3)
    return _strided_conv_tl(w_hwio, bias, x, hw)


def upconvT4_tl(w_hwio: Array, bias: Array | None, x: Array,
                hw: tuple[int, int]) -> Array:
    """ConvTranspose2d(k=4, s=2, p=1) (the UpBlock 2x upsample,
    nn/blocks.py:252) on TL activations: 4 parity sub-convs with K = 4*C_in
    each, interleaved to the double-res grid.

    Matches jax.lax.conv_transpose(transpose_kernel=False) as used by
    nn.layers.ConvTranspose2d: out[2u+a] = sum over k' == a (mod 2) of
    w[k'] x[u+du], with a=0: k'=0:du=-1, k'=2:du=0; a=1: k'=1:du=0,
    k'=3:du=+1 (same decomposition on columns).
    """
    kh, kw, cin, cout = w_hwio.shape
    assert kh == 4 and kw == 4
    h, w = hw
    c, b, _ = x.shape
    l = h * w

    def ptaps(a: int) -> list[tuple[int, int]]:
        return [(0, -1), (2, 0)] if a == 0 else [(1, 0), (3, 1)]

    outs = []  # parity-major (a, bb)
    for a in range(2):
        for bb in range(2):
            taps = [(du, dv) for _, du in ptaps(a) for _, dv in ptaps(bb)]
            cols = _shifted_taps(x, hw, taps)
            wparts = [w_hwio[ky, kx] for ky, _ in ptaps(a) for kx, _ in ptaps(bb)]
            w_flat = jnp.concatenate(wparts, axis=0).T.astype(x.dtype)  # (O, 4C)
            outs.append(_matmul_tl(w_flat, cols, bias))
    out = jnp.stack(outs, axis=0)  # (4, O, B, L) parity (a*2+bb)
    out = out.reshape(2, 2, cout, b, h, w)  # (a,bb,O,B,u,v)
    out = out.transpose(2, 3, 4, 0, 5, 1)  # (O,B,u,a,v,bb)
    return out.reshape(cout, b, 4 * l)


def group_norm_tl(scale: Array, bias: Array, x: Array, num_groups: int,
                  eps: float = 1e-5) -> Array:
    """GroupNorm on (C, B, L): per-sample per-group stats over (C/G, L).
    Matches nn.layers.GroupNorm (torch GroupNorm semantics)."""
    c, b, l = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(g, c // g, b, l)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(c, b, l)
    out = xf * scale[:, None, None] + bias[:, None, None]
    return out.astype(x.dtype)
