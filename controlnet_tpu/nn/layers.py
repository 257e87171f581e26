"""Functional neural-net layers over explicit parameter pytrees.

Design: a layer object is *static configuration only* — hyperparameters and
shapes.  ``init(key)`` returns a pytree of parameters, ``__call__(params, x)``
is a pure function.  This keeps the whole framework jit/pjit/scan friendly
and makes frozen-vs-trainable splits (ControlNet), EMA teachers, and
multi-optimizer training plain pytree operations.

Layout is NHWC throughout (TPU conv-friendly: channels map onto the 128-wide
lane dimension).  Weights are stored HWIO for convs.  Precision policy:
matmul/conv outputs follow the activation dtype (``preferred_element_type=
x.dtype`` keeps XLA from materializing f32 intermediates between fused ops);
on TPU the MXU still accumulates partial products in float32 by hardware
design.  On non-TPU backends bf16 matmuls may accumulate in bf16 — the bf16
training path is gated by TPU fidelity A/Bs (DESIGN.md §10), not by CPU
numerics.  Softmax and normalization statistics are always computed in f32.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp

Params = Any  # nested dict of jax.Array


def _use_fused_proj() -> bool:
    """Opt-in dispatch for the whole-layer fused attention kernel
    (projections + attention in one pallas_call, forward-only).  TPU-only,
    self-attention only, and off under TP sharding for the same GSPMD
    reason as the core kernel (ops/attention.py).  Knob: tuning
    ``attn_fused_proj`` (YAML tpu_params / CONTROLNET_TPU_ATTN_FUSED_PROJ)."""
    from controlnet_tpu import tuning

    if not tuning.get("attn_fused_proj"):
        return False
    from controlnet_tpu.ops.attention import _use_pallas

    return _use_pallas()


def silu(x: jax.Array) -> jax.Array:
    return jax.nn.silu(x)


def leaky_relu(x: jax.Array, negative_slope: float = 0.2) -> jax.Array:
    return jax.nn.leaky_relu(x, negative_slope)


def get_time_embedding(time_steps: jax.Array, temb_dim: int) -> jax.Array:
    """Sinusoidal timestep embedding: concat(sin(t/f), cos(t/f)),
    f_i = 10000^(i / (d/2)).

    Parity: reference get_time_embedding (models/blocks.py:5-28 and
    models/unet_base.py:5-28 — deduplicated here).  Accepts scalar or (B,)
    timesteps (int or float — consistency models pass scaled noise levels).
    """
    assert temb_dim % 2 == 0, "time embedding dimension must be divisible by 2"
    t = jnp.atleast_1d(jnp.asarray(time_steps, jnp.float32))
    half = temb_dim // 2
    factor = 10000.0 ** (jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] / factor[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def _uniform(key: jax.Array, shape: Sequence[int], bound: float) -> jax.Array:
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


class Conv2d:
    """2D convolution, NHWC/HWIO. Matches torch Conv2d(k, stride, padding) shape
    semantics for the (k=3,p=1), (k=1,p=0), (k=4,s=2,p=1) cases used here."""

    def __init__(
        self,
        in_ch: int,
        out_ch: int,
        kernel_size: int,
        stride: int = 1,
        padding: int | None = None,
        use_bias: bool = True,
        zero_init: bool = False,
    ):
        self.in_ch = in_ch
        self.out_ch = out_ch
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = (kernel_size - 1) // 2 if padding is None else padding
        self.use_bias = use_bias
        self.zero_init = zero_init

    def init(self, key: jax.Array) -> Params:
        k = self.kernel_size
        shape = (k, k, self.in_ch, self.out_ch)
        if self.zero_init:
            # Zero-initialized ("zero conv") — the ControlNet trick
            # (reference models/controlnet.py:7-10).
            w = jnp.zeros(shape, jnp.float32)
            b = jnp.zeros((self.out_ch,), jnp.float32)
        else:
            kw, kb = jax.random.split(key)
            bound = 1.0 / math.sqrt(self.in_ch * k * k)
            w = _uniform(kw, shape, bound)
            b = _uniform(kb, (self.out_ch,), bound)
        p = {"w": w}
        if self.use_bias:
            p["b"] = b
        return p

    def __call__(self, p: Params, x: jax.Array) -> jax.Array:
        pad = self.padding
        # Output dtype follows x: for bf16 the MXU still accumulates f32
        # internally and rounds once at the end — and keeping the primal
        # output dtype uniform is what makes the conv's transpose (gradient)
        # rule well-typed under mixed-precision training.
        out = jax.lax.conv_general_dilated(
            x,
            p["w"].astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        if self.use_bias:
            out = out + p["b"].astype(x.dtype)
        return out

    def tl(self, p: Params, x: jax.Array, hw: tuple[int, int]) -> jax.Array:
        """Transposed-layout forward on (C, B, L) activations (ops/tl_conv.py
        — the channel-padding fix).  Strided 4/2/1 convs halve hw; the
        caller tracks spatial dims statically."""
        from controlnet_tpu.ops import tl_conv

        b = p.get("b") if self.use_bias else None
        if self.kernel_size == 3 and self.stride == 1 and self.padding == 1:
            return tl_conv.conv3x3_tl(p["w"], b, x, hw)
        if self.kernel_size == 1 and self.stride == 1:
            return tl_conv.conv1x1_tl(p["w"], b, x)
        if self.kernel_size == 4 and self.stride == 2 and self.padding == 1:
            return tl_conv.downconv4_tl(p["w"], b, x, hw)
        if self.kernel_size == 3 and self.stride == 2 and self.padding == 1:
            return tl_conv.conv3x3s2_tl(p["w"], b, x, hw)
        # Rare shapes: round-trip through NHWC (correct, not hot).
        out = self(p, tl_conv.from_tl(x, hw))
        return tl_conv.to_tl(out)


class ConvTranspose2d:
    """Transposed conv matching torch ConvTranspose2d(k=4, s=2, p=1) shape
    semantics (exact 2x spatial upsample), used by every UpBlock."""

    def __init__(self, in_ch: int, out_ch: int, kernel_size: int = 4, stride: int = 2, padding: int = 1):
        self.in_ch = in_ch
        self.out_ch = out_ch
        self.kernel_size = kernel_size
        self.stride = stride
        self.padding = padding

    def init(self, key: jax.Array) -> Params:
        k = self.kernel_size
        kw, kb = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.in_ch * k * k)
        return {
            "w": _uniform(kw, (k, k, self.in_ch, self.out_ch), bound),
            "b": _uniform(kb, (self.out_ch,), bound),
        }

    def __call__(self, p: Params, x: jax.Array) -> jax.Array:
        # torch ConvTranspose2d(k, s, p): out = (in-1)*s - 2p + k.
        # jax conv_transpose is a stride-dilated conv: out = (in-1)*s + 1
        # + lo + hi - (k-1), so lo = hi = k - 1 - p reproduces torch.
        k, s, pd = self.kernel_size, self.stride, self.padding
        eff = k - 1 - pd
        out = jax.lax.conv_transpose(
            x,
            p["w"].astype(x.dtype),
            strides=(s, s),
            padding=((eff, eff), (eff, eff)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        return out + p["b"].astype(x.dtype)

    def tl(self, p: Params, x: jax.Array, hw: tuple[int, int]) -> jax.Array:
        """(C, B, L) -> (C_out, B, 4L): 2x upsample in transposed layout."""
        from controlnet_tpu.ops import tl_conv

        assert (self.kernel_size, self.stride, self.padding) == (4, 2, 1)
        return tl_conv.upconvT4_tl(p["w"], p["b"], x, hw)


class Linear:
    def __init__(self, in_dim: int, out_dim: int, use_bias: bool = True):
        self.in_dim = in_dim
        self.out_dim = out_dim
        self.use_bias = use_bias

    def init(self, key: jax.Array) -> Params:
        kw, kb = jax.random.split(key)
        bound = 1.0 / math.sqrt(self.in_dim)
        p = {"w": _uniform(kw, (self.in_dim, self.out_dim), bound)}
        if self.use_bias:
            p["b"] = _uniform(kb, (self.out_dim,), bound)
        return p

    def __call__(self, p: Params, x: jax.Array) -> jax.Array:
        out = jnp.dot(x, p["w"].astype(x.dtype), preferred_element_type=x.dtype)
        if self.use_bias:
            out = out + p["b"].astype(x.dtype)
        return out


class GroupNorm:
    """GroupNorm over the channel (last) axis of NHWC or (B, L, C) tensors.

    Matches torch GroupNorm(num_groups, C) semantics: per-sample, per-group
    normalization over (spatial..., C/G).  Stats in float32.
    """

    def __init__(self, num_groups: int, channels: int, eps: float = 1e-5):
        assert channels % num_groups == 0, f"channels {channels} % groups {num_groups} != 0"
        self.num_groups = num_groups
        self.channels = channels
        self.eps = eps

    def init(self, key: jax.Array) -> Params:
        del key
        return {
            "scale": jnp.ones((self.channels,), jnp.float32),
            "bias": jnp.zeros((self.channels,), jnp.float32),
        }

    def __call__(self, p: Params, x: jax.Array) -> jax.Array:
        # Staged reduction that never leaves the NHWC/(B,L,C) layout: a
        # spatial-only sum/sumsq to (B, C) (lane-preserving, the global-
        # avg-pool pattern), then a tiny (B, G, C/G) fold.  The naive
        # reshape-to-(B,*,G,C/G) formulation made XLA transpose every
        # activation to a planar C-major f32 layout and back — two 40 us
        # copies per GN instance, ~26% of the whole LDM sampling step
        # (docs/DESIGN.md round-3 profile).  The elementwise apply stays in
        # the input layout so XLA fuses it into neighbors.  Stats in f32;
        # E[x^2]-E[x]^2 in f32 matches the two-pass torch variance to well
        # under test tolerance at these magnitudes.  Accuracy envelope of
        # the single-pass form (cancellation-prone at |mean| >> std) is
        # pinned by tests/test_layers.py::
        # test_groupnorm_extreme_magnitude_accuracy: output atol 1e-5 at
        # mean~0, 1e-4 at mean~10, 2e-2 at mean~100 — activations here are
        # post-norm/post-SiLU (|mean| < ~10), far inside the envelope.
        orig_dtype = x.dtype
        b = x.shape[0]
        g = self.num_groups
        c = self.channels
        cg = c // g
        xf = x.astype(jnp.float32)
        red = tuple(range(1, x.ndim - 1))  # spatial/token axes
        n = math.prod(x.shape[1:-1]) * cg
        s = jnp.sum(xf, axis=red).reshape(b, g, cg).sum(-1)  # (B, G)
        ss = jnp.sum(xf * xf, axis=red).reshape(b, g, cg).sum(-1)
        mean = s / n
        var = jnp.maximum(ss / n - mean * mean, 0.0)
        inv = jax.lax.rsqrt(var + self.eps)
        shape = (b,) + (1,) * (x.ndim - 2) + (c,)
        mean_c = jnp.repeat(mean, cg, axis=1).reshape(shape)
        inv_c = jnp.repeat(inv, cg, axis=1).reshape(shape)
        out = (xf - mean_c) * inv_c * p["scale"] + p["bias"]
        return out.astype(orig_dtype)

    def tl(self, p: Params, x: jax.Array) -> jax.Array:
        """GroupNorm on (C, B, L) activations — same stats, channel-first."""
        from controlnet_tpu.ops.tl_conv import group_norm_tl

        return group_norm_tl(p["scale"], p["bias"], x, self.num_groups, self.eps)


class BatchNorm:
    """Batch norm using batch statistics (training mode).

    Used by the PatchGAN discriminator and the DMD feature extractor —
    neither is ever run in eval/inference mode in the reference pipeline
    (discriminator.py:31, distribution_matching_controlnet.py:29-60), so
    running-average state is not kept.
    """

    def __init__(self, channels: int, eps: float = 1e-5):
        self.channels = channels
        self.eps = eps

    def init(self, key: jax.Array) -> Params:
        del key
        return {
            "scale": jnp.ones((self.channels,), jnp.float32),
            "bias": jnp.zeros((self.channels,), jnp.float32),
        }

    def __call__(self, p: Params, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        xf = x.astype(jnp.float32)
        axes = tuple(range(x.ndim - 1))  # all but channel
        mean = xf.mean(axis=axes, keepdims=True)
        var = xf.var(axis=axes, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + self.eps) * p["scale"] + p["bias"]
        return out.astype(orig_dtype)


class MultiheadAttention:
    """Multi-head (self or cross) attention over (B, L, C) tokens.

    Functionally equivalent to torch nn.MultiheadAttention(embed_dim, heads,
    batch_first=True) as used in every reference block (blocks.py:86-104):
    fused qkv projection + scaled dot-product + output projection.

    The inner product runs through ``controlnet_tpu.ops.attention`` which
    dispatches to a fused Pallas kernel on TPU when shapes allow.
    """

    def __init__(self, embed_dim: int, num_heads: int, kv_dim: int | None = None):
        assert embed_dim % num_heads == 0
        self.embed_dim = embed_dim
        self.num_heads = num_heads
        self.kv_dim = kv_dim if kv_dim is not None else embed_dim

    def init(self, key: jax.Array) -> Params:
        d = self.embed_dim
        kq, kk, kv, ko = jax.random.split(key, 4)
        # torch init parity: with kdim == embed_dim (every reference block),
        # nn.MultiheadAttention xavier-inits the PACKED (3E, E) in_proj_weight
        # -> fan_in=E, fan_out=3E -> bound sqrt(6/(4E)) for q, k, AND v; only
        # the kdim != embed_dim path xavier-inits per-matrix.
        if self.kv_dim == d:
            bq = bkv = math.sqrt(6.0 / (4 * d))
        else:
            bq = math.sqrt(6.0 / (d + d))
            bkv = math.sqrt(6.0 / (self.kv_dim + d))
        bo = 1.0 / math.sqrt(d)
        return {
            "wq": _uniform(kq, (d, d), bq),
            "wk": _uniform(kk, (self.kv_dim, d), bkv),
            "wv": _uniform(kv, (self.kv_dim, d), bkv),
            "bq": jnp.zeros((d,), jnp.float32),
            "bk": jnp.zeros((d,), jnp.float32),
            "bv": jnp.zeros((d,), jnp.float32),
            "wo": _uniform(ko, (d, d), bo),
            "bo": jnp.zeros((d,), jnp.float32),
        }

    def __call__(self, p: Params, q_in: jax.Array, kv_in: jax.Array | None = None) -> jax.Array:
        from controlnet_tpu.ops.attention import multi_head_attention_t

        dt = q_in.dtype
        d = self.embed_dim
        # Project straight into the TRANSPOSED (B, D, L) layout the fused
        # kernel wants — XLA folds the transpose into the matmul, so no
        # copy ops appear around the attention kernel.
        if kv_in is None:
            # self-attention: ONE (C, 3D) projection matmul instead of
            # three (bit-identical; measured ~5%/layer on v5e at L=1024).
            # The weight concat is loop-invariant and LICM-hoisted out of
            # sampling scans; params stay split for checkpoint parity.
            wqkv = jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=1).astype(dt)
            bqkv = jnp.concatenate([p["bq"], p["bk"], p["bv"]]).astype(dt)
            from controlnet_tpu.ops.pallas_attention import (
                fused_attention_proj, fused_proj_fits)

            if (_use_fused_proj()
                    and d // self.num_heads % 8 == 0  # kernel sublane precondition
                    and fused_proj_fits(q_in.shape[1], q_in.shape[2], d,
                                        dt.itemsize)):
                # whole-layer fused kernel (projections + attention in one
                # pallas_call, forward-only — sampling/serving path;
                # CONTROLNET_TPU_ATTN_FUSED_PROJ=1 opt-in).  Layers whose
                # footprint exceeds scoped VMEM (L=1024 at north-star
                # widths) keep the split path below.
                return fused_attention_proj(
                    q_in, wqkv, bqkv, p["wo"].astype(dt), p["bo"].astype(dt),
                    self.num_heads)
            qkv = jnp.einsum("blc,cd->bdl", q_in, wqkv,
                             preferred_element_type=dt) + bqkv[None, :, None]
            qt, kt, vt = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        else:
            qt = jnp.einsum("blc,cd->bdl", q_in, p["wq"].astype(dt),
                            preferred_element_type=dt) + p["bq"].astype(dt)[None, :, None]
            kt = jnp.einsum("blc,cd->bdl", kv_in.astype(dt), p["wk"].astype(dt),
                            preferred_element_type=dt) + p["bk"].astype(dt)[None, :, None]
            vt = jnp.einsum("blc,cd->bdl", kv_in.astype(dt), p["wv"].astype(dt),
                            preferred_element_type=dt) + p["bv"].astype(dt)[None, :, None]
        out_t = multi_head_attention_t(qt, kt, vt, self.num_heads)
        out = jnp.einsum("bdl,dc->blc", out_t, p["wo"].astype(dt),
                         preferred_element_type=dt) + p["bo"].astype(dt)
        return out

    def pair(self, p_a: Params, p_b: Params, xa: jax.Array, xb: jax.Array
             ) -> tuple[jax.Array, jax.Array]:
        """Two self-attention calls with DIFFERENT weights batched into ONE
        attention-core invocation (ControlNet dual-trunk batching, VERDICT
        r3 next #2b): per-trunk qkv projections (einsums — cheap), q/k/v
        concatenated along batch, a single fused-kernel call at 2x the
        (batch*heads) occupancy, then per-trunk output projections.

        Bit-identical to two sequential ``__call__``s: attention is
        independent per (batch, head) slice, so batch-concat changes
        scheduling only (parity: tests/test_models.py paired-forward test).
        """
        from controlnet_tpu.ops.attention import multi_head_attention_t

        dt = xa.dtype
        d = self.embed_dim
        b = xa.shape[0]

        def qkv_t(p, x):
            wqkv = jnp.concatenate([p["wq"], p["wk"], p["wv"]], axis=1).astype(dt)
            bqkv = jnp.concatenate([p["bq"], p["bk"], p["bv"]]).astype(dt)
            return jnp.einsum("blc,cd->bdl", x, wqkv,
                              preferred_element_type=dt) + bqkv[None, :, None]

        qkv = jnp.concatenate([qkv_t(p_a, xa), qkv_t(p_b, xb)], axis=0)  # (2B, 3D, L)
        qt, kt, vt = qkv[:, :d], qkv[:, d:2 * d], qkv[:, 2 * d:]
        out_t = multi_head_attention_t(qt, kt, vt, self.num_heads)  # (2B, D, L)

        def out_proj(p, o_t):
            return jnp.einsum("bdl,dc->blc", o_t, p["wo"].astype(dt),
                              preferred_element_type=dt) + p["bo"].astype(dt)

        return out_proj(p_a, out_t[:b]), out_proj(p_b, out_t[b:])

    def tl(self, p: Params, x_tl: jax.Array, kv_in: jax.Array | None = None) -> jax.Array:
        """Attention on transposed-layout tokens (C, B, L) -> (C, B, L).
        ``kv_in`` (cross attention) stays (B, L_ctx, C_ctx)."""
        from controlnet_tpu.ops.attention import multi_head_attention_t

        dt = x_tl.dtype
        qt = jnp.einsum("cbl,cd->bdl", x_tl, p["wq"].astype(dt),
                        preferred_element_type=dt) + p["bq"].astype(dt)[None, :, None]
        if kv_in is None:
            kt = jnp.einsum("cbl,cd->bdl", x_tl, p["wk"].astype(dt),
                            preferred_element_type=dt) + p["bk"].astype(dt)[None, :, None]
            vt = jnp.einsum("cbl,cd->bdl", x_tl, p["wv"].astype(dt),
                            preferred_element_type=dt) + p["bv"].astype(dt)[None, :, None]
        else:
            kt = jnp.einsum("blc,cd->bdl", kv_in.astype(dt), p["wk"].astype(dt),
                            preferred_element_type=dt) + p["bk"].astype(dt)[None, :, None]
            vt = jnp.einsum("blc,cd->bdl", kv_in.astype(dt), p["wv"].astype(dt),
                            preferred_element_type=dt) + p["bv"].astype(dt)[None, :, None]
        out_t = multi_head_attention_t(qt, kt, vt, self.num_heads)
        out = jnp.einsum("bdl,dc->cbl", out_t, p["wo"].astype(dt),
                         preferred_element_type=dt) + p["bo"].astype(dt)[:, None, None]
        return out


class Identity:
    def init(self, key: jax.Array) -> Params:
        del key
        return {}

    def __call__(self, p: Params, x: jax.Array) -> jax.Array:
        return x


class Sequential:
    """A static chain of (layer, activation) steps.

    ``steps`` is a list whose entries are layer objects or the string
    "silu"/"relu"/"leaky_relu" for parameter-free activations.
    """

    def __init__(self, steps: Sequence[Any]):
        self.steps = list(steps)

    def init(self, key: jax.Array) -> Params:
        params = []
        layer_steps = [s for s in self.steps if not isinstance(s, str)]
        keys = jax.random.split(key, max(len(layer_steps), 1))
        ki = 0
        for s in self.steps:
            if isinstance(s, str):
                params.append({})
            else:
                params.append(s.init(keys[ki]))
                ki += 1
        return {"layers": params}

    def __call__(self, p: Params, x: jax.Array) -> jax.Array:
        for s, sp in zip(self.steps, p["layers"]):
            if s == "silu":
                x = silu(x)
            elif s == "relu":
                x = jax.nn.relu(x)
            elif s == "leaky_relu":
                x = leaky_relu(x)
            elif isinstance(s, str):
                raise ValueError(f"unknown activation {s}")
            else:
                x = s(sp, x)
        return x

    def tl(self, p: Params, x: jax.Array, hw: tuple[int, int]) -> tuple[jax.Array, tuple[int, int]]:
        """Transposed-layout forward on (C, B, L) activations for conv/
        activation chains (the hint encoders).  Tracks spatial dims through
        strided convs statically; returns (out, final_hw)."""
        h, w = hw
        for s, sp in zip(self.steps, p["layers"]):
            if s == "silu":
                x = silu(x)
            elif s == "relu":
                x = jax.nn.relu(x)
            elif s == "leaky_relu":
                x = leaky_relu(x)
            elif isinstance(s, str):
                raise ValueError(f"unknown activation {s}")
            else:
                x = s.tl(sp, x, (h, w))
                if getattr(s, "stride", 1) == 2:
                    # Conv2d stride 2 halves the grid; ConvTranspose2d
                    # stride 2 doubles it (its tl() quadruples L).
                    if isinstance(s, ConvTranspose2d):
                        h, w = h * 2, w * 2
                    else:
                        h, w = h // 2, w // 2
        return x, (h, w)
