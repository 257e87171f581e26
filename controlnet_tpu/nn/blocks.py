"""One parameterized UNet/VAE block library.

The reference maintains two parallel block implementations — a hardcoded one
(models/unet_base.py:31-289: GroupNorm(8), attention always on, t_emb
mandatory) and a configurable one (models/blocks.py:31-503: per-level attn
flag, optional t_emb, norm_channels, optional cross-attention).  This module
unifies them: the hardcoded variant is just
``DownBlock(..., attn=True, norm_channels=8)`` etc.

Every block is static config with ``init(key) -> params`` and
``__call__(params, x, t_emb, context)`` pure functions (NHWC).

Structure per resnet layer (identical in all blocks, parity with
blocks.py:115-150):
    h = conv3x3(silu(groupnorm(x)))
    h = h + linear(silu(t_emb))            # if t_emb_dim
    h = conv3x3(silu(groupnorm(h)))
    out = h + conv1x1(x)                   # residual 1x1 projection
then optional self-attention and cross-attention over flattened H*W tokens.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from controlnet_tpu.nn.layers import (
    Conv2d,
    ConvTranspose2d,
    GroupNorm,
    Identity,
    Linear,
    MultiheadAttention,
    silu,
)

Params = Any


class _ResnetLayer:
    def __init__(self, in_ch: int, out_ch: int, t_emb_dim: int | None, norm_channels: int):
        self.norm1 = GroupNorm(norm_channels, in_ch)
        self.conv1 = Conv2d(in_ch, out_ch, 3)
        self.t_emb_dim = t_emb_dim
        if t_emb_dim is not None:
            self.t_proj = Linear(t_emb_dim, out_ch)
        self.norm2 = GroupNorm(norm_channels, out_ch)
        self.conv2 = Conv2d(out_ch, out_ch, 3)
        self.skip = Conv2d(in_ch, out_ch, 1)

    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 6)
        p = {
            "norm1": self.norm1.init(ks[0]),
            "conv1": self.conv1.init(ks[1]),
            "norm2": self.norm2.init(ks[2]),
            "conv2": self.conv2.init(ks[3]),
            "skip": self.skip.init(ks[4]),
        }
        if self.t_emb_dim is not None:
            p["t_proj"] = self.t_proj.init(ks[5])
        return p

    def __call__(self, p: Params, x: jax.Array, t_emb: jax.Array | None) -> jax.Array:
        h = self.conv1(p["conv1"], silu(self.norm1(p["norm1"], x)))
        if self.t_emb_dim is not None:
            # cast the (f32) time-embedding contribution to the activation
            # dtype — without this, bf16 activations silently promote to f32
            # at the first t-add and the rest of the network runs f32
            h = h + self.t_proj(p["t_proj"], silu(t_emb))[:, None, None, :].astype(h.dtype)
        h = self.conv2(p["conv2"], silu(self.norm2(p["norm2"], h)))
        return h + self.skip(p["skip"], x)

    def tl(self, p: Params, x: jax.Array, t_emb: jax.Array | None,
           hw: tuple[int, int]) -> jax.Array:
        """Transposed-layout forward: x is (C, B, L) (ops/tl_conv.py)."""
        h = self.conv1.tl(p["conv1"], silu(self.norm1.tl(p["norm1"], x)), hw)
        if self.t_emb_dim is not None:
            h = h + self.t_proj(p["t_proj"], silu(t_emb)).T[:, :, None].astype(h.dtype)
        h = self.conv2.tl(p["conv2"], silu(self.norm2.tl(p["norm2"], h)), hw)
        return h + self.skip.tl(p["skip"], x, hw)


class _AttnLayer:
    """GroupNorm + multi-head self/cross attention over flattened tokens,
    with residual add (parity: blocks.py:126-146)."""

    def __init__(self, channels: int, num_heads: int, norm_channels: int, context_dim: int | None = None):
        self.norm = GroupNorm(norm_channels, channels)
        self.context_dim = context_dim
        self.attn = MultiheadAttention(channels, num_heads)
        if context_dim is not None:
            self.ctx_proj = Linear(context_dim, channels)

    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, 3)
        p = {"norm": self.norm.init(ks[0]), "attn": self.attn.init(ks[1])}
        if self.context_dim is not None:
            p["ctx_proj"] = self.ctx_proj.init(ks[2])
        return p

    def __call__(self, p: Params, x: jax.Array, context: jax.Array | None = None) -> jax.Array:
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)
        tokens = self.norm(p["norm"], tokens)
        if self.context_dim is not None:
            assert context is not None, "context required for cross attention"
            kv = self.ctx_proj(p["ctx_proj"], context)
            out = self.attn(p["attn"], tokens, kv)
        else:
            out = self.attn(p["attn"], tokens)
        return x + out.reshape(b, h, w, c)

    def pair(self, p_a: Params, p_b: Params, xa: jax.Array, xb: jax.Array
             ) -> tuple[jax.Array, jax.Array]:
        """Two self-attention layers (different weights) with their attention
        cores batched into one kernel invocation (see
        MultiheadAttention.pair).  Self-attention only."""
        assert self.context_dim is None
        (b, h, w, c) = xa.shape
        ta = self.norm(p_a["norm"], xa.reshape(b, h * w, c))
        tb = self.norm(p_b["norm"], xb.reshape(b, h * w, c))
        oa, ob = self.attn.pair(p_a["attn"], p_b["attn"], ta, tb)
        return xa + oa.reshape(b, h, w, c), xb + ob.reshape(b, h, w, c)

    def tl(self, p: Params, x: jax.Array, context: jax.Array | None = None) -> jax.Array:
        """Transposed-layout forward: x is (C, B, L); tokens are already the
        lane axis, so no reshapes are needed around the attention op."""
        tokens = self.norm.tl(p["norm"], x)
        if self.context_dim is not None:
            assert context is not None, "context required for cross attention"
            kv = self.ctx_proj(p["ctx_proj"], context)
            out = self.attn.tl(p["attn"], tokens, kv)
        else:
            out = self.attn.tl(p["attn"], tokens)
        return x + out


class DownBlock:
    """num_layers x [resnet, (self-attn), (cross-attn)] + optional
    strided-conv 4/2/1 downsample (parity: blocks.py:31-150;
    unet_base.py DownBlock == attn=True, norm_channels=8)."""

    def __init__(
        self,
        in_ch: int,
        out_ch: int,
        t_emb_dim: int | None,
        down_sample: bool,
        num_heads: int,
        num_layers: int,
        attn: bool,
        norm_channels: int,
        cross_attn: bool = False,
        context_dim: int | None = None,
    ):
        self.num_layers = num_layers
        self.attn = attn
        self.cross_attn = cross_attn
        self.resnets = [
            _ResnetLayer(in_ch if i == 0 else out_ch, out_ch, t_emb_dim, norm_channels)
            for i in range(num_layers)
        ]
        if attn:
            self.attns = [_AttnLayer(out_ch, num_heads, norm_channels) for _ in range(num_layers)]
        if cross_attn:
            assert context_dim is not None
            self.xattns = [
                _AttnLayer(out_ch, num_heads, norm_channels, context_dim) for _ in range(num_layers)
            ]
        self.down = Conv2d(out_ch, out_ch, 4, stride=2, padding=1) if down_sample else Identity()

    def init(self, key: jax.Array) -> Params:
        n = self.num_layers
        ks = jax.random.split(key, 3 * n + 1)
        p = {"resnets": [r.init(ks[i]) for i, r in enumerate(self.resnets)]}
        if self.attn:
            p["attns"] = [a.init(ks[n + i]) for i, a in enumerate(self.attns)]
        if self.cross_attn:
            p["xattns"] = [a.init(ks[2 * n + i]) for i, a in enumerate(self.xattns)]
        p["down"] = self.down.init(ks[-1])
        return p

    def __call__(
        self,
        p: Params,
        x: jax.Array,
        t_emb: jax.Array | None = None,
        context: jax.Array | None = None,
    ) -> jax.Array:
        out = x
        for i in range(self.num_layers):
            out = self.resnets[i](p["resnets"][i], out, t_emb)
            if self.attn:
                out = self.attns[i](p["attns"][i], out)
            if self.cross_attn:
                out = self.xattns[i](p["xattns"][i], out, context)
        return self.down(p["down"], out)

    def pair(self, p_a: Params, p_b: Params, xa: jax.Array, xb: jax.Array,
             ta: jax.Array | None, tb: jax.Array | None
             ) -> tuple[jax.Array, jax.Array]:
        """Dual-trunk forward: resnets/downsample run per trunk (grouped
        convs lost the round-2 A/B — forward_fused docstring), but each
        layer's two self-attention cores batch into ONE kernel call."""
        if self.cross_attn:  # not assert: must survive python -O
            raise NotImplementedError(
                "pair() has no cross-attention path; use __call__ for cross_attn blocks")
        oa, ob = xa, xb
        for i in range(self.num_layers):
            oa = self.resnets[i](p_a["resnets"][i], oa, ta)
            ob = self.resnets[i](p_b["resnets"][i], ob, tb)
            if self.attn:
                oa, ob = self.attns[i].pair(p_a["attns"][i], p_b["attns"][i], oa, ob)
        return self.down(p_a["down"], oa), self.down(p_b["down"], ob)

    def tl(self, p: Params, x: jax.Array, t_emb=None, context=None,
           hw: tuple[int, int] = None) -> jax.Array:
        """Transposed-layout forward on (C, B, L).  If this block
        downsamples, the output grid is (hw[0]//2, hw[1]//2) — tracked
        statically by the caller."""
        out = x
        for i in range(self.num_layers):
            out = self.resnets[i].tl(p["resnets"][i], out, t_emb, hw)
            if self.attn:
                out = self.attns[i].tl(p["attns"][i], out)
            if self.cross_attn:
                out = self.xattns[i].tl(p["xattns"][i], out, context)
        if isinstance(self.down, Identity):
            return out
        return self.down.tl(p["down"], out, hw)


class MidBlock:
    """resnet, then num_layers x [self-attn, (cross-attn), resnet]
    (parity: blocks.py:153-271)."""

    def __init__(
        self,
        in_ch: int,
        out_ch: int,
        t_emb_dim: int | None,
        num_heads: int,
        num_layers: int,
        norm_channels: int,
        cross_attn: bool = False,
        context_dim: int | None = None,
    ):
        self.num_layers = num_layers
        self.cross_attn = cross_attn
        self.resnets = [
            _ResnetLayer(in_ch if i == 0 else out_ch, out_ch, t_emb_dim, norm_channels)
            for i in range(num_layers + 1)
        ]
        self.attns = [_AttnLayer(out_ch, num_heads, norm_channels) for _ in range(num_layers)]
        if cross_attn:
            assert context_dim is not None
            self.xattns = [
                _AttnLayer(out_ch, num_heads, norm_channels, context_dim) for _ in range(num_layers)
            ]

    def init(self, key: jax.Array) -> Params:
        n = self.num_layers
        ks = jax.random.split(key, 3 * n + 1)
        p = {
            "resnets": [r.init(ks[i]) for i, r in enumerate(self.resnets)],
            "attns": [a.init(ks[n + 1 + i]) for i, a in enumerate(self.attns)],
        }
        if self.cross_attn:
            p["xattns"] = [a.init(ks[2 * n + 1 + i]) for i, a in enumerate(self.xattns)]
        return p

    def __call__(
        self,
        p: Params,
        x: jax.Array,
        t_emb: jax.Array | None = None,
        context: jax.Array | None = None,
    ) -> jax.Array:
        out = self.resnets[0](p["resnets"][0], x, t_emb)
        for i in range(self.num_layers):
            out = self.attns[i](p["attns"][i], out)
            if self.cross_attn:
                out = self.xattns[i](p["xattns"][i], out, context)
            out = self.resnets[i + 1](p["resnets"][i + 1], out, t_emb)
        return out

    def pair(self, p_a: Params, p_b: Params, xa: jax.Array, xb: jax.Array,
             ta: jax.Array | None, tb: jax.Array | None
             ) -> tuple[jax.Array, jax.Array]:
        """Dual-trunk mid forward — per-trunk resnets, batched attention
        cores (see DownBlock.pair)."""
        if self.cross_attn:  # not assert: must survive python -O
            raise NotImplementedError(
                "pair() has no cross-attention path; use __call__ for cross_attn blocks")
        oa = self.resnets[0](p_a["resnets"][0], xa, ta)
        ob = self.resnets[0](p_b["resnets"][0], xb, tb)
        for i in range(self.num_layers):
            oa, ob = self.attns[i].pair(p_a["attns"][i], p_b["attns"][i], oa, ob)
            oa = self.resnets[i + 1](p_a["resnets"][i + 1], oa, ta)
            ob = self.resnets[i + 1](p_b["resnets"][i + 1], ob, tb)
        return oa, ob

    def tl(self, p: Params, x: jax.Array, t_emb=None, context=None,
           hw: tuple[int, int] = None) -> jax.Array:
        """Transposed-layout forward on (C, B, L)."""
        out = self.resnets[0].tl(p["resnets"][0], x, t_emb, hw)
        for i in range(self.num_layers):
            out = self.attns[i].tl(p["attns"][i], out)
            if self.cross_attn:
                out = self.xattns[i].tl(p["xattns"][i], out, context)
            out = self.resnets[i + 1].tl(p["resnets"][i + 1], out, t_emb, hw)
        return out


class UpBlock:
    """ConvTranspose 4/2/1 upsample + optional skip-concat + num_layers x
    [resnet, (self-attn), (cross-attn)].

    ``upsample_ch`` is the channel count of the pre-concat input:
      * UNet decoders upsample the incoming feature then concat an
        equally-sized skip, so upsample_ch = in_ch // 2
        (unet_base.py:263-269, blocks.py UpBlockUnet:461-468);
      * the VAE decoder has no skips, so upsample_ch = in_ch
        (blocks.py UpBlock:343-353).
    """

    def __init__(
        self,
        in_ch: int,
        out_ch: int,
        t_emb_dim: int | None,
        up_sample: bool,
        num_heads: int,
        num_layers: int,
        attn: bool,
        norm_channels: int,
        upsample_ch: int | None = None,
        cross_attn: bool = False,
        context_dim: int | None = None,
    ):
        self.num_layers = num_layers
        self.attn = attn
        self.cross_attn = cross_attn
        up_ch = in_ch if upsample_ch is None else upsample_ch
        self.up = ConvTranspose2d(up_ch, up_ch, 4, 2, 1) if up_sample else Identity()
        self.resnets = [
            _ResnetLayer(in_ch if i == 0 else out_ch, out_ch, t_emb_dim, norm_channels)
            for i in range(num_layers)
        ]
        if attn:
            self.attns = [_AttnLayer(out_ch, num_heads, norm_channels) for _ in range(num_layers)]
        if cross_attn:
            assert context_dim is not None
            self.xattns = [
                _AttnLayer(out_ch, num_heads, norm_channels, context_dim) for _ in range(num_layers)
            ]

    def init(self, key: jax.Array) -> Params:
        n = self.num_layers
        ks = jax.random.split(key, 3 * n + 1)
        p = {
            "up": self.up.init(ks[-1]),
            "resnets": [r.init(ks[i]) for i, r in enumerate(self.resnets)],
        }
        if self.attn:
            p["attns"] = [a.init(ks[n + i]) for i, a in enumerate(self.attns)]
        if self.cross_attn:
            p["xattns"] = [a.init(ks[2 * n + i]) for i, a in enumerate(self.xattns)]
        return p

    def __call__(
        self,
        p: Params,
        x: jax.Array,
        out_down: jax.Array | None = None,
        t_emb: jax.Array | None = None,
        context: jax.Array | None = None,
    ) -> jax.Array:
        x = self.up(p["up"], x)
        if out_down is not None:
            x = jnp.concatenate([x, out_down], axis=-1)
        out = x
        for i in range(self.num_layers):
            out = self.resnets[i](p["resnets"][i], out, t_emb)
            if self.attn:
                out = self.attns[i](p["attns"][i], out)
            if self.cross_attn:
                out = self.xattns[i](p["xattns"][i], out, context)
        return out

    def tl(self, p: Params, x: jax.Array, out_down: jax.Array | None = None,
           t_emb=None, context=None, hw: tuple[int, int] = None) -> jax.Array:
        """Transposed-layout forward.  ``hw`` is the PRE-upsample grid; when
        this block upsamples, resnets (and the skip concat) run at
        (2*hw[0], 2*hw[1]) — the caller tracks the doubled grid statically."""
        if isinstance(self.up, Identity):
            hw_out = hw
        else:
            x = self.up.tl(p["up"], x, hw)
            hw_out = (hw[0] * 2, hw[1] * 2)
        if out_down is not None:
            x = jnp.concatenate([x, out_down], axis=0)
        out = x
        for i in range(self.num_layers):
            out = self.resnets[i].tl(p["resnets"][i], out, t_emb, hw_out)
            if self.attn:
                out = self.attns[i].tl(p["attns"][i], out)
            if self.cross_attn:
                out = self.xattns[i].tl(p["xattns"][i], out, context)
        return out
