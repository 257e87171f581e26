"""The UNet — one implementation covering both reference variants.

* models/unet_base.py:292-374 ("base" UNet: MNIST/CIFAR pixel DDPM and all
  distilled students) == this UNet with defaults attn_down all-True,
  norm_channels=8, conv_out_channels=16, no conditioning.
* models/unet_cond_base.py:9-184 ("conditional"/LDM UNet) == this UNet with
  per-level attn flags, norm_channels/num_heads/conv_out_channels from
  config, and optional class / text (cross-attn) / image conditioning.

epsilon-prediction topology (channels [C1..C4], mids [C4, C4, C3]):
    conv_in -> downs (skips saved) -> mids -> ups (skip concat) ->
    norm_out -> SiLU -> conv_out

The forward is a pure function of (params, x, t, cond) — ControlNet composes
with it by calling the exposed stage methods (conv_in/down_stage/mid_stage/
decode) on separate frozen vs. trainable parameter trees.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp

from controlnet_tpu import config as cfg
from controlnet_tpu.nn.blocks import DownBlock, MidBlock, UpBlock
from controlnet_tpu.nn.layers import Conv2d, GroupNorm, Linear, get_time_embedding, silu

Params = Any


class UNet:
    def __init__(self, im_channels: int, model_config: Mapping[str, Any], use_up: bool = True):
        mp = model_config
        self.im_channels = im_channels
        self.down_channels: Sequence[int] = mp["down_channels"]
        self.mid_channels: Sequence[int] = mp["mid_channels"]
        self.t_emb_dim: int = mp["time_emb_dim"]
        self.down_sample: Sequence[bool] = mp["down_sample"]
        self.num_down_layers: int = mp["num_down_layers"]
        self.num_mid_layers: int = mp["num_mid_layers"]
        self.num_up_layers: int = mp["num_up_layers"]
        # Optional keys — defaults reproduce the hardcoded base UNet
        # (unet_base.py:31-339: GroupNorm(8), attention always on, 16ch final
        # decoder stage).
        self.attns: Sequence[bool] = mp.get("attn_down", [True] * (len(self.down_channels) - 1))
        self.norm_channels: int = mp.get("norm_channels", 8)
        self.num_heads: int = mp.get("num_heads", 4)
        self.conv_out_channels: int = mp.get("conv_out_channels", 16)
        # Optional per-block rematerialization: trades recompute for HBM
        # (jax.checkpoint), useful for the O(100M)-param CelebHQ LDM config.
        self.remat: bool = bool(mp.get("remat", False))
        self.use_up = use_up

        cfg.validate_unet_model_params(mp)
        assert len(self.attns) == len(self.down_channels) - 1

        # --- conditioning (unet_cond_base.py:35-76) ---
        self.class_cond = False
        self.text_cond = False
        self.image_cond = False
        self.text_embed_dim = None
        self.condition_config = cfg.get_config_value(mp, "condition_config", None)
        if self.condition_config is not None:
            condition_types = self.condition_config["condition_types"]
            if "class" in condition_types:
                cfg.validate_class_config(self.condition_config)
                self.class_cond = True
                self.num_classes = self.condition_config["class_condition_config"]["num_classes"]
            if "text" in condition_types:
                cfg.validate_text_config(self.condition_config)
                self.text_cond = True
                self.text_embed_dim = self.condition_config["text_condition_config"]["text_embed_dim"]
            if "image" in condition_types:
                cfg.validate_image_config(self.condition_config)
                self.image_cond = True
                icc = self.condition_config["image_condition_config"]
                self.im_cond_input_ch = icc["image_condition_input_channels"]
                self.im_cond_output_ch = icc["image_condition_output_channels"]
        self.cond = self.class_cond or self.text_cond or self.image_cond

        if self.image_cond:
            self.cond_conv_in = Conv2d(self.im_cond_input_ch, self.im_cond_output_ch, 1, use_bias=False)
            self.conv_in = Conv2d(im_channels + self.im_cond_output_ch, self.down_channels[0], 3)
        else:
            self.conv_in = Conv2d(im_channels, self.down_channels[0], 3)

        self.t_proj1 = Linear(self.t_emb_dim, self.t_emb_dim)
        self.t_proj2 = Linear(self.t_emb_dim, self.t_emb_dim)

        self.downs = [
            DownBlock(
                self.down_channels[i],
                self.down_channels[i + 1],
                self.t_emb_dim,
                down_sample=self.down_sample[i],
                num_heads=self.num_heads,
                num_layers=self.num_down_layers,
                attn=self.attns[i],
                norm_channels=self.norm_channels,
                cross_attn=self.text_cond,
                context_dim=self.text_embed_dim,
            )
            for i in range(len(self.down_channels) - 1)
        ]
        self.mids = [
            MidBlock(
                self.mid_channels[i],
                self.mid_channels[i + 1],
                self.t_emb_dim,
                num_heads=self.num_heads,
                num_layers=self.num_mid_layers,
                norm_channels=self.norm_channels,
                cross_attn=self.text_cond,
                context_dim=self.text_embed_dim,
            )
            for i in range(len(self.mid_channels) - 1)
        ]
        if use_up:
            # Decoder: i walks len(down_channels)-2 .. 0; input is
            # [upsampled features || skip], both down_channels[i] wide
            # (unet_base.py:332-339, unet_cond_base.py:110-123).
            self.ups = [
                UpBlock(
                    self.down_channels[i] * 2,
                    self.down_channels[i - 1] if i != 0 else self.conv_out_channels,
                    self.t_emb_dim,
                    up_sample=self.down_sample[i],
                    num_heads=self.num_heads,
                    num_layers=self.num_up_layers,
                    attn=True,
                    norm_channels=self.norm_channels,
                    upsample_ch=self.down_channels[i],
                    cross_attn=self.text_cond,
                    context_dim=self.text_embed_dim,
                )
                for i in reversed(range(len(self.down_channels) - 1))
            ]
            self.norm_out = GroupNorm(self.norm_channels, self.conv_out_channels)
            self.conv_out = Conv2d(self.conv_out_channels, im_channels, 3)

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init(self, key: jax.Array) -> Params:
        n_keys = 4 + len(self.downs) + len(self.mids) + (len(self.ups) + 2 if self.use_up else 0) + 2
        ks = list(jax.random.split(key, n_keys))
        p: dict = {
            "conv_in": self.conv_in.init(ks.pop()),
            "t_proj1": self.t_proj1.init(ks.pop()),
            "t_proj2": self.t_proj2.init(ks.pop()),
            "downs": [d.init(ks.pop()) for d in self.downs],
            "mids": [m.init(ks.pop()) for m in self.mids],
        }
        if self.class_cond:
            p["class_emb"] = jax.random.normal(ks.pop(), (self.num_classes, self.t_emb_dim)) * 1.0
        if self.image_cond:
            p["cond_conv_in"] = self.cond_conv_in.init(ks.pop())
        if self.use_up:
            p["ups"] = [u.init(ks.pop()) for u in self.ups]
            p["norm_out"] = self.norm_out.init(ks.pop())
            p["conv_out"] = self.conv_out.init(ks.pop())
        return p

    # ------------------------------------------------------------------
    # staged forward (used directly by ControlNet / distilled students)
    # ------------------------------------------------------------------
    def time_embed(self, p: Params, t: jax.Array) -> jax.Array:
        """Sinusoidal embedding + 2-layer MLP projection
        (unet_base.py:312-317, 346-348)."""
        t_emb = get_time_embedding(jnp.asarray(t, jnp.int32), self.t_emb_dim)
        t_emb = self.t_proj1(p["t_proj1"], t_emb)
        return self.t_proj2(p["t_proj2"], silu(t_emb))

    def stem(self, p: Params, x: jax.Array, cond_input=None) -> jax.Array:
        """conv_in, with optional image-conditioning concat
        (unet_cond_base.py:132-145)."""
        if self.image_cond:
            cfg.validate_image_conditional_input(cond_input, x)
            im_cond = cond_input["image"]
            im_cond = jax.image.resize(
                im_cond, (im_cond.shape[0], x.shape[1], x.shape[2], im_cond.shape[3]), "nearest"
            )
            im_cond = self.cond_conv_in(p["cond_conv_in"], im_cond)
            x = jnp.concatenate([x, im_cond], axis=-1)
        return self.conv_in(p["conv_in"], x)

    def _block(self, blk):
        """Apply jax.checkpoint per block when remat is enabled."""
        if not self.remat:
            return blk
        return jax.checkpoint(lambda bp, *xs: blk(bp, *xs))

    def encode(self, p: Params, out: jax.Array, t_emb, context=None):
        """Run all down blocks, returning (out, skip list) — skips are the
        *inputs* to each down block (unet_base.py:354-358)."""
        down_outs = []
        for blk, bp in zip(self.downs, p["downs"]):
            down_outs.append(out)
            out = self._block(blk)(bp, out, t_emb, context)
        return out, down_outs

    def mid_stage(self, p: Params, i: int, out: jax.Array, t_emb, context=None) -> jax.Array:
        return self._block(self.mids[i])(p["mids"][i], out, t_emb, context)

    def decode(self, p: Params, out: jax.Array, down_outs: list, t_emb, context=None) -> jax.Array:
        down_outs = list(down_outs)  # consume a copy (decode_tl contract)
        for blk, bp in zip(self.ups, p["ups"]):
            skip = down_outs.pop()
            out = self._block(blk)(bp, out, skip, t_emb, context)
        out = silu(self.norm_out(p["norm_out"], out))
        return self.conv_out(p["conv_out"], out)

    # ------------------------------------------------------------------
    # transposed-layout (TL) staged forward — the channel-padding fix
    # (ops/tl_conv.py).  Activations are (C, B, L); spatial dims are
    # tracked statically alongside.  Numerics == the NHWC path
    # (tests/test_tl_parity.py), which in turn matches torch
    # (tests/test_torch_parity.py).
    # ------------------------------------------------------------------
    def stem_tl(self, p: Params, x: jax.Array, cond_input=None):
        """NHWC input -> (TL features, hw).  Image conditioning is merged in
        NHWC (it is a one-time 1x1 conv + resize, unet_cond_base.py:132-145)."""
        from controlnet_tpu.ops.tl_conv import to_tl

        hw = (x.shape[1], x.shape[2])
        if self.image_cond:
            cfg.validate_image_conditional_input(cond_input, x)
            im_cond = cond_input["image"]
            im_cond = jax.image.resize(
                im_cond, (im_cond.shape[0], x.shape[1], x.shape[2], im_cond.shape[3]), "nearest"
            )
            im_cond = self.cond_conv_in(p["cond_conv_in"], im_cond)
            x = jnp.concatenate([x, im_cond], axis=-1)
        return self.conv_in.tl(p["conv_in"], to_tl(x), hw), hw

    def encode_tl(self, p: Params, out: jax.Array, t_emb, hw, context=None):
        """Down path in TL.  Returns (out, skips, hws, hw_out); skips[i] and
        hws[i] are the input feature/grid of down block i (the skip contract,
        unet_base.py:354-358)."""
        down_outs, hws = [], []
        for i, (blk, bp) in enumerate(zip(self.downs, p["downs"])):
            down_outs.append(out)
            hws.append(hw)
            out = blk.tl(bp, out, t_emb, context, hw=hw)
            if self.down_sample[i]:
                hw = (hw[0] // 2, hw[1] // 2)
        return out, down_outs, hws, hw

    def mid_stage_tl(self, p: Params, i: int, out, t_emb, hw, context=None):
        return self.mids[i].tl(p["mids"][i], out, t_emb, context, hw=hw)

    def decode_tl(self, p: Params, out, down_outs: list, hws: list, t_emb,
                  hw, context=None) -> jax.Array:
        """Up path in TL; returns NHWC output."""
        from controlnet_tpu.ops.tl_conv import from_tl

        down_outs, hws = list(down_outs), list(hws)
        for blk, bp in zip(self.ups, p["ups"]):
            skip, skip_hw = down_outs.pop(), hws.pop()
            out = blk.tl(bp, out, skip, t_emb, context, hw=hw)
            hw = skip_hw
        out = silu(self.norm_out.tl(p["norm_out"], out))
        out = self.conv_out.tl(p["conv_out"], out, hw)
        return from_tl(out, hw)

    def forward_tl(self, p: Params, x: jax.Array, t: jax.Array, cond_input=None) -> jax.Array:
        """Full forward in transposed layout (NHWC in/out).  Preferred for
        sampling loops: physical/logical FLOP ratio ~1.4x vs 4.7x NHWC."""
        if self.cond:
            assert cond_input is not None, "model initialized with conditioning; cond_input required"
        out, hw = self.stem_tl(p, x, cond_input)
        t_emb = self.time_embed(p, t)
        if self.class_cond:
            cfg.validate_class_conditional_input(cond_input, x, self.num_classes)
            t_emb = t_emb + jnp.dot(cond_input["class"].astype(t_emb.dtype), p["class_emb"])
        context = cond_input.get("text") if (self.text_cond and cond_input is not None) else None
        out, down_outs, hws, hw = self.encode_tl(p, out, t_emb, hw, context)
        for i in range(len(self.mids)):
            out = self.mid_stage_tl(p, i, out, t_emb, hw, context)
        return self.decode_tl(p, out, down_outs, hws, t_emb, hw, context)

    # ------------------------------------------------------------------
    # full forward
    # ------------------------------------------------------------------
    def __call__(self, p: Params, x: jax.Array, t: jax.Array, cond_input=None) -> jax.Array:
        """epsilon = UNet(x_t, t [, cond]).  x: (B, H, W, C)."""
        if self.cond:
            assert cond_input is not None, "model initialized with conditioning; cond_input required"

        out = self.stem(p, x, cond_input)
        t_emb = self.time_embed(p, t)

        if self.class_cond:
            cfg.validate_class_conditional_input(cond_input, x, self.num_classes)
            # one-hot (B, num_classes) @ (num_classes, D) added to t_emb
            # (unet_cond_base.py:153-156)
            t_emb = t_emb + jnp.dot(cond_input["class"].astype(t_emb.dtype), p["class_emb"])

        context = cond_input.get("text") if (self.text_cond and cond_input is not None) else None

        out, down_outs = self.encode(p, out, t_emb, context)
        for i in range(len(self.mids)):
            out = self.mid_stage(p, i, out, t_emb, context)
        return self.decode(p, out, down_outs, t_emb, context)
