"""KL autoencoder (VAE) for latent diffusion.

Parity with reference models/vae.py:6-119: encoder = conv_in + DownBlocks +
MidBlocks + norm/SiLU/conv_out (2*z channels) + 1x1 pre-quant conv;
reparameterized sample; decoder = 1x1 post-quant conv + conv_in + MidBlocks +
UpBlocks (no skip concat) + norm/SiLU/conv_out.  Blocks have no time
embedding (t_emb_dim=None) and per-level attention flags.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from controlnet_tpu import config as cfg
from controlnet_tpu.nn.blocks import DownBlock, MidBlock, UpBlock
from controlnet_tpu.nn.layers import Conv2d, GroupNorm, silu

Params = Any


class VAE:
    def __init__(self, im_channels: int, model_config: Mapping[str, Any]):
        mp = model_config
        cfg.validate_vae_model_params(mp)
        self.im_channels = im_channels
        self.down_channels = mp["down_channels"]
        self.mid_channels = mp["mid_channels"]
        self.down_sample = mp["down_sample"]
        self.num_down_layers = mp["num_down_layers"]
        self.num_mid_layers = mp["num_mid_layers"]
        self.num_up_layers = mp["num_up_layers"]
        self.attns = mp["attn_down"]
        self.z_channels = mp["z_channels"]
        self.norm_channels = mp["norm_channels"]
        self.num_heads = mp["num_heads"]

        dc, mc, nc = self.down_channels, self.mid_channels, self.norm_channels

        # ----- encoder -----
        self.encoder_conv_in = Conv2d(im_channels, dc[0], 3)
        self.encoder_layers = [
            DownBlock(
                dc[i], dc[i + 1], t_emb_dim=None, down_sample=self.down_sample[i],
                num_heads=self.num_heads, num_layers=self.num_down_layers,
                attn=self.attns[i], norm_channels=nc,
            )
            for i in range(len(dc) - 1)
        ]
        self.encoder_mids = [
            MidBlock(mc[i], mc[i + 1], t_emb_dim=None, num_heads=self.num_heads,
                     num_layers=self.num_mid_layers, norm_channels=nc)
            for i in range(len(mc) - 1)
        ]
        self.encoder_norm_out = GroupNorm(nc, dc[-1])
        self.encoder_conv_out = Conv2d(dc[-1], 2 * self.z_channels, 3)
        self.pre_quant_conv = Conv2d(2 * self.z_channels, 2 * self.z_channels, 1)

        # ----- decoder -----
        self.post_quant_conv = Conv2d(self.z_channels, self.z_channels, 1)
        self.decoder_conv_in = Conv2d(self.z_channels, mc[-1], 3)
        self.decoder_mids = [
            MidBlock(mc[i], mc[i - 1], t_emb_dim=None, num_heads=self.num_heads,
                     num_layers=self.num_mid_layers, norm_channels=nc)
            for i in reversed(range(1, len(mc)))
        ]
        # VAE UpBlocks have no skip concat: upsample_ch = in_ch (blocks.py:343-345).
        self.decoder_layers = [
            UpBlock(
                dc[i], dc[i - 1], t_emb_dim=None, up_sample=self.down_sample[i - 1],
                num_heads=self.num_heads, num_layers=self.num_up_layers,
                attn=self.attns[i - 1], norm_channels=nc, upsample_ch=dc[i],
            )
            for i in reversed(range(1, len(dc)))
        ]
        self.decoder_norm_out = GroupNorm(nc, dc[0])
        self.decoder_conv_out = Conv2d(dc[0], im_channels, 3)

    def init(self, key: jax.Array) -> Params:
        # 8 fixed consumers (conv_in/out, norm_out, pre/post_quant x2 sides)
        # plus one per block — the count documents the consumer list below
        n = (
            4
            + len(self.encoder_layers)
            + len(self.encoder_mids)
            + 4
            + len(self.decoder_mids)
            + len(self.decoder_layers)
        )
        ks = list(jax.random.split(key, n))
        return {
            "encoder_conv_in": self.encoder_conv_in.init(ks.pop()),
            "encoder_layers": [b.init(ks.pop()) for b in self.encoder_layers],
            "encoder_mids": [b.init(ks.pop()) for b in self.encoder_mids],
            "encoder_norm_out": self.encoder_norm_out.init(ks.pop()),
            "encoder_conv_out": self.encoder_conv_out.init(ks.pop()),
            "pre_quant_conv": self.pre_quant_conv.init(ks.pop()),
            "post_quant_conv": self.post_quant_conv.init(ks.pop()),
            "decoder_conv_in": self.decoder_conv_in.init(ks.pop()),
            "decoder_mids": [b.init(ks.pop()) for b in self.decoder_mids],
            "decoder_layers": [b.init(ks.pop()) for b in self.decoder_layers],
            "decoder_norm_out": self.decoder_norm_out.init(ks.pop()),
            "decoder_conv_out": self.decoder_conv_out.init(ks.pop()),
        }

    def moments(self, p: Params, x: jax.Array) -> jax.Array:
        """Encoder output before sampling: (B, h, w, 2*z) = mean || logvar
        (vae.py:87-97)."""
        out = self.encoder_conv_in(p["encoder_conv_in"], x)
        for blk, bp in zip(self.encoder_layers, p["encoder_layers"]):
            out = blk(bp, out)
        for blk, bp in zip(self.encoder_mids, p["encoder_mids"]):
            out = blk(bp, out)
        out = silu(self.encoder_norm_out(p["encoder_norm_out"], out))
        out = self.encoder_conv_out(p["encoder_conv_out"], out)
        return self.pre_quant_conv(p["pre_quant_conv"], out)

    def encode(self, p: Params, x: jax.Array, key: jax.Array):
        """Returns (reparameterized sample, mean||logvar) like vae.py:87-100."""
        enc = self.moments(p, x)
        mean, logvar = jnp.split(enc, 2, axis=-1)
        std = jnp.exp(0.5 * logvar)
        sample = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return sample, enc

    def decode(self, p: Params, z: jax.Array) -> jax.Array:
        out = self.post_quant_conv(p["post_quant_conv"], z)
        out = self.decoder_conv_in(p["decoder_conv_in"], out)
        for blk, bp in zip(self.decoder_mids, p["decoder_mids"]):
            out = blk(bp, out)
        for blk, bp in zip(self.decoder_layers, p["decoder_layers"]):
            out = blk(bp, out)
        out = silu(self.decoder_norm_out(p["decoder_norm_out"], out))
        return self.decoder_conv_out(p["decoder_conv_out"], out)

    def __call__(self, p: Params, x: jax.Array, key: jax.Array):
        z, enc = self.encode(p, x, key)
        return self.decode(p, z), enc
