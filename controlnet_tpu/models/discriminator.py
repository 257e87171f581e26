"""PatchGAN discriminator (parity: reference models/discriminator.py:5-41).

4 conv layers mapping NHWC images to a 1-channel grid of patch logits;
BatchNorm on all but the first and last layers, LeakyReLU(0.2) on all but
the last.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax

from controlnet_tpu.nn.layers import BatchNorm, Conv2d, leaky_relu

Params = Any


class Discriminator:
    def __init__(
        self,
        im_channels: int = 3,
        conv_channels: Sequence[int] = (64, 128, 256),
        kernels: Sequence[int] = (4, 4, 4, 4),
        strides: Sequence[int] = (2, 2, 2, 1),
        paddings: Sequence[int] = (1, 1, 1, 1),
    ):
        dims = [im_channels] + list(conv_channels) + [1]
        self.n = len(dims) - 1
        self.convs = [
            Conv2d(dims[i], dims[i + 1], kernels[i], strides[i], paddings[i],
                   use_bias=(i == 0))
            for i in range(self.n)
        ]
        # BatchNorm except on first and last layers (discriminator.py:31).
        self.norms = [
            BatchNorm(dims[i + 1]) if (i != self.n - 1 and i != 0) else None
            for i in range(self.n)
        ]

    def init(self, key: jax.Array) -> Params:
        ks = jax.random.split(key, self.n)
        return {
            "convs": [c.init(ks[i]) for i, c in enumerate(self.convs)],
            "norms": [n.init(ks[i]) if n is not None else {} for i, n in enumerate(self.norms)],
        }

    def __call__(self, p: Params, x: jax.Array) -> jax.Array:
        out = x
        for i in range(self.n):
            out = self.convs[i](p["convs"][i], out)
            if self.norms[i] is not None:
                out = self.norms[i](p["norms"][i], out)
            if i != self.n - 1:
                out = leaky_relu(out)
        return out
