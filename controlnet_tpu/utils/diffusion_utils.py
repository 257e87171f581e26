"""Classifier-free-guidance condition dropping + latent cache re-export.

Parity with reference utils/diffusion_utils.py:7-46.  As in the reference,
the drop_* helpers are provided as library capability; no trainer wires them
in by default (SURVEY.md component #19).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from controlnet_tpu.data.datasets import load_latents  # re-export (ref :7-18)

__all__ = ["load_latents", "drop_text_condition", "drop_image_condition", "drop_class_condition"]


def drop_text_condition(text_embed: jax.Array, empty_text_embed: jax.Array,
                        key: jax.Array, drop_prob: float) -> jax.Array:
    """Replace each sample's text embedding with the empty-prompt embedding
    with probability drop_prob (ref :21-29)."""
    if drop_prob <= 0:
        return text_embed
    b = text_embed.shape[0]
    drop = jax.random.bernoulli(key, drop_prob, (b,))
    mask = drop.reshape(b, *([1] * (text_embed.ndim - 1)))
    return jnp.where(mask, empty_text_embed, text_embed)


def drop_image_condition(image_condition: jax.Array, key: jax.Array, drop_prob: float) -> jax.Array:
    """Zero the conditioning image with probability drop_prob (ref :31-38)."""
    if drop_prob <= 0:
        return image_condition
    b = image_condition.shape[0]
    keep = 1.0 - jax.random.bernoulli(key, drop_prob, (b,)).astype(image_condition.dtype)
    return image_condition * keep.reshape(b, *([1] * (image_condition.ndim - 1)))


def drop_class_condition(class_onehot: jax.Array, key: jax.Array, drop_prob: float) -> jax.Array:
    """Zero the one-hot class row with probability drop_prob (ref :40-46)."""
    if drop_prob <= 0:
        return class_onehot
    b = class_onehot.shape[0]
    keep = 1.0 - jax.random.bernoulli(key, drop_prob, (b,)).astype(class_onehot.dtype)
    return class_onehot * keep.reshape(b, *([1] * (class_onehot.ndim - 1)))
