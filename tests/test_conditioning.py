"""Conditional UNet paths (unet_cond_base.py:35-163) + CFG condition-drop
utilities (utils/diffusion_utils.py:21-46)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu.models.unet import UNet
from controlnet_tpu.utils.diffusion_utils import (
    drop_class_condition,
    drop_image_condition,
    drop_text_condition,
)


def _cond_config(tiny_model_config, condition_config):
    mp = dict(tiny_model_config)
    mp["condition_config"] = condition_config
    return mp


def test_class_conditioning(tiny_model_config):
    mp = _cond_config(tiny_model_config, {
        "condition_types": ["class"],
        "class_condition_config": {"num_classes": 3},
    })
    u = UNet(1, mp)
    p = u.init(jax.random.PRNGKey(0))
    assert "class_emb" in p and p["class_emb"].shape == (3, mp["time_emb_dim"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    onehot = jax.nn.one_hot(jnp.array([0, 2]), 3)

    @jax.jit
    def f(p, x, t, cls):
        return u(p, x, t, cond_input={"class": cls})

    out = f(p, x, jnp.array([1, 2]), onehot)
    assert out.shape == x.shape
    # different class -> different output
    out2 = f(p, x, jnp.array([1, 2]), jax.nn.one_hot(jnp.array([1, 1]), 3))
    assert float(jnp.abs(out - out2).max()) > 1e-6
    # zero one-hot row == unconditional (reference skips null class,
    # unet_cond_base.py:58-60)
    out3 = f(p, x, jnp.array([1, 2]), jnp.zeros((2, 3)))
    assert out3.shape == x.shape


def test_text_cross_attention_conditioning(tiny_model_config):
    mp = _cond_config(tiny_model_config, {
        "condition_types": ["text"],
        "text_condition_config": {"text_embed_dim": 12},
    })
    u = UNet(1, mp)
    p = u.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))  # 5 tokens

    @jax.jit
    def f(p, x, t, ctx):
        return u(p, x, t, cond_input={"text": ctx})

    out = f(p, x, jnp.array([1, 2]), ctx)
    assert out.shape == x.shape
    out2 = f(p, x, jnp.array([1, 2]), ctx * 0.0)
    assert float(jnp.abs(out - out2).max()) > 1e-6


def test_image_conditioning(tiny_model_config):
    mp = _cond_config(tiny_model_config, {
        "condition_types": ["image"],
        "image_condition_config": {
            "image_condition_input_channels": 2,
            "image_condition_output_channels": 3,
        },
    })
    u = UNet(1, mp)
    p = u.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    # mask at different resolution — resized internally (unet_cond_base.py:136)
    mask = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 2))

    @jax.jit
    def f(p, x, t, m):
        return u(p, x, t, cond_input={"image": m})

    out = f(p, x, jnp.array([1, 2]), mask)
    assert out.shape == x.shape


def test_cond_required_when_configured(tiny_model_config):
    mp = _cond_config(tiny_model_config, {
        "condition_types": ["class"],
        "class_condition_config": {"num_classes": 3},
    })
    u = UNet(1, mp)
    p = u.init(jax.random.PRNGKey(0))
    with pytest.raises(AssertionError):
        u(p, jnp.zeros((1, 8, 8, 1)), jnp.array([0]), cond_input=None)


def test_drop_conditions():
    key = jax.random.PRNGKey(0)
    text = jnp.ones((8, 5, 4))
    empty = jnp.zeros((8, 5, 4))
    dropped = drop_text_condition(text, empty, key, drop_prob=1.0)
    np.testing.assert_array_equal(np.asarray(dropped), np.zeros((8, 5, 4)))
    kept = drop_text_condition(text, empty, key, drop_prob=0.0)
    np.testing.assert_array_equal(np.asarray(kept), np.ones((8, 5, 4)))

    img = jnp.ones((8, 4, 4, 3))
    gone = drop_image_condition(img, key, 1.0)
    np.testing.assert_array_equal(np.asarray(gone), np.zeros_like(gone))

    cls = jnp.ones((8, 10))
    half = drop_class_condition(cls, key, 0.5)
    rows = np.asarray(half).sum(axis=1)
    assert set(np.unique(rows)) <= {0.0, 10.0}  # whole rows dropped or kept