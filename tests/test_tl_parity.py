"""Transposed-layout (TL) compute path == NHWC path, op by op and
end-to-end.

The TL path (ops/tl_conv.py, .tl() methods) is the channel-padding perf fix
for TPU; its correctness contract is exact agreement (float tolerance) with
the NHWC layers, which themselves match torch (tests/test_torch_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu.nn.layers import Conv2d, ConvTranspose2d, GroupNorm
from controlnet_tpu.ops.tl_conv import (
    conv1x1_tl,
    conv3x3_tl,
    downconv4_tl,
    from_tl,
    group_norm_tl,
    to_tl,
    upconvT4_tl,
)

TOL = dict(rtol=2e-5, atol=2e-5)


def _rand_nhwc(key, b, h, w, c):
    return jax.random.normal(key, (b, h, w, c), jnp.float32)


@pytest.mark.parametrize("b,h,w,cin,cout", [(2, 8, 8, 8, 16), (3, 7, 5, 4, 8), (2, 8, 8, 1, 8)])
def test_conv3x3_tl(b, h, w, cin, cout):
    key = jax.random.PRNGKey(0)
    layer = Conv2d(cin, cout, 3)
    p = layer.init(key)
    x = _rand_nhwc(jax.random.PRNGKey(1), b, h, w, cin)
    ref = layer(p, x)
    out = from_tl(conv3x3_tl(p["w"], p["b"], to_tl(x), (h, w), use_pallas=False), (h, w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_conv1x1_tl():
    layer = Conv2d(8, 16, 1)
    p = layer.init(jax.random.PRNGKey(0))
    x = _rand_nhwc(jax.random.PRNGKey(1), 2, 6, 6, 8)
    ref = layer(p, x)
    out = from_tl(conv1x1_tl(p["w"], p["b"], to_tl(x)), (6, 6))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


@pytest.mark.parametrize("b,h,w,cin,cout", [(2, 8, 8, 8, 16), (1, 12, 6, 4, 4), (2, 16, 16, 3, 16)])
def test_conv3x3s2_tl(b, h, w, cin, cout):
    """The LDM hint-encoder downsample (3x3 stride-2 pad-1)."""
    from controlnet_tpu.ops.tl_conv import conv3x3s2_tl

    layer = Conv2d(cin, cout, 3, stride=2, padding=1)
    p = layer.init(jax.random.PRNGKey(0))
    x = _rand_nhwc(jax.random.PRNGKey(1), b, h, w, cin)
    ref = layer(p, x)
    out = from_tl(conv3x3s2_tl(p["w"], p["b"], to_tl(x), (h, w)), (h // 2, w // 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_dynamic_hint_block_tl_matches_nhwc():
    """The full LDM hint encoder in TL layout (the CelebHQ HBM-padding fix,
    models/controlnet.py hint_features) == NHWC forward, values and grads."""
    from controlnet_tpu.models.controlnet import _dynamic_hint_block
    from controlnet_tpu.ops.tl_conv import to_tl as _to_tl

    blk = _dynamic_hint_block(3, 16, down_sample_factor=4)
    p = blk.init(jax.random.PRNGKey(0))
    # zero-conv tail would make outputs trivially 0 — randomize it
    p["layers"][-1]["w"] = jax.random.normal(
        jax.random.PRNGKey(2), p["layers"][-1]["w"].shape) * 0.1
    hint = _rand_nhwc(jax.random.PRNGKey(1), 2, 16, 16, 3)
    ref = blk(p, hint)

    def tl_fwd(p, hint):
        out, out_hw = blk.tl(p, _to_tl(hint), hint.shape[1:3])
        return from_tl(out, out_hw)

    out = tl_fwd(p, hint)
    assert out.shape == ref.shape == (2, 4, 4, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)

    g_ref = jax.grad(lambda p: jnp.sum(blk(p, hint) ** 2))(p)
    g_tl = jax.grad(lambda p: jnp.sum(tl_fwd(p, hint) ** 2))(p)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4), g_tl, g_ref)


@pytest.mark.parametrize("b,h,w,cin,cout", [(2, 8, 8, 8, 16), (1, 12, 6, 4, 4)])
def test_downconv4_tl(b, h, w, cin, cout):
    layer = Conv2d(cin, cout, 4, stride=2, padding=1)
    p = layer.init(jax.random.PRNGKey(0))
    x = _rand_nhwc(jax.random.PRNGKey(1), b, h, w, cin)
    ref = layer(p, x)
    out = from_tl(downconv4_tl(p["w"], p["b"], to_tl(x), (h, w)), (h // 2, w // 2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


@pytest.mark.parametrize("b,h,w,cin,cout", [(2, 4, 4, 8, 8), (1, 6, 3, 4, 8)])
def test_upconvT4_tl(b, h, w, cin, cout):
    layer = ConvTranspose2d(cin, cout, 4, 2, 1)
    p = layer.init(jax.random.PRNGKey(0))
    x = _rand_nhwc(jax.random.PRNGKey(1), b, h, w, cin)
    ref = layer(p, x)
    out = from_tl(upconvT4_tl(p["w"], p["b"], to_tl(x), (h, w)), (2 * h, 2 * w))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_group_norm_tl():
    layer = GroupNorm(4, 16)
    p = layer.init(jax.random.PRNGKey(0))
    p = {"scale": p["scale"] * 1.3 + 0.1, "bias": p["bias"] + 0.2}
    x = _rand_nhwc(jax.random.PRNGKey(1), 2, 5, 5, 16)
    ref = layer(p, x)
    out = from_tl(group_norm_tl(p["scale"], p["bias"], to_tl(x), 4), (5, 5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_pallas_conv3x3_interpret_matches_xla():
    """Kernel math check via the Pallas interpreter (runs on CPU)."""
    from controlnet_tpu.ops.pallas_conv import pallas_conv3x3_tl

    cin, cout, b, h, w = 8, 16, 4, 6, 7
    layer = Conv2d(cin, cout, 3)
    p = layer.init(jax.random.PRNGKey(0))
    x = _rand_nhwc(jax.random.PRNGKey(1), b, h, w, cin)
    ref = conv3x3_tl(p["w"], p["b"], to_tl(x), (h, w), use_pallas=False)
    out = pallas_conv3x3_tl(p["w"], p["b"], to_tl(x), (h, w), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_pallas_conv3x3_grad_matches_xla():
    """The custom VJP (used under jit for TL training) equals the autodiff
    gradients of the XLA einsum path."""
    from controlnet_tpu.ops.pallas_conv import pallas_conv3x3_tl

    cin, cout, b, h, w = 8, 8, 2, 4, 4
    layer = Conv2d(cin, cout, 3)
    p = layer.init(jax.random.PRNGKey(0))
    x_tl = to_tl(_rand_nhwc(jax.random.PRNGKey(1), b, h, w, cin))

    def loss_pl(w_, b_, x_):
        return (pallas_conv3x3_tl(w_, b_, x_, (h, w), interpret=True) ** 2).sum()

    def loss_xla(w_, b_, x_):
        return (conv3x3_tl(w_, b_, x_, (h, w), use_pallas=False) ** 2).sum()

    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2))(p["w"], p["b"], x_tl)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(p["w"], p["b"], x_tl)
    for a, b_ in zip(g_pl, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-4)


def test_unet_forward_tl_matches_nhwc(tiny_model_config):
    from controlnet_tpu.models.unet import UNet

    unet = UNet(1, tiny_model_config)
    p = unet.init(jax.random.PRNGKey(0))
    x = _rand_nhwc(jax.random.PRNGKey(1), 2, 8, 8, 1)
    t = jnp.array([3, 5])
    ref = unet(p, x, t)
    out = unet.forward_tl(p, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_cond_unet_forward_tl_matches_nhwc():
    """LDM-style config: per-level attn flags, class+text+image conditioning."""
    from controlnet_tpu.models.unet import UNet

    mp = dict(
        down_channels=[8, 16, 16],
        mid_channels=[16, 16],
        down_sample=[True, False],
        attn_down=[False, True],
        time_emb_dim=8,
        norm_channels=4,
        num_heads=2,
        conv_out_channels=8,
        num_down_layers=1,
        num_mid_layers=1,
        num_up_layers=1,
        condition_config=dict(
            condition_types=["class", "text", "image"],
            class_condition_config=dict(num_classes=3, cond_drop_prob=0.0),
            text_condition_config=dict(
                text_embed_model="clip", text_embed_dim=8, cond_drop_prob=0.0
            ),
            image_condition_config=dict(
                image_condition_input_channels=3,
                image_condition_output_channels=2,
                image_condition_h=8,
                image_condition_w=8,
                cond_drop_prob=0.0,
            ),
        ),
    )
    unet = UNet(2, mp)
    p = unet.init(jax.random.PRNGKey(0))
    x = _rand_nhwc(jax.random.PRNGKey(1), 2, 8, 8, 2)
    t = jnp.array([1, 6])
    cond = {
        "class": jax.nn.one_hot(jnp.array([0, 2]), 3),
        "text": jax.random.normal(jax.random.PRNGKey(2), (2, 5, 8)),
        "image": jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3)),
    }
    ref = unet(p, x, t, cond)
    out = unet.forward_tl(p, x, t, cond)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_controlnet_forward_tl_matches_nhwc(tiny_model_config):
    from controlnet_tpu.models.controlnet import ControlNet

    cn = ControlNet(1, tiny_model_config)
    p = cn.init(jax.random.PRNGKey(0))
    # perturb zero convs so the control branch actually contributes
    p = jax.tree.map(lambda a: a + 0.01, p)
    x = _rand_nhwc(jax.random.PRNGKey(1), 2, 8, 8, 1)
    hint = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    t = jnp.array([3, 5])
    ref = cn(p, x, t, hint)
    out = cn.forward_tl(p, x, t, hint)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)
