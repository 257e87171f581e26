"""Train-step factories: one step runs, loss is finite, params move,
frozen trees stay frozen (SURVEY.md §4: fake-data end-to-end runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from controlnet_tpu.models.consistency import ConsistencyDistilled
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.discriminator import Discriminator
from controlnet_tpu.models.dmd import DistributionMatchingDistilled
from controlnet_tpu.models.lpips import LPIPS
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.models.vae import VAE
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import (
    make_consistency_train_step,
    make_controlnet_train_step,
    make_ddpm_train_step,
    make_dmd_train_step,
    make_vae_gan_train_step,
)
from controlnet_tpu.train.state import create_train_state


def _params_moved(p0, p1) -> bool:
    return any(
        float(jnp.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
    )


def test_ddpm_train_step(tiny_model_config):
    sched = make_linear_schedule(100, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    tx = optax.adam(1e-3)
    state = create_train_state(u.init(jax.random.PRNGKey(0)), tx)
    step = make_ddpm_train_step(lambda p, x, t: u(p, x, t), sched, tx)
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 1), minval=-1, maxval=1)
    p0 = jax.tree.map(jnp.copy, state.params)
    state, loss = step(state, images, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert int(state.step) == 1
    assert _params_moved(p0, state.params)


def test_controlnet_train_step_freezes_trunk(tiny_model_config):
    sched = make_linear_schedule(100, 1e-4, 0.02)
    cn = ControlNet(1, tiny_model_config)
    cp = cn.init(jax.random.PRNGKey(0))
    trainable, frozen = cn.split_params(cp)
    tx = optax.adam(1e-3)
    state = create_train_state(trainable, tx)
    step = make_controlnet_train_step(cn, sched, tx)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1), minval=-1, maxval=1)
    hints = jnp.zeros((2, 8, 8, 3))
    frozen0 = jax.tree.map(jnp.copy, frozen)
    t0 = jax.tree.map(jnp.copy, trainable)
    state, loss = step(state, frozen, images, hints, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    assert _params_moved(t0, state.params)  # control branch trains
    assert not _params_moved(frozen0, frozen)  # trunk untouched


@pytest.mark.slow
def test_consistency_train_step_modes(tiny_model_config):
    model = ConsistencyDistilled(1, tiny_model_config, use_ddpm_teacher=True)
    p = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1), minval=-1, maxval=1)
    hint = jnp.zeros((2, 8, 8, 3))

    for mode in ["ddpm_distillation", "consistency_only", "manual"]:
        state = create_train_state(jax.tree.map(jnp.copy, p["student"]), tx)
        ema = jax.tree.map(jnp.copy, p["ema_teacher"])
        step = make_consistency_train_step(model, tx, mode=mode, total_epochs=10)
        state, ema, metrics = step(
            state, ema, p["teacher"], x0, hint, jax.random.PRNGKey(2), jnp.int32(0)
        )
        for v in metrics.values():
            assert np.isfinite(float(v)), mode
        # EMA moved toward student
        assert _params_moved(p["ema_teacher"], ema)


@pytest.mark.slow
def test_dmd_train_step_and_nan_guard(tiny_model_config):
    model = DistributionMatchingDistilled(1, tiny_model_config)
    p = model.init(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3, weight_decay=1e-6))
    state = create_train_state(p["student"], tx)
    step = make_dmd_train_step(model, tx)
    x0 = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1), minval=-1, maxval=1)
    hint = jnp.zeros((2, 8, 8, 3))
    state, metrics = step(state, p["teacher"], p["features"], x0, hint, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["skipped"]) == 0.0
    assert np.isfinite(float(metrics["grad_norm"]))  # pre-clip norm, logged

    # NaN input -> skipped step, params unchanged
    p_before = jax.tree.map(jnp.copy, state.params)
    state2, metrics2 = step(state, p["teacher"], p["features"],
                            x0 * jnp.nan, hint, jax.random.PRNGKey(3))
    assert float(metrics2["skipped"]) == 1.0
    assert not _params_moved(p_before, state2.params)


@pytest.mark.slow
def test_vae_gan_train_step_disc_gating(tiny_vae_config):
    vae = VAE(3, tiny_vae_config)
    disc = Discriminator(im_channels=3, conv_channels=[8, 16], kernels=[4, 4, 4],
                         strides=[2, 2, 1], paddings=[1, 1, 1])
    lp = LPIPS()
    tx_g = optax.adam(1e-4, b1=0.5, b2=0.999)
    tx_d = optax.adam(1e-4, b1=0.5, b2=0.999)
    g_state = create_train_state(vae.init(jax.random.PRNGKey(0)), tx_g)
    d_state = create_train_state(disc.init(jax.random.PRNGKey(1)), tx_d)
    lpips_params = lp.init(jax.random.PRNGKey(2))
    step = make_vae_gan_train_step(
        vae, disc, lp, tx_g, tx_d,
        disc_start=5, disc_weight=0.5, kl_weight=5e-6, perceptual_weight=1.0,
    )
    images = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3), minval=-1, maxval=1)

    # before disc_start: disc loss masked to zero, disc params frozen
    d0 = jax.tree.map(jnp.copy, d_state.params)
    g_state, d_state, m = step(g_state, d_state, lpips_params, images,
                               jax.random.PRNGKey(4), jnp.int32(1))
    assert float(m["disc_loss"]) == 0.0
    assert not _params_moved(d0, d_state.params)
    assert np.isfinite(float(m["g_loss"]))

    # after disc_start: disc trains
    d1 = jax.tree.map(jnp.copy, d_state.params)
    g_state, d_state, m2 = step(g_state, d_state, lpips_params, images,
                                jax.random.PRNGKey(5), jnp.int32(10))
    assert float(m2["disc_loss"]) > 0.0
    assert _params_moved(d1, d_state.params)
