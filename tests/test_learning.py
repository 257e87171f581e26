"""Learning-dynamics tests: every train-step family must actually reduce
its loss on a fixed tiny dataset — catches silent gradient/optimizer/
masking wiring bugs that shape tests cannot (VERDICT r2 #7).  Also the
bf16 mixed-precision gate: training in compute_dtype=bfloat16 must learn
the same way f32 does."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile/training; fast tier = -m 'not e2e and not slow'

import jax
import jax.numpy as jnp
import numpy as np
import optax

from controlnet_tpu.models.consistency import ConsistencyDistilled
from controlnet_tpu.models.discriminator import Discriminator
from controlnet_tpu.models.dmd import DistributionMatchingDistilled
from controlnet_tpu.models.lpips import LPIPS
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.models.vae import VAE
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import (
    make_consistency_train_step,
    make_ddpm_train_step,
    make_dmd_train_step,
    make_vae_gan_train_step,
)
from controlnet_tpu.train.state import create_train_state


def _structured_images(b=8, s=8, c=1):
    return jnp.tile(jnp.linspace(-1, 1, s)[None, :, None, None], (b, 1, s, c))


def _run_ddpm(tiny_model_config, compute_dtype, steps=60):
    sched = make_linear_schedule(16, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    tx = optax.adam(2e-3)
    state = create_train_state(u.init(jax.random.PRNGKey(0)), tx)
    step = make_ddpm_train_step(lambda p, x, t: u(p, x, t), sched, tx,
                                compute_dtype=compute_dtype)
    key = jax.random.PRNGKey(1)
    images = _structured_images()
    losses = []
    for i in range(steps):
        key, k = jax.random.split(key)
        state, loss = step(state, images, k)
        losses.append(float(loss))
    return losses


def test_ddpm_loss_decreases(tiny_model_config):
    losses = _run_ddpm(tiny_model_config, None)
    first, last = np.mean(losses[:10]), np.mean(losses[-10:])
    assert last < 0.7 * first, f"loss did not decrease: {first:.4f} -> {last:.4f}"
    assert all(np.isfinite(l) for l in losses)


def test_ddpm_bf16_learns_like_f32(tiny_model_config):
    """Mixed-precision parity gate: same training run in bf16 must (a) be
    finite, (b) decrease, (c) land within a modest factor of the f32 loss
    (identical RNG streams — the only difference is compute precision)."""
    f32 = _run_ddpm(tiny_model_config, None)
    bf16 = _run_ddpm(tiny_model_config, jnp.bfloat16)
    assert all(np.isfinite(l) for l in bf16)
    first, last = np.mean(bf16[:10]), np.mean(bf16[-10:])
    assert last < 0.7 * first, f"bf16 loss did not decrease: {first:.4f} -> {last:.4f}"
    # end-of-run losses agree within 30% (precision, not dynamics, differs)
    assert abs(np.mean(bf16[-10:]) - np.mean(f32[-10:])) < 0.3 * np.mean(f32[-10:]) + 0.05


def test_vae_gan_learning_dynamics(tiny_vae_config):
    """Recon loss decreases; after disc_start the discriminator loss is
    live (nonzero) and *responds* to training (changes across steps) —
    catches broken two-optimizer / disc-gating / accumulation wiring."""
    vae = VAE(1, tiny_vae_config)
    disc = Discriminator(im_channels=1, conv_channels=[8, 16], kernels=[4, 4, 4],
                         strides=[2, 2, 1], paddings=[1, 1, 1])
    lp = LPIPS()
    tx_g = optax.adam(2e-3, b1=0.5, b2=0.999)
    tx_d = optax.adam(2e-3, b1=0.5, b2=0.999)
    g_state = create_train_state(vae.init(jax.random.PRNGKey(0)), tx_g)
    d_state = create_train_state(disc.init(jax.random.PRNGKey(1)), tx_d)
    lpips_params = lp.init(jax.random.PRNGKey(2))
    disc_start = 20
    step = make_vae_gan_train_step(
        vae, disc, lp, tx_g, tx_d,
        disc_start=disc_start, disc_weight=0.5, kl_weight=5e-6, perceptual_weight=1.0,
    )
    images = _structured_images(b=4, s=16, c=1)
    key = jax.random.PRNGKey(3)
    recon, dlosses = [], []
    for i in range(60):
        key, k = jax.random.split(key)
        g_state, d_state, m = step(g_state, d_state, lpips_params, images, k,
                                   jnp.int32(i))
        recon.append(float(m["recon_loss"]))
        dlosses.append(float(m["disc_loss"]))
    assert np.mean(recon[-10:]) < 0.7 * np.mean(recon[:10]), \
        f"recon did not decrease: {np.mean(recon[:10]):.4f} -> {np.mean(recon[-10:]):.4f}"
    # disc masked off before disc_start, live after
    assert all(d == 0.0 for d in dlosses[:disc_start])
    live = dlosses[disc_start + 1:]
    assert all(np.isfinite(d) and d > 0.0 for d in live)
    assert np.std(live) > 0.0, "disc loss frozen — disc optimizer not training"


def test_consistency_distill_loss_decreases(tiny_model_config):
    model = ConsistencyDistilled(1, tiny_model_config, use_ddpm_teacher=True)
    p = model.init(jax.random.PRNGKey(0))
    tx = optax.adam(2e-3)
    state = create_train_state(p["student"], tx)
    ema = p["ema_teacher"]
    step = make_consistency_train_step(model, tx, mode="ddpm_distillation",
                                       total_epochs=None)
    x0 = _structured_images(b=4)
    hint = jnp.zeros((4, 8, 8, 3))
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(50):
        key, k = jax.random.split(key)
        state, ema, m = step(state, ema, p["teacher"], x0, hint, k, jnp.int32(0))
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:10]), \
        f"consistency loss did not decrease: {np.mean(losses[:10]):.4f} -> {np.mean(losses[-10:]):.4f}"


def test_dmd_distill_loss_decreases(tiny_model_config):
    model = DistributionMatchingDistilled(1, tiny_model_config)
    p = model.init(jax.random.PRNGKey(0))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(2e-3, weight_decay=1e-6))
    state = create_train_state(p["student"], tx)
    step = make_dmd_train_step(model, tx)
    x0 = _structured_images(b=4)
    hint = jnp.zeros((4, 8, 8, 3))
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(50):
        key, k = jax.random.split(key)
        state, m = step(state, p["teacher"], p["features"], x0, hint, k)
        losses.append(float(m["total_loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-10:]) < 0.8 * np.mean(losses[:10]), \
        f"DMD loss did not decrease: {np.mean(losses[:10]):.4f} -> {np.mean(losses[-10:]):.4f}"
