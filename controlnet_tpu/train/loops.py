"""Jitted train-step factories for every trainer in the framework.

Each factory closes over static model/optimizer config and returns one pure
``step`` function, jitted with the train state donated (in-place buffer
reuse on TPU).  Data-parallel execution needs no extra code here: the tools
put the batch on the mesh with NamedSharding(P("data")) and replicate the
state; pjit inserts the ICI all-reduce for the gradients.

Reference loop semantics reproduced (call stacks in SURVEY.md §3):
  * DDPM / LDM trainer: uniform t, eps-MSE (tools/train_ddpm.py:72-91).
  * ControlNet trainer: gradients only through the control branch
    (tools/train_ddpm_controlnet.py:76; the frozen tree is a separate
    non-differentiated argument).
  * VAE GAN trainer: two Adams, disc enabled after disc_start steps,
    recon + kl_weight*KL + disc_weight*fool + perceptual*LPIPS, gradient
    accumulation via optax.MultiSteps (tools/train_vae.py:87-185).
  * Consistency distillation: 3 modes (tools/train_consistency_controlnet_
    distilled.py:79-141) with EMA teacher update after each step.
  * DMD: 50% high-noise-biased t, NaN-loss skip, grad-clip 1.0
    (tools/train_distribution_matching_controlnet_distilled.py:143-204).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import optax

from controlnet_tpu.models.consistency import ConsistencyDistilled
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.dmd import DistributionMatchingDistilled
from controlnet_tpu.schedules.linear import LinearSchedule, add_noise
from controlnet_tpu.train.state import TrainState


def _apply(tx: optax.GradientTransformation, state: TrainState, grads) -> TrainState:
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(step=state.step + 1, params=params, opt_state=opt_state)


def _cast(x, dtype):
    """Mixed-precision cast boundary: master params/optimizer/schedule math
    stay f32; only the network forward/backward runs in ``dtype`` (layers
    accumulate matmuls/convs in f32 via preferred_element_type, so bf16
    activations lose little accuracy).  ``None`` = full f32."""
    if dtype is None or x is None:
        return x
    return x.astype(dtype)


def _f32(x):
    return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# DDPM / LDM epsilon-prediction
# ---------------------------------------------------------------------------

def make_ddpm_train_step(model, sched: LinearSchedule, tx: optax.GradientTransformation,
                         compute_dtype=None):
    """model: callable (params, x, t) -> eps prediction (UNet).

    step(state, images, key) -> (state, loss).  images NHWC in [-1, 1]
    (or latents).  ``compute_dtype=jnp.bfloat16`` runs the UNet
    forward/backward in bf16 (noising + loss + optimizer stay f32)."""

    def step(state: TrainState, images: jax.Array, key: jax.Array):
        kt, kn = jax.random.split(key)
        b = images.shape[0]
        t = jax.random.randint(kt, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(kn, images.shape, images.dtype)
        noisy = _cast(add_noise(sched, images, noise, t), compute_dtype)

        def loss_fn(p):
            pred = model(p, noisy, t)
            return jnp.mean((_f32(pred) - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return _apply(tx, state, grads), loss

    return jax.jit(step, donate_argnums=0)


# ---------------------------------------------------------------------------
# ControlNet (frozen trunk + trainable control branch)
# ---------------------------------------------------------------------------

def make_controlnet_train_step(cn: ControlNet, sched: LinearSchedule, tx: optax.GradientTransformation,
                               compute_dtype=None, cfg_drop_prob: float = 0.0):
    """step(state, frozen, images, hints, key) -> (state, loss).

    ``state.params`` is the *trainable* split (control branch + zero convs
    [+ decoder when unlocked]); ``frozen`` is the frozen split.

    ``cfg_drop_prob`` > 0 zeroes each sample's hint with that probability
    (utils.diffusion_utils.drop_image_condition), teaching the model the
    null condition so it can be sampled with classifier-free guidance
    (sample/cfg.py).  Default 0.0 keeps reference parity — the reference
    defines the drop helpers but wires them into no trainer (SURVEY.md
    component #19)."""

    if cfg_drop_prob > 0:
        from controlnet_tpu.utils.diffusion_utils import drop_image_condition

    def step(state: TrainState, frozen, images, hints, key):
        if cfg_drop_prob > 0:
            # extra split ONLY on the opt-in path: with cfg_drop_prob == 0 the
            # (kt, kn) stream is bit-identical to the reference-parity step,
            # which the shared-RNG replay regression tests pin.
            key, kd = jax.random.split(key)
        kt, kn = jax.random.split(key)
        b = images.shape[0]
        t = jax.random.randint(kt, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(kn, images.shape, images.dtype)
        noisy = _cast(add_noise(sched, images, noise, t), compute_dtype)
        if cfg_drop_prob > 0:
            hints = drop_image_condition(hints, kd, cfg_drop_prob)
        hints_c = _cast(hints, compute_dtype)

        def loss_fn(trainable):
            p = cn.merge_params(trainable, frozen)
            pred = cn(p, noisy, t, hints_c)
            return jnp.mean((_f32(pred) - noise) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return _apply(tx, state, grads), loss

    return jax.jit(step, donate_argnums=0)


# ---------------------------------------------------------------------------
# VAE adversarial (GAN) training
# ---------------------------------------------------------------------------

def make_vae_gan_train_step(
    vae,
    discriminator,
    lpips,
    tx_g: optax.GradientTransformation,
    tx_d: optax.GradientTransformation,
    disc_start: int,
    disc_weight: float,
    kl_weight: float,
    perceptual_weight: float,
    compute_dtype=None,
):
    """step(g_state, d_state, lpips_params, images, key, step_count)
      -> (g_state, d_state, metrics dict)

    The reference's conditional branches (disc after disc_start) become
    loss-weight masks so one compiled graph covers both phases
    (train_vae.py:144-177).  Gradient accumulation is handled by wrapping
    tx_g/tx_d in optax.MultiSteps at the tool level.
    """

    def step(g_state: TrainState, d_state: TrainState, lpips_params, images, key, step_count):
        disc_on = (step_count > disc_start).astype(jnp.float32)
        x_in = _cast(images, compute_dtype)

        def g_loss_fn(vae_params):
            recon, enc = vae(vae_params, x_in, key)
            mean, logvar = jnp.split(_f32(enc), 2, axis=-1)
            kl = jnp.mean(0.5 * jnp.sum(jnp.exp(logvar) + mean**2 - 1.0 - logvar, axis=(1, 2, 3)))
            recon_f = _f32(recon)
            recon_loss = jnp.mean((recon_f - images) ** 2)
            fool = jnp.mean((_f32(discriminator(d_state.params, recon)) - 1.0) ** 2)
            # LPIPS (loss-side perceptual net) always runs f32: its conv
            # weights are raw f32 arrays and perceptual distances are part
            # of the loss, not the hot VAE forward.
            lp = jnp.mean(lpips(lpips_params, recon_f, images))
            g_loss = (
                recon_loss
                + kl_weight * kl
                + disc_on * disc_weight * fool
                + perceptual_weight * lp
            )
            return g_loss, (recon, recon_loss, kl, lp, fool)

        (g_loss, (recon, recon_loss, kl, lp, fool)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_state.params)
        g_state = _apply(tx_g, g_state, g_grads)

        def d_loss_fn(d_params):
            fake_pred = _f32(discriminator(d_params, jax.lax.stop_gradient(recon)))
            real_pred = _f32(discriminator(d_params, x_in))
            d_loss = disc_weight * (jnp.mean(fake_pred**2) + jnp.mean((real_pred - 1.0) ** 2)) / 2.0
            return disc_on * d_loss, d_loss

        (masked_d_loss, d_loss), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_state.params)
        d_state = _apply(tx_d, d_state, d_grads)

        metrics = {
            "recon_loss": recon_loss,
            "kl_loss": kl,
            "perceptual_loss": perceptual_weight * lp,
            "gen_adv_loss": disc_weight * fool * disc_on,
            "disc_loss": d_loss * disc_on,
            "g_loss": g_loss,
        }
        return g_state, d_state, metrics

    return jax.jit(step, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# Consistency distillation
# ---------------------------------------------------------------------------

def make_consistency_train_step(
    model: ConsistencyDistilled,
    tx: optax.GradientTransformation,
    mode: str = "ddpm_distillation",
    total_epochs: int | None = None,
    compute_dtype=None,
):
    """modes (tools/train_consistency_controlnet_distilled.py:79-141):
      * "ddpm_distillation" (default): log-uniform sigma; alpha*recon +
        (1-alpha)*DDPM-teacher MSE (alpha=0.5).
      * "consistency_only": two log-uniform sigmas, EMA-teacher target.
      * "manual": per-batch coin — 50% of batches draw t from the top
        quarter [0.75T, T), else uniform; sigma = sigma_min *
        (sigma_max/sigma_min)^(t/(T-1)) (train_consistency...py:21-26,
        113-129); combined loss with alpha=0.5.

    When ``total_epochs`` is given, the progressive alpha ramp from
    consistency_controlnet_distilled.py:320-325 applies:
    alpha = max(0.5*(1-progress) + 0.1*progress, 0.1).

    step(state, ema, teacher, x0, hint, key, epoch)
      -> (state, ema, metrics).  ``teacher`` is the frozen ControlNet tree
    (pass an empty dict when mode == consistency_only)."""

    if mode not in ("ddpm_distillation", "consistency_only", "manual"):
        raise ValueError(
            f"unknown consistency training mode {mode!r}; expected "
            "'ddpm_distillation', 'consistency_only', or 'manual'")

    T = model.num_timesteps

    def step(state: TrainState, ema, teacher, x0, hint, key, epoch):
        b = x0.shape[0]
        k1, k2, k3 = jax.random.split(key, 3)
        p = {"student": state.params, "ema_teacher": ema, "teacher": teacher}

        if mode == "consistency_only":
            s1 = model.sample_sigmas(k1, b)
            s2 = model.sample_sigmas(k2, b)

            def loss_fn(student):
                pp = {**p, "student": student}
                loss = model.consistency_training_loss(pp, x0, hint, s1, s2, k3,
                                                       compute_dtype=compute_dtype)
                return loss, {"consistency_loss": loss}

        else:
            if mode == "manual":
                kc, kt1, kt2 = jax.random.split(k1, 3)
                coin = jax.random.uniform(kc, ())
                t_hi = jax.random.randint(kt1, (b,), int(0.75 * T), T)
                t_lo = jax.random.randint(kt2, (b,), 0, T)
                t = jnp.where(coin < 0.5, t_hi, t_lo).astype(jnp.float32)
                sigma = model.sigma_min * (model.sigma_max / model.sigma_min) ** (t / (T - 1))
            else:
                sigma = model.sample_sigmas(k1, b)

            if total_epochs is not None:
                progress = epoch.astype(jnp.float32) / total_epochs
                alpha = jnp.maximum(0.5 * (1.0 - progress) + 0.1 * progress, 0.1)
            else:
                alpha = 0.5

            def loss_fn(student):
                pp = {**p, "student": student}
                total, recon, distill = model.distillation_loss(
                    pp, x0, hint, sigma, k3, alpha=alpha, compute_dtype=compute_dtype)
                return total, {"total_loss": total, "recon_loss": recon, "distill_loss": distill}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = _apply(tx, state, grads)
        # EMA teacher tracks the *updated* student (reference updates EMA
        # after optimizer.step(), train_consistency...py:136-139).
        d = model.ema_decay
        ema = jax.tree.map(lambda e, s: d * e + (1.0 - d) * s, ema, state.params)
        return state, ema, metrics

    return jax.jit(step, donate_argnums=(0, 1))


# ---------------------------------------------------------------------------
# Distribution-matching distillation
# ---------------------------------------------------------------------------

def make_dmd_train_step(model: DistributionMatchingDistilled, tx: optax.GradientTransformation,
                        compute_dtype=None):
    """step(state, teacher, features, x0, hint, key) -> (state, metrics).

    Reproduces DMDTrainer.train_epoch (train_distribution_matching...py:
    143-204): one coin per BATCH (np.random.rand(), a scalar — :156) decides
    with p=0.5 whether all of the batch's t are drawn from the top quarter
    [0.75T, T) or from [0, T); NaN-loss batches skipped (masked updates);
    gradient clipping to norm 1.0 belongs in ``tx`` (tool level)."""

    T = model.teacher_schedule.num_timesteps

    def step(state: TrainState, teacher, features, x0, hint, key):
        b = x0.shape[0]
        kt1, kt2, kc, kn = jax.random.split(key, 4)
        t_hi = jax.random.randint(kt1, (b,), int(0.75 * T), T)
        t_lo = jax.random.randint(kt2, (b,), 0, T)
        t = jnp.where(jax.random.uniform(kc, ()) < 0.5, t_hi, t_lo)
        noise = jax.random.normal(kn, x0.shape, x0.dtype)
        x_t = add_noise(model.teacher_schedule, x0, noise, t)

        def loss_fn(student):
            p = {"student": student, "teacher": teacher, "features": features}
            total, dmd, teacher_l, comps = model.distillation_loss(
                p, x_t, t, hint, x0, compute_dtype=compute_dtype)
            return total, {"total_loss": total, "dist_matching_loss": dmd,
                           "teacher_loss": teacher_l, **comps}

        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)

        # NaN guard: skip the update entirely on non-finite loss
        # (train_distribution_matching...py:172-175).
        good = jnp.isfinite(loss)
        grads = jax.tree.map(lambda g: jnp.where(good, g, jnp.zeros_like(g)), grads)
        new_state = _apply(tx, state, grads)
        state = jax.tree.map(lambda n, o: jnp.where(good, n, o), new_state, state)

        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        metrics["skipped"] = (~good).astype(jnp.float32)
        return state, metrics

    return jax.jit(step, donate_argnums=0)
