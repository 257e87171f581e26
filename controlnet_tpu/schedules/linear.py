"""Linear (DDPM) noise schedule, fully jittable.

Capability parity with the reference LinearNoiseScheduler
(/root/reference/scheduler/linear_noise_scheduler.py:8-77), including the
CompVis sqrt-space `ldm_scheduler` variant (:13-17).  Unlike the reference,
every function here is a pure jittable op over a pytree of precomputed
tables, so the whole ancestral sampling loop can live inside one
``lax.scan`` on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LinearSchedule(NamedTuple):
    """Precomputed DDPM schedule tables (all float32, shape [T])."""

    betas: jax.Array
    alphas: jax.Array
    alpha_cum_prod: jax.Array
    sqrt_alpha_cum_prod: jax.Array
    sqrt_one_minus_alpha_cum_prod: jax.Array

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_linear_schedule(
    num_timesteps: int,
    beta_start: float,
    beta_end: float,
    ldm_scheduler: bool = False,
) -> LinearSchedule:
    """Build the beta/alpha tables.

    ``ldm_scheduler=True`` uses the CompVis convention of interpolating in
    sqrt-beta space (reference linear_noise_scheduler.py:13-17), which the
    celebhq LDM configs rely on for fidelity parity.
    """
    if ldm_scheduler:
        betas = jnp.linspace(beta_start**0.5, beta_end**0.5, num_timesteps, dtype=jnp.float32) ** 2
    else:
        betas = jnp.linspace(beta_start, beta_end, num_timesteps, dtype=jnp.float32)
    alphas = 1.0 - betas
    alpha_cum_prod = jnp.cumprod(alphas)
    return LinearSchedule(
        betas=betas,
        alphas=alphas,
        alpha_cum_prod=alpha_cum_prod,
        sqrt_alpha_cum_prod=jnp.sqrt(alpha_cum_prod),
        sqrt_one_minus_alpha_cum_prod=jnp.sqrt(1.0 - alpha_cum_prod),
    )


def _bcast(table_at_t: jax.Array, ndim: int) -> jax.Array:
    """Reshape a (B,) gather to (B, 1, 1, ...) for broadcasting over NHWC."""
    return table_at_t.reshape(table_at_t.shape[0], *([1] * (ndim - 1)))


def add_noise(sched: LinearSchedule, original: jax.Array, noise: jax.Array, t: jax.Array) -> jax.Array:
    """Forward process q(x_t | x_0): sqrt(acp_t) x0 + sqrt(1-acp_t) eps.

    Parity: reference add_noise (linear_noise_scheduler.py:25-47).
    ``t`` is an int array of shape (B,) (or scalar, broadcast to batch).
    """
    t = jnp.atleast_1d(t)
    sa = _bcast(sched.sqrt_alpha_cum_prod[t], original.ndim)
    soma = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], original.ndim)
    return sa * original + soma * noise


def eps_to_x0(sched: LinearSchedule, xt: jax.Array, noise_pred: jax.Array, t: jax.Array) -> jax.Array:
    """Convert an epsilon prediction at timestep t into a clamped x0 estimate.

    Parity: the x0 computation inside sample_prev_timestep
    (linear_noise_scheduler.py:58-60) and the teacher eps->x0 conversions in
    both distillation wrappers (consistency_controlnet_distilled.py:219-226,
    distribution_matching_controlnet.py:205-214).
    """
    t = jnp.atleast_1d(t)
    soma = _bcast(sched.sqrt_one_minus_alpha_cum_prod[t], xt.ndim)
    sa = _bcast(sched.sqrt_alpha_cum_prod[t], xt.ndim)
    x0 = (xt - soma * noise_pred) / sa
    return jnp.clip(x0, -1.0, 1.0)


def ddim_step(
    sched: LinearSchedule,
    xt: jax.Array,
    noise_pred: jax.Array,
    t: jax.Array,
    t_prev: jax.Array,
    key: jax.Array,
    eta: float = 0.0,
    clip_x0: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """One DDIM step from timestep ``t`` to ``t_prev`` (Song et al. 2021, eq. 12).

    Additive capability over the reference (which only implements ancestral
    sampling, linear_noise_scheduler.py:49-77): the same trained
    eps-prediction checkpoints sample in far fewer steps.  ``t_prev == -1``
    denotes the final step (alpha_bar_prev = 1, so x_prev = x0 exactly and
    the noise term vanishes).

    * ``eta = 0`` is deterministic DDIM.
    * ``eta = 1`` with the full step sequence (t_prev = t-1) reproduces the
      ancestral sampler's transition exactly: sigma^2 collapses to the DDPM
      posterior variance (1-acp[t-1])/(1-acp[t]) * beta_t and the mean terms
      are algebraically the ancestral posterior mean (pinned by
      tests/test_ddim.py::test_eta1_fullsteps_matches_ancestral_step).

    ``clip_x0`` additionally clamps the x0 estimate used in the update to
    [-1, 1] (a common stabilizer at very few steps); off by default so the
    eta=1 equivalence above is exact.  Returns (x_prev, clamped x0 estimate).
    """
    t = jnp.asarray(t, dtype=jnp.int32)
    t_prev = jnp.asarray(t_prev, dtype=jnp.int32)
    acp_t = sched.alpha_cum_prod[t]
    # t_prev == -1 means "fully denoised": alpha_bar_{-1} := 1.
    acp_prev = jnp.where(t_prev >= 0, sched.alpha_cum_prod[jnp.maximum(t_prev, 0)], 1.0)

    x0 = (xt - jnp.sqrt(1.0 - acp_t) * noise_pred) / jnp.sqrt(acp_t)
    x0_update = jnp.clip(x0, -1.0, 1.0) if clip_x0 else x0

    if eta == 0.0:
        # Deterministic fast path, decided at TRACE time (eta is a static
        # Python float): sigma is identically 0, so skip the noise tensor —
        # XLA cannot fold 0.0*normal(...) itself (NaN semantics), and the
        # per-step threefry work is pure waste in the default served mode.
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev, 0.0)) * noise_pred
        return jnp.sqrt(acp_prev) * x0_update + dir_xt, jnp.clip(x0, -1.0, 1.0)

    sigma = eta * jnp.sqrt((1.0 - acp_prev) / (1.0 - acp_t)) * jnp.sqrt(
        1.0 - acp_t / acp_prev)
    # direction pointing to x_t; the max() guards float cancellation at
    # sigma^2 ~ (1 - acp_prev)
    dir_xt = jnp.sqrt(jnp.maximum(1.0 - acp_prev - sigma**2, 0.0)) * noise_pred

    z = jax.random.normal(key, xt.shape, dtype=xt.dtype)
    x_prev = jnp.sqrt(acp_prev) * x0_update + dir_xt + sigma * z
    return x_prev, jnp.clip(x0, -1.0, 1.0)


def sample_prev_timestep(
    sched: LinearSchedule,
    xt: jax.Array,
    noise_pred: jax.Array,
    t: jax.Array,
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One ancestral sampling step: returns (x_{t-1}, clamped x0 prediction).

    Parity: reference sample_prev_timestep (linear_noise_scheduler.py:49-77),
    expressed branchlessly so it can sit inside ``lax.scan``/``fori_loop``:
    the ``t == 0`` case (return posterior mean, no noise) becomes a
    ``jnp.where`` mask instead of Python control flow.

    ``t`` is a scalar int (traced).  The caller advances the RNG key.
    """
    t = jnp.asarray(t, dtype=jnp.int32)
    soma_t = sched.sqrt_one_minus_alpha_cum_prod[t]
    acp_t = sched.alpha_cum_prod[t]
    beta_t = sched.betas[t]
    alpha_t = sched.alphas[t]

    x0 = (xt - soma_t * noise_pred) / jnp.sqrt(acp_t)
    x0 = jnp.clip(x0, -1.0, 1.0)

    mean = (xt - beta_t * noise_pred / soma_t) / jnp.sqrt(alpha_t)

    # Posterior variance uses acp[t-1]; clamp the index so tracing t == 0 is
    # safe (the where() below discards the value in that case).
    t_prev = jnp.maximum(t - 1, 0)
    variance = (1.0 - sched.alpha_cum_prod[t_prev]) / (1.0 - acp_t) * beta_t
    sigma = jnp.sqrt(variance)
    z = jax.random.normal(key, xt.shape, dtype=xt.dtype)

    x_prev = jnp.where(t == 0, mean, mean + sigma * z)
    return x_prev, x0
