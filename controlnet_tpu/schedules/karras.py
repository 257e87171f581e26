"""Sigma-space (EDM/Karras) schedules used by the consistency models.

Covers the reference ConsistencyScheduler (geometric sigma ramp,
/root/reference/scheduler/consistency_scheduler.py:18-31) and the Karras
rho-schedule + sigma<->timestep conversion used by the consistency
distillation wrapper (consistency_controlnet_distilled.py:179-196, 230-258).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def geometric_sigmas(num_timesteps: int, sigma_min: float, sigma_max: float) -> jax.Array:
    """sigma_i = sigma_min^(1-r_i) * sigma_max^(r_i), r = linspace(0, 1).

    Parity: ConsistencyScheduler._create_noise_schedule
    (consistency_scheduler.py:18-22).
    """
    ramp = jnp.linspace(0.0, 1.0, num_timesteps, dtype=jnp.float32)
    return sigma_min ** (1.0 - ramp) * sigma_max**ramp


def karras_sigmas(num_steps: int, sigma_min: float, sigma_max: float, rho: float = 7.0) -> jax.Array:
    """Karras et al. rho-interpolated sigma ladder.

    Parity: ConsistencyControlNetDistilled.get_noise_schedule
    (consistency_controlnet_distilled.py:179-196).  Note the reference
    interpolates from sigma_min^(1/rho) to sigma_max^(1/rho) (ascending).
    """
    if num_steps < 2:
        raise ValueError(
            f"karras_sigmas needs num_steps >= 2, got {num_steps} "
            "(the 0/0 interpolation would yield a silent NaN ladder)")
    steps = jnp.arange(num_steps, dtype=jnp.float32)
    lo = sigma_min ** (1.0 / rho)
    hi = sigma_max ** (1.0 / rho)
    sigmas = lo + steps / (num_steps - 1) * (hi - lo)
    return sigmas**rho


def sigma_add_noise(x0: jax.Array, sigma: jax.Array, key: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x_t = x_0 + sigma * eps (EDM forward process).

    Parity: ConsistencyScheduler.add_noise (consistency_scheduler.py:24-31)
    and the inline versions in the distilled wrappers.  ``sigma`` is (B,) or
    scalar; broadcast over NHWC.
    """
    noise = jax.random.normal(key, x0.shape, dtype=x0.dtype)
    sigma = jnp.atleast_1d(jnp.asarray(sigma, x0.dtype))
    sigma = sigma.reshape(sigma.shape[0], *([1] * (x0.ndim - 1)))
    return x0 + sigma * noise, noise


def sigma_to_timestep(sigma: jax.Array, alpha_cum_prod: jax.Array) -> jax.Array:
    """Map continuous sigma to the nearest discrete DDPM timestep.

    The DDPM schedule's implied sigma at t is sqrt((1-acp_t)/acp_t); we take
    the argmin over |schedule - sigma| (vectorized version of
    consistency_controlnet_distilled.py:230-258).
    """
    sigma = jnp.atleast_1d(jnp.asarray(sigma, jnp.float32))
    sigma_schedule = jnp.sqrt((1.0 - alpha_cum_prod) / alpha_cum_prod)  # [T]
    distances = jnp.abs(sigma_schedule[None, :] - sigma[:, None])  # [B, T]
    t = jnp.argmin(distances, axis=-1)
    return jnp.clip(t, 0, alpha_cum_prod.shape[0] - 1).astype(jnp.int32)


def sample_log_uniform_sigmas(
    key: jax.Array, batch_size: int, sigma_min: float, sigma_max: float
) -> jax.Array:
    """Sample sigmas log-uniformly in [sigma_min, sigma_max].

    Parity: ConsistencyControlNetDistilled.sample_sigmas
    (consistency_controlnet_distilled.py:332-341).
    """
    u = jax.random.uniform(key, (batch_size,), dtype=jnp.float32)
    log_sigma = jnp.log(sigma_min) + u * (jnp.log(sigma_max) - jnp.log(sigma_min))
    return jnp.exp(log_sigma)
