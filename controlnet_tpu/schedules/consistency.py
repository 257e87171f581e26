"""Consistency-model scheduler (API parity with reference
scheduler/consistency_scheduler.py:4-60).

A thin stateful wrapper over the sigma-space primitives in
schedules/karras.py: geometric sigma ladder, forward noising, the
adjacent-timestep self-consistency loss, and 1-step sampling.  The training
tools use the fused jitted steps in train/loops.py; this class is the
library-level capability equivalent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from controlnet_tpu.schedules.karras import geometric_sigmas


class ConsistencyScheduler:
    def __init__(self, num_timesteps: int, sigma_min: float = 0.002,
                 sigma_max: float = 80.0, rho: float = 7.0):
        self.num_timesteps = num_timesteps
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.rho = rho
        # Geometric ramp sigma_min^(1-r) * sigma_max^r (reference :18-22).
        self.sigmas = geometric_sigmas(num_timesteps, sigma_min, sigma_max)

    def add_noise(self, x0: jax.Array, t: jax.Array, key: jax.Array):
        """x_t = x_0 + sigma_t * eps; returns (x_t, eps) (reference :24-31)."""
        sigma = self.sigmas[jnp.atleast_1d(t)].reshape(-1, *([1] * (x0.ndim - 1)))
        noise = jax.random.normal(key, x0.shape, x0.dtype)
        return x0 + sigma * noise, noise

    def consistency_loss(self, model_fn, x_t, t, hint, x0_target, key):
        """||f(x_t, t) - f(x_s, s)||^2 with s = clamp(t-1) (reference :33-54).

        ``model_fn(x, t, hint)`` is the (params-closed) student."""
        pred_t = model_fn(x_t, t, hint)
        s = jnp.clip(t - 1, 0, self.num_timesteps - 1)
        x_s, _ = self.add_noise(x0_target, s, key)
        pred_s = model_fn(x_s, s, hint)
        return jnp.mean((pred_t - pred_s) ** 2)

    def sample(self, model_fn, x_t, t, hint):
        """Single-step sampling: one student evaluation (reference :56-60)."""
        return jax.lax.stop_gradient(model_fn(x_t, t, hint))
