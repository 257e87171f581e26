"""On-device DPM-Solver++(2M) sampling loop (second-order few-step sampling).

Additive capability beyond sample/ddim.py (the reference implements only the
1000-step ancestral sampler, tools/sample_ddpm.py:27-42): DPM-Solver++
(Lu et al. 2022, arXiv:2211.01095, the multistep "2M" data-prediction
variant) integrates the probability-flow ODE with a second-order multistep
update, so the SAME trained eps-prediction checkpoints reach a given sample
quality in fewer steps than first-order DDIM.  Deterministic (no step
noise); the only randomness is x_T.

Structure mirrors sample/ddim.py: the whole visited subsequence runs in one
``lax.scan`` on device, trajectory stacked on device, mesh-sharded batch.

Math (half-log-SNR lambda = log(alpha/sigma), alpha = sqrt(acp),
sigma = sqrt(1-acp); steps i -> i+1 over a descending timestep ladder):

    x0_i   = (x_i - sigma_i * eps(x_i, t_i)) / alpha_i
    h_i+1  = lambda_i+1 - lambda_i                    (> 0, time decreasing)
    D      = (1 + c) * x0_i - c * x0_{i-1},  c = h_i / (2 h_i+1)
    x_i+1  = (sigma_i+1 / sigma_i) * x_i - alpha_i+1 * expm1(-h_i+1) * D

``c = 0`` (first step: no history, h_0 := 0; and final step to alpha_bar=1:
h = +inf) collapses D to x0_i — the first-order update, which is
algebraically deterministic DDIM (pinned by tests/test_dpm.py), so the
final step lands exactly on the x0 estimate ("lower order final").
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from controlnet_tpu.sample.common import batch_sharding, cast_hint, draw_x_start
from controlnet_tpu.sample.ddim import ddim_timesteps
from controlnet_tpu.schedules.linear import LinearSchedule


def make_dpm_sampler(
    eps_fn: Callable,
    sched: LinearSchedule,
    shape: tuple[int, ...],
    num_steps: int,
    compute_dtype=None,
    mesh=None,
):
    """Build a jitted DPM-Solver++(2M) sampler over ``num_steps`` timesteps.

    Same contract as ``sample.ddim.make_ddim_sampler``: ``eps_fn(params,
    x_t, t_batch [, hint])`` predicts epsilon; returns ``sampler(params, key
    [, hint]) -> (x0_final, trajectory)`` with one clamped snapshot per step
    (newest last) and the visited ladder as ``sampler.timesteps``.
    Deterministic given x_T (the solver adds no noise)."""
    ts_np = ddim_timesteps(sched.num_timesteps, num_steps)
    acp = np.asarray(sched.alpha_cum_prod, np.float64)
    acp_t = acp[ts_np]
    acp_p = np.concatenate([acp[ts_np[1:]], [1.0]])  # final target: alpha_bar=1
    alpha_t, sigma_t = np.sqrt(acp_t), np.sqrt(1.0 - acp_t)
    alpha_p, sigma_p = np.sqrt(acp_p), np.sqrt(1.0 - acp_p)
    with np.errstate(divide="ignore"):  # sigma_p=0 on the final step -> lam=+inf
        lam_t = np.log(alpha_t / sigma_t)
        lam_p = np.log(alpha_p / np.where(sigma_p == 0.0, 0.0, sigma_p))
        lam_p = np.where(sigma_p == 0.0, np.inf, lam_p)
    h = lam_p - lam_t                                   # (+inf on final step)
    h_prev = np.concatenate([[0.0], h[:-1]])
    # c = h_prev / (2h): 0 on the first step (no history) AND on the final
    # step (h=+inf) -> both collapse to the first-order/DDIM update.
    c = np.where(np.isinf(h), 0.0, h_prev / (2.0 * h))
    step_consts = {
        "t": jnp.asarray(ts_np, jnp.int32),
        "alpha_t": jnp.asarray(alpha_t, jnp.float32),
        "sigma_t": jnp.asarray(sigma_t, jnp.float32),
        "alpha_p": jnp.asarray(alpha_p, jnp.float32),
        "sigma_p": jnp.asarray(sigma_p, jnp.float32),
        # expm1(-h) precomputed in f64 (exactly -1.0 on the final step)
        "em1": jnp.asarray(np.expm1(-np.minimum(h, 1e9)), jnp.float32),
        "c": jnp.asarray(c, jnp.float32),
    }

    _batch_sh = batch_sharding(mesh, shape)

    def sampler(params, key, hint=None):
        xt, _key, hint = draw_x_start(key, shape, _batch_sh, hint)
        b = shape[0]
        hint_c = cast_hint(hint, compute_dtype)

        def step(carry, consts):
            xt, x0_prev = carry
            t_batch = jnp.full((b,), consts["t"], jnp.int32)
            x_in = xt if compute_dtype is None else xt.astype(compute_dtype)
            if hint is None:
                eps = eps_fn(params, x_in, t_batch)
            else:
                eps = eps_fn(params, x_in, t_batch, hint_c)
            eps = eps.astype(jnp.float32)
            x0 = (xt - consts["sigma_t"] * eps) / consts["alpha_t"]
            d = (1.0 + consts["c"]) * x0 - consts["c"] * x0_prev
            xt_next = (consts["sigma_p"] / consts["sigma_t"]) * xt \
                - consts["alpha_p"] * consts["em1"] * d
            return (xt_next, x0), jnp.clip(xt_next, -1.0, 1.0)

        (xt, _), traj = jax.lax.scan(step, (xt, jnp.zeros_like(xt)), step_consts)
        return xt, traj

    jitted = jax.jit(sampler)

    def wrapped(params, key, hint=None):
        return jitted(params, key, hint)

    wrapped.timesteps = ts_np.tolist()
    return wrapped
