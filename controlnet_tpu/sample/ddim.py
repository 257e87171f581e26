"""On-device DDIM sampling loop (few-step sampling from DDPM checkpoints).

Additive capability: the reference implements only the 1000-step ancestral
sampler (tools/sample_ddpm.py:27-42, scheduler/linear_noise_scheduler.py:49-77).
DDIM (Song et al. 2021) samples the SAME trained eps-prediction checkpoints
on a subsequence of timesteps — 10-50x fewer model evaluations at matched
perceptual quality — which matters exactly where this framework is aimed:
serving throughput.  The loop structure mirrors sample/ddpm.py: the whole
subsequence runs in one ``lax.scan`` on device, trajectory stacked on
device, mesh-sharded batch for multi-chip sampling.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from controlnet_tpu.sample.common import batch_sharding, cast_hint, draw_x_start
from controlnet_tpu.schedules.linear import LinearSchedule, ddim_step


def ddim_timesteps(num_timesteps: int, num_steps: int) -> np.ndarray:
    """The descending timestep subsequence visited by a ``num_steps`` DDIM run.

    Evenly spaced over [0, T-1] and pinned at both ends: the first entry is
    always T-1 (x_T ~ N(0,1) enters the model at the same t as the ancestral
    sampler) and the last is always 0 (the final update lands exactly on the
    x0 estimate, t_prev = -1).
    """
    assert 1 <= num_steps <= num_timesteps, (num_steps, num_timesteps)
    ts = np.linspace(num_timesteps - 1, 0, num_steps).round().astype(np.int64)
    # rounding can collide adjacent entries when num_steps ~ T; dedupe while
    # preserving descending order
    ts = np.unique(ts)[::-1]
    return ts


def make_ddim_sampler(
    eps_fn: Callable,
    sched: LinearSchedule,
    shape: tuple[int, ...],
    num_steps: int,
    eta: float = 0.0,
    clip_x0: bool = False,
    compute_dtype=None,
    mesh=None,
):
    """Build a jitted DDIM sampler over a ``num_steps`` timestep subsequence.

    Same contract as ``sample.ddpm.make_ddpm_sampler``: ``eps_fn(params, x_t,
    t_batch [, hint])`` predicts epsilon; returns ``sampler(params, key
    [, hint]) -> (x0_final, trajectory)`` with one clamped snapshot per DDIM
    step (newest last).  The returned callable carries the visited timestep
    subsequence as ``sampler.timesteps`` (descending, for artifact naming).

    ``eta=0`` (default) is deterministic DDIM; ``eta=1`` with
    ``num_steps == T`` reproduces ancestral sampling (schedules.linear.
    ddim_step).  ``compute_dtype``/``mesh`` behave exactly as in
    make_ddpm_sampler (bf16 model input; batch sharded over the mesh's
    "data" axis with sharding-invariant threefry RNG).
    """
    ts_np = ddim_timesteps(sched.num_timesteps, num_steps)
    ts = jnp.asarray(ts_np, jnp.int32)
    ts_prev = jnp.asarray(np.concatenate([ts_np[1:], [-1]]), jnp.int32)

    _batch_sh = batch_sharding(mesh, shape)

    def sampler(params, key, hint=None):
        xt, key, hint = draw_x_start(key, shape, _batch_sh, hint)
        b = shape[0]
        hint_c = cast_hint(hint, compute_dtype)

        def step(carry, t_pair):
            xt, key = carry
            t, t_prev = t_pair
            if eta == 0.0:  # deterministic: ddim_step's static eta==0 path
                kstep = key  # ignores the key — skip the per-step split too
            else:
                key, kstep = jax.random.split(key)
            t_batch = jnp.full((b,), t, jnp.int32)
            x_in = xt if compute_dtype is None else xt.astype(compute_dtype)
            if hint is None:
                noise_pred = eps_fn(params, x_in, t_batch)
            else:
                noise_pred = eps_fn(params, x_in, t_batch, hint_c)
            noise_pred = noise_pred.astype(jnp.float32)
            xt_next, _x0 = ddim_step(sched, xt, noise_pred, t, t_prev, kstep,
                                     eta=eta, clip_x0=clip_x0)
            return (xt_next, key), jnp.clip(xt_next, -1.0, 1.0)

        (xt, _), traj = jax.lax.scan(step, (xt, key), (ts, ts_prev))
        return xt, traj

    jitted = jax.jit(sampler)

    def wrapped(params, key, hint=None):
        return jitted(params, key, hint)

    wrapped.timesteps = ts_np.tolist()
    return wrapped
