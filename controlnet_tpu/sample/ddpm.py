"""On-device ancestral sampling loops.

The reference's sampler round-trips to the host and writes a PNG grid at
every one of the 1000 steps (tools/sample_ddpm.py:27-42 — SURVEY.md calls
this the #1 thing not to replicate).  Here the entire denoising loop is one
``lax.scan`` carrying x_t on device; the x_t trajectory (optionally
subsampled with ``record_every``) is stacked on device and returned as one
array, so the tools write all PNGs once at the end with identical artifact
content.

Works for pixel DDPM, DDPM ControlNet (pass hint), and latent LDM
(pass a VAE decode at the end in the tool).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from controlnet_tpu.sample.common import batch_sharding, cast_hint, draw_x_start
from controlnet_tpu.schedules.linear import LinearSchedule, sample_prev_timestep


def make_ddpm_sampler(
    eps_fn: Callable,
    sched: LinearSchedule,
    shape: tuple[int, ...],
    record_every: int = 1,
    compute_dtype=None,
    unroll: int = 1,
    mesh=None,
):
    """Build a jitted sampler.

    ``eps_fn(params, x_t, t_batch [, hint])`` predicts epsilon.  ``shape``
    is the full (B, H, W, C) sample shape.  Returns
    ``sampler(params, key[, hint]) -> (x0_final, trajectory)`` where
    trajectory is (T//record_every, B, H, W, C) of clamped x_t snapshots
    (newest last), matching the reference's per-step "x0_*.png" artifact
    content (sample_ddpm.py:27-42).

    ``compute_dtype`` (e.g. jnp.bfloat16) casts the model input so the UNet
    runs in reduced precision (layers accumulate matmuls/convs in f32);
    the scheduler update itself always runs in float32.  ``unroll`` is
    passed to the inner step loop (amortizes loop overhead at the cost of
    compile time).

    Memory: the trajectory buffer holds exactly T//record_every frames —
    the loop is an outer scan (one snapshot per iteration) over an inner
    ``fori_loop`` of ``record_every`` denoising steps, never a (T, *shape)
    stack.  With ``record_every == T`` (benchmark/serving mode) that is a
    single frame.

    ``mesh``: a ``jax.sharding.Mesh`` for multi-chip data-parallel
    sampling — the batch axis is sharded over the mesh's ``data`` axis
    (pass params replicated, e.g. via ``parallel.mesh.replicate``).
    Sampling is embarrassingly parallel per sample, so XLA partitions the
    whole scan with zero collectives and throughput scales with chips.
    PRNG values are sharding-invariant (counter-based threefry), so the
    sharded sampler produces bit-identical samples to the single-device
    one.  The reference has no distributed sampling at all (its loop is a
    per-step host round-trip, sample_ddpm.py:27-42).
    """
    T = sched.num_timesteps
    assert T % record_every == 0
    _batch_sh = batch_sharding(mesh, shape)

    def sampler(params, key, hint=None):
        xt, key, hint = draw_x_start(key, shape, _batch_sh, hint)
        b = shape[0]
        hint_c = cast_hint(hint, compute_dtype)

        def step(i, carry):
            xt, key = carry
            t = T - 1 - i
            key, kstep = jax.random.split(key)
            t_batch = jnp.full((b,), t, jnp.int32)
            x_in = xt if compute_dtype is None else xt.astype(compute_dtype)
            if hint is None:
                noise_pred = eps_fn(params, x_in, t_batch)
            else:
                noise_pred = eps_fn(params, x_in, t_batch, hint_c)
            noise_pred = noise_pred.astype(jnp.float32)
            xt_next, _x0 = sample_prev_timestep(sched, xt, noise_pred, t, kstep)
            return (xt_next, key)

        def outer(carry, j):
            def inner(k, c):
                return step(j * record_every + k, c)

            carry = jax.lax.fori_loop(0, record_every, inner, carry,
                                      unroll=unroll)
            return carry, jnp.clip(carry[0], -1.0, 1.0)

        (xt, _), traj = jax.lax.scan(outer, (xt, key),
                                     jnp.arange(T // record_every))
        return xt, traj

    return jax.jit(sampler)


def make_ldm_sampler(
    eps_fn: Callable,
    decode_fn: Callable,
    sched: LinearSchedule,
    latent_shape: tuple[int, ...],
    record_every: int = 1,
    mesh=None,
    ddim_steps: int | None = None,
    eta: float = 0.0,
    solver: str = "ddim",
):
    """Latent-space sampler: scan in latent space, VAE-decode only the final
    x_0 on device (the reference decodes only at t==0 as well,
    sample_ldm_vae.py:40-44).

    ``decode_fn(vae_params, z)``.  Returns
    ``sampler(unet_params, vae_params, key[, hint]) ->
       (decoded images, latent trajectory)``.  ``mesh`` shards the batch
    over the data axis (denoise AND decode stay batch-parallel).

    ``ddim_steps`` switches the latent loop to a few-step sampler (``solver``
    picks "ddim" — sample/ddim.py, ``eta`` per ddim_step — or "dpm" —
    DPM-Solver++(2M), sample/dpm.py) — same checkpoint, 10-50x fewer UNet
    evaluations; ``record_every`` is ignored in that mode (one snapshot per
    few-step update).
    """
    if ddim_steps is not None:
        from controlnet_tpu.sample import make_few_step_sampler

        latent_sampler = make_few_step_sampler(solver, eps_fn, sched, latent_shape,
                                               num_steps=ddim_steps, eta=eta,
                                               mesh=mesh)
    else:
        latent_sampler = make_ddpm_sampler(eps_fn, sched, latent_shape, record_every,
                                           mesh=mesh)

    def sampler(unet_params, vae_params, key, hint=None):
        z0, traj = latent_sampler(unet_params, key, hint)
        images = decode_fn(vae_params, z0)
        return images, traj

    jitted = jax.jit(sampler)

    def wrapped(unet_params, vae_params, key, hint=None):
        return jitted(unet_params, vae_params, key, hint)

    # few-step mode: forward the visited timestep ladder for artifact naming
    # (the single source of truth — tools must not recompute it)
    wrapped.timesteps = getattr(latent_sampler, "timesteps", None)
    return wrapped
