"""DDIM sampler tests (additive capability over the reference's ancestral-only
sampling, scheduler/linear_noise_scheduler.py:49-77).

Key property: eta=1 over the FULL timestep sequence is algebraically the
ancestral sampler, so the whole few-step machinery is pinned to the parity-
proven DDPM math; eta=0 is deterministic given x_T.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu.models.unet import UNet
from controlnet_tpu.sample.ddim import ddim_timesteps, make_ddim_sampler
from controlnet_tpu.sample.ddpm import make_ddpm_sampler, make_ldm_sampler
from controlnet_tpu.schedules.linear import (
    ddim_step,
    make_linear_schedule,
    sample_prev_timestep,
)


def test_ddim_timesteps_sequence():
    ts = ddim_timesteps(1000, 50)
    assert ts[0] == 999 and ts[-1] == 0
    assert len(ts) == 50
    assert np.all(np.diff(ts) < 0)  # strictly descending
    # full-length sequence is exactly T-1 .. 0
    np.testing.assert_array_equal(ddim_timesteps(20, 20), np.arange(19, -1, -1))


def test_eta1_fullsteps_matches_ancestral_step():
    """A single eta=1 DDIM step with t_prev = t-1 must reproduce the ancestral
    transition exactly (same key): sigma^2 collapses to the DDPM posterior
    variance and the mean terms match algebraically."""
    sched = make_linear_schedule(100, 1e-4, 0.02)
    key = jax.random.PRNGKey(0)
    xt = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    eps = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    for t in [99, 50, 7, 1]:
        anc, x0_anc = sample_prev_timestep(sched, xt, eps, t, key)
        dd, x0_dd = ddim_step(sched, xt, eps, t, t - 1, key, eta=1.0)
        np.testing.assert_allclose(np.asarray(dd), np.asarray(anc),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(x0_dd), np.asarray(x0_anc),
                                   atol=1e-6)
    # the final step (t=0 ancestral == t_prev=-1 DDIM) returns the x0 mean
    # with no noise
    anc, _ = sample_prev_timestep(sched, xt, eps, 0, key)
    dd, _ = ddim_step(sched, xt, eps, 0, -1, key, eta=1.0)
    np.testing.assert_allclose(np.asarray(dd), np.asarray(anc), atol=2e-5, rtol=1e-5)


def test_eta0_is_deterministic_in_key():
    """eta=0 uses no step noise: different step keys, same state -> same
    output (the only randomness is x_T)."""
    sched = make_linear_schedule(50, 1e-4, 0.02)
    xt = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    eps = 0.1 * xt
    a, _ = ddim_step(sched, xt, eps, 30, 20, jax.random.PRNGKey(2), eta=0.0)
    b, _ = ddim_step(sched, xt, eps, 30, 20, jax.random.PRNGKey(3), eta=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # eta=1 does inject key-dependent noise
    c, _ = ddim_step(sched, xt, eps, 30, 20, jax.random.PRNGKey(2), eta=1.0)
    d, _ = ddim_step(sched, xt, eps, 30, 20, jax.random.PRNGKey(3), eta=1.0)
    assert float(jnp.abs(c - d).max()) > 0


def test_ddim_sampler_fullsteps_eta1_equals_ancestral_sampler(tiny_model_config):
    """End-to-end: the DDIM sampler at num_steps=T, eta=1 walks the same
    timesteps with the same key-split discipline as make_ddpm_sampler, so the
    two full loops must coincide to float tolerance."""
    T = 12
    sched = make_linear_schedule(T, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    anc = make_ddpm_sampler(lambda p, x, t: u(p, x, t), sched, (2, 8, 8, 1))
    dd = make_ddim_sampler(lambda p, x, t: u(p, x, t), sched, (2, 8, 8, 1),
                           num_steps=T, eta=1.0)
    assert dd.timesteps == list(range(T - 1, -1, -1))
    x_anc, traj_anc = anc(p, jax.random.PRNGKey(7))
    x_dd, traj_dd = dd(p, jax.random.PRNGKey(7))
    np.testing.assert_allclose(np.asarray(x_dd), np.asarray(x_anc),
                               atol=5e-4, rtol=1e-4)
    assert traj_dd.shape == traj_anc.shape
    np.testing.assert_allclose(np.asarray(traj_dd[-1]), np.asarray(traj_anc[-1]),
                               atol=5e-4)


def test_ddim_sampler_fewstep_shapes_and_determinism(tiny_model_config):
    T = 20
    sched = make_linear_schedule(T, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    sampler = make_ddim_sampler(lambda p, x, t: u(p, x, t), sched, (2, 8, 8, 1),
                                num_steps=5)
    assert len(sampler.timesteps) == 5
    x0, traj = sampler(p, jax.random.PRNGKey(1))
    assert x0.shape == (2, 8, 8, 1)
    assert traj.shape == (5, 2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(x0)))
    assert np.all(np.abs(np.asarray(traj)) <= 1.0)
    # same key -> identical; different key -> different x_T -> different out
    x0b, _ = sampler(p, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x0b))
    x0c, _ = sampler(p, jax.random.PRNGKey(2))
    assert float(jnp.abs(x0 - x0c).max()) > 0


def test_ddim_sampler_hint_and_compute_dtype(tiny_model_config):
    """Pytree hints survive the bf16 cast, mirroring make_ddpm_sampler's
    contract (the ControlNet tools pass hoisted hint-feature pytrees)."""
    T = 8
    sched = make_linear_schedule(T, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    hint = {"a": jnp.ones((2, 8, 8, 1), jnp.float32)}

    def eps_fn(p, x, t, h):
        assert h["a"].dtype == jnp.bfloat16
        return u(p, x + h["a"].astype(x.dtype) * 0, t)

    sampler = make_ddim_sampler(eps_fn, sched, (2, 8, 8, 1), num_steps=4,
                                compute_dtype=jnp.bfloat16)
    x0, traj = sampler(p, jax.random.PRNGKey(1), hint)
    assert x0.shape == (2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(x0)))


def test_ldm_sampler_ddim_mode(tiny_model_config):
    """make_ldm_sampler(ddim_steps=...) runs the few-step loop in latent
    space and still decodes only the final z."""
    T = 10
    sched = make_linear_schedule(T, 1e-4, 0.02, ldm_scheduler=True)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    decode_calls = []

    def decode(vp, z):
        decode_calls.append(1)
        return jnp.tanh(z)

    sampler = make_ldm_sampler(lambda p, x, t: u(p, x, t), decode, sched,
                               (2, 8, 8, 1), ddim_steps=4)
    img, traj = sampler(p, None, jax.random.PRNGKey(3))
    assert img.shape == (2, 8, 8, 1)
    assert traj.shape == (4, 2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(img)))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_ddim_sampler_mesh_matches_single_device(tiny_model_config):
    """Batch-sharded DDIM sampling is bit-identical to single-device (threefry
    is counter-based, so sharding cannot change the draws)."""
    from controlnet_tpu.parallel.mesh import make_mesh, replicate

    T = 10
    sched = make_linear_schedule(T, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    single = make_ddim_sampler(lambda p, x, t: u(p, x, t), sched, (8, 8, 8, 1),
                               num_steps=5)
    x_ref, _ = single(p, jax.random.PRNGKey(11))

    mesh = make_mesh(jax.devices()[:8])
    sharded = make_ddim_sampler(lambda p, x, t: u(p, x, t), sched, (8, 8, 8, 1),
                                num_steps=5, mesh=mesh)
    x_sh, _ = sharded(replicate(p, mesh), jax.random.PRNGKey(11))
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), atol=1e-6)
