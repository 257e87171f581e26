"""Scheduler algebra tests — numerical parity with the reference math
(scheduler/linear_noise_scheduler.py, scheduler/consistency_scheduler.py,
consistency_controlnet_distilled.py:179-258)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu.schedules import (
    add_noise,
    eps_to_x0,
    geometric_sigmas,
    karras_sigmas,
    make_linear_schedule,
    sample_log_uniform_sigmas,
    sample_prev_timestep,
    sigma_to_timestep,
)


def test_linear_schedule_tables():
    s = make_linear_schedule(1000, 1e-4, 0.02)
    assert s.betas.shape == (1000,)
    np.testing.assert_allclose(float(s.betas[0]), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s.betas[-1]), 0.02, rtol=1e-6)
    # alpha-bar is monotonically decreasing in (0, 1]
    acp = np.asarray(s.alpha_cum_prod)
    assert np.all(np.diff(acp) < 0)
    assert acp[0] <= 1.0 and acp[-1] > 0.0
    np.testing.assert_allclose(np.asarray(s.sqrt_alpha_cum_prod) ** 2, acp, rtol=1e-5)


def test_ldm_schedule_sqrt_space():
    """CompVis variant interpolates in sqrt-beta space
    (linear_noise_scheduler.py:13-17)."""
    s = make_linear_schedule(10, 0.0015, 0.0195, ldm_scheduler=True)
    expected = np.linspace(0.0015**0.5, 0.0195**0.5, 10) ** 2
    np.testing.assert_allclose(np.asarray(s.betas), expected, rtol=1e-5)


def test_add_noise_endpoints():
    s = make_linear_schedule(1000, 1e-4, 0.02)
    x0 = jnp.ones((2, 4, 4, 1))
    noise = jnp.full((2, 4, 4, 1), 2.0)
    # t=0: nearly clean
    out = add_noise(s, x0, noise, jnp.array([0, 0]))
    np.testing.assert_allclose(
        np.asarray(out),
        float(s.sqrt_alpha_cum_prod[0]) + 2 * float(s.sqrt_one_minus_alpha_cum_prod[0]),
        rtol=1e-5,
    )
    # variance preservation: sa^2 + soma^2 == 1 at every t
    sa = np.asarray(s.sqrt_alpha_cum_prod)
    soma = np.asarray(s.sqrt_one_minus_alpha_cum_prod)
    np.testing.assert_allclose(sa**2 + soma**2, 1.0, atol=1e-6)


def test_eps_to_x0_inverts_add_noise():
    """If the model predicted the exact noise, eps_to_x0 recovers x0."""
    s = make_linear_schedule(1000, 1e-4, 0.02)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (3, 4, 4, 2), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 500, 900])
    xt = add_noise(s, x0, noise, t)
    rec = eps_to_x0(s, xt, noise, t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def test_sample_prev_timestep_t0_deterministic():
    """At t == 0 the step returns the posterior mean with no added noise
    (linear_noise_scheduler.py:65-66)."""
    s = make_linear_schedule(100, 1e-4, 0.02)
    xt = jnp.ones((1, 4, 4, 1)) * 0.3
    eps = jnp.ones_like(xt) * 0.1
    out1, x0a = sample_prev_timestep(s, xt, eps, jnp.int32(0), jax.random.PRNGKey(0))
    out2, x0b = sample_prev_timestep(s, xt, eps, jnp.int32(0), jax.random.PRNGKey(42))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    np.testing.assert_allclose(np.asarray(x0a), np.asarray(x0b))
    # x0 clamped to [-1, 1]
    assert np.all(np.abs(np.asarray(x0a)) <= 1.0)


def test_sample_prev_timestep_matches_formula():
    s = make_linear_schedule(100, 1e-4, 0.02)
    t = 50
    xt = jnp.ones((1, 2, 2, 1)) * 0.5
    eps = jnp.ones_like(xt) * 0.2
    _, x0 = sample_prev_timestep(s, xt, eps, jnp.int32(t), jax.random.PRNGKey(0))
    expected_x0 = (0.5 - float(s.sqrt_one_minus_alpha_cum_prod[t]) * 0.2) / np.sqrt(
        float(s.alpha_cum_prod[t])
    )
    np.testing.assert_allclose(np.asarray(x0)[0, 0, 0, 0], np.clip(expected_x0, -1, 1), rtol=1e-5)


def test_geometric_sigmas():
    sig = np.asarray(geometric_sigmas(10, 0.002, 80.0))
    np.testing.assert_allclose(sig[0], 0.002, rtol=1e-5)
    np.testing.assert_allclose(sig[-1], 80.0, rtol=1e-4)
    assert np.all(np.diff(np.log(sig)) > 0)  # geometric => log-linear


def test_karras_sigmas_endpoints():
    sig = np.asarray(karras_sigmas(18, 0.002, 80.0, rho=7.0))
    np.testing.assert_allclose(sig[0], 0.002, rtol=1e-4)
    np.testing.assert_allclose(sig[-1], 80.0, rtol=1e-4)


def test_sigma_to_timestep_roundtrip():
    """sigma(t) -> t recovers t exactly (the schedule is monotone)."""
    s = make_linear_schedule(1000, 1e-4, 0.02)
    acp = s.alpha_cum_prod
    sigma_sched = jnp.sqrt((1 - acp) / acp)
    for t in [0, 5, 500, 999]:
        got = int(sigma_to_timestep(sigma_sched[t], acp)[0])
        assert got == t


def test_log_uniform_sigmas_in_range():
    sig = np.asarray(sample_log_uniform_sigmas(jax.random.PRNGKey(0), 512, 0.002, 80.0))
    assert sig.min() >= 0.002 and sig.max() <= 80.0
    # roughly log-uniform: median near geometric mean
    gm = np.sqrt(0.002 * 80.0)
    assert gm / 4 < np.median(sig) < gm * 4


def test_consistency_scheduler_class():
    """API-parity wrapper (scheduler/consistency_scheduler.py:4-60)."""
    from controlnet_tpu.schedules.consistency import ConsistencyScheduler

    cs = ConsistencyScheduler(10, 0.002, 80.0)
    assert cs.sigmas.shape == (10,)
    x0 = jnp.ones((2, 4, 4, 1))
    x_t, eps = cs.add_noise(x0, jnp.array([0, 9]), jax.random.PRNGKey(0))
    assert x_t.shape == x0.shape and eps.shape == x0.shape
    # t=0 adds sigma_min noise; t=9 adds sigma_max noise
    assert float(jnp.abs(x_t[0] - 1.0).max()) < 0.01
    assert float(jnp.abs(x_t[1] - 1.0).max()) > 10.0

    model_fn = lambda x, t, hint: x * 0.5
    loss = cs.consistency_loss(model_fn, x_t, jnp.array([5, 5]), None, x0,
                               jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out = cs.sample(model_fn, x_t, jnp.array([9, 9]), None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x_t) * 0.5)
