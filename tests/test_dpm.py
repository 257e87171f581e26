"""DPM-Solver++(2M) sampler tests (sample/dpm.py — second-order few-step
sampling, additive over the reference's ancestral-only loop).

The sharp anchors:
* the solver's first-order reduction (first step / 1-step run) must equal
  deterministic DDIM exactly (same x_T draw discipline), and
* on an ANALYTIC Gaussian diffusion — where the probability-flow ODE map is
  known in closed form (x scales by sqrt(var_end/var_start)) — the 2M
  solver must beat first-order DDIM at equal step count and converge.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu.models.unet import UNet
from controlnet_tpu.sample.ddim import make_ddim_sampler
from controlnet_tpu.sample.dpm import make_dpm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule

SHAPE = (4, 4, 4, 1)


def _analytic_gaussian(sched, s2: float):
    """Exact eps for data ~ N(0, s2*I): marginal x_t ~ N(0, acp*s2 + 1-acp),
    eps(x, t) = x * sqrt(1-acp) / var_t (the score times -sigma_t)."""
    acp = sched.alpha_cum_prod

    def eps_fn(params, x, t):
        a = acp[t]
        var = a * s2 + (1.0 - a)
        return x * (jnp.sqrt(1.0 - a) / var)[:, None, None, None]

    return eps_fn


def _exact_map(sched, s2: float, x_start: np.ndarray) -> np.ndarray:
    """Closed-form probability-flow ODE solution for the Gaussian model:
    the velocity field is linear in x, so trajectories scale with the
    marginal std — x_end = x_start * sqrt(var_end / var_start), with
    var_end = s2 (alpha_bar -> 1) and var_start at the first visited t."""
    a0 = float(sched.alpha_cum_prod[sched.num_timesteps - 1])
    var_start = a0 * s2 + (1.0 - a0)
    return x_start * np.sqrt(s2 / var_start)


def _x_start(key):
    """Reproduce the samplers' internal x_T draw (k0 of one split)."""
    k0, _ = jax.random.split(key)
    return np.asarray(jax.random.normal(k0, SHAPE, jnp.float32))


def test_dpm_beats_ddim_on_analytic_gaussian():
    s2 = 0.25
    sched = make_linear_schedule(1000, 1e-4, 0.02)
    eps_fn = _analytic_gaussian(sched, s2)
    key = jax.random.PRNGKey(5)
    exact = _exact_map(sched, s2, _x_start(key))
    scale = float(np.abs(exact).mean())

    def err(make, steps):
        sampler = make(eps_fn, sched, SHAPE, num_steps=steps)
        x0, _ = sampler(None, key)
        return float(np.abs(np.asarray(x0) - exact).max()) / scale

    e_ddim_10, e_dpm_10 = err(make_ddim_sampler, 10), err(make_dpm_sampler, 10)
    e_ddim_50, e_dpm_50 = err(make_ddim_sampler, 50), err(make_dpm_sampler, 50)
    # second order beats first order at equal step count; by 50 steps the
    # gap is the order difference, not noise (measured: ddim 0.057/0.40 vs
    # dpm 0.016/0.40 absolute-over-scale; at 100 steps 0.029 vs 0.005)
    assert e_dpm_10 < e_ddim_10, (e_dpm_10, e_ddim_10)
    assert e_dpm_50 < 0.5 * e_ddim_50, (e_dpm_50, e_ddim_50)
    # both converge with more steps, and the 2M solver is genuinely accurate
    assert e_ddim_50 < e_ddim_10 and e_dpm_50 < e_dpm_10
    assert e_dpm_50 < 0.06, e_dpm_50


def test_dpm_first_order_reduction_is_ddim(tiny_model_config):
    """num_steps=1 (and the FIRST step of any run) has no multistep history,
    so the update must coincide with deterministic DDIM bit-for-bit modulo
    float assoc — same key => same x_T => same first snapshot."""
    T = 20
    sched = make_linear_schedule(T, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(3)
    shape = (2, 8, 8, 1)

    dd1 = make_ddim_sampler(lambda p, x, t: u(p, x, t), sched, shape, num_steps=1)
    dp1 = make_dpm_sampler(lambda p, x, t: u(p, x, t), sched, shape, num_steps=1)
    x_dd, _ = dd1(p, key)
    x_dp, _ = dp1(p, key)
    np.testing.assert_allclose(np.asarray(x_dp), np.asarray(x_dd),
                               atol=1e-5, rtol=1e-5)

    dd = make_ddim_sampler(lambda p, x, t: u(p, x, t), sched, shape, num_steps=5)
    dp = make_dpm_sampler(lambda p, x, t: u(p, x, t), sched, shape, num_steps=5)
    assert dp.timesteps == dd.timesteps
    _, traj_dd = dd(p, key)
    _, traj_dp = dp(p, key)
    np.testing.assert_allclose(np.asarray(traj_dp[0]), np.asarray(traj_dd[0]),
                               atol=1e-5, rtol=1e-5)
    # later steps DIVERGE (the 2M correction is real)
    assert float(jnp.abs(traj_dp[-1] - traj_dd[-1]).max()) > 1e-6


def test_dpm_sampler_shapes_determinism_hints(tiny_model_config):
    T = 16
    sched = make_linear_schedule(T, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    shape = (2, 8, 8, 1)
    sampler = make_dpm_sampler(lambda p, x, t: u(p, x, t), sched, shape, num_steps=6)
    assert len(sampler.timesteps) == 6
    x0, traj = sampler(p, jax.random.PRNGKey(1))
    assert x0.shape == shape and traj.shape == (6,) + shape
    assert np.all(np.isfinite(np.asarray(x0)))
    assert np.all(np.abs(np.asarray(traj)) <= 1.0)
    # deterministic given the key; different key -> different x_T -> different
    x0b, _ = sampler(p, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(x0), np.asarray(x0b))
    x0c, _ = sampler(p, jax.random.PRNGKey(2))
    assert float(jnp.abs(x0 - x0c).max()) > 0

    # pytree hints survive the bf16 cast (ControlNet tools' contract)
    hint = {"a": jnp.ones(shape, jnp.float32)}

    def eps_fn(p, x, t, h):
        assert h["a"].dtype == jnp.bfloat16
        return u(p, x + h["a"].astype(x.dtype) * 0, t)

    hs = make_dpm_sampler(eps_fn, sched, shape, num_steps=3,
                          compute_dtype=jnp.bfloat16)
    xh, _ = hs(p, jax.random.PRNGKey(1), hint)
    assert np.all(np.isfinite(np.asarray(xh)))


def test_few_step_factory_guards():
    from controlnet_tpu.sample import make_few_step_sampler

    sched = make_linear_schedule(10, 1e-4, 0.02)
    with pytest.raises(ValueError, match="deterministic"):
        make_few_step_sampler("dpm", lambda p, x, t: x, sched, SHAPE,
                              num_steps=4, eta=0.5)
    with pytest.raises(ValueError, match="unknown few-step sampler"):
        make_few_step_sampler("plms", lambda p, x, t: x, sched, SHAPE, num_steps=4)


def test_ldm_sampler_dpm_mode(tiny_model_config):
    """make_ldm_sampler(ddim_steps=..., solver='dpm') runs the 2M loop in
    latent space (incl. the CompVis sqrt-space schedule) and still decodes
    only the final z."""
    from controlnet_tpu.sample.ddpm import make_ldm_sampler

    T = 10
    sched = make_linear_schedule(T, 1e-4, 0.02, ldm_scheduler=True)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    sampler = make_ldm_sampler(lambda p, x, t: u(p, x, t),
                               lambda vp, z: jnp.tanh(z), sched,
                               (2, 8, 8, 1), ddim_steps=4, solver="dpm")
    img, traj = sampler(p, None, jax.random.PRNGKey(3))
    assert img.shape == (2, 8, 8, 1) and traj.shape == (4, 2, 8, 8, 1)
    assert np.all(np.isfinite(np.asarray(img)))


@pytest.mark.slow
@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dpm_sampler_mesh_matches_single_device(tiny_model_config):
    from controlnet_tpu.parallel.mesh import make_mesh, replicate

    T = 10
    sched = make_linear_schedule(T, 1e-4, 0.02)
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    single = make_dpm_sampler(lambda p, x, t: u(p, x, t), sched, (8, 8, 8, 1),
                              num_steps=5)
    x_ref, _ = single(p, jax.random.PRNGKey(11))
    mesh = make_mesh(jax.devices()[:8])
    sharded = make_dpm_sampler(lambda p, x, t: u(p, x, t), sched, (8, 8, 8, 1),
                               num_steps=5, mesh=mesh)
    x_sh, _ = sharded(replicate(p, mesh), jax.random.PRNGKey(11))
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), atol=1e-6)
