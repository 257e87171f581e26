"""Classifier-free guidance tests (sample/cfg.py + the cfg_drop_prob train
wiring).

Additive capability over the reference, which defines the CFG condition
drops (utils/diffusion_utils.py:21-46) but wires them into no trainer or
sampler (SURVEY.md component #19).  Pinned properties:

* the guidance formula (s=0 -> null branch, s=1 -> conditional branch,
  linearity in s);
* batched (one 2B call) == sequential (two B calls) evaluation;
* composition through the real samplers: a cfg-wrapped sampler with
  identical cond/null hints reproduces the plain conditional sampler
  bit-for-bit under every solver;
* cfg_drop_prob=0 keeps the training step bit-identical to the default
  (the shared-RNG replay evidence chain must not move), drop=1 equals
  training on zeroed hints;
* null_hint_features == hint_features of an explicit zero-hint batch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.sample import make_ddpm_sampler, make_few_step_sampler
from controlnet_tpu.sample.cfg import make_cfg_eps_fn, null_hint_features
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_controlnet_train_step
from controlnet_tpu.train.state import create_train_state


def _linear_eps(params, x, t, hint):
    # eps linear in x and hint: exact algebra for the formula checks
    return params["a"] * x + params["b"] * hint + 0.01 * t[:, None, None, None]


@pytest.fixture()
def lin_setup():
    params = {"a": jnp.float32(0.7), "b": jnp.float32(-0.3)}
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 1))
    t = jnp.full((4,), 13, jnp.int32)
    hc = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    hu = jnp.zeros_like(hc)
    return params, x, t, hc, hu


@pytest.mark.parametrize("batched", [True, False])
def test_cfg_formula_endpoints_and_linearity(lin_setup, batched):
    params, x, t, hc, hu = lin_setup
    eps_c = _linear_eps(params, x, t, hc)
    eps_u = _linear_eps(params, x, t, hu)
    for s in [0.0, 1.0, 2.5, 7.5]:
        got = make_cfg_eps_fn(_linear_eps, s, batched=batched)(params, x, t, (hc, hu))
        want = eps_u + s * (eps_c - eps_u)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-6, rtol=1e-6)


def test_cfg_batched_equals_sequential(lin_setup):
    params, x, t, hc, hu = lin_setup
    a = make_cfg_eps_fn(_linear_eps, 3.0, batched=True)(params, x, t, (hc, hu))
    b = make_cfg_eps_fn(_linear_eps, 3.0, batched=False)(params, x, t, (hc, hu))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("solver", ["ancestral", "ddim", "dpm"])
def test_cfg_identity_through_samplers(tiny_model_config, solver):
    """cond==null makes the guidance term vanish: eps_u + s*(eps_c-eps_u)
    with eps_c == eps_u is exactly eps_u, so a cfg-wrapped sampler must
    reproduce the plain conditional sampler bit-for-bit under EVERY solver
    (the wrapper composes through the shared eps_fn contract)."""
    T = 10
    sched = make_linear_schedule(T, 1e-4, 0.02)
    cn = ControlNet(1, tiny_model_config)
    p = cn.init(jax.random.PRNGKey(0))
    shape = (2, 8, 8, 1)
    hints = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    feats = cn.hint_features(p, hints)
    eps = lambda pp, x, t, f: cn(pp, x, t, hint_features=f)

    if solver == "ancestral":
        plain = make_ddpm_sampler(eps, sched, shape)
        guided = make_ddpm_sampler(make_cfg_eps_fn(eps, 4.0), sched, shape)
    else:
        plain = make_few_step_sampler(solver, eps, sched, shape, num_steps=5)
        guided = make_few_step_sampler(solver, make_cfg_eps_fn(eps, 4.0),
                                       sched, shape, num_steps=5)
    key = jax.random.PRNGKey(7)
    x_plain, _ = plain(p, key, feats)
    x_guided, _ = guided(p, key, (feats, feats))
    np.testing.assert_allclose(np.asarray(x_guided), np.asarray(x_plain),
                               atol=1e-5, rtol=1e-5)


def test_cfg_scale_changes_samples(tiny_model_config):
    """With a real null branch (zero hint), different scales must produce
    different samples — guidance actually steers the trajectory."""
    T = 10
    sched = make_linear_schedule(T, 1e-4, 0.02)
    cn = ControlNet(1, tiny_model_config)
    p = cn.init(jax.random.PRNGKey(0))
    # break the zero-conv init: at init the control branch output is exactly
    # zero, so hints (and therefore guidance) cannot steer anything yet
    p = jax.tree.map(
        lambda a: a + 0.05 * jnp.sin(jnp.arange(a.size, dtype=jnp.float32)
                                     ).reshape(a.shape), p)
    shape = (2, 8, 8, 1)
    hints = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    feats = cn.hint_features(p, hints)
    nfeats = null_hint_features(cn.hint_features, p, (8, 8, 3), 2)
    eps = lambda pp, x, t, f: cn(pp, x, t, hint_features=f)
    key = jax.random.PRNGKey(7)
    s1 = make_few_step_sampler("ddim", make_cfg_eps_fn(eps, 1.0), sched, shape,
                               num_steps=5)(p, key, (feats, nfeats))[0]
    s5 = make_few_step_sampler("ddim", make_cfg_eps_fn(eps, 5.0), sched, shape,
                               num_steps=5)(p, key, (feats, nfeats))[0]
    assert float(jnp.abs(s1 - s5).max()) > 1e-4


def test_null_hint_features_matches_explicit_zeros(tiny_model_config):
    cn = ControlNet(1, tiny_model_config)
    p = cn.init(jax.random.PRNGKey(0))
    want = cn.hint_features(p, jnp.zeros((3, 8, 8, 3)))
    got = null_hint_features(cn.hint_features, p, (8, 8, 3), 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_cfg_drop_prob_zero_is_bit_identical(tiny_model_config):
    """The opt-in knob must not move the default path's RNG stream: the
    full-config shared-RNG parity evidence pins those numerics."""
    sched = make_linear_schedule(50, 1e-4, 0.02)
    cn = ControlNet(1, tiny_model_config)
    trainable, frozen = cn.split_params(cn.init(jax.random.PRNGKey(0)))
    tx = optax.adam(1e-3)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1), minval=-1, maxval=1)
    hints = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))

    # the step donates its state: give each call its own copy of the params
    fresh = lambda: create_train_state(jax.tree.map(jnp.copy, trainable), tx)
    s_def, l_def = make_controlnet_train_step(cn, sched, tx)(
        fresh(), frozen, images, hints, jax.random.PRNGKey(3))
    s_cfg, l_cfg = make_controlnet_train_step(cn, sched, tx, cfg_drop_prob=0.0)(
        fresh(), frozen, images, hints, jax.random.PRNGKey(3))
    assert float(l_def) == float(l_cfg)
    for a, b in zip(jax.tree.leaves(s_def.params), jax.tree.leaves(s_cfg.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cfg_drop_prob_one_equals_zero_hints(tiny_model_config):
    """drop_prob=1 zeroes every hint: the loss must equal the same step fed
    explicit zero hints (the null condition is exactly the trained one)."""
    sched = make_linear_schedule(50, 1e-4, 0.02)
    cn = ControlNet(1, tiny_model_config)
    trainable, frozen = cn.split_params(cn.init(jax.random.PRNGKey(0)))
    tx = optax.adam(1e-3)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 1), minval=-1, maxval=1)
    hints = jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 8, 3))
    key = jax.random.PRNGKey(3)

    fresh = lambda: create_train_state(jax.tree.map(jnp.copy, trainable), tx)
    step_drop = make_controlnet_train_step(cn, sched, tx, cfg_drop_prob=1.0)
    _, loss_drop = step_drop(fresh(), frozen, images, hints, key)

    # reproduce the dropped step's RNG stream: it burns one split for kd
    key_after, _kd = jax.random.split(key)
    step_plain = make_controlnet_train_step(cn, sched, tx)
    _, loss_zero = step_plain(fresh(), frozen, images,
                              jnp.zeros_like(hints), key_after)
    np.testing.assert_allclose(float(loss_drop), float(loss_zero), rtol=1e-6)
