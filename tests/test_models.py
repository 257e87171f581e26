"""Model-level property tests on tiny configs (SURVEY.md §4: shape/dtype
contracts, zero-conv identity, EDM boundary condition, EMA math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu.models.consistency import ConsistencyControlNet, ConsistencyDistilled
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.discriminator import Discriminator
from controlnet_tpu.models.dmd import (
    DistributionMatchingControlNet,
    DistributionMatchingDistilled,
    FeatureExtractor,
)
from controlnet_tpu.models.lpips import LPIPS
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.models.vae import VAE


@pytest.fixture(scope="module")
def unet_and_params(tiny_model_config):
    u = UNet(1, tiny_model_config)
    p = u.init(jax.random.PRNGKey(0))
    return u, p


def test_unet_forward_shape(unet_and_params):
    u, p = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    out = jax.jit(lambda p, x, t: u(p, x, t))(p, x, jnp.array([3, 7]))
    assert out.shape == (2, 8, 8, 1)
    assert jnp.all(jnp.isfinite(out))


def test_unet_encoder_only_variant(tiny_model_config):
    """use_up=False drops the decoder (unet_base.py:332) — used by the
    ControlNet control copy."""
    u = UNet(1, tiny_model_config, use_up=False)
    p = u.init(jax.random.PRNGKey(0))
    assert "ups" not in p and "conv_out" not in p


def test_controlnet_zero_conv_identity(tiny_model_config, unet_and_params):
    """THE defining ControlNet property: at init (zero convs all zero),
    ControlNet(x, t, hint) == base UNet(x, t) exactly
    (controlnet.py:85-107)."""
    u, p = unet_and_params
    cn = ControlNet(1, tiny_model_config)
    cp = cn.init(jax.random.PRNGKey(1), trained_unet_params=p)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    t = jnp.array([5, 9])
    hint = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 3))

    @jax.jit
    def both(p, cp, x, t, hint):
        return u(p, x, t), cn(cp, x, t, hint)

    out, cout = both(p, cp, x, t, hint)
    np.testing.assert_allclose(np.asarray(cout), np.asarray(out), atol=1e-6)


def test_controlnet_split_merge_roundtrip(tiny_model_config):
    cn = ControlNet(1, tiny_model_config)
    cp = cn.init(jax.random.PRNGKey(0))
    tr, fr = cn.split_params(cp)
    merged = cn.merge_params(tr, fr)
    assert jax.tree.all(jax.tree.map(lambda a, b: (a == b).all(), merged, cp))
    # unlocked: decoder moves to the trainable side (controlnet.py:152-155)
    cn_u = ControlNet(1, tiny_model_config, model_locked=False)
    cp2 = cn_u.init(jax.random.PRNGKey(0))
    tr2, fr2 = cn_u.split_params(cp2)
    assert "ups" in tr2["trained_unet"] and "ups" not in fr2["trained_unet"]


def test_controlnet_fused_forward_parity(tiny_model_config):
    """forward_fused (stacked vmapped trunks, the sampling fast path) must
    compute the same function as __call__ — including through attention and
    with non-zero zero-convs so the control branch actually contributes."""
    cn = ControlNet(1, tiny_model_config)
    cp = cn.init(jax.random.PRNGKey(0))
    cp["down_zero"] = [jax.tree.map(lambda a: a + 0.03, z) for z in cp["down_zero"]]
    cp["mid_zero"] = [jax.tree.map(lambda a: a + 0.03, z) for z in cp["mid_zero"]]
    # desynchronize the control trunk from the frozen trunk
    cp["control_unet"] = jax.tree.map(lambda a: a + 0.01, cp["control_unet"])
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    t = jnp.array([5, 100])
    hint = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 3))

    ref = jax.jit(lambda p: cn(p, x, t, hint))(cp)
    fused = jax.jit(lambda p: cn.forward_fused(p, x, t, hint))(cp)
    assert ref.shape == fused.shape
    assert float(jnp.abs(ref - fused).max()) < 1e-5


def test_controlnet_hint_changes_output(tiny_model_config):
    """After perturbing the zero convs, the hint must influence the output."""
    cn = ControlNet(1, tiny_model_config)
    cp = cn.init(jax.random.PRNGKey(0))
    cp["down_zero"] = [
        jax.tree.map(lambda a: a + 0.05, z) for z in cp["down_zero"]
    ]
    cp["hint_block"]["layers"][-1]["w"] = (
        cp["hint_block"]["layers"][-1]["w"] + 0.05
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 1))
    t = jnp.array([5])
    h1 = jnp.zeros((1, 8, 8, 3))
    h2 = jnp.ones((1, 8, 8, 3))

    @jax.jit
    def f(cp, h):
        return cn(cp, x, t, h)

    assert float(jnp.abs(f(cp, h1) - f(cp, h2)).max()) > 1e-6


def test_ldm_controlnet_dynamic_hint_block(tiny_model_config):
    """down_sample_factor=4: hint at 32x32 must reach the 8x8 latent grid
    (controlnet_ldm.py:45-79)."""
    cn = ControlNet(1, tiny_model_config, down_sample_factor=4)
    cp = cn.init(jax.random.PRNGKey(0))
    hint = jnp.zeros((2, 32, 32, 3))
    out = jax.jit(lambda p, h: cn.hint_block(p, h))(cp["hint_block"], hint)
    assert out.shape == (2, 8, 8, tiny_model_config["down_channels"][0])


def test_vae_shapes_and_kl_finite(tiny_vae_config):
    vae = VAE(3, tiny_vae_config)
    p = vae.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))

    @jax.jit
    def run(p, x, key):
        recon, enc = vae(p, x, key)
        z, _ = vae.encode(p, x, key)
        return recon, enc, z

    recon, enc, z = run(p, x, jax.random.PRNGKey(2))
    assert recon.shape == x.shape
    # encoder output is mean||logvar at z resolution (8 -> 4 with one downsample)
    assert enc.shape == (2, 4, 4, 2 * tiny_vae_config["z_channels"])
    assert z.shape == (2, 4, 4, tiny_vae_config["z_channels"])
    assert jnp.all(jnp.isfinite(recon))


def test_discriminator_patch_grid():
    """Patch-logit grid with torch shape semantics (strides 2,2,2,1 with
    k=4,p=1): 64 -> 32 -> 16 -> 8 -> 7 (reference smoke test at 256 gives
    31x31, discriminator.py:44-47) — checked at 64x64 for speed."""
    d = Discriminator(im_channels=3)
    p = d.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3))
    out = jax.jit(lambda p, x: d(p, x))(p, x)
    assert out.shape == (2, 7, 7, 1)


def test_consistency_boundary_condition(tiny_model_config):
    """f(x, sigma <= sigma_min) = x (consistency_controlnet_distilled.py:81)."""
    m = ConsistencyControlNet(1, tiny_model_config)
    p = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    hint = jnp.zeros((2, 8, 8, 3))
    sigma = jnp.full((2,), tiny_model_config["sigma_min"])
    out = jax.jit(lambda p, x, s, h: m(p, x, s, h))(p, x, sigma, hint)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_consistency_edm_scalings(tiny_model_config):
    m = ConsistencyControlNet(1, tiny_model_config)
    sd = tiny_model_config["sigma_data"]
    s = jnp.array(2.0)
    np.testing.assert_allclose(float(m.c_skip(s)), sd**2 / (4 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(float(m.c_out(s)), 2 * sd / np.sqrt(4 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(float(m.c_in(s)), 1 / np.sqrt(4 + sd**2), rtol=1e-5)
    np.testing.assert_allclose(float(m.c_noise(s)), 0.25 * np.log(2.0), rtol=1e-5)
    # c_skip^2 consistency: boundary behavior as sigma -> 0
    assert float(m.c_skip(jnp.array(1e-6))) > 0.99
    assert abs(float(m.c_out(jnp.array(1e-6)))) < 1e-5


def test_consistency_ema_update(tiny_model_config):
    model = ConsistencyDistilled(1, tiny_model_config, use_ddpm_teacher=False)
    p = model.init(jax.random.PRNGKey(0))
    p2 = {**p, "student": jax.tree.map(lambda a: a + 1.0, p["student"])}
    p3 = model.update_ema(p2)
    # ema' = 0.995*ema + 0.005*(ema+1) = ema + 0.005
    diff = jax.tree.map(lambda n, o: n - o, p3["ema_teacher"], p["ema_teacher"])
    leaves = jax.tree.leaves(diff)
    for leaf in leaves:
        np.testing.assert_allclose(np.asarray(leaf), 0.005, atol=1e-5)


def test_consistency_losses_injected_noise(tiny_model_config):
    """Passing ``noise=`` explicitly reproduces the keyed draw exactly and
    overrides the key — the contract the shared-RNG replay harness
    (scripts/fidelity_sharedrng.py) relies on."""
    model = ConsistencyDistilled(1, tiny_model_config, use_ddpm_teacher=True)
    p = model.init(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    hint = jnp.zeros((2, 8, 8, 3))
    sigma = jnp.array([0.5, 3.0])
    key = jax.random.PRNGKey(7)
    drawn = jax.random.normal(key, x0.shape, x0.dtype)

    keyed = model.distillation_loss(p, x0, hint, sigma, key)
    injected = model.distillation_loss(p, x0, hint, sigma, jax.random.PRNGKey(999),
                                       noise=drawn)
    for a, b in zip(keyed, injected):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    keyed_c = model.consistency_training_loss(p, x0, hint, sigma, sigma + 1.0, key)
    injected_c = model.consistency_training_loss(
        p, x0, hint, sigma, sigma + 1.0, jax.random.PRNGKey(999), noise=drawn)
    np.testing.assert_allclose(np.asarray(keyed_c), np.asarray(injected_c), rtol=1e-6)


def test_dmd_student_and_losses(tiny_model_config):
    student = DistributionMatchingControlNet(1, tiny_model_config)
    sp = student.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    hint = jnp.zeros((2, 8, 8, 3))
    out = jax.jit(lambda p, x, t, h: student(p, x, t, h))(sp, x, jnp.array([5, 9]), hint)
    assert out.shape == x.shape

    model = DistributionMatchingDistilled(1, tiny_model_config)
    p = model.init(jax.random.PRNGKey(2))

    @jax.jit
    def losses(p, x):
        x2 = x * 0.5
        total, comps = model.true_distribution_matching_loss(p, x, x2)
        same, _ = model.true_distribution_matching_loss(p, x, x)
        w_same = model.wasserstein_distance_loss(x, x)
        return total, same, w_same, comps

    total, same, w_same, comps = losses(p, x)
    assert float(total) > 0 and np.isfinite(float(total))
    np.testing.assert_allclose(float(same), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(w_same), 0.0, atol=1e-7)
    for v in comps.values():
        assert np.isfinite(float(v))


@pytest.mark.slow
def test_dmd_distillation_loss_gradable(tiny_model_config):
    """distillation_loss returns a finite, differentiable scalar
    (reference smoke test: test_distribution_matching.py:89-105)."""
    model = DistributionMatchingDistilled(1, tiny_model_config)
    p = model.init(jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    x_t = x0 + 0.1
    hint = jnp.zeros((2, 8, 8, 3))
    t = jnp.array([5, 9])

    @jax.jit
    def gradfn(student):
        pp = {**p, "student": student}
        total, *_ = model.distillation_loss(pp, x_t, t, hint, x0)
        return total

    g = jax.grad(gradfn)(p["student"])
    gnorm = float(jnp.sqrt(sum(jnp.sum(a**2) for a in jax.tree.leaves(g))))
    assert np.isfinite(gnorm) and gnorm > 0


def test_dmd_feature_extractor_channels(tiny_model_config):
    """32 base channels for grayscale, 64 for RGB
    (distribution_matching_controlnet.py:22)."""
    assert FeatureExtractor(1).base == 32
    assert FeatureExtractor(3).base == 64
    fe = FeatureExtractor(1)
    p = fe.init(jax.random.PRNGKey(0))
    feats = jax.jit(lambda p, x: fe(p, x))(p, jnp.zeros((2, 8, 8, 1)))
    assert [f.shape for f in feats] == [
        (2, 8, 8, 32), (2, 4, 4, 64), (2, 2, 2, 128), (2, 1, 1, 256)]


def test_dmd_vs_controlnet_param_ratio(tiny_model_config):
    """Student/teacher-control-branch capacity stays comparable
    (reference test_distribution_matching.py:111-145 warns outside
    [0.9, 1.1]; we assert a loose envelope)."""
    cn = ControlNet(1, tiny_model_config)
    st = DistributionMatchingControlNet(1, tiny_model_config)
    n_cn = sum(a.size for a in jax.tree.leaves(cn.init(jax.random.PRNGKey(0))))
    n_st = sum(a.size for a in jax.tree.leaves(st.init(jax.random.PRNGKey(0))))
    assert 0.4 < n_st / n_cn < 1.1  # student ~= one UNet; ControlNet ~= 1.6 UNets


def test_lpips_basic_properties():
    lp = LPIPS()
    p = lp.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 16, 16, 3), minval=-1, maxval=1)
    y = jnp.clip(x + 0.3, -1, 1)

    @jax.jit
    def run(p, x, y):
        return lp(p, x, x), lp(p, x, y)

    d_same, d_diff = run(p, x, y)
    assert d_same.shape == (2, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-5)
    assert float(jnp.mean(d_diff)) > 0


def _synthetic_lpips_sd(seed=0, vgg=True, lins=True, lins_prefix="lin"):
    """Synthetic torch state dict in the richzhang/reference key layout
    (reference models/lpips.py:92-116: ``net.slice{s}.{torchvision_idx}.*``
    VGG features, ``lin{k}.model.1.weight`` heads)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    sd = {}
    if vgg:
        layout = {1: [0, 2], 2: [5, 7], 3: [10, 12, 14], 4: [17, 19, 21], 5: [24, 26, 28]}
        plan = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
        in_ch = 3
        for s, (out_ch, n) in enumerate(plan, start=1):
            for idx in layout[s][:n]:
                sd[f"net.slice{s}.{idx}.weight"] = torch.randn((out_ch, in_ch, 3, 3), generator=g)
                sd[f"net.slice{s}.{idx}.bias"] = torch.randn((out_ch,), generator=g)
                in_ch = out_ch
    if lins:
        for k, c in enumerate([64, 128, 256, 512, 512]):
            sd[f"{lins_prefix}{k}.model.1.weight"] = torch.rand((1, c, 1, 1), generator=g)
    return sd


def test_lpips_import_full_dump(tmp_path):
    """A full LPIPS dump (VGG features + lin heads) imports with OIHW->HWIO
    conversion and applies both (VERDICT r4 next #3: the one-file-drop path
    exercised with a synthetic state dict)."""
    import torch

    from controlnet_tpu.models.lpips import load_torch_weights

    sd = _synthetic_lpips_sd()
    path = str(tmp_path / "full.pth")
    torch.save(sd, path)
    lp = LPIPS()
    p0 = lp.init(jax.random.PRNGKey(0))
    p, found = load_torch_weights(p0, path)
    assert found is True
    np.testing.assert_array_equal(
        np.asarray(p["vgg"][0][0]["w"]),
        sd["net.slice1.0.weight"].numpy().transpose(2, 3, 1, 0))
    np.testing.assert_array_equal(
        np.asarray(p["vgg"][4][2]["b"]), sd["net.slice5.28.bias"].numpy())
    np.testing.assert_array_equal(
        np.asarray(p["lins"][2]["w"]),
        sd["lin2.model.1.weight"].numpy().transpose(2, 3, 1, 0))
    # imported params must still drive the metric
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3), minval=-1, maxval=1)
    d = lp(p, x, jnp.clip(x + 0.3, -1, 1))
    assert d.shape == (1, 1, 1, 1) and bool(jnp.isfinite(d).all())


def test_lpips_import_lin_only_falls_back(tmp_path, capsys):
    """The richzhang vgg.pth carries ONLY lin heads; over random features
    they are channel-wise nonsense, so the import must warn and keep the
    uniform fallback (round-4 review fix, now pinned)."""
    import torch

    from controlnet_tpu.models.lpips import load_torch_weights

    path = str(tmp_path / "vgg.pth")
    torch.save(_synthetic_lpips_sd(vgg=False), path)
    lp = LPIPS()
    p0 = lp.init(jax.random.PRNGKey(0))
    p, found = load_torch_weights(p0, path)
    assert found is False
    for k in range(5):
        np.testing.assert_array_equal(np.asarray(p["lins"][k]["w"]),
                                      np.asarray(p0["lins"][k]["w"]))
    assert "ignoring them" in capsys.readouterr().out


def test_lpips_import_layered_lin_over_vgg(tmp_path):
    """ADVICE r4: a full VGG dump first, then the lin-only vgg.pth layered
    on top — the second call must apply the lins because ``have_vgg``
    carries the cumulative pretrained state."""
    import torch

    from controlnet_tpu.models.lpips import load_torch_weights

    vgg_path = str(tmp_path / "vgg_only.pth")
    lin_path = str(tmp_path / "lins_only.pth")
    torch.save(_synthetic_lpips_sd(lins=False), vgg_path)
    lin_sd = _synthetic_lpips_sd(seed=7, vgg=False, lins_prefix="lins.")  # alt "lins.{k}" key form
    torch.save(lin_sd, lin_path)
    lp = LPIPS()
    p, found = load_torch_weights(lp.init(jax.random.PRNGKey(0)), vgg_path)
    assert found is True
    p, found = load_torch_weights(p, lin_path, have_vgg=found)
    assert found is True
    np.testing.assert_array_equal(
        np.asarray(p["lins"][3]["w"]),
        lin_sd["lins.3.model.1.weight"].numpy().transpose(2, 3, 1, 0))


def test_lpips_import_wrong_layout_is_noop(tmp_path):
    """A state dict with an unrecognized key layout imports as a no-op
    (params unchanged, found_vgg False) instead of crashing."""
    import torch

    from controlnet_tpu.models.lpips import load_torch_weights

    path = str(tmp_path / "junk.pth")
    torch.save({"encoder.block0.weight": torch.randn(4, 4)}, path)
    lp = LPIPS()
    p0 = lp.init(jax.random.PRNGKey(0))
    p, found = load_torch_weights(p0, path)
    assert found is False
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(p0)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_remat_matches_baseline(tiny_model_config):
    """remat=True recomputes activations but must not change values or
    gradients."""
    mp = dict(tiny_model_config)
    u0 = UNet(1, mp)
    mp_r = dict(tiny_model_config, remat=True)
    u1 = UNet(1, mp_r)
    p = u0.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    t = jnp.array([3, 5])

    @jax.jit
    def both_loss_grads(p, x, t):
        l0, g0 = jax.value_and_grad(lambda pp: jnp.sum(u0(pp, x, t) ** 2))(p)
        l1, g1 = jax.value_and_grad(lambda pp: jnp.sum(u1(pp, x, t) ** 2))(p)
        gdiff = jax.tree.reduce(
            jnp.maximum, jax.tree.map(lambda a, b: jnp.abs(a - b).max(), g0, g1))
        return l0, l1, gdiff

    l0, l1, gdiff = both_loss_grads(p, x, t)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    assert float(gdiff) < 1e-4


def test_consistency_multistep_generate(tiny_model_config):
    """Multi-step consistency sampling on device (fori_loop carrying x,
    consistency_controlnet_distilled.py:391-409)."""
    model = ConsistencyDistilled(1, tiny_model_config, use_ddpm_teacher=False)
    p = model.init(jax.random.PRNGKey(0))
    hint = jnp.zeros((2, 8, 8, 3))

    gen = jax.jit(lambda sp, k, n: model.generate({"student": sp}, hint, (2, 8, 8, 1), k,
                                                  num_steps=n), static_argnames="n")
    x1 = gen(p["student"], jax.random.PRNGKey(1), 1)
    x4 = gen(p["student"], jax.random.PRNGKey(1), 4)
    assert x1.shape == (2, 8, 8, 1) and x4.shape == (2, 8, 8, 1)
    assert jnp.all(jnp.isfinite(x1)) and jnp.all(jnp.isfinite(x4))


def test_prefetch_iterator_matches_sync(tiny_model_config, tmp_path):
    from controlnet_tpu.data.datasets import MnistDataset, iterate_batches
    from controlnet_tpu.data.synthetic import make_synthetic_image_tree

    root = make_synthetic_image_tree(str(tmp_path / "pf"), num_classes=2, per_class=6, size=8)
    ds = MnistDataset("train", root)
    sync = list(iterate_batches(ds, 4, shuffle=True, seed=3, prefetch=0))
    pref = list(iterate_batches(ds, 4, shuffle=True, seed=3, prefetch=2))
    assert len(sync) == len(pref)
    for a, b in zip(sync, pref):
        np.testing.assert_array_equal(a, b)


def test_controlnet_precomputed_hint_features(tiny_model_config):
    """Passing precomputed hint features must equal the direct hint path
    (loop-invariant hoist used by the samplers)."""
    cn = ControlNet(1, tiny_model_config)
    cp = cn.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 1))
    t = jnp.array([3, 6])
    hint = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 3))

    @jax.jit
    def both(cp, x, t, hint):
        feats = cn.hint_features(cp, hint)
        return cn(cp, x, t, hint), cn(cp, x, t, hint_features=feats)

    direct, hoisted = both(cp, x, t, hint)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(hoisted), atol=1e-6)


@pytest.mark.slow
def test_controlnet_paired_forward_parity(tiny_model_config):
    """forward_paired (lockstep trunks, attention cores batched into one
    kernel call — VERDICT r4) must compute the same function as __call__,
    with desynchronized trunks and live zero-convs, for both the DDPM and
    the LDM (dynamic hint encoder) variants."""
    for dsf, hint_hw in ((None, 8), (4, 32)):
        cn = ControlNet(1, tiny_model_config, down_sample_factor=dsf)
        cp = cn.init(jax.random.PRNGKey(0))
        cp["down_zero"] = [jax.tree.map(lambda a: a + 0.03, z) for z in cp["down_zero"]]
        cp["mid_zero"] = [jax.tree.map(lambda a: a + 0.03, z) for z in cp["mid_zero"]]
        cp["control_unet"] = jax.tree.map(lambda a: a + 0.01, cp["control_unet"])
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
        t = jnp.array([5, 100])
        hint = jax.random.uniform(jax.random.PRNGKey(3), (2, hint_hw, hint_hw, 3))

        ref = jax.jit(lambda p: cn(p, x, t, hint))(cp)
        paired = jax.jit(lambda p: cn.forward_paired(p, x, t, hint))(cp)
        assert ref.shape == paired.shape
        assert float(jnp.abs(ref - paired).max()) < 1e-5


@pytest.mark.slow
def test_controlnet_paired_forward_gradients(tiny_model_config):
    """The paired forward must also differentiate like __call__ (so it could
    serve training too): grads w.r.t. the trainable split match."""
    cn = ControlNet(1, tiny_model_config)
    cp = cn.init(jax.random.PRNGKey(0))
    cp["control_unet"] = jax.tree.map(lambda a: a + 0.01, cp["control_unet"])
    trainable, frozen = cn.split_params(cp)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1))
    t = jnp.array([5, 100])
    hint = jnp.ones((2, 8, 8, 3))

    def loss(fwd):
        def f(tr):
            return jnp.mean(fwd(cn.merge_params(tr, frozen), x, t, hint) ** 2)
        return jax.jit(jax.grad(f))(trainable)

    g_ref = loss(lambda p, *a: cn(p, *a))
    g_pair = loss(cn.forward_paired)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_pair)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


@pytest.mark.slow
def test_controlnet_paired_forward_bf16(tiny_model_config):
    """forward_paired under bf16 compute (the sampler A/B configuration):
    finite, right shape, and close to __call__ at the same dtype."""
    cn = ControlNet(1, tiny_model_config)
    cp = cn.init(jax.random.PRNGKey(0))
    cp["control_unet"] = jax.tree.map(lambda a: a + 0.01, cp["control_unet"])
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 1)).astype(jnp.bfloat16)
    t = jnp.array([5, 100])
    hint = jnp.ones((2, 8, 8, 3), jnp.bfloat16)
    ref = jax.jit(lambda p: cn(p, x, t, hint))(cp)
    paired = jax.jit(lambda p: cn.forward_paired(p, x, t, hint))(cp)
    assert paired.dtype == ref.dtype
    assert bool(jnp.all(jnp.isfinite(paired.astype(jnp.float32))))
    assert float(jnp.abs(ref.astype(jnp.float32)
                         - paired.astype(jnp.float32)).max()) < 0.1


def test_hint_features_chunked_matches_unchunked(tiny_model_config):
    """hint_features_chunked (round 4: lifts the b64 full-res HBM
    compile boundary) is bit-identical to the one-shot path, including a
    non-divisible final chunk."""
    from controlnet_tpu.models.controlnet import ControlNet

    cfg = dict(tiny_model_config, hint_channels=3)
    cn = ControlNet(1, cfg, model_locked=True, down_sample_factor=4)
    p = cn.init(jax.random.PRNGKey(0))
    hint = jax.random.uniform(jax.random.PRNGKey(1), (5, 16, 16, 3))
    full = cn.hint_features(p, hint)
    chunked = cn.hint_features_chunked(p, hint, chunk=2)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))
