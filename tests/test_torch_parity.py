"""Cross-framework numerical parity: reference PyTorch models vs this
framework, weights imported via io/torch_import.py.

These tests construct the REFERENCE architectures (imported read-only from
/root/reference) with random torch init, convert the state_dict, and assert
the two stacks compute the same function — the strongest possible parity
evidence for FID-equivalence (SURVEY.md §7 build step 2).
Skipped when the reference checkout is absent.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference not mounted")

torch = pytest.importorskip("torch")

TINY = dict(
    im_channels=1,
    im_size=8,
    hint_channels=3,
    down_channels=[8, 16, 16],
    mid_channels=[16, 16],
    down_sample=[True, False],
    time_emb_dim=8,
    num_down_layers=1,
    num_mid_layers=1,
    num_up_layers=1,
    num_heads=4,  # reference base UNet hardcodes 4 heads (unet_base.py:40)
)


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REFERENCE)
    import models.controlnet as ref_controlnet
    import models.unet_base as ref_unet_base
    import models.vae as ref_vae

    yield ref_unet_base, ref_controlnet, ref_vae
    sys.path.remove(REFERENCE)


def _nhwc(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def _nchw(x_nhwc) -> np.ndarray:
    return np.asarray(x_nhwc).transpose(0, 3, 1, 2)


def test_unet_forward_parity(ref_modules):
    ref_unet_base, _, _ = ref_modules
    from controlnet_tpu.io.torch_import import import_unet
    from controlnet_tpu.models.unet import UNet

    torch.manual_seed(0)
    tm = ref_unet_base.Unet(TINY).eval()
    ours = UNet(TINY["im_channels"], TINY)
    params = import_unet(tm.state_dict(), ours)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    t = np.array([3, 6])

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    our_out = _nchw(jax.jit(lambda p, x, t: ours(p, x, t))(params, _nhwc(x), jnp.asarray(t)))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4)


def test_controlnet_forward_parity(ref_modules):
    _, ref_controlnet, _ = ref_modules
    from controlnet_tpu.io.torch_import import import_controlnet
    from controlnet_tpu.models.controlnet import ControlNet

    torch.manual_seed(1)
    tm = ref_controlnet.ControlNet(TINY).eval()
    # randomize the zero convs so the control branch actually contributes
    with torch.no_grad():
        for m in [tm.control_copy_unet_hint_block[-1], *tm.control_copy_unet_down_zero_convs,
                  *tm.control_copy_unet_mid_zero_convs]:
            m.weight.normal_(0, 0.05)
            m.bias.normal_(0, 0.05)

    ours = ControlNet(TINY["im_channels"], TINY)
    params = import_controlnet(tm.state_dict(), ours)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    hint = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    t = np.array([2, 7])

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(hint)).numpy()
    our_out = _nchw(
        jax.jit(lambda p, x, t, h: ours(p, x, t, h))(
            params, _nhwc(x), jnp.asarray(t), _nhwc(hint))
    )
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4)


def test_vae_parity(ref_modules):
    _, _, ref_vae = ref_modules
    from controlnet_tpu.io.torch_import import import_vae
    from controlnet_tpu.models.vae import VAE

    vae_config = dict(
        z_channels=2, down_channels=[8, 16], mid_channels=[16],
        down_sample=[True], attn_down=[False], norm_channels=4, num_heads=2,
        num_down_layers=1, num_mid_layers=1, num_up_layers=1,
    )
    torch.manual_seed(2)
    tm = ref_vae.VAE(im_channels=3, model_config=vae_config).eval()
    ours = VAE(3, vae_config)
    params = import_vae(tm.state_dict(), ours)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)

    # encoder moments (deterministic part of encode, vae.py:87-97)
    with torch.no_grad():
        t_enc = tm.pre_quant_conv(tm.encoder_conv_out(
            torch.nn.SiLU()(tm.encoder_norm_out(_ref_encode_features(tm, torch.from_numpy(x))))
        )).numpy()
    our_enc = _nchw(jax.jit(ours.moments)(params, _nhwc(x)))
    np.testing.assert_allclose(our_enc, t_enc, atol=2e-4)

    # decoder on a fixed latent
    z = rng.normal(size=(2, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        t_dec = tm.decode(torch.from_numpy(z)).numpy()
    our_dec = _nchw(jax.jit(ours.decode)(params, _nhwc(z)))
    np.testing.assert_allclose(our_dec, t_dec, atol=2e-4)


def _ref_encode_features(tm, x):
    out = tm.encoder_conv_in(x)
    for down in tm.encoder_layers:
        out = down(out)
    for mid in tm.encoder_mids:
        out = mid(out)
    return out


LDM_TINY = dict(
    hint_channels=3,
    down_channels=[8, 16, 16],
    mid_channels=[16, 16],
    down_sample=[True, False],
    attn_down=[False, True],
    time_emb_dim=8,
    norm_channels=4,
    num_heads=2,
    conv_out_channels=8,
    num_down_layers=1,
    num_mid_layers=1,
    num_up_layers=1,
)


def test_cond_unet_and_ldm_controlnet_parity(ref_modules):
    """The conditional/LDM UNet (unet_cond_base.py) and the LDM ControlNet
    with its dynamically built strided hint encoder (controlnet_ldm.py)."""
    sys.path.insert(0, REFERENCE)
    try:
        import models.controlnet_ldm as ref_cn_ldm
        import models.unet_cond_base as ref_cond
    finally:
        sys.path.remove(REFERENCE)

    from controlnet_tpu.io.torch_import import import_controlnet, import_unet
    from controlnet_tpu.models.controlnet import ControlNet
    from controlnet_tpu.models.unet import UNet

    z = 2
    torch.manual_seed(3)
    tm = ref_cond.Unet(im_channels=z, model_config=LDM_TINY).eval()
    ours = UNet(z, LDM_TINY)
    params = import_unet(tm.state_dict(), ours)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, z, 8, 8)).astype(np.float32)
    t = np.array([1, 5])
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    our_out = _nchw(jax.jit(lambda p, x, t: ours(p, x, t))(params, _nhwc(x), jnp.asarray(t)))
    np.testing.assert_allclose(our_out, ref_out, atol=2e-4)

    # LDM ControlNet: hint at 4x the latent resolution
    torch.manual_seed(4)
    tcn = ref_cn_ldm.ControlNet(im_channels=z, model_config=LDM_TINY,
                                down_sample_factor=4).eval()
    with torch.no_grad():
        for m in [tcn.control_unet_hint_block[-1][-1], *tcn.control_unet_down_zero_convs,
                  *tcn.control_unet_mid_zero_convs]:
            m.weight.normal_(0, 0.05)
            m.bias.normal_(0, 0.05)
    ocn = ControlNet(z, LDM_TINY, down_sample_factor=4)
    cparams = import_controlnet(tcn.state_dict(), ocn)

    hint = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref_c = tcn(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(hint)).numpy()
    our_c = _nchw(jax.jit(lambda p, x, t, h: ocn(p, x, t, h))(
        cparams, _nhwc(x), jnp.asarray(t), _nhwc(hint)))
    np.testing.assert_allclose(our_c, ref_c, atol=2e-4)


def test_distilled_students_parity(ref_modules):
    """Consistency + DMD students: imported weights compute the same
    function (EDM scalings / x0-prediction included)."""
    # the reference DMD module imports torchvision (unused by the student
    # class); stub it — torchvision is absent in this environment
    import types as _types

    if "torchvision" not in sys.modules:
        tv = _types.ModuleType("torchvision")
        tv.models = _types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models

    sys.path.insert(0, REFERENCE)
    try:
        import models.consistency_controlnet_distilled as ref_cons
        import models.distribution_matching_controlnet as ref_dmd
    finally:
        sys.path.remove(REFERENCE)

    from controlnet_tpu.io.torch_import import import_distilled_student
    from controlnet_tpu.models.consistency import ConsistencyControlNet
    from controlnet_tpu.models.dmd import DistributionMatchingControlNet

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    hint = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)

    # --- consistency student (sigma conditioning + EDM output scaling) ---
    torch.manual_seed(5)
    t_cons = ref_cons.ConsistencyControlNet(TINY).eval()
    o_cons = ConsistencyControlNet(1, TINY)
    p_cons = import_distilled_student(t_cons.state_dict(), o_cons)
    sigma = np.array([0.7, 3.0], np.float32)
    with torch.no_grad():
        ref_out = t_cons(torch.from_numpy(x), torch.from_numpy(sigma),
                         torch.from_numpy(hint)).numpy()
    our_out = _nchw(jax.jit(lambda p, x, s, h: o_cons(p, x, s, h))(
        p_cons, _nhwc(x), jnp.asarray(sigma), _nhwc(hint)))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-4)

    # --- DMD student (x0 prediction, zero-init hint conv randomized) ---
    torch.manual_seed(6)
    t_dmd = ref_dmd.DistributionMatchingControlNet(TINY).eval()
    with torch.no_grad():
        t_dmd.hint_block[-1].weight.normal_(0, 0.05)
        t_dmd.hint_block[-1].bias.normal_(0, 0.05)
    o_dmd = DistributionMatchingControlNet(1, TINY)
    p_dmd = import_distilled_student(t_dmd.state_dict(), o_dmd)
    t = np.array([4, 7])
    with torch.no_grad():
        ref_out = t_dmd(torch.from_numpy(x), torch.from_numpy(t),
                        torch.from_numpy(hint)).numpy()
    our_out = _nchw(jax.jit(lambda p, x, t, h: o_dmd(p, x, t, h))(
        p_dmd, _nhwc(x), jnp.asarray(t), _nhwc(hint)))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-4)


def _load_repo_tool(name):
    """Import a module from OUR tools/ by path — the ref_modules fixture
    puts /root/reference first on sys.path and its tools/ package (which
    also has an __init__.py) shadows ours by name."""
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        f"repo_tools_{name}", os.path.join(repo, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_import_torch_checkpoint_cli_roundtrip(ref_modules, tmp_path):
    """The import CLI (tools/import_torch_checkpoint.py) must turn a raw
    reference torch.save state_dict into a checkpoint our samplers load,
    computing the same function as the torch model."""
    import types

    import yaml

    ref_unet_base, _, _ = ref_modules
    tm = ref_unet_base.Unet(TINY).eval()
    ckpt_path = tmp_path / "ddpm_ckpt_torch.pth"
    torch.save(tm.state_dict(), ckpt_path)

    task = tmp_path / "task"
    cfg = {
        "dataset_params": {"task_name": "mnist", "im_path": str(tmp_path),
                           "im_test_path": str(tmp_path)},
        "diffusion_params": {"num_timesteps": 10, "beta_start": 1e-4,
                             "beta_end": 0.02},
        "model_params": dict(TINY),
        "train_params": {"task_name": str(task), "batch_size": 2,
                         "ddpm_ckpt_name": "ddpm_ckpt.pth", "num_epochs": 1,
                         "num_samples": 1, "num_grid_rows": 1,
                         "ddpm_lr": 1e-4},
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    main = _load_repo_tool("import_torch_checkpoint").main

    main(types.SimpleNamespace(config_path=str(cfg_path), type="unet",
                               ckpt=str(ckpt_path), out=None))

    from controlnet_tpu.models.unet import UNet

    load_unet_params = _load_repo_tool("sample_ddpm").load_unet_params
    unet = UNet(1, TINY)
    params = load_unet_params(str(task), "ddpm_ckpt.pth", unet)
    x = np.random.default_rng(0).standard_normal((2, 1, 8, 8), np.float32)
    t = np.array([3, 7])
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    ours = _nchw(unet(params, _nhwc(x), jnp.asarray(t)))
    np.testing.assert_allclose(ours, ref_out, atol=2e-4)


def test_eval_metrics_cli(tmp_path):
    """eval_metrics CLI: FFD of a set against itself is ~0 and the metric
    keys are stable."""
    import json as _json
    import types

    from PIL import Image

    rng = np.random.default_rng(0)
    for d in ("a", "b"):
        os.makedirs(tmp_path / d)
        for i in range(8):
            arr = (rng.random((16, 16)) * 255).astype("uint8")  # >=16px: 5 VGG pools
            Image.fromarray(arr, "L").save(tmp_path / d / f"{i}.png")

    em = _load_repo_tool("eval_metrics")
    evaluate, load_images, main = em.evaluate, em.load_images, em.main

    a = load_images(str(tmp_path / "a"), 1)
    same = evaluate(a, a, 1)
    assert abs(same["ffd"]) < 1e-3
    assert same["lpips_mean"] < 1e-6

    out = tmp_path / "m.json"
    main(types.SimpleNamespace(dir_a=str(tmp_path / "a"),
                               dir_b=str(tmp_path / "b"),
                               im_channels=1, seed=0, out=str(out)))
    m = _json.loads(out.read_text())
    assert set(m) >= {"ffd", "lpips_mean"}

    # bootstrap CI brackets the point estimate and is deterministic per seed
    b = load_images(str(tmp_path / "b"), 1)
    ci = em.ffd_with_ci(a, b, 1, seed=0, n_boot=20)
    assert ci["ffd_ci_lo"] <= ci["ffd_ci_hi"]
    ci2 = em.ffd_with_ci(a, b, 1, seed=0, n_boot=20)
    assert ci == ci2

    # paired bootstrap (shared indices): for two IDENTICAL paired sets every
    # resample compares a set with itself, so the CI must stay at the ~0
    # point estimate — independent resampling destroys the pairing and
    # reports the (large, n=8) unpaired estimator noise instead
    a2 = a.copy()
    pci = em.ffd_with_ci(a, a2, 1, seed=0, n_boot=20, paired=True)
    assert pci["paired"] and pci["ffd"] < 1e-3
    assert pci["ffd_ci_hi"] < 1e-3
    uci = em.ffd_with_ci(a, a2, 1, seed=0, n_boot=20, paired=False)
    assert uci["ffd_ci_hi"] > 1.0  # unpaired CI inflates
    with pytest.raises(ValueError):
        em.ffd_with_ci(a, a2[:4], 1, paired=True)
