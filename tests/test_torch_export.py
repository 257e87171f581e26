"""Reverse-direction parity: OUR randomly initialized models exported via
io/torch_export.py, loaded into the REFERENCE architectures with
``strict=True``, and checked to compute the same function — the inverse of
tests/test_torch_parity.py, closing the checkpoint-compat loop both ways
(reference tooling can evaluate checkpoints trained with this stack).
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
    num_heads=4,
)

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


def _load_strict(tm, sd: dict) -> None:
    tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                        for k, v in sd.items()}, strict=True)


def _randomize_zero_convs(params, key):
    """Our zero convs init to exactly 0; give them signal so the exported
    control branch actually contributes to the comparison."""
    def go(p, k):
        ks = jax.random.split(k, 2)
        p["w"] = 0.05 * jax.random.normal(ks[0], p["w"].shape)
        p["b"] = 0.05 * jax.random.normal(ks[1], p["b"].shape)

    ks = jax.random.split(key, len(params["down_zero"]) + len(params["mid_zero"]) + 1)
    for i, zp in enumerate(params["down_zero"]):
        go(zp, ks[i])
    for j, zp in enumerate(params["mid_zero"]):
        go(zp, ks[len(params["down_zero"]) + j])
    go(params["hint_block"]["layers"][-1], ks[-1])


def test_unet_export_parity(ref_modules):
    ref_unet_base, _, _ = ref_modules
    from controlnet_tpu.io.torch_export import export_unet
    from controlnet_tpu.models.unet import UNet

    ours = UNet(TINY["im_channels"], TINY)
    params = ours.init(jax.random.PRNGKey(0))
    tm = ref_unet_base.Unet(TINY).eval()
    _load_strict(tm, export_unet(jax.tree.map(np.asarray, params)))

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    t = np.array([3, 6])
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    our_out = _nchw(jax.jit(lambda p, x, t: ours(p, x, t))(params, _nhwc(x), jnp.asarray(t)))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-4)


def test_controlnet_export_parity(ref_modules):
    _, ref_controlnet, _ = ref_modules
    from controlnet_tpu.io.torch_export import export_controlnet
    from controlnet_tpu.models.controlnet import ControlNet

    ours = ControlNet(TINY["im_channels"], TINY)
    params = ours.init(jax.random.PRNGKey(1))
    _randomize_zero_convs(params, jax.random.PRNGKey(11))

    tm = ref_controlnet.ControlNet(TINY).eval()
    _load_strict(tm, export_controlnet(jax.tree.map(np.asarray, params), ours))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    hint = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    t = np.array([2, 7])
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(hint)).numpy()
    our_out = _nchw(jax.jit(lambda p, x, t, h: ours(p, x, t, h))(
        params, _nhwc(x), jnp.asarray(t), _nhwc(hint)))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-4)


def test_ldm_controlnet_export_parity(ref_modules):
    """LDM variant: control_unet infix + nested strided hint encoder."""
    sys.path.insert(0, REFERENCE)
    try:
        import models.controlnet_ldm as ref_cn_ldm
    finally:
        sys.path.remove(REFERENCE)
    from controlnet_tpu.io.torch_export import export_controlnet
    from controlnet_tpu.models.controlnet import ControlNet

    z = 2
    ours = ControlNet(z, LDM_TINY, down_sample_factor=4)
    params = ours.init(jax.random.PRNGKey(2))
    _randomize_zero_convs(params, jax.random.PRNGKey(22))

    tm = ref_cn_ldm.ControlNet(im_channels=z, model_config=LDM_TINY,
                               down_sample_factor=4).eval()
    _load_strict(tm, export_controlnet(jax.tree.map(np.asarray, params), ours))

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, z, 8, 8)).astype(np.float32)
    hint = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    t = np.array([1, 5])
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(hint)).numpy()
    our_out = _nchw(jax.jit(lambda p, x, t, h: ours(p, x, t, h))(
        params, _nhwc(x), jnp.asarray(t), _nhwc(hint)))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-4)


def test_vae_export_parity(ref_modules):
    _, _, ref_vae = ref_modules
    from controlnet_tpu.io.torch_export import export_vae
    from controlnet_tpu.models.vae import VAE

    vae_config = dict(
        z_channels=2, down_channels=[8, 16], mid_channels=[16],
        down_sample=[True], attn_down=[False], norm_channels=4, num_heads=2,
        num_down_layers=1, num_mid_layers=1, num_up_layers=1,
    )
    ours = VAE(3, vae_config)
    params = ours.init(jax.random.PRNGKey(3))
    tm = ref_vae.VAE(im_channels=3, model_config=vae_config).eval()
    _load_strict(tm, export_vae(jax.tree.map(np.asarray, params)))

    rng = np.random.default_rng(3)
    z = rng.normal(size=(2, 2, 4, 4)).astype(np.float32)
    with torch.no_grad():
        ref_dec = tm.decode(torch.from_numpy(z)).numpy()
    our_dec = _nchw(jax.jit(ours.decode)(params, _nhwc(z)))
    np.testing.assert_allclose(our_dec, ref_dec, atol=3e-4)


def test_distilled_student_export_parity(ref_modules):
    import types as _types

    if "torchvision" not in sys.modules:
        tv = _types.ModuleType("torchvision")
        tv.models = _types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models
    sys.path.insert(0, REFERENCE)
    try:
        import models.consistency_controlnet_distilled as ref_cons
    finally:
        sys.path.remove(REFERENCE)
    from controlnet_tpu.io.torch_export import export_distilled_student
    from controlnet_tpu.models.consistency import ConsistencyControlNet

    ours = ConsistencyControlNet(1, TINY)
    params = ours.init(jax.random.PRNGKey(4))
    tm = ref_cons.ConsistencyControlNet(TINY).eval()
    _load_strict(tm, export_distilled_student(jax.tree.map(np.asarray, params), ours))

    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    hint = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    sigma = np.array([0.7, 3.0], np.float32)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(sigma),
                     torch.from_numpy(hint)).numpy()
    our_out = _nchw(jax.jit(lambda p, x, s, h: ours(p, x, s, h))(
        params, _nhwc(x), jnp.asarray(sigma), _nhwc(hint)))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-4)


def test_export_import_roundtrip():
    """export -> import must reproduce the original tree bit-for-bit."""
    from controlnet_tpu.io.torch_export import export_controlnet
    from controlnet_tpu.io.torch_import import import_controlnet
    from controlnet_tpu.models.controlnet import ControlNet

    ours = ControlNet(TINY["im_channels"], TINY)
    params = jax.tree.map(np.asarray, ours.init(jax.random.PRNGKey(5)))
    back = import_controlnet(export_controlnet(params, ours), ours)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(back)[0],
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))


def _load_repo_tool(name: str):
    import importlib.util

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        f"repo_tools_{name}", os.path.join(repo, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _tiny_cfg(tmp_path, task):
    import yaml

    cfg = {
        "dataset_params": {"task_name": "mnist", "im_path": str(tmp_path),
                           "im_test_path": str(tmp_path)},
        "diffusion_params": {"num_timesteps": 10, "beta_start": 1e-4,
                             "beta_end": 0.02},
        "model_params": dict(TINY),
        "train_params": {"task_name": str(task), "batch_size": 2,
                         "ddpm_ckpt_name": "ddpm_ckpt.pth",
                         "controlnet_ckpt_name": "ddpm_controlnet_ckpt.pth",
                         "num_epochs": 1, "num_samples": 1,
                         "num_grid_rows": 1, "ddpm_lr": 1e-4},
    }
    cfg_path = tmp_path / "cfg.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    return str(cfg_path)


def test_export_cli_controlnet(ref_modules, tmp_path):
    """tools/export_torch_checkpoint.py: a trainer-format orbax checkpoint
    ({"state", "frozen"}) becomes a .pth the reference ControlNet loads
    strict=True and computes the same function with."""
    import types

    import optax

    _, ref_controlnet, _ = ref_modules
    from controlnet_tpu.io.checkpoint import save_checkpoint
    from controlnet_tpu.models.controlnet import ControlNet
    from controlnet_tpu.train.state import create_train_state

    ours = ControlNet(TINY["im_channels"], TINY)
    params = ours.init(jax.random.PRNGKey(6))
    _randomize_zero_convs(params, jax.random.PRNGKey(66))
    trainable, frozen = ours.split_params(params)
    task = tmp_path / "task"
    save_checkpoint(str(task), "ddpm_controlnet_ckpt.pth", 1,
                    {"state": create_train_state(trainable, optax.adam(1e-4)),
                     "frozen": frozen})

    main = _load_repo_tool("export_torch_checkpoint").main
    main(types.SimpleNamespace(config_path=_tiny_cfg(tmp_path, task),
                               type="controlnet", ckpt=None, step=None, out=None))

    sd = torch.load(task / "ddpm_controlnet_ckpt.pth", weights_only=True)
    tm = ref_controlnet.ControlNet(TINY).eval()
    tm.load_state_dict(sd, strict=True)

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 1, 8, 8)).astype(np.float32)
    hint = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    t = np.array([1, 8])
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(t),
                     torch.from_numpy(hint)).numpy()
    merged = ours.merge_params(trainable, frozen)
    our_out = _nchw(jax.jit(lambda p, x, t, h: ours(p, x, t, h))(
        merged, _nhwc(x), jnp.asarray(t), _nhwc(hint)))
    np.testing.assert_allclose(our_out, ref_out, atol=3e-4)


def test_export_cli_consistency_wrapper(tmp_path):
    """Consistency export wraps the reference trainer's dict-checkpoint
    format ({'epoch', 'model_state_dict', 'ema_teacher_state_dict',
    'model_config'} — reference train_consistency...py:153-159) so the
    reference sampler's checkpoint['model_state_dict'] load works."""
    import types

    import optax

    from controlnet_tpu.io.checkpoint import save_checkpoint
    from controlnet_tpu.models.consistency import ConsistencyDistilled
    from controlnet_tpu.train.state import create_train_state

    model = ConsistencyDistilled(TINY["im_channels"], TINY, use_ddpm_teacher=False)
    p = model.init(jax.random.PRNGKey(7))
    task = tmp_path / "task"
    save_checkpoint(str(task), "consistency_controlnet_distilled.pth", 3,
                    {"state": create_train_state(p["student"], optax.adam(1e-4)),
                     "ema": p["ema_teacher"]})

    main = _load_repo_tool("export_torch_checkpoint").main
    main(types.SimpleNamespace(config_path=_tiny_cfg(tmp_path, task),
                               type="consistency", ckpt=None, step=None, out=None))

    ckpt = torch.load(task / "consistency_controlnet_distilled.pth",
                      weights_only=False)
    assert ckpt["epoch"] == 3
    assert set(ckpt) >= {"model_state_dict", "ema_teacher_state_dict",
                         "model_config"}
    sys.path.insert(0, REFERENCE)
    try:
        import models.consistency_controlnet_distilled as ref_cons
    finally:
        sys.path.remove(REFERENCE)
    tm = ref_cons.ConsistencyControlNet(TINY).eval()
    tm.load_state_dict(ckpt["model_state_dict"], strict=True)
    tm.load_state_dict(ckpt["ema_teacher_state_dict"], strict=True)

    # Re-exporting to the same default path must refuse rather than clobber
    # (that path is where import_torch_checkpoint keeps the reference .pth);
    # --force permits it.
    args = types.SimpleNamespace(config_path=_tiny_cfg(tmp_path, task),
                                 type="consistency", ckpt=None, step=None,
                                 out=None)
    with pytest.raises(SystemExit, match="refusing to overwrite"):
        main(args)
    args.force = True
    main(args)  # succeeds with --force
