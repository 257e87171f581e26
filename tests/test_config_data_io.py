"""Config loading/validation, synthetic data + datasets, image grids,
checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu import config as cfg
from controlnet_tpu.data.datasets import MnistDataset, iterate_batches, load_latents
from controlnet_tpu.data.synthetic import make_synthetic_image_tree
from controlnet_tpu.io.checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from controlnet_tpu.io.images import denorm, save_image_grid, to_grid

REPO = os.path.join(os.path.dirname(__file__), "..")


def test_load_reference_schema_configs():
    """The shipped YAML files keep the reference schema exactly."""
    for name in ["mnist", "cifar", "celebhq"]:
        c = cfg.load_config(os.path.join(REPO, "config", f"{name}.yaml"))
        assert "dataset_params" in c and "diffusion_params" in c and "train_params" in c
        mp = cfg.model_params(c)
        cfg.validate_unet_model_params(mp)
    celeb = cfg.load_config(os.path.join(REPO, "config", "celebhq.yaml"))
    cfg.validate_vae_model_params(cfg.autoencoder_params(celeb))


def test_config_validation_errors(tiny_model_config):
    bad = dict(tiny_model_config)
    bad["mid_channels"] = [99, 16]
    with pytest.raises(cfg.ConfigError):
        cfg.validate_unet_model_params(bad)
    with pytest.raises(cfg.ConfigError):
        cfg.load_config("/nonexistent/x.yaml")
    assert cfg.get_config_value({"a": 1}, "a", 0) == 1
    assert cfg.get_config_value({"a": 1}, "b", 7) == 7


def test_synthetic_tree_and_mnist_dataset(tmp_path):
    root = make_synthetic_image_tree(str(tmp_path / "train"), num_classes=2, per_class=3, size=28)
    ds = MnistDataset("train", root, return_hints=False)
    assert len(ds) == 6
    im = ds[0]
    assert im.shape == (28, 28, 1)
    assert im.min() >= -1.0 and im.max() <= 1.0

    ds_h = MnistDataset("train", root, return_hints=True)
    im, hint = ds_h[0]
    assert hint.shape == (28, 28, 3)
    assert set(np.unique(hint)) <= {0.0, 1.0}


def test_iterate_batches(tmp_path):
    root = make_synthetic_image_tree(str(tmp_path / "t"), num_classes=2, per_class=4, size=8)
    ds = MnistDataset("train", root, return_hints=True)
    batches = list(iterate_batches(ds, batch_size=4, shuffle=True, seed=0))
    assert len(batches) == 2
    ims, hints = batches[0]
    assert ims.shape == (4, 8, 8, 1) and hints.shape == (4, 8, 8, 3)
    # deterministic under the same seed
    batches2 = list(iterate_batches(ds, batch_size=4, shuffle=True, seed=0))
    np.testing.assert_array_equal(batches[0][0], batches2[0][0])


def test_latent_cache_roundtrip(tmp_path):
    """npz shards + reference pickle shards both load
    (utils/diffusion_utils.py:7-18)."""
    import pickle

    d = tmp_path / "latents"
    d.mkdir()
    np.savez(d / "shard0.npz", **{"img_a.png": np.ones((4, 4, 2), np.float32)})
    with open(d / "shard1.pkl", "wb") as f:
        pickle.dump({"img_b.png": np.zeros((1, 4, 4, 2), np.float32)}, f)
    latents = load_latents(str(d))
    assert set(latents) == {"img_a.png", "img_b.png"}
    assert latents["img_b.png"].shape == (4, 4, 2)  # [0] unwrap of 4D


def test_image_grid(tmp_path):
    imgs = np.random.rand(5, 8, 8, 1).astype(np.float32)
    grid = to_grid(imgs, nrow=3)
    assert grid.dtype == np.uint8
    path = str(tmp_path / "g.png")
    save_image_grid(imgs, path, nrow=3)
    assert os.path.exists(path)
    np.testing.assert_allclose(denorm(np.array([-1.0, 1.0])), [0.0, 1.0])


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": [jnp.ones(2), {"c": jnp.zeros(1)}]}
    ckpt_dir = str(tmp_path / "task")
    assert latest_checkpoint(ckpt_dir, "model.pth") is None
    save_checkpoint(ckpt_dir, "model.pth", 3, tree)
    save_checkpoint(ckpt_dir, "model.pth", 7, tree)
    assert latest_checkpoint(ckpt_dir, "model.pth") == 7
    restored, step = restore_checkpoint(ckpt_dir, "model.pth", tree)
    assert step == 7
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_async_save(tmp_path):
    """block=False returns before the write commits; restore waits for the
    in-flight save (and overlapping async saves serialize inside orbax)."""
    from controlnet_tpu.io.checkpoint import wait_for_checkpoints

    tree = {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4)}
    ckpt_dir = str(tmp_path / "task")
    save_checkpoint(ckpt_dir, "model.pth", 1, tree, block=False)
    save_checkpoint(ckpt_dir, "model.pth", 2,
                    {"w": tree["w"] * 2}, block=False)
    restored, step = restore_checkpoint(ckpt_dir, "model.pth", tree)
    assert step == 2
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.asarray(tree["w"]) * 2)
    wait_for_checkpoints()  # idempotent once drained
    assert latest_checkpoint(ckpt_dir, "model.pth") == 2


def test_checkpoint_async_save_two_names(tmp_path):
    """Back-to-back block=False saves under DIFFERENT names (train_vae's
    vae+disc, DMD's latest+best) use per-root checkpointers so the second
    save is not queued behind the first's disk write; both restore."""
    from controlnet_tpu.io.checkpoint import wait_for_checkpoints

    ckpt_dir = str(tmp_path / "task")
    a = {"w": jnp.full((2, 2), 3.0)}
    b = {"w": jnp.full((2, 2), 5.0)}
    save_checkpoint(ckpt_dir, "vae_autoencoder_ckpt.pth", 1, a, block=False)
    save_checkpoint(ckpt_dir, "vae_discriminator_ckpt.pth", 1, b, block=False)
    ra, _ = restore_checkpoint(ckpt_dir, "vae_autoencoder_ckpt.pth", a)
    rb, _ = restore_checkpoint(ckpt_dir, "vae_discriminator_ckpt.pth", b)
    np.testing.assert_array_equal(np.asarray(ra["w"]), np.asarray(a["w"]))
    np.testing.assert_array_equal(np.asarray(rb["w"]), np.asarray(b["w"]))
    wait_for_checkpoints()


def test_checkpoint_background_save(tmp_path):
    """save_checkpoint_background snapshots on-device and returns
    immediately; the donated/mutated ORIGINAL buffers must not leak into the
    checkpoint, overlapping saves serialize per root, and restore sees the
    final state (VERDICT r3 weak #6 — the D2H overlap path)."""
    from controlnet_tpu.io.checkpoint import (
        save_checkpoint_background, wait_for_checkpoints)

    ckpt_dir = str(tmp_path / "task")
    tree = {"w": jnp.arange(8, dtype=jnp.float32), "step": 1}
    save_checkpoint_background(ckpt_dir, "model.pth", 1, tree)
    # mutate what the trainer would do next step: the snapshot semantics
    # must have captured the value at call time
    tree2 = {"w": tree["w"] * 10, "step": 2}
    save_checkpoint_background(ckpt_dir, "model.pth", 2, tree2)
    restored, step = restore_checkpoint(ckpt_dir, "model.pth", tree2)
    assert step == 2 and restored["step"] == 2
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(8, dtype=np.float32) * 10)
    restored1, _ = restore_checkpoint(ckpt_dir, "model.pth", tree, step=1)
    np.testing.assert_array_equal(np.asarray(restored1["w"]),
                                  np.arange(8, dtype=np.float32))
    wait_for_checkpoints()  # idempotent once drained


def test_checkpoint_background_save_surfaces_worker_errors(tmp_path, monkeypatch):
    """A failure on the save worker thread must not vanish — it re-raises at
    the next wait_for_checkpoints()."""
    import controlnet_tpu.io.checkpoint as ckpt_mod

    def boom(_):
        raise RuntimeError("synthetic D2H failure")

    monkeypatch.setattr(ckpt_mod.jax, "device_get", boom)
    ckpt_mod.save_checkpoint_background(
        str(tmp_path / "task"), "model.pth", 1, {"w": jnp.ones(2)})
    with pytest.raises(RuntimeError,
                       match=r"background checkpoint save\(s\) failed"):
        ckpt_mod.wait_for_checkpoints()
    # errors drain: a second wait is clean
    ckpt_mod.wait_for_checkpoints()


def test_checkpoint_retention_pruning(tmp_path):
    """max_to_keep bounds disk use (VERDICT r4 weak #1 / next #2): older
    steps are pruned AFTER the save commits; latest + newest history and
    separately-named (best) roots survive; the keep-all default is
    unchanged."""
    from controlnet_tpu.io.checkpoint import (
        prune_checkpoints, save_checkpoint_background, wait_for_checkpoints)

    ckpt_dir = str(tmp_path / "task")
    for s in range(1, 7):
        save_checkpoint_background(ckpt_dir, "model.pth", s,
                                   {"w": jnp.full((2,), float(s))}, max_to_keep=3)
    wait_for_checkpoints()
    root = os.path.join(ckpt_dir, "model")
    assert sorted(int(d) for d in os.listdir(root) if d.isdigit()) == [4, 5, 6]
    assert latest_checkpoint(ckpt_dir, "model.pth") == 6
    restored, step = restore_checkpoint(ckpt_dir, "model.pth", {"w": jnp.zeros(2)})
    assert step == 6
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full((2,), 6.0))

    # the blocking save path prunes too
    for s in (7, 8, 9):
        save_checkpoint(ckpt_dir, "model.pth", s, {"w": jnp.zeros(2)}, max_to_keep=2)
    assert sorted(int(d) for d in os.listdir(root) if d.isdigit()) == [8, 9]

    # a best-model root under its own name is independent of latest pruning
    save_checkpoint(ckpt_dir, "best.pth", 2, {"w": jnp.zeros(2)}, max_to_keep=3)
    save_checkpoint(ckpt_dir, "model.pth", 10, {"w": jnp.zeros(2)}, max_to_keep=1)
    assert latest_checkpoint(ckpt_dir, "best.pth") == 2
    assert sorted(int(d) for d in os.listdir(root) if d.isdigit()) == [10]

    # keep-all (default / max_to_keep=0) is the pre-round-5 behavior
    for s in (1, 2):
        save_checkpoint(ckpt_dir, "all.pth", s, {"w": jnp.zeros(2)})
    save_checkpoint(ckpt_dir, "all.pth", 3, {"w": jnp.zeros(2)}, max_to_keep=0)
    all_root = os.path.join(ckpt_dir, "all")
    assert sorted(int(d) for d in os.listdir(all_root) if d.isdigit()) == [1, 2, 3]
    # explicit prune API
    assert prune_checkpoints(ckpt_dir, "all.pth", 1) == [1, 2]
    assert latest_checkpoint(ckpt_dir, "all.pth") == 3


def test_checkpoint_multihost_retention_does_not_block(tmp_path, monkeypatch):
    """On jax.process_count()>1, save_checkpoint_background must NOT route
    retention through save_checkpoint(max_to_keep=...) — that path waits for
    the write on the training thread (checkpoint.py save_checkpoint: ``if
    block or max_to_keep``), silently making every background save fully
    blocking.  Pruning must run on a worker thread after the write commits."""
    import threading

    import controlnet_tpu.io.checkpoint as ckpt_mod

    # Patch only checkpoint.py's view of jax — patching the jax module
    # globally would make orbax's own multihost checks demand
    # jax.distributed.initialize().
    class _JaxProxy:
        process_count = staticmethod(lambda: 2)
        process_index = staticmethod(lambda: 0)

        def __getattr__(self, attr):
            return getattr(jax, attr)

    monkeypatch.setattr(ckpt_mod, "jax", _JaxProxy())
    seen = {}
    real_prune = ckpt_mod.prune_checkpoints

    def spy_prune(*a, **k):
        seen["thread"] = threading.current_thread()
        return real_prune(*a, **k)

    monkeypatch.setattr(ckpt_mod, "prune_checkpoints", spy_prune)
    ckpt_dir = str(tmp_path / "task")
    for s in range(1, 5):
        ckpt_mod.save_checkpoint_background(
            ckpt_dir, "model.pth", s, {"w": jnp.full((2,), float(s))},
            max_to_keep=2)
    ckpt_mod.wait_for_checkpoints()
    assert seen["thread"] is not threading.main_thread()
    root = os.path.join(ckpt_dir, "model")
    assert sorted(int(d) for d in os.listdir(root) if d.isdigit()) == [3, 4]
    restored, step = restore_checkpoint(ckpt_dir, "model.pth", {"w": jnp.zeros(2)})
    assert step == 4
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full((2,), 4.0))


def test_checkpoint_mixed_api_retention_holds(tmp_path, monkeypatch):
    """A synchronous save_checkpoint(max_to_keep=...) issued while a
    save_checkpoint_background for the SAME root is still mid-D2H must not
    prune around the in-flight step: without joining the root's worker the
    main thread's wait_until_finished has nothing to wait on, prune keeps
    only the sync step, and the background step then commits afterward —
    leaving a stale older step on disk in excess of max_to_keep."""
    import threading
    import time as time_mod

    import controlnet_tpu.io.checkpoint as ckpt_mod

    release = threading.Event()

    class _JaxProxy:
        @staticmethod
        def device_get(tree):  # stall the background worker pre-write
            release.wait(timeout=30.0)
            return jax.device_get(tree)

        def __getattr__(self, attr):
            return getattr(jax, attr)

    monkeypatch.setattr(ckpt_mod, "jax", _JaxProxy())
    ckpt_dir = str(tmp_path / "task")
    ckpt_mod.save_checkpoint_background(ckpt_dir, "model.pth", 5,
                                        {"w": jnp.full((2,), 5.0)})

    def unblock_soon():
        time_mod.sleep(0.3)
        release.set()

    threading.Thread(target=unblock_soon, daemon=True).start()
    # must join the stalled worker (released 0.3s in) before pruning
    ckpt_mod.save_checkpoint(ckpt_dir, "model.pth", 6,
                             {"w": jnp.full((2,), 6.0)}, max_to_keep=1)
    ckpt_mod.wait_for_checkpoints()
    root = os.path.join(ckpt_dir, "model")
    assert sorted(int(d) for d in os.listdir(root) if d.isdigit()) == [6]
    restored, step = restore_checkpoint(ckpt_dir, "model.pth", {"w": jnp.zeros(2)})
    assert step == 6
    np.testing.assert_array_equal(np.asarray(restored["w"]), np.full((2,), 6.0))


def test_cifar_dataset_rgb_hints(tmp_path):
    """RGB tree + RGB->gray canny hints (cifar_dataset.py:141-158)."""
    from controlnet_tpu.data.datasets import CifarDataset

    root = make_synthetic_image_tree(str(tmp_path / "cifar"), num_classes=2,
                                     per_class=3, size=32, channels=3)
    ds = CifarDataset("train", root, return_hints=True)
    im, hint = ds[0]
    assert im.shape == (32, 32, 3)
    assert hint.shape == (32, 32, 3)
    assert set(np.unique(hint)) <= {0.0, 1.0}


def test_cifar_download_short_circuits_on_existing(tmp_path):
    """download_cifar must be a no-op (no network) when the batches dir is
    already present — the offline-supported path."""
    from controlnet_tpu.utils.extract_cifar_images import download_cifar

    batches = tmp_path / "cifar-10-batches-py"
    batches.mkdir()
    (batches / "data_batch_1").write_bytes(b"x")
    out = download_cifar(str(tmp_path), url="http://invalid.invalid/nope")
    assert out == str(batches)


def test_checkpoint_background_save_mixed_device_assignments(tmp_path):
    """Leaves committed to different single-device assignments cannot share
    one jitted snapshot program — the per-leaf fallback (round 4) must kick
    in and still produce a correct checkpoint."""
    from controlnet_tpu.io.checkpoint import (
        save_checkpoint_background, wait_for_checkpoints)

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs >= 2 devices")
    tree = {"a": jax.device_put(jnp.arange(4.0), devs[0]),
            "b": jax.device_put(jnp.ones((2, 2)), devs[1]),
            "step": 3}
    ckpt_dir = str(tmp_path / "task")
    save_checkpoint_background(ckpt_dir, "model.pth", 3, tree)
    wait_for_checkpoints()
    restored, step = restore_checkpoint(ckpt_dir, "model.pth", tree)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.arange(4.0))
    np.testing.assert_array_equal(np.asarray(restored["b"]), np.ones((2, 2)))


# ---------------------------------------------------------------------------
# tuning knob registry (controlnet_tpu/tuning.py): YAML tpu_params surface
# with env-var override (VERDICT r4 weak #7).
# ---------------------------------------------------------------------------

@pytest.fixture
def _clean_tuning(monkeypatch):
    """Isolate knob state: clear env overrides and restore YAML values."""
    from controlnet_tpu import tuning

    for knob in tuning._KNOBS.values():
        monkeypatch.delenv(knob.env, raising=False)
    saved = dict(tuning._yaml_values)
    yield tuning
    tuning._yaml_values.clear()
    tuning._yaml_values.update(saved)


def test_tuning_defaults(_clean_tuning):
    tuning = _clean_tuning
    tuning.apply_config({})
    assert tuning.get("attn_pipe") is True
    assert tuning.get("tl_hint") is True
    assert tuning.get("attn_fused_proj") is False
    assert tuning.get("disable_pallas") is False
    assert tuning.get("attn_group_cap") == 4
    assert tuning.get("forward") == "default"


def test_tuning_yaml_section_applied_by_load_config(_clean_tuning, tmp_path):
    tuning = _clean_tuning
    p = tmp_path / "c.yaml"
    p.write_text(
        "dataset_params: {task_name: mnist}\n"
        "tpu_params:\n  tl_hint: false\n  attn_group_cap: 8\n  forward: paired\n")
    cfg.load_config(str(p))
    assert tuning.get("tl_hint") is False
    assert tuning.get("attn_group_cap") == 8
    assert tuning.get("forward") == "paired"
    # a later config WITHOUT the section is a no-op (reading a secondary
    # YAML for model_params must not clobber applied knobs) ...
    q = tmp_path / "d.yaml"
    q.write_text("dataset_params: {task_name: mnist}\n")
    cfg.load_config(str(q))
    assert tuning.get("tl_hint") is False
    assert tuning.get("forward") == "paired"
    # ... while an EXPLICIT empty section resets to defaults
    r = tmp_path / "e.yaml"
    r.write_text("tpu_params: {}\n")
    cfg.load_config(str(r))
    assert tuning.get("tl_hint") is True
    assert tuning.get("forward") == "default"


def test_tuning_unknown_key_and_bad_values_rejected(_clean_tuning, tmp_path):
    tuning = _clean_tuning
    p = tmp_path / "bad.yaml"
    p.write_text("tpu_params: {tl_hnt: false}\n")
    with pytest.raises(cfg.ConfigError, match="tl_hnt"):
        cfg.load_config(str(p))
    with pytest.raises(ValueError, match="boolean"):
        tuning.apply_config({"tpu_params": {"tl_hint": "no"}})
    with pytest.raises(ValueError, match="positive"):
        tuning.apply_config({"tpu_params": {"attn_vmem_bytes": -1}})
    with pytest.raises(ValueError, match="paired"):
        tuning.apply_config({"tpu_params": {"forward": "dual"}})
    # a falsy non-mapping section must raise, not silently reset knobs
    with pytest.raises(ValueError, match="mapping"):
        tuning.apply_config({"tpu_params": False})
    with pytest.raises(ValueError, match="mapping"):
        tuning.apply_config({"tpu_params": ["tl_hint"]})


def test_tuning_env_overrides_yaml(_clean_tuning, monkeypatch):
    tuning = _clean_tuning
    tuning.apply_config({"tpu_params": {"tl_hint": True, "attn_group_cap": 8}})
    monkeypatch.setenv("CONTROLNET_TPU_TL_HINT", "0")
    monkeypatch.setenv("CONTROLNET_TPU_ATTN_GROUP", "2")
    assert tuning.get("tl_hint") is False
    assert tuning.get("attn_group_cap") == 2
    # empty string counts as unset -> YAML value shows through
    monkeypatch.setenv("CONTROLNET_TPU_TL_HINT", "")
    assert tuning.get("tl_hint") is True
    # historical parse semantics: DISABLE_PALLAS is any-nonempty
    monkeypatch.setenv("CONTROLNET_TPU_DISABLE_PALLAS", "yes")
    assert tuning.get("disable_pallas") is True


def test_tuning_describe_reports_sources(_clean_tuning, monkeypatch):
    tuning = _clean_tuning
    tuning.apply_config({"tpu_params": {"attn_pipe": False}})
    monkeypatch.setenv("CONTROLNET_TPU_TL_HINT", "0")
    d = tuning.describe()
    assert d["attn_pipe"]["source"] == "yaml" and d["attn_pipe"]["value"] is False
    assert d["tl_hint"]["source"] == "env" and d["tl_hint"]["value"] is False
    assert d["conv_vmem_bytes"]["source"] == "default"
