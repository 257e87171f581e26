"""End-to-end distillation CLI tests: DDPM -> ControlNet -> consistency /
DMD distillation -> 1-step sampling -> comparison harness, all on a tiny
synthetic workspace (CPU)."""

import glob
import os
import types

import pytest

pytestmark = pytest.mark.e2e  # slow tool-pipeline tier; fast tier = -m 'not e2e'
import yaml

from controlnet_tpu.data.synthetic import make_synthetic_image_tree


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("distill_e2e")
    data_dir = root / "data"
    make_synthetic_image_tree(str(data_dir / "train"), num_classes=2, per_class=8, size=8)
    make_synthetic_image_tree(str(data_dir / "test"), num_classes=2, per_class=6, size=8)
    config = {
        "dataset_params": {
            "task_name": "mnist",
            "im_path": str(data_dir / "train"),
            "im_test_path": str(data_dir / "test"),
            "canny_im_size": 8,
        },
        "diffusion_params": {"num_timesteps": 8, "beta_start": 0.0001, "beta_end": 0.02},
        "model_params": {
            "im_channels": 1, "im_size": 8, "hint_channels": 3,
            "down_channels": [8, 16, 16], "mid_channels": [16, 16],
            "down_sample": [True, False], "time_emb_dim": 8,
            "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
            "num_heads": 2, "sigma_min": 0.002, "sigma_max": 5.0, "sigma_data": 0.5,
        },
        "train_params": {
            "task_name": str(root / "task"), "batch_size": 8, "num_epochs": 1,
            "controlnet_epochs": 1, "num_samples": 3, "num_grid_rows": 2,
            "ddpm_lr": 0.001, "controlnet_lr": 0.001,
            "ddpm_ckpt_name": "ddpm_ckpt.pth",
            "controlnet_ckpt_name": "ddpm_controlnet_ckpt.pth",
            "consistency_epochs": 1, "consistency_lr": 0.001,
            "distribution_matching_epochs": 1, "distribution_matching_lr": 0.001,
        },
    }
    cfg_path = root / "tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)

    # Prereqs: base DDPM + ControlNet teacher
    from tools.train_ddpm import train as train_ddpm
    from tools.train_ddpm_controlnet import train as train_cn

    a = types.SimpleNamespace(config_path=str(cfg_path))
    train_ddpm(a)
    train_cn(a)
    return types.SimpleNamespace(config_path=str(cfg_path), task=str(root / "task"))


def test_consistency_distill_and_sample(ws):
    from tools.sample_consistency_controlnet_distilled import sample
    from tools.train_consistency_controlnet_distilled import CKPT_NAME, train

    train(types.SimpleNamespace(config_path=ws.config_path))
    from controlnet_tpu.io.checkpoint import latest_checkpoint

    assert latest_checkpoint(ws.task, CKPT_NAME) == 1

    for mode in ["test", "custom"]:
        sample(types.SimpleNamespace(config_path=ws.config_path, mode=mode,
                                     num_samples=2, num_steps=1, seed=0))
    out = os.path.join(ws.task, "consistency_samples")
    assert glob.glob(os.path.join(out, "test_comparison_*.png"))
    assert glob.glob(os.path.join(out, "custom_sample_*.png"))


def test_dmd_distill_and_sample(ws):
    from tools.sample_distribution_matching_controlnet_distilled import sample
    from tools.train_distribution_matching_controlnet_distilled import CKPT_NAME, train

    train(types.SimpleNamespace(config_path=ws.config_path, no_plots=False))
    from controlnet_tpu.io.checkpoint import latest_checkpoint

    assert latest_checkpoint(ws.task, CKPT_NAME) == 1
    # training artifacts: per-epoch comparison grid + loss curves
    assert glob.glob(os.path.join(ws.task, "dmd_training_samples", "epoch_*_comparison.png"))
    assert os.path.exists(os.path.join(ws.task, "dmd_training_curves.png"))

    sample(types.SimpleNamespace(config_path=ws.config_path, mode="test",
                                 num_samples=2, best=True, seed=0))
    out = os.path.join(ws.task, "distribution_matching_samples")
    assert glob.glob(os.path.join(out, "test_comparison_*.png"))


def test_compare_all_models(ws):
    from controlnet_tpu.io.checkpoint import latest_checkpoint
    from tools.compare_all_controlnet_models import compare_models
    from tools.train_consistency_controlnet_distilled import CKPT_NAME as CONS_CKPT
    from tools.train_consistency_controlnet_distilled import train as train_cons
    from tools.train_distribution_matching_controlnet_distilled import CKPT_NAME as DMD_CKPT
    from tools.train_distribution_matching_controlnet_distilled import train as train_dmd

    if latest_checkpoint(ws.task, CONS_CKPT) is None:  # self-sufficient when run alone
        train_cons(types.SimpleNamespace(config_path=ws.config_path))
    if latest_checkpoint(ws.task, DMD_CKPT) is None:
        train_dmd(types.SimpleNamespace(config_path=ws.config_path, no_plots=True))

    compare_models(types.SimpleNamespace(config_path=ws.config_path,
                                         num_samples=2, ddpm_steps=8, seed=0))
    out = os.path.join(ws.task, "all_model_comparison")
    assert os.path.exists(os.path.join(out, "performance_metrics.txt"))
    assert os.path.exists(os.path.join(out, "timing_data.npy"))
    with open(os.path.join(out, "performance_metrics.txt")) as f:
        txt = f.read()
    assert "ddpm" in txt and "consistency" in txt and "dmd" in txt


def test_compare_two_models(ws):
    """tools/compare_controlnet_models.py (DDPM vs consistency, :18-297)."""
    from controlnet_tpu.io.checkpoint import latest_checkpoint
    from tools.compare_controlnet_models import compare_models
    from tools.train_consistency_controlnet_distilled import CKPT_NAME as CONS_CKPT
    from tools.train_consistency_controlnet_distilled import train as train_cons

    if latest_checkpoint(ws.task, CONS_CKPT) is None:  # self-sufficient when run alone
        train_cons(types.SimpleNamespace(config_path=ws.config_path))

    compare_models(types.SimpleNamespace(config_path=ws.config_path,
                                         num_samples=2, ddpm_steps=8, seed=0))
    out = os.path.join(ws.task, "model_comparison")
    assert os.path.exists(os.path.join(out, "performance_metrics.txt"))
    assert os.path.exists(os.path.join(out, "timing_data.npy"))
    assert glob.glob(os.path.join(out, "comparison_*.png"))


def test_serve_distilled_model_concurrent_load(ws):
    """tools/serve.py over real HTTP: health check, concurrent /generate
    load (p50/p99 from X-Latency-Ms), and the batched npz endpoint."""
    import io
    import json
    import threading
    import urllib.error
    import urllib.request

    import numpy as np
    from PIL import Image

    from controlnet_tpu.io.checkpoint import latest_checkpoint
    from tools.train_consistency_controlnet_distilled import CKPT_NAME as CONS_CKPT
    from tools.train_consistency_controlnet_distilled import train as train_cons

    if latest_checkpoint(ws.task, CONS_CKPT) is None:
        train_cons(types.SimpleNamespace(config_path=ws.config_path))

    import tools.serve as serve_mod
    from controlnet_tpu import config as cfgmod

    config = cfgmod.load_config(ws.config_path)
    args = types.SimpleNamespace(config_path=ws.config_path, model="consistency",
                                 host="127.0.0.1", port=0, seed=0, max_batch=4)
    server = serve_mod.make_server(args, config)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/healthz", timeout=30).read())
        assert health["status"] == "ok" and health["warm"] and health["max_batch"] == 4

        # hint PNG payload
        im_size = cfgmod.model_params(config)["im_size"]
        png = io.BytesIO()
        Image.fromarray(np.zeros((im_size, im_size), np.uint8)).save(png, format="PNG")
        payload = png.getvalue()

        # 12 requests from 4 concurrent clients
        latencies, errors = [], []

        def client(n):
            for _ in range(n):
                try:
                    req = urllib.request.Request(f"{base}/generate", data=payload,
                                                 method="POST")
                    with urllib.request.urlopen(req, timeout=120) as r:
                        assert r.status == 200
                        latencies.append(float(r.headers["X-Latency-Ms"]))
                        out = Image.open(io.BytesIO(r.read()))
                        assert out.size == (im_size, im_size)
                except Exception as e:  # pragma: no cover
                    errors.append(e)

        threads = [threading.Thread(target=client, args=(3,)) for _ in range(4)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        assert not errors, errors
        assert len(latencies) == 12
        lat = sorted(latencies)
        p50, p99 = lat[len(lat) // 2], lat[-1]
        print(f"serve load: p50={p50:.1f}ms p99={p99:.1f}ms")

        # batched endpoint: 3 hints -> padded to bucket 4, 3 samples back
        hints = np.zeros((3, im_size, im_size,
                          cfgmod.model_params(config)["hint_channels"]), np.float32)
        buf = io.BytesIO()
        np.savez_compressed(buf, hints=hints)
        req = urllib.request.Request(f"{base}/generate_batch", data=buf.getvalue(),
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            with np.load(io.BytesIO(r.read())) as z:
                samples = z["samples"]
        assert samples.shape[0] == 3
        assert np.all(np.isfinite(samples))

        # multi-step request inside the allowlist -> 200 (compiles once,
        # cached thereafter; the consistency model supports num_steps > 1)
        req = urllib.request.Request(f"{base}/generate?steps=2", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200

        # a parameter merely ENDING in 'steps' must not be misread as the
        # steps argument (exact-name query parsing): nsteps=10000 would be
        # a 400 if substring-matched, but is ignored and runs steps=1
        req = urllib.request.Request(f"{base}/generate?nsteps=10000", data=payload,
                                     method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200

        # malformed bodies and bad query params -> 400, server stays up
        bad_requests = [
            (f"{base}/generate_batch", b"junk"),           # undecodable npz
            (f"{base}/generate", b"not-a-png"),            # undecodable image
            (f"{base}/generate?steps=banana", payload),    # non-integer steps
            (f"{base}/generate?steps=0", payload),         # below allowlist
            (f"{base}/generate?steps=10000", payload),     # recompile DoS guard
        ]
        for url, body in bad_requests:
            req = urllib.request.Request(url, data=body, method="POST")
            try:
                urllib.request.urlopen(req, timeout=30)
                assert False, f"expected 400 for {url}"
            except urllib.error.HTTPError as e:
                assert e.code == 400, url
        health = json.loads(urllib.request.urlopen(f"{base}/healthz", timeout=30).read())
        assert health["status"] == "ok"
    finally:
        server.shutdown()
        server.server_close()


@pytest.mark.parametrize("model", ["ddim_controlnet", "dpm_controlnet"])
def test_serve_few_step_controlnet(ws, model):
    """--model ddim_controlnet / dpm_controlnet serves the NON-distilled
    ControlNet teacher checkpoint with a few-step solver (?steps= = solver
    step count) — quality-adjustable serving with no extra training,
    through the same batching stack as the students."""
    import io
    import json
    import threading
    import urllib.request

    import numpy as np
    from PIL import Image

    import tools.serve as serve_mod
    from controlnet_tpu import config as cfgmod

    config = cfgmod.load_config(ws.config_path)
    # --max-steps 64 exceeds this config's num_timesteps (8): the server
    # must clamp the allowlist to the schedule length, so an in-allowlist-
    # but-over-schedule request is a 400, not a 500 inside jit tracing.
    args = types.SimpleNamespace(config_path=ws.config_path, model=model,
                                 host="127.0.0.1", port=0, seed=0, max_batch=2,
                                 max_steps=64)
    server = serve_mod.make_server(args, config)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{port}"
    try:
        health = json.loads(urllib.request.urlopen(f"{base}/healthz", timeout=30).read())
        assert health["status"] == "ok" and health["model"] == model
        assert health["max_steps"] == 8  # clamped to num_timesteps

        im_size = cfgmod.model_params(config)["im_size"]
        png = io.BytesIO()
        Image.fromarray(np.zeros((im_size, im_size), np.uint8)).save(png, format="PNG")
        for steps in (1, 4):  # 1-step x0 estimate and a genuine few-step run
            req = urllib.request.Request(f"{base}/generate?steps={steps}",
                                         data=png.getvalue(), method="POST")
            with urllib.request.urlopen(req, timeout=300) as r:
                assert r.status == 200
                out = Image.open(io.BytesIO(r.read()))
                assert out.size == (im_size, im_size)

        # batched npz endpoint through the DDIM path
        hints = np.zeros((2, im_size, im_size,
                          cfgmod.model_params(config)["hint_channels"]), np.float32)
        buf = io.BytesIO()
        np.savez_compressed(buf, hints=hints)
        req = urllib.request.Request(f"{base}/generate_batch?steps=4",
                                     data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
            with np.load(io.BytesIO(r.read())) as z:
                samples = z["samples"]
        assert samples.shape == (2, im_size, im_size, 1)
        assert np.all(np.isfinite(samples)) and float(np.abs(samples).max()) <= 1.0

        # over the schedule length (but under the operator flag) -> 400
        import urllib.error
        req = urllib.request.Request(f"{base}/generate?steps=32",
                                     data=png.getvalue(), method="POST")
        try:
            urllib.request.urlopen(req, timeout=30)
            assert False, "expected 400 for steps above num_timesteps"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        server.server_close()


def test_serve_bucket_respects_cap():
    """_bucket must never exceed max_batch: a non-power-of-two cap gets
    itself as the final bucket, not the next power of two above it (which
    would silently exceed the operator's memory cap)."""
    from tools.serve import _bucket

    assert _bucket(1, 8) == 1
    assert _bucket(3, 8) == 4
    assert _bucket(8, 8) == 8
    assert _bucket(9, 12) == 12   # not 16
    assert _bucket(8, 12) == 8
    assert _bucket(12, 12) == 12
    assert _bucket(5, 5) == 5
    assert all(_bucket(b, 12) <= 12 for b in range(1, 13))
