"""On-TPU canny validation (VERDICT item 9), two halves:

1. **Training equivalence**: fine-tune the same ControlNet (same base DDPM
   checkpoint, same data/seeds — reuses the fidelity_ws pipeline) once with
   host cv2 hints (`--hint_backend cv2`, exact reference parity) and once
   with the on-device canny (`--hint_backend tpu`, ops/canny.py).  Both
   models are then evaluated under *cv2* hints — the deployment
   distribution — on held-out data: hint-conditioned denoising loss and
   1000-step conditional samples.  If the tpu-canny-trained model matches
   the cv2-trained model under cv2 hints, the ~93%-pixel-agreement hint
   distribution shift does not matter for training.

2. **Input-pipeline throughput**: hints/sec for full-res 1024^2 CelebHQ
   hint generation, host cv2 loop vs batched on-device canny — the
   data-stall argument for the tpu backend (run with a TPU attached).

Stages: python scripts/canny_ablation.py [train|eval|throughput|all]
State in canny_ablation_ws/; results JSON.
"""

from __future__ import annotations

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WS = os.path.join(REPO, "canny_ablation_ws")
FID_WS = os.path.join(REPO, "fidelity_ws")
EPOCHS = int(os.environ.get("CANNY_EPOCHS", "6"))
IM_SIZE = 16

# mirror scripts/fidelity_parity.py CONFIG (same data, same base ckpt)
MODEL_PARAMS = {
    "im_channels": 1, "im_size": IM_SIZE, "hint_channels": 3,
    "down_channels": [16, 32], "mid_channels": [32, 16],
    "down_sample": [True], "time_emb_dim": 32,
    "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
    "num_heads": 4,
}


def _config(task: str) -> dict:
    return {
        "dataset_params": {
            "task_name": "mnist",
            "im_path": os.path.join(FID_WS, "data", "train"),
            "im_test_path": os.path.join(FID_WS, "data", "test"),
            "canny_im_size": IM_SIZE,
        },
        "diffusion_params": {"num_timesteps": 1000, "beta_start": 0.0001,
                             "beta_end": 0.02},
        "model_params": MODEL_PARAMS,
        "train_params": {
            "task_name": task, "batch_size": 64,
            "num_epochs": EPOCHS, "controlnet_epochs": EPOCHS,
            "num_samples": 25, "num_grid_rows": 5,
            "controlnet_lr": 0.0001, "ddpm_lr": 0.0001, "seed": 3,
            "ddpm_ckpt_name": "ddpm_ckpt.pth",
            "controlnet_ckpt_name": "controlnet_ckpt.pth",
        },
    }


def stage_train():
    import yaml

    from controlnet_tpu.io.checkpoint import latest_checkpoint
    from tools.train_ddpm_controlnet import train

    base_ckpt = os.path.join(FID_WS, "ours_task", "ddpm_ckpt")
    assert os.path.isdir(base_ckpt), \
        "run scripts/fidelity_parity.py ours first (shared base DDPM ckpt)"
    for backend in ("cv2", "tpu"):
        task = os.path.join(WS, backend)
        os.makedirs(task, exist_ok=True)
        link = os.path.join(task, "ddpm_ckpt")
        if not os.path.exists(link):
            os.symlink(base_ckpt, link)  # same base DDPM for both variants
        cfgp = os.path.join(WS, backend + ".yaml")
        with open(cfgp, "w") as f:
            yaml.safe_dump(_config(task), f)
        if latest_checkpoint(task, "controlnet_ckpt.pth") == EPOCHS:
            print(f"{backend}: already trained")
            continue
        print(f"=== training ControlNet with {backend} hints ===", flush=True)
        train(types.SimpleNamespace(config_path=cfgp, hint_backend=backend))


def stage_eval():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from controlnet_tpu.data.datasets import MnistDataset, iterate_batches
    from controlnet_tpu.models.controlnet import ControlNet
    from controlnet_tpu.schedules.linear import add_noise, make_linear_schedule
    from tools.train_ddpm_controlnet import load_controlnet_params

    sched = make_linear_schedule(1000, 0.0001, 0.02)
    test = MnistDataset("test", os.path.join(FID_WS, "data", "test"),
                        return_hints=True)
    cn = ControlNet(1, MODEL_PARAMS)

    def eval_loss(params) -> float:
        """Hint-conditioned eps-MSE on held-out data under CV2 hints,
        averaged over a deterministic t/noise draw per batch."""
        @jax.jit
        def loss_fn(p, im, hint, key):
            kt, kn = jax.random.split(key)
            t = jax.random.randint(kt, (im.shape[0],), 0, 1000)
            noise = jax.random.normal(kn, im.shape)
            noisy = add_noise(sched, im, noise, t)
            pred = cn(p, noisy, t, hint)
            return jnp.mean((pred - noise) ** 2)

        losses, key = [], jax.random.PRNGKey(1234)
        for batch in iterate_batches(test, 64, shuffle=False):
            im, hint = batch
            key, k = jax.random.split(key)
            losses.append(float(loss_fn(params, im, hint, k)))
        return float(np.mean(losses))

    results = {}
    for backend in ("cv2", "tpu"):
        task = os.path.join(WS, backend)
        full = load_controlnet_params(task, "controlnet_ckpt.pth", cn)
        results[f"heldout_eps_mse_{backend}_trained"] = eval_loss(full)
        print(backend, results[f"heldout_eps_mse_{backend}_trained"], flush=True)

    a = results["heldout_eps_mse_cv2_trained"]
    b = results["heldout_eps_mse_tpu_trained"]
    results["relative_gap"] = abs(a - b) / a
    out = os.path.join(WS, "canny_ablation_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    print("wrote", out)


def stage_throughput():
    import time

    import cv2
    import jax
    import numpy as np

    from controlnet_tpu.ops.canny import canny_hints

    rng = np.random.default_rng(0)
    # synthetic full-res "photos": smooth blobs so canny has real contours
    base = rng.random((16, 64, 64)).astype(np.float32)
    imgs = np.stack([cv2.resize(b, (1024, 1024), interpolation=cv2.INTER_CUBIC)
                     for b in base])
    imgs = np.clip(imgs, 0, 1)

    t0 = time.time()
    for im in imgs:
        u8 = (im * 255).astype(np.uint8)
        cv2.Canny(u8, 100, 200)
    cv2_dt = time.time() - t0

    dev_imgs = jax.device_put(imgs[..., None])  # (B, H, W, 1) in [0, 1]
    fn = jax.jit(canny_hints)
    jax.block_until_ready(fn(dev_imgs))  # compile
    t0 = time.time()
    for _ in range(5):
        out = fn(dev_imgs)
    jax.block_until_ready(out)
    dev_dt = (time.time() - t0) / 5

    res = {
        "cv2_hints_per_sec_1024": round(len(imgs) / cv2_dt, 1),
        "device_hints_per_sec_1024": round(len(imgs) / dev_dt, 1),
        "speedup": round(cv2_dt / dev_dt, 1),
        "device": str(jax.devices()[0]),
    }
    out_p = os.path.join(WS, "canny_throughput.json")
    with open(out_p, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    os.makedirs(WS, exist_ok=True)
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("train", "all"):
        stage_train()
    if stage in ("eval", "all"):
        stage_eval()
    if stage in ("throughput", "all"):
        stage_throughput()
