"""LPIPS ablation (VERDICT item 4): no pretrained VGG16 exists in this
offline environment, so the VAE trains against a *random-feature* LPIPS
(models/lpips.py fallback).  This experiment bounds the effect of that
deviation: train the same small VAE with perceptual_weight=1 (random
features) and perceptual_weight=0 (pure recon+KL), identical data and
seeds, and compare held-out reconstruction quality.

Judging metrics are independent of the training objective:
  * recon MSE / PSNR on held-out images,
  * Frechet feature distance (FFD) between recon and input sets,
  * feature-space distance under a FRESH random net (different seed than
    the one trained against), so the LPIPS-trained variant gets no
    self-grading advantage.

Stages:  python scripts/lpips_ablation.py [data|train|eval|all]
State in lpips_ablation_ws/; results JSON + table for docs/DESIGN.md.
"""

from __future__ import annotations

import json
import os
import sys
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WS = os.path.join(REPO, "lpips_ablation_ws")

IM_SIZE = 32
EPOCHS = int(os.environ.get("ABLATION_EPOCHS", "6"))
VARIANTS = {"with_lpips": 1.0, "no_lpips": 0.0}

AUTOENC = {
    "z_channels": 2,
    "down_channels": [16, 32],
    "mid_channels": [32],
    "down_sample": [True],
    "attn_down": [False],
    "norm_channels": 8,
    "num_heads": 4,
    "num_down_layers": 1,
    "num_mid_layers": 1,
    "num_up_layers": 1,
}


def _config(task: str, perceptual_weight: float) -> dict:
    return {
        "dataset_params": {
            "im_path": os.path.join(WS, "data", "train_flat"),
            "im_channels": 3,
            "im_size": IM_SIZE,
            "canny_im_size": IM_SIZE,
            "name": "celebhq",
        },
        "diffusion_params": {"num_timesteps": 1000, "beta_start": 0.0015,
                             "beta_end": 0.0195},
        "autoencoder_params": AUTOENC,
        "train_params": {
            "seed": 7,
            "task_name": task,
            "autoencoder_batch_size": 16,
            "disc_start": 10**9,  # GAN branch off: isolate the LPIPS term
            "disc_weight": 0.5,
            "perceptual_weight": perceptual_weight,
            "kl_weight": 0.000005,
            "autoencoder_epochs": EPOCHS,
            "autoencoder_lr": 0.0001,
            "autoencoder_acc_steps": 1,
            "autoencoder_img_save_steps": 10**9,
            "num_samples": 2,
            "num_grid_rows": 2,
            "vae_autoencoder_ckpt_name": "vae_autoencoder_ckpt.pth",
            "vae_discriminator_ckpt_name": "vae_discriminator_ckpt.pth",
        },
    }


def stage_data():
    import shutil

    from controlnet_tpu.data.synthetic import make_synthetic_image_tree

    make_synthetic_image_tree(os.path.join(WS, "data", "train"),
                              num_classes=4, per_class=128, size=IM_SIZE, seed=0)
    make_synthetic_image_tree(os.path.join(WS, "data", "test"),
                              num_classes=4, per_class=32, size=IM_SIZE, seed=9)
    # the celebhq dataset globs a FLAT <im_path>/*.png dir
    # (data/datasets.py:209-211, mirroring dataset/celeb_dataset.py)
    flat = os.path.join(WS, "data", "train_flat")
    os.makedirs(flat, exist_ok=True)
    root = os.path.join(WS, "data", "train")
    for cls in sorted(os.listdir(root)):
        for f in sorted(os.listdir(os.path.join(root, cls))):
            shutil.copyfile(os.path.join(root, cls, f),
                            os.path.join(flat, f"{cls}_{f}"))
    print("dataset ready")


def stage_train():
    import yaml

    from tools.train_vae import train

    for name, w in VARIANTS.items():
        task = os.path.join(WS, name)
        ckpt_dir = os.path.join(task, "vae_autoencoder_ckpt.pth")
        cfgp = os.path.join(WS, name + ".yaml")
        with open(cfgp, "w") as f:
            yaml.safe_dump(_config(task, w), f)
        from controlnet_tpu.io.checkpoint import latest_checkpoint

        if latest_checkpoint(task, "vae_autoencoder_ckpt.pth") == EPOCHS:
            print(f"{name}: already trained")
            continue
        print(f"=== training {name} (perceptual_weight={w}) ===", flush=True)
        train(types.SimpleNamespace(config_path=cfgp))


def _load_test_images():
    import numpy as np
    from PIL import Image

    root = os.path.join(WS, "data", "test")
    ims = []
    for cls in sorted(os.listdir(root)):
        d = os.path.join(root, cls)
        for f in sorted(os.listdir(d)):
            arr = np.asarray(Image.open(os.path.join(d, f)).convert("RGB"),
                             dtype=np.float32) / 255.0
            ims.append(arr * 2 - 1)
    return np.stack(ims)


def stage_eval():
    import jax
    import numpy as np

    from controlnet_tpu.io.checkpoint import restore_checkpoint_raw
    from controlnet_tpu.models.lpips import LPIPS
    from controlnet_tpu.models.vae import VAE
    from tools.eval_metrics import evaluate

    test = _load_test_images()
    vae = VAE(3, AUTOENC)
    # independent judge net: seed far from the training LPIPS (seeded from
    # PRNGKey(7) splits inside tools/train_vae.py)
    judge = LPIPS()
    judge_params = judge.init(jax.random.PRNGKey(4242))
    judge_fn = jax.jit(lambda p, a, b: judge(p, a, b))

    results = {}
    for name in VARIANTS:
        task = os.path.join(WS, name)
        tree, _ = restore_checkpoint_raw(task, "vae_autoencoder_ckpt.pth")
        params = tree["g"]["params"]
        recon = np.asarray(jax.jit(
            lambda p, x: vae(p, x, jax.random.PRNGKey(0))[0])(params, test))
        mse = float(np.mean((recon - test) ** 2))
        psnr = float(10 * np.log10(4.0 / mse))  # [-1,1] range -> peak 2
        ffd = evaluate(((recon + 1) / 2), ((test + 1) / 2), 3)["ffd"]
        judge_d = float(np.mean(np.asarray(judge_fn(judge_params, recon, test))))
        results[name] = {"recon_mse": mse, "psnr_db": psnr,
                         "ffd_recon_vs_input": ffd,
                         "judge_feature_dist": judge_d}
        print(name, json.dumps(results[name]), flush=True)

    out = os.path.join(WS, "lpips_ablation_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    os.makedirs(WS, exist_ok=True)
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("data", "all"):
        stage_data()
    if stage in ("train", "all"):
        stage_train()
    if stage in ("eval", "all"):
        stage_eval()
