"""End-to-end CelebHQ-stack CLI tests on a tiny synthetic workspace:
VAE GAN training -> latent export -> LDM training -> LDM sampling ->
LDM ControlNet training + sampling (CPU)."""

import glob
import os
import types

import numpy as np
import pytest

pytestmark = pytest.mark.e2e  # slow tool-pipeline tier; fast tier = -m 'not e2e'
import yaml
from PIL import Image


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("celeb_e2e")
    img_dir = root / "data" / "celeb"
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(12):
        arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        arr[4:12, 4:12] = 255  # a box so canny finds edges
        Image.fromarray(arr).save(img_dir / f"img_{i}.png")

    config = {
        "dataset_params": {
            "name": "celebhq",
            "im_path": str(img_dir),
            "im_channels": 3,
            "im_size": 16,
            "canny_im_size": 16,
        },
        "diffusion_params": {"num_timesteps": 8, "beta_start": 0.0015, "beta_end": 0.0195},
        "ldm_params": {
            "hint_channels": 3,
            "down_channels": [8, 16, 16], "mid_channels": [16, 16],
            "down_sample": [True, False], "attn_down": [False, True],
            "time_emb_dim": 8, "norm_channels": 4, "num_heads": 2,
            "conv_out_channels": 8,
            "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
        },
        "autoencoder_params": {
            "z_channels": 2,
            "down_channels": [8, 16], "mid_channels": [16],
            "down_sample": [True], "attn_down": [False],
            "norm_channels": 4, "num_heads": 2,
            "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
        },
        "train_params": {
            "seed": 7,
            "task_name": str(root / "task"),
            "ldm_batch_size": 4, "autoencoder_batch_size": 4,
            "disc_start": 1, "disc_weight": 0.5, "perceptual_weight": 1,
            "kl_weight": 0.000005,
            "ldm_epochs": 1, "autoencoder_epochs": 1, "controlnet_epochs": 1,
            "num_samples": 2, "num_grid_rows": 2,
            "ldm_lr": 0.001, "ldm_lr_steps": [1],
            "autoencoder_lr": 0.001,
            "controlnet_lr": 0.001, "controlnet_lr_steps": [1],
            "autoencoder_acc_steps": 2, "autoencoder_img_save_steps": 2,
            "save_latents": True,
            "vae_latent_dir_name": "vae_latents",
            "ldm_ckpt_name": "ddpm_ckpt.pth",
            "controlnet_ckpt_name": "ddpm_controlnet_ckpt.pth",
            "vae_autoencoder_ckpt_name": "vae_autoencoder_ckpt.pth",
            "vae_discriminator_ckpt_name": "vae_discriminator_ckpt.pth",
        },
    }
    cfg_path = root / "celeb_tiny.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return types.SimpleNamespace(config_path=str(cfg_path), task=str(root / "task"))


def test_vae_gan_training(ws):
    from tools.train_vae import train

    train(types.SimpleNamespace(config_path=ws.config_path))
    from controlnet_tpu.io.checkpoint import latest_checkpoint

    assert latest_checkpoint(ws.task, "vae_autoencoder_ckpt.pth") == 1
    # periodic recon grids written (train_vae.py:118-131 parity)
    assert glob.glob(os.path.join(ws.task, "vae_autoencoder_samples", "*.png"))


def test_infer_vae_and_latent_export(ws):
    from tools.infer_vae import infer

    infer(types.SimpleNamespace(config_path=ws.config_path, batch_size=4, seed=0))
    assert os.path.exists(os.path.join(ws.task, "vae_infer_samples.png"))
    latents = glob.glob(os.path.join(ws.task, "vae_latents", "*.npz"))
    assert latents
    # refuses to overwrite (infer_vae.py:93 parity)
    infer(types.SimpleNamespace(config_path=ws.config_path, batch_size=4, seed=0))
    assert glob.glob(os.path.join(ws.task, "vae_latents", "*.npz")) == latents


def test_ldm_train_and_sample(ws):
    from tools.sample_ldm_vae import sample
    from tools.train_ldm_vae import train

    train(types.SimpleNamespace(config_path=ws.config_path))
    from controlnet_tpu.io.checkpoint import latest_checkpoint

    assert latest_checkpoint(ws.task, "ddpm_ckpt.pth") == 1

    sample(types.SimpleNamespace(config_path=ws.config_path, num_samples=2,
                                 save_every=4, seed=0))
    out = os.path.join(ws.task, "samples")
    assert os.path.exists(os.path.join(out, "final_decoded.png"))
    assert glob.glob(os.path.join(out, "x0_*.png"))


def test_ldm_controlnet_train_and_sample(ws):
    from tools.sample_ldm_controlnet import sample
    from tools.train_ldm_controlnet import train

    train(types.SimpleNamespace(config_path=ws.config_path))
    from controlnet_tpu.io.checkpoint import latest_checkpoint

    assert latest_checkpoint(ws.task, "ddpm_controlnet_ckpt.pth") == 1

    sample(types.SimpleNamespace(config_path=ws.config_path, num_samples=2,
                                 save_every=8, seed=0))
    out = os.path.join(ws.task, "hint_samples")
    assert os.path.exists(os.path.join(out, "hints.png"))
    assert os.path.exists(os.path.join(out, "final_decoded.png"))
