"""VAE inference: reconstruction grids + full-dataset latent export.

CLI parity with reference tools/infer_vae.py:
    python -m tools.infer_vae --config config/celebhq.yaml

* recon grids for random images (infer_vae.py:67-86)
* if train_params.save_latents: encode the whole dataset and cache the
  encoder moments (mean||logvar) keyed by filename — the LDM trainers
  reparameterize from these (train_ldm_vae.py:98-101).  The reference
  pickles 1000-image shards at batch size 1 (infer_vae.py:88-114); here
  latents are encoded in jitted batches and written as npz shards (the
  loader reads both formats), and the export refuses to overwrite an
  existing cache (:93).
"""

from __future__ import annotations

import argparse
import os
import random

import jax
import numpy as np

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.io.images import save_image_grid
from controlnet_tpu.models.vae import VAE


def load_vae_params(task_name: str, train_config: dict):
    """Restore VAE params from a train_vae checkpoint ({"g","d"} tree)."""
    from controlnet_tpu.io.checkpoint import restore_checkpoint_raw

    restored = restore_checkpoint_raw(task_name, train_config["vae_autoencoder_ckpt_name"])
    if restored is None:
        raise FileNotFoundError("VAE checkpoint not found — run tools.train_vae first")
    tree, step = restored
    print(f"Loaded VAE checkpoint at epoch {step}")
    return tree["g"]["params"]


def infer(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    dataset_config = cfg.dataset_params(config)
    autoencoder_config = cfg.autoencoder_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]
    im_channels = dataset_config["im_channels"]

    vae = VAE(im_channels, autoencoder_config)
    params = load_vae_params(task_name, train_config)
    dataset = cli.build_dataset("celebhq", dataset_config, "train", return_hints=False)

    # ----- reconstruction grid (infer_vae.py:67-86) -----
    num_images = train_config["num_samples"]
    if len(dataset) == 0:
        raise cfg.ConfigError(
            f"no images under {dataset_config['im_path']} "
            "(celebhq expects a flat <im_path>/*.png|jpg directory)")
    rng = random.Random(args.seed)
    idxs = [rng.randint(0, len(dataset) - 1) for _ in range(num_images)]
    ims = np.stack([dataset[i] for i in idxs])

    moments_fn = jax.jit(vae.moments)
    decode_fn = jax.jit(vae.decode)
    moments = moments_fn(params, ims)
    mean = np.asarray(moments)[..., : autoencoder_config["z_channels"]]
    recon = np.asarray(decode_fn(params, mean))

    both = np.concatenate([(ims + 1) / 2, np.clip((recon + 1) / 2, 0, 1)])
    out = os.path.join(task_name, "vae_infer_samples.png")
    save_image_grid(both, out, nrow=num_images)
    print(f"Wrote reconstruction grid to {out}")

    # ----- latent export (infer_vae.py:88-114) -----
    if train_config.get("save_latents", False):
        latent_dir = os.path.join(task_name, train_config["vae_latent_dir_name"])
        if os.path.exists(latent_dir) and os.listdir(latent_dir):
            print("Latents already present; refusing to overwrite. Delete to regenerate.")
            return
        os.makedirs(latent_dir, exist_ok=True)
        batch = args.batch_size
        shard: dict[str, np.ndarray] = {}
        shard_idx = 0
        for start in range(0, len(dataset), batch):
            idx = list(range(start, min(start + batch, len(dataset))))
            ims = np.stack([dataset[i] for i in idx])
            moments = np.asarray(moments_fn(params, ims))
            for j, i in enumerate(idx):
                shard[dataset.images[i]] = moments[j]
            if len(shard) >= 1000:
                np.savez(os.path.join(latent_dir, f"latents_{shard_idx}.npz"), **shard)
                shard, shard_idx = {}, shard_idx + 1
            if start % (batch * 50) == 0:
                print(f"encoded {start + len(idx)}/{len(dataset)}")
        if shard:
            np.savez(os.path.join(latent_dir, f"latents_{shard_idx}.npz"), **shard)
        print(f"Done saving latents to {latent_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for vae inference")
    parser.add_argument("--config", dest="config_path", default="config/celebhq.yaml", type=str)
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    infer(parser.parse_args())
