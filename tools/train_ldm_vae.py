"""Train the unconditional latent diffusion model (LDM) on CelebA-HQ.

CLI parity with reference tools/train_ldm_vae.py:
    python -m tools.train_ldm_vae --config config/celebhq.yaml

Semantics (train_ldm_vae.py:21-126): CompVis sqrt-space schedule
(ldm_scheduler=True); latents reparameterized from the cached mean||logvar
when the latent cache exists, else on-the-fly frozen-VAE encode; Adam with
MultiStep LR decay (gamma 0.5 at ldm_lr_steps); eps-MSE; per-epoch
checkpoints.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.data.datasets import CelebDataset, iterate_batches
from controlnet_tpu.io.checkpoint import (restore_checkpoint, save_checkpoint,  # noqa: F401
                                          save_checkpoint_background,
                                          wait_for_checkpoints)
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.models.vae import VAE
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_ddpm_train_step
from controlnet_tpu.train.state import create_train_state


def multistep_adam(lr: float, milestones_epochs: list[int], steps_per_epoch: int,
                   gamma: float = 0.5):
    """Adam + piecewise-constant LR decayed by gamma at epoch milestones
    (torch MultiStepLR equivalent, train_ldm_vae.py:84)."""
    boundaries = {m * steps_per_epoch: gamma for m in milestones_epochs}
    schedule = optax.piecewise_constant_schedule(lr, boundaries)
    return optax.adam(schedule)


def latents_from_batch(batch: jnp.ndarray, key: jax.Array, z_channels: int) -> jnp.ndarray:
    """Reparameterize cached mean||logvar moments (train_ldm_vae.py:98-101)."""
    mean, logvar = jnp.split(batch, 2, axis=-1)
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def train(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    print(config)
    diffusion_config = cfg.diffusion_params(config)
    dataset_config = cfg.dataset_params(config)
    ldm_config = cfg.ldm_params(config)
    autoencoder_config = cfg.autoencoder_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]
    z_channels = autoencoder_config["z_channels"]

    sched = make_linear_schedule(
        diffusion_config["num_timesteps"],
        diffusion_config["beta_start"],
        diffusion_config["beta_end"],
        ldm_scheduler=True,
    )

    dataset = CelebDataset(
        "train", im_path=dataset_config["im_path"], im_size=dataset_config["im_size"],
        im_channels=dataset_config["im_channels"], use_latents=True,
        latent_path=os.path.join(task_name, train_config["vae_latent_dir_name"]),
    )

    unet = UNet(z_channels, ldm_config)
    key = jax.random.PRNGKey(train_config.get("seed", 1111))
    key, init_key = jax.random.split(key)
    params = unet.init(init_key)

    batch_size = train_config["ldm_batch_size"]
    steps_per_epoch = max(1, len(dataset) // batch_size)
    tx = multistep_adam(train_config["ldm_lr"], train_config["ldm_lr_steps"], steps_per_epoch)
    state = create_train_state(params, tx)

    os.makedirs(task_name, exist_ok=True)
    ckpt_name = train_config["ldm_ckpt_name"]
    restored = restore_checkpoint(task_name, ckpt_name, state)
    start_epoch = 0
    if restored is not None:
        state, start_epoch = restored
        print(f"Resumed LDM from epoch {start_epoch}")

    vae = None
    vae_params = None
    if not dataset.use_latents:
        print("Loading vae model as latents not present")
        from tools.infer_vae import load_vae_params

        vae = VAE(dataset_config["im_channels"], autoencoder_config)
        vae_params = load_vae_params(task_name, train_config)
        encode_fn = jax.jit(lambda p, x, k: vae.encode(p, x, k)[0])

    mesh = cli.mesh_or_none()
    state = cli.put_replicated(state, mesh)
    step = make_ddpm_train_step(lambda p, x, t: unet(p, x, t), sched, tx,
                                compute_dtype=cli.compute_dtype_from(train_config))

    num_epochs = train_config["ldm_epochs"]
    for epoch_idx in range(start_epoch, num_epochs):
        timer = cli.EpochTimer()
        key, shuffle_key = jax.random.split(key)
        seed = int(jax.random.randint(shuffle_key, (), 0, 2**31 - 1))
        for batch in iterate_batches(dataset, batch_size, shuffle=True, seed=seed):
            key, lat_key, step_key = jax.random.split(key, 3)
            batch = cli.put_batch(batch, mesh)
            if dataset.use_latents:
                latents = latents_from_batch(batch, lat_key, z_channels)
            else:
                latents = encode_fn(vae_params, batch, lat_key)
            state, loss = step(state, latents, step_key)
            timer.add(loss)
        print(f"Finished epoch:{epoch_idx + 1} | {timer.summary()}")
        if cli.should_save_epoch(epoch_idx, num_epochs, train_config.get("ckpt_save_every_epochs", 1)):
            save_checkpoint_background(task_name, ckpt_name, epoch_idx + 1, state,
                                       max_to_keep=cli.ckpt_max_to_keep(train_config))
    wait_for_checkpoints()
    print("Done Training ...")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for ldm training")
    parser.add_argument("--config", dest="config_path", default="config/celebhq.yaml", type=str)
    train(parser.parse_args())
