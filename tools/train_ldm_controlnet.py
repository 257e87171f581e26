"""Fine-tune a canny-hint ControlNet on the trained CelebA-HQ LDM.

CLI parity with reference tools/train_ldm_controlnet.py:
    python -m tools.train_ldm_controlnet --config config/celebhq.yaml

Key semantics (train_ldm_controlnet.py:21-149): hints are canny edges of
the FULL-RES (canny_im_size) image while diffusion runs at latent
resolution — down_sample_factor = canny_im_size // latent_size selects the
depth of the strided hint encoder (:59-60, controlnet_ldm.py:45-79);
CompVis schedule; Adam + MultiStep LR gamma=0.1 at controlnet_lr_steps;
only the control branch trains.
"""

from __future__ import annotations

import argparse
import os

import jax
import optax

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.data.datasets import CelebDataset, iterate_batches
from controlnet_tpu.io.checkpoint import (restore_checkpoint, save_checkpoint,  # noqa: F401
                                          save_checkpoint_background,
                                          wait_for_checkpoints)
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_controlnet_train_step
from controlnet_tpu.train.state import create_train_state
from tools.sample_ldm_vae import latent_size, load_ldm_params
from tools.train_ldm_vae import latents_from_batch, multistep_adam


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
        diffusion_config["num_timesteps"], diffusion_config["beta_start"],
        diffusion_config["beta_end"], ldm_scheduler=True,
    )

    dataset = CelebDataset(
        "train", im_path=dataset_config["im_path"], im_size=dataset_config["im_size"],
        im_channels=dataset_config["im_channels"], use_latents=True,
        latent_path=os.path.join(task_name, train_config["vae_latent_dir_name"]),
        return_hint=True, canny_im_size=dataset_config["canny_im_size"],
    )

    lsize = latent_size(dataset_config, autoencoder_config)
    down_sample_factor = dataset_config["canny_im_size"] // lsize
    print(f"LDM ControlNet hint down_sample_factor = {down_sample_factor}")

    cn = ControlNet(z_channels, ldm_config, model_locked=True,
                    down_sample_factor=down_sample_factor)
    key = jax.random.PRNGKey(train_config.get("seed", 1111))
    key, init_key = jax.random.split(key)

    unet = UNet(z_channels, ldm_config)
    trained_params = load_ldm_params(task_name, train_config["ldm_ckpt_name"], unet)
    cn_params = cn.init(init_key, trained_unet_params=trained_params)
    trainable, frozen = cn.split_params(cn_params)

    batch_size = train_config["ldm_batch_size"]
    steps_per_epoch = max(1, len(dataset) // batch_size)
    tx = multistep_adam(train_config["controlnet_lr"], train_config["controlnet_lr_steps"],
                        steps_per_epoch, gamma=0.1)
    state = create_train_state(trainable, tx)

    ckpt_name = train_config["controlnet_ckpt_name"]
    restored = restore_checkpoint(task_name, ckpt_name, {"state": state, "frozen": frozen})
    start_epoch = 0
    if restored is not None:
        tree, start_epoch = restored
        state, frozen = tree["state"], tree["frozen"]
        print(f"Resumed LDM ControlNet from epoch {start_epoch}")

    mesh = cli.mesh_or_none()
    state = cli.put_replicated(state, mesh)
    frozen = cli.put_replicated(frozen, mesh)
    # additive key: cfg_drop_prob > 0 trains the null (zero-hint) condition
    # for classifier-free guidance at sampling time (--cfg_scale); default
    # 0.0 = reference parity (SURVEY.md component #19: drops never wired).
    step = make_controlnet_train_step(cn, sched, tx,
                                      compute_dtype=cli.compute_dtype_from(train_config),
                                      cfg_drop_prob=float(train_config.get("cfg_drop_prob", 0.0)))

    num_epochs = train_config["controlnet_epochs"]
    for epoch_idx in range(start_epoch, num_epochs):
        timer = cli.EpochTimer()
        key, shuffle_key = jax.random.split(key)
        seed = int(jax.random.randint(shuffle_key, (), 0, 2**31 - 1))
        for batch, hints in iterate_batches(dataset, batch_size, shuffle=True, seed=seed):
            key, lat_key, step_key = jax.random.split(key, 3)
            batch = cli.put_batch(batch, mesh)
            hints = cli.put_batch(hints, mesh)
            latents = latents_from_batch(batch, lat_key, z_channels)
            state, loss = step(state, frozen, latents, hints, step_key)
            timer.add(loss)
        print(f"Finished epoch:{epoch_idx + 1} | {timer.summary()}")
        if cli.should_save_epoch(epoch_idx, num_epochs, train_config.get("ckpt_save_every_epochs", 1)):
            save_checkpoint_background(task_name, ckpt_name, epoch_idx + 1,
                                       {"state": state, "frozen": frozen},
                                       max_to_keep=cli.ckpt_max_to_keep(train_config))
    wait_for_checkpoints()
    print("Done Training ...")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for ldm controlnet training")
    parser.add_argument("--config", dest="config_path", default="config/celebhq.yaml", type=str)
    train(parser.parse_args())
