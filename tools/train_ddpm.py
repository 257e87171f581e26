"""Train the unconditional pixel-space DDPM (MNIST / CIFAR-10).

CLI parity with reference tools/train_ddpm.py (same YAML, same flags):
    python -m tools.train_ddpm --config config/mnist.yaml

TPU-native differences: one jitted, state-donated train step; batches
sharded over the device mesh when multiple chips are visible; orbax
step-numbered checkpoints with full train-state resume (optimizer included,
unlike the reference's per-epoch torch.save overwrite, train_ddpm.py:96).
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import optax

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.data.datasets import iterate_batches
from controlnet_tpu.io.checkpoint import (restore_checkpoint, save_checkpoint,  # noqa: F401
                                          save_checkpoint_background,
                                          wait_for_checkpoints)
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_ddpm_train_step
from controlnet_tpu.train.state import create_train_state


def train(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    print(config)
    diffusion_config = cfg.diffusion_params(config)
    dataset_config = cfg.dataset_params(config)
    model_config = cfg.model_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]

    sched = make_linear_schedule(
        diffusion_config["num_timesteps"],
        diffusion_config["beta_start"],
        diffusion_config["beta_end"],
    )

    dataset = cli.build_dataset(task_name, dataset_config, "train", return_hints=False)

    unet = UNet(model_config["im_channels"], model_config)
    key = jax.random.PRNGKey(train_config.get("seed", 0))
    key, init_key = jax.random.split(key)
    params = unet.init(init_key)

    tx = optax.adam(train_config["ddpm_lr"])
    state = create_train_state(params, tx)

    os.makedirs(task_name, exist_ok=True)
    ckpt_name = train_config["ddpm_ckpt_name"]
    restored = restore_checkpoint(task_name, ckpt_name, state)
    start_epoch = 0
    if restored is not None:
        state, start_epoch = restored
        print(f"Resumed from checkpoint at epoch {start_epoch}")

    mesh = cli.mesh_or_none()
    state = cli.put_replicated(state, mesh)
    step = make_ddpm_train_step(lambda p, x, t: unet(p, x, t), sched, tx,
                                compute_dtype=cli.compute_dtype_from(train_config))

    num_epochs = train_config["num_epochs"]
    batch_size = train_config["batch_size"]
    for epoch_idx in range(start_epoch, num_epochs):
        timer = cli.EpochTimer()
        key, shuffle_key = jax.random.split(key)
        seed = int(jax.random.randint(shuffle_key, (), 0, 2**31 - 1))
        for images in iterate_batches(dataset, batch_size, shuffle=True, seed=seed):
            key, step_key = jax.random.split(key)
            batch = cli.put_batch(images, mesh)
            state, loss = step(state, batch, step_key)
            timer.add(loss)
        print(f"Finished epoch:{epoch_idx + 1} | {timer.summary()}")
        if cli.should_save_epoch(epoch_idx, num_epochs, train_config.get("ckpt_save_every_epochs", 1)):
            save_checkpoint_background(task_name, ckpt_name, epoch_idx + 1, state,
                                       max_to_keep=cli.ckpt_max_to_keep(train_config))
    wait_for_checkpoints()
    print("Done Training ...")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for ddpm training")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    train(parser.parse_args())
