"""Consistency-distill the DDPM ControlNet into a 1-step sampler.

CLI parity with reference tools/train_consistency_controlnet_distilled.py:
    python -m tools.train_consistency_controlnet_distilled --config config/mnist.yaml

Mode selection via train_params flags (reference :79-80):
  use_consistency_only: pure consistency training (EMA-teacher target)
  use_ddpm_distillation (default True): log-uniform sigma, combined
    alpha*recon + (1-alpha)*DDPM-teacher loss
  neither: "manual" mode with high-noise-biased timesteps (:113-129)

Requires the trained ControlNet checkpoint (controlnet_ckpt_name) as the
frozen DDPM teacher (:56-61).  Saves {epoch, student, ema_teacher,
optimizer state, model_config} per epoch under
'consistency_controlnet_distilled.pth' (:151-159) — the name both compare
tools load (the reference's compare_controlnet_models.py:69 uses a stale
name; the canonical one is used here, SURVEY.md quirk list).
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
from controlnet_tpu.models.consistency import ConsistencyDistilled
from controlnet_tpu.train.loops import make_consistency_train_step
from controlnet_tpu.train.state import create_train_state
from tools.train_ddpm_controlnet import load_controlnet_params

CKPT_NAME = "consistency_controlnet_distilled.pth"


def train(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    print(config)
    diffusion_config = cfg.diffusion_params(config)
    dataset_config = cfg.dataset_params(config)
    model_config = cfg.model_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]

    use_distillation = train_config.get("use_ddpm_distillation", True)
    use_consistency_only = train_config.get("use_consistency_only", False)
    if use_consistency_only:
        mode = "consistency_only"
    elif use_distillation:
        mode = "ddpm_distillation"
    else:
        mode = "manual"
    print(f"Consistency training mode: {mode}")

    dataset = cli.build_dataset(task_name, dataset_config, "train", return_hints=True)

    model = ConsistencyDistilled(
        model_config["im_channels"], model_config,
        use_ddpm_teacher=(mode != "consistency_only"),
        num_timesteps=diffusion_config["num_timesteps"],
    )

    key = jax.random.PRNGKey(train_config.get("seed", 0))
    key, init_key = jax.random.split(key)

    teacher_params = {}
    if mode != "consistency_only":
        teacher_params = load_controlnet_params(
            task_name, train_config["controlnet_ckpt_name"], model.teacher)
    p = model.init(init_key, teacher_params=teacher_params or None)

    num_epochs = train_config.get("consistency_epochs", 10)
    tx = optax.adam(train_config.get("consistency_lr", 1e-4))
    state = create_train_state(p["student"], tx)
    ema = p["ema_teacher"]
    teacher = p.get("teacher", {})

    restored = restore_checkpoint(task_name, CKPT_NAME, {"state": state, "ema": ema})
    start_epoch = 0
    if restored is not None:
        tree, start_epoch = restored
        state, ema = tree["state"], tree["ema"]
        print(f"Resumed consistency training from epoch {start_epoch}")

    mesh = cli.mesh_or_none()
    state = cli.put_replicated(state, mesh)
    ema = cli.put_replicated(ema, mesh)
    teacher = cli.put_replicated(teacher, mesh)
    # NOTE: the reference trainer never passes epoch/total_epochs, so alpha
    # stays fixed at 0.5 (train_consistency...py:103,129 — the progressive
    # ramp exists only at library level, consistency_controlnet_distilled.py:
    # 320-325). Pass total_epochs here to opt into the ramp.
    step = make_consistency_train_step(model, tx, mode=mode, total_epochs=None,
                                       compute_dtype=cli.compute_dtype_from(train_config))

    batch_size = train_config["batch_size"]
    for epoch_idx in range(start_epoch, num_epochs):
        timer = cli.EpochTimer()
        key, shuffle_key = jax.random.split(key)
        seed = int(jax.random.randint(shuffle_key, (), 0, 2**31 - 1))
        for images, hints in iterate_batches(dataset, batch_size, shuffle=True, seed=seed):
            key, step_key = jax.random.split(key)
            images = cli.put_batch(images, mesh)
            hints = cli.put_batch(hints, mesh)
            state, ema, metrics = step(state, ema, teacher, images, hints, step_key,
                                       jnp.int32(epoch_idx))
            timer.add(metrics.get("total_loss", metrics.get("consistency_loss")))
        print(f"Epoch {epoch_idx + 1} | {timer.summary()}")
        if cli.should_save_epoch(epoch_idx, num_epochs, train_config.get("ckpt_save_every_epochs", 1)):
            save_checkpoint_background(task_name, CKPT_NAME, epoch_idx + 1,
                                       {"state": state, "ema": ema},
                                       max_to_keep=cli.ckpt_max_to_keep(train_config))
    wait_for_checkpoints()
    print("Distillation training completed!")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Train Distilled Consistency ControlNet")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    train(parser.parse_args())
