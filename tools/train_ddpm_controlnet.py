"""Fine-tune a canny-hint ControlNet on a trained DDPM.

CLI parity with reference tools/train_ddpm_controlnet.py:
    python -m tools.train_ddpm_controlnet --config config/mnist.yaml

Requires a trained DDPM checkpoint (ddpm_ckpt_name); both the frozen trunk
and the control copy start from it (reference controlnet.py:27-65).  Only
the control branch + hint block + zero convs are optimized
(train_ddpm_controlnet.py:76 via get_params); here that is structural — the
frozen tree is never differentiated.
"""

from __future__ import annotations

import argparse
import os

import jax
import optax

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.data.datasets import iterate_batches
from controlnet_tpu.io.checkpoint import (restore_checkpoint, save_checkpoint,  # noqa: F401
                                          save_checkpoint_background,
                                          wait_for_checkpoints)
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_controlnet_train_step
from controlnet_tpu.train.state import create_train_state
from tools.sample_ddpm import load_unet_params


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
    # Hint pipeline: host-side cv2 (exact reference behavior) or the
    # vectorized on-TPU canny fused into the input path (ops/canny.py).
    hint_backend = getattr(args, "hint_backend", "cv2")
    dataset = cli.build_dataset(task_name, dataset_config, "train",
                                return_hints=(hint_backend == "cv2"))

    cn = ControlNet(model_config["im_channels"], model_config, model_locked=True)
    key = jax.random.PRNGKey(train_config.get("seed", 0))
    key, init_key = jax.random.split(key)

    # Base DDPM weights seed both trunks (controlnet.py:27-65).
    unet = UNet(model_config["im_channels"], model_config)
    trained_params = load_unet_params(task_name, train_config["ddpm_ckpt_name"], unet)
    cn_params = cn.init(init_key, trained_unet_params=trained_params)
    trainable, frozen = cn.split_params(cn_params)

    tx = optax.adam(train_config["controlnet_lr"])
    state = create_train_state(trainable, tx)

    ckpt_name = train_config["controlnet_ckpt_name"]
    restored = restore_checkpoint(task_name, ckpt_name, {"state": state, "frozen": frozen})
    start_epoch = 0
    if restored is not None:
        tree, start_epoch = restored
        state, frozen = tree["state"], tree["frozen"]
        print(f"Resumed ControlNet from epoch {start_epoch}")

    mesh = cli.mesh_or_none()
    state = cli.put_replicated(state, mesh)
    frozen = cli.put_replicated(frozen, mesh)
    # additive key: cfg_drop_prob > 0 trains the null (zero-hint) condition
    # for classifier-free guidance at sampling time (--cfg_scale); default
    # 0.0 = reference parity (SURVEY.md component #19: drops never wired).
    step = make_controlnet_train_step(cn, sched, tx,
                                      compute_dtype=cli.compute_dtype_from(train_config),
                                      cfg_drop_prob=float(train_config.get("cfg_drop_prob", 0.0)))

    if hint_backend == "tpu":
        from controlnet_tpu.ops.canny import canny_hints

        device_hints = jax.jit(lambda im: canny_hints((im + 1.0) / 2.0))

    num_epochs = train_config["controlnet_epochs"]
    batch_size = train_config["batch_size"]
    for epoch_idx in range(start_epoch, num_epochs):
        timer = cli.EpochTimer()
        key, shuffle_key = jax.random.split(key)
        seed = int(jax.random.randint(shuffle_key, (), 0, 2**31 - 1))
        for batch in iterate_batches(dataset, batch_size, shuffle=True, seed=seed):
            key, step_key = jax.random.split(key)
            if hint_backend == "tpu":
                images = cli.put_batch(batch, mesh)
                hints = device_hints(images)
            else:
                images, hints = batch
                images = cli.put_batch(images, mesh)
                hints = cli.put_batch(hints, mesh)
            state, loss = step(state, frozen, images, hints, step_key)
            timer.add(loss)
        print(f"Finished epoch:{epoch_idx + 1} | {timer.summary()}")
        if cli.should_save_epoch(epoch_idx, num_epochs, train_config.get("ckpt_save_every_epochs", 1)):
            save_checkpoint_background(task_name, ckpt_name, epoch_idx + 1,
                                       {"state": state, "frozen": frozen},
                                       max_to_keep=cli.ckpt_max_to_keep(train_config))
    wait_for_checkpoints()
    print("Done Training ...")


def load_controlnet_params(task_name: str, ckpt_name: str, cn: ControlNet,
                           fallback_unet_ckpt: str | None = None):
    """Restore full ControlNet params from a ControlNet train checkpoint.

    Mirrors the reference's prefix-aware loading (controlnet.py:31-138):
    accepts a ControlNet checkpoint (template-free raw restore, so any
    trainer optimizer works), or falls back to seeding from a raw DDPM
    checkpoint when only that exists."""
    from controlnet_tpu.io.checkpoint import restore_checkpoint_raw

    restored = restore_checkpoint_raw(task_name, ckpt_name)
    if restored is not None:
        tree, step = restored
        print(f"Loaded ControlNet checkpoint at epoch {step}")
        return cn.merge_params(tree["state"]["params"], tree["frozen"])
    if fallback_unet_ckpt is not None:
        unet = cn.unet
        params = load_unet_params(task_name, fallback_unet_ckpt, unet)
        print("ControlNet checkpoint missing; seeded from DDPM checkpoint")
        return cn.init(jax.random.PRNGKey(0), trained_unet_params=params)
    raise FileNotFoundError(f"no ControlNet checkpoint {ckpt_name} under {task_name}/")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for ddpm controlnet training")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    parser.add_argument("--hint_backend", choices=["cv2", "tpu"], default="cv2",
                        help="cv2: host-side canny (exact reference parity); "
                             "tpu: vectorized on-device canny (ops/canny.py)")
    train(parser.parse_args())
