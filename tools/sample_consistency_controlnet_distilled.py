"""Single-step sampling from the consistency-distilled ControlNet.

CLI parity with reference tools/sample_consistency_controlnet_distilled.py
(same --mode choices and artifacts):
  * random: gaussian-noise hints, 1-step generate, per-sample sample+hint
    PNGs (:71-110)
  * test:   test-set hints, hint/original/sample comparison rows (:114-182)
  * custom: geometric hints — lines/cross/circle/random (:185-253)

Generation is batched on device (the reference loops one sample at a
time); hint channel adaptation for visualization matches :95-110.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.data.datasets import iterate_batches
from controlnet_tpu.io.images import save_image_grid
from controlnet_tpu.models.consistency import ConsistencyDistilled
from tools.train_consistency_controlnet_distilled import CKPT_NAME


def adapt_hint_channels(hint: np.ndarray, im_channels: int) -> np.ndarray:
    """Match hint channels to image channels for visualization
    (reference :95-110)."""
    hc = hint.shape[-1]
    if hc == 1 and im_channels == 3:
        return np.repeat(hint, 3, axis=-1)
    if hc == 3 and im_channels == 1:
        return hint.mean(axis=-1, keepdims=True)
    if hc != im_channels:
        first = hint[..., :1]
        return np.repeat(first, im_channels, axis=-1) if im_channels > 1 else first
    return hint


def create_custom_hints(model_config: dict, num_samples: int) -> np.ndarray:
    """Geometric hints: h-lines / v-lines / cross / ring / random
    (reference create_custom_hints :224-253)."""
    size = model_config["im_size"]
    hc = model_config["hint_channels"]
    hints = np.zeros((num_samples, size, size, hc), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    c = size // 2
    rng = np.random.default_rng(0)
    for i in range(num_samples):
        k = i % 5
        if k == 0:
            hints[i, 8:12, :, :] = 1.0
        elif k == 1:
            hints[i, :, 8:12, :] = 1.0
        elif k == 2:
            hints[i, 8:12, :, :] = 1.0
            hints[i, :, 8:12, :] = 1.0
        elif k == 3:
            dist = np.sqrt((xx - c) ** 2 + (yy - c) ** 2)
            hints[i][(dist >= 8) & (dist <= 12)] = 1.0
        else:
            hints[i] = rng.random((size, size, hc))
    return hints


def load_student(task_name: str, model: ConsistencyDistilled):
    from controlnet_tpu.io.checkpoint import restore_checkpoint_raw

    restored = restore_checkpoint_raw(task_name, CKPT_NAME)
    if restored is None:
        raise FileNotFoundError(
            f"Student checkpoint not found under {task_name}/{CKPT_NAME}")
    tree, step = restored
    print(f"Loaded consistency student at epoch {step}")
    return tree["state"]["params"]


def sample(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    dataset_config = cfg.dataset_params(config)
    model_config = cfg.model_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]
    im_channels = model_config["im_channels"]
    im_size = model_config["im_size"]

    model = ConsistencyDistilled(im_channels, model_config, use_ddpm_teacher=False)
    student_params = load_student(task_name, model)

    out_dir = os.path.join(task_name, "consistency_samples")
    os.makedirs(out_dir, exist_ok=True)
    n = args.num_samples
    key = jax.random.PRNGKey(args.seed)

    generate = jax.jit(
        lambda sp, hint, key: model.generate({"student": sp}, hint,
                                             (hint.shape[0], im_size, im_size, im_channels),
                                             key, num_steps=args.num_steps)
    )

    if args.mode == "random":
        key, kh, kg = jax.random.split(key, 3)
        hints = jax.random.normal(kh, (n, im_size, im_size, model_config["hint_channels"]))
        x0 = np.asarray(generate(student_params, hints, kg))
        hints = np.asarray(hints)
        for i in range(n):
            save_image_grid(np.clip((x0[i:i+1] + 1) / 2, 0, 1),
                            os.path.join(out_dir, f"random_sample_{i:03d}.png"), nrow=1)
            hv = adapt_hint_channels(np.clip((hints[i:i+1] + 1) / 2, 0, 1), im_channels)
            save_image_grid(hv, os.path.join(out_dir, f"random_hint_{i:03d}.png"), nrow=1)
    elif args.mode == "test":
        ds = cli.build_dataset(task_name, dataset_config, "test", return_hints=True)
        batch = next(iterate_batches(ds, min(n, len(ds)), shuffle=True, seed=args.seed))
        ims, hints = batch
        key, kg = jax.random.split(key)
        x0 = np.asarray(generate(student_params, jnp.asarray(hints), kg))
        for i in range(ims.shape[0]):
            hv = adapt_hint_channels(hints[i:i+1], im_channels)
            row = np.concatenate([hv, (ims[i:i+1] + 1) / 2,
                                  np.clip((x0[i:i+1] + 1) / 2, 0, 1)])
            save_image_grid(row, os.path.join(out_dir, f"test_comparison_{i:03d}.png"), nrow=3)
    elif args.mode == "custom":
        hints = create_custom_hints(model_config, n)
        key, kg = jax.random.split(key)
        x0 = np.asarray(generate(student_params, jnp.asarray(hints), kg))
        for i in range(n):
            save_image_grid(np.clip((x0[i:i+1] + 1) / 2, 0, 1),
                            os.path.join(out_dir, f"custom_sample_{i:03d}.png"), nrow=1)
            hv = adapt_hint_channels(hints[i:i+1], im_channels)
            save_image_grid(hv, os.path.join(out_dir, f"custom_hint_{i:03d}.png"), nrow=1)
    print("Inference completed!")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Sample from Distilled Consistency ControlNet")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    parser.add_argument("--mode", choices=["random", "test", "custom"], default="test")
    parser.add_argument("--num_samples", type=int, default=10)
    parser.add_argument("--num_steps", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    sample(parser.parse_args())
