"""Single-step sampling from the DMD-distilled ControlNet.

CLI parity with reference
tools/sample_distribution_matching_controlnet_distilled.py: x_T ~ N(0,1),
t = T-1, one student forward (:94-102).  Modes:
  * test:   test-set hints, hint/sample/original comparison rows
  * random: gaussian hints, hint/sample pairs
  * custom: geometric hints — stripes / vertical / diagonal / disk
    (create_geometric_hints :170-207)
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
from controlnet_tpu.models.dmd import DistributionMatchingControlNet
from tools.sample_consistency_controlnet_distilled import adapt_hint_channels
from tools.train_distribution_matching_controlnet_distilled import BEST_CKPT_NAME, CKPT_NAME


def create_geometric_hints(num_samples: int, model_config: dict) -> np.ndarray:
    size = model_config["im_size"]
    hc = model_config["hint_channels"]
    hints = np.zeros((num_samples, size, size, hc), np.float32)
    yy, xx = np.mgrid[0:size, 0:size]
    c, r = size // 2, size // 4
    for i in range(num_samples):
        k = i % 4
        if k == 0:
            hints[i, ::4, :, :] = 1.0  # horizontal stripes
        elif k == 1:
            hints[i, :, ::4, :] = 1.0  # vertical stripes
        elif k == 2:
            hints[i][yy == xx] = 1.0  # diagonal
        else:
            hints[i][(xx - c) ** 2 + (yy - c) ** 2 <= r * r] = 1.0  # disk
    return hints


def load_student(task_name: str, student: DistributionMatchingControlNet, use_best: bool):
    from controlnet_tpu.io.checkpoint import restore_checkpoint_raw

    name = BEST_CKPT_NAME if use_best else CKPT_NAME
    restored = restore_checkpoint_raw(task_name, name)
    if restored is None and use_best:
        restored = restore_checkpoint_raw(task_name, CKPT_NAME)
    if restored is None:
        raise FileNotFoundError(f"DMD student checkpoint not found under {task_name}/")
    tree, step = restored
    print(f"Loaded DMD student at epoch {step}")
    return tree["state"]["params"]


def sample(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    diffusion_config = cfg.diffusion_params(config)
    dataset_config = cfg.dataset_params(config)
    model_config = cfg.model_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]
    im_channels = model_config["im_channels"]
    im_size = model_config["im_size"]
    T = diffusion_config["num_timesteps"]

    student = DistributionMatchingControlNet(im_channels, model_config)
    params = load_student(task_name, student, args.best)

    out_dir = os.path.join(task_name, "distribution_matching_samples")
    os.makedirs(out_dir, exist_ok=True)
    n = args.num_samples
    key = jax.random.PRNGKey(args.seed)

    @jax.jit
    def one_step(p, hint, key):
        b = hint.shape[0]
        x_t = jax.random.normal(key, (b, im_size, im_size, im_channels))
        t = jnp.full((b,), T - 1, jnp.int32)
        return student(p, x_t, t, hint)

    if args.mode == "test":
        ds = cli.build_dataset(task_name, dataset_config, "test", return_hints=True)
        ims, hints = next(iterate_batches(ds, min(n, len(ds)), shuffle=True, seed=args.seed))
        key, kg = jax.random.split(key)
        x0 = np.asarray(one_step(params, jnp.asarray(hints), kg))
        for i in range(ims.shape[0]):
            hv = adapt_hint_channels(hints[i:i+1], im_channels)
            row = np.concatenate([hv, np.clip((x0[i:i+1] + 1) / 2, 0, 1), (ims[i:i+1] + 1) / 2])
            save_image_grid(row, os.path.join(out_dir, f"test_comparison_{i:03d}.png"), nrow=3)
    elif args.mode == "random":
        key, kh, kg = jax.random.split(key, 3)
        hints = jax.random.normal(kh, (n, im_size, im_size, model_config["hint_channels"]))
        x0 = np.asarray(one_step(params, hints, kg))
        hints = np.asarray(hints)
        for i in range(n):
            hv = adapt_hint_channels(np.clip((hints[i:i+1] + 1) / 2, 0, 1), im_channels)
            row = np.concatenate([hv, np.clip((x0[i:i+1] + 1) / 2, 0, 1)])
            save_image_grid(row, os.path.join(out_dir, f"random_sample_{i:03d}.png"), nrow=2)
    elif args.mode == "custom":
        hints = create_geometric_hints(n, model_config)
        key, kg = jax.random.split(key)
        x0 = np.asarray(one_step(params, jnp.asarray(hints), kg))
        for i in range(n):
            hv = adapt_hint_channels(hints[i:i+1], im_channels)
            row = np.concatenate([hv, np.clip((x0[i:i+1] + 1) / 2, 0, 1)])
            save_image_grid(row, os.path.join(out_dir, f"custom_sample_{i:03d}.png"), nrow=2)
    print("Inference completed!")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Sample from Distilled Distribution Matching ControlNet")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    parser.add_argument("--mode", choices=["test", "random", "custom"], default="test", type=str)
    parser.add_argument("--num_samples", default=10, type=int)
    parser.add_argument("--best", action="store_true", help="load the best-val checkpoint")
    parser.add_argument("--seed", type=int, default=0)
    sample(parser.parse_args())
