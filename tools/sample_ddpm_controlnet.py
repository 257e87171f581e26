"""Sample from a trained DDPM ControlNet with canny hints from the test set.

CLI parity with reference tools/sample_ddpm_controlnet.py: hints are taken
from random test-set images (:32-41; the reference's inclusive-randint
off-by-one at :34 is fixed here), the hint grid is saved alongside the
per-step x_t grids, and the denoising loop runs on device.
"""

from __future__ import annotations

import argparse
import os
import random

import jax
import numpy as np

from controlnet_tpu import cli, config as cfg, tuning
from controlnet_tpu.io.images import save_image_grid
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.schedules.linear import make_linear_schedule
from tools.train_ddpm_controlnet import load_controlnet_params


def gather_test_hints(dataset, num_samples: int, seed: int = 0) -> np.ndarray:
    rng = random.Random(seed)
    idxs = [rng.randint(0, len(dataset) - 1) for _ in range(num_samples)]
    return np.stack([dataset[i][1] for i in idxs])


def sample(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
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
    cn = ControlNet(model_config["im_channels"], model_config, model_locked=True)
    params = load_controlnet_params(task_name, train_config["controlnet_ckpt_name"], cn,
                                    fallback_unet_ckpt=train_config["ddpm_ckpt_name"])

    num_samples = args.num_samples or train_config["num_samples"]
    nrow = train_config["num_grid_rows"]
    im_size = model_config["im_size"]
    mesh, batch = cli.sampler_mesh(num_samples)
    shape = (batch, im_size, im_size, model_config["im_channels"])

    test_ds = cli.build_dataset(task_name, dataset_config, "test", return_hints=True)
    hints = gather_test_hints(test_ds, num_samples, args.seed)

    out_dir = os.path.join(task_name, "hint_samples")
    os.makedirs(out_dir, exist_ok=True)
    save_image_grid(hints, os.path.join(out_dir, "hints.png"), nrow=nrow)

    record_every = max(1, args.save_every)
    if batch != num_samples:  # pad hints for data-parallel divisibility
        hints_in = np.concatenate(
            [hints, np.repeat(hints[-1:], batch - num_samples, axis=0)])
    else:
        hints_in = hints
    params = cli.put_replicated(params, mesh)
    # Hint features are loop-invariant: encode once, reuse for all T steps.
    hint_feats = jax.jit(cn.hint_features)(params, jax.numpy.asarray(hints_in))
    # tpu_params.forward=paired (or CONTROLNET_TPU_FORWARD=paired): dual-trunk
    # attention batching (see tools/sample_ldm_controlnet.py) — same math,
    # scheduling only.
    fwd = cn.forward_paired if tuning.get("forward") == "paired" else cn
    eps_fn = lambda p, x, t, f: fwd(p, x, t, hint_features=f)
    # --cfg_scale: guided sampling over a (cond, null) hint-feature pair;
    # the null branch is the zero hint (drop_image_condition's null),
    # encoded once at batch 1 and tiled (sample/cfg.py).
    from controlnet_tpu.sample.cfg import null_hint_features
    eps_fn, hint_arg = cli.apply_cfg(
        args, eps_fn, hint_feats,
        lambda: null_hint_features(jax.jit(cn.hint_features), params,
                                   hints_in.shape[1:], batch))
    sampler, step_ts = cli.select_sampler(
        args, eps_fn, sched, shape, record_every, mesh=mesh)
    x0, traj = sampler(params, jax.random.PRNGKey(args.seed), hint_arg)
    traj = np.asarray(jax.device_get(traj))[:, :num_samples]
    T = sched.num_timesteps
    for k in range(traj.shape[0]):
        t = cli.snapshot_timestep(k, step_ts, T, record_every)
        save_image_grid((traj[k] + 1.0) / 2.0, os.path.join(out_dir, f"x0_{t}.png"), nrow=nrow)
    print(f"Wrote hint grid + {traj.shape[0]} step grids to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for ddpm controlnet image generation")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--save_every", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    cli.add_sampler_args(parser)
    cli.add_cfg_args(parser)
    sample(parser.parse_args())
