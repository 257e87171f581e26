"""Sample from a trained unconditional DDPM.

CLI parity with reference tools/sample_ddpm.py:
    python -m tools.sample_ddpm --config config/mnist.yaml

The 1000-step ancestral loop runs entirely on device in one lax.scan
(reference saves a PNG per step from the host, sample_ddpm.py:27-42).  The
same artifacts are produced — <task_name>/samples/x0_<t>.png grids of the
clamped x_t at each recorded step — but written once at the end from the
on-device trajectory.  --save_every subsamples the trajectory (1 = exact
reference artifact parity).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.io.images import save_image_grid
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.schedules.linear import make_linear_schedule


def load_unet_params(task_name: str, ckpt_name: str, unet: UNet):
    """Restore UNet params from a train-state checkpoint (template-free raw
    restore: only the params subtree is needed, regardless of which
    optimizer the trainer used)."""
    from controlnet_tpu.io.checkpoint import restore_checkpoint_raw

    restored = restore_checkpoint_raw(task_name, ckpt_name)
    if restored is None:
        raise FileNotFoundError(
            f"no checkpoint for {ckpt_name} under {task_name}/ — train first"
        )
    tree, step = restored
    print(f"Loaded checkpoint at epoch {step}")
    return tree["params"]


def sample(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    diffusion_config = cfg.diffusion_params(config)
    model_config = cfg.model_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]

    sched = make_linear_schedule(
        diffusion_config["num_timesteps"],
        diffusion_config["beta_start"],
        diffusion_config["beta_end"],
    )
    unet = UNet(model_config["im_channels"], model_config)
    params = load_unet_params(task_name, train_config["ddpm_ckpt_name"], unet)

    num_samples = args.num_samples or train_config["num_samples"]
    nrow = train_config["num_grid_rows"]
    im_size = model_config["im_size"]
    # multi-chip: shard the sample batch over the data axis (padded up to
    # divisibility; outputs sliced back)
    mesh, batch = cli.sampler_mesh(num_samples)
    shape = (batch, im_size, im_size, model_config["im_channels"])

    T = sched.num_timesteps
    record_every = max(1, args.save_every)
    sampler, step_ts = cli.select_sampler(
        args, lambda p, x, t: unet(p, x, t), sched, shape, record_every, mesh=mesh)
    params = cli.put_replicated(params, mesh)
    x0, traj = sampler(params, jax.random.PRNGKey(args.seed))
    traj = np.asarray(jax.device_get(traj))[:, :num_samples]

    out_dir = os.path.join(task_name, "samples")
    os.makedirs(out_dir, exist_ok=True)
    for k in range(traj.shape[0]):
        t = cli.snapshot_timestep(k, step_ts, T, record_every)
        save_image_grid((traj[k] + 1.0) / 2.0, os.path.join(out_dir, f"x0_{t}.png"), nrow=nrow)
    print(f"Wrote {traj.shape[0]} step grids to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for ddpm image generation")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--save_every", type=int, default=1,
                        help="record every Nth denoising step (1 = reference parity)")
    parser.add_argument("--seed", type=int, default=0)
    cli.add_sampler_args(parser)
    sample(parser.parse_args())
