"""Sample from the trained CelebA-HQ latent diffusion model.

CLI parity with reference tools/sample_ldm_vae.py: the 1000-step loop runs
in latent space; the VAE decodes only the final x0 (reference decodes at
t==0, sample_ldm_vae.py:40-44).  Per-step latent grids (channel-0
visualizations) and the final decoded image grid are written at the end
from the on-device trajectory.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.io.images import save_image_grid
from controlnet_tpu.models.unet import UNet
from controlnet_tpu.models.vae import VAE
from controlnet_tpu.sample.ddpm import make_ldm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule
from tools.infer_vae import load_vae_params


def latent_size(dataset_config: dict, autoencoder_config: dict) -> int:
    n_down = sum(bool(d) for d in autoencoder_config["down_sample"])
    return dataset_config["im_size"] // (2**n_down)


def load_ldm_params(task_name: str, ckpt_name: str, unet: UNet):
    from controlnet_tpu.io.checkpoint import restore_checkpoint_raw

    restored = restore_checkpoint_raw(task_name, ckpt_name)
    if restored is None:
        raise FileNotFoundError("LDM checkpoint not found — run tools.train_ldm_vae first")
    tree, step = restored
    print(f"Loaded LDM checkpoint at epoch {step}")
    return tree["params"]


def sample(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    diffusion_config = cfg.diffusion_params(config)
    dataset_config = cfg.dataset_params(config)
    ldm_config = cfg.ldm_params(config)
    autoencoder_config = cfg.autoencoder_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]
    z = autoencoder_config["z_channels"]

    sched = make_linear_schedule(
        diffusion_config["num_timesteps"], diffusion_config["beta_start"],
        diffusion_config["beta_end"], ldm_scheduler=True,
    )
    unet = UNet(z, ldm_config)
    unet_params = load_ldm_params(task_name, train_config["ldm_ckpt_name"], unet)
    vae = VAE(dataset_config["im_channels"], autoencoder_config)
    vae_params = load_vae_params(task_name, train_config)

    num_samples = args.num_samples or train_config["num_samples"]
    nrow = train_config["num_grid_rows"]
    lsize = latent_size(dataset_config, autoencoder_config)
    mesh, batch = cli.sampler_mesh(num_samples)
    shape = (batch, lsize, lsize, z)

    record_every = max(1, args.save_every)
    unet_params = cli.put_replicated(unet_params, mesh)
    vae_params = cli.put_replicated(vae_params, mesh)
    # getattr: in-process callers (tests, scripts) pass SimpleNamespaces
    # predating the ddim flags
    ddim = getattr(args, "sampler", "ancestral") != "ancestral"
    sampler = make_ldm_sampler(
        lambda p, x, t: unet(p, x, t), lambda p, zz: vae.decode(p, zz),
        sched, shape, record_every=record_every, mesh=mesh,
        ddim_steps=args.sampler_steps if ddim else None,
        eta=args.eta if ddim else 0.0,
        solver=args.sampler if ddim else "ddim",
    )
    step_ts = sampler.timesteps  # None in ancestral mode
    images, traj = sampler(unet_params, vae_params, jax.random.PRNGKey(args.seed))
    images = np.asarray(jax.device_get(images))[:num_samples]
    traj = np.asarray(jax.device_get(traj))[:, :num_samples]

    out_dir = os.path.join(task_name, "samples")
    os.makedirs(out_dir, exist_ok=True)
    T = sched.num_timesteps
    for k in range(traj.shape[0]):
        t = cli.snapshot_timestep(k, step_ts, T, record_every)
        # latent channel-0 visualization, normalized like the reference's
        # clamped latent grids
        save_image_grid((traj[k][..., :1] + 1.0) / 2.0,
                        os.path.join(out_dir, f"x0_{t}.png"), nrow=nrow)
    save_image_grid((images + 1.0) / 2.0, os.path.join(out_dir, "final_decoded.png"), nrow=nrow)
    print(f"Wrote {traj.shape[0]} latent grids + decoded grid to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for ldm image generation")
    parser.add_argument("--config", dest="config_path", default="config/celebhq.yaml", type=str)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--save_every", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    cli.add_sampler_args(parser)
    sample(parser.parse_args())
