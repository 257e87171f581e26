"""Sample from the trained CelebA-HQ LDM ControlNet with full-res canny hints.

CLI parity with reference tools/sample_ldm_controlnet.py: hints are canny
edges of random full-resolution test images (hint resolution decoupled from
latent resolution); the latent denoising loop + final VAE decode run on
device; hint grid, per-step latent grids and the decoded grid are written
at the end.
"""

from __future__ import annotations

import argparse
import os
import random

import jax
import numpy as np

from controlnet_tpu import cli, config as cfg, tuning
from controlnet_tpu.data.datasets import CelebDataset
from controlnet_tpu.io.images import save_image_grid
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.vae import VAE
from controlnet_tpu.sample.ddpm import make_ldm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule
from tools.infer_vae import load_vae_params
from tools.sample_ldm_vae import latent_size
from tools.train_ddpm_controlnet import load_controlnet_params


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
    lsize = latent_size(dataset_config, autoencoder_config)
    down_sample_factor = dataset_config["canny_im_size"] // lsize
    cn = ControlNet(z, ldm_config, model_locked=True, down_sample_factor=down_sample_factor)
    params = load_controlnet_params(task_name, train_config["controlnet_ckpt_name"], cn)
    vae = VAE(dataset_config["im_channels"], autoencoder_config)
    vae_params = load_vae_params(task_name, train_config)

    dataset = CelebDataset(
        "test", im_path=dataset_config["im_path"], im_size=dataset_config["im_size"],
        im_channels=dataset_config["im_channels"], return_hint=True,
        canny_im_size=dataset_config["canny_im_size"],
    )
    num_samples = args.num_samples or train_config["num_samples"]
    nrow = train_config["num_grid_rows"]
    rng = random.Random(args.seed)
    idxs = [rng.randint(0, len(dataset) - 1) for _ in range(num_samples)]
    hints = np.stack([dataset[i][1] for i in idxs])

    out_dir = os.path.join(task_name, "hint_samples")
    os.makedirs(out_dir, exist_ok=True)
    save_image_grid(hints, os.path.join(out_dir, "hints.png"), nrow=nrow)

    mesh, batch = cli.sampler_mesh(num_samples)
    shape = (batch, lsize, lsize, z)
    record_every = max(1, args.save_every)
    if batch != num_samples:  # pad hints for data-parallel divisibility
        hints_in = np.concatenate(
            [hints, np.repeat(hints[-1:], batch - num_samples, axis=0)])
    else:
        hints_in = hints
    params = cli.put_replicated(params, mesh)
    vae_params = cli.put_replicated(vae_params, mesh)
    # Encode the full-res hint ONCE (loop-invariant across the 1000 steps —
    # this is the 1024^2 strided conv stack, controlnet_ldm.py:45-79).
    # Chunked over the batch: the encoder's working set is batch-linear and
    # exceeds one chip's HBM at compile time by batch 64 at 1024^2
    # (docs/artifacts/tpu_batch_sweep_r4.json); <=16 is a single call.
    hint_feats = cn.hint_features_chunked(params, jax.numpy.asarray(hints_in))
    # tpu_params.forward=paired (or CONTROLNET_TPU_FORWARD=paired):
    # dual-trunk forward with each layer's two attention cores batched into
    # one kernel call (forward_paired) — same math, scheduling only (see
    # scripts/tpu_paired_attn_ab.py).
    fwd = cn.forward_paired if tuning.get("forward") == "paired" else cn
    # getattr: in-process callers (tests, scripts) pass SimpleNamespaces
    # predating the ddim flags
    ddim = getattr(args, "sampler", "ancestral") != "ancestral"
    eps_fn = lambda p, x, t, f: fwd(p, x, t, hint_features=f)
    # --cfg_scale: guided latent sampling over a (cond, null) hint-feature
    # pair; the null branch (zero full-res hint) is encoded once at batch 1
    # and tiled — skips batch-1 extra runs of the 1024^2 conv stack.
    from controlnet_tpu.sample.cfg import null_hint_features
    eps_fn, hint_arg = cli.apply_cfg(
        args, eps_fn, hint_feats,
        lambda: null_hint_features(jax.jit(cn.hint_features), params,
                                   hints_in.shape[1:], batch))
    sampler = make_ldm_sampler(
        eps_fn, lambda p, zz: vae.decode(p, zz),
        sched, shape, record_every=record_every, mesh=mesh,
        ddim_steps=args.sampler_steps if ddim else None,
        eta=args.eta if ddim else 0.0,
        solver=args.sampler if ddim else "ddim",
    )
    step_ts = sampler.timesteps  # None in ancestral mode
    images, traj = sampler(params, vae_params, jax.random.PRNGKey(args.seed), hint_arg)
    images = np.asarray(jax.device_get(images))[:num_samples]
    traj = np.asarray(jax.device_get(traj))[:, :num_samples]

    T = sched.num_timesteps
    for k in range(traj.shape[0]):
        t = cli.snapshot_timestep(k, step_ts, T, record_every)
        save_image_grid((traj[k][..., :1] + 1.0) / 2.0,
                        os.path.join(out_dir, f"x0_{t}.png"), nrow=nrow)
    save_image_grid((images + 1.0) / 2.0, os.path.join(out_dir, "final_decoded.png"), nrow=nrow)
    print(f"Wrote hint grid + {traj.shape[0]} latent grids + decoded grid to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Arguments for ldm controlnet image generation")
    parser.add_argument("--config", dest="config_path", default="config/celebhq.yaml", type=str)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--save_every", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    cli.add_sampler_args(parser)
    cli.add_cfg_args(parser)
    sample(parser.parse_args())
