"""4-way comparison: hints/original vs DDPM vs consistency vs DMD.

CLI parity with reference tools/compare_all_controlnet_models.py: same
flags, graceful per-model skip when a checkpoint is missing (:105-151),
summary grids + timing stats.  Timing excludes compilation (warmup run),
then wall-clocks `jax.block_until_ready`.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.data.datasets import iterate_batches
from controlnet_tpu.io.images import save_image_grid
from controlnet_tpu.models.consistency import ConsistencyDistilled
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.dmd import DistributionMatchingControlNet
from controlnet_tpu.sample.ddpm import make_ddpm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule
from tools.sample_consistency_controlnet_distilled import adapt_hint_channels
from tools.sample_consistency_controlnet_distilled import load_student as load_cons_student
from tools.sample_distribution_matching_controlnet_distilled import load_student as load_dmd_student
from tools.train_ddpm_controlnet import load_controlnet_params


def compare_models(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    diffusion_config = cfg.diffusion_params(config)
    dataset_config = cfg.dataset_params(config)
    model_config = cfg.model_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]
    im_channels = model_config["im_channels"]
    im_size = model_config["im_size"]
    n = args.num_samples
    T = args.ddpm_steps

    sched = make_linear_schedule(T, diffusion_config["beta_start"], diffusion_config["beta_end"])
    ds = cli.build_dataset(task_name, dataset_config, "test", return_hints=True)
    ims, hints = next(iterate_batches(ds, n, shuffle=True, seed=args.seed))
    hints_j = jnp.asarray(hints)
    shape = (n, im_size, im_size, im_channels)
    key = jax.random.PRNGKey(args.seed)

    results: dict[str, np.ndarray] = {}
    timings: dict[str, float] = {}

    # ---- DDPM ControlNet (multi-step) ----
    try:
        cn = ControlNet(im_channels, model_config, model_locked=True)
        cn_params = load_controlnet_params(task_name, train_config["controlnet_ckpt_name"], cn)
        hint_feats = jax.jit(cn.hint_features)(cn_params, hints_j)  # loop-invariant
        sampler = make_ddpm_sampler(lambda p, x, t, f: cn(p, x, t, hint_features=f),
                                    sched, shape, record_every=T)
        key, k = jax.random.split(key)
        jax.block_until_ready(sampler(cn_params, k, hint_feats)[0])  # warmup/compile
        t0 = time.time()
        x0, _ = sampler(cn_params, k, hint_feats)
        jax.block_until_ready(x0)
        timings["ddpm"] = time.time() - t0
        results["ddpm"] = np.asarray(x0)
        print(f"DDPM ControlNet: {timings['ddpm']:.3f}s for {n} samples ({T} steps)")
    except FileNotFoundError as e:
        print(f"Skipping DDPM ControlNet: {e}")

    # ---- Consistency (1-step) ----
    try:
        cons = ConsistencyDistilled(im_channels, model_config, use_ddpm_teacher=False)
        sp = load_cons_student(task_name, cons)
        gen = jax.jit(lambda sp, h, k: cons.generate({"student": sp}, h, shape, k, 1))
        key, k = jax.random.split(key)
        jax.block_until_ready(gen(sp, hints_j, k))
        t0 = time.time()
        x0 = gen(sp, hints_j, k)
        jax.block_until_ready(x0)
        timings["consistency"] = time.time() - t0
        results["consistency"] = np.asarray(x0)
        print(f"Consistency: {timings['consistency']:.3f}s for {n} samples (1 step)")
    except FileNotFoundError as e:
        print(f"Skipping consistency model: {e}")

    # ---- DMD (1-step) ----
    try:
        dmd = DistributionMatchingControlNet(im_channels, model_config)
        dp = load_dmd_student(task_name, dmd, use_best=False)

        @jax.jit
        def dmd_gen(p, h, k):
            x_t = jax.random.normal(k, shape)
            t = jnp.full((n,), T - 1, jnp.int32)
            return dmd(p, x_t, t, h)

        key, k = jax.random.split(key)
        jax.block_until_ready(dmd_gen(dp, hints_j, k))
        t0 = time.time()
        x0 = dmd_gen(dp, hints_j, k)
        jax.block_until_ready(x0)
        timings["dmd"] = time.time() - t0
        results["dmd"] = np.asarray(x0)
        print(f"DMD: {timings['dmd']:.3f}s for {n} samples (1 step)")
    except FileNotFoundError as e:
        print(f"Skipping DMD model: {e}")

    if not results:
        print("No model checkpoints found — nothing to compare")
        return

    out_dir = os.path.join(task_name, "all_model_comparison")
    os.makedirs(out_dir, exist_ok=True)
    names = list(results)
    for i in range(n):
        hv = adapt_hint_channels(hints[i:i+1], im_channels)
        row = [hv, (ims[i:i+1] + 1) / 2]
        row += [np.clip((results[m][i:i+1] + 1) / 2, 0, 1) for m in names]
        save_image_grid(np.concatenate(row),
                        os.path.join(out_dir, f"comparison_{i:03d}.png"), nrow=len(row))

    lines = ["ALL-MODEL COMPARISON", "=" * 60,
             f"Samples: {n} | DDPM steps: {T}"]
    for m in names:
        lines.append(f"{m}: {timings[m]:.4f}s total, {timings[m] / n:.4f}s/sample")
    if "ddpm" in timings:
        for m in names:
            if m != "ddpm":
                lines.append(f"speedup {m} vs ddpm: {timings['ddpm'] / timings[m]:.1f}x")
    print("\n".join(lines))
    with open(os.path.join(out_dir, "performance_metrics.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    np.save(os.path.join(out_dir, "timing_data.npy"), timings)
    print(f"Results saved to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Compare all ControlNet models")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--ddpm_steps", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    compare_models(parser.parse_args())
