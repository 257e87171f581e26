"""Compare DDPM ControlNet (multi-step) vs consistency-distilled (1-step).

CLI parity with reference tools/compare_controlnet_models.py: same flags
(--config, --num_samples, --ddpm_steps), same artifacts — per-sample
comparison grids, performance_metrics.txt, timing_data.npy (:239-297).

Timing methodology (TPU-correct): one warmup call to exclude compilation,
then wall-clock around `jax.block_until_ready`.  The DDPM path runs its
whole denoising loop on device in one lax.scan, so "per-sample time" is
batch time / batch size.
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
from controlnet_tpu.sample.ddpm import make_ddpm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule
from tools.sample_consistency_controlnet_distilled import adapt_hint_channels, load_student
from tools.train_ddpm_controlnet import load_controlnet_params


def timed(fn, *args) -> tuple[float, object]:
    t0 = time.time()
    out = jax.block_until_ready(fn(*args))
    return time.time() - t0, out


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

    # Models
    cn = ControlNet(im_channels, model_config, model_locked=True)
    cn_params = load_controlnet_params(task_name, train_config["controlnet_ckpt_name"], cn)
    cons = ConsistencyDistilled(im_channels, model_config, use_ddpm_teacher=False)
    student_params = load_student(task_name, cons)

    # Hints from test data
    ds = cli.build_dataset(task_name, dataset_config, "test", return_hints=True)
    ims, hints = next(iterate_batches(ds, n, shuffle=True, seed=args.seed))
    hints_j = jnp.asarray(hints)

    shape = (n, im_size, im_size, im_channels)
    hint_feats = jax.jit(cn.hint_features)(cn_params, hints_j)  # loop-invariant
    ddpm_sampler = make_ddpm_sampler(lambda p, x, t, f: cn(p, x, t, hint_features=f),
                                     sched, shape, record_every=T)
    cons_generate = jax.jit(lambda sp, h, k: cons.generate({"student": sp}, h, shape, k, 1))

    key = jax.random.PRNGKey(args.seed)
    k1, k2 = jax.random.split(key)

    # Warmup (compile) then timed runs
    jax.block_until_ready(ddpm_sampler(cn_params, k1, hint_feats)[0])
    ddpm_time, (ddpm_x0, _) = timed(lambda: ddpm_sampler(cn_params, k1, hint_feats))
    jax.block_until_ready(cons_generate(student_params, hints_j, k2))
    cons_time, cons_x0 = timed(lambda: cons_generate(student_params, hints_j, k2))

    ddpm_x0 = np.asarray(ddpm_x0)
    cons_x0 = np.asarray(cons_x0)

    out_dir = os.path.join(task_name, "model_comparison")
    os.makedirs(out_dir, exist_ok=True)
    for i in range(n):
        hv = adapt_hint_channels(hints[i:i+1], im_channels)
        row = np.concatenate([
            hv, (ims[i:i+1] + 1) / 2,
            np.clip((ddpm_x0[i:i+1] + 1) / 2, 0, 1),
            np.clip((cons_x0[i:i+1] + 1) / 2, 0, 1),
        ])
        save_image_grid(row, os.path.join(out_dir, f"comparison_{i:03d}.png"), nrow=4)

    # ----- metrics (print_performance_metrics/save_metrics :239-297) -----
    ddpm_avg = ddpm_time / n
    cons_avg = cons_time / n
    speedup = ddpm_avg / cons_avg if cons_avg > 0 else float("inf")
    lines = [
        "PERFORMANCE COMPARISON: DDPM vs CONSISTENCY MODEL",
        "=" * 60,
        f"Samples generated: {n}",
        f"DDPM steps: {T}   Consistency steps: 1",
        f"DDPM total time: {ddpm_time:.4f}s  ({ddpm_avg:.4f}s/sample)",
        f"Consistency total time: {cons_time:.4f}s  ({cons_avg:.4f}s/sample)",
        f"Speedup: {speedup:.1f}x",
        f"Theoretical speedup (steps ratio): {T:.0f}x",
    ]
    print("\n".join(lines))
    with open(os.path.join(out_dir, "performance_metrics.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    np.save(os.path.join(out_dir, "timing_data.npy"),
            {"ddpm_times": [ddpm_avg] * n, "consistency_times": [cons_avg] * n,
             "ddpm_total": ddpm_time, "consistency_total": cons_time,
             "speedup": speedup})
    print(f"Results saved to {out_dir}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Compare ControlNet models")
    parser.add_argument("--config", dest="config_path", default="config/mnist.yaml", type=str)
    parser.add_argument("--num_samples", type=int, default=5)
    parser.add_argument("--ddpm_steps", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    compare_models(parser.parse_args())
