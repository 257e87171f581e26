"""Benchmark: MNIST DDPM 1000-step on-device ancestral sampling throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

* value: samples/sec/chip for the flagship pipeline — batch of 64 MNIST
  28x28 images through the full 1000-step denoising loop (one lax.scan on
  device, compile excluded via warmup).
* vs_baseline: ratio against the PyTorch reference's sampler on the same
  host (reference architecture re-timed via torch on CPU here — the only
  hardware the reference can run on in this environment; per-step model
  time extrapolated from a short run, per tools/compare_* methodology).
  If torch or the reference timing fails, falls back to null.
* extras (same JSON line): the BASELINE north-star config — CelebHQ LDM
  ControlNet 1000-step sampling samples/sec/chip and ms/step (batch 4,
  1024^2 hints hoisted, bf16).  Skipped cleanly (key absent) if it cannot
  run; set BENCH_SKIP_NORTH_STAR=1 to disable explicitly.
"""

from __future__ import annotations

import json
import os
import sys
import time

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_parallel_codegen_split_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_cpu_parallel_codegen_split_count=1").strip()

# Batch 64 is the measured per-chip throughput optimum for this pipeline:
# the round-5 sweep over 16..512 (docs/artifacts/tpu_mnist_batch_sweep_r5.json)
# is unimodal with the peak at 64 (14.48 samples/s/chip; 48 -> 14.18,
# 128 -> 13.68, 512 -> 10.47), so the headline batch needs no throughput leg.
BATCH = int(os.environ.get("BENCH_BATCH", "64"))
STEPS = int(os.environ.get("BENCH_STEPS", "1000"))


def bench_ours() -> float:
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.expanduser("~"), ".cache", "controlnet_tpu_xla"),
        )
    except Exception:
        pass

    from controlnet_tpu.models.unet import UNet
    from controlnet_tpu.sample.ddpm import make_ddpm_sampler
    from controlnet_tpu.schedules.linear import make_linear_schedule

    model_config = dict(
        im_channels=1, im_size=28, hint_channels=3,
        down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
        down_sample=[True, True, False], time_emb_dim=128,
        num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4,
    )
    sched = make_linear_schedule(STEPS, 1e-4, 0.02)
    unet = UNet(1, model_config)
    params = unet.init(jax.random.PRNGKey(0))
    shape = (BATCH, 28, 28, 1)
    dtype = jnp.bfloat16 if os.environ.get("BENCH_BF16") == "1" else None
    sampler = make_ddpm_sampler(lambda p, x, t: unet(p, x, t), sched, shape,
                                record_every=STEPS, compute_dtype=dtype,
                                unroll=2)

    # warmup / compile
    jax.block_until_ready(sampler(params, jax.random.PRNGKey(1))[0])
    t0 = time.time()
    x0, _ = sampler(params, jax.random.PRNGKey(2))
    jax.block_until_ready(x0)
    dt = time.time() - t0
    return BATCH / dt


def bench_ddim() -> dict | None:
    """Few-step DDIM leg (additive, round 5): the SAME flagship MNIST UNet
    sampled with the 50-step DDIM loop (sample/ddim.py) instead of the
    1000-step ancestral scan — the serving-oriented few-step capability.
    Additive extras keys; failure must not disturb the primary metric."""
    try:
        import jax

        from controlnet_tpu.models.unet import UNet
        from controlnet_tpu.sample.ddim import make_ddim_sampler
        from controlnet_tpu.schedules.linear import make_linear_schedule

        steps = int(os.environ.get("BENCH_DDIM_STEPS", "50"))
        model_config = dict(
            im_channels=1, im_size=28, hint_channels=3,
            down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
            down_sample=[True, True, False], time_emb_dim=128,
            num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4,
        )
        sched = make_linear_schedule(STEPS, 1e-4, 0.02)
        unet = UNet(1, model_config)
        params = unet.init(jax.random.PRNGKey(0))
        sampler = make_ddim_sampler(lambda p, x, t: unet(p, x, t), sched,
                                    (BATCH, 28, 28, 1), num_steps=steps)
        jax.block_until_ready(sampler(params, jax.random.PRNGKey(1))[0])
        t0 = time.time()
        x0, _ = sampler(params, jax.random.PRNGKey(2))
        jax.block_until_ready(x0)
        dt = time.time() - t0
        return {"mnist_ddim_steps": steps,
                f"mnist_ddim{steps}_samples_per_sec_chip": round(BATCH / dt, 2)}
    except Exception as e:  # pragma: no cover
        print(f"# ddim bench unavailable: {e}", file=sys.stderr)
        return None


def bench_north_star() -> dict | None:
    """CelebHQ LDM ControlNet 1000-step sampling (the BASELINE north-star
    config): batch 4, 32x32x4 latents, full-res 1024^2 canny hints with the
    hint encoder hoisted out of the loop, bf16 compute.  Returns per-chip
    throughput, or None when it cannot run (e.g. wedged chip / OOM) so the
    primary metric still reports."""
    try:
        import jax
        import jax.numpy as jnp

        from controlnet_tpu.models.controlnet import ControlNet
        from controlnet_tpu.sample.ddpm import make_ddpm_sampler
        from controlnet_tpu.schedules.linear import make_linear_schedule

        ldm_mp = dict(
            hint_channels=3, down_channels=[256, 384, 512, 768],
            mid_channels=[768, 512], down_sample=[True, True, True],
            attn_down=[True, True, True], time_emb_dim=512, norm_channels=32,
            num_heads=16, conv_out_channels=128,
            num_down_layers=2, num_mid_layers=2, num_up_layers=2,
        )
        nb = 4
        sched = make_linear_schedule(STEPS, 0.0015, 0.0195, ldm_scheduler=True)
        cn = ControlNet(4, ldm_mp, model_locked=True, down_sample_factor=32)
        params = cn.init(jax.random.PRNGKey(0))
        # BENCH_FORWARD=paired routes through forward_paired (dual-trunk
        # attention batching) — promoted to default only if the recorded
        # A/B (scripts/tpu_paired_attn_ab.py) wins.
        if os.environ.get("BENCH_FORWARD") == "paired":
            fwd = cn.forward_paired
        else:
            fwd = cn
        def time_leg(nb_leg: int, chunked: bool) -> float:
            """One measured leg: zero hints -> hoisted hint features ->
            warm with PRNGKey(1) -> time ONE full scan with PRNGKey(2).
            Every leg (headline, throughput, b8 compat) shares this exact
            protocol so cross-key comparisons stay apples-to-apples."""
            hint_l = jnp.zeros((nb_leg, 1024, 1024, 3))
            # chunked: the one-shot encoder overflows HBM at compile time
            # by batch 64 (bit-identical; one-time precompute)
            feats_l = (cn.hint_features_chunked(params, hint_l) if chunked
                       else jax.jit(cn.hint_features)(params, hint_l))
            sampler_l = make_ddpm_sampler(
                lambda p, x, t, f: fwd(p, x, t, hint_features=f),
                sched, (nb_leg, 32, 32, 4), record_every=STEPS,
                compute_dtype=jnp.bfloat16,
            )
            jax.block_until_ready(
                sampler_l(params, jax.random.PRNGKey(1), feats_l)[0])
            t0 = time.time()
            x0, _ = sampler_l(params, jax.random.PRNGKey(2), feats_l)
            jax.block_until_ready(x0)
            return time.time() - t0
        dt = time_leg(nb, chunked=False)
        out = {
            "ldm_controlnet_samples_per_sec_chip": round(nb / dt, 4),
            "ldm_controlnet_ms_per_step": round(1000.0 * dt / STEPS, 3),
        }
        # throughput mode — batch 16, the round-4 sweep winner (1.4535
        # samples/s/chip vs 1.4214 at b8 / 1.398 at b32 / 1.350 at b64;
        # docs/artifacts/tpu_batch_sweep_r4.json).  Env-overridable so
        # future sweeps can re-promote without editing this file; a
        # throughput-leg failure must not discard the batch-4 metrics
        # already measured above.
        try:
            nb_tp = int(os.environ.get("BENCH_THROUGHPUT_BATCH", "16"))
            dt_tp = time_leg(nb_tp, chunked=True)
            out["ldm_controlnet_throughput_batch"] = nb_tp
            out["ldm_controlnet_throughput_samples_per_sec_chip"] = round(nb_tp / dt_tp, 4)
            if nb_tp == 8:
                out["ldm_controlnet_b8_samples_per_sec_chip"] = round(nb_tp / dt_tp, 4)
            else:
                # the b8 key has been the stable cross-round comparison point
                # since round 3 — keep emitting it even after the throughput
                # leg moved to batch 16 (ADVICE r4), so historical BENCH_r*
                # comparisons never see the key vanish
                out["ldm_controlnet_b8_samples_per_sec_chip"] = round(
                    8 / time_leg(8, chunked=True), 4)
        except Exception as e:  # pragma: no cover
            print(f"# north-star throughput leg unavailable: {e}", file=sys.stderr)
        # few-step leg on the SAME north-star config (additive, round 5):
        # 50-step DPM-Solver++ in latent space at the throughput batch —
        # same hoisted-hints protocol as the ancestral legs, so the ratio
        # is the pure step-count win.  Teacher-quality basis: the real-data
        # ladder (docs/artifacts/realdata_ddim_r5.json) shows the 2M solver
        # at teacher quality from ~10 steps.
        try:
            from controlnet_tpu.sample import make_few_step_sampler

            steps_fs = int(os.environ.get("BENCH_LDM_FEWSTEP_STEPS", "50"))
            nb_fs = int(os.environ.get("BENCH_THROUGHPUT_BATCH", "16"))
            hint_fs = jnp.zeros((nb_fs, 1024, 1024, 3))
            feats_fs = cn.hint_features_chunked(params, hint_fs)
            sampler_fs = make_few_step_sampler(
                "dpm", lambda p, x, t, f: fwd(p, x, t, hint_features=f),
                sched, (nb_fs, 32, 32, 4), num_steps=steps_fs,
                compute_dtype=jnp.bfloat16)
            jax.block_until_ready(
                sampler_fs(params, jax.random.PRNGKey(1), feats_fs)[0])
            t0 = time.time()
            x0, _ = sampler_fs(params, jax.random.PRNGKey(2), feats_fs)
            jax.block_until_ready(x0)
            dt_fs = time.time() - t0
            out["ldm_controlnet_fewstep_steps"] = steps_fs
            out[f"ldm_controlnet_dpm{steps_fs}_samples_per_sec_chip"] = round(
                nb_fs / dt_fs, 4)
        except Exception as e:  # pragma: no cover
            print(f"# north-star few-step leg unavailable: {e}", file=sys.stderr)
        return out
    except Exception as e:  # pragma: no cover
        print(f"# north-star bench unavailable: {e}", file=sys.stderr)
        return None


def bench_reference_torch() -> float | None:
    """Reference UNet per-step time on this host's torch (CPU), extrapolated
    to the full loop.  Imports the reference package read-only."""
    try:
        import torch

        sys.path.insert(0, "/root/reference")
        from models.unet_base import Unet  # reference code, imported read-only
        from scheduler.linear_noise_scheduler import LinearNoiseScheduler

        model_config = dict(
            im_channels=1, im_size=28,
            down_channels=[32, 64, 128, 256], mid_channels=[256, 256, 128],
            down_sample=[True, True, False], time_emb_dim=128,
            num_down_layers=2, num_mid_layers=2, num_up_layers=2, num_heads=4,
        )
        model = Unet(model_config).eval()
        sched = LinearNoiseScheduler(STEPS, 1e-4, 0.02)
        xt = torch.randn(BATCH, 1, 28, 28)
        probe_steps = max(3, int(os.environ.get("BENCH_REF_STEPS", "5")))
        with torch.no_grad():
            # warmup
            model(xt, torch.as_tensor(STEPS - 1))
            t0 = time.time()
            for i in range(STEPS - 1, STEPS - 1 - probe_steps, -1):
                noise_pred = model(xt, torch.as_tensor(i))
                xt, _ = sched.sample_prev_timestep(xt, noise_pred, torch.as_tensor(i))
            dt = time.time() - t0
        per_step = dt / probe_steps
        total = per_step * STEPS
        return BATCH / total
    except Exception as e:  # pragma: no cover
        print(f"# reference timing unavailable: {e}", file=sys.stderr)
        return None
    finally:
        if "/root/reference" in sys.path:
            sys.path.remove("/root/reference")


def main():
    ours = bench_ours()
    north = None if os.environ.get("BENCH_SKIP_NORTH_STAR") == "1" else bench_north_star()
    ddim = None if os.environ.get("BENCH_SKIP_DDIM") == "1" else bench_ddim()
    ref = bench_reference_torch()
    vs = (ours / ref) if ref else None
    record = {
        "metric": f"MNIST DDPM {STEPS}-step sampling throughput (batch {BATCH})",
        "value": round(ours, 4),
        "unit": "samples/sec/chip",
        "vs_baseline": round(vs, 2) if vs else None,
        # what vs_baseline is measured against: the torch reference run on
        # this host's CPU — the only hardware it can run on here (BASELINE.md
        # has the idealized-H100 accounting)
        "baseline": "host-cpu-torch-reference",
    }
    if north or ddim:
        # North-star config (BASELINE.md): CelebHQ LDM ControlNet 1000-step
        # sampling, batch 4, full-res hints, bf16 — same JSON line.  Plus
        # the additive few-step DDIM leg (round 5).
        record["extras"] = {**(north or {}), **(ddim or {})}
    print(json.dumps(record))


if __name__ == "__main__":
    main()
