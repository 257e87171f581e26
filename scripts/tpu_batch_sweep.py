"""Round-4 batch sweep of the north-star config (VERDICT r3 next #2a):
CelebHQ LDM ControlNet 1000-step sampling with the round-3 kernel stack
(fused GroupNorm layout, Pallas attention, bf16), at batch 4/8/16/32/64.

The last full sweep predates the GroupNorm fusion; batch 16 already beat 8
(1.452 vs 1.417 samples/s/chip).  This re-sweeps on the current kernels so
the best point can be promoted to BENCH/BASELINE.

Usage: python scripts/tpu_batch_sweep.py [batches...]   (default 4 8 16 32 64)
Appends results to docs/artifacts/tpu_batch_sweep_r4.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp

from controlnet_tpu import cli

cli.setup_jax()

from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.sample.ddpm import make_ddpm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule

STEPS = int(os.environ.get("SWEEP_STEPS", "1000"))
BATCHES = [int(a) for a in sys.argv[1:]] or [4, 8, 16, 32, 64]

LDM_MP = dict(hint_channels=3, down_channels=[256, 384, 512, 768],
              mid_channels=[768, 512], down_sample=[True, True, True],
              attn_down=[True, True, True], time_emb_dim=512, norm_channels=32,
              num_heads=16, conv_out_channels=128, num_down_layers=2,
              num_mid_layers=2, num_up_layers=2)

sched = make_linear_schedule(STEPS, 0.0015, 0.0195, ldm_scheduler=True)
cn = ControlNet(4, LDM_MP, model_locked=True, down_sample_factor=32)
params = cn.init(jax.random.PRNGKey(0))

results = []
for nb in BATCHES:
    try:
        hint = jnp.zeros((nb, 1024, 1024, 3))
        # chunked: the one-shot encoder compile-OOMs HBM at b64
        # (docs/artifacts/tpu_batch_sweep_r4.json); bit-identical
        feats = cn.hint_features_chunked(params, hint)
        jax.block_until_ready(feats)
        del hint
        sampler = make_ddpm_sampler(
            lambda p, x, t, f: cn(p, x, t, hint_features=f),
            sched, (nb, 32, 32, 4), record_every=STEPS,
            compute_dtype=jnp.bfloat16)
        jax.block_until_ready(sampler(params, jax.random.PRNGKey(1), feats)[0])
        t0 = time.time()
        x0, _ = sampler(params, jax.random.PRNGKey(2), feats)
        jax.block_until_ready(x0)
        dt = time.time() - t0
        rec = {"batch": nb, "samples_per_sec_chip": round(nb / dt, 4),
               "ms_per_step": round(1000.0 * dt / STEPS, 3)}
        print(json.dumps(rec), flush=True)
        results.append(rec)
    except Exception as e:
        rec = {"batch": nb, "error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps(rec), flush=True)
        results.append(rec)

path = os.path.join(REPO, "docs", "artifacts", "tpu_batch_sweep_r4.json")
existing = []
if os.path.exists(path):
    with open(path) as f:
        existing = json.load(f)
with open(path, "w") as f:
    json.dump(existing + [{"steps": STEPS, "results": results}], f, indent=2)
print("wrote", path)
