"""A/B: ControlNet dual-trunk attention batching (VERDICT r3 next #2b).

north-star config, 1000-step LDM ControlNet sampling, bf16, hints hoisted:
  A) __call__        — each trunk's attention its own kernel invocation
  B) forward_paired  — both trunks' attention cores in ONE invocation
at batch 4 (latency mode, where occupancy amortization should matter most)
and batch 8 (throughput mode).

One claim per process (round-3 lesson) — run each variant via argv:
  python scripts/tpu_paired_attn_ab.py call 4
  python scripts/tpu_paired_attn_ab.py paired 4
Appends to docs/artifacts/tpu_paired_attn_ab.json.
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

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "call"
NB = int(sys.argv[2]) if len(sys.argv) > 2 else 4
STEPS = int(os.environ.get("AB_STEPS", "1000"))

LDM_MP = dict(hint_channels=3, down_channels=[256, 384, 512, 768],
              mid_channels=[768, 512], down_sample=[True, True, True],
              attn_down=[True, True, True], time_emb_dim=512, norm_channels=32,
              num_heads=16, conv_out_channels=128, num_down_layers=2,
              num_mid_layers=2, num_up_layers=2)

sched = make_linear_schedule(STEPS, 0.0015, 0.0195, ldm_scheduler=True)
cn = ControlNet(4, LDM_MP, model_locked=True, down_sample_factor=32)
params = cn.init(jax.random.PRNGKey(0))
hint = jnp.zeros((NB, 1024, 1024, 3))
feats = jax.jit(cn.hint_features)(params, hint)
jax.block_until_ready(feats)

fwd = cn.forward_paired if VARIANT == "paired" else (
    lambda p, x, t, hint_features: cn(p, x, t, hint_features=hint_features))
sampler = make_ddpm_sampler(
    lambda p, x, t, f: fwd(p, x, t, hint_features=f),
    sched, (NB, 32, 32, 4), record_every=STEPS, compute_dtype=jnp.bfloat16)

jax.block_until_ready(sampler(params, jax.random.PRNGKey(1), feats)[0])
times = []
for rep in range(3):
    t0 = time.time()
    x0, _ = sampler(params, jax.random.PRNGKey(2 + rep), feats)
    jax.block_until_ready(x0)
    times.append(time.time() - t0)
dt = min(times)
rec = {"variant": VARIANT, "batch": NB, "steps": STEPS,
       "fused_proj": os.environ.get("CONTROLNET_TPU_ATTN_FUSED_PROJ") == "1",
       "ms_per_step": round(1000.0 * dt / STEPS, 3),
       "samples_per_sec_chip": round(NB / dt, 4),
       "reps_ms_per_step": [round(1000.0 * t / STEPS, 3) for t in times]}
print(json.dumps(rec), flush=True)

path = os.path.join(REPO, "docs", "artifacts", "tpu_paired_attn_ab.json")
existing = []
if os.path.exists(path):
    with open(path) as f:
        existing = json.load(f)
with open(path, "w") as f:
    json.dump(existing + [rec], f, indent=2)
print("wrote", path)
