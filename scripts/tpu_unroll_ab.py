"""A/B: scan ``unroll`` on the north-star sampler (CelebHQ LDM ControlNet,
1000 steps, bf16, hints hoisted).

The MNIST bench path already runs ``unroll=2`` (bench.py:63); the
north-star config never got the same sweep.  Per-step work here is large
(~3.7 ms), so loop overhead should be negligible — this measures whether
unrolling buys anything (or costs compile time for nothing) before we'd
consider promoting it into bench_north_star.

One claim per process (round-3 lesson):
  python scripts/tpu_unroll_ab.py <unroll> <batch>
Appends to docs/artifacts/tpu_unroll_ab.json.
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

UNROLL = int(sys.argv[1]) if len(sys.argv) > 1 else 1
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

sampler = make_ddpm_sampler(
    lambda p, x, t, f: cn(p, x, t, hint_features=f),
    sched, (NB, 32, 32, 4), record_every=STEPS,
    compute_dtype=jnp.bfloat16, unroll=UNROLL)

t0 = time.time()
jax.block_until_ready(sampler(params, jax.random.PRNGKey(1), feats)[0])
compile_s = time.time() - t0
times = []
for rep in range(3):
    t0 = time.time()
    x0, _ = sampler(params, jax.random.PRNGKey(2 + rep), feats)
    jax.block_until_ready(x0)
    times.append(time.time() - t0)
dt = min(times)
rec = {"unroll": UNROLL, "batch": NB, "steps": STEPS,
       "compile_s": round(compile_s, 1),
       "ms_per_step": round(1000.0 * dt / STEPS, 3),
       "samples_per_sec_chip": round(NB / dt, 4),
       "reps_ms_per_step": [round(1000.0 * t / STEPS, 3) for t in times]}
print(json.dumps(rec), flush=True)

path = os.path.join(REPO, "docs", "artifacts", "tpu_unroll_ab.json")
existing = []
if os.path.exists(path):
    with open(path) as f:
        existing = json.load(f)
with open(path, "w") as f:
    json.dump(existing + [rec], f, indent=2)
print("wrote", path)
