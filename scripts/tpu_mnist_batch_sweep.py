"""MNIST DDPM sampler batch sweep (VERDICT r4 next-round #6).

The headline MNIST DDPM bench has been pinned at batch 64 since round 1;
the LDM north star got its full batch envelope in round 4 (optimum 16).
This sweeps the MNIST 1000-step sampler over 64..512 — a 28x28 UNet
leaves huge HBM headroom — so the throughput optimum can be promoted to a
bench.py throughput leg (BENCH_MNIST_THROUGHPUT_BATCH), keeping batch 64
as the stable cross-round headline.

Notes per the verify-skill timing rules: each point is ONE jitted
execution containing the whole 1000-step lax.scan (no dispatch-latency
trap); any point >=1.5x off the neighbor trend must be re-measured before
promotion.

Usage: python scripts/tpu_mnist_batch_sweep.py [batches...]
       (default 64 128 256 384 512)
Writes docs/artifacts/tpu_mnist_batch_sweep_r5.json.  TPU-only; run
serialized (no other TPU process, no CPU-heavy background job).
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

from controlnet_tpu.models.unet import UNet
from controlnet_tpu.sample.ddpm import make_ddpm_sampler
from controlnet_tpu.schedules.linear import make_linear_schedule

STEPS = int(os.environ.get("SWEEP_STEPS", "1000"))
BATCHES = [int(a) for a in sys.argv[1:]] or [64, 128, 256, 384, 512]
BF16 = os.environ.get("SWEEP_BF16") == "1"  # headline bench is f32

from controlnet_tpu import config as cfgmod

# the real architecture, straight from the config the tools train with
MP = cfgmod.model_params(cfgmod.load_config(os.path.join(REPO, "config", "mnist.yaml")))

assert jax.default_backend() == "tpu", "sweep must run on the real chip"
sched = make_linear_schedule(STEPS, 1e-4, 0.02)
unet = UNet(1, MP)
params = unet.init(jax.random.PRNGKey(0))

results = []
for nb in BATCHES:
    try:
        sampler = make_ddpm_sampler(
            lambda p, x, t: unet(p, x, t), sched, (nb, 28, 28, 1),
            record_every=STEPS,
            compute_dtype=jnp.bfloat16 if BF16 else None, unroll=2)
        jax.block_until_ready(sampler(params, jax.random.PRNGKey(1))[0])
        best = None
        for rep in range(2):  # two timed reps; keep the max throughput
            t0 = time.time()
            x0, _ = sampler(params, jax.random.PRNGKey(2 + rep))
            jax.block_until_ready(x0)
            dt = time.time() - t0
            best = min(best, dt) if best else dt
        row = {"batch": nb, "samples_per_sec_chip": round(nb / best, 4),
               "ms_per_step": round(1000.0 * best / STEPS, 3)}
    except Exception as e:
        row = {"batch": nb, "error": f"{type(e).__name__}: {e}"}
    results.append(row)
    print(json.dumps(row), flush=True)

ok = [r for r in results if "samples_per_sec_chip" in r]
out = {"steps": STEPS, "bf16": BF16, "device": str(jax.devices()[0]),
       "results": results,
       "best": max(ok, key=lambda r: r["samples_per_sec_chip"]) if ok else None}
path = os.path.join(REPO, "docs", "artifacts", "tpu_mnist_batch_sweep_r5.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print("best:", json.dumps(out["best"]))
print("wrote", path)
