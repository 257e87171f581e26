"""Production soak test: sustained CelebHQ-shape LDM ControlNet bf16
training on one v5e chip with periodic orbax checkpointing, a mid-run
resume, and steady-state throughput drift tracking.

What this proves (beyond the short benches in tpu_train_bench_bf16.py):
* no memory/throughput drift over thousands of steps (leak detector:
  per-100-step wall time must stay flat),
* checkpoint save does not stall the device pipeline beyond its budget,
* a cold resume from the latest checkpoint continues the loss trajectory
  (full train state: params + optimizer + step — the reference never
  restores its optimizer, train_ddpm.py:72-91; we restore everything).

Usage:  python scripts/tpu_soak.py [minutes] [resume]
Writes docs/artifacts/tpu_soak.json.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import jax
import jax.numpy as jnp
import optax

from controlnet_tpu import cli

cli.setup_jax()  # compile cache + the XLA-CPU codegen deadlock guard

from controlnet_tpu.io.checkpoint import (latest_checkpoint, restore_checkpoint,
                                          save_checkpoint_background,
                                          wait_for_checkpoints)
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.schedules.linear import make_linear_schedule
from controlnet_tpu.train.loops import make_controlnet_train_step
from controlnet_tpu.train.state import create_train_state

MINUTES = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
RESUME = len(sys.argv) > 2 and sys.argv[2] == "resume"
WS = os.environ.get("SOAK_WS", "/root/repo/soak_ws")
CKPT = "soak_controlnet.pth"
# celebhq.yaml ldm/controlnet architecture (reference config/celebhq.yaml)
LDM_MP = dict(hint_channels=3, down_channels=[256, 384, 512, 768],
              mid_channels=[768, 512], down_sample=[True, True, True],
              attn_down=[True, True, True], time_emb_dim=512, norm_channels=32,
              num_heads=16, conv_out_channels=128, num_down_layers=2,
              num_mid_layers=2, num_up_layers=2)
B = 16

os.makedirs(WS, exist_ok=True)
sched = make_linear_schedule(1000, 0.0015, 0.0195, ldm_scheduler=True)
tx = optax.adam(1e-5)
cn = ControlNet(4, LDM_MP, down_sample_factor=32)
trainable, frozen = cn.split_params(cn.init(jax.random.PRNGKey(0)))
state = create_train_state(trainable, tx)

start_step = 0
if RESUME:
    last = latest_checkpoint(WS, CKPT)
    assert last is not None, "resume requested but no checkpoint exists"
    state, start_step = restore_checkpoint(WS, CKPT, state, last)
    print(f"resumed from checkpoint step {start_step}")

step_fn = make_controlnet_train_step(cn, sched, tx, compute_dtype=jnp.bfloat16)

# Fixed structured data resident on device: latents with learnable signal,
# full-res 1024^2 canny-like sparse hints (same shapes the celebhq trainer
# feeds; synthetic because no CelebA-HQ exists offline).
k = jax.random.PRNGKey(3)
lat = jax.random.normal(k, (B, 32, 32, 4)) * 0.5 + jnp.linspace(
    -1, 1, 32)[None, :, None, None]
hints = (jax.random.uniform(jax.random.PRNGKey(4), (B, 1024, 1024, 3)) > 0.97
         ).astype(jnp.float32)

# warmup/compile
state, loss = step_fn(state, frozen, lat, hints, jax.random.PRNGKey(10))
jax.block_until_ready(loss)
print(f"compiled; initial loss {float(loss):.5f}", flush=True)

window = []          # (step, wall_s_per_step) per 100-step window
losses = []          # mean training loss per window
ckpt_stalls = []     # seconds each checkpoint save added
deadline = time.time() + MINUTES * 60
i = start_step
key = jax.random.PRNGKey(1000 + start_step)
while time.time() < deadline:
    t0 = time.time()
    window_losses = []   # device scalars; one host sync per window
    for _ in range(100):
        key, kk = jax.random.split(key)
        state, loss = step_fn(state, frozen, lat, hints, kk)
        window_losses.append(loss)
    acc = float(jax.block_until_ready(jnp.mean(jnp.stack(window_losses))))
    dt = (time.time() - t0) / 100
    i += 100
    window.append((i, dt))
    losses.append(acc)
    print(f"step {i}: {dt * 1e3:.1f} ms/step, loss {acc:.5f}", flush=True)
    if i % 1000 == 0:
        # Fully-overlapped save: the training thread pays only an on-device
        # HBM copy dispatch; D2H (28-44s of tunnel time for this 2.3GB
        # state — docs/artifacts/tpu_soak_resume.json, pre-overlap) and the
        # disk write both run on the checkpoint worker thread concurrent
        # with the next 1000 steps.
        t0 = time.time()
        save_checkpoint_background(WS, CKPT, i, state)
        stall = time.time() - t0
        ckpt_stalls.append(stall)
        print(f"  checkpoint dispatched @ {i} ({stall:.2f}s stall)",
              flush=True)

wait_for_checkpoints()
if not window:
    print("deadline shorter than one 100-step window; nothing to report")
    sys.exit(0)
steady = [dt for _, dt in window[1:]]  # drop first (residual compile/cache)
out = {
    "resumed": RESUME, "start_step": start_step, "end_step": i,
    "batch": B, "ms_per_step_first": round(window[0][1] * 1e3, 2),
    "ms_per_step_min": round(min(steady) * 1e3, 2) if steady else None,
    "ms_per_step_max": round(max(steady) * 1e3, 2) if steady else None,
    "ms_per_step_last": round(window[-1][1] * 1e3, 2),
    "drift_pct_last_vs_min": round(
        (window[-1][1] / min(steady) - 1) * 100, 2) if steady else None,
    "img_per_sec_steady": round(B / (sum(steady) / len(steady)), 1) if steady else None,
    "loss_first": losses[0], "loss_last": losses[-1],
    "ckpt_stall_s_mean": round(sum(ckpt_stalls) / len(ckpt_stalls), 2) if ckpt_stalls else None,
    "windows": [(s, round(dt * 1e3, 2)) for s, dt in window],
    "losses": [round(l, 5) for l in losses],
}
path = os.path.join(REPO, "docs", "artifacts",
                    "tpu_soak_resume.json" if RESUME else "tpu_soak.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: v for k, v in out.items() if k not in ("windows", "losses")}))
print("wrote", path)
