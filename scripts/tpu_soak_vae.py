"""Production soak of the VAE-GAN trainer — the one loop never proven at
scale (VERDICT r3 weak #1): celebhq shapes (128x128x3, batch 4, gradient
accumulation), LPIPS + PatchGAN discriminator, bf16 compute, crossing the
REAL disc_start=7500 boundary (reference tools/train_vae.py:145,
config/celebhq.yaml disc_start) on the v5e.

What it proves, at the same evidence bar scripts/tpu_soak.py set for the
LDM ControlNet:
* flat step time over thousands of steps, through the disc_start crossing
  (both phases are ONE compiled graph — the disc branch is a weight mask,
  train/loops.py make_vae_gan_train_step — so no recompile at 7500),
* recon loss decreasing; after 7500 the adversarial pair comes alive and
  stays bounded (GAN balance: disc_loss away from both 0 and its 0.25*w
  no-information fixed point for a healthy stretch),
* background checkpoint saves (io/checkpoint.py save_checkpoint_background)
  do not stall the device pipeline,
* a cold resume from the latest checkpoint continues the loss trajectory
  with full state (both optimizers + both param trees + step).

Usage:  python scripts/tpu_soak_vae.py [target_steps] [resume]
Writes docs/artifacts/tpu_soak_vae.json (or _resume variant).
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

cli.setup_jax()

from controlnet_tpu.io.checkpoint import (latest_checkpoint, restore_checkpoint,
                                          save_checkpoint_background,
                                          wait_for_checkpoints)
from controlnet_tpu.models.discriminator import Discriminator
from controlnet_tpu.models.vae import VAE
from controlnet_tpu.train.loops import make_vae_gan_train_step
from controlnet_tpu.train.state import create_train_state
from tools.train_vae import build_lpips

TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 9000
RESUME = len(sys.argv) > 2 and sys.argv[2] == "resume"
WS = os.environ.get("SOAK_WS", "/root/repo/soak_ws")
CKPT = "soak_vae.pth"
# config/celebhq.yaml autoencoder_params + train_params (reference parity)
VAE_MP = dict(z_channels=4, down_channels=[128, 256, 384], mid_channels=[384],
              down_sample=[True, True], attn_down=[False, False],
              norm_channels=32, num_heads=4, num_down_layers=2,
              num_mid_layers=2, num_up_layers=2)
B = 4
# Env overrides exist so the identical control flow can be smoke-tested on
# CPU at toy shapes (tests/test_tools_celebhq_e2e.py covers the trainer;
# this script's own smoke is scripts-level) — TPU runs use the defaults.
IM = int(os.environ.get("SOAK_VAE_IM", "128"))
ACC_STEPS = 2          # exercise optax.MultiSteps accumulation at scale
DISC_START = int(os.environ.get("SOAK_VAE_DISC_START", "7500"))  # config/celebhq.yaml
DISC_WEIGHT = 0.5
KL_WEIGHT = 5e-6
PERCEPTUAL_WEIGHT = 1.0
LR = 1e-5
WINDOW = int(os.environ.get("SOAK_VAE_WINDOW", "100"))
CKPT_EVERY = int(os.environ.get("SOAK_VAE_CKPT_EVERY", "1500"))

os.makedirs(WS, exist_ok=True)
vae = VAE(3, VAE_MP)
disc = Discriminator(im_channels=3)
lp, lpips_params = build_lpips(jax.random.PRNGKey(7))

base_g = optax.adam(LR, b1=0.5, b2=0.999)
base_d = optax.adam(LR, b1=0.5, b2=0.999)
tx_g = optax.MultiSteps(base_g, ACC_STEPS)
tx_d = optax.MultiSteps(base_d, ACC_STEPS)
g_state = create_train_state(vae.init(jax.random.PRNGKey(0)), tx_g)
d_state = create_train_state(disc.init(jax.random.PRNGKey(1)), tx_d)

start_step = 0
if RESUME:
    last = latest_checkpoint(WS, CKPT)
    assert last is not None, "resume requested but no checkpoint exists"
    tree, start_step = restore_checkpoint(WS, CKPT, {"g": g_state, "d": d_state}, last)
    g_state, d_state = tree["g"], tree["d"]
    print(f"resumed from checkpoint step {start_step}")

step_fn = make_vae_gan_train_step(
    vae, disc, lp, tx_g, tx_d, disc_start=DISC_START, disc_weight=DISC_WEIGHT,
    kl_weight=KL_WEIGHT, perceptual_weight=PERCEPTUAL_WEIGHT,
    compute_dtype=jnp.bfloat16)

# Synthetic-but-structured data resident on device (no CelebA-HQ offline):
# a pool of 32 images = smooth low-frequency fields + sparse highlights,
# in [-1, 1]; the soak cycles 8 fixed batches of 4 so recon has real
# (memorizable) signal and the discriminator sees consistent "real" stats.
kpool = jax.random.PRNGKey(3)
yy = jnp.linspace(-1, 1, IM)
base = (jnp.sin(3.1 * yy)[None, :, None, None]
        * jnp.cos(2.3 * yy)[None, None, :, None])
pool = 0.6 * base + 0.4 * jax.image.resize(
    jax.random.normal(kpool, (32, IM // 8, IM // 8, 3)), (32, IM, IM, 3),
    "bilinear")
pool = jnp.clip(pool, -1, 1).astype(jnp.float32)
batches = pool.reshape(8, B, IM, IM, 3)

# warmup/compile (step_count both sides of disc_start share one program —
# assert no recompile by timing)
g_state, d_state, m = step_fn(g_state, d_state, lpips_params, batches[0],
                              jax.random.PRNGKey(10), jnp.int32(max(start_step, 1)))
jax.block_until_ready(m["recon_loss"])
print(f"compiled; initial recon {float(m['recon_loss']):.5f}", flush=True)

window = []
win_metrics = []
ckpt_stalls = []
i = start_step
key = jax.random.PRNGKey(1000 + start_step)
t_start = time.time()
while i < TARGET:
    t0 = time.time()
    acc = {k: [] for k in ("recon_loss", "perceptual_loss", "disc_loss",
                           "gen_adv_loss", "kl_loss", "g_loss")}
    for _ in range(WINDOW):
        i += 1
        key, kk = jax.random.split(key)
        g_state, d_state, m = step_fn(g_state, d_state, lpips_params,
                                      batches[i % 8], kk, jnp.int32(i))
        for k_ in acc:
            acc[k_].append(m[k_])
    means = {k_: float(jax.block_until_ready(jnp.mean(jnp.stack(v))))
             for k_, v in acc.items()}
    dt = (time.time() - t0) / WINDOW
    window.append((i, dt))
    win_metrics.append(means)
    print(f"step {i}: {dt * 1e3:.1f} ms/step, recon {means['recon_loss']:.5f}, "
          f"lpips {means['perceptual_loss']:.5f}, disc {means['disc_loss']:.5f}, "
          f"gen_adv {means['gen_adv_loss']:.5f}", flush=True)
    if i % CKPT_EVERY == 0:
        t0 = time.time()
        save_checkpoint_background(WS, CKPT, i, {"g": g_state, "d": d_state})
        stall = time.time() - t0
        ckpt_stalls.append(stall)
        print(f"  checkpoint dispatched @ {i} ({stall:.2f}s stall)", flush=True)

wait_for_checkpoints()
if not window:
    print("nothing to report")
    sys.exit(0)
steady = [dt for _, dt in window[1:]]
pre = [m for (s, _), m in zip(window, win_metrics) if s <= DISC_START]
post = [m for (s, _), m in zip(window, win_metrics) if s > DISC_START + WINDOW]
out = {
    "resumed": RESUME, "start_step": start_step, "end_step": i,
    "batch": B, "im_size": IM, "acc_steps": ACC_STEPS,
    "disc_start": DISC_START,
    "wall_minutes": round((time.time() - t_start) / 60, 1),
    "ms_per_step_first": round(window[0][1] * 1e3, 2),
    "ms_per_step_min": round(min(steady) * 1e3, 2) if steady else None,
    "ms_per_step_max": round(max(steady) * 1e3, 2) if steady else None,
    "ms_per_step_last": round(window[-1][1] * 1e3, 2),
    "drift_pct_last_vs_min": round(
        (window[-1][1] / min(steady) - 1) * 100, 2) if steady else None,
    "img_per_sec_steady": round(B / (sum(steady) / len(steady)), 1) if steady else None,
    "recon_first": win_metrics[0]["recon_loss"],
    "recon_last": win_metrics[-1]["recon_loss"],
    "disc_live_after_start": bool(post) and all(
        m["disc_loss"] > 0 for m in post),
    "disc_loss_post_minmax": [round(min(m["disc_loss"] for m in post), 5),
                              round(max(m["disc_loss"] for m in post), 5)] if post else None,
    "gen_adv_post_minmax": [round(min(m["gen_adv_loss"] for m in post), 5),
                            round(max(m["gen_adv_loss"] for m in post), 5)] if post else None,
    "disc_zero_before_start": bool(pre) and all(
        m["disc_loss"] == 0.0 for m in pre),
    "ckpt_stall_s_mean": round(sum(ckpt_stalls) / len(ckpt_stalls), 3) if ckpt_stalls else None,
    "ckpt_stall_s_max": round(max(ckpt_stalls), 3) if ckpt_stalls else None,
    "windows": [(s, round(dt * 1e3, 2)) for s, dt in window],
    "metrics": [{k_: round(v, 5) for k_, v in m.items()} for m in win_metrics],
}
path = os.path.join(REPO, "docs", "artifacts",
                    "tpu_soak_vae_resume.json" if RESUME else "tpu_soak_vae.json")
with open(path, "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: v for k, v in out.items() if k not in ("windows", "metrics")}))
print("wrote", path)
