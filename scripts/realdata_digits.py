"""Real-data convergence run: sklearn handwritten digits through the standard CLI.

VERDICT r4 "missing #2": every fidelity/convergence artifact so far used the
synthetic-shapes protocol because MNIST/CIFAR/CelebA-HQ cannot be downloaded
in this offline environment.  This harness closes the real-data gap with the
one real image dataset that IS present: the UCI handwritten-digits test set
shipped inside scikit-learn (1,797 genuine 8x8 grayscale scans of human
handwriting; Alpaydin & Kaynak 1998).  Images are upsampled to 28x28 so the
REAL config/mnist.yaml architecture (down [32,64,128,256], mid [256,256,128],
T=1000 — reference config/mnist.yaml:13-24) trains completely unchanged, and
the PNG tree uses the exact class-dir layout the MNIST extractor produces, so
the standard, unmodified CLI tools run end to end on real data:

  tools.train_ddpm -> tools.sample_ddpm -> tools.train_ddpm_controlnet
  -> tools.sample_ddpm_controlnet        (reference tools/*.py CLI parity)

Stages (resumable; each stage is one TPU process — run serially):
  data    build class-dir PNG trees (stratified train 1497 / test 300)
  train   tools.train_ddpm via the standard CLI (subprocess)
  sample  tools.sample_ddpm grid artifact via the standard CLI (subprocess)
  cn      tools.train_ddpm_controlnet + tools.sample_ddpm_controlnet
  eval    N individual samples from the trained ckpt; FFD vs the held-out
          real test digits (bootstrap CIs) against the real-data noise
          floor, plus canny hint-adherence for the ControlNet samples
          (edge precision/recall vs an unconditional-sample null)
  eval_ddim  few-step DDIM sampling (sample/ddim.py) from the SAME trained
          DDPM + ControlNet checkpoints: FFD vs the held-out real digits and
          hint adherence across a step-count ladder, with measured
          seconds/batch vs the 1000-step ancestral sampler
  distill tools.train_consistency_controlnet_distilled +
          tools.train_distribution_matching_controlnet_distilled, their
          --mode test samplers, and tools.compare_all_controlnet_models
          (all via the standard CLI)
  eval_distill  1-step samples from both students on real test hints;
          FFD vs the held-out digits + hint adherence, alongside the
          1000-step teacher rows and the comparison tool's measured
          timings
  all     every stage in order

Env knobs: REALDATA_WS (workspace dir), REALDATA_EPOCHS (default 300),
REALDATA_CN_EPOCHS (default 60), REALDATA_CD_EPOCHS / REALDATA_DMD_EPOCHS
(default 60 each), REALDATA_N_SAMPLES (default 512), REALDATA_RESULTS /
REALDATA_DISTILL_RESULTS (artifact JSON paths).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WS = os.path.abspath(os.environ.get("REALDATA_WS", os.path.join(REPO, "realdata_ws")))
EPOCHS = int(os.environ.get("REALDATA_EPOCHS", "300"))
CN_EPOCHS = int(os.environ.get("REALDATA_CN_EPOCHS", "60"))
N_SAMPLES = int(os.environ.get("REALDATA_N_SAMPLES", "512"))
CD_EPOCHS = int(os.environ.get("REALDATA_CD_EPOCHS", "60"))
DMD_EPOCHS = int(os.environ.get("REALDATA_DMD_EPOCHS", "60"))
RESULTS = os.environ.get(
    "REALDATA_RESULTS", os.path.join(REPO, "docs", "artifacts", "realdata_digits_r5.json"))
DISTILL_RESULTS = os.environ.get(
    "REALDATA_DISTILL_RESULTS",
    os.path.join(REPO, "docs", "artifacts", "realdata_distill_r5.json"))
TEST_PER_CLASS = 30
SAMPLE_BATCH = int(os.environ.get("REALDATA_SAMPLE_BATCH", "64"))
N_DISTILL = int(os.environ.get("REALDATA_N_DISTILL", "256"))


def _write_config() -> str:
    """Full mnist.yaml schema with only paths/epochs changed (arch identical)."""
    cfg = f"""dataset_params:
  task_name: 'mnist'
  im_path: '{WS}/data/train'
  im_test_path: '{WS}/data/test'
  canny_im_size: 28

diffusion_params:
  num_timesteps: 1000
  beta_start: 0.0001
  beta_end: 0.02

model_params:
  im_channels: 1
  im_size: 28
  hint_channels: 3
  down_channels: [32, 64, 128, 256]
  mid_channels: [256, 256, 128]
  down_sample: [True, True, False]
  time_emb_dim: 128
  num_down_layers: 2
  num_mid_layers: 2
  num_up_layers: 2
  num_heads: 4

train_params:
  task_name: '{WS}/run'
  batch_size: 64
  num_epochs: {EPOCHS}
  controlnet_epochs: {CN_EPOCHS}
  num_samples: 25
  num_grid_rows: 5
  ddpm_lr: 0.0001
  controlnet_lr: 0.0001
  ddpm_ckpt_name: 'ddpm_ckpt.pth'
  controlnet_ckpt_name: 'ddpm_controlnet_ckpt.pth'
  consistency_epochs: {CD_EPOCHS}
  consistency_lr: 0.0001
  distribution_matching_epochs: {DMD_EPOCHS}
  distribution_matching_lr: 0.00005
  ckpt_save_every_epochs: 25
"""
    path = os.path.join(WS, "digits.yaml")
    os.makedirs(WS, exist_ok=True)
    with open(path, "w") as f:
        f.write(cfg)
    return path


def stage_data():
    import cv2
    import numpy as np
    from sklearn.datasets import load_digits

    d = load_digits()
    rng = np.random.default_rng(0)
    counts = {"train": 0, "test": 0}
    for cls in range(10):
        idx = np.flatnonzero(d.target == cls)
        idx = idx[rng.permutation(len(idx))]
        for rank, i in enumerate(idx):
            split = "test" if rank < TEST_PER_CLASS else "train"
            # 0..16 ink-on-black scans -> u8 -> bicubic 8x8 -> 28x28 (the
            # polarity already matches MNIST: background 0, strokes bright).
            u8 = np.clip(d.images[i] * (255.0 / 16.0), 0, 255).astype(np.uint8)
            up = np.clip(
                cv2.resize(u8, (28, 28), interpolation=cv2.INTER_CUBIC), 0, 255
            ).astype(np.uint8)
            out = os.path.join(WS, "data", split, str(cls))
            os.makedirs(out, exist_ok=True)
            cv2.imwrite(os.path.join(out, f"{counts[split]:05d}.png"), up)
            counts[split] += 1
    _write_config()
    print(f"real-digits tree ready: {counts} under {WS}/data")


def _run_tool(mod: str, *extra: str):
    cmd = [sys.executable, "-m", mod, "--config", os.path.join(WS, "digits.yaml"), *extra]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, check=True)


def stage_train():
    _run_tool("tools.train_ddpm")


def stage_sample():
    _run_tool("tools.sample_ddpm")


def stage_cn():
    _run_tool("tools.train_ddpm_controlnet")
    _run_tool("tools.sample_ddpm_controlnet")


def _load_real(split: str) -> "np.ndarray":
    import numpy as np

    from controlnet_tpu.data.datasets import MnistDataset

    ds = MnistDataset(split, im_path=os.path.join(WS, "data", split))
    return np.stack([ds[i] for i in range(len(ds))])


def _sample_uncond(n: int) -> "np.ndarray":
    """n individual samples from the trained checkpoint (in-process)."""
    import jax
    import numpy as np

    from controlnet_tpu import cli, config as cfg
    from controlnet_tpu.models.unet import UNet
    from controlnet_tpu.sample.ddpm import make_ddpm_sampler
    from controlnet_tpu.schedules.linear import make_linear_schedule
    from tools.sample_ddpm import load_unet_params

    config = cfg.load_config(os.path.join(WS, "digits.yaml"))
    mc = cfg.model_params(config)
    dc = cfg.diffusion_params(config)
    sched = make_linear_schedule(dc["num_timesteps"], dc["beta_start"], dc["beta_end"])
    unet = UNet(mc["im_channels"], mc)
    params = load_unet_params(cfg.train_params(config)["task_name"],
                              cfg.train_params(config)["ddpm_ckpt_name"], unet)
    shape = (SAMPLE_BATCH, mc["im_size"], mc["im_size"], mc["im_channels"])
    sampler = make_ddpm_sampler(lambda p, x, t: unet(p, x, t), sched, shape,
                                record_every=dc["num_timesteps"])
    outs = []
    for b0 in range(0, n, SAMPLE_BATCH):
        x0, _ = sampler(params, jax.random.PRNGKey(1000 + b0))
        outs.append(np.asarray(jax.device_get(x0)))
        print(f"sampled {min(b0 + SAMPLE_BATCH, n)}/{n}", flush=True)
    return np.concatenate(outs)[:n]


def _sample_cn(hints: "np.ndarray") -> "np.ndarray":
    """One batch of hint-conditioned samples from the ControlNet ckpt."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from controlnet_tpu import config as cfg
    from controlnet_tpu.models.controlnet import ControlNet
    from controlnet_tpu.sample.ddpm import make_ddpm_sampler
    from controlnet_tpu.schedules.linear import make_linear_schedule
    from tools.train_ddpm_controlnet import load_controlnet_params

    config = cfg.load_config(os.path.join(WS, "digits.yaml"))
    mc = cfg.model_params(config)
    dc = cfg.diffusion_params(config)
    tc = cfg.train_params(config)
    sched = make_linear_schedule(dc["num_timesteps"], dc["beta_start"], dc["beta_end"])
    cn = ControlNet(mc["im_channels"], mc, model_locked=True)
    params = load_controlnet_params(tc["task_name"], tc["controlnet_ckpt_name"], cn,
                                    fallback_unet_ckpt=tc["ddpm_ckpt_name"])
    shape = (len(hints), mc["im_size"], mc["im_size"], mc["im_channels"])
    hint_feats = jax.jit(cn.hint_features)(params, jnp.asarray(hints))
    sampler = make_ddpm_sampler(lambda p, x, t, f: cn(p, x, t, hint_features=f),
                                sched, shape, record_every=dc["num_timesteps"])
    x0, _ = sampler(params, jax.random.PRNGKey(7), hint_feats)
    return np.asarray(jax.device_get(x0))


def _edge_agreement(samples: "np.ndarray", hints: "np.ndarray") -> dict:
    """Canny-edge precision/recall of samples vs their conditioning hints.

    Edges of each generated sample (cv2.Canny, the dataset's own 100/200
    thresholds) are compared to the hint's edge map with a 1-pixel dilation
    tolerance on the reference side of each ratio."""
    import cv2
    import numpy as np

    kernel = np.ones((3, 3), np.uint8)
    precs, recs = [], []
    for im, hint in zip(samples, hints):
        u8 = np.clip((im[..., 0] + 1.0) * 127.5, 0, 255).astype(np.uint8)
        edge = cv2.Canny(u8, 100, 200) > 0
        h = hint[..., 0] > 0.5
        h_dil = cv2.dilate(h.astype(np.uint8), kernel) > 0
        e_dil = cv2.dilate(edge.astype(np.uint8), kernel) > 0
        precs.append((edge & h_dil).sum() / max(edge.sum(), 1))
        recs.append((h & e_dil).sum() / max(h.sum(), 1))
    return {"edge_precision": float(np.mean(precs)),
            "edge_recall": float(np.mean(recs))}


def stage_eval():
    import numpy as np

    from tools.eval_metrics import ffd_with_ci
    from tools.sample_ddpm_controlnet import gather_test_hints

    from controlnet_tpu import cli, config as cfg

    cli.setup_jax()
    train = _load_real("train")
    test = _load_real("test")
    samples = _sample_uncond(N_SAMPLES)
    rows: dict = {
        "dataset": "sklearn load_digits (UCI handwritten digits, real scans)",
        "n_train": int(len(train)), "n_test": int(len(test)),
        "n_samples": int(len(samples)), "epochs": EPOCHS, "cn_epochs": CN_EPOCHS,
    }

    # FFD of generated samples vs held-out REAL digits, with context rows:
    # the real-data floor (train vs test — the best any generator could do)
    # and a uniform-noise baseline (what "not converged" looks like).
    rows["ffd_samples_vs_test"] = ffd_with_ci(samples, test, 1)
    rows["ffd_floor_train_vs_test"] = ffd_with_ci(train[: len(samples)], test, 1)
    noise = np.random.default_rng(0).uniform(-1, 1, samples.shape).astype(np.float32)
    rows["ffd_noise_vs_test"] = ffd_with_ci(noise, test, 1)

    # ControlNet hint adherence on real test hints, with the unconditional
    # samples as the null (same metric, hints they were NOT conditioned on).
    config = cfg.load_config(os.path.join(WS, "digits.yaml"))
    test_ds = cli.build_dataset("mnist", cfg.dataset_params(config), "test",
                                return_hints=True)
    hints = gather_test_hints(test_ds, SAMPLE_BATCH, seed=0)
    cn_samples = _sample_cn(hints)
    rows["cn_hint_adherence"] = _edge_agreement(cn_samples, hints)
    rows["null_uncond_adherence"] = _edge_agreement(samples[:SAMPLE_BATCH], hints)

    os.makedirs(os.path.dirname(RESULTS), exist_ok=True)
    with open(RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


def _load_uncond_stack():
    """Config + trained DDPM checkpoint loaded ONCE for the whole
    eval_ddim ladder (the 2-solver x N-step sweep reuses it)."""
    from controlnet_tpu import config as cfg
    from controlnet_tpu.models.unet import UNet
    from controlnet_tpu.schedules.linear import make_linear_schedule
    from tools.sample_ddpm import load_unet_params

    config = cfg.load_config(os.path.join(WS, "digits.yaml"))
    mc = cfg.model_params(config)
    dc = cfg.diffusion_params(config)
    sched = make_linear_schedule(dc["num_timesteps"], dc["beta_start"], dc["beta_end"])
    unet = UNet(mc["im_channels"], mc)
    params = load_unet_params(cfg.train_params(config)["task_name"],
                              cfg.train_params(config)["ddpm_ckpt_name"], unet)
    shape = (SAMPLE_BATCH, mc["im_size"], mc["im_size"], mc["im_channels"])
    return unet, params, sched, shape, dc


def _sample_uncond_timed(stack, n: int, ddim_steps: int | None,
                         eta: float = 0.0, solver: str = "ddim"):
    """n unconditional samples from the trained DDPM ckpt; per-batch seconds.

    ``ddim_steps=None`` runs the 1000-step ancestral sampler (the teacher
    convention), else the few-step loop (``solver``: "ddim" | "dpm") — all
    are ONE jit execution per batch (the whole scan), so the wall-clock per
    batch is a sound timing (verify-skill timing trap: per-op dispatch
    timing is not).  The first batch includes compile and is reported
    separately.
    """
    import time

    import jax
    import numpy as np

    from controlnet_tpu.sample import make_few_step_sampler
    from controlnet_tpu.sample.ddpm import make_ddpm_sampler

    unet, params, sched, shape, dc = stack
    if ddim_steps is None:
        sampler = make_ddpm_sampler(lambda p, x, t: unet(p, x, t), sched, shape,
                                    record_every=dc["num_timesteps"])
        tag = "ancestral"
    else:
        sampler = make_few_step_sampler(solver, lambda p, x, t: unet(p, x, t),
                                        sched, shape, num_steps=ddim_steps, eta=eta)
        tag = f"{solver}{ddim_steps}"
    outs, secs = [], []
    for b0 in range(0, n, SAMPLE_BATCH):
        t0 = time.perf_counter()
        x0, _ = sampler(params, jax.random.PRNGKey(1000 + b0))
        outs.append(np.asarray(jax.device_get(x0)))  # fetch = the only sound sync
        secs.append(time.perf_counter() - t0)
        print(f"[{tag}] sampled {min(b0 + SAMPLE_BATCH, n)}/{n}"
              f" ({secs[-1]:.2f}s/batch)", flush=True)
    return np.concatenate(outs)[:n], secs


def _sample_cn_ddim(hints: "np.ndarray", ddim_steps: int) -> "np.ndarray":
    """Hint-conditioned DDIM samples from the real-data ControlNet ckpt."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from controlnet_tpu import config as cfg
    from controlnet_tpu.models.controlnet import ControlNet
    from controlnet_tpu.sample.ddim import make_ddim_sampler
    from controlnet_tpu.schedules.linear import make_linear_schedule
    from tools.train_ddpm_controlnet import load_controlnet_params

    config = cfg.load_config(os.path.join(WS, "digits.yaml"))
    mc = cfg.model_params(config)
    dc = cfg.diffusion_params(config)
    tc = cfg.train_params(config)
    sched = make_linear_schedule(dc["num_timesteps"], dc["beta_start"], dc["beta_end"])
    cn = ControlNet(mc["im_channels"], mc, model_locked=True)
    params = load_controlnet_params(tc["task_name"], tc["controlnet_ckpt_name"], cn,
                                    fallback_unet_ckpt=tc["ddpm_ckpt_name"])
    shape = (len(hints), mc["im_size"], mc["im_size"], mc["im_channels"])
    hint_feats = jax.jit(cn.hint_features)(params, jnp.asarray(hints))
    sampler = make_ddim_sampler(lambda p, x, t, f: cn(p, x, t, hint_features=f),
                                sched, shape, num_steps=ddim_steps)
    x0, _ = sampler(params, jax.random.PRNGKey(7), hint_feats)
    return np.asarray(jax.device_get(x0))


def stage_eval_ddim():
    """Few-step DDIM from the SAME real-data checkpoints: quality ladder +
    measured speed vs the 1000-step ancestral sampler (additive capability
    over the reference's ancestral-only sampling)."""
    import numpy as np

    from tools.eval_metrics import ffd_with_ci
    from tools.sample_ddpm_controlnet import gather_test_hints

    from controlnet_tpu import cli, config as cfg

    cli.setup_jax()
    test = _load_real("test")
    steps_ladder = [int(s) for s in os.environ.get(
        "REALDATA_DDIM_STEPS", "10,25,50,100").split(",")]

    rows: dict = {"n_test": int(len(test)), "n_samples": int(N_SAMPLES),
                  "batch": SAMPLE_BATCH, "eta": 0.0,
                  "per_batch_seconds_note":
                      "first batch includes jit compile; steady = median of the rest"}

    teacher = None
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            teacher = json.load(f)

    # ancestral timing context on the same ckpt/protocol (FFD context comes
    # from the committed stage-eval artifact: same ckpt, same test split)
    stack = _load_uncond_stack()
    anc_n = min(N_SAMPLES, 2 * SAMPLE_BATCH)
    _, anc_secs = _sample_uncond_timed(stack, anc_n, None)
    rows["ancestral_1000step"] = {
        "per_batch_seconds": [round(s, 3) for s in anc_secs],
        "steady_sec_per_batch": float(np.median(anc_secs[1:]) if len(anc_secs) > 1
                                      else anc_secs[0]),
    }
    if teacher is not None:
        rows["ancestral_1000step"]["ffd_vs_test"] = teacher["ffd_samples_vs_test"]
        rows["context_floor"] = teacher["ffd_floor_train_vs_test"]
        rows["context_noise"] = teacher["ffd_noise_vs_test"]

    for solver in ("ddim", "dpm"):
        rows[solver] = {}
        for steps in steps_ladder:
            samples, secs = _sample_uncond_timed(stack, N_SAMPLES, steps,
                                                 solver=solver)
            rows[solver][str(steps)] = {
                "ffd_vs_test": ffd_with_ci(samples, test, 1),
                "per_batch_seconds": [round(s, 3) for s in secs],
                "steady_sec_per_batch": float(np.median(secs[1:]) if len(secs) > 1
                                              else secs[0]),
            }
            print(f"{solver} {steps}-step: FFD "
                  f"{rows[solver][str(steps)]['ffd_vs_test']}", flush=True)

    # ControlNet leg: DDIM 50-step on real test hints, hint adherence vs the
    # committed 1000-step ControlNet row
    config = cfg.load_config(os.path.join(WS, "digits.yaml"))
    test_ds = cli.build_dataset("mnist", cfg.dataset_params(config), "test",
                                return_hints=True)
    hints = gather_test_hints(test_ds, SAMPLE_BATCH, seed=0)
    cn_steps = int(os.environ.get("REALDATA_DDIM_CN_STEPS", "50"))
    cn_samples = _sample_cn_ddim(hints, cn_steps)
    rows["cn_ddim"] = {"steps": cn_steps,
                       "hint_adherence": _edge_agreement(cn_samples, hints)}
    if teacher is not None:
        rows["cn_ddim"]["context_ancestral_adherence"] = teacher["cn_hint_adherence"]

    out = os.environ.get("REALDATA_DDIM_RESULTS",
                         os.path.join(REPO, "docs", "artifacts",
                                      "realdata_ddim_r5.json"))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


def stage_distill():
    _run_tool("tools.train_consistency_controlnet_distilled")
    _run_tool("tools.sample_consistency_controlnet_distilled",
              "--mode", "test", "--num_samples", "10")
    _run_tool("tools.train_distribution_matching_controlnet_distilled")
    _run_tool("tools.sample_distribution_matching_controlnet_distilled",
              "--mode", "test", "--num_samples", "10")
    _run_tool("tools.compare_all_controlnet_models", "--num_samples", "5")


def _sample_students(hints: "np.ndarray") -> "dict[str, np.ndarray]":
    """N_DISTILL single-step samples per distilled student, real test hints."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from controlnet_tpu import config as cfg
    from controlnet_tpu.models.consistency import ConsistencyDistilled
    from controlnet_tpu.models.dmd import DistributionMatchingControlNet
    from tools.sample_consistency_controlnet_distilled import (
        load_student as load_cd_student)
    from tools.sample_distribution_matching_controlnet_distilled import (
        load_student as load_dmd_student)

    config = cfg.load_config(os.path.join(WS, "digits.yaml"))
    mc = cfg.model_params(config)
    dc = cfg.diffusion_params(config)
    tc = cfg.train_params(config)
    im_size, im_ch = mc["im_size"], mc["im_channels"]

    cd = ConsistencyDistilled(im_ch, mc, use_ddpm_teacher=False)
    cd_params = load_cd_student(tc["task_name"], cd)
    dmd = DistributionMatchingControlNet(im_ch, mc)
    dmd_params = load_dmd_student(tc["task_name"], dmd, use_best=True)

    cd_gen = jax.jit(lambda p, h, k: cd.generate(
        {"student": p}, h, (h.shape[0], im_size, im_size, im_ch), k, num_steps=1))

    T = dc["num_timesteps"]

    @jax.jit
    def dmd_gen(p, h, k):
        x_t = jax.random.normal(k, (h.shape[0], im_size, im_size, im_ch))
        t = jnp.full((h.shape[0],), T - 1, jnp.int32)
        return dmd(p, x_t, t, h)

    out = {"consistency": [], "dmd": []}
    for b0 in range(0, len(hints), SAMPLE_BATCH):
        hb = jnp.asarray(hints[b0:b0 + SAMPLE_BATCH])
        k = jax.random.PRNGKey(5000 + b0)
        out["consistency"].append(np.asarray(cd_gen(cd_params, hb, k)))
        out["dmd"].append(np.asarray(dmd_gen(dmd_params, hb, k)))
    return {name: np.concatenate(chunks) for name, chunks in out.items()}


def stage_eval_distill():
    import numpy as np

    from tools.eval_metrics import ffd_with_ci
    from tools.sample_ddpm_controlnet import gather_test_hints

    from controlnet_tpu import cli, config as cfg

    cli.setup_jax()
    test = _load_real("test")
    config = cfg.load_config(os.path.join(WS, "digits.yaml"))
    test_ds = cli.build_dataset("mnist", cfg.dataset_params(config), "test",
                                return_hints=True)
    hints = gather_test_hints(test_ds, N_DISTILL, seed=0)
    students = _sample_students(hints)

    rows: dict = {"n_test": int(len(test)), "n_samples": int(N_DISTILL),
                  "cd_epochs": CD_EPOCHS, "dmd_epochs": DMD_EPOCHS,
                  "steps_per_sample": 1}
    for name, samples in students.items():
        rows[name] = {
            "ffd_vs_test": ffd_with_ci(samples, test, 1),
            "hint_adherence": _edge_agreement(samples, hints),
        }

    # context rows from the teacher-stage artifact (1000-step DDPM numbers
    # on the same data), if it exists
    if os.path.exists(RESULTS):
        teacher = json.load(open(RESULTS))
        rows["context_teacher_1000step"] = {
            "ffd_samples_vs_test": teacher["ffd_samples_vs_test"],
            "ffd_floor_train_vs_test": teacher["ffd_floor_train_vs_test"],
            "ffd_noise_vs_test": teacher["ffd_noise_vs_test"],
            "cn_hint_adherence": teacher["cn_hint_adherence"],
            "null_uncond_adherence": teacher["null_uncond_adherence"],
        }

    # the comparison tool's measured per-model timings on these real-data
    # checkpoints (written by stage distill)
    perf = os.path.join(WS, "run", "all_model_comparison",
                        "performance_metrics.txt")
    if os.path.exists(perf):
        rows["compare_tool_metrics"] = open(perf).read().splitlines()

    os.makedirs(os.path.dirname(DISTILL_RESULTS), exist_ok=True)
    with open(DISTILL_RESULTS, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))


STAGES = {"data": stage_data, "train": stage_train, "sample": stage_sample,
          "cn": stage_cn, "eval": stage_eval, "eval_ddim": stage_eval_ddim,
          "distill": stage_distill, "eval_distill": stage_eval_distill}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    _write_config()  # every invocation, so env knobs (epochs etc.) always apply
    if which == "all":
        for name, fn in STAGES.items():
            print(f"=== stage {name} ===", flush=True)
            fn()
        return
    if which not in STAGES:
        raise SystemExit(f"unknown stage {which!r}; one of {list(STAGES)} or 'all'")
    STAGES[which]()


if __name__ == "__main__":
    main()
