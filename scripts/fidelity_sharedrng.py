"""Shared-RNG, shared-init cross-stack control for the consistency stage.

Round 3 measured cross-stack FFD ~10.5 for the consistency-distilled
student — ABOVE the half-vs-half noise floors — and round 4 added two
controls (cross-teacher: teacher lineage moves the student by FFD 0.23;
within-stack seed control: two seeds of OUR OWN stack land FFD 9.5 apart).
Together they argue the gap is training-run variance.  This script is the
third, definitive control: remove ALL run-to-run variance and measure what
is left, which is the framework numerics alone.

Both stacks train the SAME distillation protocol
(/root/reference/tools/train_consistency_controlnet_distilled.py:85-141,
/root/reference/models/consistency_controlnet_distilled.py:295-365) with
every stochastic input pinned to one externally materialized numpy stream:

  * student init      — the torch reference's random init, imported into
                        our tree via io/torch_import.import_distilled_student
  * teacher weights   — ONE ControlNet (trained in this stack, exported via
                        io/torch_export.export_controlnet; the torch side
                        loads the exported .pth, our side round-trips it
                        through import_controlnet so both see the same bits)
  * data order        — per-epoch permutations drawn once in numpy
  * sigma draws       — u ~ U(0,1) drawn once, sigma = exp(lerp(log-range))
  * training noise    — N(0,1) tensors drawn once (torch side injected by
                        patching torch.randn_like around distillation_loss;
                        our side via the ``noise=`` argument)
  * sampling noise    — one shared x_T set for the 1-step samplers

With identical math the two trainers should produce near-identical loss
trajectories (float-accumulation divergence only) and students whose
1-step samples, drawn from the SAME x_T, are near-identical pixelwise —
i.e. cross-stack FFD collapses from ~10.5 to ~0, far BELOW the noise
floors.  If it does, the round-3/4 verdict ("equal-quality different
draws; the training RNG stream is the whole story") is proven by direct
measurement.

Stages (each a separate process — the ref stages put /root/reference on
sys.path, which shadows this repo's ``tools``):

  python scripts/fidelity_sharedrng.py data      # synthetic dataset + arrays
  python scripts/fidelity_sharedrng.py teacher   # train ours DDPM+CN, export torch teacher
  python scripts/fidelity_sharedrng.py streams   # materialize every random draw
  python scripts/fidelity_sharedrng.py init      # torch student init -> .pth
  python scripts/fidelity_sharedrng.py ref_train # torch replay training + sampling
  python scripts/fidelity_sharedrng.py ours_train# our replay training + sampling
  python scripts/fidelity_sharedrng.py eval      # FFD/CIs/param-distance report

The reference is imported READ-ONLY from /root/reference (same pattern as
scripts/fidelity_parity.py and bench.py).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def _env_int(name: str, default: int) -> int:
    return int(os.environ.get(f"SHAREDRNG_{name}", default))


# SHAREDRNG_FULLCFG=1 reruns the whole protocol at the REAL mnist.yaml
# architecture (/root/reference/config/mnist.yaml:13-24 — 28x28, down
# [32,64,128,256], mid [256,256,128], T=1000) instead of the scaled-down
# 16x16 model, closing the last inferential gap in the fidelity story
# (VERDICT r4 next-round #1).  The torch-CPU replay costs ~17 s/step at
# batch 16 on this 1-core host, so the full-config run uses fewer, smaller
# steps — the comparison is about training NUMERICS (loss trajectories,
# param-space distance), which a few hundred steps pin down.
FULLCFG = os.environ.get("SHAREDRNG_FULLCFG", "0") == "1"

WS = os.environ.get(
    "SHAREDRNG_WS",
    os.path.join(REPO, "fidelity_ws_sr_full" if FULLCFG else "fidelity_ws_sr"))
RESULTS_DIR = os.path.join(REPO, "fidelity_ws")
RESULTS_NAME = ("fidelity_cd_sharedrng_full_results.json" if FULLCFG
                else "fidelity_cd_sharedrng_results.json")

IM_SIZE = 28 if FULLCFG else 16
PER_CLASS = _env_int("PER_CLASS", 128 if FULLCFG else 256)
TEST_PER_CLASS = _env_int("TEST_PER_CLASS", 64 if FULLCFG else 128)
N_SAMPLES = _env_int("N_SAMPLES", 256 if FULLCFG else 512)
BATCH = _env_int("BATCH", 16 if FULLCFG else 64)
DDPM_EPOCHS = _env_int("DDPM_EPOCHS", 12)   # teacher protocol == fidelity_parity.py
CN_EPOCHS = _env_int("CN_EPOCHS", 6)
CD_EPOCHS = _env_int("CD_EPOCHS", 8)
LR = 1e-4
SIGMA_MIN, SIGMA_MAX = 0.002, 80.0
SEED_STREAM = 77
SEED_INIT = 55

if FULLCFG:
    # The REAL architecture, read from this repo's config/mnist.yaml (whose
    # model_params mirror /root/reference/config/mnist.yaml:13-24 exactly)
    # so the replay can never drift from what the tools actually train.
    import yaml as _yaml

    with open(os.path.join(REPO, "config", "mnist.yaml")) as _f:
        MODEL_PARAMS = _yaml.safe_load(_f)["model_params"]
    assert MODEL_PARAMS["im_size"] == IM_SIZE
else:
    MODEL_PARAMS = {
        "im_channels": 1, "im_size": IM_SIZE, "hint_channels": 3,
        "down_channels": [16, 32], "mid_channels": [32, 16],
        "down_sample": [True], "time_emb_dim": 32,
        "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
        "num_heads": 4,
    }

CONFIG = {
    "dataset_params": {
        "task_name": "mnist",
        "im_path": os.path.join(WS, "data", "train"),
        "im_test_path": os.path.join(WS, "data", "test"),
        "canny_im_size": IM_SIZE,
    },
    "diffusion_params": {"num_timesteps": 1000, "beta_start": 0.0001, "beta_end": 0.02},
    "model_params": MODEL_PARAMS,
    "train_params": {
        "task_name": os.path.join(WS, "teacher_task"),
        "batch_size": BATCH, "num_epochs": DDPM_EPOCHS,
        "controlnet_epochs": CN_EPOCHS, "num_samples": 25,
        "num_grid_rows": 5, "ddpm_lr": LR, "controlnet_lr": LR, "seed": 3,
        "ddpm_ckpt_name": "ddpm_ckpt.pth",
        "controlnet_ckpt_name": "controlnet_ckpt.pth",
    },
}

assert (4 * PER_CLASS) % BATCH == 0, \
    f"BATCH={BATCH} must divide the {4 * PER_CLASS}-image train set " \
    "(iterate_batches drops the trailing partial batch, which would " \
    "desync the stream permutations from the materialized arrays)"
assert N_SAMPLES <= 4 * TEST_PER_CLASS, \
    f"N_SAMPLES={N_SAMPLES} exceeds the {4 * TEST_PER_CLASS}-image test set"

STEPS_PER_EPOCH = 4 * PER_CLASS // BATCH
TOTAL_STEPS = CD_EPOCHS * STEPS_PER_EPOCH

TEACHER_PTH = os.path.join(WS, "teacher_torch.pth")
INIT_PTH = os.path.join(WS, "student_init.pth")
REF_FINAL_PTH = os.path.join(WS, "student_ref_final.pth")
ARRAYS_NPZ = os.path.join(WS, "train_arrays.npz")
HINTS_NPZ = os.path.join(WS, "test_hints.npz")
STREAMS_NPZ = os.path.join(WS, "streams.npz")


def _sigmas_from_u(u):
    import numpy as np

    log_lo, log_hi = np.log(SIGMA_MIN), np.log(SIGMA_MAX)
    return np.exp(log_lo + u * (log_hi - log_lo)).astype("float32")


def stage_data():
    import numpy as np

    from controlnet_tpu.data.datasets import MnistDataset, iterate_batches
    from controlnet_tpu.data.synthetic import make_synthetic_image_tree

    make_synthetic_image_tree(os.path.join(WS, "data", "train"),
                              num_classes=4, per_class=PER_CLASS, size=IM_SIZE, seed=0)
    make_synthetic_image_tree(os.path.join(WS, "data", "test"),
                              num_classes=4, per_class=TEST_PER_CLASS, size=IM_SIZE, seed=1)

    # Materialize (image, cv2-hint) arrays ONCE so both replays feed
    # bit-identical batches (no per-stack dataset code in the loop).
    def dump(split, out, n):
        ds = MnistDataset(split, os.path.join(WS, "data", split), return_hints=True)
        ims, hints = [], []
        for im, h in iterate_batches(ds, BATCH, shuffle=False):
            ims.append(np.asarray(im))
            hints.append(np.asarray(h))
        ims = np.concatenate(ims)[:n].astype("float32")
        hints = np.concatenate(hints)[:n].astype("float32")
        np.savez(out, images=ims, hints=hints)
        return ims.shape, hints.shape

    print("train arrays:", dump("train", ARRAYS_NPZ, 4 * PER_CLASS))
    print("test arrays:", dump("test", HINTS_NPZ, N_SAMPLES))


def stage_teacher():
    """Train the shared teacher chain in THIS stack (DDPM -> ControlNet at
    the fidelity-protocol scale), then export the ControlNet to a torch
    state_dict both sides will load."""
    import types

    import torch
    import yaml

    from controlnet_tpu.io.checkpoint import latest_checkpoint

    task = CONFIG["train_params"]["task_name"]
    os.makedirs(task, exist_ok=True)
    cfgp = os.path.join(WS, "teacher.yaml")
    with open(cfgp, "w") as f:
        yaml.safe_dump(CONFIG, f)

    from tools.train_ddpm import train as train_ddpm

    if latest_checkpoint(task, "ddpm_ckpt.pth") != DDPM_EPOCHS:
        train_ddpm(types.SimpleNamespace(config_path=cfgp))
    print("teacher DDPM trained")

    from tools.train_ddpm_controlnet import train as train_cn

    if latest_checkpoint(task, "controlnet_ckpt.pth") != CN_EPOCHS:
        train_cn(types.SimpleNamespace(config_path=cfgp, hint_backend="cv2"))
    print("teacher ControlNet trained")

    import jax
    import numpy as np

    from controlnet_tpu.io.torch_export import export_controlnet
    from controlnet_tpu.models.controlnet import ControlNet
    from tools.train_ddpm_controlnet import load_controlnet_params

    cn = ControlNet(1, MODEL_PARAMS)
    params = load_controlnet_params(task, "controlnet_ckpt.pth", cn)
    sd = export_controlnet(jax.tree.map(np.asarray, params), cn)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
               TEACHER_PTH)
    print("teacher exported:", TEACHER_PTH)


def stage_streams():
    import numpy as np

    rng = np.random.default_rng(SEED_STREAM)
    perms = np.stack([rng.permutation(4 * PER_CLASS) for _ in range(CD_EPOCHS)])
    u = rng.random((TOTAL_STEPS, BATCH), dtype=np.float32)
    noise = rng.standard_normal(
        (TOTAL_STEPS, BATCH, IM_SIZE, IM_SIZE, 1), dtype=np.float32)
    x_T = rng.standard_normal((N_SAMPLES, IM_SIZE, IM_SIZE, 1), dtype=np.float32)
    np.savez(STREAMS_NPZ, perms=perms, u=u, noise=noise, x_T=x_T)
    print(f"streams: {TOTAL_STEPS} steps x batch {BATCH}, {N_SAMPLES} x_T -> {STREAMS_NPZ}")


def stage_init():
    """The torch reference's random student init is the shared init."""
    import torch

    sys.path.insert(0, "/root/reference")
    from models.consistency_controlnet_distilled import (
        ConsistencyControlNetDistilled,
    )

    torch.manual_seed(SEED_INIT)
    model = ConsistencyControlNetDistilled(MODEL_PARAMS, TEACHER_PTH,
                                           device=torch.device("cpu"))
    torch.save(model.student.state_dict(), INIT_PTH)
    print("shared student init saved:", INIT_PTH)


def _batches():
    """Yield (step, idx, sigma, noise) from the materialized streams."""
    import numpy as np

    s = np.load(STREAMS_NPZ)
    step = 0
    for ep in range(CD_EPOCHS):
        perm = s["perms"][ep]
        for b in range(STEPS_PER_EPOCH):
            idx = perm[b * BATCH:(b + 1) * BATCH]
            yield step, idx, _sigmas_from_u(s["u"][step]), s["noise"][step]
            step += 1


def stage_ref_train():
    """Replay the reference trainer's exact step
    (train_consistency_controlnet_distilled.py:100-141: distillation_loss
    -> EMA update -> backward -> Adam step) with the shared streams."""
    import numpy as np
    import torch
    from torch.optim import Adam

    sys.path.insert(0, "/root/reference")
    from models.consistency_controlnet_distilled import (
        ConsistencyControlNetDistilled,
    )

    data = np.load(ARRAYS_NPZ)
    ims = torch.from_numpy(data["images"]).permute(0, 3, 1, 2)
    hints = torch.from_numpy(data["hints"]).permute(0, 3, 1, 2)

    model = ConsistencyControlNetDistilled(MODEL_PARAMS, TEACHER_PTH,
                                           device=torch.device("cpu"))
    init_sd = torch.load(INIT_PTH)
    model.student.load_state_dict(init_sd)
    model.ema_teacher.load_state_dict(init_sd)
    model.train()
    opt = Adam(model.student.parameters(), lr=LR)

    losses = []
    orig_randn_like = torch.randn_like
    for step, idx, sigma, noise in _batches():
        x0, hint = ims[idx], hints[idx]
        noise_t = torch.from_numpy(noise).permute(0, 3, 1, 2)
        opt.zero_grad()
        # distillation_loss draws its noise via torch.randn_like
        # (consistency_controlnet_distilled.py:303) — inject the stream.
        torch.randn_like = lambda t, *a, **k: noise_t
        try:
            total, recon, dist = model.distillation_loss(
                x0, hint, torch.from_numpy(sigma))
        finally:
            torch.randn_like = orig_randn_like
        model.update_ema_teacher()   # pre-step student, reference order
        total.backward()
        opt.step()
        losses.append(float(total))
        if step % 16 == 0:
            print(f"ref step {step}/{TOTAL_STEPS} loss {float(total):.6f}", flush=True)

    torch.save(model.student.state_dict(), REF_FINAL_PTH)
    with open(os.path.join(WS, "ref_losses.json"), "w") as f:
        json.dump(losses, f)

    # 1-step sampling from the SHARED x_T on the held-out hints
    # (generate()'s num_steps=1 path, :380-389, with x_T injected).
    s = np.load(STREAMS_NPZ)
    test = np.load(HINTS_NPZ)
    outs = []
    model.eval()
    with torch.no_grad():
        for b0 in range(0, N_SAMPLES, BATCH):
            x_T = torch.from_numpy(s["x_T"][b0:b0 + BATCH]).permute(0, 3, 1, 2)
            hint = torch.from_numpy(test["hints"][b0:b0 + BATCH]).permute(0, 3, 1, 2)
            sigma = torch.full((x_T.shape[0],), SIGMA_MAX)
            x0 = model.student(x_T, sigma, hint)
            outs.append(((x0.clamp(-1, 1) + 1) / 2).permute(0, 2, 3, 1).numpy())
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ref_sr_samples"))
    print("reference shared-RNG student trained + sampled")


def stage_ours_train():
    """Replay the same step in THIS stack: identical init (imported),
    identical teacher (round-tripped through the exported state_dict),
    identical streams via the ``noise=`` injection hook.

    Default backend is CPU for the tightest f32 comparison with the torch
    CPU side (invoke with ``PYTHONPATH= JAX_PLATFORMS=cpu`` — the axon
    sitecustomize imports jax before a setdefault here could take effect).
    Set SHAREDRNG_BACKEND=tpu (bare python, serialized with other TPU
    jobs) to run the identical replay on the real chip instead: outputs
    gain a ``_tpu`` suffix and stage_eval adds rows quantifying the
    deployment hardware's end-to-end training numerics vs torch CPU f32."""
    backend = os.environ.get("SHAREDRNG_BACKEND", "cpu")
    import jax

    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        assert jax.default_backend() == backend, (
            f"wanted {backend}, got {jax.default_backend()}")
    suffix = "" if backend == "cpu" else f"_{backend}"
    import jax.numpy as jnp
    import numpy as np
    import optax

    from controlnet_tpu.io.torch_export import export_distilled_student
    from controlnet_tpu.io.torch_import import (import_controlnet,
                                                import_distilled_student,
                                                load_torch_state_dict)
    from controlnet_tpu.models.consistency import ConsistencyDistilled

    model = ConsistencyDistilled(1, MODEL_PARAMS, use_ddpm_teacher=True)
    student_init = import_distilled_student(load_torch_state_dict(INIT_PTH),
                                            model.student)
    teacher = import_controlnet(load_torch_state_dict(TEACHER_PTH), model.teacher)
    p = {"student": student_init,
         "ema_teacher": jax.tree.map(jnp.copy, student_init),
         "teacher": teacher}

    tx = optax.adam(LR)  # torch Adam defaults: b1=.9 b2=.999 eps=1e-8
    opt_state = tx.init(p["student"])
    dummy_key = jax.random.PRNGKey(0)

    @jax.jit
    def train_step(p, opt_state, x0, hint, sigma, noise):
        def loss_fn(sp):
            total, recon, dist = model.distillation_loss(
                {**p, "student": sp}, x0, hint, sigma, dummy_key, noise=noise)
            return total, (recon, dist)

        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(p["student"])
        p2 = model.update_ema(p)  # pre-step student, reference order
        updates, opt_state = tx.update(grads, opt_state, p2["student"])
        new_student = optax.apply_updates(p2["student"], updates)
        return {**p2, "student": new_student}, opt_state, total

    data = np.load(ARRAYS_NPZ)
    losses = []
    for step, idx, sigma, noise in _batches():
        p, opt_state, total = train_step(
            p, opt_state, data["images"][idx], data["hints"][idx],
            jnp.asarray(sigma), jnp.asarray(noise))
        losses.append(float(total))
        if step % 16 == 0:
            print(f"ours step {step}/{TOTAL_STEPS} loss {float(total):.6f}", flush=True)

    with open(os.path.join(WS, f"ours_losses{suffix}.json"), "w") as f:
        json.dump(losses, f)
    # export the final student in torch-key space for the param-distance leg
    sd = export_distilled_student(jax.tree.map(np.asarray, p["student"]), model.student)
    np.savez(os.path.join(WS, f"ours_student_final{suffix}.npz"),
             **{k: np.asarray(v) for k, v in sd.items()})

    s = np.load(STREAMS_NPZ)
    test = np.load(HINTS_NPZ)
    sample = jax.jit(lambda sp, x, sg, h: model.student(sp, x, sg, h))
    outs = []
    for b0 in range(0, N_SAMPLES, BATCH):
        x_T = s["x_T"][b0:b0 + BATCH]
        sigma = jnp.full((x_T.shape[0],), SIGMA_MAX, jnp.float32)
        x0 = sample(p["student"], x_T, sigma, test["hints"][b0:b0 + BATCH])
        outs.append((np.clip(np.asarray(x0), -1, 1) + 1) / 2)
    _save_pngs(np.concatenate(outs), os.path.join(WS, f"ours_sr_samples{suffix}"))
    print(f"our shared-RNG student trained + sampled ({backend})")


def _save_pngs(arr01, out_dir: str):
    import numpy as np
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for i, im in enumerate(arr01):
        Image.fromarray((np.clip(im[..., 0], 0, 1) * 255).astype("uint8"), "L").save(
            os.path.join(out_dir, f"{i:04d}.png"))


def stage_eval():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")  # sitecustomize-proof (see ours_train)
    import numpy as np
    import torch

    from tools.eval_metrics import evaluate, ffd_with_ci, load_images

    ref = load_images(os.path.join(WS, "ref_sr_samples"), 1)
    ours = load_images(os.path.join(WS, "ours_sr_samples"), 1)
    train_imgs = np.concatenate([
        load_images(os.path.join(WS, "data", "train", c), 1)
        for c in ("0", "1", "2", "3")])

    rows: dict = {"n_samples": int(min(len(ref), len(ours))),
                  "cd_epochs": CD_EPOCHS, "total_steps": TOTAL_STEPS,
                  "batch": BATCH, "im_size": IM_SIZE, "fullcfg": FULLCFG,
                  "model_params": MODEL_PARAMS}
    # cross comparison is PAIRED (row i of both sets comes from the same
    # x_T + hint), so the bootstrap must resample shared indices
    h = len(ref) // 2
    cross = ffd_with_ci(ours, ref, 1, paired=True)
    fl_r = ffd_with_ci(ref[:h], ref[h:], 1)
    fl_o = ffd_with_ci(ours[:h], ours[h:], 1)
    rows["ffd_sr_ours_vs_ref"] = cross["ffd"]
    rows["ffd_sr_noise_floor_ref_halves"] = fl_r["ffd"]
    rows["ffd_sr_noise_floor_ours_halves"] = fl_o["ffd"]
    rows["ffd_sr_ours_vs_ref_ci95_paired"] = [cross["ffd_ci_lo"], cross["ffd_ci_hi"]]
    rows["ffd_sr_noise_floor_ref_ci95"] = [fl_r["ffd_ci_lo"], fl_r["ffd_ci_hi"]]
    rows["ffd_sr_noise_floor_ours_ci95"] = [fl_o["ffd_ci_lo"], fl_o["ffd_ci_hi"]]
    rows["ffd_sr_below_floors"] = bool(
        rows["ffd_sr_ours_vs_ref"] < min(rows["ffd_sr_noise_floor_ref_halves"],
                                         rows["ffd_sr_noise_floor_ours_halves"]))
    rows["ffd_sr_ref_vs_train"] = evaluate(ref, train_imgs, 1)["ffd"]
    rows["ffd_sr_ours_vs_train"] = evaluate(ours, train_imgs, 1)["ffd"]
    rows["pixel_mae_ours_vs_ref"] = float(np.mean(np.abs(ours - ref)))

    # loss-trajectory agreement
    ref_l = np.array(json.load(open(os.path.join(WS, "ref_losses.json"))))
    ours_l = np.array(json.load(open(os.path.join(WS, "ours_losses.json"))))
    d = np.abs(ref_l - ours_l)
    rows["loss_step0_absdiff"] = float(d[0])
    rows["loss_first_epoch_max_absdiff"] = float(d[:STEPS_PER_EPOCH].max())
    rows["loss_final_step_absdiff"] = float(d[-1])
    rows["loss_mean_reldiff"] = float(np.mean(d / np.maximum(np.abs(ref_l), 1e-8)))

    # parameter-space distance: ours final vs ref final, in torch-key space,
    # contextualized by how far training moved the ref student from init
    ref_sd = {k: v.numpy().astype("float64")
              for k, v in torch.load(REF_FINAL_PTH).items()}
    init_sd = {k: v.numpy().astype("float64")
               for k, v in torch.load(INIT_PTH).items()}
    ours_sd = dict(np.load(os.path.join(WS, "ours_student_final.npz")))
    keys = sorted(ref_sd)
    assert sorted(ours_sd) == keys, "exported key set mismatch"
    num = sum(float(np.sum((ours_sd[k].astype("float64") - ref_sd[k]) ** 2)) for k in keys)
    den = sum(float(np.sum(ref_sd[k] ** 2)) for k in keys)
    moved = sum(float(np.sum((ref_sd[k] - init_sd[k]) ** 2)) for k in keys)
    rows["param_rel_l2_ours_vs_ref"] = float(np.sqrt(num / den))
    rows["param_divergence_over_training_movement"] = float(np.sqrt(num / moved))

    # Optional TPU-backend replay (SHAREDRNG_BACKEND=tpu run of ours_train):
    # the same streams trained on the real chip, quantifying the deployment
    # hardware's end-to-end training numerics against torch CPU f32.
    tpu_losses = os.path.join(WS, "ours_losses_tpu.json")
    if os.path.exists(tpu_losses):
        tl = np.array(json.load(open(tpu_losses)))
        dt = np.abs(ref_l - tl)
        rows["tpu_loss_step0_absdiff"] = float(dt[0])
        rows["tpu_loss_final_step_absdiff"] = float(dt[-1])
        rows["tpu_loss_mean_reldiff"] = float(
            np.mean(dt / np.maximum(np.abs(ref_l), 1e-8)))
        tpu_sd = dict(np.load(os.path.join(WS, "ours_student_final_tpu.npz")))
        num_t = sum(float(np.sum((tpu_sd[k].astype("float64") - ref_sd[k]) ** 2))
                    for k in keys)
        rows["tpu_param_rel_l2_vs_ref"] = float(np.sqrt(num_t / den))
        rows["tpu_param_divergence_over_training_movement"] = float(
            np.sqrt(num_t / moved))
        tpu_imgs = load_images(os.path.join(WS, "ours_sr_samples_tpu"), 1)
        rows["tpu_pixel_mae_vs_ref"] = float(np.mean(np.abs(tpu_imgs - ref)))
        tpu_cross = ffd_with_ci(tpu_imgs, ref, 1, paired=True)
        rows["ffd_sr_tpu_vs_ref"] = tpu_cross["ffd"]
        rows["ffd_sr_tpu_vs_ref_ci95_paired"] = [tpu_cross["ffd_ci_lo"],
                                                 tpu_cross["ffd_ci_hi"]]
        rows["ffd_sr_tpu_below_floors"] = bool(
            rows["ffd_sr_tpu_vs_ref"] < min(rows["ffd_sr_noise_floor_ref_halves"],
                                            rows["ffd_sr_noise_floor_ours_halves"]))

    out = os.path.join(RESULTS_DIR, RESULTS_NAME)
    os.makedirs(RESULTS_DIR, exist_ok=True)
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    os.makedirs(WS, exist_ok=True)
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    fns = {"data": stage_data, "teacher": stage_teacher, "streams": stage_streams,
           "init": stage_init, "ref_train": stage_ref_train,
           "ours_train": stage_ours_train, "eval": stage_eval}
    if stage not in fns:
        raise SystemExit(f"unknown stage {stage}; one of {list(fns)}")
    fns[stage]()
