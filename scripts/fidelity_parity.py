"""Fidelity-parity experiment: train the torch REFERENCE stack and THIS
stack on identical data + config, sample both, and compare sample-quality
metrics (VERDICT.md item 3; protocol per BASELINE.md and
/root/reference/tools/compare_all_controlnet_models.py:236-262).

No real MNIST exists in this offline environment, so both stacks train on
an identical synthetic shape dataset (data/synthetic.py) — 4 classes of
geometric shapes at 28x28, the same image contract as MNIST.  The model is
a scaled-down base UNet (down [16,32,64]) so the torch reference can train
in minutes on this host's single CPU core; every diffusion hyperparameter
(T=1000, beta schedule, lr, batch) matches config/mnist.yaml.

Stages (each resumable, state in fidelity_ws/):
  python scripts/fidelity_parity.py data          # build the shared dataset
  python scripts/fidelity_parity.py ref           # train + sample reference (torch CPU)
  python scripts/fidelity_parity.py ours          # train + sample this stack
  python scripts/fidelity_parity.py eval          # metrics table (tools/eval_metrics.py)

The reference is imported READ-ONLY from /root/reference (same pattern as
bench.py's baseline timing).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WS = os.environ.get("FIDELITY_WS", os.path.join(REPO, "fidelity_ws"))
N_SAMPLES = int(os.environ.get("FIDELITY_N", "128"))
EPOCHS = int(os.environ.get("FIDELITY_EPOCHS", "12"))
SAMPLE_BATCH = 64
IM_SIZE = int(os.environ.get("FIDELITY_IM_SIZE", "16"))
PER_CLASS = int(os.environ.get("FIDELITY_PER_CLASS", "256"))
# bf16 fidelity A/B (VERDICT r3 #2): set FIDELITY_COMPUTE_DTYPE=bfloat16 with
# a fresh FIDELITY_WS to train THIS stack's side in mixed precision; the
# reference side is unaffected (torch trainer ignores the additive key).
COMPUTE_DTYPE = os.environ.get("FIDELITY_COMPUTE_DTYPE")

CONFIG = {
    "dataset_params": {
        "task_name": "mnist",
        "im_path": os.path.join(WS, "data", "train"),
        "im_test_path": os.path.join(WS, "data", "test"),
        "canny_im_size": IM_SIZE,
    },
    "diffusion_params": {"num_timesteps": 1000, "beta_start": 0.0001, "beta_end": 0.02},
    "model_params": {
        # scaled to what the torch reference can train+sample on this
        # host's single CPU core in well under an hour; all diffusion
        # hyperparameters match config/mnist.yaml
        "im_channels": 1, "im_size": IM_SIZE, "hint_channels": 3,
        "down_channels": [16, 32], "mid_channels": [32, 16],
        "down_sample": [True], "time_emb_dim": 32,
        "num_down_layers": 1, "num_mid_layers": 1, "num_up_layers": 1,
        "num_heads": 4,
    },
    "train_params": {
        "task_name": None,  # per-stack, set below
        "batch_size": 64, "num_epochs": EPOCHS, "num_samples": 25,
        "num_grid_rows": 5, "ddpm_lr": 0.0001,
        "ddpm_ckpt_name": "ddpm_ckpt.pth", "seed": 0,
    },
}


def _write_config(task_dir: str) -> str:
    import copy

    import yaml

    cfg = copy.deepcopy(CONFIG)
    cfg["train_params"]["task_name"] = task_dir
    if COMPUTE_DTYPE:
        cfg["train_params"]["compute_dtype"] = COMPUTE_DTYPE
    path = os.path.join(WS, os.path.basename(task_dir) + ".yaml")
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


def stage_data():
    from controlnet_tpu.data.synthetic import make_synthetic_image_tree

    make_synthetic_image_tree(os.path.join(WS, "data", "train"),
                              num_classes=4, per_class=PER_CLASS, size=IM_SIZE, seed=0)
    make_synthetic_image_tree(os.path.join(WS, "data", "test"),
                              num_classes=4, per_class=64, size=IM_SIZE, seed=1)
    print("dataset ready:", WS)


def _save_pngs(arr01, out_dir: str):
    import numpy as np
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for i, im in enumerate(arr01):
        Image.fromarray((np.clip(im[..., 0], 0, 1) * 255).astype("uint8"), "L").save(
            os.path.join(out_dir, f"{i:04d}.png"))


def _shim_torchvision():
    """torchvision is not installed; the reference only uses
    transforms.ToTensor (dataset/mnist_dataset.py:51,62) — shim it."""
    import types as _types

    import numpy as np
    import torch

    if "torchvision" in sys.modules:
        return
    tv = _types.ModuleType("torchvision")
    tf = _types.ModuleType("torchvision.transforms")

    class ToTensor:
        def __call__(self, im):
            arr = np.asarray(im, dtype=np.float32) / 255.0
            if arr.ndim == 2:
                arr = arr[None]
            else:
                arr = arr.transpose(2, 0, 1)
            return torch.from_numpy(arr)

    tf.ToTensor = ToTensor
    tv.transforms = tf
    # distribution_matching_controlnet.py:7 imports torchvision.models but
    # never uses it — provide an empty submodule
    tm = _types.ModuleType("torchvision.models")
    tv.models = tm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tf
    sys.modules["torchvision.models"] = tm


def stage_ref():
    """Train + sample the torch reference (read-only import, CPU)."""
    import importlib.util

    import numpy as np
    import torch

    _shim_torchvision()
    sys.path.insert(0, "/root/reference")
    # the reference uses train_params.task_name both as dataset selector AND
    # output directory (train_ddpm.py:41-46,58) — run from a scratch cwd so
    # its "mnist/" output tree lands inside the workspace.
    run_dir = os.path.join(WS, "ref_run")
    os.makedirs(run_dir, exist_ok=True)
    os.chdir(run_dir)
    task = os.path.join(run_dir, "mnist")
    cfg_path = _write_config("mnist")

    spec = importlib.util.spec_from_file_location(
        "ref_train_ddpm", "/root/reference/tools/train_ddpm.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    ckpt = os.path.join(task, "ddpm_ckpt.pth")
    if not os.path.exists(ckpt):
        torch.manual_seed(0)

        class Args:
            config_path = cfg_path

        mod.train(Args())
    print("reference training done")

    # ---- sample without the reference's per-step PNG host loop (the math
    # is identical to tools/sample_ddpm.py:18-42; artifacts are final x0s)
    from models.unet_base import Unet  # reference, read-only
    from scheduler.linear_noise_scheduler import LinearNoiseScheduler

    model = Unet(CONFIG["model_params"]).eval()
    model.load_state_dict(torch.load(ckpt, map_location="cpu"))
    sched = LinearNoiseScheduler(1000, 0.0001, 0.02)
    torch.manual_seed(1)
    outs = []
    with torch.no_grad():
        for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
            nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
            xt = torch.randn(nb, 1, IM_SIZE, IM_SIZE)
            for i in reversed(range(1000)):
                noise_pred = model(xt, torch.as_tensor(i).unsqueeze(0))
                xt, _ = sched.sample_prev_timestep(xt, noise_pred, torch.as_tensor(i))
            outs.append(((xt.clamp(-1, 1) + 1) / 2).permute(0, 2, 3, 1).numpy())
            print(f"ref sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ref_samples"))
    print("reference samples written")


def stage_ours():
    """Train + sample this stack on the same data/config."""
    import types

    os.environ.setdefault("XLA_FLAGS", "--xla_cpu_parallel_codegen_split_count=1")
    import jax
    import numpy as np

    task = os.path.join(WS, "ours_task")
    cfg_path = _write_config(task)
    from controlnet_tpu.io.checkpoint import latest_checkpoint
    from tools.train_ddpm import train

    if latest_checkpoint(task, "ddpm_ckpt.pth") != EPOCHS:
        train(types.SimpleNamespace(config_path=cfg_path))
    print("our training done")

    from controlnet_tpu.models.unet import UNet
    from controlnet_tpu.sample.ddpm import make_ddpm_sampler
    from controlnet_tpu.schedules.linear import make_linear_schedule
    from tools.sample_ddpm import load_unet_params

    unet = UNet(1, CONFIG["model_params"])
    params = load_unet_params(task, "ddpm_ckpt.pth", unet)
    sched = make_linear_schedule(1000, 0.0001, 0.02)
    outs = []
    for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
        nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
        sampler = make_ddpm_sampler(lambda p, x, t: unet(p, x, t), sched,
                                    (nb, IM_SIZE, IM_SIZE, 1), record_every=1000)
        x0, _ = sampler(params, jax.random.PRNGKey(100 + b0))
        outs.append((np.clip(np.asarray(x0), -1, 1) + 1) / 2)
        print(f"ours sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ours_samples"))
    print("our samples written")



def _ci_rows(rows: dict, prefix: str, ref, ours) -> None:
    """Bootstrap 95% CIs (VERDICT r3 #5) for the cross-stack FFD and both
    within-stack half-vs-half noise floors; parity evidence is CI overlap,
    not just point-below-floor."""
    from tools.eval_metrics import ffd_with_ci

    h_r, h_o = len(ref) // 2, len(ours) // 2
    cross = ffd_with_ci(ours, ref, 1)
    fl_r = ffd_with_ci(ref[:h_r], ref[h_r:], 1)
    fl_o = ffd_with_ci(ours[:h_o], ours[h_o:], 1)
    rows[f"{prefix}ours_vs_ref_ci95"] = [cross["ffd_ci_lo"], cross["ffd_ci_hi"]]
    rows[f"{prefix}noise_floor_ref_ci95"] = [fl_r["ffd_ci_lo"], fl_r["ffd_ci_hi"]]
    rows[f"{prefix}noise_floor_ours_ci95"] = [fl_o["ffd_ci_lo"], fl_o["ffd_ci_hi"]]
    rows[f"{prefix}ci_overlap_cross_vs_floors"] = bool(
        cross["ffd_ci_lo"] <= max(fl_r["ffd_ci_hi"], fl_o["ffd_ci_hi"]))


def stage_eval():
    os.environ.setdefault("XLA_FLAGS", "--xla_cpu_parallel_codegen_split_count=1")
    import numpy as np

    from tools.eval_metrics import evaluate, load_images

    train_imgs = load_images(os.path.join(WS, "data", "train", "0"), 1)
    # pool all classes
    for cls in ("1", "2", "3"):
        train_imgs = np.concatenate(
            [train_imgs, load_images(os.path.join(WS, "data", "train", cls), 1)])
    ref = load_images(os.path.join(WS, "ref_samples"), 1)
    ours = load_images(os.path.join(WS, "ours_samples"), 1)

    rows = {}
    rows["ffd_ref_vs_train"] = evaluate(ref, train_imgs, 1)["ffd"]
    rows["ffd_ours_vs_train"] = evaluate(ours, train_imgs, 1)["ffd"]
    rows["ffd_ours_vs_ref"] = evaluate(ours, ref, 1)["ffd"]
    h = len(ref) // 2
    rows["ffd_noise_floor_ref_halves"] = evaluate(ref[:h], ref[h:], 1)["ffd"]
    rows["ffd_noise_floor_ours_halves"] = evaluate(ours[:h], ours[h:], 1)["ffd"]
    _ci_rows(rows, "ffd_", ref, ours)
    n = min(len(ours), len(ref))
    rows["lpips_ours_vs_ref"] = evaluate(ours[:n], ref[:n], 1)["lpips_mean"]
    rows["n_samples"] = n
    rows["epochs"] = EPOCHS
    out = os.path.join(WS, "fidelity_results.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=2)
    print(json.dumps(rows, indent=2))
    print("wrote", out)


CN_EPOCHS = int(os.environ.get("FIDELITY_CN_EPOCHS", "6"))


def _test_hints(n: int):
    """First ``n`` held-out (image, cv2-hint) pairs — the SAME conditioning
    for both stacks (the reference's random-hint gathering,
    sample_ddpm_controlnet.py:32-36, is made deterministic here so the
    comparison conditions match)."""
    import numpy as np

    from controlnet_tpu.data.datasets import MnistDataset, iterate_batches

    ds = MnistDataset("test", os.path.join(WS, "data", "test"), return_hints=True)
    ims, hints = [], []
    for im, h in iterate_batches(ds, SAMPLE_BATCH, shuffle=False):
        ims.append(im)
        hints.append(h)
        if sum(x.shape[0] for x in ims) >= n:
            break
    return (np.concatenate(ims)[:n], np.concatenate(hints)[:n])


def stage_ref_cn():
    """Train + sample the torch reference ControlNet (from the stage_ref
    DDPM checkpoint), 1000-step hint-conditioned sampling on fixed
    held-out hints."""
    import numpy as np
    import torch

    _shim_torchvision()
    run_dir = os.path.join(WS, "ref_run")
    os.chdir(run_dir)
    sys.path.insert(0, "/root/reference")
    cfg_path = _write_config("mnist")
    import importlib.util

    cn_ckpt = os.path.join(run_dir, "mnist", "controlnet_ckpt.pth")
    if not os.path.exists(cn_ckpt):
        # extend the shared CONFIG with the ControlNet keys the reference
        # trainer reads (train_ddpm_controlnet.py:74-76)
        import yaml

        with open(cfg_path) as f:
            c = yaml.safe_load(f)
        c["train_params"].update({"controlnet_epochs": CN_EPOCHS,
                                  "controlnet_lr": 0.0001,
                                  "controlnet_ckpt_name": "controlnet_ckpt.pth"})
        with open(cfg_path, "w") as f:
            yaml.safe_dump(c, f)
        spec = importlib.util.spec_from_file_location(
            "ref_train_cn", "/root/reference/tools/train_ddpm_controlnet.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        torch.manual_seed(3)

        class Args:
            config_path = cfg_path

        mod.train(Args())
    print("reference controlnet trained")

    from models.controlnet import ControlNet  # reference, read-only
    from scheduler.linear_noise_scheduler import LinearNoiseScheduler

    model = ControlNet(CONFIG["model_params"], model_locked=True,
                       model_ckpt=os.path.join(run_dir, "mnist", "ddpm_ckpt.pth"),
                       device=torch.device("cpu")).eval()
    model.load_state_dict(torch.load(cn_ckpt, map_location="cpu"))
    sched = LinearNoiseScheduler(1000, 0.0001, 0.02)
    _, hints = _test_hints(N_SAMPLES)
    torch.manual_seed(11)
    outs = []
    with torch.no_grad():
        for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
            nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
            h = torch.from_numpy(hints[b0:b0 + nb]).permute(0, 3, 1, 2)
            xt = torch.randn(nb, 1, IM_SIZE, IM_SIZE)
            for i in reversed(range(1000)):
                pred = model(xt, torch.as_tensor(i).unsqueeze(0), h)
                xt, _ = sched.sample_prev_timestep(xt, pred, torch.as_tensor(i))
            outs.append(((xt.clamp(-1, 1) + 1) / 2).permute(0, 2, 3, 1).numpy())
            print(f"ref cn sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ref_cn_samples"))
    print("reference controlnet samples written")


def stage_ours_cn():
    """Sample OUR ControlNet (the canny_ablation cv2-trained model — same
    base DDPM, same data, same epochs/lr/seed as stage_ref_cn) on the same
    fixed hints."""
    import jax
    import numpy as np

    from controlnet_tpu.models.controlnet import ControlNet
    from controlnet_tpu.sample.ddpm import make_ddpm_sampler
    from controlnet_tpu.schedules.linear import make_linear_schedule
    from tools.train_ddpm_controlnet import load_controlnet_params

    task = os.path.join(REPO, "canny_ablation_ws", "cv2")
    cn = ControlNet(1, CONFIG["model_params"])
    params = load_controlnet_params(task, "controlnet_ckpt.pth", cn)
    sched = make_linear_schedule(1000, 0.0001, 0.02)
    _, hints = _test_hints(N_SAMPLES)
    outs = []
    for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
        nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
        sampler = make_ddpm_sampler(lambda p, x, t, h: cn(p, x, t, h), sched,
                                    (nb, IM_SIZE, IM_SIZE, 1), record_every=1000)
        x0, _ = sampler(params, jax.random.PRNGKey(500 + b0), hints[b0:b0 + nb])
        outs.append((np.clip(np.asarray(x0), -1, 1) + 1) / 2)
        print(f"ours cn sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ours_cn_samples"))
    print("our controlnet samples written")


def stage_eval_cn():
    import json as _json

    import cv2
    import numpy as np

    from tools.eval_metrics import evaluate, load_images

    ref = load_images(os.path.join(WS, "ref_cn_samples"), 1)
    ours = load_images(os.path.join(WS, "ours_cn_samples"), 1)
    test_imgs, hints = _test_hints(len(ref))

    rows = {}
    rows["ffd_cn_ours_vs_ref"] = evaluate(ours, ref, 1)["ffd"]
    h = len(ref) // 2
    rows["ffd_cn_noise_floor_ref_halves"] = evaluate(ref[:h], ref[h:], 1)["ffd"]
    rows["ffd_cn_noise_floor_ours_halves"] = evaluate(ours[:h], ours[h:], 1)["ffd"]
    _ci_rows(rows, "ffd_cn_", ref, ours)

    def hint_following(samples) -> float:
        """Mean pixel agreement between canny(sample) and the conditioning
        hint — the functional 'did the control work' metric."""
        agree = []
        for s, hint in zip(samples, hints):
            e = (cv2.Canny((s[..., 0] * 255).astype(np.uint8), 100, 200) > 0)
            agree.append(float((e == (hint[..., 0] > 0.5)).mean()))
        return float(np.mean(agree))

    rows["hint_follow_ref"] = hint_following(ref)
    rows["hint_follow_ours"] = hint_following(ours)
    rows["n_samples"] = len(ref)
    rows["cn_epochs"] = CN_EPOCHS
    out = os.path.join(WS, "fidelity_cn_results.json")
    with open(out, "w") as f:
        _json.dump(rows, f, indent=2)
    print(_json.dumps(rows, indent=2))
    print("wrote", out)


CD_EPOCHS = int(os.environ.get("FIDELITY_CD_EPOCHS", "8"))


def stage_ref_cd():
    """Train + 1-step-sample the reference consistency-distilled student
    (teacher: the stage_ref_cn ControlNet), completing the reference's full
    workflow chain DDPM -> ControlNet -> 1-step student on the ref stack."""
    import importlib.util

    import numpy as np
    import torch
    import yaml

    _shim_torchvision()
    run_dir = os.path.join(WS, "ref_run")
    os.chdir(run_dir)
    sys.path.insert(0, "/root/reference")
    cfg_path = _write_config("mnist")
    with open(cfg_path) as f:
        c = yaml.safe_load(f)
    c["train_params"].update({"controlnet_ckpt_name": "controlnet_ckpt.pth",
                              "consistency_epochs": CD_EPOCHS,
                              "consistency_lr": 0.0001,
                              "use_ddpm_distillation": True})
    with open(cfg_path, "w") as f:
        yaml.safe_dump(c, f)

    # this env's cv2 lacks setLogLevel, which the reference trainer calls at
    # import (train_consistency_controlnet_distilled.py:16) — shim it.
    import cv2

    if not hasattr(cv2, "setLogLevel"):
        cv2.setLogLevel = lambda *_: None

    cd_ckpt = os.path.join(run_dir, "mnist", "consistency_controlnet_distilled.pth")
    if not os.path.exists(cd_ckpt):
        spec = importlib.util.spec_from_file_location(
            "ref_train_cd",
            "/root/reference/tools/train_consistency_controlnet_distilled.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        torch.manual_seed(21)

        class Args:
            config_path = cfg_path

        mod.train(Args())
    print("reference consistency student trained")

    from models.consistency_controlnet_distilled import (  # reference
        ConsistencyControlNetDistilled,
    )

    model = ConsistencyControlNetDistilled(
        CONFIG["model_params"],
        os.path.join(run_dir, "mnist", "controlnet_ckpt.pth"),
        device=torch.device("cpu")).eval()
    sd = torch.load(cd_ckpt, map_location="cpu")
    model.student.load_state_dict(sd["model_state_dict"])
    _, hints = _test_hints(N_SAMPLES)
    torch.manual_seed(31)
    outs = []
    with torch.no_grad():
        for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
            nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
            h = torch.from_numpy(hints[b0:b0 + nb]).permute(0, 3, 1, 2)
            x0 = model.generate(h, (nb, 1, IM_SIZE, IM_SIZE), num_steps=1)
            outs.append(((x0.clamp(-1, 1) + 1) / 2).permute(0, 2, 3, 1).numpy())
            print(f"ref cd sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ref_cd_samples"))
    print("reference consistency samples written")


def stage_ours_cd():
    """Train + 1-step-sample OUR consistency student from our ControlNet
    (canny_ablation cv2 model — same lineage as stage_ours_cn)."""
    import shutil
    import types

    import jax
    import numpy as np
    import yaml

    from controlnet_tpu.io.checkpoint import latest_checkpoint

    task = os.path.join(WS, "ours_cd_task")
    os.makedirs(task, exist_ok=True)
    for name in ("ddpm_ckpt", "controlnet_ckpt"):
        link = os.path.join(task, name)
        src = os.path.join(REPO, "canny_ablation_ws", "cv2", name)
        if not os.path.exists(link):
            if os.path.islink(src):
                src = os.readlink(src)
            os.symlink(src, link)

    import copy

    cfg = copy.deepcopy(CONFIG)
    cfg["train_params"].update({
        "task_name": task, "controlnet_ckpt_name": "controlnet_ckpt.pth",
        "consistency_ckpt_name": "consistency_controlnet_distilled.pth",
        "consistency_epochs": CD_EPOCHS, "consistency_lr": 0.0001,
        "use_ddpm_distillation": True, "seed": 21,
    })
    cfgp = os.path.join(WS, "ours_cd.yaml")
    with open(cfgp, "w") as f:
        yaml.safe_dump(cfg, f)

    from tools.train_consistency_controlnet_distilled import train

    if latest_checkpoint(task, "consistency_controlnet_distilled.pth") != CD_EPOCHS:
        train(types.SimpleNamespace(config_path=cfgp))
    print("our consistency student trained")

    from controlnet_tpu.models.consistency import ConsistencyDistilled
    from tools.sample_consistency_controlnet_distilled import load_student

    model = ConsistencyDistilled(1, CONFIG["model_params"], use_ddpm_teacher=False)
    sp = load_student(task, model)
    _, hints = _test_hints(N_SAMPLES)
    outs = []
    for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
        nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
        x0 = model.generate({"student": sp}, hints[b0:b0 + nb],
                            (nb, IM_SIZE, IM_SIZE, 1),
                            jax.random.PRNGKey(900 + b0), 1)
        outs.append((np.clip(np.asarray(x0), -1, 1) + 1) / 2)
        print(f"ours cd sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ours_cd_samples"))
    print("our consistency samples written")


def stage_ours_cd_xt():
    """Cross-teacher control (VERDICT r3 next #5): distill OUR consistency
    student from the IMPORTED REFERENCE ControlNet teacher (the torch
    checkpoint stage_ref_cn trained, brought over via io/torch_import)
    under the identical protocol/seed as stage_ours_cd, then 1-step sample
    on the same hints.

    Interpretation: round 3 found cross-stack FFD for the consistency
    stage ABOVE the noise floors while both students sat equally close to
    the data — argued as teacher/RNG-lineage amplification, not framework
    divergence.  This stage isolates the variable: same reference teacher
    on both sides, only the framework differs.  If FFD(ours-from-ref-
    teacher vs ref-student) falls at/inside the floors, the round-3 claim
    is proven; if it stays high, the gap is in the student training
    itself."""
    import copy
    import types

    import jax
    import numpy as np
    import optax
    import yaml

    from controlnet_tpu.io.checkpoint import latest_checkpoint, save_checkpoint
    from controlnet_tpu.io.torch_import import (import_controlnet,
                                                load_torch_state_dict)
    from controlnet_tpu.models.controlnet import ControlNet
    from controlnet_tpu.train.state import create_train_state

    task = os.path.join(WS, "ours_cd_xt_task")
    os.makedirs(task, exist_ok=True)
    if latest_checkpoint(task, "controlnet_ckpt.pth") is None:
        sd = load_torch_state_dict(
            os.path.join(WS, "ref_run", "mnist", "controlnet_ckpt.pth"))
        cn = ControlNet(1, CONFIG["model_params"])
        params = import_controlnet(sd, cn)
        trainable, frozen = cn.split_params(params)
        save_checkpoint(task, "controlnet_ckpt.pth", 0,
                        {"state": create_train_state(trainable, optax.adam(1e-4)),
                         "frozen": frozen})
        print("reference ControlNet teacher imported into our format")

    cfg = copy.deepcopy(CONFIG)
    cfg["train_params"].update({
        "task_name": task, "controlnet_ckpt_name": "controlnet_ckpt.pth",
        "consistency_ckpt_name": "consistency_controlnet_distilled.pth",
        "consistency_epochs": CD_EPOCHS, "consistency_lr": 0.0001,
        "use_ddpm_distillation": True, "seed": 21,
    })
    cfgp = os.path.join(WS, "ours_cd_xt.yaml")
    with open(cfgp, "w") as f:
        yaml.safe_dump(cfg, f)

    from tools.train_consistency_controlnet_distilled import train

    if latest_checkpoint(task, "consistency_controlnet_distilled.pth") != CD_EPOCHS:
        train(types.SimpleNamespace(config_path=cfgp))
    print("our cross-teacher consistency student trained")

    from controlnet_tpu.models.consistency import ConsistencyDistilled
    from tools.sample_consistency_controlnet_distilled import load_student

    model = ConsistencyDistilled(1, CONFIG["model_params"], use_ddpm_teacher=False)
    sp = load_student(task, model)
    _, hints = _test_hints(N_SAMPLES)
    outs = []
    for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
        nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
        x0 = model.generate({"student": sp}, hints[b0:b0 + nb],
                            (nb, IM_SIZE, IM_SIZE, 1),
                            jax.random.PRNGKey(900 + b0), 1)
        outs.append((np.clip(np.asarray(x0), -1, 1) + 1) / 2)
        print(f"ours cd_xt sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ours_cd_xt_samples"))
    print("our cross-teacher consistency samples written")


def stage_ours_cd_seed():
    """Within-stack seed control: train OUR consistency student a second
    time — same own teacher, same protocol, only the training seed changes
    (21 → 22) — and sample on the same hints.  Combined with the
    cross-teacher stage (which showed the teacher moves the student by
    FFD ≈ 0.2), this measures how far two INDEPENDENT training runs of the
    SAME framework land apart.  If seed-to-seed FFD ≈ the cross-stack
    10.5, the consistency-stage gap is definitively 'independent runs of
    equal quality', with the training-RNG stream as the whole story."""
    import copy
    import types

    import jax
    import numpy as np
    import yaml

    from controlnet_tpu.io.checkpoint import latest_checkpoint

    task = os.path.join(WS, "ours_cd_s22_task")
    os.makedirs(task, exist_ok=True)
    for name in ("ddpm_ckpt", "controlnet_ckpt"):
        link = os.path.join(task, name)
        src = os.path.join(REPO, "canny_ablation_ws", "cv2", name)
        if not os.path.exists(link):
            if os.path.islink(src):
                src = os.readlink(src)
            os.symlink(src, link)

    cfg = copy.deepcopy(CONFIG)
    cfg["train_params"].update({
        "task_name": task, "controlnet_ckpt_name": "controlnet_ckpt.pth",
        "consistency_ckpt_name": "consistency_controlnet_distilled.pth",
        "consistency_epochs": CD_EPOCHS, "consistency_lr": 0.0001,
        "use_ddpm_distillation": True, "seed": 22,
    })
    cfgp = os.path.join(WS, "ours_cd_s22.yaml")
    with open(cfgp, "w") as f:
        yaml.safe_dump(cfg, f)

    from tools.train_consistency_controlnet_distilled import train

    if latest_checkpoint(task, "consistency_controlnet_distilled.pth") != CD_EPOCHS:
        train(types.SimpleNamespace(config_path=cfgp))
    print("our seed-22 consistency student trained")

    from controlnet_tpu.models.consistency import ConsistencyDistilled
    from tools.sample_consistency_controlnet_distilled import load_student

    model = ConsistencyDistilled(1, CONFIG["model_params"], use_ddpm_teacher=False)
    sp = load_student(task, model)
    _, hints = _test_hints(N_SAMPLES)
    outs = []
    for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
        nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
        x0 = model.generate({"student": sp}, hints[b0:b0 + nb],
                            (nb, IM_SIZE, IM_SIZE, 1),
                            jax.random.PRNGKey(900 + b0), 1)
        outs.append((np.clip(np.asarray(x0), -1, 1) + 1) / 2)
        print(f"ours cd_s22 sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ours_cd_s22_samples"))
    print("our seed-22 consistency samples written")


def stage_eval_cd_seed():
    import json as _json

    from tools.eval_metrics import evaluate, load_images

    s21 = load_images(os.path.join(WS, "ours_cd_samples"), 1)
    s22 = load_images(os.path.join(WS, "ours_cd_s22_samples"), 1)
    ref = load_images(os.path.join(WS, "ref_cd_samples"), 1)
    rows = {
        # the headline number: two independent runs of OUR stack
        "ffd_cd_seed21_vs_seed22": evaluate(s21, s22, 1)["ffd"],
        "ffd_cd_seed22_vs_ref": evaluate(s22, ref, 1)["ffd"],
        "ffd_cd_seed21_vs_ref": evaluate(s21, ref, 1)["ffd"],
    }
    h = len(s21) // 2
    rows["ffd_cd_noise_floor_s21_halves"] = evaluate(s21[:h], s21[h:], 1)["ffd"]
    rows["ffd_cd_noise_floor_s22_halves"] = evaluate(s22[:h], s22[h:], 1)["ffd"]
    rows["n_samples"] = min(len(s21), len(s22))
    out = os.path.join(WS, "fidelity_cd_seed_control_results.json")
    with open(out, "w") as f:
        _json.dump(rows, f, indent=2)
    print(_json.dumps(rows, indent=2))
    print("wrote", out)


def stage_eval_cd_xt():
    import json as _json

    import cv2
    import numpy as np

    from tools.eval_metrics import evaluate, load_images

    ref = load_images(os.path.join(WS, "ref_cd_samples"), 1)
    ours_xt = load_images(os.path.join(WS, "ours_cd_xt_samples"), 1)
    rows = {}
    rows["ffd_cdxt_ours_vs_ref"] = evaluate(ours_xt, ref, 1)["ffd"]
    h = len(ref) // 2
    rows["ffd_cdxt_noise_floor_ref_halves"] = evaluate(ref[:h], ref[h:], 1)["ffd"]
    rows["ffd_cdxt_noise_floor_ours_halves"] = evaluate(
        ours_xt[:h], ours_xt[h:], 1)["ffd"]
    _ci_rows(rows, "ffd_cdxt_", ref, ours_xt)
    train_imgs = load_images(os.path.join(WS, "data", "train", "0"), 1)
    for cls in ("1", "2", "3"):
        train_imgs = np.concatenate(
            [train_imgs, load_images(os.path.join(WS, "data", "train", cls), 1)])
    rows["ffd_cdxt_ref_vs_train"] = evaluate(ref, train_imgs, 1)["ffd"]
    rows["ffd_cdxt_ours_vs_train"] = evaluate(ours_xt, train_imgs, 1)["ffd"]
    # the same-framework control: our OWN-teacher student vs the
    # cross-teacher student — how much does the teacher alone move FFD?
    own = os.path.join(WS, "ours_cd_samples")
    if os.path.isdir(own):
        ours_own = load_images(own, 1)
        rows["ffd_cdxt_vs_own_teacher_student"] = evaluate(ours_xt, ours_own, 1)["ffd"]

    _, hints = _test_hints(len(ref))

    def hint_following(samples) -> float:
        agree = []
        for s, hint in zip(samples, hints):
            e = (cv2.Canny((s[..., 0] * 255).astype(np.uint8), 100, 200) > 0)
            agree.append(float((e == (hint[..., 0] > 0.5)).mean()))
        return float(np.mean(agree))

    rows["hint_follow_cdxt_ref"] = hint_following(ref)
    rows["hint_follow_cdxt_ours"] = hint_following(ours_xt)
    rows["n_samples"] = min(len(ref), len(ours_xt))
    rows["cd_epochs"] = CD_EPOCHS
    out = os.path.join(WS, "fidelity_cd_crossteacher_results.json")
    with open(out, "w") as f:
        _json.dump(rows, f, indent=2)
    print(_json.dumps(rows, indent=2))
    print("wrote", out)


def stage_eval_cd():
    import json as _json

    import cv2
    import numpy as np

    from tools.eval_metrics import evaluate, load_images

    ref = load_images(os.path.join(WS, "ref_cd_samples"), 1)
    ours = load_images(os.path.join(WS, "ours_cd_samples"), 1)
    rows = {}
    rows["ffd_cd_ours_vs_ref"] = evaluate(ours, ref, 1)["ffd"]
    h = len(ref) // 2
    rows["ffd_cd_noise_floor_ref_halves"] = evaluate(ref[:h], ref[h:], 1)["ffd"]
    rows["ffd_cd_noise_floor_ours_halves"] = evaluate(ours[:h], ours[h:], 1)["ffd"]
    _ci_rows(rows, "ffd_cd_", ref, ours)
    # quality anchors: distance to the training distribution and to each
    # stack's own 1000-step teacher samples, plus hint-following — tells
    # "different but equally good" apart from "one stack degraded"
    import numpy as _np

    train_imgs = load_images(os.path.join(WS, "data", "train", "0"), 1)
    for cls in ("1", "2", "3"):
        train_imgs = _np.concatenate(
            [train_imgs, load_images(os.path.join(WS, "data", "train", cls), 1)])
    rows["ffd_cd_ref_vs_train"] = evaluate(ref, train_imgs, 1)["ffd"]
    rows["ffd_cd_ours_vs_train"] = evaluate(ours, train_imgs, 1)["ffd"]
    ref_cn = load_images(os.path.join(WS, "ref_cn_samples"), 1)
    ours_cn = load_images(os.path.join(WS, "ours_cn_samples"), 1)
    rows["ffd_cd_ref_vs_own_teacher"] = evaluate(ref, ref_cn, 1)["ffd"]
    rows["ffd_cd_ours_vs_own_teacher"] = evaluate(ours, ours_cn, 1)["ffd"]

    _, hints = _test_hints(len(ref))

    def hint_following(samples) -> float:
        agree = []
        for s, hint in zip(samples, hints):
            e = (cv2.Canny((s[..., 0] * 255).astype(np.uint8), 100, 200) > 0)
            agree.append(float((e == (hint[..., 0] > 0.5)).mean()))
        return float(np.mean(agree))

    rows["hint_follow_cd_ref"] = hint_following(ref)
    rows["hint_follow_cd_ours"] = hint_following(ours)
    rows["n_samples"] = min(len(ref), len(ours))
    rows["cd_epochs"] = CD_EPOCHS
    out = os.path.join(WS, "fidelity_cd_results.json")
    with open(out, "w") as f:
        _json.dump(rows, f, indent=2)
    print(_json.dumps(rows, indent=2))
    print("wrote", out)


def stage_ref_dmd():
    """Train + 1-step-sample the reference DMD student (teacher: the
    stage_ref_cn ControlNet) — the second distillation family."""
    import importlib.util

    import numpy as np
    import torch
    import yaml

    _shim_torchvision()
    import cv2

    if not hasattr(cv2, "setLogLevel"):
        cv2.setLogLevel = lambda *_: None
    run_dir = os.path.join(WS, "ref_run")
    os.chdir(run_dir)
    sys.path.insert(0, "/root/reference")
    cfg_path = _write_config("mnist")
    with open(cfg_path) as f:
        c = yaml.safe_load(f)
    c["train_params"].update({"controlnet_ckpt_name": "controlnet_ckpt.pth",
                              "distribution_matching_epochs": CD_EPOCHS,
                              "distribution_matching_lr": 0.00005})
    with open(cfg_path, "w") as f:
        yaml.safe_dump(c, f)

    ckpt = os.path.join(run_dir, "mnist",
                        "distribution_matching_controlnet_distilled_ckpt.pth")
    if not os.path.exists(ckpt):
        spec = importlib.util.spec_from_file_location(
            "ref_train_dmd",
            "/root/reference/tools/train_distribution_matching_controlnet_distilled.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        torch.manual_seed(41)
        np.random.seed(41)

        class Args:
            config_path = cfg_path

        mod.train(Args())
    print("reference dmd student trained")

    from models.distribution_matching_controlnet import (  # reference
        DistributionMatchingControlNet,
    )

    student = DistributionMatchingControlNet(CONFIG["model_params"]).eval()
    sd = torch.load(ckpt, map_location="cpu", weights_only=False)
    student.load_state_dict(sd["model_state_dict"])
    T = CONFIG["diffusion_params"]["num_timesteps"]
    _, hints = _test_hints(N_SAMPLES)
    torch.manual_seed(51)
    outs = []
    with torch.no_grad():
        for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
            nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
            h = torch.from_numpy(hints[b0:b0 + nb]).permute(0, 3, 1, 2)
            x_t = torch.randn(nb, 1, IM_SIZE, IM_SIZE)
            t = torch.full((nb,), T - 1, dtype=torch.long)
            x0 = student(x_t, t, h)  # t = T-1 convention (sample_dmd.py:98-102)
            outs.append(((x0.clamp(-1, 1) + 1) / 2).permute(0, 2, 3, 1).numpy())
            print(f"ref dmd sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ref_dmd_samples"))
    print("reference dmd samples written")


def stage_ours_dmd():
    """Train + 1-step-sample OUR DMD student (same lineage)."""
    import copy
    import types

    import jax
    import numpy as np
    import yaml

    from controlnet_tpu.io.checkpoint import latest_checkpoint

    task = os.path.join(WS, "ours_dmd_task")
    os.makedirs(task, exist_ok=True)
    for name in ("ddpm_ckpt", "controlnet_ckpt"):
        link = os.path.join(task, name)
        src = os.path.join(REPO, "canny_ablation_ws", "cv2", name)
        if not os.path.exists(link):
            if os.path.islink(src):
                src = os.readlink(src)
            os.symlink(src, link)

    cfg = copy.deepcopy(CONFIG)
    cfg["train_params"].update({
        "task_name": task, "controlnet_ckpt_name": "controlnet_ckpt.pth",
        "distribution_matching_epochs": CD_EPOCHS,
        "distribution_matching_lr": 0.00005, "seed": 41,
    })
    cfgp = os.path.join(WS, "ours_dmd.yaml")
    with open(cfgp, "w") as f:
        yaml.safe_dump(cfg, f)

    from tools.train_distribution_matching_controlnet_distilled import (
        CKPT_NAME as DMD_CKPT,
        train,
    )

    if latest_checkpoint(task, DMD_CKPT) != CD_EPOCHS:
        train(types.SimpleNamespace(config_path=cfgp, no_plots=True))
    print("our dmd student trained")

    from controlnet_tpu.models.dmd import DistributionMatchingControlNet
    from tools.sample_distribution_matching_controlnet_distilled import load_student

    student = DistributionMatchingControlNet(1, CONFIG["model_params"])
    sp = load_student(task, student, use_best=False)
    T = CONFIG["diffusion_params"]["num_timesteps"]
    _, hints = _test_hints(N_SAMPLES)
    fwd = jax.jit(lambda p, x, t, h: student(p, x, t, h))
    outs = []
    for b0 in range(0, N_SAMPLES, SAMPLE_BATCH):
        nb = min(SAMPLE_BATCH, N_SAMPLES - b0)
        k = jax.random.PRNGKey(1300 + b0)
        x_t = jax.random.normal(k, (nb, IM_SIZE, IM_SIZE, 1))
        t = jnp_full(nb, T - 1)
        x0 = fwd(sp, x_t, t, hints[b0:b0 + nb])
        outs.append((np.clip(np.asarray(x0), -1, 1) + 1) / 2)
        print(f"ours dmd sampled {b0 + nb}/{N_SAMPLES}", flush=True)
    _save_pngs(np.concatenate(outs), os.path.join(WS, "ours_dmd_samples"))
    print("our dmd samples written")


def jnp_full(n, v):
    import jax.numpy as jnp

    return jnp.full((n,), v, jnp.int32)


def stage_eval_dmd():
    import json as _json

    import cv2
    import numpy as np

    from tools.eval_metrics import evaluate, load_images

    ref = load_images(os.path.join(WS, "ref_dmd_samples"), 1)
    ours = load_images(os.path.join(WS, "ours_dmd_samples"), 1)
    rows = {}
    rows["ffd_dmd_ours_vs_ref"] = evaluate(ours, ref, 1)["ffd"]
    h = len(ref) // 2
    rows["ffd_dmd_noise_floor_ref_halves"] = evaluate(ref[:h], ref[h:], 1)["ffd"]
    rows["ffd_dmd_noise_floor_ours_halves"] = evaluate(ours[:h], ours[h:], 1)["ffd"]
    _ci_rows(rows, "ffd_dmd_", ref, ours)
    train_imgs = load_images(os.path.join(WS, "data", "train", "0"), 1)
    for cls in ("1", "2", "3"):
        train_imgs = np.concatenate(
            [train_imgs, load_images(os.path.join(WS, "data", "train", cls), 1)])
    rows["ffd_dmd_ref_vs_train"] = evaluate(ref, train_imgs, 1)["ffd"]
    rows["ffd_dmd_ours_vs_train"] = evaluate(ours, train_imgs, 1)["ffd"]
    _, hints = _test_hints(len(ref))

    def hint_following(samples) -> float:
        agree = []
        for s, hint in zip(samples, hints):
            e = (cv2.Canny((s[..., 0] * 255).astype(np.uint8), 100, 200) > 0)
            agree.append(float((e == (hint[..., 0] > 0.5)).mean()))
        return float(np.mean(agree))

    rows["hint_follow_dmd_ref"] = hint_following(ref)
    rows["hint_follow_dmd_ours"] = hint_following(ours)
    rows["n_samples"] = min(len(ref), len(ours))
    rows["dmd_epochs"] = CD_EPOCHS
    out = os.path.join(WS, "fidelity_dmd_results.json")
    with open(out, "w") as f:
        _json.dump(rows, f, indent=2)
    print(_json.dumps(rows, indent=2))
    print("wrote", out)


if __name__ == "__main__":
    os.makedirs(WS, exist_ok=True)
    stage = sys.argv[1] if len(sys.argv) > 1 else "all"
    if stage in ("data", "all"):
        stage_data()
    if stage in ("ref", "all"):
        stage_ref()
    if stage in ("ours", "all"):
        stage_ours()
    if stage in ("eval", "all"):
        stage_eval()
    if stage == "ref_cn":
        stage_ref_cn()
    if stage == "ours_cn":
        stage_ours_cn()
    if stage == "eval_cn":
        stage_eval_cn()
    if stage == "ref_cd":
        stage_ref_cd()
    if stage == "ours_cd":
        stage_ours_cd()
    if stage == "eval_cd":
        stage_eval_cd()
    if stage == "ours_cd_xt":
        stage_ours_cd_xt()
    if stage == "eval_cd_xt":
        stage_eval_cd_xt()
    if stage == "ours_cd_seed":
        stage_ours_cd_seed()
    if stage == "eval_cd_seed":
        stage_eval_cd_seed()
    if stage == "ref_dmd":
        stage_ref_dmd()
    if stage == "ours_dmd":
        stage_ours_dmd()
    if stage == "eval_dmd":
        stage_eval_dmd()
