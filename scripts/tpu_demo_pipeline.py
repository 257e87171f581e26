"""Full-pipeline demo on the real chip: train DDPM -> ControlNet ->
consistency + DMD distillation on synthetic shape data, then sample,
compare and evaluate. One process, one TPU claim; artifacts under
demo_mnist/."""
import json, os, sys, time, types

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import yaml
from controlnet_tpu.data.synthetic import make_synthetic_image_tree

ROOT = "demo_mnist"
os.makedirs(ROOT, exist_ok=True)
make_synthetic_image_tree(f"{ROOT}/data/train", num_classes=4, per_class=256, size=28)
make_synthetic_image_tree(f"{ROOT}/data/test", num_classes=4, per_class=32, size=28, seed=1)

config = {
    "dataset_params": {"task_name": "mnist", "im_path": f"{ROOT}/data/train",
                        "im_test_path": f"{ROOT}/data/test", "canny_im_size": 28},
    "diffusion_params": {"num_timesteps": 1000, "beta_start": 0.0001, "beta_end": 0.02},
    "model_params": {"im_channels": 1, "im_size": 28, "hint_channels": 3,
                      "down_channels": [32, 64, 128, 256], "mid_channels": [256, 256, 128],
                      "down_sample": [True, True, False], "time_emb_dim": 128,
                      "num_down_layers": 2, "num_mid_layers": 2, "num_up_layers": 2,
                      "num_heads": 4, "sigma_min": 0.002, "sigma_max": 80.0,
                      "sigma_data": 0.5},
    "train_params": {"task_name": ROOT + "/task", "batch_size": 64, "num_epochs": 30,
                      "controlnet_epochs": 8, "num_samples": 16, "num_grid_rows": 4,
                      "ddpm_lr": 0.0002, "controlnet_lr": 0.0001,
                      "ddpm_ckpt_name": "ddpm_ckpt.pth",
                      "controlnet_ckpt_name": "ddpm_controlnet_ckpt.pth",
                      "consistency_epochs": 8, "consistency_lr": 0.0001,
                      "distribution_matching_epochs": 4,
                      "distribution_matching_lr": 0.00005},
}
cfg_path = f"{ROOT}/demo.yaml"
with open(cfg_path, "w") as f:
    yaml.safe_dump(config, f)

def step(name, fn, *a):
    t0 = time.time()
    fn(*a)
    print(json.dumps({"demo_step": name, "s": round(time.time() - t0, 1)}), flush=True)

args = types.SimpleNamespace(config_path=cfg_path)
from tools.train_ddpm import train as train_ddpm
step("train_ddpm_30ep", train_ddpm, args)

from tools.sample_ddpm import sample as sample_ddpm
step("sample_ddpm", sample_ddpm,
     types.SimpleNamespace(config_path=cfg_path, num_samples=16, save_every=100, seed=0))

from tools.train_ddpm_controlnet import train as train_cn
step("train_controlnet_8ep", train_cn,
     types.SimpleNamespace(config_path=cfg_path, hint_backend="cv2"))

from tools.sample_ddpm_controlnet import sample as sample_cn
step("sample_controlnet", sample_cn,
     types.SimpleNamespace(config_path=cfg_path, num_samples=16, save_every=100, seed=0))

from tools.train_consistency_controlnet_distilled import train as train_cons
step("train_consistency_8ep", train_cons, args)

from tools.train_distribution_matching_controlnet_distilled import train as train_dmd
step("train_dmd_4ep", train_dmd,
     types.SimpleNamespace(config_path=cfg_path, no_plots=False))

from tools.sample_consistency_controlnet_distilled import sample as sample_cons
step("sample_consistency", sample_cons,
     types.SimpleNamespace(config_path=cfg_path, mode="test", num_samples=8,
                           num_steps=1, seed=0))

from tools.sample_distribution_matching_controlnet_distilled import sample as sample_dmd
step("sample_dmd", sample_dmd,
     types.SimpleNamespace(config_path=cfg_path, mode="test", num_samples=8,
                           best=True, seed=0))

from tools.compare_all_controlnet_models import compare_models
step("compare_all", compare_models,
     types.SimpleNamespace(config_path=cfg_path, num_samples=8, ddpm_steps=1000, seed=0))

print(json.dumps({"demo": "complete"}), flush=True)
