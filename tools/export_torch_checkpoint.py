"""Export this framework's checkpoints as reference PyTorch .pth files.

The inverse CLI of tools/import_torch_checkpoint.py: models trained with
this stack become state_dicts the reference loads with ``strict=True`` —
its samplers/comparison tools can evaluate our checkpoints directly,
closing the parity loop in both directions (io/torch_export.py holds the
key-grammar inverse maps; round-trip tested in tests/test_torch_export.py).

  python -m tools.export_torch_checkpoint --config config/mnist.yaml --type unet
  python -m tools.export_torch_checkpoint --config config/mnist.yaml --type controlnet
  python -m tools.export_torch_checkpoint --config config/celebhq.yaml --type vae
  python -m tools.export_torch_checkpoint --config config/mnist.yaml --type consistency

Output formats mirror what each reference trainer writes:
  * unet/ldm_unet/controlnet/ldm_controlnet/vae: plain state_dict
    (reference tools/train_ddpm.py:96, train_vae.py:200-203);
  * consistency: {'epoch', 'model_state_dict', 'ema_teacher_state_dict',
    'model_config'} (reference train_consistency...py:153-159);
  * dmd: {'epoch', 'model_state_dict', 'config'} (reference
    train_distribution_matching...py:260-266).
Optimizer state is not exported: the representations differ and the
reference never restores it (SURVEY.md §5.4).
"""

from __future__ import annotations

import argparse
import os

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.io.checkpoint import restore_checkpoint_raw
from controlnet_tpu.io.torch_export import (
    export_controlnet,
    export_distilled_student,
    export_unet,
    export_vae,
    save_torch_checkpoint,
)

# Canonical distilled checkpoint names. Source names match our trainers
# (tools/train_*_distilled.py CKPT_NAME); output names match what the
# reference's samplers/compare tools open (reference
# sample_distribution_matching...py:46 uses the `_ckpt` variant; the
# consistency name is shared verbatim). Inlined rather than imported from
# tools.* so this CLI works even when the reference repo's identically
# named `tools` package shadows ours on sys.path.
CONSISTENCY_CKPT = "consistency_controlnet_distilled.pth"
DMD_CKPT = "distribution_matching_controlnet_distilled.pth"
DMD_REF_CKPT = "distribution_matching_controlnet_distilled_ckpt.pth"


def _latent_size(dataset_config: dict, autoencoder_config: dict) -> int:
    # mirrors tools/sample_ldm_vae.latent_size
    n_down = sum(bool(d) for d in autoencoder_config["down_sample"])
    return dataset_config["im_size"] // (2 ** n_down)


def _restore(task_name: str, name: str, step: int | None):
    restored = restore_checkpoint_raw(task_name, name, step)
    if restored is None:
        raise FileNotFoundError(
            f"no checkpoint for {name} under {task_name}/ — train first")
    tree, step = restored
    print(f"Loaded checkpoint at epoch {step}")
    return tree, step


def main(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    dataset_config = cfg.dataset_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]

    if args.type == "unet":
        name = args.ckpt or train_config.get("ddpm_ckpt_name", "ddpm_ckpt.pth")
        tree, step = _restore(task_name, name, args.step)
        payload = export_unet(tree["params"])
    elif args.type == "ldm_unet":
        name = args.ckpt or train_config.get("ldm_ckpt_name", "ddpm_ckpt.pth")
        tree, step = _restore(task_name, name, args.step)
        payload = export_unet(tree["params"])
    elif args.type == "controlnet":
        from controlnet_tpu.models.controlnet import ControlNet

        model_config = cfg.model_params(config)
        cn = ControlNet(model_config["im_channels"], model_config)
        name = args.ckpt or train_config.get("controlnet_ckpt_name",
                                             "ddpm_controlnet_ckpt.pth")
        tree, step = _restore(task_name, name, args.step)
        merged = cn.merge_params(tree["state"]["params"], tree["frozen"])
        payload = export_controlnet(merged, cn)
    elif args.type == "ldm_controlnet":
        from controlnet_tpu.models.controlnet import ControlNet

        ldm_config = cfg.ldm_params(config)
        ae = cfg.autoencoder_params(config)
        factor = dataset_config["canny_im_size"] // _latent_size(dataset_config, ae)
        cn = ControlNet(ae["z_channels"], ldm_config, down_sample_factor=factor)
        name = args.ckpt or train_config.get("controlnet_ckpt_name",
                                             "ddpm_controlnet_ckpt.pth")
        tree, step = _restore(task_name, name, args.step)
        merged = cn.merge_params(tree["state"]["params"], tree["frozen"])
        payload = export_controlnet(merged, cn)
    elif args.type == "vae":
        name = args.ckpt or train_config.get("vae_autoencoder_ckpt_name",
                                             "vae_autoencoder_ckpt.pth")
        tree, step = _restore(task_name, name, args.step)
        payload = export_vae(tree["g"]["params"])
    elif args.type == "consistency":
        from controlnet_tpu.models.consistency import ConsistencyDistilled

        model_config = cfg.model_params(config)
        model = ConsistencyDistilled(model_config["im_channels"], model_config,
                                     use_ddpm_teacher=False)
        name = args.ckpt or CONSISTENCY_CKPT
        tree, step = _restore(task_name, name, args.step)
        payload = {
            "epoch": step,
            "model_state_dict": export_distilled_student(
                tree["state"]["params"], model.student),
            "ema_teacher_state_dict": export_distilled_student(
                tree["ema"], model.student),
            "model_config": dict(model_config),
        }
    elif args.type == "dmd":
        from controlnet_tpu.models.dmd import DistributionMatchingControlNet

        model_config = cfg.model_params(config)
        student = DistributionMatchingControlNet(model_config["im_channels"],
                                                 model_config)
        name = args.ckpt or DMD_CKPT
        tree, step = _restore(task_name, name, args.step)
        payload = {
            "epoch": step,
            "model_state_dict": export_distilled_student(
                tree["state"]["params"], student),
            "config": dict(config),
        }
    else:
        raise ValueError(f"unknown --type {args.type}")

    out_name = DMD_REF_CKPT if args.type == "dmd" and args.ckpt is None else name
    out = args.out or os.path.join(
        task_name, out_name if out_name.endswith(".pth") else out_name + ".pth")
    # The default path is exactly where import_torch_checkpoint keeps the
    # original reference .pth; never clobber an existing file silently.
    if os.path.exists(out) and not getattr(args, "force", False):
        raise SystemExit(
            f"refusing to overwrite existing {out} (it may be the original "
            f"reference checkpoint) — pass --out <path> or --force")
    save_torch_checkpoint(payload, out)
    n = len(payload if args.type not in ("consistency", "dmd")
            else payload["model_state_dict"])
    print(f"Exported {args.type} (epoch {step}, {n} tensors) -> {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Export a checkpoint as a reference torch .pth")
    parser.add_argument("--config", dest="config_path", required=True)
    parser.add_argument("--type", required=True,
                        choices=["unet", "ldm_unet", "controlnet",
                                 "ldm_controlnet", "vae", "consistency", "dmd"])
    parser.add_argument("--ckpt", default=None,
                        help="source checkpoint name (default: from config)")
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step (default: latest)")
    parser.add_argument("--out", default=None, help="output .pth path")
    parser.add_argument("--force", action="store_true",
                        help="overwrite an existing output file")
    main(parser.parse_args())
