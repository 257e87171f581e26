"""Convert reference PyTorch checkpoints into this framework's format.

Lets users bring models trained with the reference stack
(tools/train_*.py torch.save state_dicts) into this framework for
sampling/evaluation:

  python -m tools.import_torch_checkpoint --config config/mnist.yaml \
      --type unet --ckpt mnist/ddpm_ckpt.pth
  python -m tools.import_torch_checkpoint --config config/mnist.yaml \
      --type controlnet --ckpt mnist/ddpm_controlnet_ckpt.pth
  python -m tools.import_torch_checkpoint --config config/celebhq.yaml \
      --type vae --ckpt celebhq/vae_autoencoder_ckpt.pth

Writes a step-0 checkpoint under <task_name>/<target ckpt name> that the
samplers load directly.
"""

from __future__ import annotations

import argparse

import jax
import optax

from controlnet_tpu import cli, config as cfg
from controlnet_tpu.io.checkpoint import save_checkpoint
from controlnet_tpu.io.torch_import import (
    import_controlnet,
    import_unet,
    import_vae,
    load_torch_state_dict,
)
from controlnet_tpu.train.state import create_train_state


def main(args):
    cli.setup_jax()
    config = cfg.load_config(args.config_path)
    dataset_config = cfg.dataset_params(config)
    train_config = cfg.train_params(config)
    task_name = train_config["task_name"]
    sd = load_torch_state_dict(args.ckpt)
    tx = optax.adam(1e-4)

    if args.type == "unet":
        model_config = cfg.model_params(config)
        from controlnet_tpu.models.unet import UNet

        im_ch = model_config.get("im_channels", dataset_config.get("im_channels", 1))
        unet = UNet(im_ch, model_config)
        params = import_unet(sd, unet)
        name = args.out or train_config.get("ddpm_ckpt_name", "ddpm_ckpt.pth")
        save_checkpoint(task_name, name, 0, create_train_state(params, tx))
    elif args.type == "ldm_unet":
        ldm_config = cfg.ldm_params(config)
        ae = cfg.autoencoder_params(config)
        from controlnet_tpu.models.unet import UNet

        unet = UNet(ae["z_channels"], ldm_config)
        params = import_unet(sd, unet)
        name = args.out or train_config.get("ldm_ckpt_name", "ddpm_ckpt.pth")
        save_checkpoint(task_name, name, 0, create_train_state(params, tx))
    elif args.type == "controlnet":
        model_config = cfg.model_params(config)
        from controlnet_tpu.models.controlnet import ControlNet

        im_ch = model_config.get("im_channels", dataset_config.get("im_channels", 1))
        cn = ControlNet(im_ch, model_config)
        params = import_controlnet(sd, cn)
        trainable, frozen = cn.split_params(params)
        name = args.out or train_config.get("controlnet_ckpt_name", "ddpm_controlnet_ckpt.pth")
        save_checkpoint(task_name, name, 0,
                        {"state": create_train_state(trainable, tx), "frozen": frozen})
    elif args.type == "vae":
        ae = cfg.autoencoder_params(config)
        from controlnet_tpu.models.discriminator import Discriminator
        from controlnet_tpu.models.vae import VAE

        im_ch = dataset_config.get("im_channels", 3)
        vae = VAE(im_ch, ae)
        params = import_vae(sd, vae)
        disc = Discriminator(im_channels=im_ch)
        name = args.out or train_config.get("vae_autoencoder_ckpt_name", "vae_autoencoder_ckpt.pth")
        save_checkpoint(task_name, name, 0, {
            "g": create_train_state(params, tx),
            "d": create_train_state(disc.init(jax.random.PRNGKey(0)), tx),
        })
    else:
        raise ValueError(f"unknown --type {args.type}")
    print(f"Imported {args.type} checkpoint from {args.ckpt} into {task_name}/")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Import a reference torch checkpoint")
    parser.add_argument("--config", dest="config_path", required=True)
    parser.add_argument("--type", choices=["unet", "ldm_unet", "controlnet", "vae"], required=True)
    parser.add_argument("--ckpt", required=True)
    parser.add_argument("--out", default=None, help="override target checkpoint name")
    main_args = parser.parse_args()
    main(main_args)
