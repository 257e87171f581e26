from controlnet_tpu.train.state import TrainState, create_train_state
from controlnet_tpu.train.loops import (
    make_ddpm_train_step,
    make_controlnet_train_step,
    make_consistency_train_step,
    make_dmd_train_step,
    make_vae_gan_train_step,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_ddpm_train_step",
    "make_controlnet_train_step",
    "make_consistency_train_step",
    "make_dmd_train_step",
    "make_vae_gan_train_step",
]
