from controlnet_tpu.models.unet import UNet
from controlnet_tpu.models.vae import VAE
from controlnet_tpu.models.controlnet import ControlNet
from controlnet_tpu.models.discriminator import Discriminator
from controlnet_tpu.models.consistency import ConsistencyControlNet, ConsistencyDistilled
from controlnet_tpu.models.dmd import (
    FeatureExtractor,
    DistributionMatchingControlNet,
    DistributionMatchingDistilled,
)
from controlnet_tpu.models.lpips import LPIPS

__all__ = [
    "UNet",
    "VAE",
    "ControlNet",
    "Discriminator",
    "ConsistencyControlNet",
    "ConsistencyDistilled",
    "FeatureExtractor",
    "DistributionMatchingControlNet",
    "DistributionMatchingDistilled",
    "LPIPS",
]
