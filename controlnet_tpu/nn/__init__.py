from controlnet_tpu.nn.layers import (
    Conv2d,
    ConvTranspose2d,
    Linear,
    GroupNorm,
    BatchNorm,
    MultiheadAttention,
    Sequential,
    Identity,
    silu,
    leaky_relu,
    get_time_embedding,
)
from controlnet_tpu.nn.blocks import DownBlock, MidBlock, UpBlock

__all__ = [
    "Conv2d",
    "ConvTranspose2d",
    "Linear",
    "GroupNorm",
    "BatchNorm",
    "MultiheadAttention",
    "Sequential",
    "Identity",
    "silu",
    "leaky_relu",
    "get_time_embedding",
    "DownBlock",
    "MidBlock",
    "UpBlock",
]
