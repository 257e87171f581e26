from controlnet_tpu.ops.attention import multi_head_attention
from controlnet_tpu.ops.canny import canny_edges

__all__ = ["multi_head_attention", "canny_edges"]
