"""API-parity shim: the reference exposes these under utils/config_utils.py
(:1-40); the implementations live in controlnet_tpu.config."""

from controlnet_tpu.config import (
    get_config_value,
    validate_class_config,
    validate_text_config,
    validate_image_config,
    validate_image_conditional_input,
    validate_class_conditional_input,
)

__all__ = [
    "get_config_value",
    "validate_class_config",
    "validate_text_config",
    "validate_image_config",
    "validate_image_conditional_input",
    "validate_class_conditional_input",
]
