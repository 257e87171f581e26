from controlnet_tpu.io.images import save_image_grid, to_grid
from controlnet_tpu.io.checkpoint import (save_checkpoint, restore_checkpoint,
                                          latest_checkpoint, wait_for_checkpoints)

__all__ = [
    "save_image_grid",
    "to_grid",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_checkpoint",
    "wait_for_checkpoints",
]
