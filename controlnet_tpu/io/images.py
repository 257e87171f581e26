"""Image grid output (replaces torchvision.utils.make_grid + save_image)."""

from __future__ import annotations

import os

import numpy as np
from PIL import Image


def to_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """(B, H, W, C) in [0, 1] -> one (GH, GW, C) grid array in [0, 255] uint8."""
    images = np.asarray(images)
    b, h, w, c = images.shape
    ncol = nrow
    nrow_out = (b + ncol - 1) // ncol
    grid = np.ones((nrow_out * (h + pad) + pad, ncol * (w + pad) + pad, c), np.float32)
    for i in range(b):
        r, cl = divmod(i, ncol)
        y = pad + r * (h + pad)
        x = pad + cl * (w + pad)
        grid[y:y + h, x:x + w] = images[i]
    return (np.clip(grid, 0.0, 1.0) * 255.0).astype(np.uint8)


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8) -> None:
    """Save a batch (NHWC, [0, 1]) as a PNG grid."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    grid = to_grid(images, nrow=nrow)
    if grid.shape[-1] == 1:
        grid = grid[:, :, 0]
    Image.fromarray(grid).save(path)


def denorm(x: np.ndarray) -> np.ndarray:
    """[-1, 1] -> [0, 1] with clamp (the reference's (x+1)/2 clamp pattern)."""
    return np.clip((np.asarray(x) + 1.0) / 2.0, 0.0, 1.0)
