"""Vectorized Canny edge detection as pure JAX ops (runs on TPU).

The reference computes hints host-side, one image at a time, with
cv2.Canny(im, 100, 200) (dataset/mnist_dataset.py:56-63,
dataset/cifar_dataset.py:141-158, dataset/celeb_dataset.py:147-154).  This
implementation reproduces OpenCV's algorithm closely enough for training
parity — Sobel-3x3 gradients on the raw image (cv2.Canny applies no blur by
default), L1 magnitude, 4-direction non-maximum suppression, double
threshold, and hysteresis via iterated 3x3 dilation — but batched and
jittable, so hint generation can fuse into the data pipeline on device.

tests/test_canny.py validates agreement against cv2 on real digit-like
images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


# numpy, NOT jnp: module import may occur inside an active jit trace (lazy
# imports elsewhere in the package), where a jnp constant would be traced —
# and leak as a stale tracer into every later use of this module.
import numpy as np

_SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], np.float32)
_SOBEL_Y = np.array([[-1.0, -2.0, -1.0], [0.0, 0.0, 0.0], [1.0, 2.0, 1.0]], np.float32)


def _conv3x3(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise-free 3x3 conv on (B, H, W) with replicate padding (matches
    cv2's BORDER_REPLICATE default for Sobel)."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
    out = jax.lax.conv_general_dilated(
        xp[:, :, :, None],
        kernel[:, :, None, None],
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out[:, :, :, 0]


def _shift_pad(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Shift (B, H, W) by (dy, dx), zero-filling edges."""
    b, h, w = x.shape
    out = jnp.zeros_like(x)
    ys = slice(max(dy, 0), h + min(dy, 0))
    xs = slice(max(dx, 0), w + min(dx, 0))
    ys_src = slice(max(-dy, 0), h + min(-dy, 0))
    xs_src = slice(max(-dx, 0), w + min(-dx, 0))
    return out.at[:, ys, xs].set(x[:, ys_src, xs_src])


@functools.partial(jax.jit, static_argnames=("low_threshold", "high_threshold", "hysteresis_iters"))
def canny_edges(
    images: jax.Array,
    low_threshold: int = 100,
    high_threshold: int = 200,
    hysteresis_iters: int | None = None,
) -> jax.Array:
    """Batched Canny. ``images``: (B, H, W) grayscale in [0, 255] (float or
    uint8). Returns float32 (B, H, W) edge maps with values {0, 255}.

    ``hysteresis_iters`` defaults to an image-size-scaled count (each
    iteration grows strong edges by 1 px through weak pixels; cv2 follows
    chains to arbitrary length, so larger images need more iterations).
    """
    if hysteresis_iters is None:
        hysteresis_iters = min(128, max(32, max(images.shape[1], images.shape[2]) // 8))
    x = images.astype(jnp.float32)

    gx = _conv3x3(x, _SOBEL_X)
    gy = _conv3x3(x, _SOBEL_Y)
    # cv2.Canny default uses L1 gradient (|gx| + |gy|) unless L2gradient=True.
    mag = jnp.abs(gx) + jnp.abs(gy)

    # --- Non-maximum suppression with cv2's integer sector quantization ---
    # cv2 picks sector by comparing |gy| against |gx|*tan(22.5) and
    # |gx|*tan(67.5).
    ax, ay = jnp.abs(gx), jnp.abs(gy)
    tan225 = 0.4142135623730951
    tan675 = 2.414213562373095
    horiz = ay <= ax * tan225  # gradient ~horizontal -> compare left/right
    vert = ay > ax * tan675  # gradient ~vertical -> compare up/down
    diag = ~horiz & ~vert
    same_sign = (gx * gy) >= 0  # 45-deg diagonal vs 135-deg

    m_l = _shift_pad(mag, 0, 1)
    m_r = _shift_pad(mag, 0, -1)
    m_u = _shift_pad(mag, 1, 0)
    m_d = _shift_pad(mag, -1, 0)
    m_ul = _shift_pad(mag, 1, 1)
    m_dr = _shift_pad(mag, -1, -1)
    m_ur = _shift_pad(mag, 1, -1)
    m_dl = _shift_pad(mag, -1, 1)

    n1 = jnp.where(horiz, m_l, jnp.where(vert, m_u, jnp.where(same_sign, m_ul, m_ur)))
    n2 = jnp.where(horiz, m_r, jnp.where(vert, m_d, jnp.where(same_sign, m_dr, m_dl)))
    is_max = (mag > n1) & (mag >= n2)

    strong = is_max & (mag > high_threshold)
    weak = is_max & (mag > low_threshold)

    # --- Hysteresis: grow strong edges through weak pixels via iterated 3x3
    # dilation. A fixed iteration count keeps the op jittable; 32 iterations
    # track edge chains up to 32 px, enough for the 28-1024 px hint images. ---
    def body(_, s):
        grown = jax.lax.reduce_window(
            s.astype(jnp.float32),
            0.0,
            jax.lax.max,
            window_dimensions=(1, 3, 3),
            window_strides=(1, 1, 1),
            padding="SAME",
        )
        return (grown > 0) & weak | s

    edges = jax.lax.fori_loop(0, hysteresis_iters, body, strong)
    return edges.astype(jnp.float32) * 255.0


def canny_hints(images_01: jax.Array, low: int = 100, high: int = 200) -> jax.Array:
    """Full reference hint pipeline: grayscale [0,1] NHWC image -> canny ->
    replicate to 3 channels -> scale to [0,1].

    Parity: dataset/mnist_dataset.py:56-63 (canny, stack 3ch, ToTensor).
    ``images_01``: (B, H, W, C) in [0, 1]; RGB inputs are converted with
    cv2's BGR-free luma weights (cifar_dataset.py:146 uses cv2.COLOR_RGB2GRAY).
    """
    if images_01.shape[-1] == 3:
        w = jnp.array([0.299, 0.587, 0.114], images_01.dtype)
        gray = jnp.einsum("bhwc,c->bhw", images_01, w)
    else:
        gray = images_01[..., 0]
    edges = canny_edges(jnp.round(gray * 255.0), low, high)
    hint = (edges > 0).astype(jnp.float32)  # exact {0, 1}
    return jnp.repeat(hint[..., None], 3, axis=-1)
