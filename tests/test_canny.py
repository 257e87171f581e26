"""On-TPU canny vs cv2.Canny(100, 200) fidelity (SURVEY.md §7 hard part 7:
the training distribution depends on hint fidelity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from controlnet_tpu.data.synthetic import _draw_shape
from controlnet_tpu.ops.canny import canny_edges, canny_hints

cv2 = pytest.importorskip("cv2")


def _agreement(a: np.ndarray, b: np.ndarray) -> float:
    return float((a == b).mean())


def test_canny_matches_cv2_on_shapes():
    rng = np.random.default_rng(0)
    imgs = np.stack([_draw_shape(rng, 28, k) for k in range(8)])
    ours = np.asarray(canny_edges(jnp.asarray(imgs, jnp.float32))).astype(np.uint8)
    refs = np.stack([cv2.Canny(im, 100, 200) for im in imgs])
    # Pixel-exact agreement is not expected (cv2 NMS tie-breaking differs at
    # plateau edges); require high agreement on every image.
    for o, r in zip(ours, refs):
        assert _agreement(o > 0, r > 0) > 0.93


def test_canny_blank_and_full():
    blank = jnp.zeros((1, 16, 16))
    assert float(canny_edges(blank).sum()) == 0.0
    flat = jnp.full((1, 16, 16), 200.0)
    assert float(canny_edges(flat).sum()) == 0.0  # no gradient -> no edges


def test_canny_hints_contract():
    """Hints are 3-channel [0,1] replicas (mnist_dataset.py:56-63)."""
    rng = np.random.default_rng(1)
    img = _draw_shape(rng, 28, 0).astype(np.float32) / 255.0
    hints = np.asarray(canny_hints(jnp.asarray(img)[None, :, :, None]))
    assert hints.shape == (1, 28, 28, 3)
    assert set(np.unique(hints)) <= {0.0, 1.0}
    np.testing.assert_array_equal(hints[..., 0], hints[..., 1])
    np.testing.assert_array_equal(hints[..., 0], hints[..., 2])


def test_canny_hints_rgb_input():
    """RGB inputs get luma-converted before canny (cifar path)."""
    rng = np.random.default_rng(2)
    img = _draw_shape(rng, 32, 1).astype(np.float32) / 255.0
    rgb = np.stack([img, img * 0.8, img * 0.6], axis=-1)[None]
    hints = np.asarray(canny_hints(jnp.asarray(rgb)))
    assert hints.shape == (1, 32, 32, 3)
    assert hints.sum() > 0  # found the shape edges
    assert set(np.unique(hints)) <= {0.0, 1.0}


def test_canny_usable_after_traced_package_import():
    """Regression (round 2): `controlnet_tpu.ops` may legitimately be first
    imported INSIDE a jit trace (the attention dispatch lazy-imports its
    Pallas kernel).  The package __init__ used to import canny eagerly,
    whose module-level jnp Sobel constants then became tracers of that
    enclosing trace — and every later canny call died with
    UnexpectedTracerError (hit by tools/train_ddpm_controlnet.py
    --hint_backend tpu after a cv2-backend run in the same process)."""
    import importlib
    import sys

    import jax

    saved = {m: sys.modules.pop(m) for m in list(sys.modules)
             if m.startswith("controlnet_tpu.ops")}
    try:
        @jax.jit
        def traced_importer(x):
            import controlnet_tpu.ops  # noqa: F401  (import inside trace)
            from controlnet_tpu.ops import canny  # noqa: F401

            return x * 2

        traced_importer(jnp.ones((2,)))
        canny_mod = importlib.import_module("controlnet_tpu.ops.canny")
        out = jax.jit(canny_mod.canny_hints)(jnp.zeros((1, 8, 8, 1)))
        assert out.shape == (1, 8, 8, 3)
    finally:
        sys.modules.update(saved)
