"""LPIPS perceptual loss (VGG16 backbone) in JAX.

Parity with reference models/lpips.py:22-163: frozen VGG16 feature slices
(relu1_2/relu2_2/relu3_3/relu4_3/relu5_3), ImageNet scaling layer, learned
1x1 "lin" heads, channel-unit-normalized squared feature diffs, spatial
average, summed over the 5 levels.

Weights: the reference needs torchvision's pretrained VGG16 plus the
richzhang ``vgg.pth`` lin weights, both downloaded by the user
(reference README.md:64).  This environment has no torchvision, so:

* ``load_torch_weights(params, path)`` imports either a full LPIPS state
  dict (net.slice*.conv weights + lin0..4) or the lin-only ``vgg.pth``,
  converting OIHW -> HWIO.  Place files under ``weights/`` as in the
  reference layout.
* Without weights the VGG backbone falls back to fixed Kaiming-init random
  features (the same strategy the reference's DMD FeatureExtractor uses,
  distribution_matching_controlnet.py:64-76).  Random-feature perceptual
  distances are a known-reasonable proxy; flagged via ``pretrained=False``.
"""

from __future__ import annotations

import math
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

Params = Any

# VGG16 conv plan: (out_channels, n_convs) per stage; maxpool between stages.
_VGG_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]
_LIN_CHANNELS = [64, 128, 256, 512, 512]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self):
        self.chns = _LIN_CHANNELS

    def init(self, key: jax.Array) -> Params:
        """Kaiming-init VGG convs + uniform lin heads; use
        ``load_torch_weights`` to overwrite with pretrained values."""
        vgg = []
        in_ch = 3
        for out_ch, n_convs in _VGG_STAGES:
            stage = []
            for _ in range(n_convs):
                key, k = jax.random.split(key)
                std = math.sqrt(2.0 / (in_ch * 9))  # Kaiming fan-in = C_in*k*k
                stage.append({
                    "w": jax.random.normal(k, (3, 3, in_ch, out_ch), jnp.float32) * std,
                    "b": jnp.zeros((out_ch,), jnp.float32),
                })
                in_ch = out_ch
            vgg.append(stage)
        lins = []
        for c in self.chns:
            key, k = jax.random.split(key)
            lins.append({"w": jax.random.uniform(k, (1, 1, c, 1), jnp.float32, 0.0, 0.1)})
        return {"vgg": vgg, "lins": lins}

    # ------------------------------------------------------------------
    def _vgg_features(self, p: Params, x: jax.Array) -> list[jax.Array]:
        feats = []
        out = x
        for si, stage in enumerate(p["vgg"]):
            if si > 0:
                out = jax.lax.reduce_window(
                    out, -jnp.inf, jax.lax.max,
                    window_dimensions=(1, 2, 2, 1),
                    window_strides=(1, 2, 2, 1),
                    padding="VALID",
                )
            for conv in stage:
                out = jax.lax.conv_general_dilated(
                    out, conv["w"], (1, 1), ((1, 1), (1, 1)),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ) + conv["b"]
                out = jax.nn.relu(out)
            feats.append(out)
        return feats

    def __call__(self, p: Params, in0: jax.Array, in1: jax.Array, normalize: bool = False) -> jax.Array:
        """Perceptual distance per sample: (B, 1, 1, 1).  Inputs NHWC in
        [-1, 1] (or [0, 1] with normalize=True).  Grayscale inputs are
        broadcast to 3 channels (reference feeds 3ch or relies on user)."""
        if normalize:
            in0 = 2 * in0 - 1
            in1 = 2 * in1 - 1
        if in0.shape[-1] == 1:
            in0 = jnp.repeat(in0, 3, axis=-1)
            in1 = jnp.repeat(in1, 3, axis=-1)
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        f0 = self._vgg_features(p, (in0 - shift) / scale)
        f1 = self._vgg_features(p, (in1 - shift) / scale)
        val = 0.0
        for k in range(len(self.chns)):
            n0 = f0[k] / jnp.sqrt(jnp.sum(f0[k] ** 2, axis=-1, keepdims=True) + 1e-10)
            n1 = f1[k] / jnp.sqrt(jnp.sum(f1[k] ** 2, axis=-1, keepdims=True) + 1e-10)
            diff = (n0 - n1) ** 2
            lin = p["lins"][k]["w"]
            res = jax.lax.conv_general_dilated(
                diff, lin, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            val = val + res.mean(axis=(1, 2), keepdims=True)
        return val


def load_torch_weights(params: Params, path: str,
                       have_vgg: bool = False) -> tuple[Params, bool]:
    """Import torch LPIPS weights.  Returns (params, vgg_pretrained).

    Accepts the richzhang lin-only ``vgg.pth`` (keys ``lin{k}.model.1.weight``)
    and/or a full dump including VGG features (keys ``net.slice{s}.{i}.weight``).

    ``have_vgg``: pass the previous call's second return value when layering
    files — e.g. a full torchvision VGG dump first, then the lin-only
    ``vgg.pth`` on top.  Lin heads are only meaningful over the pretrained
    channels they were trained on, so they are applied iff this file OR a
    previous load provided the VGG features.  The returned flag is
    cumulative: True once ``params`` holds pretrained VGG features.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    params = jax.tree.map(lambda x: x, params)  # shallow copy
    found_vgg = False

    # full VGG features, torchvision layer indices within slices
    slice_layout = {1: [0, 2], 2: [5, 7], 3: [10, 12, 14], 4: [17, 19, 21], 5: [24, 26, 28]}
    for s, idxs in slice_layout.items():
        for ci, li in enumerate(idxs):
            wkey = f"net.slice{s}.{li}.weight"
            bkey = f"net.slice{s}.{li}.bias"
            if wkey in sd:
                found_vgg = True
                w = sd[wkey].numpy().transpose(2, 3, 1, 0)  # OIHW -> HWIO
                params["vgg"][s - 1][ci] = {
                    "w": jnp.asarray(w),
                    "b": jnp.asarray(sd[bkey].numpy()),
                }

    # lin heads — applied ONLY alongside the VGG features they were trained
    # on: pretrained per-channel weightings over random Kaiming channels are
    # channel-by-channel nonsense (worse than the uniform fallback)
    lins = {}
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in sd:
                w = sd[key].numpy()  # (1, C, 1, 1) OIHW
                lins[k] = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
                break
    if lins and (found_vgg or have_vgg):
        for k, v in lins.items():
            params["lins"][k] = v
    elif lins:
        print(f"LPIPS: {path} carries lin heads but no VGG features — "
              "ignoring them (pretrained weightings are only meaningful over "
              "the matching pretrained channels); keeping the uniform "
              "random-feature fallback")
    return params, found_vgg or have_vgg


def default_weights_path() -> str:
    """Reference layout: models/weights/v0.1/vgg.pth next to the module
    (lpips.py:92-96)."""
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "weights", "v0.1", "vgg.pth")
