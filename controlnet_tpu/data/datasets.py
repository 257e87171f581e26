"""Datasets + batch iterator + latent cache.

Capability parity with the reference's dataset package:

* ``MnistDataset``  — dataset/mnist_dataset.py:11-66 (class-dir PNG tree,
  [-1, 1] tensors, on-the-fly cv2.Canny hints replicated to 3 channels)
* ``CifarDataset``  — dataset/cifar_dataset.py:12-185 (same contract, RGB;
  the torchvision auto-download at :41-104 is replaced by the offline
  ``controlnet_tpu/utils/extract_cifar_images.py`` converter — this
  environment has no torchvision and no network)
* ``CelebDataset``  — dataset/celeb_dataset.py:12-185 (resize + center-crop,
  optional cached-latent mode, canny hints from the full-resolution image —
  hint resolution is decoupled from latent resolution and handled by the LDM
  ControlNet's strided hint encoder, controlnet_ldm.py:45-79)
* ``load_latents``  — utils/diffusion_utils.py:7-18 (reads the reference's
  pickle shards AND this stack's npz shards, ``v[0]`` unwrap of batched
  entries)
* ``iterate_batches`` — replaces torch DataLoader(num_workers=4,
  shuffle=True) (tools/train_ddpm.py:48-51).  Static batch shapes (the
  trailing partial batch is dropped) keep every train step a single XLA
  compilation; ``prefetch > 0`` stages collation on a background thread so
  host-side image decode/canny overlaps device compute.

Layout note: everything here is NHWC float32 — the idiomatic layout for TPU
convolutions — not the reference's NCHW.
"""

from __future__ import annotations

import glob
import os
import pickle
import queue
import threading

import numpy as np
from PIL import Image

try:  # hint generation needs cv2 (reference requirements.txt: opencv_python)
    import cv2
except ImportError:  # pragma: no cover - cv2 is present in this env
    cv2 = None


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _to_unit(im: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (ToTensor + 2x-1, mnist_dataset.py:51-54)."""
    return (im.astype(np.float32) / 255.0) * 2.0 - 1.0


def _canny_hint(im_u8: np.ndarray) -> np.ndarray:
    """cv2.Canny(im, 100, 200) -> {0,1} float32 replicated to 3 channels
    (mnist_dataset.py:56-63).  ``im_u8`` may be grayscale (MNIST/CIFAR feed
    the gray conversion, matching the reference) or RGB (Celeb feeds the raw
    color array — the reference runs Canny on per-channel gradients,
    celeb_dataset.py:148-152)."""
    if cv2 is None:
        raise RuntimeError("opencv is required for return_hints=True")
    edges = cv2.Canny(im_u8, 100, 200)
    hint = (edges > 0).astype(np.float32)
    return np.repeat(hint[..., None], 3, axis=-1)


def _resize_center_crop(img: Image.Image, size: int) -> Image.Image:
    """torchvision Resize(size) + CenterCrop(size) (celeb_dataset.py:159-168):
    scale the short side to ``size``, then crop the center square."""
    w, h = img.size
    if min(w, h) != size:
        # torchvision Resize truncates the long side: int(size * long / short)
        nw, nh = ((size, int(size * h / w)) if w < h else (int(size * w / h), size))
        img = img.resize((nw, nh), Image.BILINEAR)
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def _glob_class_tree(im_path: str) -> list[str]:
    """Sorted ``<im_path>/<class>/*.png`` paths (mnist_dataset.py:30-44)."""
    if not os.path.isdir(im_path):
        raise FileNotFoundError(f"image directory {im_path} does not exist")
    files = sorted(glob.glob(os.path.join(im_path, "*", "*.png")))
    if not files:  # flat directory fallback
        files = sorted(glob.glob(os.path.join(im_path, "*.png")))
    return files


# ---------------------------------------------------------------------------
# latent cache (utils/diffusion_utils.py:7-18 + npz shards)
# ---------------------------------------------------------------------------


def load_latents(latent_path: str) -> dict[str, np.ndarray]:
    """Merge every ``*.pkl`` (reference format, infer_vae.py:88-114) and
    ``*.npz`` (this stack's format, tools/infer_vae.py) shard in
    ``latent_path`` into one {filename: latent array} dict.  Batched 4-D
    entries are ``[0]``-unwrapped, matching the reference's ``v[0]``."""

    def _unwrap(v) -> np.ndarray:
        if hasattr(v, "detach"):  # torch tensor from reference shards
            v = v.detach().cpu().numpy()
        arr = np.asarray(v)
        return arr[0] if arr.ndim == 4 else arr

    latents: dict[str, np.ndarray] = {}
    for f in sorted(glob.glob(os.path.join(latent_path, "*.pkl"))):
        with open(f, "rb") as fh:
            shard = pickle.load(fh)
        for k, v in shard.items():
            latents[k] = _unwrap(v)
    for f in sorted(glob.glob(os.path.join(latent_path, "*.npz"))):
        with np.load(f) as shard:
            for k in shard.files:
                latents[k] = _unwrap(shard[k])
    return latents


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


class MnistDataset:
    """Grayscale class-dir PNG tree -> (H, W, 1) float32 in [-1, 1]
    (+ optional (H, W, 3) {0,1} canny hint). Ref: dataset/mnist_dataset.py."""

    def __init__(self, split: str, im_path: str, return_hints: bool = False):
        self.split = split
        self.return_hints = return_hints
        self.images = _glob_class_tree(im_path)
        print(f"Found {len(self.images)} images for split {split}")

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, index: int):
        im_u8 = np.asarray(Image.open(self.images[index]).convert("L"))
        im = _to_unit(im_u8)[..., None]
        if self.return_hints:
            return im, _canny_hint(im_u8)
        return im


class CifarDataset:
    """RGB class-dir PNG tree -> (H, W, 3) float32 in [-1, 1] (+ optional
    canny hint computed on the grayscale conversion,
    dataset/cifar_dataset.py:141-158).

    The reference auto-downloads CIFAR-10 through torchvision
    (cifar_dataset.py:41-104); offline, convert the canonical
    ``cifar-10-batches-py`` pickles with
    ``python -m controlnet_tpu.utils.extract_cifar_images`` first.
    """

    def __init__(self, split: str, im_path: str, download: bool = False,
                 return_hints: bool = False):
        self.split = split
        self.return_hints = return_hints
        if download and not os.path.isdir(im_path):
            raise RuntimeError(
                "CIFAR auto-download is unavailable in this offline "
                "environment; run controlnet_tpu/utils/extract_cifar_images.py "
                "on the cifar-10-batches-py tarball contents to build the "
                f"PNG tree at {im_path} (see README)."
            )
        self.images = _glob_class_tree(im_path)
        print(f"Found {len(self.images)} images for split {split}")

    def __len__(self) -> int:
        return len(self.images)

    def __getitem__(self, index: int):
        rgb_u8 = np.asarray(Image.open(self.images[index]).convert("RGB"))
        im = _to_unit(rgb_u8)
        if self.return_hints:
            if cv2 is None:  # same guard as _canny_hint, before cvtColor
                raise RuntimeError("opencv is required for return_hints=True")
            gray = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2GRAY)
            return im, _canny_hint(gray)
        return im


class CelebDataset:
    """CelebA-HQ style flat image directory.

    * pixel mode: resize + center-crop to ``im_size`` -> (S, S, C) in [-1,1]
      (celeb_dataset.py:159-168)
    * latent mode (``use_latents=True`` and a populated ``latent_path``):
      returns the cached VAE encoder moments mean||logvar (h, w, 2z) keyed by
      filename (celeb_dataset.py:145-156); ``self.use_latents`` reports
      whether the cache was actually found, callers fall back to on-the-fly
      encoding otherwise (tools/train_ldm_vae.py).
    * ``return_hint``: canny hints from the image at ``canny_im_size``
      resolution — full-res 1024² for the real dataset, decoupled from the
      latent resolution (celeb_dataset.py:147-154, 170-177).
    """

    def __init__(self, split: str, im_path: str, im_size: int,
                 im_channels: int = 3, use_latents: bool = False,
                 latent_path: str | None = None, return_hint: bool = False,
                 canny_im_size: int = 1024):
        self.split = split
        self.im_path = im_path
        self.im_size = im_size
        self.im_channels = im_channels
        self.return_hint = return_hint
        self.canny_im_size = canny_im_size
        if not os.path.isdir(im_path):
            raise FileNotFoundError(f"image directory {im_path} does not exist")
        paths: list[str] = []
        for ext in ("png", "jpg", "jpeg"):
            paths += glob.glob(os.path.join(im_path, f"*.{ext}"))
        self._paths = sorted(paths)
        # basenames double as latent-cache keys (tools/infer_vae.py keys
        # shards by dataset.images[i])
        self.images = [os.path.basename(p) for p in self._paths]
        print(f"Found {len(self.images)} images for split {split}")

        self.use_latents = False
        self.latent_maps: dict[str, np.ndarray] = {}
        if use_latents and latent_path is not None:
            latents = load_latents(latent_path) if os.path.isdir(latent_path) else {}
            # accept full-path keys from foreign caches
            latents = {os.path.basename(k): v for k, v in latents.items()}
            if latents and all(name in latents for name in self.images):
                self.latent_maps = latents
                self.use_latents = True
                print(f"Found latents for {len(latents)} images")
            else:
                print("Latents not found (or incomplete) — falling back to images")

    def __len__(self) -> int:
        return len(self.images)

    def _load_hint(self, img: Image.Image) -> np.ndarray:
        # Canny on the raw RGB array (per-channel gradients), matching the
        # reference's hint distribution (celeb_dataset.py:148-152) — NOT on a
        # grayscale conversion like MNIST/CIFAR.
        img = _resize_center_crop(img.convert("RGB"), self.canny_im_size)
        return _canny_hint(np.asarray(img))

    def __getitem__(self, index: int):
        path = self._paths[index]
        src = None  # the file is decoded at most ONCE; PIL caches the
        # raster after the first convert, so pixel + hint share it
        if self.use_latents:
            item = self.latent_maps[self.images[index]].astype(np.float32)
        else:
            src = Image.open(path)
            mode = "RGB" if self.im_channels == 3 else "L"
            img = _resize_center_crop(src.convert(mode), self.im_size)
            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = arr[..., None]
            item = _to_unit(arr)
        if self.return_hint:
            return item, self._load_hint(src if src is not None else Image.open(path))
        return item


# ---------------------------------------------------------------------------
# batch iterator
# ---------------------------------------------------------------------------


def _collate(items: list):
    if isinstance(items[0], tuple):
        return tuple(np.stack([it[j] for it in items]) for j in range(len(items[0])))
    return np.stack(items)


def iterate_batches(dataset, batch_size: int, shuffle: bool = False,
                    seed: int = 0, prefetch: int = 2):
    """Yield collated numpy batches (replaces DataLoader,
    tools/train_ddpm.py:48-51).

    Deterministic under ``seed``.  The trailing partial batch is dropped so
    every step sees one static shape (one XLA compilation); datasets smaller
    than ``batch_size`` yield a single short batch instead of nothing.
    ``prefetch > 0`` collates up to that many batches ahead on a daemon
    thread, overlapping host-side decode/canny with device compute.
    """
    n = len(dataset)
    if n == 0:
        return
    order = np.random.default_rng(seed).permutation(n) if shuffle else np.arange(n)
    num_batches = n // batch_size
    if num_batches == 0:
        chunks = [order]
    else:
        chunks = [order[i * batch_size:(i + 1) * batch_size] for i in range(num_batches)]
        dropped = n - num_batches * batch_size
        if dropped and not getattr(iterate_batches, "_warned_drop", False):
            iterate_batches._warned_drop = True
            print(f"iterate_batches: dropping trailing partial batch of "
                  f"{dropped} sample(s) per epoch to keep static shapes "
                  f"({n} samples, batch {batch_size}); warning shown once")

    if prefetch <= 0:
        for idx in chunks:
            yield _collate([dataset[int(i)] for i in idx])
        return

    q: queue.Queue = queue.Queue(maxsize=prefetch)
    stop = threading.Event()
    _SENTINEL = object()

    def _put(item) -> None:
        # stop-aware put: a plain blocking q.put would leak this thread (and
        # up to ``prefetch`` collated batches) forever if the consumer
        # abandons the generator while the queue is full
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def _producer() -> None:
        try:
            for idx in chunks:
                if stop.is_set():
                    return
                _put(_collate([dataset[int(i)] for i in idx]))
            _put(_SENTINEL)
        except BaseException as e:  # surface worker errors to the consumer
            _put(e)

    t = threading.Thread(target=_producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
