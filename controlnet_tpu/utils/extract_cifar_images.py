"""CIFAR-10 python-batch archive -> per-class PNG tree converter.

The reference downloads CIFAR-10 through torchvision and exports a PNG tree
(dataset/cifar_dataset.py:41-104).  This environment has no torchvision and
no network, so this tool converts the standard ``cifar-10-batches-py``
pickle files (from the canonical tarball, if the user has it) into the same
``<root>/{train,test}/<class>/<n>.png`` layout that ``CifarDataset``
expects.
"""

from __future__ import annotations

import os
import pickle

import numpy as np
from PIL import Image

CLASSES = ["airplane", "automobile", "bird", "cat", "deer",
           "dog", "frog", "horse", "ship", "truck"]


def _load_batch(path: str) -> tuple[np.ndarray, list[int]]:
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return data, list(d[b"labels"])


def extract_images(batches_dir: str, save_root: str) -> None:
    splits = {
        "train": [f"data_batch_{i}" for i in range(1, 6)],
        "test": ["test_batch"],
    }
    for split, files in splits.items():
        counters = [0] * 10
        for fname in files:
            path = os.path.join(batches_dir, fname)
            if not os.path.exists(path):
                print(f"skipping missing batch file {path}")
                continue
            data, labels = _load_batch(path)
            for img, label in zip(data, labels):
                d = os.path.join(save_root, split, CLASSES[label])
                os.makedirs(d, exist_ok=True)
                Image.fromarray(img).save(os.path.join(d, f"{counters[label]}.png"))
                counters[label] += 1
        print(f"{split}: wrote {sum(counters)} images")


CIFAR_URL = "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz"


def download_cifar(dest_dir: str, url: str = CIFAR_URL) -> str:
    """Download + extract the canonical CIFAR-10 tarball, returning the
    ``cifar-10-batches-py`` directory — the auto-download half of reference
    dataset/cifar_dataset.py:41-104 without the torchvision dependency.
    Needs network egress; in the offline build environment this raises and
    the converter path above (pre-obtained tarball) is the supported route.
    """
    import tarfile
    import urllib.request

    os.makedirs(dest_dir, exist_ok=True)
    out = os.path.join(dest_dir, "cifar-10-batches-py")
    if os.path.isdir(out) and os.path.exists(os.path.join(out, "data_batch_1")):
        print(f"found existing {out}")
        return out
    tar_path = os.path.join(dest_dir, "cifar-10-python.tar.gz")
    if not os.path.exists(tar_path):
        print(f"downloading {url} ...")
        urllib.request.urlretrieve(url, tar_path)
    with tarfile.open(tar_path, "r:gz") as tf:
        tf.extractall(dest_dir, filter="data")
    return out


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Extract CIFAR-10 pickle batches to a png tree")
    parser.add_argument("--batches_dir",
                        help="path to cifar-10-batches-py/ (omit with --download)")
    parser.add_argument("--save_root", required=True)
    parser.add_argument("--download", action="store_true",
                        help="fetch the canonical tarball first (needs network)")
    args = parser.parse_args()
    batches = args.batches_dir
    if args.download:
        batches = download_cifar(os.path.dirname(args.save_root) or ".")
    if not batches:
        parser.error("--batches_dir is required unless --download is given")
    extract_images(batches, args.save_root)
