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


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Extract CIFAR-10 pickle batches to a png tree")
    parser.add_argument("--batches_dir", required=True,
                        help="path to cifar-10-batches-py/")
    parser.add_argument("--save_root", required=True)
    args = parser.parse_args()
    extract_images(args.batches_dir, args.save_root)
