"""Kaggle MNIST CSV -> per-class PNG tree converter.

Parity with reference utils/extract_mnist_images.py:11-31: each CSV row is
``label, 784 pixel values``; writes <save_dir>/<label>/<n>.png.
"""

from __future__ import annotations

import csv
import os

import numpy as np
from PIL import Image


def extract_images(save_dir: str, csv_fname: str) -> None:
    assert os.path.exists(csv_fname), f"csv file {csv_fname} does not exist"
    with open(csv_fname) as f:
        reader = csv.reader(f)
        next(reader)  # header
        for idx, row in enumerate(reader):
            label = row[0]
            d = os.path.join(save_dir, label)
            os.makedirs(d, exist_ok=True)
            img = np.asarray(row[1:], np.uint8).reshape(28, 28)
            Image.fromarray(img).save(os.path.join(d, f"{idx}.png"))
            if idx % 1000 == 0:
                print(f"extracted {idx} images")


if __name__ == "__main__":
    import argparse

    parser = argparse.ArgumentParser(description="Extract MNIST csv to png tree")
    parser.add_argument("--csv", required=True)
    parser.add_argument("--save_dir", required=True)
    args = parser.parse_args()
    extract_images(args.save_dir, args.csv)
