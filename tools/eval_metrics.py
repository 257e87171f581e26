"""Sample-quality metrics between two image sets (fidelity parity protocol).

The reference publishes no quantitative benchmarks (SURVEY.md §6); the
BASELINE protocol is self-generated: sample N images from both stacks and
compare distributions.  This tool computes:

* **FFD** — Fréchet distance on frozen conv-pyramid features (the DMD
  FeatureExtractor, distribution_matching_controlnet.py:16-86).  True FID
  needs InceptionV3 weights, which are unavailable offline; FFD follows
  the same Fréchet-on-deep-features construction and is computed with an
  identical, seeded feature net for both sets, so it ranks parity
  faithfully.  (Drop-in: swap the feature net for Inception when weights
  are available.)
* **LPIPS** — mean pairwise perceptual distance between matched images
  (order-aligned), using models/lpips.py.

Usage:
  python -m tools.eval_metrics --dir_a mnist/samples_ref --dir_b mnist/samples_tpu [--im_channels 1]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from controlnet_tpu import cli
from controlnet_tpu.models.dmd import FeatureExtractor
from controlnet_tpu.models.lpips import LPIPS


def load_images(d: str, im_channels: int) -> np.ndarray:
    paths = sorted(
        glob.glob(os.path.join(d, "*.png")) + glob.glob(os.path.join(d, "*.jpg"))
    )
    assert paths, f"no images under {d}"
    ims = []
    for p in paths:
        im = Image.open(p)
        im = im.convert("L" if im_channels == 1 else "RGB")
        arr = np.asarray(im, np.float32) / 255.0 * 2.0 - 1.0
        if arr.ndim == 2:
            arr = arr[:, :, None]
        ims.append(arr)
    return np.stack(ims)


def frechet_distance(mu1, cov1, mu2, cov2) -> float:
    """d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))."""
    from scipy import linalg

    diff = mu1 - mu2
    # scipy<1.16 returns (sqrtm, errest) when asked for the error estimate;
    # the `disp` argument is deprecated (removed in 1.18), so call without it
    # and unwrap defensively to stay portable across scipy versions.
    covmean = linalg.sqrtm(cov1 @ cov2)
    if isinstance(covmean, tuple):
        covmean = covmean[0]
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2.0 * np.trace(covmean))


def extract_features(fe: FeatureExtractor, params, images: np.ndarray,
                     batch: int = 64) -> np.ndarray:
    """Global-average-pooled top-stage features, one row per image."""
    feats_fn = jax.jit(lambda p, x: fe(p, x)[-1].mean(axis=(1, 2)))
    chunks = []
    for i in range(0, len(images), batch):
        chunks.append(np.asarray(feats_fn(params, jnp.asarray(images[i : i + batch]))))
    return np.concatenate(chunks)


def _stats(feats: np.ndarray):
    return feats.mean(axis=0), np.cov(feats, rowvar=False)


def feature_stats(fe: FeatureExtractor, params, images: np.ndarray, batch: int = 64):
    """Global-average-pooled top-stage features -> (mu, cov)."""
    return _stats(extract_features(fe, params, images, batch))


def ffd_with_ci(images_a: np.ndarray, images_b: np.ndarray, im_channels: int,
                seed: int = 0, n_boot: int = 100, paired: bool = False):
    """FFD point estimate + percentile-bootstrap 95% CI (VERDICT r3 #5).

    Features are extracted once; each bootstrap draw resamples image rows
    with replacement on BOTH sides and recomputes the Fréchet distance
    from the resampled (mu, cov).

    ``paired=True`` uses SHARED bootstrap indices on both sides — required
    when row i of ``images_a`` corresponds to row i of ``images_b`` (e.g.
    the shared-RNG control, where both sets come from the same x_T/hint):
    independent resampling would destroy the pairing and report unpaired
    estimator noise instead of the paired distance's uncertainty."""
    fe = FeatureExtractor(in_channels=im_channels)
    fe_params = fe.init(jax.random.PRNGKey(seed))
    fa = extract_features(fe, fe_params, images_a)
    fb = extract_features(fe, fe_params, images_b)
    if paired and len(fa) != len(fb):
        raise ValueError(f"paired=True needs equal sizes, got {len(fa)}/{len(fb)}")
    point = frechet_distance(*_stats(fa), *_stats(fb))
    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(n_boot):
        ia = rng.integers(0, len(fa), len(fa))
        ib = ia if paired else rng.integers(0, len(fb), len(fb))
        vals.append(frechet_distance(*_stats(fa[ia]), *_stats(fb[ib])))
    lo, hi = np.percentile(vals, [2.5, 97.5])
    return {"ffd": float(point), "ffd_ci_lo": float(lo), "ffd_ci_hi": float(hi),
            "n_boot": n_boot, "paired": paired}


def evaluate(images_a: np.ndarray, images_b: np.ndarray, im_channels: int, seed: int = 0):
    fe = FeatureExtractor(in_channels=im_channels)
    fe_params = fe.init(jax.random.PRNGKey(seed))
    mu_a, cov_a = feature_stats(fe, fe_params, images_a)
    mu_b, cov_b = feature_stats(fe, fe_params, images_b)
    ffd = frechet_distance(mu_a, cov_a, mu_b, cov_b)

    lp = LPIPS()
    lp_params = lp.init(jax.random.PRNGKey(seed + 1))
    n = min(len(images_a), len(images_b))
    lp_fn = jax.jit(lambda p, a, b: lp(p, a, b).mean())
    lpips_vals = []
    for i in range(0, n, 32):
        a = jnp.asarray(images_a[i : i + 32])
        b = jnp.asarray(images_b[i : i + 32])
        m = min(a.shape[0], b.shape[0])
        lpips_vals.append(float(lp_fn(lp_params, a[:m], b[:m])))
    return {"ffd": ffd, "lpips_mean": float(np.mean(lpips_vals)), "n_a": len(images_a),
            "n_b": len(images_b)}


def main(args):
    cli.setup_jax()
    images_a = load_images(args.dir_a, args.im_channels)
    images_b = load_images(args.dir_b, args.im_channels)
    metrics = evaluate(images_a, images_b, args.im_channels, args.seed)
    print(json.dumps(metrics))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(metrics, f, indent=2)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Fidelity metrics between two sample sets")
    parser.add_argument("--dir_a", required=True)
    parser.add_argument("--dir_b", required=True)
    parser.add_argument("--im_channels", type=int, default=1)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", default=None)
    main(parser.parse_args())
