"""Reconstruction quality metrics (MindEye-derived suite).

Rebuilds ``Generation/Reconstruction_Metrics_ATM.ipynb`` (cells 8-24):

- PixCorr: per-pair Pearson correlation of flattened pixels (cell 10)
- SSIM: grayscale structural similarity (cell 12) — implemented from the
  Wang et al. 2004 formula with the gaussian window skimage uses
- two-way identification (cells 14-18): % of (i, j≠i) pairs where
  corr(gen_i, gt_i) > corr(gen_i, gt_j), computed over *features* from any
  extractor (AlexNet-2/5, InceptionV3, CLIP in the reference)
- feature distance (cells 20-22): mean pairwise distance in feature space
  (EffNet-B / SwAV rows; correlation distance)

Feature extraction itself needs pretrained vision backbones (external hub
weights); metrics take precomputed feature arrays, with an optional
``feature_fn`` hook. All metric math is jnp and jit-friendly.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def _flat(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1).astype(jnp.float32)


def _rowwise_corr(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pearson correlation per row of two (N, D) arrays."""
    a = a - a.mean(axis=1, keepdims=True)
    b = b - b.mean(axis=1, keepdims=True)
    num = jnp.sum(a * b, axis=1)
    den = jnp.sqrt(jnp.sum(a * a, axis=1) * jnp.sum(b * b, axis=1)) + 1e-12
    return num / den


def pixcorr(generated: jax.Array, ground_truth: jax.Array) -> jax.Array:
    """Mean per-image pixel correlation (ref cell 10)."""
    return jnp.mean(_rowwise_corr(_flat(generated), _flat(ground_truth)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    w = np.outer(g, g)
    return (w / w.sum()).astype(np.float32)


def to_grayscale(images: jax.Array) -> jax.Array:
    """(N, H, W, 3) → (N, H, W) luma (the ref converts via PIL 'L' ≈ ITU-R 601)."""
    if images.ndim == 4 and images.shape[-1] == 3:
        w = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)
        return jnp.tensordot(images.astype(jnp.float32), w, axes=[[-1], [0]])
    return images.astype(jnp.float32)


def ssim(
    generated: jax.Array,
    ground_truth: jax.Array,
    *,
    data_range: float = 1.0,
    window_size: int = 11,
    sigma: float = 1.5,
) -> jax.Array:
    """Mean grayscale SSIM (ref cell 12 uses skimage's gaussian_weights=True,
    sigma=1.5, use_sample_covariance=False formulation)."""
    x = to_grayscale(generated)[..., None]
    y = to_grayscale(ground_truth)[..., None]
    w = jnp.asarray(_gaussian_window(window_size, sigma))[..., None, None]

    def filt(img):
        return jax.lax.conv_general_dilated(
            img, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    mu_x, mu_y = filt(x), filt(y)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sig_x = filt(x * x) - mu_xx
    sig_y = filt(y * y) - mu_yy
    sig_xy = filt(x * y) - mu_xy
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * mu_xy + c1) * (2 * sig_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sig_x + sig_y + c2)
    )
    return jnp.mean(s)


def two_way_identification(
    gen_features: jax.Array, gt_features: jax.Array
) -> jax.Array:
    """% of ordered pairs (i, j≠i) with corr(gen_i, gt_i) > corr(gen_i, gt_j)
    (ref cell 8's ``two_way_identification``, applied to AlexNet/Inception/
    CLIP features in cells 14-18)."""
    g = _flat(gen_features)
    t = _flat(gt_features)
    g = g - g.mean(axis=1, keepdims=True)
    t = t - t.mean(axis=1, keepdims=True)
    g = g / (jnp.linalg.norm(g, axis=1, keepdims=True) + 1e-12)
    t = t / (jnp.linalg.norm(t, axis=1, keepdims=True) + 1e-12)
    corr = g @ t.T  # (N, N) correlation matrix
    diag = jnp.diagonal(corr)
    wins = (diag[:, None] > corr).astype(jnp.float32)
    n = corr.shape[0]
    return (wins.sum() - 0.0) / (n * (n - 1))  # diagonal never wins vs itself


def feature_distance(
    gen_features: jax.Array, gt_features: jax.Array
) -> jax.Array:
    """Mean per-pair correlation distance (ref cells 20-22: EffNet-B / SwAV
    rows report 1 − corr)."""
    return jnp.mean(1.0 - _rowwise_corr(_flat(gen_features), _flat(gt_features)))


def make_clip_extractor(tower, params, *, image_size: int | None = None):
    """Feature extractor backed by the flax CLIP vision tower
    (``models/clip_vit.py``) — the notebook's CLIP ViT-L/14 row (cell 18)
    without the torch dependency. Resizes+normalizes [0,1] NHWC images."""
    from eeg_image_decode_tpu.models.clip_vit import clip_preprocess

    size = image_size or tower.config.image_size

    @jax.jit
    def extract(images: jax.Array) -> jax.Array:
        b = images.shape[0]
        if images.shape[1] != size:
            images = jax.image.resize(images, (b, size, size, 3), "bilinear")
        feats = tower.apply({"params": params}, clip_preprocess(images))
        return feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)

    return extract


def reconstruction_metrics(
    generated: jax.Array,
    ground_truth: jax.Array,
    feature_extractors: dict[str, Callable[[jax.Array], jax.Array]] | None = None,
) -> dict[str, float]:
    """Full suite over aligned image batches in [0, 1], NHWC.

    ``feature_extractors`` maps a name to a callable images→features; each
    contributes a ``2way_<name>`` (and ``dist_<name>``) row, mirroring the
    notebook's AlexNet(2/5)/Inception/CLIP and EffNet/SwAV rows.
    """
    out = {
        "pixcorr": float(pixcorr(generated, ground_truth)),
        "ssim": float(ssim(generated, ground_truth)),
    }
    for name, fn in (feature_extractors or {}).items():
        gf, tf = fn(generated), fn(ground_truth)
        out[f"2way_{name}"] = float(two_way_identification(gf, tf))
        out[f"dist_{name}"] = float(feature_distance(gf, tf))
    return out
