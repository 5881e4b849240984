"""Body-region masking: Otsu + morphology + connected components.

Replaces the SimpleITK chain of utils/preprocess_abd_110.py:23-48
(OtsuThreshold → BinaryMorphologicalClosing/Opening → ConnectedThreshold from
the image center → BinaryFillhole) with scipy/numpy host code, plus jit-safe
JAX twins of the per-slice ops so the mask can also be produced on device as
part of a fused ingest pipeline.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax.numpy as jnp
from jax import lax


# --------------------------------------------------------------------------
# Otsu threshold
# --------------------------------------------------------------------------

def otsu_threshold(img: np.ndarray, nbins: int = 256) -> float:
    """Classic Otsu: maximize between-class variance over the histogram."""
    img = np.asarray(img, dtype=np.float64)
    lo, hi = img.min(), img.max()
    if hi <= lo:
        return float(lo)
    hist, edges = np.histogram(img.ravel(), bins=nbins, range=(lo, hi))
    hist = hist.astype(np.float64)
    centers = (edges[:-1] + edges[1:]) / 2
    w0 = np.cumsum(hist)
    w1 = w0[-1] - w0
    m0 = np.cumsum(hist * centers)
    mu0 = np.where(w0 > 0, m0 / np.maximum(w0, 1), 0)
    mu1 = np.where(w1 > 0, (m0[-1] - m0) / np.maximum(w1, 1), 0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    return float(centers[int(np.argmax(between[:-1]))])


def otsu_threshold_jax(img, nbins: int = 256):
    """Device twin (static histogram bins)."""
    lo = jnp.min(img)
    hi = jnp.max(img)
    scaled = (img - lo) / jnp.maximum(hi - lo, 1e-12)
    idx = jnp.clip((scaled * nbins).astype(jnp.int32), 0, nbins - 1)
    hist = jnp.zeros((nbins,), jnp.float32).at[idx.ravel()].add(1.0)
    centers = lo + (jnp.arange(nbins) + 0.5) / nbins * (hi - lo)
    w0 = jnp.cumsum(hist)
    w1 = w0[-1] - w0
    m0 = jnp.cumsum(hist * centers)
    mu0 = jnp.where(w0 > 0, m0 / jnp.maximum(w0, 1), 0)
    mu1 = jnp.where(w1 > 0, (m0[-1] - m0) / jnp.maximum(w1, 1), 0)
    between = w0 * w1 * (mu0 - mu1) ** 2
    return centers[jnp.argmax(between[:-1])]


# --------------------------------------------------------------------------
# binary morphology (disk structuring element, like sitk radius semantics)
# --------------------------------------------------------------------------

def _disk(radius: int) -> np.ndarray:
    y, x = np.ogrid[-radius:radius + 1, -radius:radius + 1]
    return (x * x + y * y <= radius * radius).astype(np.uint8)


def binary_closing(mask: np.ndarray, radius: int = 7) -> np.ndarray:
    from scipy.ndimage import binary_closing as _c
    return _c(mask.astype(bool), structure=_disk(radius)).astype(np.uint8)


def binary_opening(mask: np.ndarray, radius: int = 7) -> np.ndarray:
    from scipy.ndimage import binary_opening as _o
    return _o(mask.astype(bool), structure=_disk(radius)).astype(np.uint8)


def dilate_jax(mask, radius: int):
    """Device binary dilation via max-pool (box element — conservative)."""
    k = 2 * radius + 1
    return lax.reduce_window(mask.astype(jnp.float32), 0.0, lax.max,
                             (k, k), (1, 1), "SAME")


def erode_jax(mask, radius: int):
    k = 2 * radius + 1
    return 1.0 - lax.reduce_window(1.0 - mask.astype(jnp.float32), 0.0, lax.max,
                                   (k, k), (1, 1), "SAME")


def closing_jax(mask, radius: int):
    return erode_jax(dilate_jax(mask, radius), radius)


def opening_jax(mask, radius: int):
    return dilate_jax(erode_jax(mask, radius), radius)


# --------------------------------------------------------------------------
# connected components / hole filling
# --------------------------------------------------------------------------

def connected_from_seed(mask: np.ndarray, seed: Tuple[int, int]) -> np.ndarray:
    """Connected component of `mask` containing `seed` (sitk ConnectedThreshold)."""
    from scipy.ndimage import label
    labels, _ = label(mask > 0)
    lab = labels[seed]
    if lab == 0:
        return np.zeros_like(mask, dtype=np.uint8)
    return (labels == lab).astype(np.uint8)


def fill_holes(mask: np.ndarray) -> np.ndarray:
    from scipy.ndimage import binary_fill_holes
    return binary_fill_holes(mask > 0).astype(np.uint8)


# --------------------------------------------------------------------------
# the full body-mask chain (per slice)
# --------------------------------------------------------------------------

def body_mask_slice(slice_hu: np.ndarray, radius: int = 7) -> np.ndarray:
    """Per-slice body mask (preprocess_abd_110.morphology_process semantics):
    invert Otsu (body is the bright class), close+open with a disk, keep the
    component under the image center, fill holes."""
    t = otsu_threshold(slice_hu)
    body = (slice_hu > t).astype(np.uint8)    # 1 - OtsuThreshold == above class
    body = binary_closing(body, radius)
    body = binary_opening(body, radius)
    H, W = body.shape
    comp = connected_from_seed(body, (H // 2, W // 2))
    return fill_holes(comp)


def body_mask_volume(volume_hu: np.ndarray, radius: int = 7) -> np.ndarray:
    """Slice-wise body mask of a (D, H, W) volume
    (preprocess_abd_110.preprocess_image)."""
    return np.stack([body_mask_slice(volume_hu[i], radius)
                     for i in range(volume_hu.shape[0])])
