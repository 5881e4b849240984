"""Offline registration helpers (rebuild of utils/registration.py).

The reference uses SimpleITK for offline nearest-neighbor support selection
and rigid/affine pre-registration (utils/registration.py:55-233). This rebuild
is SimpleITK-free:

  * :func:`histogram_distance` / :func:`find_nearest_patient` — pick the most
    similar support volume by intensity-histogram distance
    (utils/registration.py:55);
  * :func:`affine_register_volumes` — volume-level affine pre-registration
    using this framework's own compiled fit (slice-wise on the mid-organ
    slices, median theta), replacing sitk's rigid/affine optimizer
    (utils/registration.py:177);
  * :func:`resample_to_reference` — shape-matching resample
    (utils/registration.py:214).
"""

from __future__ import annotations

import os
from typing import Dict, Sequence, Tuple

import numpy as np


def histogram_distance(vol_a: np.ndarray, vol_b: np.ndarray,
                       bins: int = 64, lo: float = -1024, hi: float = 3072) -> float:
    """L1 distance between normalized intensity histograms."""
    ha, _ = np.histogram(vol_a, bins=bins, range=(lo, hi))
    hb, _ = np.histogram(vol_b, bins=bins, range=(lo, hi))
    ha = ha / max(ha.sum(), 1)
    hb = hb / max(hb.sum(), 1)
    return float(np.abs(ha - hb).sum())


def find_nearest_patient(query_vol: np.ndarray,
                         candidates: Dict[str, np.ndarray],
                         bins: int = 64) -> Tuple[str, float]:
    """Nearest support patient by histogram distance
    (utils/registration.py:55 semantics)."""
    best, best_d = None, np.inf
    for pid, vol in candidates.items():
        d = histogram_distance(query_vol, vol, bins=bins)
        if d < best_d:
            best, best_d = pid, d
    return best, best_d


def affine_register_volumes(moving: np.ndarray, fixed: np.ndarray,
                            iters: int = 50, n_slices: int = 5):
    """Volume-level 2D-affine pre-registration.

    Fits per-slice affines on n_slices evenly spaced slices (compiled fit from
    registration/affine.py), takes the median theta, and warps every moving
    slice with it. Returns (warped_volume, theta).
    """
    import jax
    import jax.numpy as jnp

    from rpnet_tpu.registration.affine import affine_warp, fit_affine

    D = min(moving.shape[0], fixed.shape[0])
    ids = np.linspace(0, D - 1, min(n_slices, D)).astype(int)

    def norm01(v):
        lo, hi = np.percentile(v, [1, 99])
        return np.clip((v - lo) / max(hi - lo, 1e-6), 0, 1).astype(np.float32)

    mv = jnp.asarray(norm01(moving)[ids][..., None])
    fx = jnp.asarray(norm01(fixed)[ids][..., None])
    fit = jax.jit(jax.vmap(lambda m, f: fit_affine(m, f, iters=iters)[0]))
    thetas = np.asarray(fit(mv, fx))
    theta = np.median(thetas, axis=0)

    warp = jax.jit(jax.vmap(lambda x: affine_warp(x, jnp.asarray(theta))))
    warped = np.asarray(warp(jnp.asarray(moving.astype(np.float32))[..., None]))[..., 0]
    return warped, theta


def resample_to_reference(moving: np.ndarray, reference_shape: Sequence[int],
                          order: int = 1) -> np.ndarray:
    """Zoom a volume to a reference shape (utils/registration.py:214)."""
    import scipy.ndimage

    factors = [r / s for r, s in zip(reference_shape, moving.shape)]
    return scipy.ndimage.zoom(moving, factors, order=order, mode="nearest")
