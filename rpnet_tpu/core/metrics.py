"""Segmentation metrics + registration similarity metrics.

Host versions keep the reference conventions bit-for-bit:
  * ``dice_score``          — utils/util.py:365-376
  * ``dice_score_seperate`` — utils/util.py:379-390 (metric of record; returns
    ``None`` for classes with empty ground truth — preserved)
Device versions run under jit and return ``(value, valid)`` pairs instead of
``None`` so the whole eval aggregation stays on device.

Registration similarity:
  * ``mse`` — net/registration.py:147-154
  * ``ncc`` — net/registration.py:157-160 (negative global normalized
    cross-correlation; lower is better)
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

import jax.numpy as jnp


# --------------------------------------------------------------------------
# host metrics (numpy, reference conventions)
# --------------------------------------------------------------------------

def dice_score(y_pred, y_true, num_class: int = 1, decimal: int = 4) -> List[Optional[float]]:
    res: List[Optional[float]] = []
    for i in range(num_class):
        target = y_true == i
        pred = y_pred == i
        if target.sum():
            score = 2 * (target * pred).sum() / float(target.sum() + pred.sum())
            res.append(round(score, decimal))
        else:
            res.append(None)
    return res


def dice_score_seperate(y_pred, y_true, num_class: int = 1, decimal: int = 4) -> List[Optional[float]]:
    """Per-channel Dice; channel i of pred vs channel i of truth."""
    res: List[Optional[float]] = []
    for i in range(num_class):
        target = y_true[i]
        pred = y_pred[i]
        if target.sum():
            score = 2 * (target * pred).sum() / float(target.sum() + pred.sum())
            res.append(round(score, decimal))
        else:
            res.append(None)
    return res


# --------------------------------------------------------------------------
# device metrics (jax, jit-safe)
# --------------------------------------------------------------------------

def dice_jax(pred, target, weight=None, eps: float = 0.0):
    """Dice over the full array → (dice, valid).

    ``weight`` optionally masks out padded slices (1 = real, 0 = pad) so the
    fused episode program can pad the slice axis without corrupting the score.
    ``valid`` is False when the ground truth is empty (the host metric would
    return None there — utils/util.py:388-389).
    """
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if weight is not None:
        w = jnp.reshape(weight, weight.shape + (1,) * (pred.ndim - weight.ndim)).astype(jnp.float32)
        pred = pred * w
        target = target * w
    inter = jnp.sum(pred * target)
    tsum = jnp.sum(target)
    psum = jnp.sum(pred)
    valid = tsum > 0
    dice = 2.0 * inter / jnp.maximum(tsum + psum + eps, 1e-12)
    return dice, valid


def mse(y_pred, y_true):
    """Mean squared error (net/registration.py:147-154, mask=None path)."""
    return jnp.mean((y_true - y_pred) ** 2)


def ncc(moving, fixed, weight=None):
    """Negative global normalized cross-correlation (net/registration.py:157-160).

    With ``weight`` (broadcastable 0/1 mask), means/variances are computed
    over valid elements only — padded slices don't bias the statistics, so
    the value matches the reference's unpadded per-episode NCC.
    """
    if weight is None:
        fc = fixed - jnp.mean(fixed)
        mc = moving - jnp.mean(moving)
        num = jnp.sum(fc * mc)
        den = jnp.sqrt(jnp.sum(fc ** 2) * jnp.sum(mc ** 2) + 1e-10)
        return -1.0 * num / den
    w = jnp.broadcast_to(weight, fixed.shape).astype(fixed.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    fmean = jnp.sum(fixed * w) / n
    mmean = jnp.sum(moving * w) / n
    fc = (fixed - fmean) * w
    mc = (moving - mmean) * w
    num = jnp.sum(fc * mc)
    den = jnp.sqrt(jnp.sum(fc ** 2) * jnp.sum(mc ** 2) + 1e-10)
    return -1.0 * num / den


def precision_and_recall(label_gt, label_pred, n_class: int):
    """Per-class precision/recall (utils/util.py:393-403) without sklearn."""
    gt = np.asarray(label_gt, dtype=np.int64).ravel()
    pr = np.asarray(label_pred, dtype=np.int64).ravel()
    precision = np.zeros(n_class, dtype=np.float32)
    recall = np.zeros(n_class, dtype=np.float32)
    for c in range(n_class):
        tp = np.sum((pr == c) & (gt == c))
        precision[c] = tp / max(np.sum(pr == c), 1)
        recall[c] = tp / max(np.sum(gt == c), 1)
    return precision, recall
