"""Array transforms for the CT preprocessing / episode-assembly chain.

Numerically equivalent rebuilds of the reference's numpy transforms:
  * ``normalize``       — utils/util.py:455-467 (HU clip + 99.5-percentile clip → [-1,1])
  * ``pad2factor``      — utils/util.py:406-419
  * ``pad2same_size``   — utils/util.py:422-452
  * ``truncate_image``  — dataset/few_shot_reader.py:385-398
  * ``keep_only_annotation_z_slices`` — dataset/few_shot_reader.py:17-24
  * ``crop``            — dataset/few_shot_reader.py:63-75
  * ``resample``        — utils/util.py:37-60
  * ``gamma_transform`` — dataset/few_shot_reader.py:201-229

Host (numpy) versions feed the data pipeline; jax twins (suffix ``_jax``)
exist for the transforms that run on device inside the fused episode program.
"""

from __future__ import annotations

from typing import List, Sequence

import math

import numpy as np

try:  # device twins — optional so host tooling works without jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = None


# --------------------------------------------------------------------------
# intensity normalization
# --------------------------------------------------------------------------

def normalize(img: np.ndarray, minimum: float = -1024, maximum: float = 3076) -> np.ndarray:
    """HU windowing + robust upper clip, output in [-1, 1].

    Order of operations matches utils/util.py:455-467 exactly: clip above the
    99.5th percentile, clip to [minimum, maximum], then affine map to [-1, 1].
    """
    img = np.array(img, copy=True)
    hir = float(np.percentile(img, 100.0 - 0.5))
    if not np.issubdtype(img.dtype, np.floating):
        # rare non-float caller: keep the straightforward masked-write path
        img[img > hir] = hir
        img[img > maximum] = maximum
        img[img < minimum] = minimum
        img = (img - minimum) / max(1, (maximum - minimum))
        return img * 2 - 1
    # Vectorized in-place twin of the masked-write sequence above — value-
    # identical (python-float scalars bind at the array dtype either way;
    # the ``where`` form keeps the masked-write's exact comparison semantics,
    # NaN hir included), but ~3× faster on the eval hot path: masked
    # fancy-index writes are two full passes + a bool temp each.
    np.copyto(img, img.dtype.type(hir), where=img > hir)
    np.clip(img, minimum, maximum, out=img)
    np.subtract(img, minimum, out=img)
    np.divide(img, max(1, (maximum - minimum)), out=img)
    np.multiply(img, 2, out=img)
    np.subtract(img, 1, out=img)
    return img


def truncate_HU_uint8(img: np.ndarray) -> np.ndarray:
    """Window HU to [-1200, 600] and quantize to uint8 (utils/util.py:879-887)."""
    scaled = (np.asarray(img, np.float64) + 1200.0) / 1800.0
    return (np.clip(scaled, 0.0, 1.0) * 255).astype("uint8")


def normalize_jax(img, minimum: float = -1024, maximum: float = 3076):
    """Device twin of :func:`normalize` (jit-safe, static shapes)."""
    hir = jnp.percentile(img, 100.0 - 0.5)
    img = jnp.minimum(img, hir)
    img = jnp.clip(img, minimum, maximum)
    img = (img - minimum) / max(1, (maximum - minimum))
    return img * 2 - 1


# --------------------------------------------------------------------------
# padding / cropping
# --------------------------------------------------------------------------

def pad2factor(image: np.ndarray, factor: int = 16, pad_value: float = 0) -> np.ndarray:
    """Pad a (D, H, W) volume at the high end so each dim divides ``factor``."""
    depth, height, width = image.shape
    d = int(math.ceil(depth / float(factor))) * factor
    h = int(math.ceil(height / float(factor))) * factor
    w = int(math.ceil(width / float(factor))) * factor
    pad = [[0, d - depth], [0, h - height], [0, w - width]]
    return np.pad(image, pad, "constant", constant_values=pad_value)


def pad2same_size(imgs: Sequence[np.ndarray]) -> List[np.ndarray]:
    H = max(im.shape[0] for im in imgs)
    W = max(im.shape[1] for im in imgs)
    return [np.pad(im, [[0, H - im.shape[0]], [0, W - im.shape[1]]]) for im in imgs]


def pad2same_size_3d(imgs: Sequence[np.ndarray]) -> List[np.ndarray]:
    D = max(im.shape[0] for im in imgs)
    H = max(im.shape[1] for im in imgs)
    W = max(im.shape[2] for im in imgs)
    return [
        np.pad(im, [[0, D - im.shape[0]], [0, H - im.shape[1]], [0, W - im.shape[2]]])
        for im in imgs
    ]


def truncate_image(image: np.ndarray, num_slice: int, num_x: int, num_y: int) -> np.ndarray:
    """Center-crop (H, W) to at most (num_y, num_x) and keep first num_slice z."""
    D, H, W = image.shape
    x1 = max(0, W // 2 - num_x // 2)
    x2 = min(W, W // 2 + num_x // 2)
    y1 = max(0, H // 2 - num_y // 2)
    y2 = min(H, H // 2 + num_y // 2)
    return image[:num_slice, y1:y2, x1:x2]


def keep_only_annotation_z_slices(img: np.ndarray, mask: np.ndarray):
    """Crop z to the annotated organ range [d_min, d_max).

    Faithful to dataset/few_shot_reader.py:17-24 including its half-open upper
    bound (the slice at d_max is dropped).
    """
    cc, dd, hh, ww = np.where(mask)
    d_max, d_min = dd.max(), dd.min()
    return img[:, d_min:d_max, :, :], mask[:, d_min:d_max, :, :]


def crop(img: np.ndarray, mask: np.ndarray, crop_size: Sequence[int],
         img_pad_value: float, mask_pad_value: float = 0):
    """Center-crop (H, W) to ``crop_size`` then pad back symmetrically."""
    c, d, h, w = mask.shape
    ch, cw = crop_size
    rh, rw = min(ch, h), min(cw, w)
    cx, cy = w // 2, h // 2
    img_crop = img[..., cy - rh // 2:cy + rh - rh // 2, cx - rw // 2:cx + rw - rw // 2]
    mask_crop = mask[..., cy - rh // 2:cy + rh - rh // 2, cx - rw // 2:cx + rw - rw // 2]
    pad_width = [(0, 0), (0, 0),
                 ((ch - rh) // 2, (ch - rh) - (ch - rh) // 2),
                 ((cw - rw) // 2, (cw - rw) - (cw - rw) // 2)]
    img_pad = np.pad(img_crop, pad_width, mode="constant", constant_values=img_pad_value)
    mask_pad = np.pad(mask_crop, pad_width, mode="constant", constant_values=mask_pad_value)
    return img_pad, mask_pad


# --------------------------------------------------------------------------
# resampling
# --------------------------------------------------------------------------

def resample(image: np.ndarray, spacing, new_spacing=(1.0, 1.0, 1.0), order: int = 1):
    """Resample to ``new_spacing`` (utils/util.py:37-60). Returns (image, actual_spacing)."""
    import scipy.ndimage

    spacing = np.asarray(spacing, dtype=np.float64)
    new_spacing = np.asarray(new_spacing, dtype=np.float64)
    new_shape = np.round(np.asarray(image.shape) * spacing / new_spacing)
    resample_spacing = spacing * np.asarray(image.shape) / new_shape
    resize_factor = new_shape / np.asarray(image.shape)
    image_new = scipy.ndimage.zoom(image, resize_factor, mode="nearest", order=order)
    return image_new, resample_spacing


def onehot2multi_mask(onehot: np.ndarray) -> np.ndarray:
    num_class, D, H, W = onehot.shape
    multi_mask = np.zeros((D, H, W))
    for i in range(1, num_class):
        multi_mask[onehot[i] > 0] = i
    return multi_mask


# --------------------------------------------------------------------------
# intensity augmentation (host; train-time only)
# --------------------------------------------------------------------------

def gamma_transform(img: np.ndarray, gamma_range: Sequence[float], rng: np.random.RandomState | None = None):
    """Random gamma jitter on a [-1, 1] image (few_shot_reader.py:201-211)."""
    rand = rng.rand() if rng is not None else np.random.rand()
    img = (img + 1) / 2.0
    gamma = rand * (gamma_range[1] - gamma_range[0]) + gamma_range[0]
    cmin = img.min()
    irange = img.max() - cmin + 1e-5
    img = img - cmin + 1e-5
    img = irange * np.power(img * 1.0 / irange, gamma)
    img = img + cmin
    return img * 2 - 1


def gamma_transform_with_label(img: np.ndarray, label: np.ndarray,
                               gamma_range: Sequence[float],
                               rng: np.random.RandomState | None = None):
    """Gamma jitter applied ONLY inside the label region
    (gamma_tansform_with_label, few_shot_reader.py:214-229)."""
    old_img = img
    jittered = gamma_transform(img, gamma_range, rng)
    return old_img * (1 - label) + jittered * label


def random_label_transform(label: np.ndarray, degrees: float = 5.0,
                           translate: float = 0.02, scale_range=(0.5, 1.5),
                           shear: float = 5.0,
                           rng: np.random.RandomState | None = None) -> np.ndarray:
    """Random affine jitter of a binary label (random_label_transform,
    few_shot_reader.py:50-60 — used by the reference's commented-out
    prior-perturbation experiment; provided for completeness)."""
    import cv2

    r = rng or np.random
    H, W = label.shape
    ang = r.uniform(-degrees, degrees)
    sc = r.uniform(*scale_range)
    M = cv2.getRotationMatrix2D((W / 2, H / 2), ang, sc)
    sh = np.tan(np.deg2rad(r.uniform(-shear, shear)))
    M[0, 1] += sh
    M[0, 2] += r.uniform(-translate, translate) * W
    M[1, 2] += r.uniform(-translate, translate) * H
    return cv2.warpAffine(label.astype(np.float32), M, (W, H),
                          flags=cv2.INTER_NEAREST, borderValue=0.0)


# backwards-compat aliases using the reference's (misspelled) public names
gamma_tansform = gamma_transform
gamma_tansform_with_label = gamma_transform_with_label
