"""Visualization utilities (rebuild of utils/visualize.py).

The reference module is notebook-oriented (IPython slider widgets) and broken
as shipped (`from config import config`, visualize.py:15 — no config.py
exists). This rebuild keeps the same capabilities as importable, headless-safe
functions (matplotlib Agg):

  * slice/volume browsing grids            (show3Dimg / show3Dimg2)
  * mask contour & bbox overlays           (draw_contours / draw_bboxes)
  * side-by-side prediction comparisons    (show3D_comparison)
  * per-slice PNG export                   (generate_image_pngs)
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def normalize_for_display(img: np.ndarray, lo_pct: float = 1, hi_pct: float = 99):
    lo, hi = np.percentile(img, [lo_pct, hi_pct])
    return np.clip((img - lo) / max(hi - lo, 1e-6), 0, 1)


def draw_contours(slice_img: np.ndarray, masks: Dict[str, np.ndarray],
                  colors: Optional[Dict[str, Tuple[int, int, int]]] = None,
                  thickness: int = 1) -> np.ndarray:
    """Overlay mask contours on a grayscale slice → RGB uint8."""
    import cv2

    rgb = (normalize_for_display(slice_img) * 255).astype(np.uint8)
    rgb = np.stack([rgb] * 3, axis=-1)
    palette = [(255, 80, 80), (80, 255, 80), (80, 120, 255), (255, 255, 80),
               (255, 80, 255), (80, 255, 255)]
    for i, (name, m) in enumerate(masks.items()):
        color = (colors or {}).get(name, palette[i % len(palette)])
        contours, _ = cv2.findContours(m.astype(np.uint8), cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        cv2.drawContours(rgb, contours, -1, color, thickness)
    return rgb


def draw_bboxes(slice_img: np.ndarray, bboxes_yx: Sequence[Sequence[float]],
                color=(255, 200, 0), thickness: int = 1) -> np.ndarray:
    """Overlay [y0, x0, y1, x1] boxes on a slice → RGB uint8."""
    import cv2

    rgb = (normalize_for_display(slice_img) * 255).astype(np.uint8)
    rgb = np.stack([rgb] * 3, axis=-1)
    for y0, x0, y1, x1 in bboxes_yx:
        cv2.rectangle(rgb, (int(x0), int(y0)), (int(x1), int(y1)),
                      color, thickness)
    return rgb


def volume_grid(volume: np.ndarray, n_cols: int = 8,
                max_slices: Optional[int] = None) -> np.ndarray:
    """Tile a (D, H, W) volume into one 2D mosaic for quick inspection."""
    D = volume.shape[0] if max_slices is None else min(volume.shape[0], max_slices)
    n_rows = -(-D // n_cols)
    H, W = volume.shape[1:]
    canvas = np.zeros((n_rows * H, n_cols * W), volume.dtype)
    for i in range(D):
        r, c = divmod(i, n_cols)
        canvas[r * H:(r + 1) * H, c * W:(c + 1) * W] = volume[i]
    return canvas


def show3d_comparison(image: np.ndarray, gt_mask: np.ndarray,
                      pred_mask: np.ndarray, out_path: str,
                      slice_ids: Optional[Sequence[int]] = None,
                      title: str = ""):
    """Side-by-side GT vs prediction contour figure (show3D_comparison,
    visualize.py:471) saved to ``out_path``."""
    plt = _plt()
    if slice_ids is None:
        annotated = np.where(gt_mask.reshape(gt_mask.shape[0], -1).any(axis=1))[0]
        pool = annotated if len(annotated) else np.arange(image.shape[0])
        slice_ids = pool[np.linspace(0, len(pool) - 1,
                                     min(4, len(pool))).astype(int)]
    n = len(slice_ids)
    fig, axes = plt.subplots(n, 2, figsize=(8, 4 * n), squeeze=False)
    for row, z in enumerate(slice_ids):
        axes[row][0].imshow(draw_contours(image[z], {"gt": gt_mask[z]},
                                          {"gt": (80, 255, 80)}))
        axes[row][0].set_title(f"z={z} ground truth")
        axes[row][1].imshow(draw_contours(image[z], {"pred": pred_mask[z]},
                                          {"pred": (255, 80, 80)}))
        axes[row][1].set_title(f"z={z} prediction")
        for ax in axes[row]:
            ax.axis("off")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def generate_image_pngs(image: np.ndarray, masks: Dict[str, np.ndarray],
                        out_dir: str, prefix: str = "slice") -> List[str]:
    """Export every slice as a contour-overlaid PNG (generate_image_pngs,
    visualize.py:558)."""
    import cv2

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for z in range(image.shape[0]):
        rgb = draw_contours(image[z], {k: m[z] for k, m in masks.items()})
        p = os.path.join(out_dir, f"{prefix}_{z:03d}.png")
        cv2.imwrite(p, rgb[..., ::-1])
        paths.append(p)
    return paths
