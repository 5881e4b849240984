"""Visualization / profiling utility tests."""

import os

import numpy as np
import pytest

from rpnet_tpu.utils.profiling import StageTimer
from rpnet_tpu.utils.visualize import (draw_bboxes, draw_contours,
                                       generate_image_pngs, show3d_comparison,
                                       volume_grid)


def test_draw_contours_and_bboxes(rng):
    img = rng.randn(32, 32).astype(np.float32)
    mask = np.zeros((32, 32), np.uint8)
    mask[8:20, 10:22] = 1
    rgb = draw_contours(img, {"organ": mask})
    assert rgb.shape == (32, 32, 3) and rgb.dtype == np.uint8
    assert (rgb[8, 10:22] != rgb[0, 0]).any()   # contour actually drawn
    rgb2 = draw_bboxes(img, [[8, 10, 20, 22]])
    assert rgb2.shape == (32, 32, 3)


def test_volume_grid():
    vol = np.arange(5 * 4 * 4).reshape(5, 4, 4).astype(np.float32)
    grid = volume_grid(vol, n_cols=3)
    assert grid.shape == (8, 12)
    np.testing.assert_array_equal(grid[:4, :4], vol[0])
    np.testing.assert_array_equal(grid[4:, :4], vol[3])


def test_comparison_figure_and_pngs(tmp_path, rng):
    img = rng.randn(6, 24, 24).astype(np.float32)
    gt = np.zeros((6, 24, 24), np.uint8)
    gt[2:5, 6:18, 6:18] = 1
    pred = np.roll(gt, 2, axis=2)
    p = show3d_comparison(img, gt, pred, str(tmp_path / "cmp.png"), title="t")
    assert os.path.exists(p) and os.path.getsize(p) > 1000
    paths = generate_image_pngs(img, {"gt": gt}, str(tmp_path / "pngs"))
    assert len(paths) == 6 and all(os.path.exists(q) for q in paths)


def test_stage_timer():
    import time

    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.totals["a"] >= 0.02
    rep = t.report()
    assert rep.startswith("stage_timing") and "a=" in rep
