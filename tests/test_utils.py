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


def test_hu_window_and_label_overlay(rng):
    from rpnet_tpu.utils.visualize import hu_window, label_overlay_rgba

    img = np.array([[-500.0, 0.0, 500.0]])
    w = hu_window(img, level=0, width=1000)
    np.testing.assert_allclose(w, [[0.0, 0.5, 1.0]])
    lab = np.array([[0, 1, 2]])
    rgba = label_overlay_rgba(lab, alpha=0.7)
    assert rgba.shape == (1, 3, 4)
    assert rgba[0, 0, 3] == 0.0            # background transparent
    assert rgba[0, 1, 3] == rgba[0, 2, 3] == np.float32(0.7)
    assert not np.allclose(rgba[0, 1, :3], rgba[0, 2, :3])  # distinct colors


def test_show3dimg_headless_and_paper_figures(tmp_path, rng):
    """Interactive browser degrades to a pure render closure headless; the
    paper-figure family writes files (plot_compare_figure / save_one_slice /
    generate_image_anim, visualize.py:85-163,:323,:347-556)."""
    from rpnet_tpu.utils.visualize import (generate_image_anim,
                                           plot_compare_figure,
                                           save_one_slice, show3dimg)

    D, H, W = 4, 32, 32
    img = rng.randn(D, H, W).astype(np.float32) * 100
    gt = np.zeros((D, H, W), np.int32)
    gt[:, 8:20, 8:20] = 1
    pred = np.zeros_like(gt)
    pred[:, 9:21, 9:21] = 1

    view = show3dimg(img, gt)              # headless → returns the closure
    assert callable(view)
    fig = view(z=1, level=0, width=500)
    assert fig is not None

    params = {"z": 1, "level": 0, "width": 500, "show_mask": True,
              "start": (0, 4, 4), "end": (D, 28, 28)}
    paths = plot_compare_figure(img, [gt], [pred], params,
                                str(tmp_path / "figs"), show_all_legend=True,
                                fmt=("png",), class_names=["organ"])
    assert all(os.path.getsize(p) > 0 for p in paths)

    p = save_one_slice(img, [gt], params, str(tmp_path / "one"),
                       show_all_legend=True, class_names=["organ"])
    assert os.path.getsize(p) > 0

    anim = generate_image_anim(img[:2], interval=100,
                               save_path=str(tmp_path / "anim.gif"))
    assert anim is not None
    assert os.path.getsize(str(tmp_path / "anim.gif")) > 0


def test_plot2dcontour_headless(tmp_path, rng):
    from rpnet_tpu.utils.visualize import plot2dcontour

    img = rng.rand(32, 32)
    contour = np.zeros((32, 32)); contour[10:20, 10] = 1
    out = str(tmp_path / "c.png")
    fig = plot2dcontour(img, contour, figsize=(4, 2), save_path=out)
    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_compilation_cache_knob(tmp_path):
    import jax

    from rpnet_tpu.config import Config
    from rpnet_tpu.utils.device import maybe_enable_compilation_cache

    prev = jax.config.jax_compilation_cache_dir
    try:
        d = str(tmp_path / "xla")
        assert maybe_enable_compilation_cache(
            Config({"compilation_cache_dir": d})) == d
        assert jax.config.jax_compilation_cache_dir == d
        # explicit empty string disables (returns None, leaves config as-is)
        assert maybe_enable_compilation_cache(
            Config({"compilation_cache_dir": ""})) is None
        # default resolves under ~/.cache
        p = maybe_enable_compilation_cache(Config({}))
        assert p and p.endswith(os.path.join(".cache", "rpnet_tpu", "xla"))
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
