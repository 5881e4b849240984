"""Offline preprocessing tests: Otsu/morphology body masking, abd110 chain,
DICOM geometry (pydicom-free parts)."""

import os

import numpy as np
import pytest

from rpnet_tpu.core import nrrd_io
from rpnet_tpu.preprocess.abd110 import preprocess_patient, write_class_csvs
from rpnet_tpu.preprocess.dicom import contour_mm_to_pixels, rasterize_contours
from rpnet_tpu.preprocess.morphology import (body_mask_slice, otsu_threshold,
                                             otsu_threshold_jax)


def test_otsu_separates_bimodal(rng):
    a = rng.normal(-1000, 30, 3000)
    b = rng.normal(50, 30, 3000)
    img = np.concatenate([a, b]).reshape(60, 100)
    t = otsu_threshold(img)
    assert -950 < t < -100
    tj = float(otsu_threshold_jax(img.astype(np.float32)))
    assert abs(tj - t) < 60   # bin-center discretization differences


def test_body_mask_slice(rng):
    H = W = 96
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    body = (((yy - 48) / 36) ** 2 + ((xx - 48) / 40) ** 2) < 1
    img = np.full((H, W), -1000.0)
    img[body] = 30 + rng.randn(body.sum()) * 20
    # couch artifact far from center — must be removed by the center component
    img[90:94, 10:80] = 100
    mask = body_mask_slice(img, radius=5)
    assert mask[48, 48] == 1
    assert mask[92, 45] == 0            # couch removed
    inter = (mask.astype(bool) & body).sum()
    assert inter / body.sum() > 0.9     # body mostly covered


def test_preprocess_patient_chain(tmp_path, rng):
    data_dir = tmp_path / "standard"
    pid = "p000"
    (data_dir / pid / "structures").mkdir(parents=True)
    D, H, W = 4, 64, 64
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    body = (((yy - 32) / 24) ** 2 + ((xx - 32) / 28) ** 2) < 1
    vol = np.full((D, H, W), -1000.0, np.float32)
    for i in range(D):
        vol[i][body] = 40
    organ = np.zeros((D, H, W), np.uint8)
    organ[1:3, 24:40, 24:40] = 1
    # standard layout stores (x, y, z)
    nrrd_io.write(str(data_dir / pid / "img.nrrd"), np.swapaxes(vol, 0, -1))
    nrrd_io.write(str(data_dir / pid / "structures" / "Liver.nrrd"),
                  np.swapaxes(organ, 0, -1))

    save_dir = str(tmp_path / "preprocessed")
    res = preprocess_patient(pid, str(data_dir), save_dir, roi_names=["Liver"])
    assert res["n_rois"] == 1
    clean, _ = nrrd_io.read(os.path.join(save_dir, f"{pid}_clean.nrrd"))
    assert clean.shape[0] == D
    assert clean.shape[1] < H and clean.shape[2] < W   # cropped to body bbox
    liver, _ = nrrd_io.read(os.path.join(save_dir, f"{pid}_Liver.nrrd"))
    assert liver.shape == clean.shape
    assert liver.sum() > 0

    csv_dir = str(tmp_path / "classes")
    write_class_csvs(save_dir, csv_dir, roi_names=["Liver"])
    lines = open(os.path.join(csv_dir, "Liver.csv")).read().strip().splitlines()
    assert lines[0] == "pid,z_start,z_end,path"
    assert lines[1].startswith("p000,1,2,")


def test_contour_rasterization():
    # a 10mm square at origin (0,0), spacing 2mm → 5×5 px square
    pts = np.array([[0, 0, 0], [10, 0, 0], [10, 10, 0], [0, 10, 0]], float)
    px = contour_mm_to_pixels(pts, origin=(0, 0, 0), spacing=(2, 2))
    np.testing.assert_array_equal(px, [[0, 0], [5, 0], [5, 5], [0, 5]])
    mask = rasterize_contours([px], (8, 8))
    assert mask[2, 2] == 1 and mask[0, 7] == 0
    assert mask.sum() == 36  # inclusive 6×6 fill


def test_offline_registration_helpers(rng):
    from rpnet_tpu.preprocess.offline_registration import (
        affine_register_volumes, find_nearest_patient, histogram_distance,
        resample_to_reference)

    a = rng.normal(0, 100, (4, 24, 24)).astype(np.float32)
    b = a + rng.normal(0, 5, a.shape).astype(np.float32)   # similar
    c = rng.normal(800, 300, a.shape).astype(np.float32)   # different
    assert histogram_distance(a, b) < histogram_distance(a, c)
    pid, d = find_nearest_patient(a, {"close": b, "far": c})
    assert pid == "close"

    # shifted blob volume registers back toward the fixed volume
    yy, xx = np.meshgrid(np.arange(24), np.arange(24), indexing="ij")
    blob = lambda cy, cx: np.exp(-(((yy - cy) / 5.) ** 2 + ((xx - cx) / 5.) ** 2))
    fixed = np.stack([blob(12, 12)] * 4).astype(np.float32) * 100
    moving = np.stack([blob(9, 15)] * 4).astype(np.float32) * 100
    warped, theta = affine_register_volumes(moving, fixed, iters=40)
    err_before = np.abs(moving - fixed).mean()
    err_after = np.abs(warped - fixed).mean()
    assert err_after < 0.6 * err_before

    out = resample_to_reference(moving, (8, 12, 12))
    assert out.shape == (8, 12, 12)


def test_topk_neg_selection(rng):
    import jax.numpy as jnp

    from rpnet_tpu.models.losses import topk_neg

    pred = jnp.asarray(rng.randn(5000).astype(np.float32))
    target = jnp.asarray((rng.rand(5000) > 0.5).astype(np.float32))
    p, t, w = topk_neg(pred, target, k=1, base=100)
    assert p.shape[0] == 100 + 100 * 1
    assert float(w.sum()) == p.shape[0]  # enough of both labels → all valid

    # scarce negatives: only 10 exist, so 90 of the k*base=100 negative
    # slots must be marked invalid rather than leaking positives
    target_scarce = jnp.concatenate([jnp.zeros(10), jnp.ones(4990)])
    p2, t2, w2 = topk_neg(pred, target_scarce, k=1, base=100)
    assert float(w2[100:].sum()) == 10.0
    # every valid selected "negative" really has label 0
    assert float(jnp.sum(t2[100:] * w2[100:])) == 0.0


def test_make_seg_loss_every_registry_entry_trains(rng):
    """Every YAML `loss:` choice adapts to the RP_Net training contract
    ((B,H,W,2) logits + int labels → finite scalar with finite grads)."""
    import jax
    import jax.numpy as jnp

    from rpnet_tpu.models.losses import LOSS_REGISTRY, make_seg_loss

    logits = jnp.asarray(rng.randn(2, 16, 16, 2).astype(np.float32))
    labels = jnp.asarray((rng.rand(2, 16, 16) > 0.7).astype(np.int32))
    for name in LOSS_REGISTRY:
        f = make_seg_loss(name)
        v = f(logits, labels)
        assert np.isfinite(float(v)), name
        g = jax.grad(lambda l: f(l, labels))(logits)
        assert bool(jnp.isfinite(g).all()), name


def test_make_splits_then_eval_cli(tmp_path):
    """Bring-your-own-dataset path (BASELINE config 4): standard-layout
    volumes -> make_splits metadata -> the standard eval CLI runs on them."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli
    from rpnet_tpu.core.synthetic import generate_dataset
    from rpnet_tpu.preprocess.make_splits import discover, make_splits

    paths = generate_dataset(str(tmp_path / "d"), n_train=2, n_test=2,
                             shape=(16, 48, 48), seed=3)
    data_dir = paths["data_dir"]
    pids, rois = discover(data_dir)
    assert len(pids) == 4 and "Liver" in rois

    res = make_splits(data_dir, str(tmp_path / "meta"), test_frac=0.5, seed=1)
    assert res["n_train"] + res["n_test"] == 4 and res["n_test"] == 2
    assert os.path.isfile(os.path.join(res["class_dir"], "Liver.csv"))

    cfg = dict(data_dir=data_dir, class_csv_dir=res["class_dir"],
               eval_set_name=res["test_csv"], train_set_name=res["train_csv"],
               num_slice=16, num_x=48, num_y=48, crop_size=[32, 32],
               pad_value=-1024, HU_range=[-1024, 3072],
               n_shot=1, n_way=1, k=4, eval_classes=["Liver"],
               train_classes=["Spleen"], backbone="UNet",
               n_iter_refinement=1, n_test_iter_refinement=1,
               mask_refinement_correlation_radius=1, reg_affine_iters=4,
               slice_bucket=4, max_slices=8, n_runs=1,
               out_dir=str(tmp_path / "out"))
    ypath = str(tmp_path / "c.yml")
    pyyaml.safe_dump(cfg, open(ypath, "w"))
    results = cli.main(["--yaml", ypath])
    assert results is not None and "Liver" in results["classes"]


def test_make_splits_underscore_pids(tmp_path):
    """Pids containing underscores (brain layout 'sub_01') must produce
    non-empty class CSVs; ROI resolution uses longest-prefix matching and is
    deterministic when one pid prefixes another."""
    import numpy as np

    from rpnet_tpu.core import nrrd_io
    from rpnet_tpu.preprocess.make_splits import discover, make_splits

    d = tmp_path / "data"
    d.mkdir()
    vol = np.zeros((4, 8, 8), np.float32)
    m = np.zeros((4, 8, 8), np.uint8)
    m[1:3, 2:5, 2:5] = 1
    for pid in ("sub_01", "sub_01_followup", "sub_02"):
        nrrd_io.write(str(d / f"{pid}_clean.nrrd"), vol)
        nrrd_io.write(str(d / f"{pid}_liver.nrrd"), m)

    pids, rois = discover(str(d))
    assert pids == ["sub_01", "sub_01_followup", "sub_02"]
    assert rois == ["liver"]          # NOT 'followup_liver'

    out = tmp_path / "meta"
    res = make_splits(str(d), str(out), test_frac=0.34, seed=0)
    rows = open(out / "classes" / "liver.csv").read().strip().splitlines()
    assert rows[0] == "pid,z_start,z_end,path"
    got_pids = {r.split(",")[0] for r in rows[1:]}
    assert got_pids == {"sub_01", "sub_01_followup", "sub_02"}
    assert all(r.split(",")[1] == "1" and r.split(",")[2] == "2"
               for r in rows[1:])
