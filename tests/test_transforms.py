"""Unit tests for core transforms / NRRD IO / metrics (SURVEY.md §4 item 1)."""

import numpy as np
import pytest

from rpnet_tpu.core import nrrd_io
from rpnet_tpu.core.metrics import dice_score, dice_score_seperate
from rpnet_tpu.core.transforms import (
    crop, gamma_transform, keep_only_annotation_z_slices, normalize,
    normalize_jax, pad2factor, pad2same_size_3d, truncate_image,
)


def test_normalize_matches_reference_semantics(rng):
    img = rng.uniform(-2000, 5000, size=(4, 16, 16)).astype(np.float32)
    out = normalize(img, minimum=-1024, maximum=3072)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6
    # order of ops: percentile clip happens before the HU window clip
    hir = np.percentile(img, 99.5)
    ref = img.copy()
    ref[ref > hir] = hir
    ref[ref > 3072] = 3072
    ref[ref < -1024] = -1024
    ref = (ref + 1024) / 4096 * 2 - 1
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_normalize_jax_matches_numpy(rng):
    img = rng.uniform(-2000, 5000, size=(3, 8, 8)).astype(np.float32)
    out_np = normalize(img, -1024, 3072)
    out_jx = np.asarray(normalize_jax(img, -1024, 3072))
    np.testing.assert_allclose(out_np, out_jx, atol=2e-3)  # percentile interp diff


def test_pad2factor():
    img = np.ones((5, 17, 30), np.float32)
    out = pad2factor(img, factor=16, pad_value=-7)
    assert out.shape == (16, 32, 32)
    assert out[..., 31].min() == -7
    np.testing.assert_array_equal(out[:5, :17, :30], img)


def test_truncate_center_crop():
    img = np.arange(10 * 20 * 30).reshape(10, 20, 30).astype(np.float32)
    out = truncate_image(img, num_slice=4, num_x=8, num_y=6)
    assert out.shape == (4, 6, 8)
    np.testing.assert_array_equal(out, img[:4, 7:13, 11:19])


def test_keep_only_annotation_z():
    img = np.zeros((1, 10, 4, 4), np.float32)
    mask = np.zeros((1, 10, 4, 4), np.float32)
    mask[0, 3:7, 1, 1] = 1  # annotated z ∈ [3, 6]
    i2, m2 = keep_only_annotation_z_slices(img, mask)
    # reference keeps [d_min, d_max) — the top annotated slice is dropped
    assert i2.shape[1] == 3 and m2.shape[1] == 3


def test_crop_pads_small_input():
    img = np.ones((1, 2, 10, 12), np.float32) * 5
    mask = np.ones((1, 2, 10, 12), np.float32)
    ic, mc = crop(img, mask, [16, 16], img_pad_value=-1, mask_pad_value=0)
    assert ic.shape == (1, 2, 16, 16) and mc.shape == (1, 2, 16, 16)
    assert ic[0, 0, 0, 0] == -1 and mc[0, 0, 0, 0] == 0
    assert ic[0, 0, 8, 8] == 5


def test_crop_crops_large_input():
    img = np.random.RandomState(0).rand(1, 2, 40, 40).astype(np.float32)
    mask = (img > 0.5).astype(np.float32)
    ic, mc = crop(img, mask, [16, 16], img_pad_value=0)
    assert ic.shape == (1, 2, 16, 16)
    np.testing.assert_array_equal(ic, img[..., 12:28, 12:28])


def test_pad2same_size_3d():
    a = np.ones((3, 4, 5))
    b = np.ones((5, 2, 7))
    oa, ob = pad2same_size_3d([a, b])
    assert oa.shape == ob.shape == (5, 4, 7)


def test_gamma_transform_identity_range():
    rng = np.random.RandomState(0)
    img = rng.uniform(-1, 1, (4, 8, 8)).astype(np.float32)
    out = gamma_transform(img, [1.0, 1.0])
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_nrrd_roundtrip(tmp_path, rng):
    for dtype in (np.float32, np.int16, np.uint8):
        vol = (rng.rand(7, 9, 11) * 100).astype(dtype)
        p = str(tmp_path / f"x_{np.dtype(dtype).name}.nrrd")
        nrrd_io.write(p, vol, header={"space": "left-posterior-superior"})
        back, hdr = nrrd_io.read(p)
        assert back.shape == vol.shape
        np.testing.assert_array_equal(back, vol)
    # raw encoding too
    p = str(tmp_path / "raw.nrrd")
    vol = rng.rand(3, 4).astype(np.float64)
    nrrd_io.write(p, vol, encoding="raw")
    back, _ = nrrd_io.read(p)
    np.testing.assert_array_equal(back, vol)


def test_dice_score_conventions():
    pred = np.zeros((1, 4, 4))
    true = np.zeros((1, 4, 4))
    assert dice_score_seperate(pred, true, num_class=1) == [None]
    true[0, 1, 1] = 1
    pred[0, 1, 1] = 1
    assert dice_score_seperate(pred, true, num_class=1) == [1.0]
    pred2 = np.ones((2, 2))
    true2 = np.ones((2, 2))
    assert dice_score(pred2, true2, num_class=1) == [None]  # class 0 == background


def test_gamma_with_label_only_touches_label_region(rng):
    img = rng.uniform(-1, 1, (8, 8)).astype(np.float32)
    label = np.zeros((8, 8), np.float32)
    label[2:5, 2:5] = 1
    from rpnet_tpu.core.transforms import gamma_transform_with_label
    out = gamma_transform_with_label(img, label, [0.4, 0.6],
                                     rng=np.random.RandomState(0))
    np.testing.assert_array_equal(out[label == 0], img[label == 0])
    assert not np.allclose(out[label == 1], img[label == 1])


def test_random_label_transform_binary(rng):
    from rpnet_tpu.core.transforms import random_label_transform
    label = np.zeros((32, 32), np.float32)
    label[10:22, 8:20] = 1
    out = random_label_transform(label, rng=np.random.RandomState(0))
    assert out.shape == label.shape
    assert set(np.unique(out)) <= {0.0, 1.0}
    assert out.sum() > 0


def test_ncc_weighted_matches_unpadded(rng):
    """Mask-weighted NCC over a padded stack == plain NCC over the valid
    prefix — the parity contract with the reference's unpadded episodes
    (net/registration.py:157-160 applied at test_rpnet.py:229-230)."""
    import jax.numpy as jnp

    from rpnet_tpu.core.metrics import ncc

    D, H, W = 5, 16, 16
    a = (rng.randn(D, H, W) + 1.0).astype(np.float32)   # non-zero mean, like HU
    b = (0.5 * a + 0.5 * rng.randn(D, H, W) - 0.5).astype(np.float32)
    pad = 3
    a_pad = np.concatenate([a, np.zeros((pad, H, W), np.float32)])
    b_pad = np.concatenate([b, np.zeros((pad, H, W), np.float32)])
    w = np.concatenate([np.ones(D), np.zeros(pad)]).astype(np.float32)

    plain = float(ncc(jnp.asarray(a), jnp.asarray(b)))
    weighted = float(ncc(jnp.asarray(a_pad), jnp.asarray(b_pad),
                         weight=jnp.asarray(w)[:, None, None]))
    np.testing.assert_allclose(weighted, plain, atol=1e-5)
    # and the unweighted value over the padded stack is indeed biased
    biased = float(ncc(jnp.asarray(a_pad), jnp.asarray(b_pad)))
    assert abs(biased - plain) > 1e-3
