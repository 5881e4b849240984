"""Model-layer tests: op-level torch parity + structural/invariant checks.

Strategy (SURVEY.md §4): the conv/BN primitives are checked numerically
against torch with shared weights; composite modules are checked through
invariants (shapes, determinism, output ≡ last refinement iteration, masked
pooling exactness) since every constituent op already has a parity test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from flax import linen as nn

from rpnet_tpu.models.blocks import ConvBlock, Norm2d, TorchConv
from rpnet_tpu.models.cre import ContextCorrelationEncoder
from rpnet_tpu.models.losses import (dice_ce, dice_loss_softmax, ghm_c_loss,
                                     softmax_cross_entropy)
from rpnet_tpu.models.rpnet import RPNet, cosine_distance, masked_average_pool
from rpnet_tpu.models.unet import UNet
from rpnet_tpu.models.vgg import VGGEncoder
from rpnet_tpu.ops.sampling import interpolate_bilinear


def test_conv_matches_torch(rng):
    """flax nn.Conv (SAME, 3×3) ≡ torch F.conv2d(padding=1) with same weights."""
    x = rng.randn(2, 9, 11, 5).astype(np.float32)
    mod = TorchConv(7, (3, 3))
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(mod.apply(params, jnp.asarray(x)))

    k = np.asarray(params["params"]["conv"]["kernel"])  # HWIO
    b = np.asarray(params["params"]["conv"]["bias"])
    wt = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)))  # OIHW
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = F.conv2d(xt, wt, torch.from_numpy(b), padding=1).numpy()
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-5)


def test_batchnorm_eval_matches_torch(rng):
    x = rng.randn(4, 6, 6, 3).astype(np.float32)
    mod = Norm2d("BatchNorm2d")
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    # fake non-trivial running stats
    rm = rng.randn(3).astype(np.float32) * 0.1
    rv = (rng.rand(3).astype(np.float32) + 0.5)
    sc = rng.randn(3).astype(np.float32)
    bi = rng.randn(3).astype(np.float32)
    variables = {
        "params": {"bn": {"scale": jnp.asarray(sc), "bias": jnp.asarray(bi)}},
        "batch_stats": {"bn": {"mean": jnp.asarray(rm), "var": jnp.asarray(rv)}},
    }
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), False))
    ref = F.batch_norm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))),
                       torch.from_numpy(rm), torch.from_numpy(rv),
                       torch.from_numpy(sc), torch.from_numpy(bi),
                       training=False, eps=1e-5).numpy()
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-5)


def test_masked_average_pool_matches_reference_formula(rng):
    """vjp-transpose pooling ≡ upsample-then-masked-sum (rp_net.py:366-376)."""
    fts = rng.randn(6, 8, 16).astype(np.float32)
    mask = (rng.rand(24, 32) > 0.6).astype(np.float32)
    ours = np.asarray(masked_average_pool(jnp.asarray(fts), jnp.asarray(mask)))

    ft = torch.from_numpy(np.transpose(fts, (2, 0, 1)))[None]  # (1, C, h, w)
    mt = torch.from_numpy(mask)
    up = F.interpolate(ft, size=mask.shape, mode="bilinear")
    ref = (up * mt[None, None]).sum(dim=(2, 3)) / (mt.sum() + 1e-5)
    np.testing.assert_allclose(ours, ref.numpy()[0], atol=1e-4)


def test_cosine_distance_matches_torch(rng):
    fts = rng.randn(2, 5, 7, 16).astype(np.float32)
    proto = rng.randn(2, 16).astype(np.float32)
    ours = np.asarray(cosine_distance(jnp.asarray(fts), jnp.asarray(proto)))
    ft = torch.from_numpy(np.transpose(fts, (0, 3, 1, 2)))
    pt = torch.from_numpy(proto)
    ref = (F.cosine_similarity(ft, pt[..., None, None], dim=1) * 20).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_cross_entropy_matches_torch(rng):
    logits = rng.randn(2, 4, 4, 3).astype(np.float32)
    labels = rng.randint(0, 3, (2, 4, 4))
    ours = float(softmax_cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ref = F.cross_entropy(torch.from_numpy(np.transpose(logits, (0, 3, 1, 2))),
                          torch.from_numpy(labels)).item()
    assert abs(ours - ref) < 1e-5


def test_dice_ce_matches_torch_formula(rng):
    logits = rng.randn(2, 8, 8, 2).astype(np.float32)
    true = rng.randint(0, 2, (2, 8, 8))
    ours = float(dice_ce(jnp.asarray(logits), jnp.asarray(true)))
    # reference dice_loss_softmax (net/rp_net.py:111-120) multi-class branch
    lt = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tt = torch.from_numpy(true)
    t1h = torch.eye(2)[tt].permute(0, 3, 1, 2).float()
    probas = F.softmax(lt, dim=1)
    dims = (0, 2, 3)
    inter = torch.sum(probas * t1h, dims)
    card = torch.sum(probas + t1h, dims)
    ref = (1 - (2 * inter / (card + 1e-7)).mean()).item() + F.cross_entropy(lt, tt).item()
    assert abs(ours - ref) < 1e-5


def test_ghm_c_matches_torch_loop(rng):
    """Vectorized GHM ≡ the reference's per-bin loop (net/unet.py:68-111)."""
    pred = rng.randn(50).astype(np.float32)
    target = (rng.rand(50) > 0.5).astype(np.float32)
    lw = np.ones(50, np.float32)
    ours = float(ghm_c_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(lw)))

    p = torch.from_numpy(pred)
    t = torch.from_numpy(target)
    bins = 10
    edges = torch.arange(bins + 1).float() / bins
    edges[-1] += 1e-6
    weights = torch.zeros_like(p)
    g = torch.abs(p.sigmoid() - t)
    valid = torch.ones_like(p) > 0
    tot = max(valid.float().sum().item(), 1.0)
    n = 0
    for i in range(bins):
        inds = (g >= edges[i]) & (g < edges[i + 1]) & valid
        num_in = inds.sum().item()
        if num_in > 0:
            weights[inds] = tot / num_in
            n += 1
    if n > 0:
        weights = weights / n
    ref = (F.binary_cross_entropy_with_logits(p, t, weights, reduction="sum") / tot).item()
    assert abs(ours - ref) < 1e-4


# ------------------------------------------------------------------ structural

def _episode_inputs(rng, H=32, W=32, B=3, Wa=1, Sh=1):
    supp = rng.randn(Wa, Sh, B, H, W, 1).astype(np.float32)
    fore = (rng.rand(Wa, Sh, B, H, W) > 0.7).astype(np.float32)
    back = 1.0 - fore
    qry = rng.randn(B, H, W, 1).astype(np.float32)
    appr = (rng.rand(B, H, W) > 0.7).astype(np.float32)
    return tuple(map(jnp.asarray, (supp, fore, back, qry, appr)))


@pytest.mark.parametrize("backbone,scale", [("UNet", 4), ("vgg", 8)])
def test_rpnet_forward_smoke(rng, backbone, scale):
    model = RPNet(backbone=backbone, scale=scale, num_iter=2, radius=2)
    inputs = _episode_inputs(rng)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out = model.apply(variables, *inputs, train=False)
    B, H, W = 3, 32, 32
    assert out["output"].shape == (B, H, W, 2)
    assert out["refinement"].shape == (2, B, H, W, 2)
    assert np.all(np.isfinite(np.asarray(out["output"])))
    # final output ≡ last refinement iteration (documented equivalence)
    np.testing.assert_array_equal(np.asarray(out["output"]),
                                  np.asarray(out["refinement"][-1]))


@pytest.mark.parametrize("backbone,scale,Sh", [("UNet", 4, 1), ("vgg", 8, 2)])
def test_rpnet_eval_merged_encode_exact(rng, backbone, scale, Sh):
    """The eval-mode single batched encoder pass over support+query is
    value-IDENTICAL to separate passes (frozen BN statistics are per-sample,
    so batch composition cannot change any sample's features)."""
    model = RPNet(backbone=backbone, scale=scale, num_iter=1, radius=2)
    supp, fore, back, qry, appr = _episode_inputs(rng, Sh=Sh)
    variables = model.init(jax.random.PRNGKey(0), supp, fore, back, qry,
                           appr, train=False)
    bound = model.bind(variables)
    Wa = supp.shape[0]
    sep_supp = bound._encode(supp, fore, False)
    sep_qry = bound._encode(qry, fore[0, 0], False)
    imgs = jnp.concatenate(
        [supp.reshape((-1,) + supp.shape[2:]), qry[None]], axis=0)
    masks = jnp.concatenate(
        [fore.reshape((-1,) + fore.shape[2:]), fore[0, 0][None]], axis=0)
    fts = bound._encode(imgs, masks, False)
    np.testing.assert_array_equal(
        np.asarray(fts[:-1].reshape((Wa, Sh) + fts.shape[1:])),
        np.asarray(sep_supp))
    np.testing.assert_array_equal(np.asarray(fts[-1]), np.asarray(sep_qry))


def test_cre_rot_path_matches_default(rng, monkeypatch):
    """The eval fast path (MXU+rotate kernel, permutation folded into the
    q_conv_corr weights — models/cre.py) computes the same CRE output as the
    default path. RPNET_CORR_IMPL=rot forces it on CPU (interpret mode)."""
    cre = ContextCorrelationEncoder(radius=2)
    f1 = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    monkeypatch.delenv("RPNET_CORR_IMPL", raising=False)
    variables = cre.init(jax.random.PRNGKey(0), f1, f2, False)
    base = np.asarray(cre.apply(variables, f1, f2, False))
    monkeypatch.setenv("RPNET_CORR_IMPL", "rot")
    rot = np.asarray(cre.apply(variables, f1, f2, False))
    np.testing.assert_allclose(rot, base, atol=1e-5)
    # param tree path unchanged (checkpoint/converter compatibility)
    assert "kernel" in variables["params"]["q_conv_corr"]["conv"]


@pytest.mark.parametrize("train", [False, True])
def test_rpnet_refine_unroll_value_identical(rng, train):
    """`refinement_unroll` is a pure XLA scheduling knob (lax.scan unroll
    factor): the unrolled refinement scan computes the same values as the
    looped one. Train mode tolerates f32 reassociation noise (~6e-8): XLA
    fuses differently across unrolled iteration bodies (same effect as the
    measured loss delta 1.2586 vs 1.2589 on TPU, docs/perf_trace_r4.md)."""
    inputs = _episode_inputs(rng, B=2)
    base = RPNet(backbone="UNet", scale=4, num_iter=3, radius=2)
    unrolled = RPNet(backbone="UNet", scale=4, num_iter=3, radius=2,
                     refine_unroll=3)
    variables = base.init(jax.random.PRNGKey(0), *inputs, train=train)
    kw = dict(train=train, mutable=["batch_stats"] if train else False)
    a = base.apply(variables, *inputs, **kw)
    b = unrolled.apply(variables, *inputs, **kw)
    if train:
        (a, ma), (b, mb) = a, b
        for la, lb in zip(jax.tree_util.tree_leaves(ma),
                          jax.tree_util.tree_leaves(mb)):
            np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                       rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a["output"]),
                                   np.asarray(b["output"]),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a["refinement"]),
                                   np.asarray(b["refinement"]),
                                   rtol=1e-5, atol=1e-6)
    else:
        np.testing.assert_array_equal(np.asarray(a["output"]),
                                      np.asarray(b["output"]))
        np.testing.assert_array_equal(np.asarray(a["refinement"]),
                                      np.asarray(b["refinement"]))


def test_rpnet_train_mode_mutates_bn_and_aligns(rng):
    model = RPNet(backbone="UNet", scale=4, num_iter=2, radius=2, align=True)
    inputs = _episode_inputs(rng, B=2)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=True)
    out, mutated = model.apply(variables, *inputs, train=True,
                               mutable=["batch_stats"])
    assert float(out["align_loss"]) > 0.0
    # running stats actually moved
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_rpnet_multishot(rng):
    """5-shot prototype fusion works (the reference crashes here)."""
    model = RPNet(backbone="UNet", scale=4, num_iter=1, radius=1)
    inputs = _episode_inputs(rng, B=1, Sh=5)
    variables = model.init(jax.random.PRNGKey(0), *inputs, train=False)
    out = model.apply(variables, *inputs, train=False)
    assert out["output"].shape == (1, 32, 32, 2)


def test_unet_mask_injection(rng):
    x = jnp.asarray(rng.randn(2, 32, 32, 1).astype(np.float32))
    m = jnp.asarray((rng.rand(2, 32, 32, 1) > 0.5).astype(np.float32))
    for mfm in ("x", "x2", "x3", "x5"):
        mod = UNet(mask_feature_map=mfm)
        v = mod.init(jax.random.PRNGKey(0), x, m)
        out = mod.apply(v, x, m)
        assert out["d4"].shape == (2, 8, 8, 256)


def test_vgg_feature_stride(rng):
    x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
    mod = VGGEncoder()
    v = mod.init(jax.random.PRNGKey(0), x)
    assert mod.apply(v, x)["d4"].shape == (1, 8, 8, 512)


def test_make_seg_loss_unknown_name_falls_back(rng):
    """An unrecognized YAML loss name degrades to dice_ce with the native
    softmax contract instead of crashing in the binary adapter."""
    import jax.numpy as jnp

    from rpnet_tpu.models.losses import dice_ce, make_seg_loss

    logits = jnp.asarray(rng.randn(2, 8, 8, 2).astype(np.float32))
    labels = jnp.asarray((rng.rand(2, 8, 8) > 0.5).astype(np.int32))
    fn = make_seg_loss("Dice_CE_typo")
    np.testing.assert_allclose(float(fn(logits, labels)),
                               float(dice_ce(logits, labels)), rtol=1e-6)
