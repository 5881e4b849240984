"""Parity tests: sampling/correlation ops vs torch.nn.functional oracles.

torch (CPU) is used ONLY as a numerical oracle for the public torch ops whose
semantics the framework replicates (SURVEY.md §7 hard parts 1-2).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import torch
import torch.nn.functional as F

from rpnet_tpu.ops.correlation import correlation_exact, local_correlation
from rpnet_tpu.ops.sampling import (
    affine_grid, avg_pool2d, compute_grid, grid_sample_nchw,
    interpolate_bilinear_nchw, max_pool2d, replication_pad2d, upsample_nearest2x,
)


def t2n(t):
    return t.detach().cpu().numpy()


@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_matches_torch(rng, align_corners):
    x = rng.randn(2, 3, 9, 11).astype(np.float32)
    grid = (rng.rand(2, 5, 7, 2).astype(np.float32) * 2.6 - 1.3)  # incl. OOB
    ours = np.asarray(grid_sample_nchw(jnp.asarray(x), jnp.asarray(grid), align_corners))
    ref = t2n(F.grid_sample(torch.from_numpy(x), torch.from_numpy(grid),
                            mode="bilinear", padding_mode="zeros",
                            align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("align_corners", [False, True])
def test_affine_grid_matches_torch(rng, align_corners):
    theta = np.array([[[1.1, 0.1, -0.2], [0.05, 0.9, 0.3]],
                      [[0.7, -0.3, 0.0], [0.2, 1.2, -0.1]]], np.float32)
    size = (2, 1, 6, 8)
    ours = np.asarray(affine_grid(jnp.asarray(theta), size, align_corners))
    ref = t2n(F.affine_grid(torch.from_numpy(theta), size, align_corners=align_corners))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_affine_warp_matches_torch(rng):
    """affine_grid + grid_sample composed — the registration warp path."""
    x = rng.randn(1, 1, 16, 16).astype(np.float32)
    theta = np.array([[[0.95, 0.05, 0.1], [-0.02, 1.08, -0.07]]], np.float32)
    grid = affine_grid(jnp.asarray(theta), x.shape)
    ours = np.asarray(grid_sample_nchw(jnp.asarray(x), grid))
    ref_grid = F.affine_grid(torch.from_numpy(theta), x.shape)
    ref = t2n(F.grid_sample(torch.from_numpy(x), ref_grid))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_compute_grid_matches_reference_convention():
    """(1,2,H,W), channels (x,y), normalized by (S-1) (net/registration.py:171-187)."""
    g = np.asarray(compute_grid((4, 6)))
    assert g.shape == (1, 2, 4, 6)
    np.testing.assert_allclose(g[0, 0, 0], 2 * (np.arange(6) / 5 - 0.5), atol=1e-6)
    np.testing.assert_allclose(g[0, 1, :, 0], 2 * (np.arange(4) / 3 - 0.5), atol=1e-6)


@pytest.mark.parametrize("shape,size", [((2, 4, 8, 8), (32, 32)),
                                        ((1, 3, 7, 5), (13, 11)),
                                        ((1, 2, 16, 16), (4, 4))])
def test_interpolate_bilinear_matches_torch(rng, shape, size):
    x = rng.randn(*shape).astype(np.float32)
    ours = np.asarray(interpolate_bilinear_nchw(jnp.asarray(x), size))
    ref = t2n(F.interpolate(torch.from_numpy(x), size=size, mode="bilinear",
                            align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_avg_max_pool_match_torch(rng):
    x = rng.randn(2, 3, 16, 16).astype(np.float32)
    xt = torch.from_numpy(x)
    xj = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    ours = np.asarray(jnp.transpose(avg_pool2d(xj, 4), (0, 3, 1, 2)))
    np.testing.assert_allclose(ours, t2n(F.avg_pool2d(xt, 4)), atol=1e-6)
    # maxpool k3 s2 p1 (VGG) and k2 s2 (U-Net)
    ours = np.asarray(jnp.transpose(max_pool2d(xj, 3, 2, 1), (0, 3, 1, 2)))
    np.testing.assert_allclose(ours, t2n(F.max_pool2d(xt, 3, 2, 1)), atol=1e-6)
    ours = np.asarray(jnp.transpose(max_pool2d(xj, 2, 2), (0, 3, 1, 2)))
    np.testing.assert_allclose(ours, t2n(F.max_pool2d(xt, 2, 2)), atol=1e-6)


def test_upsample_and_pad(rng):
    x = rng.randn(1, 2, 5, 5).astype(np.float32)
    xj = jnp.transpose(jnp.asarray(x), (0, 2, 3, 1))
    ours = np.asarray(jnp.transpose(upsample_nearest2x(xj), (0, 3, 1, 2)))
    ref = t2n(F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest"))
    np.testing.assert_allclose(ours, ref, atol=1e-6)
    ours = np.asarray(jnp.transpose(replication_pad2d(xj, 3), (0, 3, 1, 2)))
    ref = t2n(F.pad(torch.from_numpy(x), (3, 3, 3, 3), mode="replicate"))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


# --------------------------------------------------------------------------
# correlation
# --------------------------------------------------------------------------

def _torch_reference_correlation(fmap1, fmap2, r):
    """Oracle: the reference Correlation (net/rp_net.py:130-181) re-expressed
    with torch public ops (full matrix + window bilinear sampling)."""
    batch, dim, ht, wd = fmap1.shape
    f1 = fmap1.view(batch, dim, ht * wd)
    f2 = fmap2.view(batch, dim, ht * wd)
    corr = torch.matmul(f1.transpose(1, 2), f2)
    corr = corr.view(-1, 1, ht, wd) / torch.sqrt(torch.tensor(float(dim)))

    coords = torch.stack(torch.meshgrid(torch.arange(ht), torch.arange(wd),
                                        indexing="ij")[::-1], dim=0).float()
    coords = coords[None].repeat(batch, 1, 1, 1).permute(0, 2, 3, 1)
    dx = torch.linspace(-r, r, 2 * r + 1)
    dy = torch.linspace(-r, r, 2 * r + 1)
    delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
    centroid = coords.reshape(batch * ht * wd, 1, 1, 2)
    coords_lvl = centroid + delta.view(1, 2 * r + 1, 2 * r + 1, 2)
    xg, yg = coords_lvl.split([1, 1], dim=-1)
    xg = 2 * xg / (wd - 1) - 1
    yg = 2 * yg / (ht - 1) - 1
    sampled = F.grid_sample(corr, torch.cat([xg, yg], dim=-1), align_corners=True)
    return sampled.view(batch, ht, wd, -1).permute(0, 3, 1, 2).contiguous()


@pytest.mark.parametrize("r", [1, 3])
def test_local_correlation_equals_reference_formulation(rng, r):
    B, C, H, W = 2, 8, 10, 12
    f1 = rng.randn(B, C, H, W).astype(np.float32)
    f2 = rng.randn(B, C, H, W).astype(np.float32)
    ref = t2n(_torch_reference_correlation(torch.from_numpy(f1), torch.from_numpy(f2), r))

    f1j = jnp.transpose(jnp.asarray(f1), (0, 2, 3, 1))
    f2j = jnp.transpose(jnp.asarray(f2), (0, 2, 3, 1))
    ours_local = np.asarray(jnp.transpose(local_correlation(f1j, f2j, r), (0, 3, 1, 2)))
    ours_exact = np.asarray(jnp.transpose(correlation_exact(f1j, f2j, r), (0, 3, 1, 2)))

    np.testing.assert_allclose(ours_exact, ref, atol=2e-4)
    np.testing.assert_allclose(ours_local, ref, atol=2e-4)
    np.testing.assert_allclose(ours_local, ours_exact, atol=2e-4)


def test_separable_grid_sample_matches_gather_path(rng):
    """Matmul path ≡ gather grid_sample on an outer-product grid."""
    from rpnet_tpu.ops.sampling import (grid_sample, identity_grid_coords_1d,
                                        separable_grid_sample)
    x = jnp.asarray(rng.randn(2, 9, 11, 3).astype(np.float32))
    xs = identity_grid_coords_1d(11)
    ys = identity_grid_coords_1d(9)
    gx, gy = np.meshgrid(xs, ys)
    grid = jnp.asarray(np.stack([gx, gy], -1)[None].repeat(2, 0).astype(np.float32))
    ref = np.asarray(grid_sample(x, grid, align_corners=False))
    ours = np.asarray(separable_grid_sample(x, xs, ys, align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # and with arbitrary separable coords incl. out-of-bounds
    xs2 = np.linspace(-1.3, 1.2, 7)
    ys2 = np.linspace(-0.9, 1.4, 5)
    gx2, gy2 = np.meshgrid(xs2, ys2)
    grid2 = jnp.asarray(np.stack([gx2, gy2], -1)[None].repeat(2, 0).astype(np.float32))
    ref2 = np.asarray(grid_sample(x, grid2, align_corners=False))
    ours2 = np.asarray(separable_grid_sample(x, xs2, ys2, align_corners=False))
    np.testing.assert_allclose(ours2, ref2, atol=1e-5)


@pytest.mark.parametrize("r,h_tile", [(2, 8), (5, 16)])
def test_pallas_correlation_matches_xla(rng, r, h_tile):
    """Pallas kernel (interpret mode on CPU) ≡ the XLA local correlation."""
    from rpnet_tpu.ops.pallas.correlation import local_correlation_pallas

    B, H, W, C = 2, 16, 16, 64
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ref = np.asarray(local_correlation(f1, f2, r))
    out = np.asarray(local_correlation_pallas(f1, f2, r, h_tile=h_tile,
                                              interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("r,h_tile", [(2, 8), (5, 16)])
def test_pallas_rot_correlation_matches_xla(rng, r, h_tile):
    """MXU+rotate kernel (interpret mode) ≡ XLA after the dy-major→quirk
    permutation; lanes (2r+1)²..127 are zero (the 1×1-conv zero-pad
    contract, models/cre.py)."""
    from rpnet_tpu.ops.pallas.correlation import (local_correlation_pallas_rot,
                                                  rot_to_quirk)

    B, H, W, C = 2, 16, 16, 64
    d = 2 * r + 1
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ref = np.asarray(local_correlation(f1, f2, r))
    out128 = local_correlation_pallas_rot(f1, f2, r, h_tile=h_tile,
                                          interpret=True, out_f32=True)
    assert out128.shape == (B, H, W, 128)
    np.testing.assert_array_equal(np.asarray(out128[..., d * d:]), 0.0)
    out = np.asarray(rot_to_quirk(out128, r))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_rot_packed_pairs_matches_xla(rng, monkeypatch):
    """Opt-in 2-slices-per-128-lanes packed kernel (RPNET_ROT_PACK=1) ≡ XLA:
    the packed extraction adds a per-(row, lane) validity mask because
    out-of-image displacements alias the partner slice's columns instead of
    zero pad lanes (ops/pallas/correlation._corr_rot2_kernel)."""
    from rpnet_tpu.ops.pallas.correlation import (local_correlation_pallas_rot,
                                                  rot_to_quirk)

    monkeypatch.setenv("RPNET_ROT_PACK", "1")
    local_correlation_pallas_rot._clear_cache()
    r = 5
    B, H, W, C = 4, 16, 64, 32   # 2W == 128 → packed dispatch
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    ref = np.asarray(local_correlation(f1, f2, r))
    out128 = local_correlation_pallas_rot(f1, f2, r, h_tile=16,
                                          interpret=True, out_f32=True)
    local_correlation_pallas_rot._clear_cache()
    assert out128.shape == (B, H, W, 128)
    d = 2 * r + 1
    np.testing.assert_array_equal(np.asarray(out128[..., d * d:]), 0.0)
    np.testing.assert_allclose(np.asarray(rot_to_quirk(out128, r)), ref,
                               atol=1e-5)


def test_pallas_rot_pdot_extraction_matches_select(rng, monkeypatch):
    """Opt-in pdot extraction (RPNET_ROT_EXTRACT=pdot): ONE constant
    128×128 band-placement MXU matmul per dv (scale folded in) replaces the
    scale/roll2/select passes (_corr_rot_kernel pdot branch). Bit-identical
    to the select extraction for bf16 output with a power-of-two scale
    (C=64 → 2⁻³; verified bitwise on the v5e too, docs/perf_trace_r4.md),
    and within bf16 tolerance of the f32 XLA oracle."""
    from rpnet_tpu.ops.pallas.correlation import (local_correlation_pallas_rot,
                                                  rot_to_quirk)

    r = 2
    B, H, W, C = 2, 16, 16, 64
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    ref = np.asarray(local_correlation(f1, f2, r).astype(jnp.float32))

    monkeypatch.setenv("RPNET_ROT_EXTRACT", "pdot")
    local_correlation_pallas_rot._clear_cache()
    out_p = local_correlation_pallas_rot(f1, f2, r, h_tile=8, interpret=True)
    monkeypatch.setenv("RPNET_ROT_EXTRACT", "select")
    local_correlation_pallas_rot._clear_cache()
    out_s = local_correlation_pallas_rot(f1, f2, r, h_tile=8, interpret=True)
    local_correlation_pallas_rot._clear_cache()

    d = 2 * r + 1
    assert out_p.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(out_p[..., d * d:]), 0.0)
    np.testing.assert_array_equal(
        np.asarray(out_p.astype(jnp.float32)),
        np.asarray(out_s.astype(jnp.float32)))
    np.testing.assert_allclose(
        np.asarray(rot_to_quirk(out_p, r).astype(jnp.float32)), ref,
        atol=0.05, rtol=0.05)


def test_pallas_rot_env_modes_resolve_per_call(rng, monkeypatch):
    """Round-4 advisor findings: (a) the mode env vars are resolved by a
    non-jit dispatcher per call, so toggling them between calls takes effect
    WITHOUT clearing any jit cache; (b) an explicit RPNET_ROT_EXTRACT=pdot
    that cannot take effect (f32 output) emits a one-time warning instead of
    being silently ignored."""
    import warnings

    from rpnet_tpu.ops.pallas import correlation as pc

    r = 2
    B, H, W, C = 2, 8, 8, 16
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)).astype(jnp.bfloat16)

    # (a) select first, then pdot, with NO cache clears in between — the
    # bf16 power-of-two-scale contract makes them bit-identical, so assert
    # the dispatcher actually switched by checking the impl's static arg
    # resolution instead: wrap the jitted impl and record the pdot flag.
    seen = []
    orig = pc._local_correlation_pallas_rot_impl

    def spy(*args, **kw):
        seen.append(kw.get("pdot"))
        return orig(*args, **kw)

    monkeypatch.setattr(pc, "_local_correlation_pallas_rot_impl", spy)
    monkeypatch.setenv("RPNET_ROT_EXTRACT", "select")
    pc.local_correlation_pallas_rot(f1, f2, r, h_tile=8, interpret=True)
    monkeypatch.setenv("RPNET_ROT_EXTRACT", "pdot")
    pc.local_correlation_pallas_rot(f1, f2, r, h_tile=8, interpret=True)
    assert seen == [False, True]

    # (b) pdot requested but out_f32 forces f32 output → warning, not silence
    pc._warn_pdot_ignored.cache_clear()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        pc.local_correlation_pallas_rot(f1, f2, r, h_tile=8, interpret=True,
                                        out_f32=True)
    assert any("pdot" in str(x.message) for x in w)
    assert seen[-1] is False


def test_pallas_rot_vmap_folds_episode_axis(rng):
    """vmap of the rot kernel folds the episode axis into the batch grid
    (custom_vmap rule) and matches per-episode application."""
    import jax

    from rpnet_tpu.ops.pallas.correlation import pallas_rot_vmappable

    r = 2
    f = pallas_rot_vmappable(r, interpret=True)
    f1 = jnp.asarray(rng.randn(3, 2, 8, 8, 32).astype(np.float32))
    f2 = jnp.asarray(rng.randn(3, 2, 8, 8, 32).astype(np.float32))
    batched = np.asarray(jax.vmap(f)(f1, f2))
    for e in range(3):
        np.testing.assert_allclose(np.asarray(f(f1[e], f2[e])), batched[e],
                                   atol=1e-6)


def test_mxu_correlation_matches_local(rng):
    from rpnet_tpu.ops.correlation import local_correlation_mxu

    B, H, W, C = 2, 12, 10, 32
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    for r in (1, 3):
        ref = np.asarray(local_correlation(f1, f2, r))
        out = np.asarray(local_correlation_mxu(f1, f2, r, precision="highest"))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_grid_sample_matmul_matches_gather(rng):
    from rpnet_tpu.ops.sampling import grid_sample, grid_sample_matmul

    x = jnp.asarray(rng.randn(2, 9, 11, 3).astype(np.float32))
    grid = jnp.asarray((rng.rand(2, 5, 7, 2) * 2.6 - 1.3).astype(np.float32))
    for ac in (False, True):
        ref = np.asarray(grid_sample(x, grid, align_corners=ac))
        out = np.asarray(grid_sample_matmul(x, grid, align_corners=ac,
                                            precision="highest"))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_grid_sample_matmul_chunked_matches(rng):
    from rpnet_tpu.ops.sampling import grid_sample, grid_sample_matmul_chunked

    x = jnp.asarray(rng.randn(2, 16, 12, 3).astype(np.float32))
    grid = jnp.asarray((rng.rand(2, 16, 12, 2) * 2.2 - 1.1).astype(np.float32))
    ref = np.asarray(grid_sample(x, grid))
    out = np.asarray(grid_sample_matmul_chunked(x, grid, row_chunk=4,
                                                precision="highest"))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_grid_sample_matmul_chunked_banded_matches(rng):
    """The banded h-contraction (auto-on at H≥128) ≡ gather oracle for a
    small-rotation affine grid (the production registration case), AND the
    per-chunk lax.cond falls back to the dense path for a 90°-rotation grid
    whose source-row span exceeds the band."""
    from rpnet_tpu.ops.sampling import (affine_grid, grid_sample,
                                        grid_sample_matmul_chunked)

    H = W = 160
    x = jnp.asarray(rng.randn(2, H, W, 2).astype(np.float32))
    # small rotation + shift: every 16-row chunk's source rows fit a 64-band
    th = np.array([[[0.98, 0.05, 0.03], [-0.05, 0.98, -0.06]],
                   [[1.02, -0.04, -0.05], [0.04, 1.02, 0.02]]], np.float32)
    grid = affine_grid(jnp.asarray(th), (2, 2, H, W), align_corners=False)
    # banded ≡ forced-dense to accumulation noise (identical weight formula;
    # zero-weight rows add exact zeros); the gather oracle computes sample
    # positions with a different f32 rounding (~eps·H), hence the looser atol
    ref = np.asarray(grid_sample(x, grid))
    dense = np.asarray(grid_sample_matmul_chunked(x, grid, band=0,
                                                  precision="highest"))
    out = np.asarray(grid_sample_matmul_chunked(x, grid, precision="highest"))
    np.testing.assert_allclose(out, dense, atol=1e-6)
    np.testing.assert_allclose(out, ref, atol=1e-4)

    # 90° rotation: iy varies with the output COLUMN, so one 160-wide chunk
    # spans ~160 source rows > band=64 → cond must take the dense path
    th90 = np.array([[[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]]] * 2, np.float32)
    grid90 = affine_grid(jnp.asarray(th90), (2, 2, H, W), align_corners=False)
    dense90 = np.asarray(grid_sample_matmul_chunked(x, grid90, band=0,
                                                    precision="highest"))
    out90 = np.asarray(grid_sample_matmul_chunked(x, grid90,
                                                  precision="highest"))
    np.testing.assert_allclose(out90, dense90, atol=1e-6)

    # forced band wider than H → dense fast-path branch (band >= H)
    out_f = np.asarray(grid_sample_matmul_chunked(x, grid, band=H,
                                                  precision="highest"))
    np.testing.assert_allclose(out_f, dense, atol=1e-6)


def test_register_episode_batched_warp_matches_per_slice(rng):
    """register_episode's batched-warp composition ≡ vmap(register_slice)
    (the matmul path restructure that hoists full-res warps out of the
    per-slice vmap)."""
    import jax

    from rpnet_tpu.registration.fit import register_episode, register_slice

    H = W = 128
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    lab = ((((yy - 60) / 30.0) ** 2 + ((xx - 70) / 24.0) ** 2) < 1)
    lab = lab.astype(np.float32)
    src = (lab * 0.8 - 0.5 + 0.05 * rng.randn(H, W)).astype(np.float32)
    lab2 = ((((yy - 70) / 31.0) ** 2 + ((xx - 58) / 25.0) ** 2) < 1)
    dst = (lab2 * 0.8 - 0.5 + 0.05 * rng.randn(H, W)).astype(np.float32)
    S = 2
    supp = jnp.asarray(np.stack([src] * S))
    qry = jnp.asarray(np.stack([dst] * S))
    labs = jnp.asarray(np.stack([lab] * S))

    kw = dict(affine_iters=6, demons_iters=0, fit_scale=4)
    batched = register_episode(supp, qry, labs, **kw)
    ref = jax.vmap(lambda a, b, c: register_slice(a, b, c, **kw))(
        supp, qry, labs)
    np.testing.assert_allclose(np.asarray(batched.theta),
                               np.asarray(ref.theta), atol=1e-6)
    for name in ("warped_label", "affine_label", "warped_src", "affine_src"):
        np.testing.assert_allclose(np.asarray(getattr(batched, name)),
                                   np.asarray(getattr(ref, name)),
                                   atol=2e-5, err_msg=name)
    # demons: the batched matmul path is the FAST mode — the 50-iteration
    # NCC fit and the diffeo integration run at 1/fit_scale resolution
    # (registration/fit.py, docs/perf_trace_r4.md "Fast demons"), so
    # trajectory equality with the full-res per-slice program is NOT the
    # contract (Adam NCC loops amplify sampler-level rounding). The
    # reference-exact mode is sampler="gather", which dispatches to
    # vmap(register_slice) verbatim — assert that stays exact:
    kw2 = dict(affine_iters=4, demons_iters=3, fit_scale=4)
    g2 = register_episode(supp, qry, labs, sampler="gather", **kw2)
    gr = jax.vmap(lambda a, b, c: register_slice(
        a, b, c, sampler="gather", **kw2))(supp, qry, labs)
    np.testing.assert_allclose(np.asarray(g2.flow), np.asarray(gr.flow),
                               atol=1e-5)
    # ...and the fast mode lands in the same quality band: demons must
    # improve image alignment over affine-only in BOTH modes, and the two
    # warped labels must agree almost everywhere (measured 99.1% on this
    # episode; band documented in BASELINE.md "Demons on TPU")
    b2 = register_episode(supp, qry, labs, **kw2)
    r2 = jax.vmap(lambda a, b, c: register_slice(a, b, c, **kw2))(
        supp, qry, labs)
    for res in (b2, r2):
        mse_aff = float(jnp.mean((res.affine_src - qry) ** 2))
        mse_dem = float(jnp.mean((res.warped_src - qry) ** 2))
        assert mse_dem < mse_aff
    agree = (np.asarray(b2.warped_label) == np.asarray(r2.warped_label)).mean()
    assert agree > 0.97


def test_pallas_vjp_backward_matches_xla_grad(rng):
    """Analytic backward of the Pallas wrapper ≡ autodiff of the XLA path."""
    import jax

    from rpnet_tpu.ops.pallas.correlation import _corr_bwd

    B, H, W, C, r = 2, 8, 10, 16, 2
    f1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    g = jnp.asarray(rng.randn(B, H, W, (2 * r + 1) ** 2).astype(np.float32))

    def loss(a, b):
        return jnp.sum(local_correlation(a, b, r) * g)

    ref1, ref2 = jax.grad(loss, argnums=(0, 1))(f1, f2)
    out1, out2 = _corr_bwd(r, (f1, f2), g)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1), atol=1e-4)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=1e-4)


def test_pallas_mxu_kernel_matches_xla(rng):
    from rpnet_tpu.ops.pallas.correlation import local_correlation_pallas_mxu

    f1 = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    ref = np.asarray(local_correlation(f1, f2, 3))
    out = np.asarray(local_correlation_pallas_mxu(f1, f2, 3, h_tile=8,
                                                  interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_csub_kernel_matches_xla(rng):
    """C-on-sublanes layout variant ≡ the XLA local correlation."""
    from rpnet_tpu.ops.pallas.correlation import local_correlation_pallas_csub

    f1 = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    f2 = jnp.asarray(rng.randn(2, 16, 16, 64).astype(np.float32))
    ref = np.asarray(local_correlation(f1, f2, 3))
    out = np.asarray(local_correlation_pallas_csub(f1, f2, 3, h_tile=8,
                                                   interpret=True))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_trainable_vmap_and_grad_match_xla(rng):
    """pallas_correlation_trainable composes with the trainer's transforms:
    jit(grad(vmap(·))) must equal the XLA formulation (values AND grads) —
    this is what routes the kernel into training (VERDICT r1 item 3)."""
    import jax
    import jax.numpy as jnp

    from rpnet_tpu.ops.correlation import local_correlation
    from rpnet_tpu.ops.pallas.correlation import pallas_correlation_trainable

    r = 2
    f = pallas_correlation_trainable(r, interpret=True)
    E, B, H, W, C = 3, 2, 16, 16, 8
    a = jnp.asarray(rng.randn(E, B, H, W, C).astype(np.float32))
    b = jnp.asarray(rng.randn(E, B, H, W, C).astype(np.float32))

    # vmapped forward ≡ XLA
    out_p = jax.vmap(f)(a, b)
    out_x = jax.vmap(lambda x, y: local_correlation(x, y, r))(a, b)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), atol=1e-5)

    # jit(grad(vmap)) ≡ XLA grads — the exact trainer composition
    def loss_p(a, b):
        return jnp.sum(jax.vmap(f)(a, b) ** 2)

    def loss_x(a, b):
        return jnp.sum(jax.vmap(
            lambda x, y: local_correlation(x, y, r))(a, b) ** 2)

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1)))(a, b)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1)))(a, b)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gx[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gx[1]), atol=1e-4)

    # unbatched grad also works (eval-time fine-tuning paths)
    g1 = jax.grad(lambda x, y: jnp.sum(f(x, y) ** 2), argnums=(0, 1))(a[0], b[0])
    g2 = jax.grad(lambda x, y: jnp.sum(local_correlation(x, y, r) ** 2),
                  argnums=(0, 1))(a[0], b[0])
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)

    # nested vmap keeps folding (volume3d batching over windows)
    out2 = jax.vmap(jax.vmap(f))(a[None], b[None])
    np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out_x), atol=1e-5)


def test_pallas_backward_kernel_matches_analytic(rng):
    """local_correlation_pallas_bwd ≡ the analytic XLA backward (_corr_bwd)
    for both input grads, across tiles/halos (interpret mode on CPU)."""
    import jax.numpy as jnp

    from rpnet_tpu.ops.pallas.correlation import (_corr_bwd,
                                                  local_correlation_pallas_bwd)

    B, H, W, C, r = 2, 16, 16, 128, 2
    d = 2 * r + 1
    fm1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fm2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    g = jnp.asarray(rng.randn(B, H, W, d * d).astype(np.float32))
    ref1, ref2 = _corr_bwd(r, (fm1, fm2), g)
    k1, k2 = local_correlation_pallas_bwd(g, fm1, fm2, r, h_tile=8,
                                          interpret=True)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(ref1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(k2), np.asarray(ref2), atol=2e-5)


def test_mxu_banded_backward_matches_autodiff(rng):
    """local_correlation_mxu_bwd ≡ grad of local_correlation for both inputs
    (the banded-matmul backward formulation, ops/correlation.py)."""
    import jax

    from rpnet_tpu.ops.correlation import local_correlation_mxu_bwd

    B, H, W, C, r = 2, 16, 12, 8, 2
    a = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    b = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    g = jnp.asarray(rng.randn(B, H, W, (2 * r + 1) ** 2).astype(np.float32))

    d1, d2 = jax.grad(lambda x, y: jnp.sum(local_correlation(x, y, r) * g),
                      argnums=(0, 1))(a, b)
    m1, m2 = local_correlation_mxu_bwd(g, a, b, r, precision="highest")
    np.testing.assert_allclose(np.asarray(m1), np.asarray(d1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(d2), atol=1e-5)


def test_grid_sample_matmul_chunked_non_divisible_rows(rng):
    """A grid height not divisible by row_chunk must still chunk (largest
    divisor), not silently fall back to full materialization."""
    from rpnet_tpu.ops.sampling import grid_sample, grid_sample_matmul_chunked

    x = jnp.asarray(rng.randn(1, 10, 8, 2).astype(np.float32))
    gy, gx = np.meshgrid(np.linspace(-1, 1, 25), np.linspace(-1, 1, 8),
                         indexing="ij")
    grid = jnp.asarray(np.stack([gx, gy], axis=-1)[None].astype(np.float32))
    out_c = grid_sample_matmul_chunked(x, grid, row_chunk=16)   # 25 % 16 != 0
    out_f = grid_sample(x, grid)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_f), atol=1e-5)


def test_local_correlation_preserves_bf16(rng):
    """bf16 in → bf16 out for BOTH XLA impls (the eval default runs the
    network in bf16; a float32-promoting correlation broke the refinement
    scan's carry dtype — np-scalar scale was strongly typed)."""
    from rpnet_tpu.ops.correlation import local_correlation_mxu

    B, H, W, C, r = 2, 8, 8, 16, 2
    f1 = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    f2 = jnp.asarray(rng.randn(B, H, W, C), jnp.bfloat16)
    out = local_correlation(f1, f2, r)
    out_mxu = local_correlation_mxu(f1, f2, r)
    assert out.dtype == jnp.bfloat16
    assert out_mxu.dtype == jnp.bfloat16
    ref = local_correlation(f1.astype(jnp.float32), f2.astype(jnp.float32), r)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=0.15)
