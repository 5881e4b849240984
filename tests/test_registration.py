"""Registration parity: jit'd optimization loops vs torch oracle loops.

The oracles below re-express the reference's registration fits
(net/registration.py + dataset/few_shot_reader.py:109-198) with torch public
APIs. This checks the *loss landscape and optimizer trajectory* match, not
just single warps (SURVEY.md §7 hard part 1).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import torch
import torch.nn.functional as F

from rpnet_tpu.ops.sampling import compute_grid
from rpnet_tpu.registration.affine import affine_warp, fit_affine
from rpnet_tpu.registration.demons import demons_warp, diffeomorphic_2d, fit_demons
from rpnet_tpu.registration.fit import register_slice
from rpnet_tpu.registration.gaussian import gaussian_blur_flow, gaussian_kernel_2d


def _make_pair(rng, H=24, W=24):
    """A smooth blob and a shifted/scaled copy — a realistic easy fit."""
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    blob = lambda cy, cx, s: np.exp(-(((yy - cy) / s) ** 2 + ((xx - cx) / s) ** 2))
    src = (blob(H * 0.45, W * 0.45, 5) + 0.05 * rng.randn(H, W)).astype(np.float32)
    dst = (blob(H * 0.55, W * 0.6, 6) + 0.05 * rng.randn(H, W)).astype(np.float32)
    return src, dst


# ---------------------------------------------------------------- torch oracles

def _torch_affine_warp(x, theta):
    grid = F.affine_grid(theta, x.size())
    return F.grid_sample(x, grid)


def _torch_fit_affine(src, dst, iters, lr=0.01):
    theta = torch.zeros(1, 2, 3, requires_grad=True)
    with torch.no_grad():
        theta[0, 0, 0] = 1.0
        theta[0, 1, 1] = 1.0
    opt = torch.optim.Adam([theta], lr=lr)
    for _ in range(iters):
        opt.zero_grad()
        warped = _torch_affine_warp(src, theta)
        loss = torch.mean((dst - warped) ** 2)
        loss.backward()
        opt.step()
    return theta.detach()


def _torch_compute_grid(size):
    H, W = size
    gy, gx = torch.meshgrid(torch.arange(H), torch.arange(W), indexing="ij")
    grid = torch.stack([gx, gy]).float()[None]
    grid[:, 0] = 2 * (grid[:, 0] / (W - 1) - 0.5)
    grid[:, 1] = 2 * (grid[:, 1] / (H - 1) - 0.5)
    return grid


def _torch_diffeo(displacement, grid, scaling):
    grid = grid.permute(0, 2, 3, 1).contiguous()
    d = displacement / (2 ** scaling)
    for _ in range(scaling):
        d_trans = d.permute(0, 2, 3, 1)
        d = d + F.grid_sample(d, d_trans + grid)
    return d


def _torch_demons_warp(x, flow, grid, scaling=10):
    flow = _torch_diffeo(flow, grid, scaling)
    new_locs = (grid + flow).permute(0, 2, 3, 1)
    return F.grid_sample(x, new_locs)


def _torch_gauss_kernel(sigma):
    k = torch.from_numpy(gaussian_kernel_2d((sigma, sigma)).astype(np.float32))
    return k


def _torch_fit_demons(moving, fixed, iters, lr=0.01, sigma=2.0, scaling=10):
    H, W = moving.shape[-2:]
    flow = torch.zeros(1, 2, H, W, requires_grad=True)
    opt = torch.optim.Adam([flow], lr=lr)
    grid = _torch_compute_grid((H, W))
    k = _torch_gauss_kernel(sigma)
    pad = (k.shape[0] - 1) // 2
    kernel = k[None, None].expand(2, 1, -1, -1)
    for _ in range(iters):
        opt.zero_grad()
        warped = _torch_demons_warp(moving, flow, grid, scaling)
        fc = fixed - fixed.mean()
        mc = warped - warped.mean()
        loss = -1.0 * torch.sum(fc * mc) / torch.sqrt(
            torch.sum(fc ** 2) * torch.sum(mc ** 2) + 1e-10)
        loss.backward()
        opt.step()
        with torch.no_grad():
            flow.data = F.conv2d(flow.data, kernel, padding=pad, groups=2)
    return flow.detach()


# ---------------------------------------------------------------------- tests

def test_fit_affine_matches_torch_trajectory(rng):
    """Trajectory parity within sub-pixel tolerance.

    NOTE: exact bitwise trajectory parity is impossible — at identity theta
    every sample sits exactly on a bilinear kink (integer coordinates), where
    torch's and XLA's subgradients legitimately differ (even torch f64
    autograd disagrees with central finite differences there). After step 1
    the trajectory leaves the kink set; we assert the fits land within a small
    fraction of a pixel of each other, which is what Dice parity needs.
    """
    src, dst = _make_pair(rng)
    theta, losses = fit_affine(jnp.asarray(src)[..., None], jnp.asarray(dst)[..., None],
                               iters=25, lr=0.01, sampler="gather")
    theta_ref = _torch_fit_affine(torch.from_numpy(src)[None, None],
                                  torch.from_numpy(dst)[None, None], iters=25)
    np.testing.assert_allclose(np.asarray(theta), theta_ref.numpy()[0], atol=2e-2)
    # warped outputs: the operative parity criterion
    ours = np.asarray(affine_warp(jnp.asarray(src)[..., None], theta))[..., 0]
    ref = _torch_affine_warp(torch.from_numpy(src)[None, None],
                             theta_ref).numpy()[0, 0]
    assert np.abs(ours - ref).mean() < 5e-3
    assert np.abs(ours - ref).max() < 5e-2


def test_gaussian_blur_matches_torch(rng):
    flow = rng.randn(1, 2, 16, 16).astype(np.float32)
    k = _torch_gauss_kernel(2.0)
    pad = (k.shape[0] - 1) // 2
    ref = F.conv2d(torch.from_numpy(flow), k[None, None].expand(2, 1, -1, -1),
                   padding=pad, groups=2).numpy()
    ours = np.asarray(gaussian_blur_flow(
        jnp.transpose(jnp.asarray(flow), (0, 2, 3, 1)), (2.0, 2.0)))
    np.testing.assert_allclose(np.transpose(ours, (0, 3, 1, 2)), ref, atol=1e-5)


def test_diffeomorphic_matches_torch(rng):
    H = W = 12
    flow = (rng.randn(2, H, W) * 0.1).astype(np.float32)
    grid = compute_grid((H, W))
    ours = np.asarray(diffeomorphic_2d(jnp.asarray(flow), grid[0], scaling=4))
    ref = _torch_diffeo(torch.from_numpy(flow)[None],
                        _torch_compute_grid((H, W)), scaling=4).numpy()[0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_demons_warp_matches_torch(rng):
    H = W = 16
    x = rng.randn(H, W).astype(np.float32)
    flow = (rng.randn(2, H, W) * 0.05).astype(np.float32)
    grid = compute_grid((H, W))
    ours = np.asarray(demons_warp(jnp.asarray(x)[..., None], jnp.asarray(flow),
                                  grid[0], scaling=4))[..., 0]
    ref = _torch_demons_warp(torch.from_numpy(x)[None, None],
                             torch.from_numpy(flow)[None],
                             _torch_compute_grid((H, W)), scaling=4).numpy()[0, 0]
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_fit_demons_matches_torch_trajectory(rng):
    src, dst = _make_pair(rng, 16, 16)
    flow, _ = fit_demons(jnp.asarray(src)[..., None], jnp.asarray(dst)[..., None],
                         iters=5, lr=0.01, sigma=(2.0, 2.0), scaling=4)
    ref = _torch_fit_demons(torch.from_numpy(src)[None, None],
                            torch.from_numpy(dst)[None, None],
                            iters=5, scaling=4).numpy()[0]
    np.testing.assert_allclose(np.asarray(flow), ref, atol=1e-4)


def test_register_slice_end_to_end(rng):
    """Full per-slice pipeline (affine-only, do_deformable=False path)."""
    src, dst = _make_pair(rng, 20, 20)
    label = (src > 0.5).astype(np.float32)
    res = register_slice(jnp.asarray(src) * 2 - 1, jnp.asarray(dst) * 2 - 1,
                         jnp.asarray(label), affine_iters=20, demons_iters=0,
                         sampler="gather")   # reference-parity mode

    # torch oracle of get_registration_field semantics for one slice
    src01 = torch.from_numpy(src)[None, None]
    dst01 = torch.from_numpy(dst)[None, None]
    lab = torch.from_numpy(label)[None, None]
    theta = _torch_fit_affine(src01, dst01, iters=20)
    grid = _torch_compute_grid((20, 20))
    zero_flow = torch.zeros(1, 2, 20, 20)
    aff_lab = _torch_affine_warp(lab, theta)
    warped_lab = _torch_demons_warp(aff_lab, zero_flow, grid, scaling=10)
    ref_warped_label = (warped_lab.numpy()[0, 0] > 0.1).astype(np.float32)
    ref_affine_label = (aff_lab.numpy()[0, 0] > 0.1).astype(np.float32)
    aff_src = _torch_affine_warp(src01, theta).numpy()[0, 0] * 2 - 1

    np.testing.assert_allclose(np.asarray(res.affine_src), aff_src, atol=2e-2)
    # thresholded labels: allow a tiny disagreement ring at the 0.1 level set
    assert np.mean(np.asarray(res.warped_label) != ref_warped_label) < 0.02
    assert np.mean(np.asarray(res.affine_label) != ref_affine_label) < 0.02


def test_matmul_sampler_fit_quality(rng):
    """The MXU (matmul) sampler's trajectory differs at bilinear kinks but
    must converge to the same fit quality as the gather path."""
    from rpnet_tpu.core.metrics import mse

    src, dst = _make_pair(rng)
    s = jnp.asarray(src)[..., None]
    d = jnp.asarray(dst)[..., None]
    # 50 iterations = the reference's budget (few_shot_reader.py:159); the
    # matmul path starts slower (zero subgradient at the step-0 kink) but
    # converges to the same quality within it
    th_g, _ = fit_affine(s, d, iters=50, lr=0.01, sampler="gather")
    th_m, _ = fit_affine(s, d, iters=50, lr=0.01, sampler="matmul")
    mse_g = float(mse(affine_warp(s, th_g), d))
    mse_m = float(mse(affine_warp(s, th_m), d))
    mse_id = float(mse(s, d))
    assert mse_g < 0.5 * mse_id          # fit actually improved alignment
    assert mse_m < mse_g * 1.15 + 1e-4   # matmul path within 15%


def test_deeds_identity_and_shift(rng):
    """DEEDS: identical images → ≈identity grid; small shift → better MSE."""
    from rpnet_tpu.registration.deeds import deeds_fit, deeds_warp

    H = W = 32
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    blob = lambda cy, cx: np.exp(-(((yy - cy) / 6.0) ** 2 + ((xx - cx) / 6.0) ** 2))
    fixed = (blob(16, 16) + 0.02 * rng.randn(H, W)).astype(np.float32)[..., None]

    grid = deeds_fit(jnp.asarray(fixed), jnp.asarray(fixed),
                     grid_size=16, displacement_width=7)
    from rpnet_tpu.ops.sampling import affine_grid
    eye = jnp.asarray([[[1.0, 0, 0], [0, 1.0, 0]]])
    ident = np.asarray(affine_grid(eye, (1, 1, H, W)))[0]
    assert np.abs(np.asarray(grid) - ident).max() < 0.05   # near identity

    moving = (blob(18, 14) + 0.02 * rng.randn(H, W)).astype(np.float32)[..., None]
    grid2 = deeds_fit(jnp.asarray(moving), jnp.asarray(fixed),
                      grid_size=16, disp_range=0.3, displacement_width=11)
    warped = np.asarray(deeds_warp(jnp.asarray(moving), grid2))
    err_before = np.mean((moving - fixed) ** 2)
    err_after = np.mean((warped - fixed) ** 2)
    assert err_after < 0.8 * err_before


def test_affine_deeds_combined(rng):
    from rpnet_tpu.registration.deeds import affine_deeds_fit, affine_deeds_warp

    src, dst = _make_pair(rng, 32, 32)
    theta, grid = affine_deeds_fit(jnp.asarray(src)[..., None],
                                   jnp.asarray(dst)[..., None],
                                   affine_iters=20, grid_size=16,
                                   disp_range=0.2, displacement_width=7)
    warped = np.asarray(affine_deeds_warp(jnp.asarray(src)[..., None],
                                          theta, grid))
    err_before = np.mean((src - dst) ** 2)
    err_after = np.mean((warped[..., 0] - dst) ** 2)
    assert err_after < 0.7 * err_before


def test_l2_regulariser_matches_reference_quirk(rng):
    """l2_regulariser_2d ports the reference's _l2_regulariser_2d VERBATIM —
    including the quirk that the squeezed flow is (2, H, W) channels-first,
    so the dim-0 difference is a CHANNEL difference, not a spatial gradient
    (net/registration.py:163-168)."""
    import torch
    import torch.nn.functional as F

    from rpnet_tpu.registration.gaussian import l2_regulariser_2d

    H, W = 9, 7
    flow_chw = rng.randn(1, 2, H, W).astype(np.float32)   # reference layout

    d = torch.from_numpy(flow_chw).squeeze(0)             # (2, H, W)
    dx = (d[1:, 1:, :] - d[:-1, 1:, :]).pow(2) * 1
    dy = (d[1:, 1:, :] - d[1:, :-1, :]).pow(2) * 1
    ref = torch.mean(F.pad(dx + dy, (0, 1, 0, 1))).item()

    ours = float(l2_regulariser_2d(
        jnp.asarray(np.transpose(flow_chw[0], (1, 2, 0)))))   # (H, W, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-6)
