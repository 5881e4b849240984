"""DEEDS-style discrete displacement registration (net/registration.py:360-471).

Single-shot (no gradient descent): build a (displacement_width²) cost volume
on a coarse control grid, approximate min-convolution with max/avg pools, one
grid-based mean-field iteration, then a soft-argmin over displacements gives a
dense warp grid. Everything is static-shape pooling + one softmax — pure XLA.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from rpnet_tpu.ops.sampling import (affine_grid, avg_pool2d, grid_sample,
                                    max_pool2d, replication_pad2d)

# learnable-in-principle weights, fixed init in the reference (registration.py:369)
DEFAULT_ALPHA = (1.0, 0.1, 1.0, 0.0, 0.1, 10.0)


def _min_conv(cost):
    """avg1(avg1(-max1(-pad1(cost)))) — approximate min-convolution."""
    c = replication_pad2d(cost, 3)
    c = -max_pool2d(-c, 3, 1)
    c = avg_pool2d(c, 3, 1)
    c = avg_pool2d(c, 3, 1)
    return c


def deeds_fit(moving, fixed, grid_size: int = 128, disp_range: float = 0.1,
              displacement_width: int = 15, alpha=DEFAULT_ALPHA,
              mode: str = "nearest"):
    """Compute the dense sampling grid registering moving→fixed.

    moving/fixed: (H, W, 1). Returns sample_grid (H, W, 2) for grid_sample.
    """
    H, W, _ = moving.shape
    a0, a1, a2, a3, a4, a5 = [jnp.asarray(a, moving.dtype) for a in alpha]
    dw = displacement_width
    eye = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], moving.dtype)

    grid_xyz = affine_grid(eye[None], (1, 1, grid_size, grid_size))          # (1,g,g,2)
    shift_xyz = affine_grid((disp_range * eye)[None], (1, 1, dw, dw))        # (1,dw,dw,2)

    new_grid = grid_xyz.reshape(1, -1, 1, 2) + shift_xyz.reshape(1, 1, -1, 2)
    moving_grid = grid_sample(moving[None], new_grid)        # (1, g², dw², 1)
    fixed_grid = grid_sample(fixed[None], grid_xyz.reshape(1, -1, 1, 2))  # (1, g², 1, 1)

    deeds_cost = (a1 + a0 * (fixed_grid - moving_grid) ** 2).reshape(-1, dw, dw, 1)

    cost = _min_conv(deeds_cost)

    # mean-field over the control grid: treat dw² as channels
    cost_sp = cost.reshape(1, grid_size, grid_size, dw * dw)
    cost_avg = avg_pool2d(avg_pool2d(replication_pad2d(cost_sp, 2), 3, 1), 3, 1)
    cost_avg = cost_avg.reshape(-1, dw, dw, 1)

    # second path re-weights the raw cost with the mean-field message
    cost = a4 + a2 * deeds_cost + a3 * cost_avg
    cost = _min_conv(cost)

    cost_sp = cost.reshape(1, grid_size, grid_size, dw * dw)
    cost_avg = avg_pool2d(avg_pool2d(replication_pad2d(cost_sp, 2), 3, 1), 3, 1)
    cost_avg = cost_avg.reshape(grid_size * grid_size, dw * dw)

    cost_soft = jnp.exp(-a5 * cost_avg - jnp.max(-a5 * cost_avg, axis=1, keepdims=True))
    cost_soft = cost_soft / jnp.sum(cost_soft, axis=1, keepdims=True)
    pred_xyz = jnp.sum(cost_soft[..., None] * shift_xyz.reshape(1, -1, 2), axis=1)
    shift = pred_xyz.reshape(grid_size, grid_size, 2)

    coarse = grid_xyz[0] + shift                              # (g, g, 2)
    if mode == "nearest":
        # nearest upsample to (H, W)
        ry = (jnp.arange(H) * grid_size // H).astype(jnp.int32)
        rx = (jnp.arange(W) * grid_size // W).astype(jnp.int32)
        fine = coarse[ry][:, rx]
    else:
        from rpnet_tpu.ops.sampling import interpolate_bilinear
        fine = interpolate_bilinear(coarse[None], (H, W))[0]
    return fine


def deeds_warp(x, sample_grid):
    """Apply a DEEDS grid: x (H, W, C), sample_grid (H, W, 2)."""
    return grid_sample(x[None], sample_grid[None])[0]


def affine_deeds_fit(moving, fixed, *, affine_iters: int = 50, lr: float = 0.01,
                     stop_shear: bool = False, **deeds_kw):
    """Affine fit → detach → DEEDS on the affined image
    (AffineDEEDSRegistration.train_registraion, net/registration.py:505-524).

    moving/fixed: (H, W, 1). Returns (theta, sample_grid).
    """
    from rpnet_tpu.registration.affine import affine_warp, fit_affine

    theta, _ = fit_affine(moving, fixed, iters=affine_iters, lr=lr,
                          stop_shear=stop_shear)
    affined = affine_warp(moving, theta, stop_shear=stop_shear)
    grid = deeds_fit(affined, fixed, **deeds_kw)
    return theta, grid


def affine_deeds_warp(x, theta, sample_grid, stop_shear: bool = False):
    """Apply the combined transform (affine then DEEDS), x (H, W, C)."""
    from rpnet_tpu.registration.affine import affine_warp

    return deeds_warp(affine_warp(x, theta, stop_shear=stop_shear), sample_grid)
