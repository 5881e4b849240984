"""Differentiable affine registration as a compiled optimization loop.

Functional rebuild of `AffineRegistration` (net/registration.py:316-357): a
2×3 theta warps the moving image through affine_grid + grid_sample (both
align_corners=False, torch defaults), fitted by `iters` Adam steps minimizing
a similarity loss. The python optimizer loop becomes a fixed-length
``lax.scan``; per-slice instances vmap into one batched program (the reference
runs one Adam fit per query slice inside the data loader,
dataset/few_shot_reader.py:122-162).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from rpnet_tpu.core.metrics import mse
from rpnet_tpu.ops.sampling import affine_grid, grid_sample, grid_sample_matmul

# theta * stop_shear mask keeps only scale+translation (net/registration.py:324)
# NOTE: numpy, not jnp — a module-level device array would initialize the jax
# backend at import time, locking the platform before CLIs can select one.
import numpy as _np

STOP_SHEAR_MASK_2D = _np.asarray([[1.0, 0.0, 1.0], [0.0, 1.0, 1.0]],
                                 dtype=_np.float32)


def identity_theta(dtype=jnp.float32):
    return jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]], dtype=dtype)


def affine_warp(x, theta, stop_shear: bool = False, sampler: str = "gather"):
    """Warp a single image by theta.

    x: (H, W, C); theta: (2, 3). Returns (H, W, C).

    sampler="matmul" computes the SAME bilinear values through one-hot
    matmuls (ops/sampling.grid_sample_matmul) — the TPU-fast path used inside
    the fit loop, where gather-based sampling is ~25× slower in-program.
    """
    if stop_shear:
        theta = theta * STOP_SHEAR_MASK_2D.astype(theta.dtype)
    H, W, C = x.shape
    grid = affine_grid(theta[None], (1, C, H, W), align_corners=False)
    if sampler == "matmul":
        return grid_sample_matmul(x[None], grid, align_corners=False)[0]
    return grid_sample(x[None], grid, align_corners=False)[0]


def fit_affine(moving, fixed, iters: int = 50, lr: float = 0.01,
               loss_fn: Callable = mse, stop_shear: bool = False,
               sampler: str = "matmul"):
    """Fit theta by Adam. moving/fixed: (H, W, C). Returns (theta, losses).

    Matches the reference's torch.optim.Adam defaults (betas 0.9/0.999,
    eps 1e-8; dataset/few_shot_reader.py:148) and its update order: the loss
    recorded at step i is evaluated at theta_i before the update.
    """
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    theta0 = identity_theta(moving.dtype)
    opt_state = opt.init(theta0)

    def objective(theta):
        return loss_fn(affine_warp(moving, theta, stop_shear, sampler), fixed)

    grad_fn = jax.value_and_grad(objective)

    def step(carry, _):
        theta, opt_state = carry
        loss, g = grad_fn(theta)
        updates, opt_state = opt.update(g, opt_state, theta)
        theta = optax.apply_updates(theta, updates)
        return (theta, opt_state), loss

    (theta, _), losses = jax.lax.scan(step, (theta0, opt_state), None, length=iters)
    return theta, losses
