"""Demons (dense deformable) registration with optional diffeomorphic flow.

Functional rebuild of `DemonsRegistration` + `Diffeomorphic`
(net/registration.py:190-312): a dense (2, H, W) flow field parameterizes a
warp ``grid_sample(x, grid + flow)``; optionally the flow is first integrated
by scaling-and-squaring (`Diffeomorphic`, scaling=10). The fit is Adam on a
similarity loss with Gaussian smoothing of the flow applied after every step
(no gradient through the smoothing), all rolled into ``lax.scan``.

Conventions preserved from the reference (do NOT "fix"):
  * the identity grid is built with (S-1) denominators (compute_grid,
    net/registration.py:171-187) but sampled with torch-default
    align_corners=False (net/registration.py:258) — a deliberate mismatch;
  * flow channels are (x, y) in normalized coords.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from rpnet_tpu.core.metrics import ncc
from rpnet_tpu.ops.sampling import compute_grid, grid_sample, grid_sample_matmul
from rpnet_tpu.registration.gaussian import gaussian_blur_flow, l2_regulariser_2d


def zero_flow(img_size, dtype=jnp.float32):
    H, W = img_size
    return jnp.zeros((2, H, W), dtype=dtype)


def _sample(x, coords, sampler: str):
    """grid_sample dispatch: "gather" is the reference-exact path; "matmul"
    is the MXU one-hot formulation (ops/sampling.py:190-227) — the demons
    objective's resamples are the hot loop on TPU, and the gather path runs
    at ~13M points/s in-program vs ~25× that for the matmul form."""
    if sampler == "matmul":
        return grid_sample_matmul(x, coords, align_corners=False)
    return grid_sample(x, coords, align_corners=False)


def diffeomorphic_2d(displacement, grid_chw, scaling: int = 10,
                     sampler: str = "gather"):
    """Scaling-and-squaring integration (net/registration.py:202-211).

    displacement: (2, H, W); grid_chw: (2, H, W) normalized identity grid.
    Returns the integrated displacement (2, H, W).
    """
    grid_hwc = jnp.transpose(grid_chw, (1, 2, 0))  # (H, W, 2)
    d = displacement / (2.0 ** scaling)

    # Statically unrolled (scaling is a compile-time int, typically 10): as a
    # lax.scan under the demons fit's value_and_grad, each trip's residuals
    # were stacked via dynamic-update-slice and the backward ran as a nested
    # while — profiled at ~450 ms/episode of pure bookkeeping inside the
    # 50-iteration fit (docs/perf_trace_r5.md session 3). Straight-line code
    # computes the identical op sequence with named intermediates instead.
    for _ in range(scaling):
        d_img = jnp.transpose(d, (1, 2, 0))[None]        # (1, H, W, 2) as image
        coords = (jnp.transpose(d, (1, 2, 0)) + grid_hwc)[None]  # sample coords
        sampled = _sample(d_img, coords, sampler)[0]
        d = d + jnp.transpose(sampled, (2, 0, 1))
    return d


def demons_warp(x, flow, grid_chw, diffeomorphic: bool = True, scaling: int = 10,
                sampler: str = "gather"):
    """Warp (H, W, C) image by flow (2, H, W) on normalized identity grid."""
    if diffeomorphic:
        flow = diffeomorphic_2d(flow, grid_chw, scaling, sampler)
    new_locs = grid_chw + flow                      # (2, H, W), channels (x, y)
    coords = jnp.transpose(new_locs, (1, 2, 0))[None]  # (1, H, W, 2)
    return _sample(x[None], coords, sampler)[0]


def fit_demons(moving, fixed, iters: int, lr: float = 0.01,
               sigma: Sequence[float] = (2.0, 2.0),
               diffeomorphic: bool = True, scaling: int = 10,
               loss_fn: Callable = ncc,
               regularise_displacement: bool = False,
               sampler: str = "gather"):
    """Fit the dense flow. moving/fixed: (H, W, C). Returns (flow, losses).

    Step order matches DemonsRegistration.train_registraion
    (net/registration.py:291-312): forward+loss → Adam update → Gaussian
    smoothing of the raw flow parameter (out-of-graph in the reference).
    """
    H, W, _ = moving.shape
    grid_chw = compute_grid((H, W), dtype=moving.dtype)[0]
    opt = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    flow0 = zero_flow((H, W), moving.dtype)
    opt_state = opt.init(flow0)

    def objective(flow):
        warped = demons_warp(moving, flow, grid_chw, diffeomorphic, scaling,
                             sampler)
        loss = loss_fn(warped, fixed)
        if regularise_displacement:
            loss = loss + l2_regulariser_2d(jnp.transpose(flow, (1, 2, 0)))
        return loss

    grad_fn = jax.value_and_grad(objective)

    def step(carry, _):
        flow, opt_state = carry
        loss, g = grad_fn(flow)
        updates, opt_state = opt.update(g, opt_state, flow)
        flow = optax.apply_updates(flow, updates)
        # regularize: smooth the flow parameter itself, no grad tracking
        flow = gaussian_blur_flow(jnp.transpose(flow, (1, 2, 0))[None], sigma)[0]
        flow = jnp.transpose(flow, (2, 0, 1))
        return (flow, opt_state), loss

    if iters == 0:
        return flow0, jnp.zeros((0,), moving.dtype)
    (flow, _), losses = jax.lax.scan(step, (flow0, opt_state), None, length=iters)
    return flow, losses
