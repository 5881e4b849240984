"""The registration stage of an episode, as ONE compiled program.

Rebuild of `get_registration_field` (dataset/few_shot_reader.py:109-198): the
reference spins up a fresh torch module + two Adam optimizers per query slice
inside the data loader and runs 50 affine (+ optionally 50 demons) iterations
on the GPU, slice by slice. Here the whole thing is a pure function per slice
— affine fit → demons fit → warps + thresholds — vmapped over the slice axis
and jit-compiled, so an entire episode's registration is a single XLA program
(and shards across chips on the slice axis, SURVEY.md §5).

Pipeline semantics preserved exactly:
  * images enter in [-1, 1]; fitting happens in [0, 1] ((x+1)/2,
    few_shot_reader.py:111-115);
  * affine: 50 Adam steps, MSE (few_shot_reader.py:152-162);
  * demons: diffeomorphic (scaling-and-squaring ×10), NCC loss, Gaussian σ=2
    smoothing after every step; 0 iterations when do_deformable=False;
  * warped label = demons∘affine applied to the label, thresholded > 0.1;
    the "affine-only" label likewise (few_shot_reader.py:167-173);
  * warped images are mapped back to [-1, 1] (few_shot_reader.py:190-195);
  * even with zero demons iterations the label/image still pass through the
    demons warp with zero flow (an extra resample through the reference's
    mismatched-convention identity grid) — replicated for Dice parity.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rpnet_tpu.ops.sampling import compute_grid
from rpnet_tpu.registration.affine import affine_warp, fit_affine
from rpnet_tpu.registration.demons import (demons_warp, diffeomorphic_2d,
                                           fit_demons)


class RegistrationResult(NamedTuple):
    """Per-slice registration outputs (leading axis = query slices)."""
    theta: jnp.ndarray              # (S, 2, 3) fitted affine params
    flow: jnp.ndarray               # (S, 2, H, W) fitted demons flow (raw param)
    warped_label: jnp.ndarray       # (S, H, W) demons∘affine label > 0.1
    affine_label: jnp.ndarray       # (S, H, W) affine-only label > 0.1
    warped_src: jnp.ndarray         # (S, H, W) demons∘affine image, in [-1,1]
    affine_src: jnp.ndarray         # (S, H, W) affine-only image, in [-1,1]
    grid: jnp.ndarray               # (S, 2, H, W) normalized identity grid


def register_slice(src, dst, src_label, *, affine_iters: int = 50,
                   demons_iters: int = 0, lr: float = 0.01, sigma: float = 2.0,
                   diffeo_scaling: int = 10, fit_scale: int = 1,
                   sampler: str = "matmul"):
    """Register one support slice onto one query slice.

    src, dst: (H, W) images in [-1, 1]; src_label: (H, W) binary.

    ``fit_scale`` > 1 runs the affine FIT on an avg-pooled image (theta in
    normalized coordinates is resolution-invariant) while every warp output
    stays full-resolution — a pure-performance knob: the 50-iteration Adam
    loop is gather-bound on TPU and its cost drops quadratically with scale.

    ``sampler`` selects the bilinear implementation inside the fit:
    "matmul" (default) is the MXU one-hot formulation, ~25x faster in-program;
    its subgradient at exact-integer sample coords differs from torch's, so
    the OPTIMIZER TRAJECTORY deviates slightly (same converged fit quality).
    fit_scale=1 + sampler="gather" reproduces the reference trajectory.
    """
    H, W = src.shape
    src01 = ((src + 1.0) * 0.5)[..., None]     # (H, W, 1)
    dst01 = ((dst + 1.0) * 0.5)[..., None]
    label = src_label[..., None]

    if fit_scale > 1:
        from rpnet_tpu.ops.sampling import avg_pool2d
        src_fit = avg_pool2d(src01[None], fit_scale)[0]
        dst_fit = avg_pool2d(dst01[None], fit_scale)[0]
    else:
        src_fit, dst_fit = src01, dst01

    theta, _ = fit_affine(src_fit, dst_fit, iters=affine_iters, lr=lr,
                          sampler=sampler)

    if sampler == "matmul":
        # one combined 2-channel full-res warp (label + image) through the
        # chunked MXU sampler — replaces two 65k-point gathers per slice
        from rpnet_tpu.ops.sampling import (affine_grid,
                                            grid_sample_matmul_chunked)
        both = jnp.concatenate([label, src01], axis=-1)[None]      # (1,H,W,2)
        grid = affine_grid(theta[None], (1, 2, H, W), align_corners=False)
        warped_both = grid_sample_matmul_chunked(both, grid)[0]
        affine_lab = warped_both[..., :1]
        affined_src01 = warped_both[..., 1:]
    else:
        affined_src01 = affine_warp(src01, theta)
        affine_lab = affine_warp(label, theta)

    flow, _ = fit_demons(affined_src01, dst01, iters=demons_iters, lr=lr,
                         sigma=(sigma, sigma), diffeomorphic=True,
                         scaling=diffeo_scaling)

    grid_chw = compute_grid((H, W), dtype=src.dtype)[0]
    if demons_iters == 0:
        # flow ≡ 0: diffeomorphic integration of zero is exactly zero, and the
        # zero-flow demons warp is a resample through the static identity grid
        # — a SEPARABLE grid, so it runs as two matmuls instead of gathers
        # (mathematically identical to the gather path; see ops/sampling.py).
        from rpnet_tpu.ops.sampling import (identity_grid_coords_1d,
                                            separable_grid_sample)
        xs = identity_grid_coords_1d(W)
        ys = identity_grid_coords_1d(H)
        warped_lab = separable_grid_sample(affine_lab[None], xs, ys)[0]
        warped_src01 = separable_grid_sample(affined_src01[None], xs, ys)[0]
    else:
        # ONE combined 2-channel warp: the scaling-and-squaring integration
        # of the flow is channel-independent, so warping label and image
        # separately would run the 10-step integration (and the dense
        # resample) twice for identical flow
        both01 = jnp.concatenate([affine_lab, affined_src01], axis=-1)
        warped_both = demons_warp(both01, flow, grid_chw, diffeomorphic=True,
                                  scaling=diffeo_scaling)
        warped_lab = warped_both[..., :1]
        warped_src01 = warped_both[..., 1:]

    return RegistrationResult(
        theta=theta,
        flow=flow,
        warped_label=(warped_lab[..., 0] > 0.1).astype(src.dtype),
        affine_label=(affine_lab[..., 0] > 0.1).astype(src.dtype),
        warped_src=warped_src01[..., 0] * 2.0 - 1.0,
        affine_src=affined_src01[..., 0] * 2.0 - 1.0,
        grid=grid_chw,
    )


def _fit_theta_slice(src01, dst01, *, affine_iters, lr, fit_scale, sampler):
    """Pooled affine fit for one slice → theta (the vmapped part)."""
    if fit_scale > 1:
        from rpnet_tpu.ops.sampling import avg_pool2d
        src_fit = avg_pool2d(src01[None], fit_scale)[0]
        dst_fit = avg_pool2d(dst01[None], fit_scale)[0]
    else:
        src_fit, dst_fit = src01, dst01
    theta, _ = fit_affine(src_fit, dst_fit, iters=affine_iters, lr=lr,
                          sampler=sampler)
    return theta


@partial(jax.jit, static_argnames=("affine_iters", "demons_iters",
                                   "diffeo_scaling", "fit_scale", "sampler",
                                   "sigma"))
# ``sigma`` must be STATIC: the Gaussian regularizer's kernel SIZE is
# 2·ceil(2σ)+1 (net/registration.py:16-31) — a shape, not a value. As a
# traced arg the demons path crashed whenever a caller passed sigma
# explicitly (an unpassed jit default stays a Python float, which is why
# only the config-driven path hit it — round-4 dryrun finding).
def register_episode(support_imgs, query_imgs, support_labels, *,
                     affine_iters: int = 50, demons_iters: int = 0,
                     lr: float = 0.01, sigma: float = 2.0,
                     diffeo_scaling: int = 10, fit_scale: int = 1,
                     sampler: str = "matmul") -> RegistrationResult:
    """Register every support slice onto its query slice, batched.

    support_imgs, query_imgs: (S, H, W) in [-1, 1]; support_labels: (S, H, W).

    Equivalent to ``vmap(register_slice)``, but on the matmul path only the
    Adam FIT loops are vmapped per slice; the full-resolution warps run as
    ONE batched call over all S slices. Besides better MXU batching, this
    keeps the banded sampler's per-chunk ``lax.cond`` a SCALAR branch —
    under a per-slice vmap it would lower to select(banded, dense) and
    execute both.
    """
    if sampler != "matmul":
        # reference-exact gather path: per-slice program, unchanged
        fn = partial(register_slice, affine_iters=affine_iters,
                     demons_iters=demons_iters, lr=lr, sigma=sigma,
                     diffeo_scaling=diffeo_scaling, fit_scale=fit_scale,
                     sampler=sampler)
        return jax.vmap(fn)(support_imgs, query_imgs, support_labels)

    from rpnet_tpu.ops.sampling import (affine_grid,
                                        grid_sample_matmul_chunked,
                                        identity_grid_coords_1d,
                                        separable_grid_sample)

    S, H, W = support_imgs.shape
    src01 = ((support_imgs + 1.0) * 0.5)[..., None]       # (S, H, W, 1)
    dst01 = ((query_imgs + 1.0) * 0.5)[..., None]
    label = support_labels[..., None]

    theta = jax.vmap(partial(_fit_theta_slice, affine_iters=affine_iters,
                             lr=lr, fit_scale=fit_scale,
                             sampler=sampler))(src01, dst01)   # (S, 2, 3)

    # one batched 2-channel full-res warp (label + image) for ALL slices
    both = jnp.concatenate([label, src01], axis=-1)       # (S, H, W, 2)
    grid = affine_grid(theta, (S, 2, H, W), align_corners=False)
    warped_both = grid_sample_matmul_chunked(both, grid)
    affine_lab = warped_both[..., :1]
    affined_src01 = warped_both[..., 1:]

    grid_chw = compute_grid((H, W), dtype=support_imgs.dtype)[0]
    if demons_iters == 0:
        flow = jnp.zeros((S, 2, H, W), support_imgs.dtype)
        # zero-flow demons warp ≡ resample through the static identity grid
        # (separable — two matmuls); see register_slice for the semantics
        xs = identity_grid_coords_1d(W)
        ys = identity_grid_coords_1d(H)
        warped_both2 = separable_grid_sample(warped_both, xs, ys)
    else:
        # TPU-native fast demons (mirrors the affine fit_scale design): the
        # 50-iteration NCC fit AND the scaling-and-squaring integration run
        # at 1/fit_scale resolution with the MXU one-hot sampler (flow lives
        # in normalized coords → resolution-invariant), then the integrated
        # displacement upsamples bilinearly and ONE full-res chunked-matmul
        # warp resamples label+image. The gather path at full res is the
        # reference trajectory (register_slice; reg_sampler: gather) — it
        # runs the diffeo integration inside every objective evaluation at
        # full res, ~1000 full-HBM gathers per episode, measured 41 s/episode
        # on v5e (docs/perf_trace_r4.md). Gaussian sigma scales with the fit
        # grid (σ/fit_scale) to keep the reference's physical smoothing
        # length (net/registration.py:150 σ=2 at full res).
        from rpnet_tpu.ops.sampling import interpolate_bilinear

        s = max(1, fit_scale)
        if s > 1:
            from rpnet_tpu.ops.sampling import avg_pool2d
            src_fit = avg_pool2d(affined_src01, s)
            dst_fit = avg_pool2d(dst01, s)
        else:
            src_fit, dst_fit = affined_src01, dst01
        sig = max(0.5, sigma / s)
        fitfn = partial(fit_demons, iters=demons_iters, lr=lr,
                        sigma=(sig, sig), diffeomorphic=True,
                        scaling=diffeo_scaling, sampler="matmul")
        flow_low = jax.vmap(lambda a, d: fitfn(a, d)[0])(src_fit, dst_fit)
        grid_low = compute_grid((H // s, W // s), dtype=support_imgs.dtype)[0]
        disp_low = jax.vmap(
            lambda f: diffeomorphic_2d(f, grid_low, diffeo_scaling,
                                       sampler="matmul"))(flow_low)
        disp = interpolate_bilinear(
            jnp.transpose(disp_low, (0, 2, 3, 1)), (H, W))     # (S, H, W, 2)
        flow = interpolate_bilinear(
            jnp.transpose(flow_low, (0, 2, 3, 1)), (H, W))
        flow = jnp.transpose(flow, (0, 3, 1, 2))               # (S, 2, H, W)
        coords = jnp.transpose(grid_chw, (1, 2, 0))[None] + disp
        warped_both2 = grid_sample_matmul_chunked(warped_both, coords)
    warped_lab = warped_both2[..., :1]
    warped_src01 = warped_both2[..., 1:]

    dt = support_imgs.dtype
    return RegistrationResult(
        theta=theta,
        flow=flow,
        warped_label=(warped_lab[..., 0] > 0.1).astype(dt),
        affine_label=(affine_lab[..., 0] > 0.1).astype(dt),
        warped_src=warped_src01[..., 0] * 2.0 - 1.0,
        affine_src=affined_src01[..., 0] * 2.0 - 1.0,
        grid=jnp.broadcast_to(grid_chw, (S, 2, H, W)),
    )
