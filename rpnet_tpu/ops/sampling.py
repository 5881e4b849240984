"""Grid sampling / resampling ops with exact PyTorch semantics, NHWC layout.

The reference leans on four torch ops whose boundary conventions are
correctness-critical for Dice parity (SURVEY.md §7 hard part 1):

  * ``F.grid_sample``  — bilinear, zero padding; used with BOTH conventions:
    align_corners=False in registration (net/registration.py:258,344) and
    align_corners=True inside the correlation window sampler (net/rp_net.py:144)
  * ``F.affine_grid``  — align_corners=False (net/registration.py:342)
  * ``F.interpolate(mode='bilinear')`` — align_corners=False
    (net/rp_net.py:303,373,430)
  * ``F.avg_pool2d`` / ``F.max_pool2d`` — mask pooling and encoders

All functions here take channels-last arrays (TPU-friendly); ``*_nchw``
wrappers exist for parity testing against torch.

Bilinear resize is implemented as two small dense matmuls (separable 1-D
interpolation weight matrices) so it runs on the MXU instead of gather units —
and its transpose (used by the masked-average-pool trick in models/rpnet.py)
is exact.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


# --------------------------------------------------------------------------
# grid_sample
# --------------------------------------------------------------------------

def grid_sample(x, grid, align_corners: bool = False):
    """Bilinear sample ``x`` at normalized coords ``grid`` (zero padding).

    x:    (N, H, W, C)
    grid: (N, Hg, Wg, 2) with (x, y) order in [-1, 1] (torch convention)
    returns (N, Hg, Wg, C)
    """
    N, H, W, C = x.shape
    gx = grid[..., 0]
    gy = grid[..., 1]
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (W - 1)
        iy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((gx + 1.0) * W - 1.0) * 0.5
        iy = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(ix)
    y0 = jnp.floor(iy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = ix - x0
    wx0 = 1.0 - wx1
    wy1 = iy - y0
    wy0 = 1.0 - wy1

    flat = x.reshape(N, H * W, C)

    def corner(yy, xx, wy, wx):
        valid = (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
        xc = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        idx = (yc * W + xc).reshape(N, -1)  # (N, Hg*Wg)
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (N, Hg*Wg, C)
        w = (wy * wx * valid.astype(x.dtype)).reshape(N, -1, 1)
        return vals * w

    out = (corner(y0, x0, wy0, wx0) + corner(y0, x1, wy0, wx1)
           + corner(y1, x0, wy1, wx0) + corner(y1, x1, wy1, wx1))
    return out.reshape(N, grid.shape[1], grid.shape[2], C)


def grid_sample_nchw(x, grid, align_corners: bool = False):
    """NCHW wrapper (torch-layout parity testing)."""
    out = grid_sample(jnp.transpose(x, (0, 2, 3, 1)), grid, align_corners)
    return jnp.transpose(out, (0, 3, 1, 2))


# --------------------------------------------------------------------------
# affine_grid / identity grids
# --------------------------------------------------------------------------

def affine_grid(theta, size: Sequence[int], align_corners: bool = False):
    """Torch ``F.affine_grid``: theta (N, 2, 3), size (N, C, H, W) → (N, H, W, 2)."""
    N, _, H, W = size
    if align_corners:
        xs = jnp.linspace(-1.0, 1.0, W)
        ys = jnp.linspace(-1.0, 1.0, H)
    else:
        xs = (2.0 * jnp.arange(W) + 1.0) / W - 1.0
        ys = (2.0 * jnp.arange(H) + 1.0) / H - 1.0
    gx, gy = jnp.meshgrid(xs, ys)  # (H, W) each, xy-indexing
    gx = gx[None]
    gy = gy[None]
    # elementwise multiply-add (precision-exact regardless of the backend's
    # default matmul precision — the contraction is only length 3)
    t = theta[:, :, :, None, None]  # (N, 2, 3, 1, 1)
    ox = t[:, 0, 0] * gx + t[:, 0, 1] * gy + t[:, 0, 2]
    oy = t[:, 1, 0] * gx + t[:, 1, 1] * gy + t[:, 1, 2]
    return jnp.stack([ox, oy], axis=-1)  # (N, H, W, 2)


def compute_grid(img_size: Tuple[int, int], dtype=jnp.float32):
    """The reference's normalized identity grid (net/registration.py:171-187).

    NOTE the deliberate convention mismatch preserved from the reference: the
    grid is built align_corners=True style (denominator S-1) but later sampled
    with torch's default align_corners=False — replicated, not "fixed".

    Returns (1, 2, H, W) with channels (x, y).
    """
    H, W = img_size
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=dtype), jnp.arange(W, dtype=dtype),
                          indexing="ij")
    gx = 2.0 * (xs / (W - 1) - 0.5)
    gy = 2.0 * (ys / (H - 1) - 0.5)
    return jnp.stack([gx, gy], axis=0)[None]


# --------------------------------------------------------------------------
# bilinear resize as matmuls (exact torch F.interpolate semantics)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _resize_weights(src: int, dst: int, align_corners: bool) -> np.ndarray:
    """Dense (dst, src) bilinear interpolation matrix (torch upsample rules)."""
    if src == dst:
        return np.eye(src, dtype=np.float32)
    out = np.zeros((dst, src), dtype=np.float64)
    for i in range(dst):
        if align_corners:
            s = i * (src - 1) / (dst - 1) if dst > 1 else 0.0
        else:
            s = (i + 0.5) * src / dst - 0.5
            s = max(s, 0.0)  # torch clamps the low side; high side via i1 clamp
        i0 = int(np.floor(s))
        i0 = min(i0, src - 1)
        i1 = min(i0 + 1, src - 1)
        w1 = s - i0
        out[i, i0] += 1.0 - w1
        out[i, i1] += w1
    return out.astype(np.float32)


def interpolate_bilinear(x, size: Tuple[int, int], align_corners: bool = False):
    """Torch ``F.interpolate(x, size, mode='bilinear')`` on NHWC input.

    Runs as two dense matmuls (MXU-friendly) rather than gathers.
    """
    N, H, W, C = x.shape
    Ho, Wo = size
    Ay = jnp.asarray(_resize_weights(H, Ho, align_corners), dtype=x.dtype)
    Ax = jnp.asarray(_resize_weights(W, Wo, align_corners), dtype=x.dtype)
    out = jnp.einsum("oh,nhwc->nowc", Ay, x, precision="highest")
    out = jnp.einsum("ow,nhwc->nhoc", Ax, out, precision="highest").reshape(N, Ho, Wo, C)
    return out


def interpolate_bilinear_nchw(x, size, align_corners: bool = False):
    out = interpolate_bilinear(jnp.transpose(x, (0, 2, 3, 1)), size, align_corners)
    return jnp.transpose(out, (0, 3, 1, 2))


def resize_transpose(cot, src_size: Tuple[int, int], align_corners: bool = False):
    """Apply the TRANSPOSE of bilinear upsampling: (N, Ho, Wo, C) → (N, H, W, C).

    Exact adjoint of :func:`interpolate_bilinear` (used to pull full-resolution
    masks down to feature resolution without materializing upsampled features).
    """
    N, Ho, Wo, C = cot.shape
    H, W = src_size
    Ay = jnp.asarray(_resize_weights(H, Ho, align_corners), dtype=cot.dtype)
    Ax = jnp.asarray(_resize_weights(W, Wo, align_corners), dtype=cot.dtype)
    out = jnp.einsum("oh,nowc->nhwc", Ay, cot, precision="highest")
    out = jnp.einsum("ow,nhoc->nhwc", Ax, out, precision="highest")
    return out


# --------------------------------------------------------------------------
# matmul grid_sample (TPU gather replacement for ARBITRARY grids)
# --------------------------------------------------------------------------

def grid_sample_matmul(x, grid, align_corners: bool = False, precision=None):
    """``grid_sample`` for arbitrary grids WITHOUT gathers.

    Bilinear interpolation at point p decomposes as
        out[p] = Σ_i ky[p, i] · (Σ_j x[i, j] · kx[p, j])
    where ky/kx are triangular kernels ``max(0, 1 - |pos - index|)`` — exactly
    the bilinear weights, vanishing outside the image (zero padding for free).
    Both contractions are matmuls, so the whole warp runs on the MXU. Profiled
    on v5e this is ~25× faster in-program than the gather formulation (whose
    effective rate is ~13M points/s inside a compiled loop).

    Memory: the kernels are (N, Hg·Wg, H) and (N, Hg·Wg, W); at the
    registration fit resolutions this is a few MB. For very large grids use
    :func:`grid_sample` (gather) or chunk the output rows.

    x: (N, H, W, C); grid: (N, Hg, Wg, 2) — same contract as grid_sample.
    """
    N, H, W, C = x.shape
    Hg, Wg = grid.shape[1:3]
    gx = grid[..., 0].reshape(N, -1)
    gy = grid[..., 1].reshape(N, -1)
    if align_corners:
        ix = (gx + 1.0) * 0.5 * (W - 1)
        iy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        ix = ((gx + 1.0) * W - 1.0) * 0.5
        iy = ((gy + 1.0) * H - 1.0) * 0.5

    cols = jnp.arange(W, dtype=x.dtype)
    rows = jnp.arange(H, dtype=x.dtype)
    kx = jnp.maximum(0.0, 1.0 - jnp.abs(ix[..., None] - cols))   # (N, P, W)
    ky = jnp.maximum(0.0, 1.0 - jnp.abs(iy[..., None] - rows))   # (N, P, H)

    # rowdot[n, p, h, c] = Σ_w x[n, h, w, c] · kx[n, p, w]   (MXU)
    rowdot = jnp.einsum("nhwc,npw->nphc", x, kx, precision=precision)
    # out[n, p, c] = Σ_h rowdot[n, p, h, c] · ky[n, p, h]    (weighted reduce)
    out = jnp.einsum("nphc,nph->npc", rowdot, ky, precision=precision)
    return out.reshape(N, Hg, Wg, C)


def grid_sample_matmul_chunked(x, grid, align_corners: bool = False,
                               row_chunk: int = 16, precision=None,
                               band: Optional[int] = None):
    """Memory-bounded :func:`grid_sample_matmul` for full-resolution grids.

    The one-hot kernels are (P, H)/(P, W) with P = Hg·Wg — at 256² that's too
    large to materialize at once, so output rows are processed in chunks of
    ``row_chunk`` via ``lax.scan`` (serial chunks, vmap-batchable). Same values
    as grid_sample/grid_sample_matmul.

    ``band``: bilinear row weights ``max(0, 1-|iy-row|)`` vanish outside
    ``(iy-1, iy+1)``, so for warps with modest rotation a chunk of output rows
    only ever reads a narrow BAND of source rows — contracting all H of them
    (the dense formulation) is ~H/band redundant FLOPs. When the band of a
    chunk fits, the contraction runs over a ``band``-row ``dynamic_slice``;
    a per-chunk ``lax.cond`` falls back to the dense path whenever it does
    not (large rotations, demons flow, NaNs), so results are exact for ANY
    grid. Default: 64 source rows when H ≥ 128, else dense. ``band=0``
    forces dense. On the v5e eval trace this cut the full-res registration
    warp (the dominant FLOP block of an eval episode) by ~4×.
    """
    N, H, W, C = x.shape
    Hg, Wg = grid.shape[1:3]
    row_chunk = min(row_chunk, Hg)
    pad = (-Hg) % row_chunk
    if pad:
        # pad the grid up to a multiple of row_chunk (a divisor fallback
        # degenerates to row_chunk=1 — Hg serial scan steps — when Hg is
        # prime, e.g. a 251-row grid); padded rows sample real values but
        # are sliced off below, keeping chunk count at ceil(Hg/row_chunk)
        grid = jnp.concatenate(
            [grid, jnp.broadcast_to(grid[:, -1:], (N, pad, Wg, 2))], axis=1)
    n_chunks = (Hg + pad) // row_chunk
    grid_chunks = grid.reshape(N, n_chunks, row_chunk, Wg, 2)
    grid_chunks = jnp.moveaxis(grid_chunks, 1, 0)      # (n_chunks, N, R, Wg, 2)

    if band is None:
        band = 64 if H >= 128 else 0

    if not band or band >= H:
        def body(_, g):
            return None, grid_sample_matmul(x, g, align_corners, precision)
    else:
        cols = jnp.arange(W, dtype=x.dtype)

        def banded(g):
            gx = g[..., 0].reshape(N, -1)
            gy = g[..., 1].reshape(N, -1)
            if align_corners:
                ix = (gx + 1.0) * 0.5 * (W - 1)
                iy = (gy + 1.0) * 0.5 * (H - 1)
            else:
                ix = ((gx + 1.0) * W - 1.0) * 0.5
                iy = ((gy + 1.0) * H - 1.0) * 0.5
            # kx built (N, W, P): P lands on the minor dim, the layout the
            # MXU contraction wants (the (N, P, W) orientation relayouts)
            kxT = jnp.maximum(0.0, 1.0 - jnp.abs(ix[:, None, :] - cols[:, None]))
            lo = jnp.clip(jnp.floor(jnp.min(iy, axis=1)).astype(jnp.int32) - 1,
                          0, H - band)                              # (N,)
            xb = jax.vmap(lambda xi, l: jax.lax.dynamic_slice(
                xi, (l, 0, 0), (band, W, C)))(x, lo)                # (N,B,W,C)
            rows_b = (lo[:, None] + jnp.arange(band)).astype(x.dtype)
            ky_b = jnp.maximum(
                0.0, 1.0 - jnp.abs(iy[:, :, None] - rows_b[:, None, :]))
            # rowdot[n,p,b,c] = Σ_w kxT[n,w,p] · xb[n,b,w,c]
            rowdot = jax.lax.dot_general(
                kxT, xb, (((1,), (2,)), ((0,), (0,))), precision=precision)
            # out[n,p,c] = Σ_b rowdot[n,p,b,c] · ky_b[n,p,b]
            out = jax.lax.dot_general(
                rowdot, ky_b, (((2,), (2,)), ((0, 1), (0, 1))),
                precision=precision)
            return out.reshape(N, row_chunk, Wg, C)

        def body(_, g):
            gy = g[..., 1].reshape(N, -1)
            iy = ((gy + 1.0) * 0.5 * (H - 1) if align_corners
                  else ((gy + 1.0) * H - 1.0) * 0.5)
            lo = jnp.clip(jnp.floor(jnp.min(iy, axis=1)).astype(jnp.int32) - 1,
                          0, H - band)
            # highest in-image row with nonzero weight is floor(max_iy)+1;
            # NaN coords compare False → dense path → still exact
            hi = jnp.minimum(jnp.floor(jnp.max(iy, axis=1)).astype(jnp.int32)
                             + 1, H - 1)
            ok = jnp.all(hi < lo + band)
            return None, jax.lax.cond(
                ok, banded,
                lambda gg: grid_sample_matmul(x, gg, align_corners, precision),
                g)

    _, out = jax.lax.scan(body, None, grid_chunks)     # (n_chunks, N, R, Wg, C)
    out = jnp.moveaxis(out, 0, 1).reshape(N, Hg + pad, Wg, C)
    return out[:, :Hg] if pad else out


# --------------------------------------------------------------------------
# separable grid_sample (matmul path for structured grids)
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _bilinear_weights_1d(src: int, coords_key, align_corners: bool) -> np.ndarray:
    """(dst, src) bilinear weight matrix for arbitrary 1-D normalized coords,
    with grid_sample ZERO-padding semantics (weights vanish outside [0, src-1])."""
    coords = np.asarray(coords_key, dtype=np.float64)
    if align_corners:
        pos = (coords + 1.0) * 0.5 * (src - 1)
    else:
        pos = ((coords + 1.0) * src - 1.0) * 0.5
    idx = np.arange(src)[None, :]
    w = np.maximum(0.0, 1.0 - np.abs(pos[:, None] - idx))
    return w.astype(np.float32)


def separable_grid_sample(x, xs, ys, align_corners: bool = False):
    """``grid_sample`` for SEPARABLE grids: sample x-coordinate depends only on
    the output column and y only on the row (e.g. the identity grid of
    net/registration.py:171-187, or any axis-aligned scale+translate warp).

    Mathematically identical to :func:`grid_sample` on the outer-product grid,
    but runs as two dense matmuls on the MXU instead of 65k-point gathers —
    the reason the zero-flow demons resample in registration/fit.py is cheap.

    x: (N, H, W, C); xs: (Wo,) and ys: (Ho,) normalized coords (host values).
    """
    N, H, W, C = x.shape
    Wy = jnp.asarray(_bilinear_weights_1d(H, tuple(np.asarray(ys).tolist()),
                                          align_corners), dtype=x.dtype)
    Wx = jnp.asarray(_bilinear_weights_1d(W, tuple(np.asarray(xs).tolist()),
                                          align_corners), dtype=x.dtype)
    out = jnp.einsum("oh,nhwc->nowc", Wy, x, precision="highest")
    out = jnp.einsum("ow,nhwc->nhoc", Wx, out, precision="highest")
    return out


def identity_grid_coords_1d(size: int):
    """The reference identity grid's per-axis normalized coords ((S-1) rule)."""
    return 2.0 * (np.arange(size) / (size - 1) - 0.5)


# --------------------------------------------------------------------------
# pooling
# --------------------------------------------------------------------------

def avg_pool2d(x, kernel: int, stride: int | None = None):
    """Torch ``F.avg_pool2d`` (no padding) on NHWC input."""
    stride = stride or kernel
    out = lax.reduce_window(x, 0.0, lax.add,
                            (1, kernel, kernel, 1), (1, stride, stride, 1), "VALID")
    return out / float(kernel * kernel)


def max_pool2d(x, kernel: int, stride: int | None = None, padding: int = 0):
    """Torch ``F.max_pool2d`` on NHWC input (symmetric zero-free padding)."""
    stride = stride or kernel
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(x, init, lax.max,
                             (1, kernel, kernel, 1), (1, stride, stride, 1),
                             list(pads))


def upsample_nearest2x(x):
    """Torch ``nn.Upsample(scale_factor=2)`` (nearest) on NHWC input."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def replication_pad2d(x, pad: int):
    """Torch ``nn.ReplicationPad2d`` on NHWC input."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
