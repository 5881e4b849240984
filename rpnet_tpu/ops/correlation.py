"""RAFT-style local correlation (the reference's memory hot spot, rebuilt).

The reference (net/rp_net.py:153-181) computes the FULL all-pairs correlation
``matmul(fm1ᵀ, fm2)/√C`` — an (H'W')×(H'W') matrix, 16.8M entries per slice at
64² features — and then *bilinear-samples a (2r+1)² window centered at each
pixel's own coordinate*. Because the sampling offsets are exact integers
(torch.linspace(-r, r, 2r+1)) and the sampler uses zero padding, that whole
construction is mathematically identical to a LOCAL correlation:

    out[b, y, x, (dy,dx)] = <fm1[b,y,x,:], fm2[b,y+dy,x+dx,:]> / sqrt(C)

with zeros outside the image. So we never materialize the quadratic matrix:
121 shifted dot-products over C cost ~34× fewer FLOPs and O(H·W·(2r+1)²)
memory instead of O((H·W)²). ``correlation_exact`` keeps the reference's
full-matrix + window-sampling formulation for parity tests on tiny shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from rpnet_tpu.ops.sampling import grid_sample


def local_correlation(fm1, fm2, r: int):
    """Local correlation volume.

    fm1, fm2: (N, H, W, C) channels-last feature maps.
    returns:  (N, H, W, (2r+1)²).

    Channel ordering quirk preserved from the reference: net/rp_net.py:171
    builds ``delta = meshgrid(dy, dx)`` but ``bilinear_sampler`` (rp_net.py:139)
    splits coords as (x, y) — so the first meshgrid axis lands on the
    HORIZONTAL shift. Channel c = i*(2r+1)+j therefore corresponds to spatial
    shift (dx = i-r, dy = j-r), i.e. the horizontal displacement varies
    slowest. Checkpoint conversion of the downstream 1×1 conv depends on this.
    """
    N, H, W, C = fm1.shape
    scale = float(1.0 / np.sqrt(float(C)))   # python float: weak type, preserves bf16
    d = 2 * r + 1
    fm2_pad = jnp.pad(fm2, ((0, 0), (r, r), (r, r), (0, 0)))
    outs = []
    for dx in range(d):        # horizontal shift — slow axis (reference quirk)
        for dy in range(d):    # vertical shift — fast axis
            shifted = lax_slice(fm2_pad, dy, dx, H, W)
            outs.append(jnp.sum(fm1 * shifted, axis=-1))
    out = jnp.stack(outs, axis=-1) * scale
    return out


def lax_slice(x_pad, dy, dx, H, W):
    return x_pad[:, dy:dy + H, dx:dx + W, :]


def local_correlation_mxu(fm1, fm2, r: int, precision=None):
    """MXU formulation of :func:`local_correlation`.

    The shifted-dot-product form is VPU/bandwidth-bound (a cross-lane channel
    reduction per displacement). Here, for each vertical shift dy we compute a
    row-band of the full correlation as ONE batched matmul
    ``einsum('bhwc,bhvc->bhwv')`` over the (2r+1)-wide horizontal window and
    pull out the (2r+1) diagonals with a static banded 0/1 mask — ~6.7× more
    MACs, but on the systolic array, which is a large net win on TPU.

    Identical values and channel ordering (dx slow / dy fast, the reference
    quirk) to :func:`local_correlation`.
    """
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    V = W + 2 * r
    scale = float(1.0 / np.sqrt(float(C)))   # python float: weak type, preserves bf16
    fm2p = jnp.pad(fm2, ((0, 0), (r, r), (r, r), (0, 0)))
    # banded extraction: M[dx, w, v] = 1 iff v == w + dx
    band = (np.arange(V)[None, None, :]
            == (np.arange(W)[None, :, None] + np.arange(d)[:, None, None]))
    M = jnp.asarray(band, dtype=fm1.dtype)

    outs = []
    for dy in range(d):
        rows = jax.lax.slice_in_dim(fm2p, dy, dy + H, axis=1)    # (B, H, V, C)
        cdy = jnp.einsum("bhwc,bhvc->bhwv", fm1, rows,
                         precision=precision)                     # MXU
        outs.append(jnp.einsum("bhwv,xwv->bhwx", cdy, M,
                               precision=precision))              # (B, H, W, d)
    out = jnp.stack(outs, axis=-1)            # (..., dx, dy) → dx*d+dy order
    return out.reshape(B, H, W, d * d) * scale


def local_correlation_mxu_bwd(g, fm1, fm2, r: int, precision=None):
    """MXU formulation of BOTH local-correlation input grads.

    Same banded-matmul trick as :func:`local_correlation_mxu`, applied to the
    backward (which has the identical local-shift structure — see
    ops/pallas/correlation.py::_corr_bwd_kernel):

      dfm1[p, c] = Σ_{dy,dx} g[p, ch(dx,dy)] · fm2p[p + (dy,dx), c]
      dfm2[q, c] = Σ_{dy,dx} g[q + (r-dy, r-dx), ch] · fm1[q + (r-dy, r-dx), c]

    Per vertical shift dy each grad is two einsums: a banded gather of the
    d_dx gradient channels into the (W, V) band, then a (W×V)@(V×C) contraction
    on the systolic array — replacing ~242 shifted full-HBM elementwise passes.
    """
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    V = W + 2 * r
    scale = jnp.asarray(1.0 / np.sqrt(float(C)), fm1.dtype)
    g = g.reshape(B, H, W, d, d)                       # (..., dx, dy)

    # ---- dfm1: band M[dx, w, v] = 1 iff v == w + dx (forward band) ----
    band1 = (np.arange(V)[None, None, :]
             == (np.arange(W)[None, :, None] + np.arange(d)[:, None, None]))
    M1 = jnp.asarray(band1, dtype=fm1.dtype)
    fm2p = jnp.pad(fm2, ((0, 0), (r, r), (r, r), (0, 0)))
    dfm1 = jnp.zeros_like(fm1)
    for dy in range(d):
        rows = jax.lax.slice_in_dim(fm2p, dy, dy + H, axis=1)      # (B, H, V, C)
        gb = jnp.einsum("bhwx,xwv->bhwv", g[..., dy], M1,
                        precision=precision)
        dfm1 = dfm1 + jnp.einsum("bhwv,bhvc->bhwc", gb, rows,
                                 precision=precision)

    # ---- dfm2: gathered form, rows/cols of g and fm1 padded r each side ----
    # dfm2[b,y,x,c] = Σ_{dy,dx} gp[b, y+2r-dy, x+2r-dx, ch] · fm1p[b, same, c]
    band2 = (np.arange(V)[None, None, :]
             == (np.arange(W)[None, :, None]
                 + (2 * r - np.arange(d))[:, None, None]))
    M2 = jnp.asarray(band2, dtype=fm1.dtype)           # (d, W, V): u = x+2r-dx
    gp = jnp.pad(g, ((0, 0), (r, r), (r, r), (0, 0), (0, 0)))
    fm1p = jnp.pad(fm1, ((0, 0), (r, r), (r, r), (0, 0)))
    dfm2 = jnp.zeros_like(fm2)
    for dy in range(d):
        rows_g = jax.lax.slice_in_dim(gp, 2 * r - dy, 2 * r - dy + H, axis=1)
        rows_f = jax.lax.slice_in_dim(fm1p, 2 * r - dy, 2 * r - dy + H, axis=1)
        gb = jnp.einsum("bhux,xwu->bhwu", rows_g[..., dy], M2,
                        precision=precision)           # (B, H, W, V)
        dfm2 = dfm2 + jnp.einsum("bhwu,bhuc->bhwc", gb, rows_f,
                                 precision=precision)
    return dfm1 * scale, dfm2 * scale


def correlation_exact(fm1, fm2, r: int):
    """Reference formulation: full (H'W')² matrix + bilinear window sampling.

    Bit-faithful port of net/rp_net.py:153-181 (including the float round-trip
    through normalized coordinates). Only for tests/small shapes.
    """
    N, H, W, C = fm1.shape
    a = fm1.reshape(N, H * W, C)
    b = fm2.reshape(N, H * W, C)
    corr = jnp.einsum("npc,nqc->npq", a, b, precision="highest") / jnp.sqrt(jnp.asarray(float(C)))
    # (N*H*W, H, W, 1) "images", one per source pixel
    corr_img = corr.reshape(N * H * W, H, W, 1)

    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=fm1.dtype),
                          jnp.arange(W, dtype=fm1.dtype), indexing="ij")
    centroid = jnp.stack([xs, ys], axis=-1).reshape(H * W, 1, 1, 2)
    centroid = jnp.tile(centroid, (N, 1, 1, 1))  # (N*H*W, 1, 1, 2)

    dxs = jnp.linspace(-r, r, 2 * r + 1, dtype=fm1.dtype)
    dys = jnp.linspace(-r, r, 2 * r + 1, dtype=fm1.dtype)
    # reference quirk: meshgrid(dy, dx) row-major, but component 0 is consumed
    # as the x shift by the sampler — so the first axis shifts horizontally
    g0, g1 = jnp.meshgrid(dys, dxs, indexing="ij")
    delta = jnp.stack([g0, g1], axis=-1).reshape(1, 2 * r + 1, 2 * r + 1, 2)

    coords = centroid + delta  # pixel coords, (x, y) last
    # reference bilinear_sampler: normalize with (S-1), sample align_corners=True
    norm = jnp.stack([2 * coords[..., 0] / (W - 1) - 1,
                      2 * coords[..., 1] / (H - 1) - 1], axis=-1)
    sampled = grid_sample(corr_img, norm, align_corners=True)
    # (N*H*W, d, d, 1) → (N, H, W, d²)
    return sampled.reshape(N, H, W, (2 * r + 1) ** 2)
