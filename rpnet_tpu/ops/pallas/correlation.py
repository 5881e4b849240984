"""Pallas TPU kernel for the RAFT-style local correlation.

Why a kernel (SURVEY.md §5 "the memory hot spot"): the XLA formulation
(ops/correlation.py) materializes 121 shifted elementwise products — each
displacement re-reads both (B, H, W, C) feature maps from HBM, ~121× the
necessary traffic, making every CRE call bandwidth-bound. This kernel keeps a
row-tile of fm1 (pipelined BlockSpec) and a haloed row-slab of the padded fm2
(manual async DMA from HBM — halos overlap, which BlockSpecs can't express) in
VMEM and computes all (2r+1)² displacement dot-products in-register with one
pass over the channels.

Channel ordering matches ops/correlation.local_correlation exactly (the
reference's horizontal-shift-slowest quirk, net/rp_net.py:169-175):
out channel c = dx_idx * (2r+1) + dy_idx.

TPU tiling: blocks keep the full channel dim (last-dim multiple of 128) and
tile H; the displacement sweep is a fori_loop with dynamic slices (a 121-way
python unroll explodes Mosaic compile time).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpnet_tpu.ops.correlation import local_correlation as _xla_local_correlation


def _corr_kernel(fm2p_hbm, fm1_ref, out_ref, scratch, sem, *,
                 H_tile, W, r, scale):
    """Grid step (b, h_tile).

    fm2p_hbm: (B, H+2r, W+2r, C) in HBM/ANY — window DMA'd manually
    fm1_ref:  (1, H_tile, W, C) VMEM block
    out_ref:  (1, D², H_tile, W) VMEM block (f32 or bf16 — accumulation is
              always f32 in-register; a bf16 out halves the store + the
              downstream transpose traffic and is bit-identical to the XLA
              `astype` the f32 path applies right after)
    scratch:  (H_tile+2r, W+2r, C) VMEM
    """
    d = 2 * r + 1
    b = pl.program_id(0)
    ht = pl.program_id(1)

    dma = pltpu.make_async_copy(
        fm2p_hbm.at[b, pl.ds(ht * H_tile, H_tile + 2 * r), :, :],
        scratch, sem)
    dma.start()

    fm1 = fm1_ref[0]                        # (H_tile, W, C)
    dma.wait()

    # Mosaic constraint: dynamic offsets are only allowed on UNTILED dims —
    # so the vertical shift (dim 0 of scratch) is the fori_loop variable and
    # the horizontal shift (sublane dim) is a static 11-way unroll.
    def body(dy, _):
        slab = scratch[pl.ds(dy, H_tile)]   # (H_tile, W+2r, C)
        for dx in range(d):                 # static; horizontal slow (quirk)
            sub = slab[:, dx:dx + W, :]
            # accumulate in f32 regardless of input dtype (bf16 inputs OK)
            acc = jnp.sum((fm1 * sub).astype(jnp.float32), axis=-1) * scale
            out_ref[0, dx * d + dy, :, :] = acc.astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, d, body, 0)


@functools.partial(jax.jit, static_argnames=("r", "h_tile", "interpret",
                                             "out_f32"))
def local_correlation_pallas(fm1, fm2, r: int, h_tile: int = 16,
                             interpret: bool = False, out_f32: bool = True):
    """Pallas local correlation. fm1, fm2: (B, H, W, C) → (B, H, W, (2r+1)²).

    ``out_f32=False`` stores the accumulator in fm1's dtype (bf16 halves the
    store bytes) — measured SLOWER on v5e (7.07 vs 6.14 ms at the eval shape):
    (16, 64) bf16 tile stores pack at half lane width and Mosaic's store path
    loses more than the bytes save. f32 store + XLA cast stays the default.
    """
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    scale = float(1.0 / np.sqrt(float(C)))
    h_tile = min(h_tile, H)
    if H % h_tile != 0:
        h_tile = H
    n_htiles = H // h_tile
    out_dtype = jnp.float32 if out_f32 else fm1.dtype

    # W-pad to the sublane tiling (8) so HBM DMA slices are aligned
    Wp = -(-(W + 2 * r) // 8) * 8
    fm2p = jnp.pad(fm2, ((0, 0), (r, r), (r, Wp - W - r), (0, 0)))

    kernel = functools.partial(_corr_kernel, H_tile=h_tile, W=W, r=r, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, d * d, H, W), out_dtype),
        grid=(B, n_htiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # fm2p stays off-chip
            pl.BlockSpec((1, h_tile, W, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d * d, h_tile, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2 * r, Wp, C), fm2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fm2p, fm1)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(fm1.dtype)


# ------------------------------------------------------------- MXU variant

def _corr_mxu_kernel(band_ref, fm2p_hbm, fm1_ref, out_ref, scratch, sem, *,
                     H_tile, W, r, scale):
    """MXU formulation in-kernel: per vertical shift dy, one batched matmul
    fm1 (Ht, W, C) × slab (Ht, Wp, C)ᵀ → (Ht, W, Wp) row-band correlations,
    then banded-mask reductions extract the (2r+1) horizontal displacements.
    Avoids the per-displacement cross-lane channel reduction of _corr_kernel.
    """
    d = 2 * r + 1
    b = pl.program_id(0)
    ht = pl.program_id(1)

    dma = pltpu.make_async_copy(
        fm2p_hbm.at[b, pl.ds(ht * H_tile, H_tile + 2 * r), :, :],
        scratch, sem)
    dma.start()
    fm1 = fm1_ref[0]                       # (Ht, W, C)
    dma.wait()

    def body(dy, _):
        slab = scratch[pl.ds(dy, H_tile)]  # (Ht, Wp, C)
        cdy = jax.lax.dot_general(
            fm1, slab, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (Ht, W, Wp) MXU
        for dx in range(d):
            acc = jnp.sum(cdy * band_ref[dx][None], axis=-1) * scale
            out_ref[0, dx * d + dy, :, :] = acc
        return 0

    jax.lax.fori_loop(0, d, body, 0)


@functools.partial(jax.jit, static_argnames=("r", "h_tile", "interpret"))
def local_correlation_pallas_mxu(fm1, fm2, r: int, h_tile: int = 16,
                                 interpret: bool = False):
    """MXU-in-kernel local correlation; same contract/ordering as the others."""
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    scale = float(1.0 / np.sqrt(float(C)))
    h_tile = min(h_tile, H)
    if H % h_tile != 0:
        h_tile = H
    n_htiles = H // h_tile

    Wp = -(-(W + 2 * r) // 8) * 8
    fm2p = jnp.pad(fm2, ((0, 0), (r, r), (r, Wp - W - r), (0, 0)))
    # band[dx, w, v] = 1 iff v == w + dx (the diagonal extraction masks)
    band = (np.arange(Wp)[None, None, :]
            == (np.arange(W)[None, :, None] + np.arange(d)[:, None, None]))
    band = jnp.asarray(band, dtype=jnp.float32)

    kernel = functools.partial(_corr_mxu_kernel, H_tile=h_tile, W=W, r=r,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, d * d, H, W), jnp.float32),
        grid=(B, n_htiles),
        in_specs=[
            pl.BlockSpec((d, W, Wp), lambda b, h: (0, 0, 0),
                         memory_space=pltpu.VMEM),       # band (broadcast)
            pl.BlockSpec(memory_space=pl.ANY),        # fm2p off-chip
            pl.BlockSpec((1, h_tile, W, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d * d, h_tile, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2 * r, Wp, C), fm2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(band, fm2p, fm1)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(fm1.dtype)


# ------------------------------------------- C-on-sublanes forward variant

def _corr_csub_kernel(fm2p_hbm, fm1_ref, out_ref, scratch, sem, *,
                      H_tile, W, r, scale):
    """C-on-sublanes layout (round-2 perf-trace candidate 1).

    fm1 arrives pre-transposed as (1, H_tile, C, W): W sits on lanes and C on
    the sublane-tiled middle dim, so the channel reduction compiles to plain
    vreg adds (C/8 per column) + a 3-stage intra-vreg sublane reduce, instead
    of the ~7-stage cross-lane shuffle chain of _corr_kernel's C-on-lanes
    layout. Trade-off: W=64 uses half the lane width.
    """
    d = 2 * r + 1
    b = pl.program_id(0)
    ht = pl.program_id(1)

    dma = pltpu.make_async_copy(
        fm2p_hbm.at[b, pl.ds(ht * H_tile, H_tile + 2 * r), :, :],
        scratch, sem)
    dma.start()
    fm1 = fm1_ref[0]                        # (H_tile, C, W)
    dma.wait()

    def body(dy, _):
        slab = scratch[pl.ds(dy, H_tile)]   # (H_tile, C, Wl)
        for dx in range(d):                 # static lane slices
            sub = slab[:, :, dx:dx + W]
            acc = jnp.sum((fm1 * sub).astype(jnp.float32), axis=1) * scale
            out_ref[0, dx * d + dy, :, :] = acc
        return 0

    jax.lax.fori_loop(0, d, body, 0)


@functools.partial(jax.jit, static_argnames=("r", "h_tile", "interpret"))
def local_correlation_pallas_csub(fm1, fm2, r: int, h_tile: int = 16,
                                  interpret: bool = False):
    """C-on-sublanes local correlation; same contract/ordering as the others."""
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    scale = float(1.0 / np.sqrt(float(C)))
    h_tile = min(h_tile, H)
    if H % h_tile != 0:
        h_tile = H
    n_htiles = H // h_tile

    fm1_t = jnp.transpose(fm1, (0, 1, 3, 2))            # (B, H, C, W)
    fm2_t = jnp.transpose(fm2, (0, 1, 3, 2))
    Wl = -(-(W + 2 * r) // 128) * 128                   # lane-pad the W dim
    fm2p = jnp.pad(fm2_t, ((0, 0), (r, r), (0, 0), (r, Wl - W - r)))

    kernel = functools.partial(_corr_csub_kernel, H_tile=h_tile, W=W, r=r,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, d * d, H, W), jnp.float32),
        grid=(B, n_htiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),       # fm2p off-chip
            pl.BlockSpec((1, h_tile, C, W), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d * d, h_tile, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2 * r, C, Wl), fm2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fm2p, fm1_t)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(fm1.dtype)


# ---------------------------------------- MXU + rotate-extract (eval path)

@functools.lru_cache(maxsize=None)
def _rot_extract_matrix(Wdim: int, r: int, scale: float) -> np.ndarray:
    """Constant (d·128, 128) band-placement matrix for the pdot extraction.

    Block dv (rows [dv·128, dv·128+128)) routes the strided-roll's parked
    lane (Wdim−1+r−dx) mod 128 to output channel dv·d + (d−1−dx) with value
    ``scale`` — i.e. one 128×128 matmul per dv replaces the scale-multiply +
    constant roll + iota select of the select extraction. Exactly one
    nonzero per column, so the matmul is a pure (scaled) gather on the MXU.
    """
    d = 2 * r + 1
    P = np.zeros((d * 128, 128), np.float32)
    for dv in range(d):
        for dx in range(d):
            P[dv * 128 + (Wdim - 1 + r - dx) % 128, dv * d + (d - 1 - dx)] = scale
    return P


def _corr_rot_kernel(fm2_hbm, *args, H_tile, Wdim, r, scale, pdot=False):
    """MXU banded matmul + ONE strided-rotate band extraction.

    Replaces _corr_mxu_kernel's band-mask reductions (the VPU cost that sank
    that variant end-to-end, docs/perf_trace_r2.md) with a single hardware
    strided lane rotation. fm2 arrives column-REVERSED (the wrapper flips W,
    fused into its pad), so displacement dx of query column w sits at dot
    lane m = (W−1+r) − w − dx; ``pltpu.roll(stride=1, stride_axis=1)``
    right-rotates sublane-row w by w, which cancels the −w and parks dx at
    the CONSTANT lane (W−1+r−dx) mod 128 for every row — one roll where the
    round-2 kernel needed a 6-step masked bit-decomposition of w (measured
    0.82 → 0.10 ms/call at the eval shape). One more static roll places the
    d valid lanes at output channels [dv·d, dv·d+d). Channels-last output,
    dy-major dx-REVERSED order ch = dy·d + (d−1−dx) (NOT the package quirk
    dx·d+dy): the intended consumer is a 1×1 conv whose kernel rows absorb
    the permutation AND the d²→128 zero-pad (see models/cre.py), so no
    XLA-side transpose, slice, or astype pass remains between kernel and
    conv — rot_channel_perm is the single source of truth for the order.

    fm2_hbm:  (B, H, W, C) — columns REVERSED, rows AND width UNPADDED: both
              pads are virtual, so no padded copy of fm2 is ever materialized
              in HBM (was ~78 MB written + re-read per refinement iteration).
              Width: the slab is DMA'd into columns [0, W) of the 128-lane
              scratch whose columns [W, 128) are zeroed ONCE (first grid
              step; the DMA never touches them, and the TPU grid is
              sequential, so they stay zero); out-of-image displacements map
              to lanes [W, W+r) ∪ [128−r, 128), all inside that region.
              Rows: the halo DMA is predicated per tile — edge tiles copy
              only the in-image rows (row offsets into scratch ride the
              untiled leading dim, which is free) and memset the halo rows;
              interior tiles do the plain full-slab copy.
    fm1_ref:  (1, H_tile, W, C)
    out_ref:  (1, H_tile, W, 128) channels-last; lanes d²..127 stay zero

    Two extraction modes after the shared MXU band matmul + strided roll:
      * select (default, f32-exact): scale-multiply, constant roll to park
        the d valid lanes at [dv·d, dv·d+d), disjoint-mask select merge.
      * pdot (``pdot=True``; extra leading ``p_ref`` operand, bf16 output
        only): ONE tiny 128×128 MXU matmul per dv against the constant
        band-placement matrix (:func:`_rot_extract_matrix`, scale folded
        in) + a bf16 add. The main dot emits bf16 directly
        (``preferred_element_type``), so the roll, the matmul and the add
        all run at half VPU width and the scale/roll2/select passes vanish.
        Value contract: for power-of-two ``scale`` (the production C=256 →
        2⁻⁴ case) rounding the f32 accumulator to bf16 before the exact
        power-of-two scale is bit-identical to scaling then rounding; for
        other scales the pre-scale bf16 rounding of the accumulator AND
        the bf16 rounding of the scale inside the placement matrix compound
        — expect the result to differ from select by a couple of bf16 ulps.
    """
    if pdot:
        p_ref, fm1_ref, out_ref, scratch, sem = args
    else:
        fm1_ref, out_ref, scratch, sem = args
    d = 2 * r + 1
    b = pl.program_id(0)
    ht = pl.program_id(1)
    n_ht = pl.num_programs(1)
    H = n_ht * H_tile
    row0 = ht * H_tile

    @pl.when((b == 0) & (ht == 0))
    def _zero_pad_lanes():
        scratch[:, Wdim:, :] = jnp.zeros_like(scratch[:, Wdim:, :])

    if n_ht == 1:
        # single tile: rows [−r, H+r) → copy [0, H) at offset r, zero halos
        scratch[:r, :Wdim, :] = jnp.zeros_like(scratch[:r, :Wdim, :])
        scratch[r + H_tile:, :Wdim, :] = jnp.zeros_like(
            scratch[r + H_tile:, :Wdim, :])
        dma = pltpu.make_async_copy(
            fm2_hbm.at[b, :, :, :], scratch.at[pl.ds(r, H_tile), :Wdim, :],
            sem)
        dma.start()
        fm1 = fm1_ref[0]
        dma.wait()
    else:
        @pl.when(ht == 0)
        def _top():
            scratch[:r, :Wdim, :] = jnp.zeros_like(scratch[:r, :Wdim, :])
            dma = pltpu.make_async_copy(
                fm2_hbm.at[b, pl.ds(0, H_tile + r), :, :],
                scratch.at[pl.ds(r, H_tile + r), :Wdim, :], sem)
            dma.start()
            dma.wait()

        @pl.when(ht == n_ht - 1)
        def _bottom():
            scratch[H_tile + r:, :Wdim, :] = jnp.zeros_like(
                scratch[H_tile + r:, :Wdim, :])
            dma = pltpu.make_async_copy(
                fm2_hbm.at[b, pl.ds(H - H_tile - r, H_tile + r), :, :],
                scratch.at[pl.ds(0, H_tile + r), :Wdim, :], sem)
            dma.start()
            dma.wait()

        @pl.when((ht > 0) & (ht < n_ht - 1))
        def _interior():
            dma = pltpu.make_async_copy(
                fm2_hbm.at[b, pl.ds(row0 - r, H_tile + 2 * r), :, :],
                scratch.at[:, :Wdim, :], sem)
            dma.start()
            dma.wait()

        fm1 = fm1_ref[0]                    # (Ht, W, C)

    acc_dtype = out_ref.dtype

    if pdot:
        def step(dv, acc):
            sub = scratch[pl.ds(dv, H_tile)]    # (Ht, 128, C)
            # x[hi, w, m] = Σc fm1[h, w, c]·fm2[h+dv-r, W-1-m, c]  (MXU,
            # f32 accumulate, rounded to bf16 at the output port);
            # displacement dx ⇔ lane m = (W−1+r)−w−dx
            x = jax.lax.dot_general(fm1, sub, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=acc_dtype)
            # strided roll: right-rotate sublane-row w by w cancels the −w,
            # parking dx at the constant lane (W−1+r−dx) mod 128
            x = pltpu.roll(x, shift=0, axis=2, stride=1, stride_axis=1)
            # band placement as a second (tiny) MXU matmul: one nonzero per
            # column routes parked lane → channel dv·d+(d−1−dx) and applies
            # the scale; all other lanes multiply into zero, so the merge
            # across dv is a plain bf16 add (bands are disjoint)
            y = jax.lax.dot_general(x, p_ref[pl.ds(dv * 128, 128)],
                                    (((2,), (0,)), ((), ())),
                                    preferred_element_type=acc_dtype)
            return acc + y

        acc = jax.lax.fori_loop(0, d, step,
                                jnp.zeros((H_tile, Wdim, 128), acc_dtype))
        out_ref[0] = acc
        return

    lane = jax.lax.broadcasted_iota(jnp.int32, (H_tile, Wdim, 128), 2)

    def step(dv, acc):
        sub = scratch[pl.ds(dv, H_tile)]    # (Ht, 128, C)
        # x[hi, w, m] = Σc fm1[h, w, c]·fm2[h+dv-r, W-1-m, c]     (MXU);
        # displacement dx ⇔ source col j = w+dx−r ⇔ lane m = (W−1+r)−w−dx
        x = jax.lax.dot_general(fm1, sub, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        x = x * scale
        # ONE strided roll: right-rotate sublane-row w by w cancels the −w,
        # parking dx at the constant lane (W−1+r−dx) mod 128 for every row
        x = pltpu.roll(x, shift=0, axis=2, stride=1, stride_axis=1)
        # place the d valid lanes at channels [dv·d, dv·d+d), dx reversed
        # (ch = dv·d + d−1−dx); the keep-masks are disjoint across dv, so
        # the merge is a pure select (no adds)
        x = pltpu.roll(x, shift=(dv * d + d - Wdim - r) % 128, axis=2)
        keep = (lane >= dv * d) & (lane < dv * d + d)
        return jnp.where(keep, x.astype(acc_dtype), acc)

    acc = jax.lax.fori_loop(0, d, step,
                            jnp.zeros((H_tile, Wdim, 128), acc_dtype))
    out_ref[0] = acc


def _corr_rot2_kernel(fm2_hbm, fm1_ref, out_ref, scratch, sem, *,
                      H_tile, Wdim, r, scale):
    """Two-slices-per-128-lanes variant of :func:`_corr_rot_kernel`.

    At W=64 the rot kernel streams 64-row matmuls against 128-lane weights —
    HALF the systolic array's row dimension idle and 54 of 128 lanes zero
    pad (the round-3 profile's "128 lanes computed, 11 used" structural
    waste). Here slice PAIRS pack along the lane/row axis: fm1/fm2 arrive as
    (B/2, H, 2W=128, C) with slice A in columns [0, W) and slice B in
    [W, 2W), each column-reversed WITHIN its half. Every MXU step is then a
    full 128-row × C × 128-lane contraction — twice the stream per weight
    load, no zero lanes.

    The strided-roll extraction survives packing because 2W ≡ 0 (mod 128):
    slice B's query row (W+w) and its source lane offset (+W) cancel in the
    rotate, parking displacement dx at the SAME constant lane (W−1−dx) as
    slice A. What packing breaks is the zero-pad trick for out-of-image
    displacements — a right-edge query of slice A now reads slice B's
    columns instead of zeros — so extraction adds a per-(row, lane) validity
    mask (0 ≤ w+dx < W), which the keep-select was already paying for.
    """
    d = 2 * r + 1
    b = pl.program_id(0)
    ht = pl.program_id(1)
    n_ht = pl.num_programs(1)
    H = n_ht * H_tile
    row0 = ht * H_tile

    if n_ht == 1:
        scratch[:r] = jnp.zeros_like(scratch[:r])
        scratch[r + H_tile:] = jnp.zeros_like(scratch[r + H_tile:])
        dma = pltpu.make_async_copy(
            fm2_hbm.at[b, :, :, :], scratch.at[pl.ds(r, H_tile), :, :], sem)
        dma.start()
        fm1 = fm1_ref[0]
        dma.wait()
    else:
        @pl.when(ht == 0)
        def _top():
            scratch[:r] = jnp.zeros_like(scratch[:r])
            dma = pltpu.make_async_copy(
                fm2_hbm.at[b, pl.ds(0, H_tile + r), :, :],
                scratch.at[pl.ds(r, H_tile + r), :, :], sem)
            dma.start()
            dma.wait()

        @pl.when(ht == n_ht - 1)
        def _bottom():
            scratch[H_tile + r:] = jnp.zeros_like(scratch[H_tile + r:])
            dma = pltpu.make_async_copy(
                fm2_hbm.at[b, pl.ds(H - H_tile - r, H_tile + r), :, :],
                scratch.at[pl.ds(0, H_tile + r), :, :], sem)
            dma.start()
            dma.wait()

        @pl.when((ht > 0) & (ht < n_ht - 1))
        def _interior():
            dma = pltpu.make_async_copy(
                fm2_hbm.at[b, pl.ds(row0 - r, H_tile + 2 * r), :, :],
                scratch.at[:, :, :], sem)
            dma.start()
            dma.wait()

        fm1 = fm1_ref[0]                    # (Ht, 2W, C)

    lane = jax.lax.broadcasted_iota(jnp.int32, (H_tile, 2 * Wdim, 128), 2)
    # query column within the slice: packed row index mod W (W is a power of
    # two at the shapes this kernel accepts)
    w_col = jax.lax.broadcasted_iota(jnp.int32, (H_tile, 2 * Wdim, 128), 1) \
        & (Wdim - 1)
    acc_dtype = out_ref.dtype

    def step(dv, acc):
        sub = scratch[pl.ds(dv, H_tile)]    # (Ht, 128, C)
        x = jax.lax.dot_general(fm1, sub, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        x = x * scale
        x = pltpu.roll(x, shift=0, axis=2, stride=1, stride_axis=1)
        x = pltpu.roll(x, shift=(dv * d + d - Wdim - r) % 128, axis=2)
        keep = (lane >= dv * d) & (lane < dv * d + d)
        # ch = dv·d + (d−1−(dx+r)) ⇒ dx = d−1−r − (ch − dv·d); out-of-image
        # source columns must read as ZERO correlation (the unpacked kernel
        # gets this from zeroed pad lanes; packed, they alias the partner
        # slice's data and are masked here instead)
        dx = (d - 1 - r) - (lane - dv * d)
        src = w_col + dx
        keep &= (src >= 0) & (src < Wdim)
        return jnp.where(keep, x.astype(acc_dtype), acc)

    acc = jax.lax.fori_loop(0, d, step,
                            jnp.zeros((H_tile, 2 * Wdim, 128), acc_dtype))
    out_ref[0] = acc


def _pack_pairs(a):
    """(B, H, W, C) → (B/2, H, 2W, C): consecutive slice pairs side by side."""
    B, H, W, C = a.shape
    return a.reshape(B // 2, 2, H, W, C).transpose(0, 2, 1, 3, 4) \
        .reshape(B // 2, H, 2 * W, C)


def _unpack_pairs(a):
    """Inverse of :func:`_pack_pairs`."""
    Bh, H, W2, C = a.shape
    return a.reshape(Bh, H, 2, W2 // 2, C).transpose(0, 2, 1, 3, 4) \
        .reshape(Bh * 2, H, W2 // 2, C)


def local_correlation_pallas_rot(fm1, fm2, r: int, h_tile: int = 32,
                                 interpret: bool = False,
                                 out_f32: bool = False,
                                 fm2_reversed: bool = False):
    """MXU+rotate local correlation → (B, H, W, 128), dy-major dx-reversed.

    Thin non-jit dispatcher: the RPNET_ROT_PACK / RPNET_ROT_EXTRACT env
    vars are resolved HERE, per call, and passed to the jitted
    implementation as static arguments — so toggling them between calls
    retraces correctly instead of silently reusing the first-traced mode
    (round-4 advisor finding). When ``RPNET_ROT_EXTRACT=pdot`` is set
    explicitly but cannot take effect (f32 output, or RPNET_ROT_PACK
    shadowing it), a one-time warning says so. See the implementation's
    docstring for kernel semantics and the measured numbers.
    """
    pack = (fm1.shape[0] % 2 == 0 and 2 * fm1.shape[2] == 128
            and os.environ.get("RPNET_ROT_PACK", "0") == "1")
    mode = os.environ.get("RPNET_ROT_EXTRACT", "")
    out_dtype = jnp.float32 if out_f32 else fm1.dtype
    pdot = mode == "pdot" and out_dtype == jnp.bfloat16 and not pack
    if mode == "pdot" and not pdot:
        _warn_pdot_ignored("RPNET_ROT_PACK=1 takes precedence" if pack else
                           "output dtype is f32 (the bf16-width value "
                           "contract does not hold)")
    return _local_correlation_pallas_rot_impl(
        fm1, fm2, r, h_tile=h_tile, interpret=interpret, out_f32=out_f32,
        fm2_reversed=fm2_reversed, pack=pack, pdot=pdot)


@functools.lru_cache(maxsize=None)
def _warn_pdot_ignored(reason: str) -> None:
    import warnings
    warnings.warn(
        f"RPNET_ROT_EXTRACT=pdot requested but ignored: {reason}; "
        "falling back to the select extraction.", stacklevel=3)


@functools.partial(jax.jit, static_argnames=("r", "h_tile", "interpret",
                                             "out_f32", "fm2_reversed",
                                             "pack", "pdot"))
def _local_correlation_pallas_rot_impl(fm1, fm2, r: int, h_tile: int = 32,
                                       interpret: bool = False,
                                       out_f32: bool = False,
                                       fm2_reversed: bool = False,
                                       pack: bool = False,
                                       pdot: bool = False):
    """MXU+rotate local correlation → (B, H, W, 128), dy-major dx-reversed.

    out[..., dy·d + (d−1−dx)] = local_correlation(...)[..., dx·d+dy] (d=2r+1);
    lanes (2r+1)²..127 are zero. Use :func:`rot_to_quirk` to recover the
    package-standard layout, or fold the permutation into the consumer's
    weights (models/cre.py does — rot_channel_perm is the single source of
    truth for the order). Defaults to storing in fm1's dtype (the
    f32 MXU accumulation is rounded once at the final select) — on the bf16
    eval path this halves the store and removes the downstream astype.

    Measured at the eval CRE shape (32×64²×256, r=5, v5e, bf16):
    3.9 ms incl. XLA fixups vs 6.2 ms for local_correlation_pallas
    (bench_tools/corr_sweep.py `rotmxu` rows). f32 inputs run the MXU at
    default precision (bf16 products) — use the VPU kernel where f32
    product exactness matters (training keeps it).
    """
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    if W + 2 * r > 128 or d * d > 128:
        raise ValueError("rotate variant assumes W+2r <= 128 and (2r+1)² <= 128")
    scale = float(1.0 / np.sqrt(float(C)))
    h_tile = min(h_tile, H)
    if H % h_tile != 0:
        h_tile = H
    out_dtype = jnp.float32 if out_f32 else fm1.dtype

    # no padded copy at all — both pads are virtual in-kernel; columns
    # REVERSED so the strided roll's right-rotation extracts the band (see
    # _corr_rot_kernel). ``fm2_reversed=True`` says the caller already flipped
    # (models/cre.py runs the w_q conv on flipped input with flipped taps so
    # the flip fuses into the conv instead of materializing a reverse pass)
    fm2p = fm2 if fm2_reversed else fm2[:, :, ::-1, :]

    # 2-slices-per-128-lanes packing (round-4 A/B, docs/perf_trace_r4.md):
    # when a slice pair exactly fills the lane width, pack pairs side by side
    # so every MXU step streams 128 rows against 128 live lanes
    # (_corr_rot2_kernel). Verdict: NEGATIVE end-to-end — kernel-only time is
    # a wash (the kernel is extraction/DMA-bound, not MXU-stream-bound) and
    # the XLA-side pair transposes cost ~0.8 ms/call, so bench drops 11.1 →
    # 10.9 eps/s. Kept opt-in (RPNET_ROT_PACK=1, resolved by the dispatcher
    # above into the static ``pack`` arg) as the measured record.
    if pack:
        kernel2 = functools.partial(_corr_rot2_kernel, H_tile=h_tile, Wdim=W,
                                    r=r, scale=scale)
        out = pl.pallas_call(
            kernel2,
            out_shape=jax.ShapeDtypeStruct((B // 2, H, 2 * W, 128), out_dtype),
            grid=(B // 2, H // h_tile),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),    # packed fm2 off-chip
                pl.BlockSpec((1, h_tile, 2 * W, C), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h_tile, 2 * W, 128),
                                   lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((h_tile + 2 * r, 2 * W, C), fm2.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(_pack_pairs(fm2p), _pack_pairs(fm1))
        return _unpack_pairs(out)

    # pdot extraction (round-4 continuation, docs/perf_trace_r4.md "pdot"):
    # replace the per-dv scale/roll2/select VPU passes with a constant
    # 128×128 MXU matmul and run the whole extraction at bf16 width (see
    # _corr_rot_kernel). Measured bit-identical to select on the v5e at the
    # eval shape and a WASH in time (1.32 ms/call both ways with a clean
    # N=200 harness — the extraction costs only ~0.19 ms of the call, and
    # the pdot matmuls save about what their operand setup costs), so the
    # proven select path stays default; RPNET_ROT_EXTRACT=pdot opts in
    # (bf16 output only — the bf16-width contract does not hold for f32;
    # resolved by the dispatcher above into the static ``pdot`` arg).
    if pdot:
        d2 = d
        pmat = jnp.asarray(_rot_extract_matrix(W, r, scale), dtype=out_dtype)
        kernel = functools.partial(_corr_rot_kernel, H_tile=h_tile, Wdim=W,
                                   r=r, scale=scale, pdot=True)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, H, W, 128), out_dtype),
            grid=(B, H // h_tile),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),    # fm2p off-chip
                pl.BlockSpec((d2 * 128, 128), lambda b, h: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h_tile, W, C), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, h_tile, W, 128),
                                   lambda b, h: (b, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((h_tile + 2 * r, 128, C), fm2.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(fm2p, pmat, fm1)

    kernel = functools.partial(_corr_rot_kernel, H_tile=h_tile, Wdim=W,
                               r=r, scale=scale)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W, 128), out_dtype),
        grid=(B, H // h_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # fm2p off-chip
            pl.BlockSpec((1, h_tile, W, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_tile, W, 128), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2 * r, 128, C), fm2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(fm2p, fm1)


# Back-compat shim: callers used to clear the jit cache to force a re-read
# of the mode env vars; the dispatcher now resolves them per call (they are
# static args of the impl), so this only forwards to the impl's cache.
local_correlation_pallas_rot._clear_cache = (
    _local_correlation_pallas_rot_impl._clear_cache)


@functools.lru_cache(maxsize=None)
def pallas_rot_vmappable(r: int, interpret: bool = False,
                         fm2_reversed: bool = False):
    """local_correlation_pallas_rot composed with vmap: the episode axis
    folds into the kernel's batch grid axis (one launch), mirroring
    pallas_correlation_trainable's rule — what --batch-episodes needs (the
    default pallas vmap rule rejects memory_space=ANY operands)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def f(fm1, fm2):
        return local_correlation_pallas_rot(fm1, fm2, r, interpret=interpret,
                                            fm2_reversed=fm2_reversed)

    @f.def_vmap
    def _rule(axis_size, in_batched, fm1, fm2):  # noqa: ANN001
        b1, b2 = in_batched
        if not b1:
            fm1 = jnp.broadcast_to(fm1[None], (axis_size,) + fm1.shape)
        if not b2:
            fm2 = jnp.broadcast_to(fm2[None], (axis_size,) + fm2.shape)
        E, B = fm1.shape[:2]
        out = f(fm1.reshape((E * B,) + fm1.shape[2:]),
                fm2.reshape((E * B,) + fm2.shape[2:]))
        return out.reshape((E, B) + out.shape[1:]), True

    return f


def rot_channel_perm(r: int) -> np.ndarray:
    """perm such that rot_out[..., perm] == quirk-ordered correlation.

    perm[dx·d+dy] = dy·d + (d−1−dx) — dy-major, dx reversed (the order the
    strided-roll extraction produces naturally); also the row scatter for
    folding the layout into a consumer's weight matrix:
    w128[perm[q]] = w121[q]."""
    d = 2 * r + 1
    dx, dy = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
    return (dy * d + (d - 1 - dx)).reshape(-1)


def rot_to_quirk(out128, r: int):
    """(B, H, W, 128) rot-kernel output → (B, H, W, (2r+1)²) quirk order."""
    return out128[..., rot_channel_perm(r)]


# ------------------------------------------------------- backward kernel

def _corr_bwd_kernel(gp5_hbm, fm1p_hbm, fm2p_hbm, dfm1_ref, dfm2_ref,
                     fm1s, fm2s, g1s, g2s, sg1, sg2, sem1, sem2, *,
                     H_tile, W, r, scale):
    """Grid step (b, h_tile): BOTH input grads of the local correlation.

    The backward has the same local-shift structure as the forward:
      dfm1[p, c] = Σ_{dy,dx} g[p, ch(dx,dy)] · fm2p[p + (dy,dx), c]
      dfm2[q, c] = Σ_{dy,dx} g[q - (dy-r,dx-r), ch] · fm1[q - (dy-r,dx-r), c]
    (the dfm2 form is GATHERED — no scatter-adds). Both are lane-parallel
    FMAs over C; the XLA formulation is ~242 full-HBM passes, this kernel
    reads each operand once per tile.

    Layout trick: g arrives as ONE padded array (B·d_dy, H+2r, Wp2, 128) —
    the (b, dy) scalar fuses on dim 0 (Mosaic rejects 5-D HBM slices with a
    dynamic dim-1 index) and the d_dx channel group pads to a full 128-lane
    tile (DMA slice widths must be lane-aligned). Per-dy row windows are
    DMA'd inside the fori loop (SINGLE-buffered: a dynamic slot index into
    double-buffered scratch made Mosaic emit a 5 GB program); channel
    extraction in-kernel is then a STATIC dx lane index. The fm1/fm2 halo
    slabs load once per tile.

    fm1s/fm2s: (H_tile+2r, Wp, C) VMEM scratch
    g1s/g2s:   (H_tile, Wp2, 128) per-dy g rows (dfm1 / row-shifted dfm2)
    """
    d = 2 * r + 1
    b = pl.program_id(0)
    ht = pl.program_id(1)
    row0 = ht * H_tile

    fdma1 = pltpu.make_async_copy(
        fm1p_hbm.at[b, pl.ds(row0, H_tile + 2 * r), :, :], fm1s, sem1)
    fdma2 = pltpu.make_async_copy(
        fm2p_hbm.at[b, pl.ds(row0, H_tile + 2 * r), :, :], fm2s, sem2)
    fdma1.start()
    fdma2.start()
    fdma1.wait()
    fdma2.wait()

    dfm1_ref[0] = jnp.zeros_like(dfm1_ref[0])
    dfm2_ref[0] = jnp.zeros_like(dfm2_ref[0])

    def body(dy, _):
        g1dma = pltpu.make_async_copy(
            gp5_hbm.at[b * d + dy, pl.ds(row0 + r, H_tile), :, :], g1s, sg1)
        g2dma = pltpu.make_async_copy(
            gp5_hbm.at[b * d + dy, pl.ds(row0 + 2 * r - dy, H_tile), :, :],
            g2s, sg2)
        g1dma.start()
        g2dma.start()
        g1dma.wait()
        g2dma.wait()
        g1 = g1s                             # (Ht, Wp2, 128) — g rows, col pad r
        g2 = g2s                             # (Ht, Wp2, 128) — row-shifted
        fm2w = fm2s[pl.ds(dy, H_tile)]       # (Ht, Wp, C)
        fm1w = fm1s[pl.ds(2 * r - dy, H_tile)]
        acc1 = jnp.zeros(dfm1_ref.shape[1:], jnp.float32)
        acc2 = jnp.zeros(dfm2_ref.shape[1:], jnp.float32)
        for dx in range(d):                  # static (lane index must be)
            # keep g slices 3-D (Ht, W, 1): a scalar `dx` index drops to 2-D,
            # whose (sublane, lane) relayout + re-broadcast explodes generated
            # code 121-fold; the 1-lane slice lane-broadcasts natively
            acc1 = acc1 + (g1[:, r:r + W, dx:dx + 1]
                           * fm2w[:, dx:dx + W, :]).astype(jnp.float32)
            acc2 = acc2 + (g2[:, 2 * r - dx:2 * r - dx + W, dx:dx + 1]
                           * fm1w[:, 2 * r - dx:2 * r - dx + W, :]
                           ).astype(jnp.float32)
        dfm1_ref[0] = dfm1_ref[0] + acc1
        dfm2_ref[0] = dfm2_ref[0] + acc2
        return 0

    jax.lax.fori_loop(0, d, body, 0)
    dfm1_ref[0] = dfm1_ref[0] * scale
    dfm2_ref[0] = dfm2_ref[0] * scale


@functools.partial(jax.jit, static_argnames=("r", "h_tile", "interpret"))
def local_correlation_pallas_bwd(g, fm1, fm2, r: int, h_tile: int = 8,
                                 interpret: bool = False):
    """Pallas backward: g (B, H, W, (2r+1)²) → (dfm1, dfm2) like _corr_bwd.

    Channel order is the package-wide dx-major quirk (ch = dx·d + dy); the
    kernel wants dy-major 5-D inputs, so g is reordered here (one XLA
    transpose — cheap next to the 242 shifted products it replaces).
    """
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    scale = float(1.0 / np.sqrt(float(C)))
    h_tile = min(h_tile, H)
    if H % h_tile != 0:
        h_tile = H
    n_htiles = H // h_tile

    # ONE sublane-aligned padded width shared by the fm slabs and the g
    # rows — the kernel's column arithmetic assumes identical layouts
    Wp = -(-(W + 2 * r) // 8) * 8
    fm1p = jnp.pad(fm1, ((0, 0), (r, r), (r, Wp - W - r), (0, 0)))
    fm2p = jnp.pad(fm2, ((0, 0), (r, r), (r, Wp - W - r), (0, 0)))

    # (B, H, W, dx, dy) → dy-major, (B, d_dy) fused on dim 0, rows/cols
    # padded r each side (dfm2 reads padded row qy+2r−dy / col qx+2r−dx;
    # dfm1 reads the same array at row offset +r), d_dx padded to a full
    # 128-lane tile (DMA slice widths must be lane-aligned)
    g_dyM = jnp.transpose(g.reshape(B, H, W, d, d), (0, 4, 1, 2, 3))
    gp5 = jnp.pad(g_dyM, ((0, 0), (0, 0), (r, r), (r, Wp - W - r),
                          (0, 128 - d)))
    gp5 = gp5.reshape(B * d, H + 2 * r, Wp, 128)

    kernel = functools.partial(_corr_bwd_kernel, H_tile=h_tile, W=W, r=r,
                               scale=scale)
    dfm1, dfm2 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((B, h_tile * n_htiles, W, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, h_tile * n_htiles, W, C), jnp.float32)),
        grid=(B, n_htiles),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec((1, h_tile, W, C), lambda b, h: (b, h, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, h_tile, W, C), lambda b, h: (b, h, 0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2 * r, Wp, C), fm1.dtype),
            pltpu.VMEM((h_tile + 2 * r, Wp, C), fm2.dtype),
            pltpu.VMEM((h_tile, Wp, 128), g.dtype),
            pltpu.VMEM((h_tile, Wp, 128), g.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(gp5, fm1p, fm2p)
    return dfm1.astype(fm1.dtype), dfm2.astype(fm2.dtype)


# ---------------------------------------------------------------- custom VJP

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def local_correlation_pallas_vjp(fm1, fm2, r: int):
    """Differentiable wrapper: Pallas forward, analytic XLA backward.

    The backward of the local correlation has the same local-shift structure
    as the forward:
      dfm1[p, c] = Σ_d g[p, d] · fm2[p + δ(d), c] · scale
      dfm2[q, c] = Σ_d g[q - δ(d), d] · fm1[q - δ(d), c] · scale
    computed as (2r+1)² shifted products in XLA (these fuse well; the forward
    is the bandwidth-critical piece).
    """
    return local_correlation_pallas(fm1, fm2, r)


def _corr_fwd(fm1, fm2, r):
    return local_correlation_pallas(fm1, fm2, r), (fm1, fm2)


def _corr_bwd(r, res, g):
    fm1, fm2 = res
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    scale = 1.0 / np.sqrt(float(C))
    g = g.astype(jnp.float32)
    fm2p = jnp.pad(fm2, ((0, 0), (r, r), (r, r), (0, 0)))
    # dfm1 = Σ_d g_d · shift_d(fm2)
    dfm1 = jnp.zeros_like(fm1, dtype=jnp.float32)
    for dx in range(d):                  # channel order: dx slow (quirk)
        for dy in range(d):
            sub = fm2p[:, dy:dy + H, dx:dx + W, :]
            dfm1 = dfm1 + g[..., dx * d + dy][..., None] * sub
    # dfm2 = Σ_d shift_{-d}(g_d · fm1): accumulate into a padded buffer
    dfm2p = jnp.zeros((B, H + 2 * r, W + 2 * r, C), jnp.float32)
    for dx in range(d):
        for dy in range(d):
            contrib = g[..., dx * d + dy][..., None] * fm1
            dfm2p = dfm2p.at[:, dy:dy + H, dx:dx + W, :].add(contrib)
    dfm2 = dfm2p[:, r:r + H, r:r + W, :]
    return (dfm1 * scale).astype(fm1.dtype), (dfm2 * scale).astype(fm2.dtype)


local_correlation_pallas_vjp.defvjp(_corr_fwd, _corr_bwd)


# ------------------------------------------------- trainable + vmappable

@functools.lru_cache(maxsize=None)
def pallas_correlation_trainable(r: int, interpret: bool = False,
                                 forward: str = "pallas"):
    """The Pallas correlation as a function that composes with BOTH vmap and
    reverse-mode autodiff — what the trainer needs (it vmaps episodes and
    differentiates, net/rp_net.py:283's CRE call under the batch loop).

    Structure matters: custom_vjp OUTSIDE, custom_vmap INSIDE the forward.
      * vmap(f): custom_vjp batches by vmapping its fwd; the fwd's
        custom_vmap rule FOLDS the episode axis into the kernel's batch grid
        axis (one kernel launch, no per-episode dispatch) — recursing through
        itself so arbitrarily nested vmaps keep folding;
      * grad(f): custom_vjp never linearizes the fwd (custom_vmap has no
        transpose rule — wrapping the other way fails), and the backward is
        the analytic shifted-products XLA formulation (_corr_bwd).
    Verified bit-exact vs the XLA formulation under jit(grad(vmap(·))).
    """
    from jax import custom_batching

    def _rot_quirk(fm1, fm2, r, interpret=False):
        # MXU+rotate forward (the eval kernel) for TRAINING (VERDICT r3
        # item 7): the training contract is quirk-order (B, H, W, d²), so the
        # rot layout is permuted back here (at eval the permutation folds
        # into the consumer conv's weights instead — models/cre.py). The
        # backward is unchanged (it receives quirk-order cotangents).
        # Precision note: f32 inputs run the MXU at default (bf16-product)
        # precision — same class as the default banded-MXU backward.
        out = local_correlation_pallas_rot(fm1, fm2, r, interpret=interpret)
        return rot_to_quirk(out, r)

    fwd_impl = {"csub": local_correlation_pallas_csub,
                "pallas_mxu": local_correlation_pallas_mxu,
                "rot": _rot_quirk,
                }.get(forward, local_correlation_pallas)

    @custom_batching.custom_vmap
    def fwd_fn(fm1, fm2):
        return fwd_impl(fm1, fm2, r, interpret=interpret)

    @fwd_fn.def_vmap
    def _rule(axis_size, in_batched, fm1, fm2):  # noqa: ANN001
        b1, b2 = in_batched
        if not b1:
            fm1 = jnp.broadcast_to(fm1[None], (axis_size,) + fm1.shape)
        if not b2:
            fm2 = jnp.broadcast_to(fm2[None], (axis_size,) + fm2.shape)
        E, B = fm1.shape[:2]
        out = fwd_fn(fm1.reshape((E * B,) + fm1.shape[2:]),
                     fm2.reshape((E * B,) + fm2.shape[2:]))
        return out.reshape((E, B) + out.shape[1:]), True

    @custom_batching.custom_vmap
    def bwd_fn(g, fm1, fm2):
        return local_correlation_pallas_bwd(g, fm1, fm2, r, interpret=interpret)

    @bwd_fn.def_vmap
    def _bwd_rule(axis_size, in_batched, g, fm1, fm2):  # noqa: ANN001
        args = []
        for x, b in zip((g, fm1, fm2), in_batched):
            if not b:
                x = jnp.broadcast_to(x[None], (axis_size,) + x.shape)
            args.append(x.reshape((-1,) + x.shape[2:]))
        d1, d2 = bwd_fn(*args)
        E = axis_size
        return (d1.reshape((E, -1) + d1.shape[1:]),
                d2.reshape((E, -1) + d2.shape[1:])), (True, True)

    @jax.custom_vjp
    def f(fm1, fm2):
        return fwd_fn(fm1, fm2)

    def f_fwd(fm1, fm2):
        return fwd_fn(fm1, fm2), (fm1, fm2)

    def f_bwd(res, g):
        import os

        from rpnet_tpu.ops.correlation import local_correlation_mxu_bwd

        fm1, fm2 = res
        impl = os.environ.get("RPNET_CORR_BWD")
        on_tpu = jax.default_backend() == "tpu"
        if impl == "mxu" or (impl is None and on_tpu):
            # banded-matmul backward (ops/correlation.py): both grads as
            # per-dy MXU contractions. Measured at the eval CRE shape
            # (32×64²×256, r=5, v5e): 13.8 ms vs 23.0 ms Pallas vs 227 ms
            # shifted-XLA (bench_tools/corr_sweep.py).
            return local_correlation_mxu_bwd(g, fm1, fm2, r)
        if impl == "pallas" or (impl is None and interpret):
            # Pallas backward: one pass per tile instead of ~242 shifted
            # full-HBM XLA ops (the custom_vmap rule folds episode axes into
            # the kernel batch grid, mirroring the forward)
            return bwd_fn(g, fm1, fm2)
        return _corr_bwd(r, res, g)

    f.defvjp(f_fwd, f_bwd)
    return f


def local_correlation_auto(fm1, fm2, r: int):
    """Dispatch to the best implementation.

    Measured END-TO-END in the real episode program on v5e (32 slices @256²,
    U-Net backbone, 10 refinement iterations — the honest benchmark; isolated
    fori_loop micro-benchmarks mislead here because XLA hoists parts of the
    standalone correlation):

      * XLA shifted-products: 790 ms/episode
      * MXU banded-matmul:    345 ms/episode
      * THIS Pallas kernel:   337 ms/episode   ← default on TPU

    Identical outputs (bit-exact vs XLA on TPU). Off-TPU (CPU tests) the XLA
    formulation is used; RPNET_CORR_IMPL=xla|pallas|mxu|csub overrides for
    experiments.
    """
    import os

    impl = os.environ.get("RPNET_CORR_IMPL")
    on_tpu = jax.default_backend() == "tpu"
    if impl is None:
        impl = "pallas" if on_tpu else "xla"
    if impl in ("pallas", "csub", "pallas_mxu", "rot") and on_tpu:
        # differentiable AND vmappable (training vmaps episodes); "csub" uses
        # the C-on-sublanes forward, "pallas_mxu" the MXU-in-kernel banded
        # forward, "rot" the MXU+rotate eval kernel (quirk-permuted back),
        # all with the same backward
        return pallas_correlation_trainable(r, forward=impl)(fm1, fm2)
    if impl == "mxu":
        from rpnet_tpu.ops.correlation import local_correlation_mxu
        return local_correlation_mxu(fm1, fm2, r)
    if impl == "fake":
        # timing-attribution stub (WRONG VALUES): a near-free stand-in that
        # keeps both inputs alive (so XLA can't DCE the w_k/w_q convs) —
        # the episode-time delta vs "pallas" isolates the kernel's cost
        d = 2 * r + 1
        m = (jnp.mean(fm1, axis=-1) + jnp.mean(fm2, axis=-1))[..., None]
        return jnp.broadcast_to(m, fm1.shape[:3] + (d * d,))
    return _xla_local_correlation(fm1, fm2, r)
