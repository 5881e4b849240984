"""Sweep local-correlation kernel variants at the real episode shape.

Usage: python bench_tools/corr_sweep.py
Shape: B=32 query slices, 64x64 @ C=256 (U-Net d4 of a 256 episode), r=5.

Variants:
  * pallas (current default) at several h_tiles
  * pallas-swapped: dx outer/static with the lane-rotation hoisted out of the
    dy loop (121 -> 11 rotations) — candidate from docs/perf_trace_r1.md #1
  * mxu banded-matmul, f32 and bf16 inputs
  * XLA shifted products
"""

import functools
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpnet_tpu.ops.correlation import local_correlation, local_correlation_mxu
from rpnet_tpu.ops.pallas.correlation import (local_correlation_pallas,
                                              local_correlation_pallas_csub,
                                              local_correlation_pallas_mxu)


# ------------------------------------------------- swapped-loop variant

def _corr_kernel_swapped(fm2p_hbm, fm1_ref, out_ref, scratch, rot_ref, sem, *,
                         H_tile, W, r, scale):
    """dx outer/static: the lane-rotation happens once per dx (11 slab copies
    into rot_ref) instead of once per (dx, dy) pair (121 rotations); the dy
    loop then dynamic-slices rot_ref on its untiled dim 0 (allowed)."""
    d = 2 * r + 1
    b = pl.program_id(0)
    ht = pl.program_id(1)

    dma = pltpu.make_async_copy(
        fm2p_hbm.at[b, pl.ds(ht * H_tile, H_tile + 2 * r), :, :],
        scratch, sem)
    dma.start()
    fm1 = fm1_ref[0]
    dma.wait()

    for dx in range(d):                     # static; rotate ONCE per dx
        rot_ref[...] = scratch[:, dx:dx + W, :]     # (H_tile+2r, W, C)

        def body(dy, _):
            sub = rot_ref[pl.ds(dy, H_tile)]        # untiled-dim slice: free
            acc = jnp.sum((fm1 * sub).astype(jnp.float32), axis=-1) * scale
            out_ref[0, dx * d + dy, :, :] = acc
            return 0

        jax.lax.fori_loop(0, d, body, 0)


@functools.partial(jax.jit, static_argnames=("r", "h_tile"))
def corr_swapped(fm1, fm2, r: int, h_tile: int = 16):
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    scale = float(1.0 / np.sqrt(float(C)))
    h_tile = min(h_tile, H)
    if H % h_tile != 0:
        h_tile = H
    n_htiles = H // h_tile
    Wp = -(-(W + 2 * r) // 8) * 8
    fm2p = jnp.pad(fm2, ((0, 0), (r, r), (r, Wp - W - r), (0, 0)))
    kernel = functools.partial(_corr_kernel_swapped, H_tile=h_tile, W=W, r=r,
                               scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, d * d, H, W), jnp.float32),
        grid=(B, n_htiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, h_tile, W, C), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d * d, h_tile, W), lambda b, h: (b, 0, h, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_tile + 2 * r, Wp, C), fm2.dtype),
            pltpu.VMEM((h_tile + 2 * r, W, C), fm2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(fm2p, fm1)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(fm1.dtype)


# ------------------------------------------- MXU + masked-rotate variant

def _corr_rot_kernel(ft2p_hbm, ft1_ref, out_ref, scratch, sem, *,
                     W_tile, Hdim, r, scale):
    """MXU banded matmul + log2-masked-rotate band extraction.

    Operates in (B, W, H, C)-transposed space: the fori shift `du` is the
    ORIGINAL horizontal displacement dx, so each loop step's (2r+1) band
    values land on lane-contiguous output channels du*d+dy (the package's
    dx-major quirk) — one static roll + select per step instead of the
    mask-reduce that sank local_correlation_pallas_mxu.

    ft2p_hbm: (B, W+2r, 128, C) — dim2 = original H padded [r, r+H), zeros
              elsewhere (the matmul N dim, lane-aligned at 128)
    ft1_ref:  (1, W_tile, Hdim, C)
    out_ref:  (1, W_tile, Hdim, 128) channels-last, lanes d²..127 stay zero
    """
    d = 2 * r + 1
    b = pl.program_id(0)
    wt = pl.program_id(1)

    dma = pltpu.make_async_copy(
        ft2p_hbm.at[b, pl.ds(wt * W_tile, W_tile + 2 * r), :, :],
        scratch, sem)
    dma.start()
    ft1 = ft1_ref[0]                        # (Wt, H, C)
    dma.wait()

    # h-dependent left-rotate masks: bit k of the sublane index h of cdy
    h_idx = jax.lax.broadcasted_iota(jnp.int32, (W_tile, Hdim, 128), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (W_tile, Hdim, 128), 2)
    nbits = max(1, (Hdim - 1).bit_length())
    bitmask = [(h_idx >> k) & 1 == 1 for k in range(nbits)]
    acc_dtype = out_ref.dtype

    def step(du, acc):
        sub = scratch[pl.ds(du, W_tile)]    # (Wt, 128, C)
        # cdy[wi, h, j] = Σc fm1[h, w, c]·fm2[j-r, w+du-r, c]   (MXU)
        x = jax.lax.dot_general(ft1, sub, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        x = x * scale
        # rotate lanes left by h (bit-decomposed): x[wi, h, dy] = cdy[wi, h, h+dy]
        # (rolls stay f32 — pltpu.roll rejects bf16 on this Mosaic version)
        for k in range(nbits):
            sh = 1 << k
            rolled = pltpu.roll(x, shift=128 - sh, axis=2)   # left by sh
            x = jnp.where(bitmask[k], rolled, x)
        # place the d valid lanes at channels [du*d, du*d+d); keep-masks are
        # DISJOINT across du, so the merge is a pure select (no adds)
        x = pltpu.roll(x, shift=du * d, axis=2)              # right by du*d
        keep = (lane >= du * d) & (lane < du * d + d)
        return jnp.where(keep, x.astype(acc_dtype), acc)

    acc = jnp.zeros((W_tile, Hdim, 128), acc_dtype)
    acc = jax.lax.fori_loop(0, d, step, acc)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("r", "w_tile", "full_lanes",
                                             "out_f32"))
def corr_rotmxu(fm1, fm2, r: int, w_tile: int = 16, full_lanes: bool = False,
                out_f32: bool = True):
    """MXU+rotate local correlation → (B, H, W, d²) (or (…,128) channels-last
    zero-padded when full_lanes — lets the downstream 1×1 conv take K=128)."""
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    assert H + 2 * r <= 128, "rotate variant assumes H+2r <= 128"
    scale = float(1.0 / np.sqrt(float(C)))
    w_tile = min(w_tile, W)
    if W % w_tile != 0:
        w_tile = W
    ft1 = jnp.transpose(fm1, (0, 2, 1, 3))           # (B, W, H, C)
    ft2 = jnp.transpose(fm2, (0, 2, 1, 3))
    ft2p = jnp.pad(ft2, ((0, 0), (r, r), (r, 128 - H - r), (0, 0)))
    out_dtype = jnp.float32 if out_f32 else fm1.dtype

    kernel = functools.partial(_corr_rot_kernel, W_tile=w_tile, Hdim=H,
                               r=r, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, W, H, 128), out_dtype),
        grid=(B, W // w_tile),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),    # ft2p off-chip
            pl.BlockSpec((1, w_tile, H, C), lambda b, w: (b, w, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, w_tile, H, 128), lambda b, w: (b, w, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((w_tile + 2 * r, 128, C), fm2.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )(ft2p, ft1)
    out = jnp.transpose(out, (0, 2, 1, 3))           # (B, H, W, 128)
    if full_lanes:
        return out.astype(fm1.dtype)
    return out[..., :d * d].astype(fm1.dtype)


# --------------------------------------------------------------- timing

def timeit(fn, *args, n=20):
    """Time n in-graph iterations under ONE jit: the axon tunnel costs ~26ms
    per dispatch (see .claude/skills/verify), so standalone per-call timing
    inverts rankings. The loop carries a data dependency through the first
    input so XLA cannot hoist the call."""

    @jax.jit
    def looped(a0, *rest):
        def body(_, a):
            out = fn(a, *rest)
            # fold the output back into the input (same shape not guaranteed:
            # reduce to a scalar perturbation instead)
            eps = (jnp.float32(1e-12) * out.astype(jnp.float32).mean())
            return (a.astype(jnp.float32) + eps).astype(a.dtype)

        return jax.lax.fori_loop(0, n, body, a0)

    jax.block_until_ready(looped(args[0], *args[1:]))   # compile
    t0 = time.perf_counter()
    jax.block_until_ready(looped(args[0], *args[1:]))
    return (time.perf_counter() - t0) / n


def main():
    B, H, W, C, r = 32, 64, 64, 256, 5
    rng = np.random.RandomState(0)
    fm1 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fm2 = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    fm1h = fm1.astype(jnp.bfloat16)
    fm2h = fm2.astype(jnp.bfloat16)

    ref = np.asarray(local_correlation(fm1, fm2, r))

    rows = []

    only = os.environ.get("SWEEP_ONLY")   # substring filter, comma-separated

    def check_and_time(name, fn, *args, atol=2e-2):
        if only and not any(s in name for s in only.split(",")):
            return
        try:
            out = np.asarray(jax.block_until_ready(fn(*args)))
            err = np.max(np.abs(out.astype(np.float32) - ref))
            dt = timeit(fn, *args)
            rows.append((name, dt * 1e3, err))
            print(f"{name:38s} {dt * 1e3:8.3f} ms   maxerr {err:.2e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:38s} FAILED: {type(e).__name__}: {e}", flush=True)

    if not os.environ.get("SWEEP_BWD_ONLY"):
        check_and_time("xla f32", jax.jit(functools.partial(local_correlation, r=r)), fm1, fm2)
        for ht in (8, 16, 32):
            check_and_time(f"pallas f32 ht={ht}",
                           functools.partial(local_correlation_pallas, r=r, h_tile=ht),
                           fm1, fm2)
        for ht in (8, 16, 32):
            check_and_time(f"pallas-swapped f32 ht={ht}",
                           functools.partial(corr_swapped, r=r, h_tile=ht),
                           fm1, fm2)
        for ht in (8, 16):
            check_and_time(f"pallas-mxu f32 ht={ht}",
                           functools.partial(local_correlation_pallas_mxu, r=r, h_tile=ht),
                           fm1, fm2)
        for ht in (8, 16, 32):
            check_and_time(f"pallas-csub f32 ht={ht}",
                           functools.partial(local_correlation_pallas_csub,
                                             r=r, h_tile=ht),
                           fm1, fm2)
        check_and_time("pallas-csub bf16 ht=16",
                       functools.partial(local_correlation_pallas_csub,
                                         r=r, h_tile=16),
                       fm1h, fm2h)
        for ht in (8, 16, 32, 64):
            check_and_time(f"pallas bf16 ht={ht}",
                           functools.partial(local_correlation_pallas, r=r,
                                             h_tile=ht),
                           fm1h, fm2h)
        check_and_time("pallas bf16 ht=16 f32-out",
                       functools.partial(local_correlation_pallas, r=r,
                                         h_tile=16, out_f32=True),
                       fm1h, fm2h)
        for ht in (8, 32):
            check_and_time(f"pallas-mxu bf16 ht={ht}",
                           functools.partial(local_correlation_pallas_mxu,
                                             r=r, h_tile=ht),
                           fm1h, fm2h)
        check_and_time("pallas-swapped bf16 ht=16",
                       functools.partial(corr_swapped, r=r, h_tile=16),
                       fm1h, fm2h)
        check_and_time("pallas-mxu bf16 ht=16",
                       functools.partial(local_correlation_pallas_mxu, r=r, h_tile=16),
                       fm1h, fm2h)
        check_and_time("xla-mxu f32", jax.jit(functools.partial(local_correlation_mxu, r=r)),
                       fm1, fm2)
        for wt in (8, 16, 32):
            check_and_time(f"pallas-rotmxu f32 wt={wt}",
                           functools.partial(corr_rotmxu, r=r, w_tile=wt),
                           fm1, fm2)
        for wt in (8, 16, 32, 64):
            check_and_time(f"pallas-rotmxu bf16 wt={wt}",
                           functools.partial(corr_rotmxu, r=r, w_tile=wt),
                           fm1h, fm2h)
        for wt in (16, 32, 64):
            check_and_time(f"pallas-rotmxu bf16out wt={wt}",
                           functools.partial(corr_rotmxu, r=r, w_tile=wt,
                                             out_f32=False),
                           fm1h, fm2h)

        best = min(rows, key=lambda t: t[1])
        print(f"\nbest fwd: {best[0]} at {best[1]:.3f} ms")

    # ------------------------------------------------------------- backward
    if only and "bwd" not in only:
        return
    from rpnet_tpu.ops.correlation import local_correlation_mxu_bwd
    from rpnet_tpu.ops.pallas.correlation import (_corr_bwd,
                                                  local_correlation_pallas_bwd)

    g = jnp.asarray(rng.randn(B, H, W, (2 * r + 1) ** 2).astype(np.float32))
    refs = _corr_bwd(r, (fm1, fm2), g)
    ref1, ref2 = np.asarray(refs[0]), np.asarray(refs[1])

    def check_bwd(name, fn):
        try:
            o1, o2 = jax.block_until_ready(fn(g, fm1, fm2))
            err = max(np.max(np.abs(np.asarray(o1) - ref1)),
                      np.max(np.abs(np.asarray(o2) - ref2)))

            @jax.jit
            def looped(gg, a1, a2):
                def body(_, a):
                    o1, o2 = fn(a, a1, a2)
                    eps = jnp.float32(1e-12) * (o1.astype(jnp.float32).mean()
                                                + o2.astype(jnp.float32).mean())
                    return (a.astype(jnp.float32) + eps).astype(a.dtype)
                return jax.lax.fori_loop(0, 20, body, gg)

            jax.block_until_ready(looped(g, fm1, fm2))
            t0 = time.perf_counter()
            jax.block_until_ready(looped(g, fm1, fm2))
            dt = (time.perf_counter() - t0) / 20
            print(f"bwd {name:34s} {dt * 1e3:8.3f} ms   maxerr {err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"bwd {name:34s} FAILED: {type(e).__name__}: {e}", flush=True)

    check_bwd("xla shifted", lambda gg, a, b: _corr_bwd(r, (a, b), gg))
    for ht in (8, 16):
        check_bwd(f"pallas ht={ht}",
                  functools.partial(local_correlation_pallas_bwd, r=r, h_tile=ht))
    check_bwd("xla-mxu banded",
              functools.partial(local_correlation_mxu_bwd, r=r))


if __name__ == "__main__":
    main()
