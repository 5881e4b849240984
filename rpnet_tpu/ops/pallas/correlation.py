"""Pallas TPU kernel for the RAFT-style local correlation.

Why a kernel (SURVEY.md §5 "the memory hot spot"): the XLA formulation
(ops/correlation.py) materializes 121 shifted elementwise products — each
displacement re-reads both (B, H, W, C) feature maps from HBM, ~121× the
necessary traffic, making every CRE call bandwidth-bound. This kernel loads a
(H, W, C)-tile of fm1 and the padded fm2 into VMEM ONCE and computes all
(2r+1)² displacement dot-products in-register (VPU reductions over C),
accumulating over channel chunks so VMEM stays under budget.

Channel ordering matches ops/correlation.local_correlation exactly (the
reference's horizontal-shift-slowest quirk, net/rp_net.py:169-175):
out channel c = dx_idx * (2r+1) + dy_idx.

Interface: ``local_correlation_pallas(fm1, fm2, r)`` — same contract as the
XLA path; it falls back to XLA off-TPU (and in interpret mode for tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rpnet_tpu.ops.correlation import local_correlation as _xla_local_correlation


def _corr_kernel(fm1_ref, fm2p_ref, out_ref, *, H, W, r, n_cchunks, scale):
    """One (batch, channel-chunk) grid step.

    fm1_ref:  (1, H, W, Cc)       — fm1 channel chunk
    fm2p_ref: (1, H+2r, W+2r, Cc) — zero-padded fm2 chunk
    out_ref:  (1, D², H, W)       — accumulated over channel chunks
    """
    d = 2 * r + 1
    cchunk = pl.program_id(1)

    fm1 = fm1_ref[0]                    # (H, W, Cc)
    fm2p = fm2p_ref[0]                  # (H+2r, W+2r, Cc)

    @pl.when(cchunk == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    for dx in range(d):                 # horizontal shift — slow axis (quirk)
        for dy in range(d):
            sub = fm2p[dy:dy + H, dx:dx + W, :]
            acc = jnp.sum(fm1 * sub, axis=-1) * scale     # (H, W)
            out_ref[0, dx * d + dy, :, :] += acc


@functools.partial(jax.jit, static_argnames=("r", "c_chunk", "interpret"))
def local_correlation_pallas(fm1, fm2, r: int, c_chunk: int = 128,
                             interpret: bool = False):
    """Pallas local correlation. fm1, fm2: (B, H, W, C) → (B, H, W, (2r+1)²)."""
    B, H, W, C = fm1.shape
    d = 2 * r + 1
    scale = float(1.0 / np.sqrt(float(C)))
    c_chunk = min(c_chunk, C)
    if C % c_chunk != 0:
        c_chunk = C  # fall back to single chunk for odd channel counts
    n_cchunks = C // c_chunk

    fm2p = jnp.pad(fm2, ((0, 0), (r, r), (r, r), (0, 0)))

    kernel = functools.partial(_corr_kernel, H=H, W=W, r=r,
                               n_cchunks=n_cchunks, scale=scale)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, d * d, H, W), jnp.float32),
        grid=(B, n_cchunks),
        in_specs=[
            pl.BlockSpec((1, H, W, c_chunk), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H + 2 * r, W + 2 * r, c_chunk),
                         lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d * d, H, W), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(fm1, fm2p)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(fm1.dtype)


def local_correlation_auto(fm1, fm2, r: int):
    """Pallas on TPU, XLA elsewhere (tests run the interpret path explicitly)."""
    try:
        platform = fm1.devices().pop().platform if hasattr(fm1, "devices") else \
            jax.default_backend()
    except Exception:
        platform = jax.default_backend()
    if platform == "tpu":
        return local_correlation_pallas(fm1, fm2, r)
    return _xla_local_correlation(fm1, fm2, r)
