"""Gaussian kernels + flow-field regularizer (net/registration.py:16-144).

The demons regulariser smooths the 2-channel flow field with a fixed Gaussian
after every optimizer step (no gradient through the smoothing). Here it is a
depthwise NHWC convolution — a static-weight conv XLA maps straight onto TPU
conv units.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax.numpy as jnp
from jax import lax


def gaussian_kernel_1d(sigma: float) -> np.ndarray:
    """Normalized 1-D Gaussian with the reference's size rule
    (kernel_size = 2*ceil(2*sigma)+1, net/registration.py:16-31)."""
    kernel_size = int(2 * np.ceil(sigma * 2) + 1)
    x = np.linspace(-(kernel_size - 1) // 2, (kernel_size - 1) // 2, num=kernel_size)
    k = 1.0 / (sigma * np.sqrt(2 * np.pi)) * np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / np.sum(k)


def gaussian_kernel_2d(sigma: Sequence[float]) -> np.ndarray:
    k = np.tensordot(gaussian_kernel_1d(sigma[0]), gaussian_kernel_1d(sigma[1]), 0)
    return k / np.sum(k)


def gaussian_blur_flow(flow, sigma: Sequence[float] = (2.0, 2.0)):
    """Depthwise Gaussian smoothing of a flow field.

    flow: (N, H, W, 2) channels-last. Zero padding, matching the reference's
    F.conv2d(padding=(k-1)/2, groups=2) (net/registration.py:128-131).
    """
    k2 = gaussian_kernel_2d(sigma).astype(np.float32)
    kh, kw = k2.shape
    # depthwise: HWIO with feature_group_count = channels
    kernel = jnp.asarray(k2)[:, :, None, None] * jnp.ones((1, 1, 1, flow.shape[-1]),
                                                          dtype=jnp.float32)
    kernel = kernel.astype(flow.dtype)
    return lax.conv_general_dilated(
        flow, kernel,
        window_strides=(1, 1),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=flow.shape[-1],
        precision=lax.Precision.HIGHEST,
    )


def l2_regulariser_2d(displacement, pixel_spacing=(1.0, 1.0)):
    """Bit-faithful port of ``_l2_regulariser_2d`` (net/registration.py:163-168).

    Reference quirk, preserved: the squeezed flow there is (2, H, W)
    channels-FIRST, so its ``[1:] - [:-1]`` on dim 0 is a CHANNEL difference
    (flow_y − flow_x on a shifted window), not a spatial gradient; the pad
    then extends the last two dims to (1, H, W+1) before the mean. A sane
    spatial-smoothness penalty this is not — but the knob is public API and
    parity wins. displacement: (H, W, 2) channels-last here.
    """
    d = jnp.transpose(displacement, (2, 0, 1))             # (2, H, W)
    dx = (d[1:, 1:, :] - d[:-1, 1:, :]) ** 2 * pixel_spacing[0]
    dy = (d[1:, 1:, :] - d[1:, :-1, :]) ** 2 * pixel_spacing[1]
    s = dx + dy                                            # (1, H-1, W)
    padded = jnp.pad(s, ((0, 0), (0, 1), (0, 1)))          # (1, H, W+1)
    return jnp.mean(padded)
