"""U-Net encoder with 2-level decoder (rebuild of net/unet.py:393-466).

5-level encoder (64→1024 channels, maxpool 2×2) + two decoder stages; output
is the 'd4' feature map at 1/4 resolution with 256 channels — the default
RP-Net backbone (example.yml:102 `backbone: UNet`). Optional mask-channel
injection at a configurable level (`mask_feature_map` ∈ {x, x2, x3, x4, x5, no},
net/unet.py:401-424,435-450).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from rpnet_tpu.models.blocks import ConvBlock, UpConv
from rpnet_tpu.ops.sampling import avg_pool2d, max_pool2d

_FEATS = (64, 128, 256, 512, 1024)


class UNet(nn.Module):
    """Input (B, H, W, C) → {'d4': (B, H/4, W/4, 256)}."""
    norm: str = "BatchNorm2d"
    mask_feature_map: str = "no"

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        mfm = self.mask_feature_map
        if mfm == "x":
            x = jnp.concatenate([x, mask], axis=-1)
        x1 = ConvBlock(_FEATS[0], self.norm, name="enc1")(x, train)

        x2 = max_pool2d(x1, 2, 2)
        if mfm == "x2":
            x2 = jnp.concatenate([x2, avg_pool2d(mask, 2)], axis=-1)
        x2 = ConvBlock(_FEATS[1], self.norm, name="enc2")(x2, train)

        x3 = max_pool2d(x2, 2, 2)
        if mfm == "x3":
            x3 = jnp.concatenate([x3, avg_pool2d(mask, 4)], axis=-1)
        x3 = ConvBlock(_FEATS[2], self.norm, name="enc3")(x3, train)

        x4 = max_pool2d(x3, 2, 2)
        x4 = ConvBlock(_FEATS[3], self.norm, name="enc4")(x4, train)

        x5 = max_pool2d(x4, 2, 2)
        if mfm == "x5":
            x5 = jnp.concatenate([x5, avg_pool2d(mask, 16)], axis=-1)
        x5 = ConvBlock(_FEATS[4], self.norm, name="enc5")(x5, train)

        # NOTE (measured, v5e): replacing these concats with split-kernel
        # convs (conv(concat(a,b)) = conv_a(a)+conv_b(b)) moved the cost into
        # the split convs — eval neutral, train step 5% SLOWER. The concat
        # form stays.
        d5 = UpConv(_FEATS[3], self.norm, name="up5")(x5, train)
        d5 = jnp.concatenate([x4, d5], axis=-1)
        d5 = ConvBlock(_FEATS[3], self.norm, name="dec5")(d5, train)

        d4 = UpConv(_FEATS[2], self.norm, name="up4")(d5, train)
        d4 = jnp.concatenate([x3, d4], axis=-1)
        d4 = ConvBlock(_FEATS[2], self.norm, name="dec4")(d4, train)

        return {"d4": d4}
