"""ResNet18-style encoder (rebuild of net/rp_net.py:19-42).

The reference takes the torchvision resnet18 stem (conv7×7/s2 → bn → relu →
maxpool3×3/s2 → layer1) and appends three custom BasicBlock stages
(64→128→256→512) with 1×1-conv shortcuts but stride 1 — so the output is
512-channel features at 1/4 resolution (matching `scale: 4`).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from rpnet_tpu.models.blocks import Norm2d, TorchConv
from rpnet_tpu.ops.sampling import max_pool2d


class BasicBlock(nn.Module):
    """torchvision-style BasicBlock (bias-free 3×3 convs)."""
    features: int
    stride: int = 1
    downsample: bool = False  # 1×1 conv + BN shortcut

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = TorchConv(self.features, (3, 3), strides=(self.stride, self.stride),
                        use_bias=False, name="conv1")(x)
        out = Norm2d(name="bn1")(out, train)
        out = nn.relu(out)
        out = TorchConv(self.features, (3, 3), use_bias=False, name="conv2")(out)
        out = Norm2d(name="bn2")(out, train)
        if self.downsample:
            identity = TorchConv(self.features, (1, 1), name="down_conv")(x)
            identity = Norm2d(name="down_bn")(identity, train)
        return nn.relu(out + identity)


class ResNet18Encoder(nn.Module):
    """Input (B, H, W, 3) → {'d4': (B, H/4, W/4, 512)}."""

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # torchvision stem
        x = TorchConv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                      use_bias=False, name="stem_conv")(x)
        x = Norm2d(name="stem_bn")(x, train)
        x = nn.relu(x)
        x = max_pool2d(x, 3, 2, 1)
        # layer1: two 64-channel blocks
        x = BasicBlock(64, name="layer1_0")(x, train)
        x = BasicBlock(64, name="layer1_1")(x, train)
        # custom stages, stride 1, channel-expanding shortcuts
        for i, feats in enumerate((128, 256, 512)):
            x = BasicBlock(feats, downsample=True, name=f"stage{i + 2}_0")(x, train)
            x = BasicBlock(feats, name=f"stage{i + 2}_1")(x, train)
        return {"d4": x}
