"""NN building blocks (flax/linen, NHWC) — rebuild of net/modules.py.

Covers: single_conv(_bn), conv_block, up_conv, Attention_block, BasicConv,
ChannelGate/SpatialGate/CBAM, CBAMBlock (net/modules.py:9-255).

Initializers replicate torch defaults so from-scratch training matches the
reference's statistical behavior:
  * Conv2d default: kaiming_uniform(a=√5) == variance_scaling(1/3, fan_in,
    uniform); bias ~ U(±1/√fan_in)
  * BatchNorm2d: eps 1e-5, momentum 0.1 (linen momentum = 0.9), affine.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from rpnet_tpu.ops.sampling import avg_pool2d, max_pool2d, upsample_nearest2x

# torch nn.Conv2d default init
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")
kaiming_normal_relu = nn.initializers.variance_scaling(2.0, "fan_in", "normal")


def conv_bias_init(key, shape, dtype, fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchConv(nn.Module):
    """nn.Conv with torch-default initialization (needs static fan_in)."""
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_dilation: Tuple[int, int] = (1, 1)
    kernel_init: Callable = conv_kernel_init
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size[0] * self.kernel_size[1]
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            kernel_dilation=self.kernel_dilation,
            feature_group_count=self.feature_group_count,
            kernel_init=self.kernel_init,
            bias_init=lambda k, s, d=jnp.float32: conv_bias_init(k, s, d, fan_in),
            name="conv",
        )(x)


class Norm2d(nn.Module):
    """Normalization chosen by name — mirrors `unet_normalize_type` config
    (getattr(nn, normalization_type) at net/modules.py:49)."""
    kind: str = "BatchNorm2d"
    momentum: float = 0.9   # linen convention: ra = m*ra + (1-m)*batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kind == "BatchNorm2d":
            return nn.BatchNorm(use_running_average=not train,
                                momentum=self.momentum, epsilon=self.epsilon,
                                name="bn")(x)
        if self.kind == "InstanceNorm2d":
            # torch InstanceNorm2d default: no affine, eps 1e-5
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        if self.kind == "GroupNorm":
            return nn.GroupNorm(num_groups=8, epsilon=self.epsilon, name="gn")(x)
        raise NotImplementedError(self.kind)


class ConvParams(nn.Module):
    """kernel+bias params with TorchConv's tree path (<name>/conv/{kernel,
    bias}) and torch-default inits, applied by the CALLER — for paths that
    transform the weights at apply time (split along input channels,
    flipped taps, folded permutations) while keeping checkpoints and the
    torch converter byte-compatible."""
    features: int
    in_features: int
    ksize: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self):
        class _Holder(nn.Module):
            features: int
            in_features: int
            ksize: Tuple[int, int]

            @nn.compact
            def __call__(self2):
                kh, kw = self2.ksize
                fan_in = self2.in_features * kh * kw
                k = self2.param(
                    "kernel", conv_kernel_init,
                    (kh, kw, self2.in_features, self2.features), jnp.float32)
                b = self2.param(
                    "bias",
                    lambda key, s, d=jnp.float32: conv_bias_init(
                        key, s, d, fan_in),
                    (self2.features,), jnp.float32)
                return k, b

        return _Holder(self.features, self.in_features, self.ksize,
                       name="conv")()


class ConvBlock(nn.Module):
    """conv3x3+Norm+ReLU ×2 (conv_block, net/modules.py:42-58)."""
    features: int
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, (3, 3), name="conv1")(x)
        x = Norm2d(self.norm, name="norm1")(x, train)
        x = nn.relu(x)
        x = TorchConv(self.features, (3, 3), name="conv2")(x)
        x = Norm2d(self.norm, name="norm2")(x, train)
        x = nn.relu(x)
        return x


class UpConv(nn.Module):
    """nearest ×2 upsample + conv3x3 + Norm + ReLU (up_conv, net/modules.py:61-75)."""
    features: int
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = upsample_nearest2x(x)
        x = TorchConv(self.features, (3, 3), name="conv")(x)
        x = Norm2d(self.norm, name="norm")(x, train)
        return nn.relu(x)


class ConvRelu(nn.Module):
    """conv+ReLU factory equivalent (convrelu, net/modules.py:35-39)."""
    features: int
    kernel: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.features, (self.kernel, self.kernel),
                      padding=[(self.padding, self.padding)] * 2, name="conv")(x)
        return nn.relu(x)


class SingleConv(nn.Module):
    """conv+ReLU (single_conv, net/modules.py:23-33)."""
    features: int
    kernel: int = 3
    @nn.compact
    def __call__(self, x):
        x = TorchConv(self.features, (self.kernel, self.kernel), name="conv")(x)
        return nn.relu(x)


class SingleConvBN(nn.Module):
    """conv+BN+ReLU (single_conv_bn, net/modules.py:9-20)."""
    features: int
    kernel: int = 3
    norm: str = "BatchNorm2d"
    @nn.compact
    def __call__(self, x, train: bool = False):
        x = TorchConv(self.features, (self.kernel, self.kernel), name="conv")(x)
        x = Norm2d(self.norm, name="norm")(x, train)
        return nn.relu(x)


class AttentionBlock(nn.Module):
    """Attention U-Net gate (Attention_block, net/modules.py:78-105)."""
    f_int: int
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        g1 = TorchConv(self.f_int, (1, 1), name="w_g")(g)
        g1 = Norm2d(self.norm, name="w_g_norm")(g1, train)
        x1 = TorchConv(self.f_int, (1, 1), name="w_x")(x)
        x1 = Norm2d(self.norm, name="w_x_norm")(x1, train)
        psi = nn.relu(g1 + x1)
        psi = TorchConv(1, (1, 1), name="psi")(psi)
        psi = Norm2d(self.norm, name="psi_norm")(psi, train)
        psi = nn.sigmoid(psi)
        return x * psi


class BasicConv(nn.Module):
    """conv + optional BN + optional ReLU (BasicConv, net/modules.py:108-122)."""
    features: int
    kernel: int
    stride: int = 1
    padding: Optional[int] = None
    relu: bool = True
    bn: bool = True
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.padding if self.padding is not None else 0
        x = TorchConv(self.features, (self.kernel, self.kernel),
                      strides=(self.stride, self.stride),
                      padding=[(pad, pad), (pad, pad)],
                      use_bias=False, name="conv")(x)
        if self.bn:
            # reference uses eps 1e-5, momentum .01 for CBAM's BasicConv
            x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-5, name="bn")(x)
        if self.relu:
            x = nn.relu(x)
        return x


class ChannelGate(nn.Module):
    """CBAM channel attention (ChannelGate, net/modules.py:128-162)."""
    gate_channels: int
    reduction: int = 16
    pool_types: Sequence[str] = ("avg", "max")

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        mlp = nn.Sequential([
            nn.Dense(self.gate_channels // self.reduction, name="fc1"),
            nn.relu,
            nn.Dense(self.gate_channels, name="fc2"),
        ])
        att = None
        for pool in self.pool_types:
            if pool == "avg":
                p = jnp.mean(x, axis=(1, 2))
            elif pool == "max":
                p = jnp.max(x, axis=(1, 2))
            else:
                continue
            a = mlp(p)
            att = a if att is None else att + a
        scale = nn.sigmoid(att)[:, None, None, :]
        return x * scale


class SpatialGate(nn.Module):
    """CBAM spatial attention (SpatialGate, net/modules.py:176-186)."""
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        pooled = jnp.concatenate([jnp.max(x, axis=-1, keepdims=True),
                                  jnp.mean(x, axis=-1, keepdims=True)], axis=-1)
        a = BasicConv(1, 7, padding=3, relu=False, norm=self.norm,
                      name="spatial")(pooled, train)
        return x * nn.sigmoid(a)


class CBAM(nn.Module):
    """Convolutional block attention (CBAM, net/modules.py:188-199)."""
    gate_channels: int
    reduction: int = 16
    no_spatial: bool = False
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ChannelGate(self.gate_channels, self.reduction, name="channel_gate")(x)
        if not self.no_spatial:
            x = SpatialGate(self.norm, name="spatial_gate")(x, train)
        return x


class CBAMBlock(nn.Module):
    """Residual block with CBAM (CBAMBlock, net/modules.py:209-255)."""
    features: int
    stride: int = 1
    use_cbam: bool = True
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch_in = x.shape[-1]
        residual = x
        if self.stride != 1 or ch_in != self.features:
            residual = TorchConv(self.features, (1, 1),
                                 strides=(self.stride, self.stride),
                                 name="shortcut_conv")(x)
            residual = Norm2d(self.norm, name="shortcut_norm")(residual, train)
        out = TorchConv(self.features, (3, 3), strides=(self.stride, self.stride),
                        use_bias=False, name="conv1")(x)
        out = Norm2d(self.norm, name="norm1")(out, train)
        out = nn.relu(out)
        out = TorchConv(self.features, (3, 3), use_bias=False, name="conv2")(out)
        out = Norm2d(self.norm, name="norm2")(out, train)
        if self.use_cbam:
            out = CBAM(self.features, norm=self.norm, name="cbam")(out, train)
        return nn.relu(out + residual)
