"""LGCANet_V3: 3D-context-aware 2D segmentation (rebuild of net/lgca_net_v3.py).

Architecture (lgca_net_v3.py:579-658): a 3D ``FeatureNet`` over the whole
volume (ResBlock3d stages, instance norm) produces a feature pyramid
d1..d4 + a deep-supervision head ``dsv``; a 2D U-Net over slices fuses the 3D
pyramid at 4 scales through multi-head slice attention (each head: pooled 2D
embedding × pooled per-depth 3D embeddings → softmax over depth → weighted
depth-sum of 3D features), plus a globally-pooled 3D feature at the last
decoder stage.

TPU notes: the reference parallelizes with single-process
``torch.nn.parallel.data_parallel`` (lgca_net_v3.py:600,622) and hand-expands
features across ``torch.cuda.device_count()`` (:614-615); here the slice batch
simply shards over the mesh ``data`` axis — no replication code needed. The
slice attention's softmax over depth (:318-326) is tiny (D ≤ a few hundred);
it stays plain XLA.
"""

from __future__ import annotations

import math
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from rpnet_tpu.models.blocks import (AttentionBlock, ConvBlock, Norm2d,
                                     TorchConv, UpConv)
from rpnet_tpu.ops.sampling import max_pool2d

P_NUM = (24, 32, 64, 64)   # 3D pyramid channel counts (lgca_net_v3.py:120)


# --------------------------------------------------------------------------
# 3D building blocks
# --------------------------------------------------------------------------

def instance_norm_3d(x, eps: float = 1e-5):
    """torch InstanceNorm3d default (no affine). x: (N, D, H, W, C)."""
    mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(x, axis=(1, 2, 3), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


def max_pool3d(x, k: int = 2, s: int = 2):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, k, k, k, 1), (1, s, s, s, 1), "VALID")


class Conv3d(nn.Module):
    features: int
    kernel: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(self.features, (self.kernel,) * 3, padding="SAME",
                       use_bias=self.use_bias, name="conv")(x)


class ResBlock3d(nn.Module):
    """conv3d+IN+relu ×2 with shortcut (ResBlock3d, lgca_net_v3.py:23-51)."""
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = nn.Conv(self.features, (1, 1, 1),
                               strides=(self.stride,) * 3, name="shortcut")(x)
            residual = instance_norm_3d(residual)
        out = nn.Conv(self.features, (3, 3, 3), strides=(self.stride,) * 3,
                      padding="SAME", name="conv1")(x)
        out = jax.nn.relu(instance_norm_3d(out))
        out = nn.Conv(self.features, (3, 3, 3), padding="SAME", name="conv2")(out)
        out = instance_norm_3d(out)
        return jax.nn.relu(out + residual)


class FeatureNet(nn.Module):
    """3D context pyramid (FeatureNet, lgca_net_v3.py:54-113).

    Input (N, D, H, W, 1) → d1 (full res, 24ch), d2 (/2, 32), d3 (/4, 64),
    d4 (/8, 64), dsv (full res, out_channels).
    """
    out_channels: int = 6

    @nn.compact
    def __call__(self, x):
        out = nn.Conv(24, (3, 3, 3), padding="SAME", name="pre_conv1")(x)
        out = jax.nn.relu(instance_norm_3d(out))
        out = nn.Conv(24, (3, 3, 3), padding="SAME", name="pre_conv2")(out)
        out = jax.nn.relu(instance_norm_3d(out))           # d1

        p = max_pool3d(out)
        out1 = ResBlock3d(32, name="forw1_0")(p)
        out1 = ResBlock3d(32, name="forw1_1")(out1)        # d2

        p = max_pool3d(out1)
        out2 = ResBlock3d(64, name="forw2_0")(p)
        out2 = ResBlock3d(64, name="forw2_1")(out2)        # d3

        p = max_pool3d(out2)
        out3 = ResBlock3d(64, name="forw3_0")(p)
        out3 = ResBlock3d(64, name="forw3_1")(out3)
        out3 = ResBlock3d(64, name="forw3_2")(out3)        # d4

        # deep supervision: trilinear ×8 then conv (lgca_net_v3.py:92-95)
        N, D, H, W, C = out3.shape
        up = jax.image.resize(out3, (N, D * 8, H * 8, W * 8, C), method="trilinear")
        dsv = nn.Conv(self.out_channels, (3, 3, 3), padding="SAME", name="dsv_conv")(up)

        return {"d1": out, "d2": out1, "d3": out2, "d4": out3, "dsv": dsv}


# --------------------------------------------------------------------------
# slice attention
# --------------------------------------------------------------------------

def adaptive_max_pool2d(x, out: int):
    """torch AdaptiveMaxPool2d((out, out)). x: (..., H, W, C)."""
    H, W = x.shape[-3], x.shape[-2]

    def pool_axis(arr, axis, size, out_size):
        chunks = []
        for i in range(out_size):
            s = (i * size) // out_size
            e = -(-((i + 1) * size) // out_size)
            chunks.append(jnp.max(jnp.take(arr, jnp.arange(s, e), axis=axis),
                                  axis=axis, keepdims=True))
        return jnp.concatenate(chunks, axis=axis)

    x = pool_axis(x, -3, H, out)
    x = pool_axis(x, -2, W, out)
    return x


class AttentionLayer(nn.Module):
    """One slice-attention head (AttentionLayer, lgca_net_v3.py:267-328).

    feat_2d: (B, H, W, C2); feat_3d: (1, D, H3, W3, C3).
    Returns (fused (B, H3, W3, C3), att (B, D)).
    """
    num_feat: int
    num_embed: int

    @nn.compact
    def __call__(self, feat_2d, feat_3d):
        B = feat_2d.shape[0]
        _, D, H3, W3, C3 = feat_3d.shape

        sig2 = nn.Conv(self.num_feat, (1, 1), use_bias=False,
                       name="pool2d_conv")(feat_2d)
        sig2 = adaptive_max_pool2d(sig2, self.num_embed)
        sig2 = sig2.reshape(B, -1)                          # (B, F·E²)

        sig3 = nn.Conv(self.num_feat, (1, 1, 1), use_bias=False,
                       name="pool3d_conv")(feat_3d)
        # AdaptiveMaxPool3d((None, E, E)): depth untouched
        sig3 = adaptive_max_pool2d(sig3, self.num_embed)    # (1, D, E, E, F)
        # reference orders (C, E, E) against the flattened 2D embedding
        sig3 = jnp.transpose(sig3[0], (3, 1, 2, 0))         # (F, E, E, D)
        sig3 = sig3.reshape(-1, D)                          # (F·E², D)

        att = sig2 @ sig3 / math.sqrt(sig2.shape[-1])
        att = jax.nn.softmax(att, axis=1)                   # (B, D)

        fused = jnp.einsum("bd,dhwc->bhwc", att, feat_3d[0])
        return fused, att


class MultiHeadAttentionLayer(nn.Module):
    """num_head attention layers + 1×1 fuse conv (lgca_net_v3.py:331-362)."""
    num_head: int
    num_feat: int
    num_embed: int
    norm: str = "BatchNorm2d"

    @nn.compact
    def __call__(self, feat_2d, feat_3d, train: bool = False):
        fused, atts = [], []
        for i in range(self.num_head):
            f, a = AttentionLayer(self.num_feat, self.num_embed,
                                  name=f"att_layer_{i}")(feat_2d, feat_3d)
            fused.append(f)
            atts.append(a)
        x = jnp.concatenate(fused, axis=-1)
        x = TorchConv(feat_3d.shape[-1], (1, 1), use_bias=False,
                      name="fuse_conv")(x)
        x = Norm2d(self.norm, name="fuse_norm")(x, train)
        x = jax.nn.relu(x)
        att = jnp.stack(atts, axis=-1)                      # (B, D, heads)
        return x, att


# --------------------------------------------------------------------------
# fused 2D U-Nets
# --------------------------------------------------------------------------

_ATT_SPEC = ((2, 2, 16), (2, 2, 8), (4, 4, 4), (4, 4, 4))  # (heads, feat, embed)


class FusedUNet(nn.Module):
    """2D U-Net with 3D-attention fusion at 4 scales (U_Net,
    lgca_net_v3.py:365-475)."""
    output_ch: int = 6
    norm: str = "BatchNorm2d"
    feature_scale: float = 1.0
    attention_gates: bool = False   # True → AttU_Net (lgca_net_v3.py:478-576)

    @nn.compact
    def __call__(self, x, features: Dict[str, jnp.ndarray], train: bool = False):
        f = [int(v / self.feature_scale) for v in (64, 128, 256, 512, 1024)]
        p = [features["d1"], features["d2"], features["d3"], features["d4"]]
        glob = features["glob_feat"]                        # (B, H, W, 64)

        x1 = ConvBlock(f[0], self.norm, name="enc1")(x, train)
        skips = [x1]
        cur = x1
        for lvl in range(4):
            cur = max_pool2d(cur, 2, 2)
            heads, nf, ne = _ATT_SPEC[lvl]
            att_out, _ = MultiHeadAttentionLayer(
                heads, nf, ne, self.norm, name=f"self_attention{lvl + 1}")(
                    cur, p[lvl], train)
            cur = jnp.concatenate([cur, att_out], axis=-1)
            cur = ConvBlock(f[lvl + 1], self.norm, name=f"enc{lvl + 2}")(cur, train)
            skips.append(cur)

        x1, x2, x3, x4, x5 = skips
        d5 = UpConv(f[3], self.norm, name="up5")(x5, train)
        if self.attention_gates:
            x4 = AttentionBlock(f[2], self.norm, name="att5")(d5, x4, train)
        d5 = ConvBlock(f[3], self.norm, name="dec5")(
            jnp.concatenate([x4, d5], axis=-1), train)

        d4 = UpConv(f[2], self.norm, name="up4")(d5, train)
        if self.attention_gates:
            x3 = AttentionBlock(f[1], self.norm, name="att4")(d4, x3, train)
        d4 = ConvBlock(f[2], self.norm, name="dec4")(
            jnp.concatenate([x3, d4], axis=-1), train)

        d3 = UpConv(f[1], self.norm, name="up3")(d4, train)
        if self.attention_gates:
            x2 = AttentionBlock(f[0], self.norm, name="att3")(d3, x2, train)
        d3 = ConvBlock(f[1], self.norm, name="dec3")(
            jnp.concatenate([x2, d3], axis=-1), train)

        d2 = UpConv(f[0], self.norm, name="up2")(d3, train)
        if self.attention_gates:
            x1 = AttentionBlock(f[0] // 2, self.norm, name="att2")(d2, x1, train)
            d2 = ConvBlock(f[0], self.norm, name="dec2")(
                jnp.concatenate([x1, d2], axis=-1), train)
            d2 = jnp.concatenate([d2, glob], axis=-1)
        else:
            d2 = ConvBlock(f[0], self.norm, name="dec2")(
                jnp.concatenate([x1, d2, glob], axis=-1), train)
        out = TorchConv(self.output_ch, (1, 1), name="final_conv")(d2)
        return {"seg_2d": out}


class LGCANetV3(nn.Module):
    """Full model (LGCANet_V3, lgca_net_v3.py:579-658).

    __call__(volume (1, D, Hv, Wv, 1), slices (B, H, W, 1)) →
      {'seg_2d': (B, H, W, K), 'dsv': (1, D, Hv, Wv, K)}.

    NOTE the data contract: the volume enters at HALF the slice resolution
    (Hv = H/2) — the pipeline downsamples it by `context_net_downsample_scale`
    (example.yml:45-48) — so the 3D pyramid level d_i spatially matches the 2D
    encoder level x_{i+1}.
    """
    output_ch: int = 6
    norm: str = "BatchNorm2d"
    feature_scale: float = 1.0
    attention_gates: bool = False

    @nn.compact
    def __call__(self, volume, slices, train: bool = False):
        feats = FeatureNet(self.output_ch, name="context_net")(volume)
        B, H, W, _ = slices.shape
        # AdaptiveAvgPool3d(1) of p4, broadcast to slice res (lgca:605-609)
        glob = jnp.mean(feats["d4"], axis=(1, 2, 3))                  # (1, 64)
        glob = jnp.broadcast_to(glob[:, None, None, :], (1, H, W, glob.shape[-1]))
        glob = jnp.broadcast_to(glob, (B, H, W, glob.shape[-1]))
        feats2d = {k: feats[k] for k in ("d1", "d2", "d3", "d4")}
        feats2d["glob_feat"] = glob

        out = FusedUNet(self.output_ch, self.norm, self.feature_scale,
                        self.attention_gates, name="unet")(slices, feats2d, train)
        out["dsv"] = feats["dsv"]
        return out

    @staticmethod
    def loss(pred, target):
        """2D per-class dice + 3D dsv dice (lgca_net_v3.py:629-649)."""
        from rpnet_tpu.models.losses import dice_loss_per_class

        p2 = pred["seg_2d"]
        t2 = target["mask"]
        K = p2.shape[-1]
        unet_dice = dice_loss_per_class(p2.reshape(-1, K), t2.reshape(-1, K))
        p3 = pred["dsv"]
        t3 = target["downsampled_volume_mask"]
        dsv_dice = dice_loss_per_class(p3.reshape(-1, K), t3.reshape(-1, K))
        return {"unet_dice": unet_dice, "loss_dice": unet_dice + dsv_dice}
