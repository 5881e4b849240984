"""Context relation encoders (rebuild of net/rp_net.py:45-84).

`ContextCorrelationEncoder`: foreground-masked vs background-masked feature
maps go through 3×3 conv projections (w_k / w_q), a RAFT-style local
correlation (radius r → (2r+1)² channels) and a 1×1 conv down to 64 features.
The correlation itself never materializes the (H'W')² matrix — see
ops/correlation.py.

Note: the reference also defines `w_context` and `out` submodules that its
forward never uses (net/rp_net.py:60-74) — dead weights, not rebuilt.

`SimpleConcat`: the `use_relation_enc: concat` path. The reference *references*
a SimpleConcat class that is never defined (net/rp_net.py:224 — crashes at
construction); here it is implemented sensibly as concat(features, mask) → 1×1
conv → 64, so the config option actually works.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from flax import linen as nn

from rpnet_tpu.models.blocks import (ConvParams, Norm2d, TorchConv,
                                     conv_kernel_init)
from rpnet_tpu.ops.correlation import local_correlation

NUM_FEAT = 64


class _ConvKernel(nn.Module):
    """Bare 1×1-conv kernel param with a TorchConv-compatible tree path
    (<name>/conv/kernel) so checkpoints and the torch converter are unchanged
    while the CALLER chooses how to apply it (models/cre.py's rot path folds
    a channel permutation + 121→128 zero-pad into the weights)."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        class _Holder(nn.Module):
            features: int
            in_features: int

            @nn.compact
            def __call__(self2):
                return self2.param(
                    "kernel", conv_kernel_init,
                    (1, 1, self2.in_features, self2.features), jnp.float32)

        return _Holder(self.features, self.in_features, name="conv")()


def _conv1x1(x, kernel):
    """Exactly nn.Conv's primitive for a 1×1 kernel (bit-identical path)."""
    return jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ContextCorrelationEncoder(nn.Module):
    radius: int = 5
    use_pallas: bool = True   # VMEM-resident kernel on TPU (ops/pallas)

    @nn.compact
    def __call__(self, fm1, fm2, train: bool = False):
        """fm1 = fg-masked features, fm2 = bg-masked features; (B, h, w, C)."""
        C = fm1.shape[-1]
        d = 2 * self.radius + 1
        impl = os.environ.get("RPNET_CORR_IMPL")
        W = fm1.shape[-2]
        on_tpu = jax.default_backend() == "tpu"
        # default on TPU; RPNET_CORR_IMPL=rot forces it anywhere (interpret
        # mode off-TPU — how tests/test_models.py covers the path on CPU)
        use_rot = (self.use_pallas and not train
                   and (impl == "rot" or (impl is None and on_tpu))
                   and W + 2 * self.radius <= 128 and d * d <= 128)

        fm1 = TorchConv(C, (3, 3), name="w_k_conv")(fm1)
        fm1 = Norm2d(name="w_k_norm")(fm1, train)
        fm1 = nn.relu(fm1)
        if use_rot:
            # the rot correlation kernel wants fm2 column-REVERSED. Flipping
            # its OUTPUT can't fuse (the consumer is a Pallas custom call —
            # profiled as a standalone 1.5 ms reverse + a 2.1 ms unfused relu
            # per episode); flipping the conv INPUT fuses into the conv's
            # input fusion (its producer is the mask mul), and running the
            # conv with W-flipped taps makes the output ≡ flip(conv(x)):
            # norm/relu are spatially equivariant, so fm2 arrives pre-flipped
            # with zero standalone passes. Same params/tree as TorchConv.
            k_q, b_q = ConvParams(C, C, name="w_q_conv")()
            fm2 = jax.lax.conv_general_dilated(
                fm2[:, :, ::-1, :], k_q[:, ::-1].astype(fm2.dtype),
                (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            fm2 = fm2 + b_q.astype(fm2.dtype)
        else:
            fm2 = TorchConv(C, (3, 3), name="w_q_conv")(fm2)
        fm2 = Norm2d(name="w_q_norm")(fm2, train)
        fm2 = nn.relu(fm2)

        # q_conv_corr kernel as a bare param (same tree path as TorchConv)
        corr_kernel = _ConvKernel(NUM_FEAT, d * d, name="q_conv_corr")()

        if use_rot:
            # eval fast path: MXU+rotate kernel emits channels-last dy-major
            # dx-reversed (B, h, w, 128) with zero lanes d²..127; the
            # permutation AND the pad fold into the conv weights — no
            # transpose/slice/astype pass between kernel and conv
            # (ops/pallas/correlation.py). Eval-only: no backward, and
            # training keeps f32-exact products (VPU kernel).
            from rpnet_tpu.ops.pallas.correlation import (
                pallas_rot_vmappable, rot_channel_perm)
            corr = pallas_rot_vmappable(self.radius, interpret=not on_tpu,
                                        fm2_reversed=True)(fm1, fm2)
            perm = rot_channel_perm(self.radius)
            k128 = jnp.zeros((1, 1, 128, NUM_FEAT), corr_kernel.dtype)
            k128 = k128.at[:, :, perm, :].set(corr_kernel)
            corr_kernel = k128
        elif self.use_pallas:
            # Pallas kernel on TPU for BOTH inference and training: the
            # trainable wrapper composes with the trainer's episode vmap
            # (custom_vmap folds episodes into the kernel's batch grid axis)
            # and with autodiff (analytic XLA backward). XLA fallback off-TPU.
            from rpnet_tpu.ops.pallas.correlation import local_correlation_auto
            corr = local_correlation_auto(fm1, fm2, self.radius)
        else:
            corr = local_correlation(fm1, fm2, self.radius)  # (B, h, w, (2r+1)²)
        # the reference concatenates [corr, fm1] then applies one 1×1 conv
        # (net/rp_net.py:81); by linearity that equals two 1×1 convs summed —
        # which skips materializing the 377-channel concat every refinement
        # iteration (profiled at ~10ms/iter of pure HBM copies on v5e).
        # Checkpoint conversion splits the torch kernel accordingly.
        x = (_conv1x1(corr, corr_kernel)
             + TorchConv(NUM_FEAT, (1, 1), name="q_conv_fm")(fm1))
        x = Norm2d(name="q_norm")(x, train)
        return nn.relu(x)


class SimpleConcat(nn.Module):
    """concat(features, mask) → 1×1 conv → 64 (the `concat` relation mode)."""

    @nn.compact
    def __call__(self, fts, mask, train: bool = False):
        x = jnp.concatenate([fts, mask], axis=-1)
        x = TorchConv(NUM_FEAT, (1, 1), name="proj_conv")(x)
        x = Norm2d(name="proj_norm")(x, train)
        return nn.relu(x)
