"""VGG16 few-shot encoder (rebuild of net/vgg.py:8-74).

5 conv stages; the first three followed by stride-2 maxpool (k3 p1), the
fourth by a stride-1 maxpool, the fifth dilated ×2 with no final ReLU →
512-channel features at 1/8 resolution. Weights kaiming-normal (relu) like
the reference's `_init_weights` (net/vgg.py:60-63); torchvision-VGG16 warm
start is handled by the checkpoint converter (train/convert.py).
"""

from __future__ import annotations

from flax import linen as nn

from rpnet_tpu.models.blocks import TorchConv, kaiming_normal_relu
from rpnet_tpu.ops.sampling import max_pool2d


class VGGEncoder(nn.Module):
    """Input (B, H, W, 3) → {'d4': (B, H/8, W/8, 512)}."""

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        def stage(x, n_convs, feats, name, dilation=1, last_relu=True):
            for i in range(n_convs):
                x = TorchConv(feats, (3, 3),
                              kernel_dilation=(dilation, dilation),
                              padding=[(dilation, dilation)] * 2,
                              kernel_init=kaiming_normal_relu,
                              name=f"{name}_conv{i + 1}")(x)
                if i != n_convs - 1 or last_relu:
                    x = nn.relu(x)
            return x

        x = stage(x, 2, 64, "stage1")
        x = max_pool2d(x, 3, 2, 1)
        x = stage(x, 2, 128, "stage2")
        x = max_pool2d(x, 3, 2, 1)
        x = stage(x, 3, 256, "stage3")
        x = max_pool2d(x, 3, 2, 1)
        x = stage(x, 3, 512, "stage4")
        x = max_pool2d(x, 3, 1, 1)
        x = stage(x, 3, 512, "stage5", dilation=2, last_relu=False)
        return {"d4": x}
