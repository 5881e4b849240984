"""LGCANet_V3 structural tests (secondary model family, SURVEY.md §2.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn.functional as F

from rpnet_tpu.config import Config
from rpnet_tpu.models.factory import model_factory
from rpnet_tpu.models.lgca import (FeatureNet, LGCANetV3, adaptive_max_pool2d,
                                   instance_norm_3d)


def test_adaptive_max_pool_matches_torch(rng):
    x = rng.randn(2, 13, 17, 3).astype(np.float32)
    out = np.asarray(adaptive_max_pool2d(jnp.asarray(x), 4))
    ref = F.adaptive_max_pool2d(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), 4)
    np.testing.assert_allclose(np.transpose(out, (0, 3, 1, 2)), ref.numpy(),
                               atol=1e-6)


def test_instance_norm_matches_torch(rng):
    x = rng.randn(2, 4, 6, 6, 5).astype(np.float32)
    ours = np.asarray(instance_norm_3d(jnp.asarray(x)))
    xt = torch.from_numpy(np.transpose(x, (0, 4, 1, 2, 3)))
    ref = F.instance_norm(xt, eps=1e-5).numpy()
    np.testing.assert_allclose(np.transpose(ours, (0, 4, 1, 2, 3)), ref, atol=1e-4)


def test_featurenet_pyramid_shapes(rng):
    vol = jnp.asarray(rng.randn(1, 8, 16, 16, 1).astype(np.float32))
    net = FeatureNet(out_channels=3)
    v = net.init(jax.random.PRNGKey(0), vol)
    out = net.apply(v, vol)
    assert out["d1"].shape == (1, 8, 16, 16, 24)
    assert out["d2"].shape == (1, 4, 8, 8, 32)
    assert out["d3"].shape == (1, 2, 4, 4, 64)
    assert out["d4"].shape == (1, 1, 2, 2, 64)
    assert out["dsv"].shape == (1, 8, 16, 16, 3)


@pytest.mark.parametrize("gates", [False, True])
def test_lgcanet_forward(rng, gates):
    model = LGCANetV3(output_ch=3, attention_gates=gates)
    # volume enters at HALF the slice resolution (context_net_downsample_scale)
    vol = jnp.asarray(rng.randn(1, 8, 16, 16, 1).astype(np.float32))
    sl = jnp.asarray(rng.randn(2, 32, 32, 1).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), vol, sl, train=False)
    out = model.apply(v, vol, sl, train=False)
    assert out["seg_2d"].shape == (2, 32, 32, 3)
    assert out["dsv"].shape == (1, 8, 16, 16, 3)
    assert np.isfinite(np.asarray(out["seg_2d"])).all()

    # loss plumbing
    target = {"mask": jnp.asarray((rng.rand(2, 32, 32, 3) > 0.8).astype(np.float32)),
              "downsampled_volume_mask":
                  jnp.asarray((rng.rand(1, 8, 16, 16, 3) > 0.8).astype(np.float32))}
    losses = LGCANetV3.loss(out, target)
    assert losses["loss_dice"].shape == (3,)
    assert np.isfinite(np.asarray(losses["loss_dice"])).all()


def test_lgcanet_factory():
    cfg = Config({"net": "LGCANet_V3", "roi_names": ["a", "b"],
                  "net_UNet": "AttU_Net"})
    model = model_factory["LGCANet_V3"](cfg)
    assert model.output_ch == 2 and model.attention_gates
