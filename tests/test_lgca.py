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


def test_lgca_end_to_end_train_and_eval(tmp_path):
    """VERDICT r1 item 5: `net: LGCANet_V3` actually RUNS — data path →
    jitted train step → whole-volume eval, end to end on synthetic NRRDs."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rpnet_tpu.core.synthetic import generate_dataset
    from rpnet_tpu.episode.lgca_data import LGCAVolumeSampler
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.train.lgca import (evaluate_lgca_volume, init_lgca_state,
                                      make_lgca_train_step)
    from rpnet_tpu.train.trainer import make_optimizer

    paths = generate_dataset(str(tmp_path), n_train=2, n_test=1,
                             shape=(16, 32, 32), seed=0)
    cfg = Config({"data_dir": paths["data_dir"],
                  "train_set_name": paths["train_csv"],
                  "eval_set_name": paths["test_csv"],
                  "net": "LGCANet_V3", "roi_names": ["Liver", "Spleen"],
                  "num_slice": 16, "num_x": 32, "num_y": 32,
                  "context_net_downsample_scale": [2, 2, 2],
                  "lgca_slices": 4, "HU_range": [-1024, 3072],
                  "init_lr": 1e-3, "unet_normalize_type": "BatchNorm2d"})

    sampler = LGCAVolumeSampler(cfg["data_dir"], cfg["train_set_name"], cfg,
                                mode="train")
    assert len(sampler) == 2
    s = sampler.sample(0, rng=np.random.RandomState(0))
    D, H, W = sampler.shape
    assert s["volume"].shape == (1, D // 2, H // 2, W // 2, 1)
    assert s["slices"].shape == (4, H, W, 1)
    assert s["mask"].shape == (4, H, W, 2)

    model = model_factory["LGCANet_V3"](cfg)
    opt = make_optimizer(cfg)
    state = init_lgca_state(model, cfg, jax.random.PRNGKey(0), sampler,
                            optimizer=opt)
    step = jax.jit(make_lgca_train_step(model, cfg, opt))
    batch = tuple(map(jnp.asarray, (s["volume"], s["slices"], s["mask"],
                                    s["downsampled_volume_mask"])))
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]            # it learns on a single batch

    ev = LGCAVolumeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg,
                           mode="eval")
    sample = ev.sample(0)
    dices = evaluate_lgca_volume(
        model, {"params": state["params"],
                "batch_stats": state["batch_stats"]}, sample, chunk=8)
    assert set(dices.keys()) == {"class_0", "class_1"}
    for v in dices.values():
        assert v is None or 0.0 <= v <= 1.0


def test_lgca_volume_cache_identical_and_bounded(tmp_path):
    """The LGCA sampler's volume LRU (mirrors the episodic sampler's):
    cached and uncached samples are identical, the bound holds, and cached
    entries are immutable (sample() never hands out writable cache views)."""
    import numpy as np

    from rpnet_tpu.core.synthetic import generate_dataset
    from rpnet_tpu.episode.lgca_data import LGCAVolumeSampler

    paths = generate_dataset(str(tmp_path), n_train=3, n_test=1,
                             shape=(12, 24, 24), seed=3)
    base = Config({"data_dir": paths["data_dir"],
                   "train_set_name": paths["train_csv"],
                   "eval_set_name": paths["test_csv"],
                   "net": "LGCANet_V3", "roi_names": ["Liver"],
                   "num_slice": 12, "num_x": 24, "num_y": 24,
                   "context_net_downsample_scale": [2, 2, 2],
                   "lgca_slices": 4, "HU_range": [-1024, 3072]})
    cold = LGCAVolumeSampler(base["data_dir"], base["train_set_name"],
                             base.replace(volume_cache=0), mode="train")
    warm = LGCAVolumeSampler(base["data_dir"], base["train_set_name"],
                             base.replace(volume_cache=1), mode="train")
    for rep in range(2):                      # second pass hits the cache
        for i in range(len(warm)):
            a = cold.sample(i, rng=np.random.RandomState(7 * rep + i))
            b = warm.sample(i, rng=np.random.RandomState(7 * rep + i))
            for k in ("volume", "slices", "mask", "downsampled_volume_mask",
                      "slice_idx"):
                np.testing.assert_array_equal(a[k], b[k], err_msg=k)
            b["slices"][:] = -7.0             # outputs must be owned copies
    assert len(warm._vol_cache) == 1          # bound respected
    assert len(cold._vol_cache) == 0          # disabled = never populated


def test_lgca_sharded_step_matches_single_device(tmp_path):
    """The mesh-sharded LGCA train step (slice batch on the data axis, 3D
    context volume replicated — the torch-data_parallel layout of
    lgca_net_v3.py:600,615,622) must produce the SAME loss trajectory and
    params as the single-device step: GSPMD keeps BN statistics global, so
    sharding is purely a layout decision."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rpnet_tpu.core.synthetic import generate_dataset
    from rpnet_tpu.episode.lgca_data import LGCAVolumeSampler
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.parallel.mesh import make_mesh
    from rpnet_tpu.train.lgca import (evaluate_lgca_volume, init_lgca_state,
                                      make_lgca_train_step,
                                      sharded_lgca_train_step)
    from rpnet_tpu.train.trainer import make_optimizer

    paths = generate_dataset(str(tmp_path), n_train=2, n_test=1,
                             shape=(16, 32, 32), seed=0)
    cfg = Config({"data_dir": paths["data_dir"],
                  "train_set_name": paths["train_csv"],
                  "eval_set_name": paths["test_csv"],
                  "net": "LGCANet_V3", "roi_names": ["Liver", "Spleen"],
                  "num_slice": 16, "num_x": 32, "num_y": 32,
                  "context_net_downsample_scale": [2, 2, 2],
                  "lgca_slices": 8, "HU_range": [-1024, 3072],
                  "init_lr": 1e-3, "unet_normalize_type": "BatchNorm2d"})
    sampler = LGCAVolumeSampler(cfg["data_dir"], cfg["train_set_name"], cfg,
                                mode="train")
    s = sampler.sample(0, rng=np.random.RandomState(0))
    batch = (s["volume"], s["slices"], s["mask"],
             s["downsampled_volume_mask"])

    model = model_factory["LGCANet_V3"](cfg)
    opt = make_optimizer(cfg)
    state0 = init_lgca_state(model, cfg, jax.random.PRNGKey(0), sampler,
                             optimizer=opt)

    mesh = make_mesh({"data": 8, "model": 1})
    run = sharded_lgca_train_step(model, cfg, opt, mesh)
    import copy
    sh_state = jax.tree_util.tree_map(np.copy, state0)
    sd_state = jax.tree_util.tree_map(np.copy, state0)
    step = jax.jit(make_lgca_train_step(model, cfg, opt))

    for _ in range(2):
        sh_state, sh_m = run(sh_state, batch)
        sd_state, sd_m = step(sd_state, tuple(map(jnp.asarray, batch)))
        # sharded reductions (BN batch stats, grad sums) use a different
        # reduction tree — equality holds to reduction-order noise only
        np.testing.assert_allclose(float(sh_m["loss"]), float(sd_m["loss"]),
                                   rtol=1e-3)
    leaves_sh = jax.tree_util.tree_leaves(sh_state["params"])
    leaves_sd = jax.tree_util.tree_leaves(sd_state["params"])
    # Adam amplifies reduction-order noise (update ∝ g/√v is scale-free, so
    # a near-zero gradient whose SIGN flips under a different reduction tree
    # moves the param by ~lr); layout BUGS produce O(1) differences
    for a, b in zip(leaves_sh, leaves_sd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    # sharded eval chunk path
    ev = LGCAVolumeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg,
                           mode="eval")
    sample = ev.sample(0)
    var = {"params": sh_state["params"], "batch_stats": sh_state["batch_stats"]}
    d_mesh = evaluate_lgca_volume(model, var, sample, chunk=8, mesh=mesh)
    d_single = evaluate_lgca_volume(model, var, sample, chunk=8)
    for k in d_single:
        if d_single[k] is None:
            assert d_mesh[k] is None
        else:
            np.testing.assert_allclose(d_mesh[k], d_single[k], atol=1e-3)


def test_lgca_cli_branches(tmp_path):
    """The CLIs route `net: LGCANet_V3` to the LGCA driver end to end."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as eval_cli
    from rpnet_tpu.cli import train as train_cli
    from rpnet_tpu.core.synthetic import generate_dataset

    paths = generate_dataset(str(tmp_path / "d"), n_train=1, n_test=1,
                             shape=(16, 32, 32), seed=1)
    cfg = dict(data_dir=paths["data_dir"],
               train_set_name=paths["train_csv"],
               eval_set_name=paths["test_csv"],
               net="LGCANet_V3", roi_names=["Liver", "Spleen"],
               num_slice=16, num_x=32, num_y=32,
               context_net_downsample_scale=[2, 2, 2],
               lgca_slices=4, HU_range=[-1024, 3072],
               init_lr=1e-3, unet_normalize_type="BatchNorm2d",
               epochs=1, epoch_save=1, n_test_iter_refinement=2,
               out_dir=str(tmp_path / "out"))
    ypath = str(tmp_path / "cfg.yml")
    with open(ypath, "w") as f:
        pyyaml.safe_dump(cfg, f)

    state = train_cli.main(["--yaml", ypath, "--episodes-per-epoch", "1"])
    assert state is not None and state["step"] == 1

    results = eval_cli.main(["--yaml", ypath])
    assert "Liver" in results["classes"]
