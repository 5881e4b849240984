"""Multi-chip tests on the virtual 8-device CPU mesh (SURVEY.md §4 item 4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rpnet_tpu.config import Config
from rpnet_tpu.models.factory import model_factory
from rpnet_tpu.parallel.mesh import make_mesh, shard_params


def _tiny_cfg(H=32):
    return Config({"backbone": "UNet", "crop_size": [H, H], "k": 2,
                   "n_iter_refinement": 2, "mask_refinement_correlation_radius": 1,
                   "reg_affine_iters": 3, "do_deformable": False,
                   "slice_bucket": 8, "max_slices": 16})


def test_mesh_shapes():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh({"data": 4, "model": 2})
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_resolve_local_mesh_policies():
    """The shared driver-mesh resolver (cli/test_rpnet + cli/train LGCA)."""
    from rpnet_tpu.parallel.mesh import resolve_local_mesh

    # auto + batch_divisor: largest divisor of the batch that fits the
    # device count (a 4-slice batch on 8 devices → dp=4, not an error)
    mesh = resolve_local_mesh(None, batch_divisor=4)
    assert dict(mesh.shape) == {"data": 4, "model": 1}
    # a prime batch larger than the device count still resolves (dp=1)
    mesh = resolve_local_mesh(None, batch_divisor=13)
    assert dict(mesh.shape) == {"data": 1, "model": 1}
    # auto without a divisor: all local devices on data
    mesh = resolve_local_mesh(None)
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    # explicit shape passes through on a single process
    mesh = resolve_local_mesh({"data": 4, "model": 2})
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    # explicit shape that cannot divide the sharded batch is a clear error
    with pytest.raises(ValueError, match="must divide"):
        resolve_local_mesh({"data": 8}, batch_divisor=4)
    # explicit shape SMALLER than the host: first N devices (e.g. {data: 1}
    # for single-device eval that bit-matches a serving artifact)
    mesh = resolve_local_mesh({"data": 1, "model": 1})
    assert dict(mesh.shape) == {"data": 1, "model": 1}
    assert mesh.devices.ravel().tolist() == [jax.local_devices()[0]]


def test_param_sharding_rule(rng):
    mesh = make_mesh({"data": 4, "model": 2})
    cfg = _tiny_cfg()
    model = model_factory["RP_Net"](cfg, num_iter=1)
    H = 32
    dummy = (jnp.zeros((1, 1, 1, H, H, 1)), jnp.zeros((1, 1, 1, H, H)),
             jnp.ones((1, 1, 1, H, H)), jnp.zeros((1, H, H, 1)),
             jnp.zeros((1, H, H)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    shardings = shard_params(variables["params"], mesh, min_channels=256)
    leaves = jax.tree_util.tree_leaves_with_path(shardings)
    # at least the widest conv kernels get a model-axis sharding
    sharded = [s for _, s in leaves if "model" in str(s.spec)]
    assert len(sharded) > 0


def test_sharded_episode_matches_single_device(rng):
    """SP over the slice axis: 8-way sharded eval ≡ single-device eval."""
    from rpnet_tpu.episode.pipeline import EpisodeRunner
    from rpnet_tpu.episode.sampler import Episode

    cfg = _tiny_cfg()
    model = model_factory["RP_Net"](cfg, num_iter=2)
    H = 32
    dummy = (jnp.zeros((1, 1, 1, H, H, 1)), jnp.zeros((1, 1, 1, H, H)),
             jnp.ones((1, 1, 1, H, H)), jnp.zeros((1, H, H, 1)),
             jnp.zeros((1, H, H)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)

    Dq = 6
    yy, xx = np.meshgrid(np.arange(H), np.arange(H), indexing="ij")
    organ = lambda cy, cx: ((((yy - cy) / 10) ** 2 + ((xx - cx) / 8) ** 2) < 1)
    sl = organ(15, 14).astype(np.float32)
    ql = organ(17, 17).astype(np.float32)
    ep = Episode(
        support_images=(np.repeat(sl[None], Dq, 0) * 0.8 - 0.5)[None].astype(np.float32),
        support_labels=np.repeat(sl[None], Dq, 0)[None].astype(np.float32),
        query_images=(np.repeat(ql[None], Dq, 0) * 0.8 - 0.5).astype(np.float32),
        query_labels=np.repeat(ql[None], Dq, 0).astype(np.float32),
        class_id=0, pid="x", supp_pids=[(0, 0)])

    single = EpisodeRunner(model, variables, cfg)
    res1 = single.run(ep)

    mesh = make_mesh({"data": 8, "model": 1})
    sharded = EpisodeRunner(model, variables, cfg, mesh=mesh)
    res8 = sharded.run(ep)

    assert res8["dsc_affine"] == pytest.approx(res1["dsc_affine"], abs=1e-4)
    assert res8["dsc_fewshot"] == pytest.approx(res1["dsc_fewshot"], abs=1e-4)
    for k in res1["dsc_refinement"]:
        assert res8["dsc_refinement"][k] == pytest.approx(
            res1["dsc_refinement"][k], abs=1e-4)


def test_dryrun_multichip_entrypoint():
    """The driver's multichip dry run must work on the virtual mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_sharded_train_step(rng):
    """The mesh-sharded train step API runs and moves params."""
    import jax.numpy as jnp

    from rpnet_tpu.train.trainer import (init_train_state, make_optimizer,
                                         sharded_train_step)

    mesh = make_mesh({"data": 4, "model": 2})
    cfg = Config({"backbone": "UNet", "crop_size": [16, 16], "k": 2,
                  "n_iter_refinement": 1, "mask_refinement_correlation_radius": 1,
                  "reg_affine_iters": 2, "init_lr": 1e-4})
    model = model_factory["RP_Net"](cfg, num_iter=1)
    opt = make_optimizer(cfg)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    run = sharded_train_step(model, cfg, opt, mesh)
    E, k, H = 4, 2, 16
    batch = (rng.randn(E, 1, k, H, H).astype(np.float32) * 0.1,
             (rng.rand(E, 1, k, H, H) > 0.8).astype(np.float32),
             rng.randn(E, k, H, H).astype(np.float32) * 0.1,
             (rng.rand(E, k, H, H) > 0.8).astype(np.float32))
    new_state, metrics = run(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert new_state["step"] == 1


def test_aot_train_step_roundtrips(rng):
    """The AOT-compiled train step (the CLIs' path) accepts its own output
    state back — one compile total. Plain jit recompiles the full training
    program on step 2 on TPU (output param LAYOUTS re-key the cache; measured
    136s at 256²) — utils/device.aot_compile_step is the fix."""
    from rpnet_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)
    from rpnet_tpu.utils.device import aot_compile_step

    cfg = Config({"backbone": "UNet", "crop_size": [16, 16], "k": 2,
                  "n_iter_refinement": 1, "mask_refinement_correlation_radius": 1,
                  "reg_affine_iters": 2, "init_lr": 1e-4})
    model = model_factory["RP_Net"](cfg, num_iter=1)
    opt = make_optimizer(cfg)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    E, k, H = 1, 2, 16
    step = aot_compile_step(make_train_step(model, cfg, opt), state,
                            ((E, 1, k, H, H), (E, 1, k, H, H),
                             (E, k, H, H), (E, k, H, H)))
    batch = (rng.randn(E, 1, k, H, H).astype(np.float32) * 0.1,
             (rng.rand(E, 1, k, H, H) > 0.8).astype(np.float32),
             rng.randn(E, k, H, H).astype(np.float32) * 0.1,
             (rng.rand(E, k, H, H) > 0.8).astype(np.float32))
    state, m1 = step(state, tuple(map(jnp.asarray, batch)))
    state, m2 = step(state, tuple(map(jnp.asarray, batch)))
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) != float(m1["loss"])   # params actually moved
    assert int(state["step"]) == 2


def test_train_step_deep_supervision(rng):
    """deep_supervision: true supervises every refinement iterate — loss is
    finite, differs from final-only, and params still move."""
    from rpnet_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)

    base = {"backbone": "UNet", "crop_size": [16, 16], "k": 2,
            "n_iter_refinement": 2, "mask_refinement_correlation_radius": 1,
            "reg_affine_iters": 2, "init_lr": 1e-3}
    E, k, H = 1, 2, 16
    batch = (rng.randn(E, 1, k, H, H).astype(np.float32) * 0.1,
             (rng.rand(E, 1, k, H, H) > 0.8).astype(np.float32),
             rng.randn(E, k, H, H).astype(np.float32) * 0.1,
             (rng.rand(E, k, H, H) > 0.8).astype(np.float32))
    segs = {}
    for ds in (False, True):
        cfg = Config(dict(base, deep_supervision=ds))
        model = model_factory["RP_Net"](cfg, align=True, num_iter=2)
        opt = make_optimizer(cfg)
        state = init_train_state(model, cfg, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, cfg, opt))
        p0 = jax.tree_util.tree_leaves(state["params"])[0].copy()
        state, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        assert not np.allclose(
            np.asarray(p0),
            np.asarray(jax.tree_util.tree_leaves(state["params"])[0]))
        segs[ds] = float(metrics["seg_loss"])
    assert segs[True] != segs[False]   # the iterates really enter the loss

    # linear weighting (weight ∝ iter+1) is a third distinct loss surface
    cfg = Config(dict(base, deep_supervision=True,
                      deep_supervision_weights="linear"))
    model = model_factory["RP_Net"](cfg, align=True, num_iter=2)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg, make_optimizer(cfg)))
    _, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["seg_loss"]) not in (segs[True], segs[False])


def test_train_step_mixed_precision_bf16(rng):
    """compute_dtype: bfloat16 trains with f32 master params: loss finite,
    grads flow (params move), batch_stats stay f32."""
    import jax.numpy as jnp

    from rpnet_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)

    cfg = Config({"backbone": "UNet", "crop_size": [16, 16], "k": 2,
                  "n_iter_refinement": 1, "mask_refinement_correlation_radius": 1,
                  "reg_affine_iters": 2, "init_lr": 1e-3,
                  "compute_dtype": "bfloat16"})
    model = model_factory["RP_Net"](cfg, num_iter=1)
    opt = make_optimizer(cfg)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg, opt))
    E, k, H = 1, 2, 16
    batch = (rng.randn(E, 1, k, H, H).astype(np.float32) * 0.1,
             (rng.rand(E, 1, k, H, H) > 0.8).astype(np.float32),
             rng.randn(E, k, H, H).astype(np.float32) * 0.1,
             (rng.rand(E, k, H, H) > 0.8).astype(np.float32))
    p0 = jax.tree_util.tree_leaves(state["params"])[0].copy()
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    leaves = jax.tree_util.tree_leaves(state["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state["batch_stats"]))
    assert not np.allclose(np.asarray(p0),
                           np.asarray(jax.tree_util.tree_leaves(state["params"])[0]))
