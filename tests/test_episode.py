"""Episodic integration tests on a synthetic NRRD dataset (SURVEY.md §4
item 3): the fake-data story the reference never had, runnable on CPU."""

import os
import random

import numpy as np
import pytest

import jax

from rpnet_tpu.config import Config
from rpnet_tpu.core.synthetic import generate_dataset
from rpnet_tpu.episode.pipeline import EpisodeRunner
from rpnet_tpu.episode.sampler import EpisodeSampler, slice_bins
from rpnet_tpu.models.factory import model_factory


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("synthdata"))
    return generate_dataset(root, n_train=3, n_test=3, shape=(20, 48, 48), seed=0)


def small_config(paths, **kw):
    base = dict(
        data_dir=paths["data_dir"],
        class_csv_dir=paths["class_dir"],
        eval_set_name=paths["test_csv"],
        train_set_name=paths["train_csv"],
        num_slice=32, num_x=48, num_y=48,
        crop_size=[32, 32], pad_value=-1024, HU_range=[-1024, 3072],
        n_shot=1, n_way=1, k=4,
        eval_classes=["Liver"], train_classes=["Spleen"],
        backbone="UNet", n_iter_refinement=2, n_test_iter_refinement=2,
        mask_refinement_correlation_radius=2, soft_mask=False,
        use_registration_loss=True, use_registration_mask=True,
        do_deformable=False, reg_affine_iters=8,
        slice_bucket=8, max_slices=32, do_intaug=False, do_elastic=False,
    )
    base.update(kw)
    return Config(base)


def test_slice_bins_match_reference_rule():
    k, sidx, edges = slice_bins([10], 10, 4)
    assert k == 4
    # floor(arange(n/k/2, n, n/k)) for n=10,k=4 → floor([1.25,3.75,6.25,8.75])
    np.testing.assert_array_equal(sidx[0], [1, 3, 6, 8])
    np.testing.assert_array_equal(edges, [0, 2, 5, 7, 10])
    # k clamps to the shortest volume
    k2, _, _ = slice_bins([3], 10, 12)
    assert k2 == 3


def test_volume_cache_identical_and_bounded(synth):
    """The sampler's volume LRU returns value-identical (read-only) results
    and respects its size bound; volume_cache: 0 disables it entirely."""
    cfg = small_config(synth)
    s_cached = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg,
                              mode="eval")
    s_plain = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"],
                             cfg.replace(volume_cache=0), mode="eval")
    pid = s_cached.data_info[0][0]["pid"]
    roi = s_cached.classes[0]
    img_c, msk_c = s_cached.load_image_and_mask(pid, roi)
    img_p, msk_p = s_plain.load_image_and_mask(pid, roi)
    np.testing.assert_array_equal(img_c, img_p)
    np.testing.assert_array_equal(msk_c, msk_p)
    assert not img_c.flags.writeable and not msk_c.flags.writeable
    assert img_p.flags.writeable  # uncached path untouched
    # second load is the SAME cached objects
    img_c2, _ = s_cached.load_image_and_mask(pid, roi)
    assert img_c2 is img_c
    assert len(s_plain._vol_cache) == 0
    # eviction: bound the cache at 1 and load two volumes
    s1 = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"],
                        cfg.replace(volume_cache=1), mode="eval")
    s1.load_image_and_mask(s1.data_info[0][0]["pid"], roi)
    s1.load_image_and_mask(s1.data_info[0][1]["pid"], roi)
    assert len(s1._vol_cache) == 1
    # full episodes agree end to end
    random.seed(3)
    ep_c = s_cached.sample(0)
    random.seed(3)
    ep_p = s_plain.sample(0)
    np.testing.assert_array_equal(ep_c.query_images, ep_p.query_images)
    np.testing.assert_array_equal(ep_c.support_labels, ep_p.support_labels)


def test_sampler_eval_episode_shapes(synth):
    cfg = small_config(synth)
    random.seed(0)
    s = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg, mode="eval")
    assert len(s) == 3  # 3 test patients × 1 class
    ep = s.sample(0)
    ts, Dq, H, W = ep.support_images.shape
    assert ts == 1 and (H, W) == (32, 32)
    assert ep.query_images.shape == (Dq, H, W)
    assert set(np.unique(ep.support_labels)) <= {0.0, 1.0}
    assert ep.query_labels.max() == 1.0
    # supports never include the query volume
    for ci, di in ep.supp_pids:
        assert s.data_info[ci][di]["pid"] != ep.pid


def test_sampler_support_draw_reproducible(synth):
    cfg = small_config(synth)
    s = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg, mode="eval")
    random.seed(0)
    a = s.sample(1).supp_pids
    random.seed(0)
    b = s.sample(1).supp_pids
    assert a == b


def test_sampler_train_episode(synth):
    cfg = small_config(synth)
    random.seed(0)
    np.random.seed(0)
    s = EpisodeSampler(cfg["data_dir"], cfg["train_set_name"], cfg, mode="train")
    ep = s.sample(0)
    assert ep.support_images.shape[0] == 1      # shots
    assert ep.support_images.shape[1] == ep.query_images.shape[0] == 4  # k
    assert np.isfinite(ep.query_images).all()


def test_full_episode_pipeline(synth):
    """End-to-end: sampler → fused registration+model+dice program."""
    cfg = small_config(synth)
    random.seed(0)
    s = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg, mode="eval")
    model = model_factory["RP_Net"](cfg, num_iter=2)
    ep = s.sample(0)
    import jax.numpy as jnp

    H, W = 32, 32
    dummy = (jnp.zeros((1, 1, 1, H, W, 1)), jnp.zeros((1, 1, 1, H, W)),
             jnp.ones((1, 1, 1, H, W)), jnp.zeros((1, H, W, 1)),
             jnp.zeros((1, H, W)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    runner = EpisodeRunner(model, variables, cfg)
    res = runner.run(ep)
    # registration prior must be meaningfully aligned on synthetic ellipsoids
    assert res["dsc_affine"] is not None and res["dsc_affine"] > 0.5
    assert res["dsc_fewshot"] is not None
    assert set(res["dsc_refinement"].keys()) == {0, 1}
    # NCC diagnostics are proper correlations (mask-weighted stats exclude
    # padded slices; grid_sample zero-fill means warped-vs-raw ordering is
    # data-dependent, same as the reference's NCC on unpadded episodes)
    assert -1.0 <= res["ncc_warped"] <= 0.0
    assert -1.0 <= res["ncc_raw"] <= 0.0
    assert res["prediction"].shape[1:] == (H, W)


def test_runner_commits_variables_to_device(synth):
    """Regression: checkpoint restore hands back NUMPY leaves, and numpy-leaf
    jit arguments re-upload the whole weight tree on EVERY call (~1 s/episode
    through the axon tunnel, 13x the program itself — round-3 finding). The
    runner must commit the tree to the device once at construction."""
    cfg = small_config(synth)
    model = model_factory["RP_Net"](cfg, num_iter=2)
    H, W = 32, 32
    import jax.numpy as jnp
    dummy = (jnp.zeros((1, 1, 1, H, W, 1)), jnp.zeros((1, 1, 1, H, W)),
             jnp.ones((1, 1, 1, H, W)), jnp.zeros((1, H, W, 1)),
             jnp.zeros((1, H, W)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    # simulate an orbax restore: every leaf becomes a host numpy array
    variables = jax.tree_util.tree_map(np.asarray, variables)
    runner = EpisodeRunner(model, variables, cfg)
    leaves = jax.tree_util.tree_leaves(runner.variables)
    assert leaves and all(isinstance(l, jax.Array) for l in leaves)


def test_cli_end_to_end(synth, tmp_path, capsys):
    """The full CLI drive: yaml → episodes → aggregated mean±std block."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli

    cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / "out"))
    ypath = str(tmp_path / "cfg.yml")
    with open(ypath, "w") as f:
        pyyaml.safe_dump(cfg.to_dict(), f)
    results = cli.main(["--yaml", ypath])
    assert results is not None
    assert "Liver" in results["classes"]
    aff_mean = results["classes"]["Liver"]["affine"][0]
    assert 0.3 < aff_mean <= 1.0
    assert os.path.exists(str(tmp_path / "out" / "results_eval.json"))
    assert os.path.exists(str(tmp_path / "out" / "log_eval"))


def test_cli_eval_restores_checkpoint(synth, tmp_path, capsys, monkeypatch):
    """CLI eval with a ``ckpt`` key: the structure-only fast restore
    (train/checkpoint.py::init_or_restore) must produce the same eval results
    as running with the real-init + overlay path."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli
    from rpnet_tpu.train.checkpoint import save_checkpoint

    cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / "o1"))
    import jax.numpy as jnp
    model = model_factory["RP_Net"](cfg, align=True,
                                    num_iter=cfg["n_test_iter_refinement"])
    H, W = cfg["crop_size"]
    dummy = (jnp.zeros((1, 1, 1, H, W, 1)), jnp.zeros((1, 1, 1, H, W)),
             jnp.ones((1, 1, 1, H, W)), jnp.zeros((1, H, W, 1)),
             jnp.zeros((1, H, W)))
    variables = model.init(jax.random.PRNGKey(7), *dummy, train=False)
    ck = str(tmp_path / "ck")
    save_checkpoint(ck, step=4, variables=variables)

    # run 1: ckpt via the fast structure-only path
    cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / "o1"), ckpt=ck)
    y1 = str(tmp_path / "c1.yml")
    with open(y1, "w") as f:
        pyyaml.safe_dump(cfg.to_dict(), f)
    r1 = cli.main(["--yaml", y1])
    out = capsys.readouterr().out
    assert f"[Loading model from {ck}]" in out
    assert "partial checkpoint" not in out      # fast path actually taken

    # run 2: same weights through the real-init + overlay fallback (the
    # config seed must stay identical — it also drives episode sampling)
    import rpnet_tpu.train.checkpoint as ckpt_mod
    real_ior = ckpt_mod.init_or_restore
    monkeypatch.setattr(ckpt_mod, "init_or_restore",
                        lambda *a, **k: real_ior(*a, **{**k, "fast": False}))
    cfg2 = small_config(synth, n_runs=1, out_dir=str(tmp_path / "o2"),
                        ckpt=ck)
    y2 = str(tmp_path / "c2.yml")
    with open(y2, "w") as f:
        pyyaml.safe_dump(cfg2.to_dict(), f)
    r2 = cli.main(["--yaml", y2])
    assert r1["classes"] == r2["classes"]


def test_prefetching_sampler_matches_serial(synth):
    """Prefetched iteration yields identical episodes + RNG sequence."""
    import random

    from rpnet_tpu.episode.prefetch import PrefetchingSampler

    cfg = small_config(synth)
    s = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg, mode="eval")
    random.seed(0)
    serial = [s.sample(j) for j in range(len(s))]
    random.seed(0)
    prefetched = list(PrefetchingSampler(s, lookahead=2, workers=2))
    assert len(serial) == len(prefetched)
    for a, b in zip(serial, prefetched):
        assert a.pid == b.pid and a.supp_pids == b.supp_pids
        np.testing.assert_array_equal(a.query_images, b.query_images)
        np.testing.assert_array_equal(a.support_images, b.support_images)


def test_volume3d_sliding_window(synth):
    """Whole-volume eval: windows cover, overlaps average, dice sane."""
    import jax.numpy as jnp

    from rpnet_tpu.episode.volume3d import (Volume3DRunner, Volume3DSampler,
                                            match_support_slices)

    np.testing.assert_array_equal(match_support_slices(10, 5), [0, 2, 4, 7, 9])
    np.testing.assert_array_equal(match_support_slices(3, 1), [0])

    cfg = small_config(synth, slice_bucket=4, max_slices=8)
    random.seed(0)
    s = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg, mode="eval")
    v3d = Volume3DSampler(s)
    supp_img, supp_lab, qry_img, qry_lab, meta = v3d.sample(0)
    assert meta["pid"] != meta["supp_pid"]

    model = model_factory["RP_Net"](cfg, num_iter=2)
    H, W = qry_img.shape[1:]
    dummy = (jnp.zeros((1, 1, 1, H, W, 1)), jnp.zeros((1, 1, 1, H, W)),
             jnp.ones((1, 1, 1, H, W)), jnp.zeros((1, H, W, 1)),
             jnp.zeros((1, H, W)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    runner = EpisodeRunner(model, variables, cfg)
    vr = Volume3DRunner(runner, overlap=1)
    res = vr.run_volume(supp_img, supp_lab, qry_img, qry_lab)
    assert res.prediction.shape == qry_img.shape
    assert res.n_windows >= 2          # volume longer than one window
    assert res.dsc_affine is not None and res.dsc_affine > 0.4


def test_cli_determinism(synth, tmp_path):
    """Same seed → identical results across full CLI runs (the reference's
    reproducibility mechanism, test_rpnet.py:8-10; SURVEY §4 item 5)."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli

    cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / "o1"), seed=0,
                       num_workers=0)
    y1 = str(tmp_path / "c1.yml")
    pyyaml.safe_dump(cfg.to_dict(), open(y1, "w"))
    r1 = cli.main(["--yaml", y1])
    cfg2 = small_config(synth, n_runs=1, out_dir=str(tmp_path / "o2"), seed=0,
                        num_workers=0)
    y2 = str(tmp_path / "c2.yml")
    pyyaml.safe_dump(cfg2.to_dict(), open(y2, "w"))
    r2 = cli.main(["--yaml", y2])
    assert r1["classes"]["Liver"]["affine"] == r2["classes"]["Liver"]["affine"]
    assert r1["classes"]["Liver"]["fewshot"] == r2["classes"]["Liver"]["fewshot"]


def test_multishot_fusion(synth):
    """Native 2-shot eval: every shot registered, prototypes fused."""
    import jax.numpy as jnp

    cfg = small_config(synth, n_shot=2, test_shot=1, use_all_supports=True,
                       multishot_fusion=True)
    random.seed(0)
    s = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg, mode="eval")
    ep = s.sample(0)
    assert ep.support_images.shape[0] == 2     # both supports survive

    model = model_factory["RP_Net"](cfg, num_iter=2)
    H, W = 32, 32
    dummy = (jnp.zeros((1, 2, 1, H, W, 1)), jnp.zeros((1, 2, 1, H, W)),
             jnp.ones((1, 2, 1, H, W)), jnp.zeros((1, H, W, 1)),
             jnp.zeros((1, H, W)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    runner = EpisodeRunner(model, variables, cfg)
    res = runner.run(ep)
    assert res["dsc_affine"] is not None and res["dsc_affine"] > 0.5
    assert res["dsc_fewshot"] is not None


def test_use_registration_loss_off_skips_registration(synth):
    """use_registration_loss: False feeds RAW support to the network and the
    prior is the raw support label (config.py documents the reference's
    crash in this mode; this is the sensible lift). The prior Dice must
    equal the raw support/query label Dice — no warp applied."""
    import jax.numpy as jnp

    cfg = small_config(synth, use_registration_loss=False)
    random.seed(0)
    s = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"], cfg, mode="eval")
    model = model_factory["RP_Net"](cfg, num_iter=2)
    ep = s.sample(0)

    H, W = 32, 32
    dummy = (jnp.zeros((1, 1, 1, H, W, 1)), jnp.zeros((1, 1, 1, H, W)),
             jnp.ones((1, 1, 1, H, W)), jnp.zeros((1, H, W, 1)),
             jnp.zeros((1, H, W)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    runner = EpisodeRunner(model, variables, cfg)
    res = runner.run(ep)

    # the "appr" label is the raw support label: its Dice vs query GT equals
    # the raw overlap, computed host-side here
    raw = np.asarray(ep.support_labels[0], np.float32)
    gt = np.asarray(ep.query_labels, np.float32)
    inter = float((raw * gt).sum())
    expect = 2 * inter / max(float(raw.sum() + gt.sum()), 1e-9)
    assert res["dsc_affine"] == pytest.approx(expect, abs=1e-5)
    # and ncc_warped ≡ ncc_raw (no warp happened)
    assert res["ncc_warped"] == pytest.approx(res["ncc_raw"], abs=1e-6)


def test_eval_fault_isolation(synth, tmp_path):
    """One failing episode must not kill the eval pass (SURVEY §5): the run
    completes, the failure is counted, and the results JSON reports it."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli
    from rpnet_tpu.episode.pipeline import EpisodeRunner as RealRunner

    cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / "out"))
    ypath = str(tmp_path / "cfg.yml")
    with open(ypath, "w") as f:
        pyyaml.safe_dump(cfg.to_dict(), f)

    calls = {"n": 0}
    real_finalize = RealRunner.finalize

    # inject at finalize: under the software-pipelined eval loop, device-side
    # errors surface at the blocking FETCH (jax async dispatch), so this is
    # the seam a real compute failure crosses
    def flaky_finalize(self, out, ep, arrays=True):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected episode failure")
        return real_finalize(self, out, ep, arrays=arrays)

    RealRunner.finalize = flaky_finalize
    try:
        results = cli.main(["--yaml", ypath])
    finally:
        RealRunner.finalize = real_finalize

    assert results is not None
    assert results["failed_episodes"] == 1
    # the surviving episodes still aggregated
    assert "Liver" in results["classes"]
    assert calls["n"] == 3  # 3 eval episodes attempted


def test_cli_eval_3d(synth, tmp_path):
    """`eval_3d: true` routes the eval CLI through the whole-volume
    sliding-window path (episode/volume3d.py) — per-class affine/fewshot
    aggregation, no refinement table."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli

    cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / "o3d"),
                       eval_3d=True, overlap_3d=2, slice_bucket=8,
                       max_slices=8, num_workers=0)
    ypath = str(tmp_path / "c3d.yml")
    pyyaml.safe_dump(cfg.to_dict(), open(ypath, "w"))
    results = cli.main(["--yaml", ypath])
    assert results is not None and "Liver" in results["classes"]
    aff_mean = results["classes"]["Liver"]["affine"][0]
    assert 0.3 < aff_mean <= 1.0
    assert results["classes"]["Liver"]["refinement"] == {}


def test_train_cli_end_to_end(synth, tmp_path):
    """RP_Net train CLI: one epoch on synthetic volumes through the AOT-
    compiled step -> orbax checkpoint on disk, finite loss, step advanced."""
    import yaml as pyyaml

    from rpnet_tpu.cli import train as train_cli

    cfg = small_config(synth, out_dir=str(tmp_path / "tr"), batch_size=2,
                       epochs=1, epoch_save=1, init_lr=1e-4,
                       weight_decay=1e-4, scheduler_step=30,
                       align_loss_scaler=0.3, loss="dice_ce",
                       do_intaug=False)
    ypath = str(tmp_path / "tr.yml")
    pyyaml.safe_dump(cfg.to_dict(), open(ypath, "w"))
    state = train_cli.main(["--yaml", ypath, "--episodes-per-epoch", "2"])
    assert state is not None and int(state["step"]) >= 1
    assert os.path.isdir(str(tmp_path / "tr" / "model" / "epoch_000"))


def test_collate_batch_pads_short_episodes():
    """Episodes whose organ span clamps k below cfg.k pad by cycling slices
    so the batch has ONE static k (no recompiles, no stack errors)."""
    from types import SimpleNamespace

    from rpnet_tpu.cli.train import collate_batch

    def ep(k):
        return SimpleNamespace(
            support_images=np.arange(k * 4.0).reshape(1, k, 2, 2),
            support_labels=np.zeros((1, k, 2, 2)),
            query_images=np.arange(k * 4.0).reshape(k, 2, 2),
            query_labels=np.zeros((k, 2, 2)))

    si, sl, qi, ql = collate_batch([ep(4), ep(2)], target_k=4)
    assert si.shape == (2, 1, 4, 2, 2) and qi.shape == (2, 4, 2, 2)
    # the short episode cycles: slice 2 == slice 0, slice 3 == slice 1
    np.testing.assert_array_equal(qi[1][2], qi[1][0])
    np.testing.assert_array_equal(qi[1][3], qi[1][1])
    # the full-length episode is untouched
    np.testing.assert_array_equal(qi[0], ep(4).query_images)


def test_eval_fault_isolation_data_stage(synth, tmp_path):
    """A DATA-stage failure (corrupt volume in sampler.sample) must cost
    exactly ONE episode — a plain generator would close on the raise and turn
    every later episode into StopIteration (all silently skipped).

    Pinned to the host-assembly path (device_volume_cache: 0) so the
    instrumented ``sample`` is actually the data stage; the EpisodeSpec
    path's data stage is covered by
    test_eval_fault_isolation_spec_data_stage."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli
    from rpnet_tpu.episode.sampler import EpisodeSampler

    cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / "outd"),
                       num_workers=0,   # direct path (prefetch tested apart)
                       device_volume_cache=0)
    ypath = str(tmp_path / "cfgd.yml")
    with open(ypath, "w") as f:
        pyyaml.safe_dump(cfg.to_dict(), f)

    calls = {"n": 0}
    real_sample = EpisodeSampler.sample

    def flaky_sample(self, j, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected corrupt volume")
        return real_sample(self, j, *a, **k)

    EpisodeSampler.sample = flaky_sample
    try:
        results = cli.main(["--yaml", ypath])
    finally:
        EpisodeSampler.sample = real_sample

    assert results is not None
    assert results["failed_episodes"] == 1
    assert calls["n"] == 3           # every later episode still attempted
    assert "Liver" in results["classes"]


def test_eval_fault_isolation_spec_data_stage(synth, tmp_path):
    """Same contract on the EpisodeSpec device-cache path (the default):
    its data stage is load_image_and_mask (called by sample_spec and the
    device volume cache), and a corrupt volume there must cost exactly ONE
    episode while every later episode is still attempted."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli
    from rpnet_tpu.episode.sampler import EpisodeSampler

    cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / "outs"),
                       num_workers=0, device_volume_cache=16)
    ypath = str(tmp_path / "cfgs.yml")
    with open(ypath, "w") as f:
        pyyaml.safe_dump(cfg.to_dict(), f)

    calls = {"n": 0}
    real_load = EpisodeSampler.load_image_and_mask

    def flaky_load(self, *a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected corrupt volume")
        return real_load(self, *a, **k)

    EpisodeSampler.load_image_and_mask = flaky_load
    try:
        results = cli.main(["--yaml", ypath])
    finally:
        EpisodeSampler.load_image_and_mask = real_load

    assert results is not None
    assert results["failed_episodes"] == 1
    assert calls["n"] > 1            # later episodes still attempted
    assert "Liver" in results["classes"]


def test_prefetch_survives_failing_episode(synth):
    """PrefetchingSampler yields an EpisodeFailure sentinel for a bad episode
    instead of closing the stream."""
    from rpnet_tpu.config import Config
    from rpnet_tpu.episode.prefetch import EpisodeFailure, PrefetchingSampler
    from rpnet_tpu.episode.sampler import EpisodeSampler

    cfg = small_config(synth, n_runs=1, out_dir="/tmp/unused_pf")
    sampler = EpisodeSampler(cfg["data_dir"], cfg["eval_set_name"],
                             Config(cfg.to_dict()), mode="eval")
    n = len(sampler)
    assert n >= 2

    real = EpisodeSampler.sample
    state = {"n": 0}

    def flaky(self, idx, *a, **k):
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("bad NRRD")
        return real(self, idx, *a, **k)

    EpisodeSampler.sample = flaky
    try:
        out = list(PrefetchingSampler(sampler, lookahead=2, workers=2))
    finally:
        EpisodeSampler.sample = real
    assert len(out) == n
    assert sum(isinstance(o, EpisodeFailure) for o in out) == 1


def test_multiclass_proxy_dataset(tmp_path):
    """The 11-class Abd-110 proxy (core/synthetic.make_patient_multiclass):
    every class present per patient with its own z-extent and HU signature;
    hollow organs never overlap solids (mask-image consistency); the
    generated dataset's per-class CSVs match the actual mask z-ranges and
    feed the episodic sampler for a held-out class."""
    from rpnet_tpu.core.synthetic import (ABD110_CLASSES, PROXY_EVAL_CLASSES,
                                          PROXY_TRAIN_CLASSES,
                                          make_patient_multiclass)

    assert set(PROXY_TRAIN_CLASSES).isdisjoint(PROXY_EVAL_CLASSES)
    assert len(PROXY_TRAIN_CLASSES) >= 5 and len(PROXY_EVAL_CLASSES) >= 2
    assert set(PROXY_TRAIN_CLASSES) | set(PROXY_EVAL_CLASSES) <= set(ABD110_CLASSES)

    vol, masks = make_patient_multiclass((20, 96, 96), seed=3)
    assert set(masks) == set(ABD110_CLASSES)
    solids = np.zeros(vol.shape, bool)
    for roi in ("Liver", "Spleen", "Kidney L", "Kidney R", "Stomach",
                "Pancreas", "Gallbladder"):
        solids |= masks[roi].astype(bool)
    hu = {}
    for roi, m in masks.items():
        mb = m.astype(bool)
        assert mb.any(), f"{roi} empty"
        hu[roi] = float(vol[mb].mean())
        if roi in ("Duodenum", "Large Bowel", "Small Bowel"):
            assert not (mb & solids).any(), f"{roi} overlaps a solid organ"
    # distinct HU signatures: gas-mixed bowel is far below solid organs
    assert hu["Large Bowel"] < -20 < hu["Liver"]
    # determinism
    vol2, masks2 = make_patient_multiclass((20, 96, 96), seed=3)
    np.testing.assert_array_equal(vol, vol2)
    np.testing.assert_array_equal(masks["Duodenum"], masks2["Duodenum"])

    from rpnet_tpu.core.synthetic import generate_dataset
    paths = generate_dataset(str(tmp_path / "mc"), n_train=2, n_test=2,
                             shape=(20, 96, 96), classes=ABD110_CLASSES, seed=1)
    import csv as _csv
    with open(os.path.join(paths["class_dir"], "Duodenum.csv")) as f:
        rows = list(_csv.DictReader(f))
    assert len(rows) == 4 and all(int(r["z_start"]) <= int(r["z_end"])
                                  for r in rows)
    cfg = {"data_dir": paths["data_dir"], "class_csv_dir": paths["class_dir"],
           "num_slice": 32, "num_x": 96, "num_y": 96, "crop_size": [64, 64],
           "pad_value": -1024, "HU_range": [-1024, 3072], "n_shot": 1,
           "n_way": 1, "k": 4, "eval_classes": list(PROXY_EVAL_CLASSES),
           "train_classes": list(PROXY_TRAIN_CLASSES), "seed": 0}
    sampler = EpisodeSampler(paths["data_dir"], paths["test_csv"],
                             Config(cfg), mode="eval")
    assert len(sampler) == 2 * len(PROXY_EVAL_CLASSES)
    ep = sampler.sample(0)
    assert ep.query_labels.max() == 1.0


def test_device_cache_spec_path_matches_host_assembly(synth, tmp_path):
    """The device-volume-cache eval path (EpisodeSpec: on-device row gather)
    must reproduce the host-assembled path's metrics bit-for-bit — gathered
    rows are the same f32 values, and all metrics are mask-weighted so the
    differing PAD rows (row-0 copies vs constant fill) cannot leak."""
    import yaml

    from rpnet_tpu.cli import test_rpnet as cli

    cfg = dict(
        data_dir=synth["data_dir"], class_csv_dir=synth["class_dir"],
        eval_set_name=synth["test_csv"], train_set_name=synth["train_csv"],
        num_slice=32, num_x=48, num_y=48, crop_size=[32, 32],
        pad_value=-1024, HU_range=[-1024, 3072], n_shot=1, n_way=1, k=4,
        eval_classes=["Liver"], train_classes=["Spleen"], backbone="UNet",
        n_iter_refinement=2, n_test_iter_refinement=2,
        mask_refinement_correlation_radius=2, soft_mask=False,
        do_deformable=False, reg_affine_iters=4, reg_fit_scale=2,
        slice_bucket=8, max_slices=16, do_intaug=False, do_elastic=False,
        n_runs=1, seed=0)

    results = {}
    for tag, cache in (("spec", 16), ("host", 0)):
        y = tmp_path / f"{tag}.yml"
        y.write_text(yaml.safe_dump(dict(
            cfg, device_volume_cache=cache, out_dir=str(tmp_path / tag))))
        results[tag] = cli.main(["--yaml", str(y)])

    a, b = results["spec"], results["host"]
    assert a["episodes"] == b["episodes"]
    assert a["failed_episodes"] == 0 == b["failed_episodes"]
    assert a["classes"] == b["classes"]   # bit-identical per-class numbers


def test_device_cache_spec_path_sharded_matches_host(synth, tmp_path):
    """Same exactness contract under an 8-way data-sharded mesh: volumes
    replicate, the gather's out_shardings match the episode program's
    in_shardings (device-to-device, no resharding), so sharded-spec must be
    bit-identical to sharded-host-assembly."""
    import yaml

    from rpnet_tpu.cli import test_rpnet as cli

    cfg = dict(
        data_dir=synth["data_dir"], class_csv_dir=synth["class_dir"],
        eval_set_name=synth["test_csv"], train_set_name=synth["train_csv"],
        num_slice=32, num_x=48, num_y=48, crop_size=[32, 32],
        pad_value=-1024, HU_range=[-1024, 3072], n_shot=1, n_way=1, k=4,
        eval_classes=["Liver"], train_classes=["Spleen"], backbone="UNet",
        n_iter_refinement=2, n_test_iter_refinement=2,
        mask_refinement_correlation_radius=2, soft_mask=False,
        do_deformable=False, reg_affine_iters=4, reg_fit_scale=2,
        slice_bucket=8, max_slices=16, do_intaug=False, do_elastic=False,
        mesh_shape={"data": 8, "model": 1}, n_runs=1, seed=0)

    results = {}
    for tag, cache in (("spec", 16), ("host", 0)):
        y = tmp_path / f"{tag}.yml"
        y.write_text(yaml.safe_dump(dict(
            cfg, device_volume_cache=cache, out_dir=str(tmp_path / tag))))
        results[tag] = cli.main(["--yaml", str(y)])

    a, b = results["spec"], results["host"]
    assert a["episodes"] == b["episodes"]
    assert a["failed_episodes"] == 0 == b["failed_episodes"]
    assert a["classes"] == b["classes"]   # bit-identical per-class numbers


def test_device_cache_spec_path_3d_matches_host(synth, tmp_path):
    """eval_3d windows are pure indexing too: the EpisodeSpec window path
    (qry_rows = the window range, volumes device-resident) must match the
    host-sliced window path bit-for-bit."""
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as cli

    results = {}
    for tag, cache in (("spec", 16), ("host", 0)):
        cfg = small_config(synth, n_runs=1, out_dir=str(tmp_path / tag),
                           eval_3d=True, overlap_3d=2, slice_bucket=8,
                           max_slices=8, num_workers=0,
                           device_volume_cache=cache)
        ypath = str(tmp_path / f"{tag}3d.yml")
        pyyaml.safe_dump(cfg.to_dict(), open(ypath, "w"))
        results[tag] = cli.main(["--yaml", ypath])

    a, b = results["spec"], results["host"]
    assert a["failed_episodes"] == 0 == b["failed_episodes"]
    assert a["classes"] == b["classes"]   # bit-identical per-class numbers


def test_device_volume_cache_bounded(synth):
    """The device volume LRU respects its bound."""
    cfg = Config({"backbone": "UNet", "crop_size": [32, 32],
                  "n_iter_refinement": 2,
                  "mask_refinement_correlation_radius": 2,
                  "reg_affine_iters": 2, "reg_fit_scale": 2,
                  "slice_bucket": 8, "max_slices": 16,
                  "device_volume_cache": 2,
                  "data_dir": synth["data_dir"],
                  "class_csv_dir": synth["class_dir"],
                  "num_slice": 32, "num_x": 48, "num_y": 48,
                  "pad_value": -1024, "HU_range": [-1024, 3072],
                  "n_shot": 1, "n_way": 1, "k": 4,
                  "eval_classes": ["Liver", "Spleen"], "seed": 0})
    import jax.numpy as jnp

    model = model_factory["RP_Net"](cfg, num_iter=2)
    dummy = (jnp.zeros((1, 1, 1, 32, 32, 1)), jnp.zeros((1, 1, 1, 32, 32)),
             jnp.ones((1, 1, 1, 32, 32)), jnp.zeros((1, 32, 32, 1)),
             jnp.zeros((1, 32, 32)))
    variables = model.init(jax.random.PRNGKey(0), *dummy, train=False)
    runner = EpisodeRunner(model, variables, cfg)
    assert runner.supports_spec
    sampler = EpisodeSampler(synth["data_dir"], synth["test_csv"], cfg,
                             mode="eval")
    for j in range(len(sampler)):
        spec = sampler.sample_spec(j)
        assert spec is not None
        runner.finalize(runner.dispatch_spec(spec, sampler), spec,
                        arrays=False)
    assert len(runner._dev_vols) <= 2
