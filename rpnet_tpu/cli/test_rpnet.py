"""Episodic evaluation CLI — the framework's main entry point.

Reproduces the reference driver's protocol (test_rpnet.py:39-258) on the
fused TPU pipeline:

  * ``python -m rpnet_tpu.cli.test_rpnet --yaml yamls/example.yml``
    (argparse surface mirrors test_rpnet.py:35-37);
  * seeds numpy/random for reproducible support draws (test_rpnet.py:8-10);
  * ``n_iter_refinement`` is overridden by ``n_test_iter_refinement``
    (test_rpnet.py:51);
  * ``n_runs`` eval passes, per-episode log lines
    (``{j} {pid} {supp_pid} affine (ncc, ncc_raw) {dsc} fewshot {dsc} ref ...``,
    test_rpnet.py:232-243) and the final mean±std aggregation block
    (test_rpnet.py:128-145);
  * sinks: stdout tee → ``out_dir/log_eval`` (Logger), TensorBoard scalars
    when available, plus a JSON results file per run (new).
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys
import time
from collections import defaultdict
from typing import Dict

import numpy as np

import jax

from rpnet_tpu.config import Config, load_yaml
from rpnet_tpu.episode.pipeline import EpisodeRunner
from rpnet_tpu.episode.sampler import EpisodeSampler
from rpnet_tpu.models.factory import model_factory
from rpnet_tpu.utils.logger import Logger

parser = argparse.ArgumentParser(description="RP-Net TPU episodic eval")
parser.add_argument("--yaml", default=None, type=str, metavar="N",
                    help="experiment configuration YAML")
parser.add_argument("--platform", default=None, type=str,
                    help="override jax platform (e.g. cpu)")
parser.add_argument("--n-runs", default=None, type=int,
                    help="override n_runs from the YAML")




def build_model_and_runner(config: Config, seed: int = 0):
    """Initialize model variables (optionally from ckpt) and the runner."""
    num_iter = config["n_iter_refinement"]
    model = model_factory[config.get("net", "RP_Net")](config, align=True,
                                                       num_iter=num_iter)
    H, W = config.get("crop_size", [256, 256])
    import jax.numpy as jnp

    Sh = int(config.get("n_shot", 1)) if config.get("multishot_fusion") else 1
    dummy = (
        jnp.zeros((1, Sh, 1, H, W, 1), jnp.float32),
        jnp.zeros((1, Sh, 1, H, W), jnp.float32),
        jnp.ones((1, Sh, 1, H, W), jnp.float32),
        jnp.zeros((1, H, W, 1), jnp.float32),
        jnp.zeros((1, H, W), jnp.float32),
    )
    from rpnet_tpu.train.checkpoint import init_or_restore
    variables, start_epoch = init_or_restore(model, config, dummy, seed=seed)

    # multi-chip: shard the query-slice axis over the mesh's data axis
    # (mesh_shape: {data: N} in the YAML, or automatic when >1 device).
    # Multi-PROCESS eval parallelizes across EPISODES (each process owns a
    # strided shard, evaluate()'s allgather merge), so the slice-sharding
    # mesh must span only this process's local devices — a global mesh would
    # need multihost array assembly for host-local episode data.
    mesh = None
    mesh_shape = config.get("mesh_shape")
    local = jax.local_devices()
    if mesh_shape or len(local) > 1:
        from rpnet_tpu.parallel.mesh import resolve_local_mesh
        mesh = resolve_local_mesh(mesh_shape, devices=local)
        print(f"[mesh {dict(mesh.shape)} over {len(local)} local devices]")
    runner = EpisodeRunner(model, variables, config, mesh=mesh)
    dt = config.get("compute_dtype") or "bfloat16 (auto)"
    print(f"[network compute dtype {dt}; registration/metrics f32 — "
          f"set compute_dtype to override]")
    return model, variables, runner, start_epoch


def evaluate(runner: EpisodeRunner, sampler: EpisodeSampler, config: Config):
    """One eval pass (reference eval(), test_rpnet.py:151-258).

    Fault isolation (SURVEY §5): each episode runs under try/except — one
    corrupt volume or NaN blowup logs and continues instead of killing the
    n_runs eval; failures are counted and surfaced in the results JSON.

    Multi-host: with ``jax.process_count() > 1`` each process evaluates a
    strided shard of the episode list and per-class Dice merges globally via
    ``multihost_utils.process_allgather`` (every process prints/aggregates
    identical numbers). Support draws are PRE-DRAWN for all episodes from the
    shared seed on every process (the stdlib stream few_shot_reader.py:255-283
    / test_rpnet.py:8-10 preserves), so an N-process eval sees the exact
    support assignments of a single-process run — only the work is sharded.
    """
    import traceback

    from rpnet_tpu.utils.profiling import StageTimer

    eval_classes = config["eval_classes"]
    n_cls = len(eval_classes)
    n_eps = len(sampler)
    T = int(config["n_iter_refinement"])
    timer = StageTimer()

    pcount = jax.process_count()
    pidx = jax.process_index()
    my_idxs = list(range(pidx, n_eps, pcount)) if pcount > 1 else list(range(n_eps))

    # every process draws ALL episodes' supports from the shared seed (cheap
    # index sampling, eval assembly consumes no RNG) → the episode→support
    # assignment is identical across process counts; each process then only
    # ASSEMBLES its strided shard
    all_picks = [sampler.draw_supports(j) for j in range(n_eps)]

    # device-resident volume cache fast path: eval episodes are pure slice
    # indexing, so with a spec-capable runner the episode ships as index
    # vectors and the volumes upload once (EpisodeSpec, episode/pipeline.py)
    use_spec = getattr(runner, "supports_spec", False)

    # NB: per-episode isolation must survive DATA-stage failures too — a
    # plain generator would close on the first raise, turning every later
    # next() into StopIteration (all remaining episodes silently skipped)
    if config.get("num_workers", 0) and not use_spec:
        from rpnet_tpu.episode.prefetch import EpisodeFailure, PrefetchingSampler
        iterator = iter(PrefetchingSampler(
            sampler, lookahead=2, workers=int(config["num_workers"]),
            indices=my_idxs, picks=all_picks))

        def fetch(j):
            ep = next(iterator)
            if isinstance(ep, EpisodeFailure):
                raise ep.exc
            return ep
    else:
        def fetch(j):
            return sampler.sample(j, picks=all_picks[j])

    # per-episode record arrays (NaN = not mine / failed / empty-GT) so the
    # multi-host merge is a plain elementwise combine
    rec_cls = np.full(n_eps, -1, np.int32)
    rec_aff = np.full(n_eps, np.nan, np.float64)
    rec_few = np.full(n_eps, np.nan, np.float64)
    rec_ref = np.full((n_eps, T), np.nan, np.float64)
    failures = 0

    def settle(pending):
        """Fetch + record + print a dispatched episode (blocks on the device).

        Returns the failures increment — device-side errors (NaN guards,
        runtime faults) surface HERE under jax async dispatch, so they are
        attributed to the episode that actually failed.
        """
        j, ep = pending[0], pending[1]
        try:
            with timer.stage("episode_compute"):
                res = runner.finalize(pending[2], ep, arrays=False)
        except Exception:
            print(f"{j} EPISODE FAILED — skipping:\n{traceback.format_exc()}")
            return 1
        supp_pid = sampler.data_info[ep.supp_pids[0][0]][ep.supp_pids[0][1]]["pid"]
        print(f"{j} {ep.pid} {supp_pid} affine ({res['ncc_warped']:.4f}, "
              f"{res['ncc_raw']:.4f}) {res['dsc_affine']}, "
              f"fewshot {res['dsc_fewshot']}", end=" ")
        rec_cls[j] = ep.class_id
        if res["dsc_affine"] is not None:
            rec_aff[j] = res["dsc_affine"]
        if res["dsc_fewshot"] is not None:
            rec_few[j] = res["dsc_fewshot"]
        for it, v in res["dsc_refinement"].items():
            if v is not None:
                rec_ref[j, int(it)] = v
            print(f"ref {it} {v}, ", end=" ")
        print()
        return 0

    # software pipeline: assemble + dispatch episode j, THEN settle episode
    # j-1 while the device computes j (one episode in flight — the device
    # never idles on host fetch/print/assembly, and print order stays
    # strictly by index)
    pending = None
    for j in my_idxs:
        try:
            with timer.stage("data"):
                ep = (sampler.sample_spec(j, picks=all_picks[j])
                      if use_spec else None)
                if ep is None:
                    ep = fetch(j)
            with timer.stage("dispatch"):
                out = (runner.dispatch_spec(ep, sampler)
                       if hasattr(ep, "supp_rows") else runner.dispatch(ep))
        except Exception:
            if pending is not None:
                failures += settle(pending)
                pending = None
            failures += 1
            print(f"{j} EPISODE FAILED — skipping:\n{traceback.format_exc()}")
            continue
        if pending is not None:
            failures += settle(pending)
        pending = (j, ep, out)
    if pending is not None:
        failures += settle(pending)

    if pcount > 1:
        from rpnet_tpu.parallel.mesh import allgather_merge_records
        (rec_cls, rec_aff, rec_few, rec_ref), failures = \
            allgather_merge_records((rec_cls, rec_aff, rec_few, rec_ref),
                                    failures)

    # rebuild the per-class lists (reference None-for-empty-GT convention:
    # NaN entries are skipped by the aggregation, same as None)
    dsc_affine_list = defaultdict(list)
    dsc_fewshot_list = defaultdict(list)
    dsc_refinement_list = defaultdict(lambda: defaultdict(list))
    for j in range(n_eps):
        if rec_cls[j] < 0:
            continue
        cls = eval_classes[rec_cls[j]]
        dsc_affine_list[cls].append(
            None if np.isnan(rec_aff[j]) else float(rec_aff[j]))
        dsc_fewshot_list[cls].append(
            None if np.isnan(rec_few[j]) else float(rec_few[j]))
        for it in range(T):
            dsc_refinement_list[cls][it].append(
                None if np.isnan(rec_ref[j, it]) else float(rec_ref[j, it]))

    for cls in eval_classes:
        aff = [d for d in dsc_affine_list[cls] if d is not None]
        few = [d for d in dsc_fewshot_list[cls] if d is not None]
        print(f"{cls}, affine {np.average(aff) if aff else float('nan')}, "
              f"fewshot {np.average(few) if few else float('nan')}", end=" ")
        for it, l in dsc_refinement_list[cls].items():
            vals = [v for v in l if v is not None]
            print(f"ref {it} {np.average(vals) if vals else float('nan')}, ", end=" ")
        print()
    if failures:
        print(f"[{failures} episode(s) failed this pass]")
    print(timer.report())
    return dsc_affine_list, dsc_fewshot_list, dsc_refinement_list, failures


def evaluate_3d(runner, sampler, config):
    """One whole-volume eval pass (``eval_3d: true`` — BASELINE config 5).

    Every query slice is segmented (sliding z-windows of the compiled episode
    program, overlap-averaged in probability space) instead of the reference's
    k-bin subsampling; per-volume Dice aggregates per class like the episodic
    protocol. Same fault isolation as :func:`evaluate`.
    """
    import traceback

    from rpnet_tpu.episode.volume3d import Volume3DRunner, Volume3DSampler

    eval_classes = config["eval_classes"]
    vrunner = Volume3DRunner(runner, overlap=int(config.get("overlap_3d", 8)))
    vsampler = Volume3DSampler(sampler)
    n_vols = len(vsampler)

    # multi-host: strided volume shard + allgather merge (same record-array
    # scheme as evaluate())
    pcount = jax.process_count()
    pidx = jax.process_index()
    my_idxs = (list(range(pidx, n_vols, pcount)) if pcount > 1
               else list(range(n_vols)))

    rec_cls = np.full(n_vols, -1, np.int32)
    rec_aff = np.full(n_vols, np.nan, np.float64)
    rec_few = np.full(n_vols, np.nan, np.float64)
    failures = 0
    for j in my_idxs:
        try:
            supp_img, supp_lab, qry_img, qry_lab, meta = vsampler.sample(j)
            res = vrunner.run_volume(supp_img, supp_lab, qry_img, qry_lab,
                                     sampler=sampler,
                                     supp_key=meta["supp_key"],
                                     qry_key=meta["qry_key"])
        except Exception:
            failures += 1
            print(f"{j} VOLUME FAILED — skipping:\n{traceback.format_exc()}")
            continue
        cls = eval_classes[meta["class_id"]]
        print(f"{j} {meta['pid']} {meta['supp_pid']} affine {res.dsc_affine}, "
              f"fewshot {res.dsc_fewshot} ({res.n_windows} windows)")
        rec_cls[j] = meta["class_id"]
        if res.dsc_affine is not None:
            rec_aff[j] = res.dsc_affine
        if res.dsc_fewshot is not None:
            rec_few[j] = res.dsc_fewshot

    if pcount > 1:
        from rpnet_tpu.parallel.mesh import allgather_merge_records
        (rec_cls, rec_aff, rec_few), failures = allgather_merge_records(
            (rec_cls, rec_aff, rec_few), failures)

    dsc_affine_list = defaultdict(list)
    dsc_fewshot_list = defaultdict(list)
    for j in range(n_vols):
        if rec_cls[j] < 0:
            continue
        cls = eval_classes[int(rec_cls[j])]
        if np.isfinite(rec_aff[j]):
            dsc_affine_list[cls].append(float(rec_aff[j]))
        if np.isfinite(rec_few[j]):
            dsc_fewshot_list[cls].append(float(rec_few[j]))

    for cls in eval_classes:
        aff = [d for d in dsc_affine_list[cls] if d is not None]
        few = [d for d in dsc_fewshot_list[cls] if d is not None]
        print(f"{cls}, affine {np.average(aff) if aff else float('nan')}, "
              f"fewshot {np.average(few) if few else float('nan')}")
    if failures:
        print(f"[{failures} volume(s) failed this pass]")
    return dsc_affine_list, dsc_fewshot_list, defaultdict(lambda: defaultdict(list)), failures


def eval_lgca(config, out_dir):
    """LGCANet_V3 whole-volume eval: per-ROI Dice over the eval split
    (the reference's episodic eval loop cannot feed this model — its forward
    takes the volume+slices contract, lgca_net_v3.py:593-607)."""
    from rpnet_tpu.episode.lgca_data import LGCAVolumeSampler
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.train.lgca import evaluate_lgca_volume, init_lgca_state

    sampler = LGCAVolumeSampler(config["data_dir"], config["eval_set_name"],
                                config, mode="eval")
    print(f"[length of LGCA eval loader {len(sampler)}]")
    model = model_factory["LGCANet_V3"](config)
    state = init_lgca_state(model, config, jax.random.PRNGKey(0), sampler)
    variables = {"params": state["params"],
                 "batch_stats": state["batch_stats"]}
    if config.get("ckpt"):
        from rpnet_tpu.train.checkpoint import restore_into
        variables, _ = restore_into(variables, config["ckpt"],
                                    model_name="LGCANet_V3")

    # multi-chip: shard each eval slice-chunk over the data axis (the chunk
    # rounds up to a multiple of the axis inside evaluate_lgca_volume; a
    # global-count mesh_shape is reinterpreted per-process like RP_Net eval)
    mesh = None
    mesh_shape = config.get("mesh_shape")
    local = jax.local_devices()
    if mesh_shape or len(local) > 1:
        from rpnet_tpu.parallel.mesh import resolve_local_mesh
        mesh = resolve_local_mesh(mesh_shape, devices=local)
        print(f"[LGCA mesh {dict(mesh.shape)} over {len(local)} local devices]")

    rois = list(config["roi_names"])
    per_class = defaultdict(list)
    for j in range(len(sampler)):
        try:
            s = sampler.sample(j)
            dices = evaluate_lgca_volume(model, variables, s, mesh=mesh)
        except Exception as e:
            print(f"{j} VOLUME FAILED — skipping: {e}")
            continue
        line = " ".join(f"{rois[k]} {dices[f'class_{k}']}"
                        for k in range(len(rois)))
        print(f"{j} {s['pid']} {line}")
        for k in range(len(rois)):
            if dices[f"class_{k}"] is not None:
                per_class[rois[k]].append(dices[f"class_{k}"])

    results = {"classes": {}}
    print("=======Average performance=========")
    for roi in rois:
        vals = per_class[roi]
        m = float(np.mean(vals)) if vals else float("nan")
        s_ = float(np.std(vals)) if vals else float("nan")
        print(f"{roi}, dice {m} + {s_}")
        results["classes"][roi] = {"dice": [m, s_]}
    with open(os.path.join(out_dir, "results_eval.json"), "w") as fjson:
        json.dump(results, fjson, indent=2)
    return results


def main(argv=None):
    args = parser.parse_args(argv)
    if not args.yaml:
        print("No configuration file")
        return None
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    raw_cfg, _ = load_yaml(args.yaml)
    config = Config(raw_cfg)
    # eval uses the test-time refinement depth (test_rpnet.py:51)
    config = config.replace(n_iter_refinement=config["n_test_iter_refinement"])

    from rpnet_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed(config)

    from rpnet_tpu.utils.device import maybe_enable_compilation_cache
    maybe_enable_compilation_cache(config)

    seed = int(config.get("seed", 0))
    np.random.seed(seed)
    random.seed(seed)
    if config.get("debug_nans"):
        from rpnet_tpu.utils.profiling import enable_nan_debugging
        enable_nan_debugging(True)

    out_dir = config.get("out_dir") or "./results/{}/".format(
        os.path.splitext(os.path.basename(args.yaml))[0])
    os.makedirs(os.path.join(out_dir, "model"), exist_ok=True)
    sys.stdout = Logger(os.path.join(out_dir, "log_eval"))

    if config.get("net", "RP_Net") == "LGCANet_V3":
        return eval_lgca(config, out_dir)

    sampler = EpisodeSampler(config["data_dir"], config["eval_set_name"],
                             config, mode="eval")
    print(f"[length of eval loader {len(sampler)}]")

    model, variables, runner, start_epoch = build_model_and_runner(config, seed)
    n_runs = args.n_runs or config.get("n_runs", 1)
    return run_eval_protocol(runner, sampler, config, out_dir, n_runs,
                             start_epoch=start_epoch)


def run_eval_protocol(runner, sampler, config: Config, out_dir: str,
                      n_runs: int, start_epoch: int = 0):
    """The reference's n_runs eval protocol (test_rpnet.py:112-145): repeat
    the per-class episodic eval, aggregate mean±std over runs, tee logs,
    write results_eval.json. ``runner`` is duck-typed (pad/dispatch/finalize)
    — the live EpisodeRunner and the serving ArtifactRunner both drive it."""
    writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        writer = SummaryWriter(os.path.join(out_dir, "runs", "eval"))
    except Exception:
        pass

    eval_classes = config["eval_classes"]
    dsc_affine = defaultdict(list)
    dsc_fewshot = defaultdict(list)
    dsc_refinement = defaultdict(lambda: defaultdict(list))
    t0 = time.time()
    total_episodes = 0
    total_failures = 0
    eval_fn = evaluate_3d if config.get("eval_3d") else evaluate
    for i in range(n_runs):
        print(f"{i + 1} / {n_runs}")
        t_pass = time.time()
        a, f, r, failures = eval_fn(runner, sampler, config)
        print(f"pass_wall {time.time() - t_pass:.3f}s / {len(sampler)} episodes")
        total_episodes += len(sampler)
        total_failures += failures
        for k in eval_classes:
            dsc_affine[k].append([d for d in a[k]])
            dsc_fewshot[k].append([d for d in f[k]])
            for it, l in r[k].items():
                dsc_refinement[k][it].append(l)

    wall = time.time() - t0
    results: Dict[str, Dict] = {"classes": {}, "wall_time_sec": wall,
                                "episodes": total_episodes,
                                "failed_episodes": total_failures,
                                # throughput counts COMPLETED episodes only —
                                # failures must not inflate it
                                "episodes_per_sec":
                                    (total_episodes - total_failures)
                                    / max(wall, 1e-9)}

    def _nanmean_std(rows):
        """Mean over episodes per run, then mean±std over runs
        (the `.mean(1).mean()` / `.mean(1).std()` protocol, test_rpnet.py:138-143)."""
        per_run = []
        for row in rows:
            vals = [v for v in row if v is not None]
            per_run.append(np.mean(vals) if vals else np.nan)
        return float(np.nanmean(per_run)), float(np.nanstd(per_run))

    print("=======Average performance=========")
    ref_dsc = []
    for k in eval_classes:
        am, astd = _nanmean_std(dsc_affine[k])
        fm, fstd = _nanmean_std(dsc_fewshot[k])
        print(f"{k}, affine {am} + {astd}, fewshot {fm} + {fstd} ")
        results["classes"][k] = {"affine": [am, astd], "fewshot": [fm, fstd],
                                 "refinement": {}}
        for it, rows in dsc_refinement[k].items():
            rm, rstd = _nanmean_std(rows)
            ref_dsc.append(rm)
            results["classes"][k]["refinement"][int(it)] = [rm, rstd]
            print(f"ref {it} {rm} + {rstd}, ", end=" ")
        print()
        if writer is not None:
            writer.add_scalar(k, fm, start_epoch)
    print(ref_dsc)

    with open(os.path.join(out_dir, "results_eval.json"), "w") as fjson:
        json.dump(results, fjson, indent=2)
    if writer is not None:
        writer.close()
    return results


if __name__ == "__main__":
    main()
