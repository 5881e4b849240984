#!/usr/bin/env python
"""Full-size train-step benchmark: 256², k=12 slices, U-Net backbone,
4 refinement iterations, in-graph registration — the reference's training
shape (example.yml: crop 256, k:12, n_iter_refinement:4) the reference never
shipped a trainer for.

Measures the jitted train step (grad + Adam update) with the correlation
implementation chosen by RPNET_CORR_IMPL (default: Pallas kernel via the
vmappable custom-VJP wrapper on TPU). Timing fetches a value per step (axon
gotcha: block_until_ready does not wait).

Run: python bench_tools/train_fullsize.py [--episodes 1] [--steps 4]
Writes bench_trainstep.json next to the repo's other bench artifacts.
"""
import argparse
import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "bench_trainstep.json")


def synth_batch(E, k, H, W, seed=0):
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    def organ(cy, cx, ry, rx):
        return ((((yy - cy) / ry) ** 2
                 + ((xx - cx) / rx) ** 2) < 1).astype(np.float32)

    supp_img = np.zeros((E, 1, k, H, W), np.float32)
    supp_lab = np.zeros((E, 1, k, H, W), np.float32)
    qry_img = np.zeros((E, k, H, W), np.float32)
    qry_lab = np.zeros((E, k, H, W), np.float32)
    for e in range(E):
        for s in range(k):
            cy, cx = H / 2 + rng.randint(-20, 20), W / 2 + rng.randint(-20, 20)
            m_s = organ(cy, cx, H / 5, W / 6)
            m_q = organ(cy + rng.randint(-10, 10), cx + rng.randint(-10, 10),
                        H / 5, W / 6)
            supp_lab[e, 0, s], qry_lab[e, s] = m_s, m_q
            supp_img[e, 0, s] = m_s * 0.8 + rng.randn(H, W) * 0.05
            qry_img[e, s] = m_q * 0.8 + rng.randn(H, W) * 0.05
    return supp_img, supp_lab, qry_img, qry_lab


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=1,
                    help="episodes per step (batch E)")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--n-iter", type=int, default=4)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--fit-scale", type=int, default=4)
    ap.add_argument("--unroll", type=int, default=1,
                    help="refinement-scan unroll factor (refinement_unroll)")
    ap.add_argument("--corr", default=None, choices=["pallas", "xla", "mxu"],
                    help="correlation impl (sets RPNET_CORR_IMPL)")
    ap.add_argument("--dtype", default="float32",
                    help="network compute dtype for training (float32 | bfloat16)")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="jax.profiler trace the timed steps into DIR and "
                         "print the top device ops")
    ap.add_argument("--do-deformable", action="store_true",
                    help="enable the demons registration stage inside the "
                         "train program (50 NCC iters + diffeo ×10 after "
                         "the affine fit, few_shot_reader.py:147-162 "
                         "semantics) — the reference's example.yml:101 "
                         "defaults it off")
    args = ap.parse_args()
    if args.corr:
        os.environ["RPNET_CORR_IMPL"] = args.corr

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from rpnet_tpu.utils.device import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()
    import jax.numpy as jnp

    from rpnet_tpu.config import Config
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)

    H = W = args.size
    k, E = args.k, args.episodes
    cfg = Config({"backbone": "UNet", "crop_size": [H, W], "k": k,
                  "n_iter_refinement": args.n_iter,
                  "mask_refinement_correlation_radius": 5,
                  "reg_affine_iters": 50,
                  "do_deformable": bool(args.do_deformable),
                  "init_lr": 1e-5, "weight_decay": 1e-4,
                  "align_loss_scaler": 1.0,
                  "reg_fit_scale": args.fit_scale,
                  "refinement_unroll": args.unroll,
                  "compute_dtype": args.dtype})
    model = model_factory["RP_Net"](cfg, align=True, num_iter=args.n_iter)
    opt = make_optimizer(cfg)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    from rpnet_tpu.utils.device import aot_compile_step
    t0 = time.time()
    step = aot_compile_step(
        make_train_step(model, cfg, opt), state,
        ((E, 1, k, H, W), (E, 1, k, H, W), (E, k, H, W), (E, k, H, W)))
    compile_s = time.time() - t0

    batch = tuple(map(jnp.asarray, synth_batch(E, k, H, W)))
    corr_impl = os.environ.get(
        "RPNET_CORR_IMPL",
        "pallas" if jax.default_backend() == "tpu" else "xla")

    t0 = time.time()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])           # fetch = real completion
    print(f"[compile {compile_s:.1f}s, step0 {time.time() - t0:.1f}s "
          f"loss {loss0:.4f} corr={corr_impl}]")

    times = []
    ctx = contextlib.nullcontext()
    if args.profile:
        from rpnet_tpu.utils.profiling import trace
        ctx = trace(args.profile)
    with ctx:
        for i in range(args.steps):
            t0 = time.time()
            state, metrics = step(state, batch)
            loss = float(metrics["loss"])        # fetch
            times.append(time.time() - t0)
            print(f"step {i + 1}: {times[-1]:.3f}s loss {loss:.4f}")
    if args.profile:
        from rpnet_tpu.utils.profiling import summarize_trace
        for name, ms, n in summarize_trace(args.profile, top=25):
            print(f"{ms:9.1f} ms  {n:4d}x  {name}")

    step_s = float(np.median(times))
    result = {
        "metric": "train_step_seconds",
        "value": step_s,
        "unit": f"s/step (E={E} episodes, k={k}, {H}x{W}, "
                f"{args.n_iter} ref iters, corr={corr_impl}, dtype={args.dtype}, "
                f"unroll={args.unroll}"
                + (", demons50" if args.do_deformable else "") + ")",
        "episodes_per_sec": E / step_s,
        "compile_seconds": compile_s,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    out = OUT.replace(".json", "_demons.json") if args.do_deformable else OUT
    with open(out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
