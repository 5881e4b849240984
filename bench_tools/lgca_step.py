#!/usr/bin/env python
"""LGCANet_V3 train-step benchmark at the reference's full Abd-110 shape
(yamls/example_lgca.yml: volume 280×272×272 → static 288³, downsample
[2,2,2] → 144³ 3D context net, 8 slices of 288² per step, 4 ROI classes) —
the second model_factory entry the reference defines but never wired to a
trainer (net/lgca_net_v3.py, net/model.py:4-7).

Measures the jitted LGCA train step (3D context net + fused 2D U-Net +
per-class dice loss + Adam). Timing fetches the loss per step (axon gotcha:
block_until_ready does not wait).

Run: python bench_tools/lgca_step.py [--steps 4] [--slices 8] [--size 272]
Writes bench_lgca_step.json next to the repo's other bench artifacts.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "bench_lgca_step.json")


class _Shapes:
    """Stand-in for LGCAVolumeSampler in init_lgca_state (shapes only)."""

    def __init__(self, shape, ds, slices_per_step):
        self.shape, self.ds, self.slices_per_step = shape, ds, slices_per_step


def synth_batch(shape, ds, B, C, seed=0):
    rng = np.random.RandomState(seed)
    D, H, W = shape
    sz, sy, sx = ds
    zz, yy, xx = np.meshgrid(np.arange(D), np.arange(H), np.arange(W),
                             indexing="ij", sparse=True)
    vol = rng.randn(D, H, W).astype(np.float32) * 0.05
    masks = np.zeros((D, H, W, C), np.float32)
    for c in range(C):
        cz, cy, cx = D // 2, H // 3 + c * H // (3 * C), W // 3 + c * W // (3 * C)
        m = (((zz - cz) / (D / 6)) ** 2 + ((yy - cy) / (H / 8)) ** 2
             + ((xx - cx) / (W / 8)) ** 2) < 1
        masks[..., c] = m
        vol += m * (0.4 + 0.1 * c)
    volume = vol[::sz, ::sy, ::sx][None, ..., None]
    vmask = masks[::sz, ::sy, ::sx][None]
    zidx = rng.randint(0, D, size=B)
    return (volume, vol[zidx][..., None], masks[zidx], vmask)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--size", type=int, default=272,
                    help="in-plane extent (example_lgca.yml num_x/num_y)")
    ap.add_argument("--depth", type=int, default=280,
                    help="z extent (example_lgca.yml num_slice)")
    ap.add_argument("--slices", type=int, default=8,
                    help="2D slices per step (lgca_slices)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="jax.profiler trace the timed steps into DIR and "
                         "print the top device ops")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from rpnet_tpu.utils.device import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()
    import jax.numpy as jnp

    from rpnet_tpu.config import Config
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.train.lgca import init_lgca_state, make_lgca_train_step
    from rpnet_tpu.train.trainer import make_optimizer

    roi = ["Liver", "Spleen", "Kidney L", "Kidney R"]
    cfg = Config({"net": "LGCANet_V3", "roi_names": roi,
                  "num_slice": args.depth, "num_y": args.size,
                  "num_x": args.size,
                  "context_net_downsample_scale": [2, 2, 2],
                  "lgca_slices": args.slices,
                  "unet_normalize_type": "BatchNorm2d",
                  "final_activation": "sigmoid", "use_DSC": True,
                  "init_lr": 1e-3, "weight_decay": 1e-4})
    ds = (2, 2, 2)
    rnd = lambda v, f: -(-v // f) * f
    shape = (rnd(args.depth, 32), rnd(args.size, 32), rnd(args.size, 32))
    model = model_factory["LGCANet_V3"](cfg)
    opt = make_optimizer(cfg)
    state = init_lgca_state(model, cfg, jax.random.PRNGKey(0),
                            _Shapes(shape, ds, args.slices), optimizer=opt)
    # AOT (one compile total — plain jit recompiles on step 2 because the
    # returned state's layouts re-key the cache; utils/device.aot_compile_step)
    from rpnet_tpu.utils.device import aot_compile_step
    D, H, W = shape
    sz, sy, sx = ds
    C = len(roi)
    t0 = time.time()
    step = aot_compile_step(
        make_lgca_train_step(model, cfg, opt), state,
        ((1, D // sz, H // sy, W // sx, 1), (args.slices, H, W, 1),
         (args.slices, H, W, C), (1, D // sz, H // sy, W // sx, C)))
    compile_s = time.time() - t0

    batch = tuple(map(jnp.asarray,
                      synth_batch(shape, ds, args.slices, len(roi))))
    t0 = time.time()
    state, metrics = step(state, batch)
    loss0 = float(metrics["loss"])           # fetch = real completion
    print(f"[compile {compile_s:.1f}s, step0 {time.time() - t0:.1f}s "
          f"loss {loss0:.4f} "
          f"shape {shape} ctx {tuple(s // d for s, d in zip(shape, ds))} "
          f"B={args.slices}]")

    times = []
    import contextlib
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
            print(f"{ms / args.steps:9.2f} ms/step {n:5d}x  {name[:90]}")

    step_s = float(np.median(times))
    result = {
        "metric": "lgca_train_step_seconds",
        "value": step_s,
        "unit": f"s/step (volume {shape[0]}x{shape[1]}x{shape[2]}, "
                f"ctx /2, B={args.slices} slices, {len(roi)} classes)",
        "volumes_per_sec": 1.0 / step_s,
        "slices_per_sec": args.slices / step_s,
        "compile_seconds": compile_s,
        "backend": jax.default_backend(),
    }
    print(json.dumps(result))
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
