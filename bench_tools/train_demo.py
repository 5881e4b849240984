#!/usr/bin/env python
"""Learning-dynamics demo: train RP_Net on synthetic episodes and show the
recurrent refinement IMPROVES the registration prior.

Measured on TPU v5e (2026-08-16): 300 steps at 0.15 s/step (64², k=4, E=4),
then a 10-iteration refinement eval on held-out synthetic episodes:

    affine prior Dice 0.868 → fewshot Dice 0.974
    per-iteration: 0.957, 0.972, 0.975, 0.974, 0.975, ... (monotone ramp)

i.e. the full mechanism of the paper — registration prior in, recurrent
context-relation refinement out — works end to end in this framework.

Run: python bench_tools/train_demo.py [--steps 300] [--size 64]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from rpnet_tpu.utils.device import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()
    import jax.numpy as jnp

    from rpnet_tpu.config import Config
    from rpnet_tpu.episode.pipeline import episode_metrics_fn
    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.train.trainer import (init_train_state, make_optimizer,
                                         make_train_step)

    H = W = args.size
    k, E = 4, 4
    cfg = Config({"backbone": "UNet", "crop_size": [H, W], "k": k,
                  "n_iter_refinement": 2,
                  "mask_refinement_correlation_radius": 2,
                  "reg_affine_iters": 10, "do_deformable": False,
                  "init_lr": 3e-4, "align_loss_scaler": 0.1,
                  "reg_fit_scale": 2})
    model = model_factory["RP_Net"](cfg, align=True, num_iter=2)
    opt = make_optimizer(cfg)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, cfg, opt))

    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")

    def organ(cy, cx, ry, rx):
        return ((((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2) < 1).astype(np.float32)

    def batch(seed):
        r = np.random.RandomState(seed)
        s_img, s_lab, q_img, q_lab = [], [], [], []
        for _ in range(E):
            cy, cx = r.uniform(.38, .6, 2)
            ry, rx = r.uniform(.15, .25), r.uniform(.12, .2)
            sl = organ(cy * H, cx * W, ry * H, rx * W)
            ql = organ((cy + r.uniform(-.06, .06)) * H,
                       (cx + r.uniform(-.06, .06)) * W,
                       ry * H * r.uniform(.9, 1.1), rx * W * r.uniform(.9, 1.1))
            s_lab.append(np.repeat(sl[None], k, 0))
            q_lab.append(np.repeat(ql[None], k, 0))
            s_img.append(s_lab[-1] * 0.8 - 0.5 + 0.05 * r.randn(k, H, W))
            q_img.append(q_lab[-1] * 0.8 - 0.5 + 0.05 * r.randn(k, H, W))
        return (jnp.asarray(np.stack(s_img)[:, None].astype(np.float32)),
                jnp.asarray(np.stack(s_lab)[:, None].astype(np.float32)),
                jnp.asarray(np.stack(q_img).astype(np.float32)),
                jnp.asarray(np.stack(q_lab).astype(np.float32)))

    t0 = time.time()
    state, m = step(state, batch(0))
    print(f"compile+step0 {time.time() - t0:.0f}s loss {float(m['loss']):.4f}",
          flush=True)
    t0 = time.time()
    for it in range(1, args.steps + 1):
        state, m = step(state, batch(it))
        if it % 50 == 0:
            print(f"step {it} loss {float(m['loss']):.4f} "
                  f"({(time.time() - t0) / it:.2f}s/step avg)", flush=True)

    model_ev = model_factory["RP_Net"](cfg, num_iter=10)
    variables = {"params": state["params"], "batch_stats": state["batch_stats"]}
    fn = jax.jit(episode_metrics_fn(model_ev, affine_iters=10, demons_iters=0,
                                    fit_scale=2))
    affs, fews, refs = [], [], []
    for seed in range(1000, 1006):
        s_img, s_lab, q_img, q_lab = batch(seed)
        out = fn(variables, s_img[0], s_lab[0], q_img[0], q_lab[0],
                 jnp.ones((k,), jnp.float32))
        affs.append(float(np.asarray(out["dsc_affine"])))
        fews.append(float(np.asarray(out["dsc_fewshot"])))
        refs.append(np.asarray(out["dsc_refinement"]))
    print(f"EVAL trained: affine prior {np.mean(affs):.3f} -> "
          f"fewshot {np.mean(fews):.3f}")
    print("per-iteration dice:", np.round(np.mean(refs, axis=0), 3).tolist())


if __name__ == "__main__":
    main()
