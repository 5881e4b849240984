#!/usr/bin/env python
"""Train → checkpoint → eval round trip at real scale (VERDICT r1 item 4).

End to end through the PUBLIC CLIs, on synthetic NRRD volumes:
  1. `cli.train` trains RP_Net (256², k=12 by default) for a few epochs and
     writes orbax checkpoints;
  2. `cli.test_rpnet` evaluates UNTRAINED (fresh init) and TRAINED (ckpt:
     epoch_NNN) on the held-out split;
  3. the trained network must beat the untrained one, and its refinement
     must IMPROVE on the registration prior (untrained CRE degrades it).

Writes bench_roundtrip.json. Run:
  python bench_tools/train_eval_roundtrip.py [--size 256] [--epochs 3]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   "bench_roundtrip.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--episodes-per-epoch", type=int, default=8)
    ap.add_argument("--epoch-save", type=int, default=None,
                    help="checkpoint every N epochs (default: epochs, i.e. "
                         "only the final one — long runs shouldn't write "
                         "hundreds of orbax trees)")
    ap.add_argument("--n-train", type=int, default=3,
                    help="synthetic training volumes (3 volumes overfit "
                         "within ~400 episodes; long runs need more)")
    ap.add_argument("--elastic", action="store_true",
                    help="enable elastic augmentation (episode diversity "
                         "for long runs)")
    ap.add_argument("--ds-weights", default="equal",
                    choices=["equal", "linear"],
                    help="deep-supervision weighting over iterations "
                         "(linear = weight ∝ iter index + 1)")
    ap.add_argument("--deep-supervision", action="store_true",
                    help="supervise every refinement iteration (contraction "
                         "training — needed for monotone test-time "
                         "refinement past the train horizon)")
    ap.add_argument("--train-iters", type=int, default=4,
                    help="n_iter_refinement at TRAIN time (eval always "
                         "extends to 10, test_rpnet.py:51)")
    ap.add_argument("--multiclass", action="store_true",
                    help="use the 11-class Abd-110 proxy (VERDICT r3 item 1):"
                         " train on 6 organ classes, eval on 2 held-out ones"
                         " (synthetic.PROXY_{TRAIN,EVAL}_CLASSES)")
    ap.add_argument("--train-classes", nargs="+", default=None)
    ap.add_argument("--eval-classes", nargs="+", default=None)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--workdir", default="/tmp/rpnet_roundtrip")
    ap.add_argument("--out", default=OUT, help="result JSON path")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from rpnet_tpu.utils.device import maybe_enable_compilation_cache
    maybe_enable_compilation_cache()
    import yaml as pyyaml

    from rpnet_tpu.cli import test_rpnet as eval_cli
    from rpnet_tpu.cli import train as train_cli
    from rpnet_tpu.core import synthetic
    from rpnet_tpu.core.synthetic import generate_dataset

    if args.multiclass:
        train_classes = list(args.train_classes or synthetic.PROXY_TRAIN_CLASSES)
        eval_classes = list(args.eval_classes or synthetic.PROXY_EVAL_CLASSES)
        gen_classes = synthetic.ABD110_CLASSES
        n_eval_vols = 4
    else:
        train_classes = list(args.train_classes or ["Spleen"])
        eval_classes = list(args.eval_classes or ["Liver"])
        gen_classes = synthetic.DEFAULT_CLASSES
        n_eval_vols = 2

    S = args.size
    work = args.workdir
    os.makedirs(work, exist_ok=True)
    paths = generate_dataset(os.path.join(work, "data"),
                             n_train=args.n_train, n_test=n_eval_vols,
                             shape=(24, S + 16, S + 16), seed=0,
                             classes=gen_classes)

    cfg = dict(
        data_dir=paths["data_dir"], class_csv_dir=paths["class_dir"],
        train_set_name=paths["train_csv"], eval_set_name=paths["test_csv"],
        num_slice=32, num_x=S + 16, num_y=S + 16,
        crop_size=[S, S], pad_value=-1024, HU_range=[-1024, 3072],
        n_shot=1, n_way=1, k=args.k,
        train_classes=train_classes, eval_classes=eval_classes,
        backbone="UNet", n_iter_refinement=args.train_iters,
        n_test_iter_refinement=10,
        deep_supervision=bool(args.deep_supervision),
        deep_supervision_weights=args.ds_weights,
        mask_refinement_correlation_radius=5, soft_mask=False,
        reg_affine_iters=50, do_deformable=False, reg_fit_scale=4,
        slice_bucket=args.k, max_slices=32,
        do_intaug=True, do_elastic=bool(args.elastic), gamma_range=[0.7, 1.4],
        batch_size=2, init_lr=3e-4, weight_decay=1e-4, scheduler_step=30,
        align_loss_scaler=0.3, loss="dice_ce", epochs=args.epochs,
        epoch_save=args.epoch_save or args.epochs, n_runs=1, seed=0,
        # the multi-class study touches train_classes x n_train (pid, roi)
        # volumes every epoch — size the sampler LRU to hold them all
        volume_cache=96 if args.multiclass else 8,
    )

    def write_yaml(extra, name):
        c = dict(cfg, **extra)
        p = os.path.join(work, name)
        with open(p, "w") as f:
            pyyaml.safe_dump(c, f)
        return p

    # ---- 1. eval UNTRAINED ----
    y0 = write_yaml({"out_dir": os.path.join(work, "eval_untrained")},
                    "eval0.yml")
    r0 = eval_cli.main(["--yaml", y0])
    untrained = r0["classes"][eval_classes[0]]

    # ---- 2. train ----
    ytr = write_yaml({"out_dir": os.path.join(work, "train")}, "train.yml")
    t0 = time.time()
    train_cli.main(["--yaml", ytr,
                    "--episodes-per-epoch", str(args.episodes_per_epoch)])
    train_wall = time.time() - t0
    ckpt = os.path.join(work, "train", "model",
                        f"epoch_{args.epochs - 1:03d}")
    assert os.path.isdir(ckpt), f"no checkpoint at {ckpt}"

    # ---- 3. eval TRAINED from the orbax checkpoint ----
    y1 = write_yaml({"out_dir": os.path.join(work, "eval_trained"),
                     "ckpt": ckpt}, "eval1.yml")
    r1 = eval_cli.main(["--yaml", y1])
    trained = r1["classes"][eval_classes[0]]

    def per_iter(cls_block):
        its = sorted(cls_block["refinement"], key=int)
        return {str(i): cls_block["refinement"][i][0] for i in its}

    last_it = max(int(k) for k in trained["refinement"])
    result = {
        "metric": "roundtrip_trained_fewshot_dice",
        "value": trained["fewshot"][0],
        "unit": f"dice ({S}x{S}, k={args.k}, {args.epochs} epochs x "
                f"{args.episodes_per_epoch} episodes)",
        "prior_dice": trained["affine"][0],
        "untrained_fewshot_dice": untrained["fewshot"][0],
        "trained_refinement_last": trained["refinement"][str(last_it)][0]
        if str(last_it) in trained["refinement"]
        else trained["refinement"][last_it][0],
        "train_wall_sec": train_wall,
        "ckpt": ckpt,
        "backend": jax.default_backend(),
        "train_classes": train_classes,
        "eval_classes": eval_classes,
        "per_class": {
            c: {
                "affine": r1["classes"][c]["affine"][0],
                "fewshot": r1["classes"][c]["fewshot"][0],
                "refinement": per_iter(r1["classes"][c]),
                "untrained_fewshot": r0["classes"][c]["fewshot"][0],
            }
            for c in eval_classes if c in r1["classes"]
        },
    }
    result["beats_untrained"] = bool(result["value"]
                                     > result["untrained_fewshot_dice"])
    result["beats_prior"] = bool(result["value"] > result["prior_dice"])
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
