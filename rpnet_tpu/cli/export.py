"""Export a trained RP_Net episode program as a serving artifact.

The reference has no deployment path (inference = rerunning test_rpnet.py
with the training repo); here a YAML + checkpoint become a self-contained
StableHLO artifact (rpnet_tpu/serve/export.py) that any jax runtime can load
without this package's model code:

    python -m rpnet_tpu.cli.export --yaml cfg.yml --out /path/artifact \
        [--slices 32] [--platforms tpu,cpu]

Shapes are static (the live runner buckets slices the same way,
episode/pipeline.py): one artifact per slice-bucket size; `--slices`
defaults to the config's `slice_bucket`.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_variables(config, seed: int = 0):
    """Model + variables with the config's pretrained/ckpt applied — the
    checkpoint half of cli.test_rpnet.build_model_and_runner, without
    compiling anything on the execution backend."""
    import jax.numpy as jnp

    from rpnet_tpu.models.factory import model_factory
    from rpnet_tpu.train.checkpoint import init_or_restore

    num_iter = config["n_iter_refinement"]
    model = model_factory[config.get("net", "RP_Net")](config, align=True,
                                                       num_iter=num_iter)
    H, W = config.get("crop_size", [256, 256])
    Sh = int(config.get("n_shot", 1)) if config.get("multishot_fusion") else 1
    dummy = (jnp.zeros((1, Sh, 1, H, W, 1), jnp.float32),
             jnp.zeros((1, Sh, 1, H, W), jnp.float32),
             jnp.ones((1, Sh, 1, H, W), jnp.float32),
             jnp.zeros((1, H, W, 1), jnp.float32),
             jnp.zeros((1, H, W), jnp.float32))
    variables, _ = init_or_restore(model, config, dummy, seed=seed)
    return model, variables, (Sh, H, W)


def main(argv=None):
    ap = argparse.ArgumentParser(description="RP-Net TPU serving export")
    ap.add_argument("--yaml", required=True, type=str)
    ap.add_argument("--out", required=True, type=str,
                    help="artifact directory to write")
    ap.add_argument("--slices", default=None, type=int,
                    help="query slices per episode (default: slice_bucket)")
    ap.add_argument("--platforms", default=None, type=str,
                    help="comma-separated lowering platforms (default: "
                         "current backend)")
    ap.add_argument("--platform", default=None, type=str,
                    help="jax execution platform for the export trace")
    args = ap.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from rpnet_tpu.config import Config, load_yaml
    from rpnet_tpu.serve.export import export_episode_program, save_artifact

    raw_cfg, _ = load_yaml(args.yaml)
    config = Config(raw_cfg)
    # serving is eval: use the test-time refinement depth (test_rpnet.py:51)
    config = config.replace(n_iter_refinement=config["n_test_iter_refinement"])
    model, variables, (Sh, H, W) = build_variables(config)

    # serving artifacts follow the eval default: bf16 network unless the
    # YAML pins compute_dtype (docs/perf_trace_r3.md). Weight INPUTS stay
    # f32 — the exported program casts internally, so any orbax checkpoint
    # serves without re-export or caller-side casting.
    compute_dtype = jnp.dtype(config.get("compute_dtype") or "bfloat16")
    slices = int(args.slices or config.get("slice_bucket", 32))
    platforms = args.platforms.split(",") if args.platforms else None

    exported = export_episode_program(
        model, variables, slices=slices, height=H, width=W, shots=Sh,
        affine_iters=int(config.get("reg_affine_iters", 50)),
        demons_iters=(int(config.get("reg_demons_iters", 50))
                      if config.get("do_deformable", False) else 0),
        fit_scale=int(config.get("reg_fit_scale", 1)),
        sampler=str(config.get("reg_sampler", "matmul")),
        multishot=bool(config.get("multishot_fusion", False)),
        n_way=int(config.get("n_way", 1)),
        use_registration=bool(config.get("use_registration_loss", True)),
        reg_lr=float(config.get("reg_lr", 0.01)),
        reg_sigma=float(config.get("reg_sigma", 2.0)),
        compute_dtype=compute_dtype, platforms=platforms)
    nparams = sum(int(np.prod(x.shape)) for x in
                  jax.tree_util.tree_leaves(variables) if hasattr(x, "shape"))
    art = save_artifact(exported, args.out, extra_manifest={
        "net": config.get("net", "RP_Net"),
        "crop_size": [H, W], "slices": slices, "shots": Sh,
        "compute_dtype": str(compute_dtype),
        "n_params": nparams,
        "ckpt": config.get("ckpt") or None,
    })
    print(f"[exported {exported.fun_name} for {list(exported.platforms)} "
          f"→ {art}]")
    return art


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
