"""Serve an exported artifact: the full episodic eval protocol with NO model
construction — the StableHLO program + an orbax checkpoint are everything.

    python -m rpnet_tpu.cli.serve --artifact DIR --yaml cfg.yml [--ckpt PATH]

The reference has no deployment path at all (inference = rerunning
test_rpnet.py inside the training repo); here the artifact written by
``cli.export`` is reloaded (rpnet_tpu/serve/export.py::load_artifact) and
driven through the SAME eval protocol as the live CLI
(cli/test_rpnet.py::run_eval_protocol): per-episode reference-format log
lines, per-episode fault isolation, n_runs mean±std aggregation,
results_eval.json. The YAML supplies only the data/protocol half (dataset
paths, eval classes, n_runs, seed); the network and its episode program come
entirely from the artifact.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np

import jax

from rpnet_tpu.config import Config, load_yaml
from rpnet_tpu.episode.sampler import EpisodeSampler
from rpnet_tpu.utils.logger import Logger

parser = argparse.ArgumentParser(description="RP-Net TPU artifact serving")
parser.add_argument("--artifact", required=True, type=str,
                    help="artifact directory written by cli.export")
parser.add_argument("--yaml", required=True, type=str,
                    help="data/protocol config (dataset paths, eval classes, "
                         "n_runs, seed)")
parser.add_argument("--ckpt", default=None, type=str,
                    help="orbax checkpoint for the weights (default: the "
                         "YAML's ckpt, else the artifact manifest's)")
parser.add_argument("--platform", default=None, type=str)
parser.add_argument("--n-runs", default=None, type=int)


def main(argv=None):
    args = parser.parse_args(argv)
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    raw_cfg, _ = load_yaml(args.yaml)
    config = Config(raw_cfg)
    # serving is eval: test-time refinement depth (test_rpnet.py:51) — only
    # used for bookkeeping; the iteration count itself is baked into the
    # artifact's program
    config = config.replace(n_iter_refinement=config["n_test_iter_refinement"])

    from rpnet_tpu.utils.device import maybe_enable_compilation_cache
    maybe_enable_compilation_cache(config)

    seed = int(config.get("seed", 0))
    np.random.seed(seed)
    random.seed(seed)

    out_dir = config.get("out_dir") or "./results/{}/".format(
        os.path.splitext(os.path.basename(args.yaml))[0])
    os.makedirs(out_dir, exist_ok=True)
    sys.stdout = Logger(os.path.join(out_dir, "log_serve"))

    from rpnet_tpu.serve.export import load_artifact, make_artifact_runner
    program = load_artifact(args.artifact)
    print(f"[artifact {args.artifact}: {program.manifest.get('net', '?')} "
          f"slices={program.manifest.get('slices')} "
          f"platforms={program.manifest.get('platforms')}]")

    ckpt = args.ckpt or config.get("ckpt") or program.manifest.get("ckpt")
    if not ckpt:
        print("No checkpoint (--ckpt, YAML ckpt, or manifest ckpt)")
        return None
    from rpnet_tpu.train.checkpoint import load_checkpoint
    print(f"[Loading weights from {ckpt}]")
    tree = load_checkpoint(ckpt)
    variables = tree.get("variables", tree)   # raw tree fallback

    sampler = EpisodeSampler(config["data_dir"], config["eval_set_name"],
                             config, mode="eval")
    print(f"[length of eval loader {len(sampler)}]")

    runner = make_artifact_runner(program, variables, config)

    from rpnet_tpu.cli.test_rpnet import run_eval_protocol
    n_runs = args.n_runs or config.get("n_runs", 1)
    return run_eval_protocol(runner, sampler, config, out_dir, n_runs)


if __name__ == "__main__":
    main()
