"""Worker for tests/test_multihost.py::test_two_process_cli_eval — runs the
ACTUAL eval CLI (cli.test_rpnet.main) as one process of a 2-process CPU pod.

The yaml carries the multihost block (coordinator_address / num_processes /
process_id), so this exercises the CLI's own maybe_initialize_distributed →
strided episode shard → allgather merge → aggregate print path end to end.
"""

import sys


def main(yaml_path: str):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rpnet_tpu.cli import test_rpnet

    res = test_rpnet.main(["--yaml", yaml_path])
    assert res is not None and "classes" in res
    # restore the real stdout (the CLI installs a Logger tee) before the
    # final marker so the parent always sees it
    sys.stdout = sys.__stdout__
    print(f"CLI_WORKER_OK eps={res['episodes']} "
          f"failed={res['failed_episodes']}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
