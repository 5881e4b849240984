"""Worker for tests/test_multihost.py — one process of a 2-process CPU pod.

Exercises the REAL multi-host code paths: parallel.mesh.
maybe_initialize_distributed (explicit coordinator config) and the eval
record-array merge used by cli/test_rpnet.evaluate.
"""

import sys


def main(coord: str, pid: int, nproc: int):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from rpnet_tpu.parallel.mesh import maybe_initialize_distributed

    ok = maybe_initialize_distributed({
        "multihost": True,
        "coordinator_address": coord,
        "num_processes": nproc,
        "process_id": pid,
    })
    assert ok, "maybe_initialize_distributed returned False"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    import numpy as np
    from jax.experimental import multihost_utils

    # the evaluate() merge scheme: each process owns a strided shard of the
    # per-episode record array; NaN elsewhere; nanmax-merge must recover the
    # full record on EVERY process
    n_eps = 5
    rec = np.full(n_eps, np.nan, np.float64)
    for j in range(pid, n_eps, nproc):
        rec[j] = 100.0 + j
    g = np.asarray(multihost_utils.process_allgather(rec))
    with np.errstate(all="ignore"):
        merged = np.nanmax(g, axis=0)
    expect = 100.0 + np.arange(n_eps)
    np.testing.assert_allclose(merged, expect)

    # failure-count reduction (evaluate() sums failures across processes)
    failures = pid + 1      # 1 + 2
    total = int(np.sum(np.asarray(
        multihost_utils.process_allgather(np.asarray(failures)))))
    assert total == nproc * (nproc + 1) // 2, total

    print(f"WORKER_OK pid={pid} merged={merged.tolist()} failures={total}",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
