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

    from rpnet_tpu.parallel.mesh import allgather_merge_records

    # the evaluate()/evaluate_3d() merge path: each process owns a strided
    # shard of the per-episode record arrays (NaN / -1 elsewhere); the
    # shared helper must recover the full record on EVERY process
    n_eps = 5
    rec = np.full(n_eps, np.nan, np.float64)
    cls = np.full(n_eps, -1, np.int32)
    for j in range(pid, n_eps, nproc):
        rec[j] = 100.0 + j
        cls[j] = j % 2
    (cls_m, rec_m), total = allgather_merge_records((cls, rec),
                                                    failures=pid + 1)
    np.testing.assert_allclose(rec_m, 100.0 + np.arange(n_eps))
    np.testing.assert_array_equal(cls_m, np.arange(n_eps) % 2)
    assert total == nproc * (nproc + 1) // 2, total
    merged = rec_m

    print(f"WORKER_OK pid={pid} merged={merged.tolist()} failures={total}",
          flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
