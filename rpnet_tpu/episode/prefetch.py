"""Background episode prefetching — the framework's `num_workers` story.

The reference configures ``num_workers: 4`` (example.yml:76) but its eval
driver iterates the Dataset directly (test_rpnet.py:71), so data loading and
the network serialize. Here a small thread pool assembles upcoming episodes
while the device crunches the current one; IO + numpy release the GIL, so
even on one core the gzip/NRRD decode overlaps device compute.

Determinism: stdlib ``random`` draws (the support sampling whose sequence we
preserve for seed parity) happen on the CALLER's thread at submit time, so
the draw order is identical to serial iteration.
"""

from __future__ import annotations

import queue
import random
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Iterator

from rpnet_tpu.episode.sampler import Episode, EpisodeSampler


class EpisodeFailure:
    """Sentinel yielded in place of an episode whose assembly raised.

    A raised exception would CLOSE the iterator generator — every later
    episode would then look failed to the caller (the eval fault-isolation
    contract, SURVEY §5, requires one bad volume to cost exactly one
    episode). Callers unwrap: ``if isinstance(ep, EpisodeFailure): raise
    ep.exc``.
    """

    def __init__(self, exc: BaseException):
        self.exc = exc


class PrefetchingSampler:
    """Iterate episodes with lookahead.

    >>> for ep in PrefetchingSampler(sampler, lookahead=2):
    ...     runner.run(ep)
    """

    def __init__(self, sampler: EpisodeSampler, lookahead: int = 2,
                 workers: int = 2):
        self.sampler = sampler
        self.lookahead = max(1, lookahead)
        self.workers = max(1, workers)

    def __len__(self):
        return len(self.sampler)

    def __iter__(self) -> Iterator[Episode]:
        n = len(self.sampler)
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            pending: "queue.Queue[Future]" = queue.Queue()

            def submit(idx: int):
                # draw the support picks HERE (caller thread) so the stdlib
                # RNG sequence matches serial iteration exactly
                ci, di = self.sampler.indices[idx]
                n_in_class = len(self.sampler.data_info[ci])
                pool_ids = [i for i in range(n_in_class) if i != di]
                picks = random.choices(pool_ids, k=self.sampler.cfg["n_shot"])
                pending.put(pool.submit(self._assemble, idx, picks))

            upto = min(self.lookahead, n)
            for i in range(upto):
                submit(i)
            for i in range(n):
                fut = pending.get()
                if upto < n:
                    submit(upto)
                    upto += 1
                try:
                    yield fut.result()
                except Exception as e:   # noqa: BLE001 — keep the stream alive
                    yield EpisodeFailure(e)

    def _assemble(self, idx: int, picks) -> Episode:
        s = self.sampler
        ci, di = s.indices[idx]
        import dataclasses

        pid = s.data_info[ci][di]["pid"]
        supports = [s.load_image_and_mask(s.data_info[ci][i]["pid"],
                                          s.classes[ci]) for i in picks]
        qry_img, qry_mask = s.load_image_and_mask(pid, s.classes[ci])
        if s.mode == "train":
            ep = s._assemble_train(supports, qry_img, qry_mask)
        else:
            ep = s._assemble_eval(supports, qry_img, qry_mask)
        return dataclasses.replace(ep, class_id=ci, pid=pid,
                                   supp_pids=[(ci, i) for i in picks])
