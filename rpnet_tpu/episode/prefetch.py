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
                 workers: int = 2, indices=None, picks=None):
        """``indices``: the episode ids to iterate (default: all, in order) —
        a multi-host process passes its strided shard so workers prefetch
        exactly what it will evaluate. ``picks``: optional mapping
        ``episode id → support picks`` pre-drawn from the shared seed; when
        absent, picks are drawn on the caller thread at submit time so the
        stdlib RNG sequence matches serial iteration exactly."""
        self.sampler = sampler
        self.lookahead = max(1, lookahead)
        self.workers = max(1, workers)
        self.indices = list(range(len(sampler))) if indices is None else list(indices)
        self.picks = picks

    def __len__(self):
        return len(self.indices)

    def __iter__(self) -> Iterator[Episode]:
        n = len(self.indices)
        with ThreadPoolExecutor(max_workers=self.workers) as pool:
            pending: "queue.Queue[Future]" = queue.Queue()

            def submit(pos: int):
                idx = self.indices[pos]
                if self.picks is not None:
                    picks = list(self.picks[idx])
                else:
                    picks = self.sampler.draw_supports(idx)
                pending.put(pool.submit(self.sampler.sample, idx, None, picks))

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
