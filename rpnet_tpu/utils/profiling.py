"""Tracing / profiling / debugging hooks (SURVEY.md §5 "auxiliary subsystems").

The reference has none (a dead `time.time()` at test_rpnet.py:154 and tqdm
bars). This framework provides:

  * :class:`StageTimer` — per-stage wall timing with `block_until_ready`
    fences, emitted as structured one-line logs;
  * :func:`trace` — context manager around ``jax.profiler.trace`` producing a
    TensorBoard-loadable xplane + trace.json.gz;
  * :func:`summarize_trace` — host-side parser of the trace.json.gz that
    aggregates device op durations (what we used to find the 488ms fit loop);
  * :func:`enable_nan_debugging` — flips ``jax_debug_nans``.
"""

from __future__ import annotations

import collections
import contextlib
import glob
import gzip
import json
import os
import time
from typing import Dict, List, Tuple

import jax


class StageTimer:
    """Accumulates per-stage wall time; device work fenced explicitly.

    >>> timer = StageTimer()
    >>> with timer.stage("registration"):
    ...     out = fn(...)           # timer blocks on `out` at scope exit
    >>> print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        parts = [f"{k}={self.totals[k]:.3f}s/{self.counts[k]}x"
                 for k in sorted(self.totals, key=self.totals.get, reverse=True)]
        return "stage_timing " + " ".join(parts)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def trace(log_dir: str):
    """``with trace('/tmp/trace'): run()`` → TensorBoard profile dir."""
    with jax.profiler.trace(log_dir):
        yield
    print(f"[profiler] trace written to {log_dir}")


def summarize_trace(log_dir: str, top: int = 20) -> List[Tuple[str, float, int]]:
    """Aggregate device-op durations from the newest trace.json.gz under
    ``log_dir``. Returns [(op_name, total_ms, count)] sorted by time.

    Only events on a device process's "XLA Ops" timeline are counted (one
    row per executed HLO op, no double counting from the module/step rows
    and no host-side python TraceMe frames); if the trace has no such
    timeline (e.g. CPU platform), all complete events are aggregated.
    """
    files = sorted(glob.glob(os.path.join(log_dir, "**", "*.trace.json.gz"),
                             recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    data = json.load(gzip.open(files[-1]))
    events = data.get("traceEvents", [])
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and "args" in e:
            if e.get("name") == "process_name":
                pid_name[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tid_name[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    op_rows = {key for key, name in tid_name.items()
               if name == "XLA Ops" and
               pid_name.get(key[0], "").startswith("/device")}
    agg = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e and (
                not op_rows or (e.get("pid"), e.get("tid")) in op_rows):
            agg[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    return [(name, dur / 1000.0, cnt[name]) for name, dur in agg.most_common(top)]


def enable_nan_debugging(enable: bool = True):
    """jax_debug_nans toggle (the reference's missing sanitizer story)."""
    jax.config.update("jax_debug_nans", enable)
