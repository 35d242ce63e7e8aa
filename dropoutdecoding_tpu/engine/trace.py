"""Tracing / profiling hooks.

The reference has no profiling beyond tqdm (SURVEY.md §5).  The BASELINE
north star is a latency target, so the engine gets first-class timers:

- ``StageTimer``: wall-clock per stage (prefill / decode / eval), with a
  structured JSON report.
- ``profile_trace``: context manager around ``jax.profiler.trace`` for
  on-TPU traces viewable in TensorBoard/XProf.

Timing caveat encoded here once: over remote TPU dispatch,
``block_until_ready`` may return before execution finishes, so timers
force a tiny host transfer of their tagged array.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import numpy as np


def force(x):
    """Force real device execution (host fetch of one element)."""
    if hasattr(x, "ravel"):
        np.asarray(x.ravel()[0] if x.size else x)
    return x


class StageTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                force(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_s": round(self.totals[name] / self.counts[name], 4),
            }
            for name in self.totals
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.report(), f, indent=2)


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace when a log dir is given; no-op otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
