"""Timing and profiling utilities.

The reference instruments with ad-hoc ``gettimeofday`` wall-clock prints
(``SSS_get_time``, amg/SSS_utils.c:3-12; ``get_time``,
amg/Setup/SSS_inter.cu:7-14).  Here:

* :class:`Timer` / :func:`timed` — structured wall-clock timers with named
  sections and a report table.
* :func:`profile_trace` — context manager around ``jax.profiler`` for
  device-level traces (view with TensorBoard / xprof).
* :func:`flops_counters` — per-op GFLOP/s and nnz/s helpers used by the
  bench harness (the BASELINE.json metric).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


class Timer:
    """Named-section wall-clock timer with accumulation."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["%-28s %10s %8s %12s" % ("section", "total s", "calls", "s/call")]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append("%-28s %10.4f %8d %12.6f" % (name, t, c, t / max(c, 1)))
        return "\n".join(lines)


@contextlib.contextmanager
def timed(label: str, log=print):
    """One-shot timer print, reference style (``... time: %g s``)."""
    t0 = time.perf_counter()
    yield
    log(f"{label} time: {time.perf_counter() - t0:g} s")


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/amg_tpu_trace"):
    """Capture a jax.profiler device trace around the body."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def spmv_rates(nnz: int, seconds: float) -> dict:
    """GFLOP/s and nnz/s for one SpMV (2 flops per nonzero)."""
    return {
        "nnz_per_s": nnz / seconds,
        "gflops": 2.0 * nnz / seconds / 1e9,
    }
