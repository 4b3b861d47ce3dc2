"""Profiling and run-summary reporting.

Rebuild of PISM's ``Profiling`` (``src/util/Profiling.cc``, PETSc log
stages/events; ``-profile`` / ``-log_view``) on JAX's tracing tools:

- ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
  TensorBoard-compatible device trace of the jitted segments.
- ``Timings``: lightweight named host-side timers (the per-component wall
  clock table PISM prints at exit).
- ``annotate(name)``: ``jax.profiler.TraceAnnotation`` wrapper so components
  show up as named ranges in the device trace (PISM's log events).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class Timings:
    """Named wall-clock accumulators (PISM's per-stage summary table)."""

    def __init__(self):
        self._total: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        tic = time.time()
        try:
            yield
        finally:
            self._total[name] += time.time() - tic
            self._count[name] += 1

    def report(self) -> str:
        lines = [f"{'stage':<28} {'calls':>7} {'total [s]':>10} {'mean [ms]':>10}"]
        for name in sorted(self._total, key=self._total.get, reverse=True):
            tot, cnt = self._total[name], self._count[name]
            lines.append(f"{name:<28} {cnt:>7d} {tot:>10.2f} "
                         f"{1000.0 * tot / max(cnt, 1):>10.2f}")
        return "\n".join(lines)
