"""Verbosity-leveled logger.

Rebuild of PISM ``src/util/Logger.cc``: printing gated by a verbosity
threshold (PISM levels 1-5: 1 = errors/warnings only, 2 = default
per-segment summaries, 3 = component init/progress detail, 4 = solver
detail, 5 = tracing). The reference prints on MPI rank 0 only; under SPMD
JAX every host runs the same Python, so the analog is printing only on
process index 0 (multi-host runs), which this logger checks lazily.

Usage::

    from pism_tpu.util.logger import log, set_verbosity
    set_verbosity(3)
    log.message(2, "t = %.1f a, dt = %.3f a", t, dt)
    log.warning("KSP did not converge; retrying with higher regularization")
"""

from __future__ import annotations

import sys
import time
from dataclasses import dataclass, field
from typing import Optional


@dataclass
class Logger:
    verbosity: int = 2
    stream: object = None          # defaults to stdout lazily
    _t0: float = field(default_factory=time.time)

    def _is_main_process(self) -> bool:
        try:
            import jax
            return jax.process_index() == 0
        except Exception:
            return True

    def message(self, threshold: int, fmt: str, *args) -> None:
        """Print if ``verbosity >= threshold`` (PISM ``Logger::message``)."""
        if self.verbosity < threshold or not self._is_main_process():
            return
        out = self.stream or sys.stdout
        print(fmt % args if args else fmt, file=out)
        out.flush()

    def warning(self, fmt: str, *args) -> None:
        """Always-printed warning (PISM prints warnings at verbosity 1)."""
        if self.verbosity < 1 or not self._is_main_process():
            return
        out = self.stream or sys.stderr
        print("WARNING: " + (fmt % args if args else fmt), file=out)
        out.flush()

    def error(self, fmt: str, *args) -> None:
        out = self.stream or sys.stderr
        print("ERROR: " + (fmt % args if args else fmt), file=out)
        out.flush()

    def wall_time(self) -> float:
        """Seconds since logger creation (for PISM-style summary lines)."""
        return time.time() - self._t0


#: process-global logger (PISM's ``Context`` carries one; a module global
#: matches the pure-function component style here)
log = Logger()


def set_verbosity(level: int) -> None:
    log.verbosity = int(level)


def get_verbosity() -> int:
    return log.verbosity
