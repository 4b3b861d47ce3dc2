"""POSIX signal handling for long runs.

Rebuild of the reference driver's signal machinery
(``src/icemodel/IceModel.cc`` ``IceModel::process_signals``): SIGTERM asks
the run to stop cleanly at the next step boundary (the final model state is
still written), SIGUSR1 writes a wall-clock-style backup and continues. Here
the host-driven segment loop polls a :class:`SignalMonitor` between jitted
segments, so a signal never interrupts device work mid-step.
"""

from __future__ import annotations

import signal
import threading


class SignalMonitor:
    """Context manager that latches SIGTERM / SIGUSR1 into flags.

    Handlers are installed on ``__enter__`` and the previous handlers are
    restored on ``__exit__``; safe to nest runs. Only the main thread of the
    main interpreter can install handlers — constructing the monitor from a
    worker thread yields an inert monitor (both queries return False), so
    library users embedding the model in threads are unaffected.
    """

    def __init__(self):
        self._stop = False
        self._backup = False
        self._saved = {}
        self._active = False

    # -- handler entry points (async-signal context: just set flags) ---------
    def _on_term(self, signum, frame):
        self._stop = True

    def _on_usr1(self, signum, frame):
        self._backup = True

    def __enter__(self) -> "SignalMonitor":
        if threading.current_thread() is threading.main_thread():
            for sig, fn in ((signal.SIGTERM, self._on_term),
                            (signal.SIGUSR1, self._on_usr1)):
                self._saved[sig] = signal.signal(sig, fn)
            self._active = True
        return self

    def __exit__(self, *exc):
        for sig, old in self._saved.items():
            signal.signal(sig, old)
        self._saved.clear()
        self._active = False
        return False

    # -- polling --------------------------------------------------------------
    def stop_requested(self) -> bool:
        """True once SIGTERM was received (sticky)."""
        return self._stop

    def take_backup_request(self) -> bool:
        """True if SIGUSR1 arrived since the last call; clears the latch."""
        if self._backup:
            self._backup = False
            return True
        return False
