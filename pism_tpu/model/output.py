"""Output scheduling: snapshots, spatial series, scalar series, backups.

Rebuild of PISM ``src/icemodel/output*.cc``: the three output channels
(``-save_times`` snapshots, ``-extra_file/-extra_times/-extra_vars`` spatial
series, ``-ts_file/-ts_times`` scalar series) plus wall-clock backups
(``-backup_interval``). The manager runs on the host at segment boundaries;
``IceModel.run`` clamps each jitted segment to the next requested output
time so outputs land exactly (PISM ``time_stepping.hit_extra_times``).
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from . import diagnostics as diag
from ..io import checkpoint as ckpt
from ..io.nc4 import File


def _times(seq) -> np.ndarray:
    return np.asarray(sorted(set(float(s) for s in seq)))


@dataclass
class OutputManager:
    grid: object
    config: object
    # snapshots: full model state at given times (model seconds)
    snapshot_times: Sequence[float] = ()
    snapshot_file: str = "snapshots_{kyr:.3f}.nc"
    # spatial series
    extra_times: Sequence[float] = ()
    extra_vars: Sequence[str] = ("thk", "usurf", "velbar_mag", "mask")
    extra_file: Optional[str] = None
    # scalar series
    ts_times: Sequence[float] = ()
    ts_vars: Sequence[str] = ("ice_volume_glacierized", "ice_area_glacierized",
                              "max_velocity")
    ts_file: Optional[str] = None
    # wall-clock backups
    backup_interval: float = 0.0   # seconds of wall time; 0 disables
    backup_file: str = "backup.nc"

    def __post_init__(self):
        self._snap = list(_times(self.snapshot_times))
        self._extra = list(_times(self.extra_times))
        self._ts = list(_times(self.ts_times))
        self._extra_f = File(self.extra_file, "w") if self.extra_file and self._extra else None
        self._ts_f = File(self.ts_file, "w") if self.ts_file and self._ts else None
        self._ts_records: List[dict] = []
        self._last_backup_wall = _time.time()
        if self._extra_f is not None:
            ckpt._setup_dims(self._extra_f, self.grid)
        if self._ts_f is not None:
            self._ts_f.define_dimension("time", None, attrs={
                "units": "seconds since 1-1-1", "calendar": "365_day"})

    # -- scheduling ----------------------------------------------------------
    def next_time(self, t: float) -> float:
        """Earliest pending output time strictly after t (inf if none)."""
        eps = 1e-3
        cands = [s[0] for s in (self._snap, self._extra, self._ts) if s and s[0] > t + eps]
        return min(cands) if cands else np.inf

    # -- processing ----------------------------------------------------------
    def process(self, state, t: float, model) -> None:
        eps = 1e-3
        while self._snap and self._snap[0] <= t + eps:
            ts = self._snap.pop(0)
            path = self.snapshot_file.format(kyr=ts / 3.15569259747e10, t=ts)
            ckpt.save_state(path, state, self.grid, t, config=self.config)
        while self._extra and self._extra[0] <= t + eps:
            self._extra.pop(0)
            self._write_extra(state, t, model)
        while self._ts and self._ts[0] <= t + eps:
            self._ts.pop(0)
            self._write_ts(state, t, model)
        if self.backup_interval > 0 and \
                _time.time() - self._last_backup_wall > self.backup_interval:
            ckpt.save_state(self.backup_file, state, self.grid, t,
                            config=self.config)
            self._last_backup_wall = _time.time()

    def _write_extra(self, state, t, model):
        f = self._extra_f
        if f is None:
            return
        n = f.append_time(t)
        values = diag.compute_spatial(self.extra_vars, state, model, t)
        for name, v in values.items():
            d = diag.SPATIAL[name]
            arr = np.asarray(v)
            dims = ("time", "y", "x") if arr.ndim == 2 else ("time", "y", "x", "z")
            f.write(name, arr[None], dims,
                    {"units": d.units, "long_name": d.long_name}, time_index=n)
        f.h5.flush()

    def _write_ts(self, state, t, model):
        f = self._ts_f
        if f is None:
            return
        n = f.append_time(t)
        values = diag.compute_scalar(self.ts_vars, state, model, t)
        rec = {"time": t}
        for name, v in values.items():
            d = diag.SCALAR[name]
            f.write(name, np.asarray(float(v)).reshape(1), ("time",),
                    {"units": d.units, "long_name": d.long_name}, time_index=n)
            rec[name] = float(v)
        self._ts_records.append(rec)
        f.h5.flush()

    def close(self):
        if self._extra_f is not None:
            self._extra_f.close()
        if self._ts_f is not None:
            self._ts_f.close()
