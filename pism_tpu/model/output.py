"""Output scheduling: snapshots, spatial series, scalar series, backups.

Rebuild of PISM ``src/icemodel/output*.cc``: the three output channels
(``-save_times`` snapshots, ``-extra_file/-extra_times/-extra_vars`` spatial
series, ``-ts_file/-ts_times`` scalar series) plus wall-clock backups
(``-backup_interval``). The manager runs on the host at segment boundaries;
``IceModel.run`` clamps each jitted segment to the next requested output
time so outputs land exactly (PISM ``time_stepping.hit_extra_times``).

Asynchronous writes (the analog of the reference's parallel NetCDF path,
which overlaps I/O with compute across ranks): with ``async_io`` (default)
the device->host transfer and the NetCDF write run on a single worker
thread in submission order, so the next jitted segment launches without
waiting on the disk. JAX arrays are immutable, so handing the state to the
writer is safe while the device advances. ``close()`` drains the queue.
"""

from __future__ import annotations

import queue as _queue
import threading as _threading
import time as _time
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import numpy as np

from . import diagnostics as diag
from ..io import checkpoint as ckpt
from ..io.nc4 import File


class _AsyncWriter:
    """Single worker thread executing write closures in order."""

    def __init__(self):
        self._q: _queue.Queue = _queue.Queue()
        self._err = None
        self._thread = _threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        while True:
            task = self._q.get()
            try:
                if task is None:
                    return
                try:
                    task()
                except Exception as e:      # surfaced on next submit/drain
                    self._err = e
            finally:
                self._q.task_done()

    def submit(self, task):
        if self._err is not None:
            err, self._err = self._err, None
            raise err
        self._q.put(task)

    def drain(self):
        self._q.join()
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def stop(self):
        self._q.put(None)
        self._thread.join(timeout=30.0)
        if self._err is not None:
            err, self._err = self._err, None
            raise err


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
    # runtime map viewer (reference -view X11 maps; here PNG frames
    # refreshed at every segment boundary on the writer thread)
    view_vars: Sequence[str] = ()
    view_dir: str = "."
    # overlap device->host transfer + NetCDF writes with the device loop
    async_io: bool = True

    def __post_init__(self):
        # vector diagnostics expand to their component variables (reference:
        # requesting `velbar` writes `ubar` and `vbar`)
        self.extra_vars = diag.expand_names(self.extra_vars)
        self.view_vars = diag.expand_names(self.view_vars)
        # reference output.extra.stop_missing: unknown -extra_vars entries
        # stop the run up front (default) or are dropped with a warning
        unknown = [n for n in self.extra_vars
                   if n not in diag.SPATIAL and n not in diag.SPATIAL_RATE]
        if unknown:
            stop = (self.config.get_flag("output.extra.stop_missing")
                    if self.config is not None else True)
            if stop:
                raise ValueError(
                    f"unknown -extra_vars entries: {unknown}; see "
                    "-list_diagnostics (set output.extra.stop_missing=false "
                    "to drop them instead)")
            from ..util.logger import log
            log.message(1, "dropping unknown -extra_vars entries: %s",
                        unknown)
            self.extra_vars = tuple(n for n in self.extra_vars
                                    if n not in unknown)
        self._writer = _AsyncWriter() if self.async_io else None
        self._snap = list(_times(self.snapshot_times))
        self._extra = list(_times(self.extra_times))
        self._ts = list(_times(self.ts_times))
        self._extra_f = File(self.extra_file, "w") if self.extra_file and self._extra else None
        self._ts_f = File(self.ts_file, "w") if self.ts_file and self._ts else None
        self._ts_records: List[dict] = []
        self._last_backup_wall = _time.time()
        # previous reporting-window sample per channel, set by start()
        self._ts_prev = None
        self._extra_prev = None
        self._ts_rates = [n for n in self.ts_vars if n in diag.RATE]
        self._extra_rates = [n for n in self.extra_vars
                             if n in diag.SPATIAL_RATE]
        if self.config is not None:
            from ..io.nc4 import File as _F
            _F.set_compression_level(
                self.config.get_int("output.compression_level"))
        if self._extra_f is not None:
            ckpt._setup_dims(self._extra_f, self.grid, self.config)
            self._setup_bounds(self._extra_f)
        if self._ts_f is not None:
            units, cal = "seconds since 1-1-1", "365_day"
            if self.config is not None:
                cal = self.config.get_string("time.calendar")
                units = "seconds since " \
                    + self.config.get_string("time.reference_date")
            self._ts_f.define_dimension("time", None, attrs={
                "units": units, "calendar": cal})
            self._setup_bounds(self._ts_f)

    @staticmethod
    def _setup_bounds(f):
        """CF time bounds: reporting windows of rate quantities (PISM writes
        ``time_bnds`` on both -ts and -extra files)."""
        f.define_dimension("nv", 2)
        f.h5["time"].attrs["bounds"] = "time_bnds"

    @staticmethod
    def _stats_sums(stats):
        if stats is None:
            return (0.0,) * 9
        return (float(stats.sum_smb), float(stats.sum_bmb),
                float(stats.sum_div_flux), float(stats.sum_nonneg),
                float(stats.sum_discharge), float(stats.sum_calving),
                float(stats.sum_frontal_melt),
                float(stats.sum_forced_retreat), float(stats.nsteps))

    def _sample(self, state, t, model, stats, scalars=False, cells=False):
        """Cumulative sample for window bookkeeping. Host copies (a device
        sync) happen ONLY for the pieces a channel's requested rate
        diagnostics actually need, so runs with no tendency_* vars keep
        the async-writer design fully non-blocking."""
        s = {"t": float(t)}
        if scalars:
            s["vol"] = float(diag.SCALAR["ice_volume"].func(state, model, t))
            s["vol_gl"] = float(
                diag.SCALAR["ice_volume_glacierized"].func(state, model, t))
            s["sums"] = self._stats_sums(stats)
        if cells:
            cell = None
            if stats is not None and stats.cell is not None:
                cell = tuple(np.asarray(x) for x in stats.cell)
            s["cell"] = cell
            s["H"] = np.asarray(state.geometry.ice_thickness)
            s["topg"] = np.asarray(state.geometry.bed_elevation)
            water = None
            if state.tillwat is not None:
                water = np.asarray(state.tillwat)
            if state.hydro_W is not None:
                W = np.asarray(state.hydro_W)
                water = W if water is None else water + W
            s["water"] = water
        return s

    def start(self, state, t: float, model) -> None:
        """Record the run-start sample so the first reporting window of the
        rate diagnostics covers [run start, first output time]."""
        self._ts_prev = self._sample(state, t, model, None,
                                     scalars=bool(self._ts_rates))
        self._extra_prev = self._sample(state, t, model, None,
                                        cells=bool(self._extra_rates))

    @staticmethod
    def _window(prev, cur, model):
        """diag.Window (scalar budget) for [prev, cur]."""
        dt = max(cur["t"] - prev["t"], 1e-30)
        d = [a - b for a, b in zip(cur["sums"], prev["sums"])]
        return diag.Window(dt=dt, d_volume=cur["vol"] - prev["vol"],
                           d_smb=d[0], d_bmb=d[1], d_flow=d[2], d_nonneg=d[3],
                           d_discharge=d[4], rho_i=model.rho_i,
                           d_calving=d[5], d_frontal_melt=d[6],
                           d_forced_retreat=d[7],
                           d_nsteps=d[8] if len(d) > 8 else 0.0,
                           d_volume_glacierized=cur.get("vol_gl", 0.0)
                           - prev.get("vol_gl", 0.0))

    @staticmethod
    def _window2d(prev, cur, model):
        """Per-cell diag.Window2D for [prev, cur]."""
        dt = max(cur["t"] - prev["t"], 1e-30)
        shape = cur["H"].shape
        z = np.zeros(shape)
        c1 = cur["cell"] if cur["cell"] is not None else (z,) * 8
        c0 = prev["cell"] if prev["cell"] is not None else (z,) * 8
        d = [a - b for a, b in zip(c1, c0)]
        return diag.Window2D(dt=dt, d_thickness=cur["H"] - prev["H"],
                             d_flow=d[0], d_smb=d[1], d_bmb=d[2],
                             d_nonneg=d[3], d_discharge=d[4],
                             d_calving=d[5], d_frontal_melt=d[6],
                             d_forced_retreat=d[7],
                             rho_i=model.rho_i,
                             d_topg=cur["topg"] - prev["topg"]
                             if "topg" in cur and "topg" in prev else None,
                             d_water=cur["water"] - prev["water"]
                             if cur.get("water") is not None
                             and prev.get("water") is not None else None,
                             cell_area=model.grid.dx * model.grid.dy)

    # -- scheduling ----------------------------------------------------------
    def next_time(self, t: float) -> float:
        """Earliest pending output time strictly after t (inf if none).

        Segments end exactly on these times so records land on their
        nominal stamps; the reference gates that per channel with
        time_stepping.hit_{save,ts,extra}_times (on by default) — a
        disabled channel's records are written at whatever segment
        boundary first passes them."""
        eps = 1e-3
        chans = []
        if self.config is None:
            chans = [self._snap, self._extra, self._ts]
        else:
            for s, key in ((self._snap, "time_stepping.hit_save_times"),
                           (self._extra, "time_stepping.hit_extra_times"),
                           (self._ts, "time_stepping.hit_ts_times")):
                if self.config.get_flag(key):
                    chans.append(s)
        cands = [s[0] for s in chans if s and s[0] > t + eps]
        return min(cands) if cands else np.inf

    def _submit(self, task) -> None:
        """Run ``task`` on the writer thread (in order), or inline."""
        if self._writer is not None:
            self._writer.submit(task)
        else:
            task()

    # -- processing ----------------------------------------------------------
    def process(self, state, t: float, model, stats=None) -> None:
        eps = 1e-3
        while self._snap and self._snap[0] <= t + eps:
            ts = self._snap.pop(0)
            path = self.snapshot_file.format(kyr=ts / 3.15569259747e10, t=ts)
            self._submit(lambda path=path, state=state, t=t: ckpt.save_state(
                path, state, self.grid, t, config=self.config))
        # coalesce all due times into ONE record (several requested times
        # can land inside one segment when spaced below the dt floor; a
        # second write at the same t would produce a degenerate zero-length
        # reporting window)
        due = False
        while self._extra and self._extra[0] <= t + eps:
            self._extra.pop(0)
            due = True
        if due:
            self._write_extra(state, t, model, stats)
        due = False
        while self._ts and self._ts[0] <= t + eps:
            self._ts.pop(0)
            due = True
        if due:
            self._write_ts(state, t, model, stats)
        if self.backup_interval > 0 and \
                _time.time() - self._last_backup_wall > self.backup_interval:
            self.write_backup(state, t)
        if self.view_vars:
            self._write_view(state, t, model)

    def _write_view(self, state, t, model) -> None:
        """Refresh the viewer PNGs (reference ``-view``: live X11 map per
        variable, updated each step; here one ``view_<var>.png`` per
        variable, overwritten at each segment boundary)."""
        import os
        names = [n for n in self.view_vars if n in diag.SPATIAL]
        values = diag.compute_spatial(names, state, model, t)
        x_km = np.asarray(self.grid.x) / 1e3
        y_km = np.asarray(self.grid.y) / 1e3
        extent = [x_km[0], x_km[-1], y_km[0], y_km[-1]]

        def task(values=values, t=t):
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            for name, v in values.items():
                arr = np.asarray(v)
                if arr.ndim == 3:
                    arr = arr[..., -1]      # show the surface level of 3D
                d = diag.SPATIAL[name]
                fig, ax = plt.subplots(figsize=(5.2, 4.2), dpi=110)
                im = ax.imshow(arr, origin="lower", extent=extent,
                               aspect="equal")
                fig.colorbar(im, ax=ax, label=d.units or "")
                ax.set_xlabel("x [km]")
                ax.set_ylabel("y [km]")
                ax.set_title(f"{name} at {t / 3.15569259747e7:,.1f} yr")
                fig.tight_layout()
                fig.savefig(os.path.join(self.view_dir, f"view_{name}.png"))
                plt.close(fig)

        self._submit(task)

    def write_backup(self, state, t: float) -> None:
        """Write a full-state backup now (wall-clock schedule or SIGUSR1)."""
        self._submit(lambda state=state, t=t: ckpt.save_state(
            self.backup_file, state, self.grid, t, config=self.config))
        self._last_backup_wall = _time.time()

    def _write_extra(self, state, t, model, stats=None):
        f = self._extra_f
        if f is None:
            return
        # diagnostics are computed (dispatched) on the main thread; the
        # device->host transfer + h5 write happen on the writer thread
        inst = [n for n in self.extra_vars if n not in diag.SPATIAL_RATE]
        rates = self._extra_rates
        values = diag.compute_spatial(inst, state, model, t)
        cur = self._sample(state, t, model, stats, cells=bool(rates))
        prev = self._extra_prev if self._extra_prev is not None else cur
        rate_values = {}
        if rates:
            rate_values = diag.compute_spatial_rates(
                rates, self._window2d(prev, cur, model))
        self._extra_prev = cur
        t0 = prev["t"]

        def task(values=values, rate_values=rate_values, t=t, t0=t0):
            n = f.append_time(t)
            f.write("time_bnds", np.asarray([[t0, t]]), ("time", "nv"),
                    time_index=n)
            for name, v in values.items():
                d = diag.SPATIAL[name]
                arr = np.asarray(v)
                if arr.ndim == 2:
                    dims = ("time", "y", "x")
                elif arr.shape[-1] == self.grid.Mz:
                    dims = ("time", "y", "x", "z")
                    if "z" not in f.h5:
                        # grids with Mz == 1 get no z dim from _setup_dims
                        f.define_dimension("z", self.grid.Mz, self.grid.z,
                                           attrs={"units": "m", "axis": "Z",
                                                  "positive": "up"})
                else:
                    # layer-indexed field (e.g. isochrone_depth)
                    dims = ("time", "y", "x", "nl")
                    if "nl" not in f.h5:
                        f.define_dimension("nl", arr.shape[-1])
                fv = None if self.config is None else \
                    self.config.get_number("output.fill_value")
                f.write(name, arr[None], dims,
                        {"units": d.units, "long_name": d.long_name,
                         "_FillValue": fv},
                        time_index=n)
            for name, v in rate_values.items():
                d = diag.SPATIAL_RATE[name]
                fv = None if self.config is None else \
                    self.config.get_number("output.fill_value")
                f.write(name, np.asarray(v)[None], ("time", "y", "x"),
                        {"units": d.units, "long_name": d.long_name,
                         "cell_methods": "time: mean",
                         "_FillValue": fv}, time_index=n)
            f.h5.flush()

        self._submit(task)

    def _write_ts(self, state, t, model, stats=None):
        f = self._ts_f
        if f is None:
            return
        inst = [n for n in self.ts_vars if n not in diag.RATE]
        rates = self._ts_rates
        values = diag.compute_scalar(inst, state, model, t)
        cur = self._sample(state, t, model, stats, scalars=bool(rates))
        prev = self._ts_prev if self._ts_prev is not None else cur
        rate_values = {}
        if rates:
            rate_values = diag.compute_rates(
                rates, self._window(prev, cur, model))
        self._ts_prev = cur
        t0 = prev["t"]

        def task(values=values, rate_values=rate_values, t=t, t0=t0):
            n = f.append_time(t)
            f.write("time_bnds", np.asarray([[t0, t]]), ("time", "nv"),
                    time_index=n)
            rec = {"time": t}
            for name, v in values.items():
                d = diag.SCALAR[name]
                f.write(name, np.asarray(float(v)).reshape(1), ("time",),
                        {"units": d.units, "long_name": d.long_name},
                        time_index=n)
                rec[name] = float(v)
            for name, v in rate_values.items():
                d = diag.RATE[name]
                f.write(name, np.asarray(float(v)).reshape(1), ("time",),
                        {"units": d.units, "long_name": d.long_name,
                         "cell_methods": "time: mean"}, time_index=n)
                rec[name] = float(v)
            self._ts_records.append(rec)
            f.h5.flush()

        self._submit(task)

    def flush(self):
        """Block until all queued writes hit the files."""
        if self._writer is not None:
            self._writer.drain()

    def close(self):
        if self._writer is not None:
            self._writer.stop()
            self._writer = None
        if self._extra_f is not None:
            self._extra_f.close()
        if self._ts_f is not None:
            self._ts_f.close()
