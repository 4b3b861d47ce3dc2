"""Streamed forcing tests: async read-ahead, jit-safe slice lookup, and a
full model run driven by file-streamed climate."""

import numpy as np
import jax
import jax.numpy as jnp

from pism_tpu import Config, Grid, Time
from pism_tpu.coupler.stream import ForcingStream
from pism_tpu.coupler.surface import GivenStreamed
from pism_tpu.io.nc4 import File
from pism_tpu.model.icemodel import IceModel
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.verification import halfar

SPY = 3.15569259747e7


def _write_forcing(path, grid, nt=12):
    """Monthly SMB/temperature series: SMB = month index [m/a]."""
    with File(str(path), "w") as f:
        f.define_dimension("time", None, attrs={"units": "s"})
        f.define_dimension("y", grid.My, np.asarray(grid.y))
        f.define_dimension("x", grid.Mx, np.asarray(grid.x))
        f.define_variable("climatic_mass_balance", ("time", "y", "x"))
        f.define_variable("ice_surface_temp", ("time", "y", "x"))
        for k in range(nt):
            f.append_time(k * SPY / 12.0)
            f.write("climatic_mass_balance",
                    np.full(grid.shape2, float(k) / SPY), time_index=k)
            f.write("ice_surface_temp",
                    np.full(grid.shape2, 250.0 + k), time_index=k)
    return path


def test_stream_lookup_and_prefetch(tmp_path):
    grid = Grid(Mx=16, My=16, Lx=100e3, Ly=100e3)
    path = _write_forcing(tmp_path / "forcing.nc", grid)
    s = ForcingStream(str(path), "climatic_mass_balance", lookahead=3)
    # piecewise-constant lookup, end clamping
    assert float(s.slice_at(jnp.asarray(0.0))[0, 0]) * SPY == 0.0
    v = float(s.slice_at(jnp.asarray(2.5 * SPY / 12.0))[0, 0]) * SPY
    assert abs(v - 2.0) < 1e-4           # f32 storage rounding
    v = float(s.slice_at(jnp.asarray(99.0 * SPY))[0, 0]) * SPY
    assert abs(v - 11.0) < 1e-4
    # works under jit
    f = jax.jit(lambda t: s.slice_at(t).sum())
    assert float(f(jnp.asarray(4.1 * SPY / 12.0))) > 0
    # the read-ahead thread populated slices we never requested directly
    import time
    time.sleep(0.3)
    assert s.prefetch_hits + len(s._cache) > s.misses
    s.close()


def test_streamed_surface_drives_model(tmp_path):
    """A full (jitted while_loop) run with file-streamed climate matches the
    expected piecewise forcing: the applied SMB is the time-mean of the
    visited slices."""
    grid = Grid(Mx=16, My=16, Lx=100e3, Ly=100e3)
    path = _write_forcing(tmp_path / "forcing.nc", grid, nt=12)
    smb = ForcingStream(str(path), "climatic_mass_balance", lookahead=3)
    temp = ForcingStream(str(path), "ice_surface_temp", lookahead=3)
    cfg = Config({"stress_balance.model": "none",
                  "energy.model": "none",
                  "geometry.part_grid.enabled": False,
                  "time_stepping.maximum_time_step": 1.0 / 24.0})  # years
    state = ModelState(geometry=new_geometry(
        jnp.full(grid.shape2, 500.0), jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg,
                     surface=GivenStreamed(smb=smb, temperature=temp))
    H0 = float(state.geometry.ice_thickness[8, 8])
    state, stats = model.run(state, Time(0.0, 0.5 * SPY))
    H1 = float(state.geometry.ice_thickness[8, 8])
    # SMB ramps 0,1,...,5 m/a over the first 6 months (time-mean 2.5 m/a
    # exactly if each month is sampled uniformly; half-month steps do)
    growth = H1 - H0
    expected = np.mean([0, 1, 2, 3, 4, 5]) * 0.5
    assert abs(growth - expected) < 0.2
    assert smb.misses + len(smb._cache) <= 12  # bounded cache, no full load
    smb.close()
    temp.close()
