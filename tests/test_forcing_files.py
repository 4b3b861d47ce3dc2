"""File-driven coupler forcing (reference role: every PISM coupler reads
its own ``...file`` option): ``inputs_from_files`` + time-dependent
``given`` models with unit conversion and regridding."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.coupler import factory as cf
from pism_tpu.io.nc4 import File
from pism_tpu.state import new_geometry

SPY = 3.15569259747e7
RHO_I = 910.0


def _write_surface_forcing(path, grid, nt=4):
    """Quarterly SMB [kg m-2 year-1] and temperature [degC] stacks."""
    with File(str(path), "w") as f:
        f.define_dimension("time", None, attrs={"units": "s"})
        f.define_dimension("y", grid.My, np.asarray(grid.y))
        f.define_dimension("x", grid.Mx, np.asarray(grid.x))
        f.define_variable("climatic_mass_balance", ("time", "y", "x"),
                          attrs={"units": "kg m-2 year-1"})
        f.define_variable("ice_surface_temp", ("time", "y", "x"),
                          attrs={"units": "degC"})
        for k in range(nt):
            f.append_time(k * SPY / nt)
            f.write("climatic_mass_balance",
                    np.full(grid.shape2, 91.0 * (k + 1)), time_index=k)
            f.write("ice_surface_temp",
                    np.full(grid.shape2, -20.0 + k), time_index=k)
    return str(path)


def _write_scalar_series(path, name, times_years, values):
    with File(str(path), "w") as f:
        f.define_dimension("time", None, attrs={"units": "years"})
        f.define_variable(name, ("time",))
        for k, (t, v) in enumerate(zip(times_years, values)):
            f.append_time(t)
            f.write(name, np.asarray(v), time_index=k)
    return str(path)


def test_surface_given_from_file(tmp_path):
    grid = Grid(Mx=9, My=9, Lx=100e3, Ly=100e3)
    path = _write_surface_forcing(tmp_path / "smb.nc", grid)
    cfg = Config({"surface.models": "given",
                  "surface.given.file": path,
                  "surface.given.period": 1.0})
    inputs = cf.inputs_from_files(cfg, grid, "surface")
    assert "climatic_mass_balance" in inputs and "times" in inputs
    surface = cf.surface_from_config(cfg, inputs=inputs)
    geom = new_geometry(jnp.full(grid.shape2, 500.0), jnp.zeros(grid.shape2))
    # units converted: 91 kg m-2 a-1 = 0.1 m ice a-1; interval-constant SMB
    out = surface(geom, 0.1 * SPY)
    assert float(out.smb[4, 4]) * SPY == pytest.approx(0.1, rel=1e-5)
    # temperature converted degC -> K, linear in time: 40% between
    # -20 C and -19 C at t = 0.1 a (quarterly samples)
    assert float(out.temperature[4, 4]) \
        == pytest.approx(273.15 - 19.6, abs=1e-3)
    # periodized: 1.1 years ~ 0.1 years
    out2 = surface(geom, 1.1 * SPY)
    assert float(out2.smb[4, 4]) == pytest.approx(float(out.smb[4, 4]),
                                                  rel=1e-6)


def test_ocean_th_from_file(tmp_path):
    grid = Grid(Mx=9, My=9, Lx=100e3, Ly=100e3)
    with File(str(tmp_path / "th.nc"), "w") as f:
        f.define_dimension("time", None, attrs={"units": "years"})
        f.define_dimension("y", grid.My, np.asarray(grid.y))
        f.define_dimension("x", grid.Mx, np.asarray(grid.x))
        f.define_variable("theta_ocean", ("time", "y", "x"),
                          attrs={"units": "K"})
        f.define_variable("salinity_ocean", ("time", "y", "x"),
                          attrs={"units": "g/kg"})
        for k in range(3):
            f.append_time(float(10 * k))
            f.write("theta_ocean", np.full(grid.shape2, 271.0 + k),
                    time_index=k)
            f.write("salinity_ocean", np.full(grid.shape2, 34.7),
                    time_index=k)
    cfg = Config({"ocean.models": "th",
                  "ocean.th.file": str(tmp_path / "th.nc")})
    ocean = cf.ocean_from_config(
        cfg, inputs=cf.inputs_from_files(cfg, grid, "ocean"), grid=grid)
    geom = new_geometry(jnp.full(grid.shape2, 400.0),
                        jnp.full(grid.shape2, -1500.0))
    m0 = float(ocean.inputs(geom, 0.0).shelf_base_melt[4, 4])
    m2 = float(ocean.inputs(geom, 20.0 * SPY).shelf_base_melt[4, 4])
    assert m2 > m0 > 0.0           # warming series melts more


def test_scalar_modifier_files(tmp_path):
    grid = Grid(Mx=9, My=9, Lx=100e3, Ly=100e3)
    dt_file = _write_scalar_series(tmp_path / "dT.nc", "delta_T",
                                   [0.0, 100.0], [0.0, 5.0])
    mbp_file = _write_scalar_series(tmp_path / "mbp.nc", "frac_MBP",
                                    [0.0, 100.0], [0.0, 1.0])
    cfg = Config({"atmosphere.models": "uniform,delta_T",
                  "atmosphere.delta_T.file": dt_file,
                  "ocean.models": "constant,frac_MBP",
                  "ocean.frac_MBP.file": mbp_file})
    atm = cf.atmosphere_from_config(
        cfg, inputs=cf.inputs_from_files(cfg, grid, "atmosphere"))
    geom = new_geometry(jnp.full(grid.shape2, 500.0), jnp.zeros(grid.shape2))
    T0 = float(atm(geom, 0.0).temperature[4, 4])
    T50 = float(atm(geom, 50.0 * SPY).temperature[4, 4])
    assert T50 == pytest.approx(T0 + 2.5, abs=1e-6)
    ocean = cf.ocean_from_config(
        cfg, inputs=cf.inputs_from_files(cfg, grid, "ocean"), grid=grid)
    # melange fraction 0.5 at t = 50 a: water pressure between default and
    # the full ice overburden average
    Pw = ocean.water_column_pressure(geom, 50.0 * SPY)
    from pism_tpu.coupler.ocean import hydrostatic_water_column_pressure
    P_def = hydrostatic_water_column_pressure(geom)
    P_ice = 0.5 * 9.81 * 910.0 * 500.0
    assert float(P_def[4, 4]) < float(Pw[4, 4]) < P_ice
