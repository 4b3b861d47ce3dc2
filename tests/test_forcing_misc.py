"""ScalarForcing, cold energy model, orographic precipitation tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.util.forcing import ScalarForcing
from pism_tpu.util.units import SEC_PER_YEAR as SPY


def test_scalar_forcing_interpolation():
    f = ScalarForcing.from_arrays([0.0, 100.0, 200.0], [0.0, -5.0, -2.0])
    assert float(f(50.0 * SPY)) == pytest.approx(-2.5)
    assert float(f(150.0 * SPY)) == pytest.approx(-3.5)
    # clamped outside the range
    assert float(f(500.0 * SPY)) == pytest.approx(-2.0)


def test_scalar_forcing_periodic():
    f = ScalarForcing.from_arrays([0.0, 1.0], [0.0, 1.0], periodic=True)
    assert float(f(1.25 * SPY)) == pytest.approx(0.25)
    assert float(f(10.5 * SPY)) == pytest.approx(0.5)


def test_scalar_forcing_file_roundtrip(tmp_path):
    from pism_tpu.io.nc4 import File
    path = str(tmp_path / "dT.nc")
    with File(path, "w") as f:
        f.define_dimension("time", None, attrs={"units": "years"})
        for i, (t, v) in enumerate([(0.0, 0.0), (1000.0, -10.0)]):
            n = f.append_time(t)
            f.write("delta_T", np.asarray([v]), ("time",), {"units": "K"},
                    time_index=n)
    f2 = ScalarForcing.from_file(path, "delta_T")
    assert float(f2(500.0 * SPY)) == pytest.approx(-5.0)


def test_cold_energy_model_runs():
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.verification import eismint2
    es = eismint2.setup("A", Mx=21, Mz=15, Lz=5000.0)
    es.config.update({"energy.model": "cold"})
    model = IceModel(grid=es.grid, config=es.config, surface=es.surface)
    state, t, stats = model.step_once(es.state, 0.0, 1000 * SPY)
    E = np.asarray(state.enthalpy)
    assert np.isfinite(E).all()
    # cold converter: water fraction identically zero
    w = np.asarray(model.EC.water_fraction(state.enthalpy, 1e5))
    assert (w == 0).all()


def test_orographic_precipitation_pattern():
    from pism_tpu.coupler.orographic import OrographicPrecipitation
    from pism_tpu.state import new_geometry
    grid = Grid(Mx=64, My=32, Lx=320e3, Ly=160e3)
    X, Y = np.meshgrid(grid.x, grid.y)
    bump = 1500.0 * np.exp(-((X / 40e3) ** 2 + (Y / 40e3) ** 2))
    geom = new_geometry(jnp.zeros(grid.shape2), jnp.asarray(bump))
    op = OrographicPrecipitation(grid=grid, wind_u=10.0,
                                 background_precip=0.5 / SPY)
    out = op(geom, 0.0)
    P = np.asarray(out.precipitation) * SPY
    assert (P >= 0).all()
    c = 16
    up = P[c, 20:31].mean()     # windward flank (west of the bump crest)
    down = P[c, 34:45].mean()   # lee side
    assert up > down            # rain shadow
    assert up > 0.5             # enhanced precipitation on the windward side
