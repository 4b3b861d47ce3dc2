"""Bootstrap-from-file tests: regrid-on-read + heuristic initialization
(PISM ``-bootstrap`` regression analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.io.bootstrap import bootstrap, read_and_regrid
from pism_tpu.io.nc4 import File

SPY = 3.15569259747e7


@pytest.fixture
def input_file(tmp_path):
    """An input dataset on a FINER grid than the model grid."""
    path = str(tmp_path / "input.nc")
    x = np.linspace(-500e3, 500e3, 101)
    y = np.linspace(-400e3, 400e3, 81)
    X, Y = np.meshgrid(x, y)
    r = np.sqrt(X ** 2 + Y ** 2)
    thk = np.maximum(2000.0 * (1 - (r / 400e3) ** 2), 0.0)
    topg = -200.0 + 300.0 * np.exp(-(r / 200e3) ** 2)
    T = 243.15 + 30.0 * (r / 500e3)
    with File(path, "w") as f:
        f.define_dimension("y", 81, y, attrs={"units": "m"})
        f.define_dimension("x", 101, x, attrs={"units": "m"})
        f.write("thk", thk, ("y", "x"), {"units": "m"})
        f.write("topg", topg, ("y", "x"), {"units": "m"})
        f.write("ice_surface_temp", T, ("y", "x"), {"units": "K"})
    return path, (x, y, thk, topg)


def test_regrid_on_read(input_file):
    path, (x, y, thk, topg) = input_file
    grid = Grid(Mx=41, My=33, Lx=450e3, Ly=350e3)
    fields = read_and_regrid(path, grid, ["thk", "topg"])
    assert fields["thk"].shape == grid.shape2
    # values interpolate the paraboloid closely on the coarser grid
    X, Y = np.meshgrid(grid.x, grid.y)
    r = np.sqrt(X ** 2 + Y ** 2)
    want = np.maximum(2000.0 * (1 - (r / 400e3) ** 2), 0.0)
    err = np.abs(fields["thk"] - want)
    # interior is smooth (curvature-limited ~3 m); the margin kink of
    # max(., 0) dominates the max error
    assert err.max() < 20.0
    interior = want > 500.0
    assert err[interior].max() < 5.0


def test_bootstrap_builds_full_state(input_file):
    path, _ = input_file
    grid = Grid(Mx=41, My=33, Lx=450e3, Ly=350e3, Mz=15, Lz=4000.0)
    cfg = Config()
    state = bootstrap(path, grid, cfg)
    H = np.asarray(state.geometry.ice_thickness)
    assert H.max() > 1500.0 and H.min() == 0.0
    assert state.enthalpy is not None
    assert state.enthalpy.shape == grid.shape3
    E = np.asarray(state.enthalpy)
    assert np.isfinite(E).all()
    # basal temperature warmer than surface (geothermal heuristic profile)
    EC_T = lambda k: float(state.enthalpy[16, 20, k])
    assert EC_T(0) > EC_T(-1)
    # and a model built from this state runs
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.coupler.surface import Uniform
    cfg2 = Config({"stress_balance.model": "sia",
                   "stress_balance.sia.flow_law": "isothermal_glen",
                   "energy.model": "none"})
    model = IceModel(grid=grid, config=cfg2, surface=Uniform(smb=0.0))
    state2 = state.replace(enthalpy=None, basal_melt_rate=None)
    out, t, stats = model.step_once(state2, 0.0, 20 * SPY)
    assert not np.isnan(np.asarray(out.geometry.ice_thickness)).any()


def test_bootstrap_bheatflx_map(tmp_path):
    """-bootstrap reads a 2D geothermal flux map (variable bheatflx) into
    the state; it survives a checkpoint round trip."""
    import jax.numpy as jnp
    import numpy as np

    from pism_tpu import Config, Grid
    from pism_tpu.io import checkpoint as ckpt
    from pism_tpu.io.bootstrap import bootstrap
    from pism_tpu.io.nc4 import File

    grid = Grid(Mx=11, My=9, Lx=100e3, Ly=80e3, Mz=8, Lz=4000.0)
    H = np.full((9, 11), 800.0)
    G = np.linspace(0.03, 0.2, 99).reshape(9, 11)
    path = str(tmp_path / "boot.nc")
    with File(path, "w") as f:
        ckpt._setup_dims(f, grid)
        f.append_time(0.0)
        f.write("thk", H[None], dims=("time", "y", "x"), attrs={"units": "m"})
        f.write("bheatflx", G[None], dims=("time", "y", "x"),
                attrs={"units": "W m-2"})
    cfg = Config({"energy.model": "enthalpy",
                  "bootstrapping.defaults.ice_surface_temp": 233.15})
    state = bootstrap(path, grid, cfg)
    np.testing.assert_allclose(np.asarray(state.geothermal_flux), G,
                               rtol=1e-12)
    # hotter basal boundary -> warmer bootstrap enthalpy profile at the base
    Eb = np.asarray(state.enthalpy[..., 0])
    assert Eb[-1, -1] > Eb[0, 0]

    out = str(tmp_path / "state.nc")
    ckpt.save_state(out, state, grid, 0.0, cfg)
    state2, t2 = ckpt.load_state(out, cfg)
    np.testing.assert_array_equal(np.asarray(state2.geothermal_flux),
                                  np.asarray(state.geothermal_flux))
