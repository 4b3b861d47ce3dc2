"""Coupler tests: PDD surface model, atmosphere parameterizations, ocean
melt models, bed deformation."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.coupler import atmosphere as atm
from pism_tpu.coupler.pdd import TemperatureIndex, expected_pdd_rate
from pism_tpu.coupler import ocean as ocn

SPY = 3.15569259747e7


@pytest.fixture
def flat_geometry():
    grid = Grid(Mx=5, My=5, Lx=50e3, Ly=50e3)
    return grid, new_geometry(jnp.full(grid.shape2, 1000.0), jnp.zeros(grid.shape2))


def test_pdd_expectation_limits():
    # far below threshold: ~0; far above: ~(T - T0)
    lo = float(expected_pdd_rate(jnp.asarray(250.0), 273.15, 5.0))
    hi = float(expected_pdd_rate(jnp.asarray(283.15), 273.15, 5.0))
    assert lo == pytest.approx(0.0, abs=1e-4)
    assert hi == pytest.approx(10.0, rel=0.01)
    # sigma smooths: at exactly the threshold, E = sigma/sqrt(2 pi)
    at = float(expected_pdd_rate(jnp.asarray(273.15), 273.15, 5.0))
    assert at == pytest.approx(5.0 / np.sqrt(2 * np.pi), rel=1e-6)


def test_pdd_cold_all_accumulation(flat_geometry):
    grid, geom = flat_geometry
    cfg = Config()
    a = atm.Uniform(temperature=243.15, precipitation=0.3 / SPY)
    pdd = TemperatureIndex(atmosphere=a, config=cfg)
    out = pdd(geom, 0.0)
    # way below freezing year-round: SMB == snowfall
    np.testing.assert_allclose(np.asarray(out.smb) * SPY, 0.3, rtol=1e-6)


def test_pdd_warm_ablation(flat_geometry):
    grid, geom = flat_geometry
    cfg = Config()
    a = atm.Uniform(temperature=275.15, temperature_july=283.15,
                    precipitation=0.3 / SPY)
    pdd = TemperatureIndex(atmosphere=a, config=cfg)
    out = pdd(geom, 0.0)
    smb = float(np.asarray(out.smb)[2, 2]) * SPY
    assert smb < 0.0          # strong melt
    assert smb > -20.0        # but bounded
    assert float(out.temperature[2, 2]) == pytest.approx(273.15)  # capped


def test_pdd_elevation_dependence(flat_geometry):
    """Higher (colder) surface should have higher SMB."""
    grid, _ = flat_geometry
    H_low = jnp.full(grid.shape2, 100.0)
    H_high = jnp.full(grid.shape2, 2500.0)
    cfg = Config()
    a_inner = atm.Uniform(temperature=270.15, temperature_july=278.15,
                          precipitation=0.5 / SPY)
    a = atm.ElevationChange(inner=a_inner,
                            reference_surface=jnp.zeros(grid.shape2),
                            lapse_rate=6e-3)
    pdd = TemperatureIndex(atmosphere=a, config=cfg)
    smb_low = float(pdd(new_geometry(H_low, jnp.zeros(grid.shape2)), 0.0).smb[2, 2])
    smb_high = float(pdd(new_geometry(H_high, jnp.zeros(grid.shape2)), 0.0).smb[2, 2])
    assert smb_high > smb_low


def test_searise_greenland_params(flat_geometry):
    grid, geom = flat_geometry
    lat = jnp.full(grid.shape2, 72.0)
    lon = jnp.full(grid.shape2, -40.0)
    a = atm.SeariseGreenland(latitude=lat, longitude=lon,
                             precipitation=jnp.full(grid.shape2, 0.3 / SPY))
    out = a(geom, 0.0)
    T = float(out.temperature[2, 2])
    Tj = float(out.temperature_july[2, 2])
    assert 230.0 < T < 273.15       # plausible Greenland interior temp
    assert Tj > T                   # summer warmer


def test_ocean_constant_and_pik():
    grid = Grid(Mx=5, My=5, Lx=50e3, Ly=50e3)
    # floating shelf: bed at -1000, H = 400
    geom = new_geometry(jnp.full(grid.shape2, 400.0),
                        jnp.full(grid.shape2, -1000.0))
    assert int(geom.cell_type[2, 2]) == 3
    cfg = Config()
    c = ocn.Constant(config=cfg)
    melt = np.asarray(c(geom, 0.0))
    # 0.5 W/m^2 / (rho L) ~ 5e-2 m/a
    assert melt[2, 2] * SPY == pytest.approx(0.5 / (910 * 3.34e5) * SPY, rel=1e-6)
    p = ocn.PIK(config=cfg)
    m2 = np.asarray(p(geom, 0.0))
    assert (m2 >= 0).all()


def test_lingle_clark_subsidence():
    """Loading a disc depresses the bed toward isostatic equilibrium."""
    from pism_tpu.model.beddef import LingleClark
    grid = Grid(Mx=33, My=33, Lx=800e3, Ly=800e3)
    cfg = Config({"bed_deformation.model": "lc"})
    lc = LingleClark(grid=grid, config=cfg)
    H0 = jnp.zeros(grid.shape2)
    geom = new_geometry(H0, jnp.zeros(grid.shape2))
    state = lc.initialize(ModelState(geometry=geom))
    # add a 2000 m disc load of radius 300 km
    disc = jnp.where(jnp.asarray(grid.radius) < 300e3, 2000.0, 0.0)
    state = state.replace(geometry=new_geometry(disc, state.geometry.bed_elevation))
    dt = 1000.0 * SPY
    for _ in range(40):   # 40 kyr
        state = lc.step(state, dt)
    center = float(state.geometry.bed_elevation[16, 16])
    # equilibrium deflection ~ -(rho_i/rho_r) * 2000 = -551 m; after 40 kyr
    # most of the relaxation should have happened under the disc center
    assert -600.0 < center < -250.0
    # far field slightly raised or ~0, much less than center
    corner = float(state.geometry.bed_elevation[0, 0])
    assert abs(corner) < 100.0
