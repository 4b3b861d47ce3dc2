"""Every registered diagnostic evaluates finitely on a representative
thermo-coupled state (PISM's diagnostics are exercised the same way by its
regression suite)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu.model import diagnostics as diag
from pism_tpu.model.icemodel import IceModel
from pism_tpu.verification import eismint2

SPY = 3.15569259747e7


@pytest.fixture(scope="module")
def thermo_state():
    es = eismint2.setup("A", Mx=31, Mz=15, Lz=5000.0)
    model = IceModel(grid=es.grid, config=es.config, surface=es.surface)
    state, t, _ = model.step_once(es.state, 0.0, 3000 * SPY)
    return model, state, t


def test_all_spatial_diagnostics_finite(thermo_state):
    model, state, t = thermo_state
    vals = diag.compute_spatial(list(diag.SPATIAL), state, model, t)
    for name, v in vals.items():
        arr = np.asarray(v)
        assert arr.shape[:2] == model.grid.shape2, name
        assert np.isfinite(arr).all(), name


def test_all_scalar_diagnostics_finite(thermo_state):
    model, state, t = thermo_state
    vals = diag.compute_scalar(list(diag.SCALAR), state, model, t)
    for name, v in vals.items():
        assert np.isfinite(float(v)), name
    assert float(vals["ice_volume"]) > 0
    assert float(vals["ice_mass"]) == pytest.approx(
        float(vals["ice_volume"]) * 910.0, rel=1e-12)
    # cold-ice volume is positive and less than the total
    assert 0 < float(vals["ice_volume_cold"]) <= float(vals["ice_volume"]) * 1.01


def test_registry_size():
    # a representative slice of PISM's diagnostic dictionary
    assert len(diag.SPATIAL) >= 75
    assert len(diag.SCALAR) >= 24
    assert len(diag.RATE) >= 12
    assert len(diag.SPATIAL_RATE) >= 6


def test_area_fraction_identities(thermo_state):
    """ISMIP6 fractions: sftgif = sftgrf + sftflf, all in [0, 1];
    Schoof theta in [0, 1]; grounded EISMINT dome has zero GL flux."""
    model, state, t = thermo_state
    v = diag.compute_spatial(
        ["sftgif", "sftgrf", "sftflf", "schoofs_theta"], state, model, t)
    gif, grf, flf = (np.asarray(v[k]) for k in ("sftgif", "sftgrf", "sftflf"))
    np.testing.assert_allclose(gif, grf + flf, atol=1e-12)
    for a in (gif, grf, flf, np.asarray(v["schoofs_theta"])):
        assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-12
    gl = diag.compute_scalar(["grounding_line_flux"], state, model, t)
    assert float(gl["grounding_line_flux"]) == 0.0


def test_vars_dictionary():
    """PISM Vars analog: lookup state fields and diagnostics by name."""
    from pism_tpu.util.vars import Vars
    from pism_tpu.verification import eismint2
    from pism_tpu.model.icemodel import IceModel

    es = eismint2.setup("A", Mx=21, Mz=9, Lz=5000.0)
    model = IceModel(grid=es.grid, config=es.config, surface=es.surface)
    state = model.prepare_state(es.state)
    v = Vars(state, model=model)
    assert v.get("thk").shape == es.grid.shape2
    assert v.get("enthalpy").ndim == 3
    assert v.metadata("thk").standard_name == "land_ice_thickness"
    assert v.metadata("thk").units == "m"
    # diagnostics resolve through the same dictionary
    assert v.get("velsurf_mag") is not None or "velsurf_mag" not in v.available()
    assert "usurf" in v.available() and "mask" in v.available()
    import pytest as _pt
    with _pt.raises(KeyError):
        v.get("no_such_variable")
    # a diagnostic without a model raises KeyError, not AttributeError
    names = [n for n in v.available() if n not in ("thk", "topg")]
    v2 = Vars(state)
    assert v2.get("topg") is not None


def test_climate_input_diagnostics():
    """Climate-input diagnostics (air_temp, precipitation,
    climatic_mass_balance, ice_surface_temp, air_temp_snapshot) evaluate
    the coupler chain at t."""
    import jax.numpy as jnp
    import numpy as np
    from pism_tpu import Config, Grid
    from pism_tpu.coupler import atmosphere as atm
    from pism_tpu.coupler.surface import Simple
    from pism_tpu.model.diagnostics import SPATIAL
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.state import ModelState, new_geometry

    SPY = 3.15569259747e7
    grid = Grid(Mx=7, My=7, Lx=100e3, Ly=100e3)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none"})
    a = atm.Uniform(temperature=260.15, temperature_july=272.15,
                    precipitation=0.4 / SPY)
    model = IceModel(grid=grid, config=cfg, surface=Simple(atmosphere=a))
    state = ModelState(geometry=new_geometry(jnp.full(grid.shape2, 500.0),
                                             jnp.zeros(grid.shape2)))
    assert float(SPATIAL["air_temp"].func(state, model, 0.0)[3, 3]) \
        == 260.15
    # mid-summer snapshot reaches the July value
    t_july = 0.5 * SPY
    snap = float(SPATIAL["air_temp_snapshot"].func(state, model, t_july)[3, 3])
    assert abs(snap - 272.15) < 0.2
    p = float(SPATIAL["precipitation"].func(state, model, 0.0)[3, 3])
    assert p == np.float64(0.4 / SPY * 910.0)
    smb = float(SPATIAL["climatic_mass_balance"].func(state, model, 0.0)[3, 3])
    assert smb == np.float64(0.4 / SPY * 910.0)   # Simple: SMB = precip
    ist = float(SPATIAL["ice_surface_temp"].func(state, model, 0.0)[3, 3])
    assert 250.0 < ist <= 273.15


def test_new_parity_diagnostics(thermo_state):
    """tillphi / wvel / deviatoric stresses / rank round out the PISM
    registry: wvel = wvel_rel + u_b . grad b (equal on the flat EISMINT
    bed), deviatoric stresses vanish with no membrane velocity, rank is
    constant on one device."""
    model, state, t = thermo_state
    v = diag.compute_spatial(
        ["wvel", "wvel_rel", "sigma_xx", "sigma_yy", "sigma_xy", "rank",
         "tillphi", "bwatvel_x", "bwatvel_y"], state, model, t)
    # flat bed -> kinematic basal term is zero
    np.testing.assert_allclose(np.asarray(v["wvel"]),
                               np.asarray(v["wvel_rel"]), atol=1e-12)
    # SIA-only run: no SSA velocity -> zero deviatoric stress
    assert np.abs(np.asarray(v["sigma_xx"])).max() == 0.0
    assert np.abs(np.asarray(v["sigma_xy"])).max() == 0.0
    # no routing hydrology attached -> zero water velocity
    assert np.abs(np.asarray(v["bwatvel_x"])).max() == 0.0
    assert np.unique(np.asarray(v["rank"])).size == 1
