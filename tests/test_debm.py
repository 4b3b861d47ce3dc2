"""dEBM-simple surface model (reference surface::DEBMSimple,
src/coupler/surface/DEBMSimple.cc + DEBMSimplePointwise.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pism_tpu import Config, Grid, new_geometry
from pism_tpu.coupler import atmosphere as atm
from pism_tpu.coupler import debm
from pism_tpu.coupler.debm import DEBMSimple
from pism_tpu.coupler.surface import SurfaceCarry
from pism_tpu.util.units import SEC_PER_YEAR as SPY


def _model(grid, T_annual=263.15, T_summer=276.15, precip=0.5 / SPY,
           lat=70.0, config=None, **kw):
    a = atm.CosineYearlyCycle(
        temperature_mean_annual=jnp.full(grid.shape2, T_annual),
        temperature_mean_summer=jnp.full(grid.shape2, T_summer),
        precipitation=jnp.full(grid.shape2, precip))
    return DEBMSimple(atmosphere=a, latitude=jnp.full(grid.shape2, lat),
                      config=config or Config(), **kw)


# ---------------------------------------------------------------- orbit

def test_present_day_declination_and_distance():
    # June solstice (~day 172): declination near +23.4 deg
    d_solstice = float(debm.solar_declination_present_day(172.0 / 365.0))
    assert d_solstice == pytest.approx(23.44 * np.pi / 180.0, abs=0.01)
    # December solstice (~day 355)
    d_winter = float(debm.solar_declination_present_day(355.0 / 365.0))
    assert d_winter == pytest.approx(-23.44 * np.pi / 180.0, abs=0.01)
    # March equinox (~day 80): near zero
    assert abs(float(debm.solar_declination_present_day(80.0 / 365.0))) < 0.02
    # distance factor: perihelion in early January (> 1), bounded by ~e*2
    yf = np.linspace(0.0, 1.0, 365)
    df = np.asarray(debm.distance_factor_present_day(jnp.asarray(yf)))
    assert df.max() < 1.036 and df.min() > 0.965
    assert df[2] > 1.03            # early January near perihelion


def test_paleo_orbit_matches_present_day_for_modern_parameters():
    deg = np.pi / 180.0
    e, obl, peri = 0.0167, 23.44 * deg, 102.94719 * deg
    yf = jnp.asarray(np.linspace(0.0, 1.0, 73))
    d_paleo = np.asarray(debm.solar_declination_paleo(yf, e, obl, peri))
    d_pd = np.asarray(debm.solar_declination_present_day(yf))
    # the two parameterizations differ by a ~2-day equinox phase offset;
    # 3 degrees still catches sign/unit/anchoring errors
    assert np.max(np.abs(d_paleo - d_pd)) < 3.0 * deg
    f_paleo = np.asarray(debm.distance_factor_paleo(yf, e, peri))
    f_pd = np.asarray(debm.distance_factor_present_day(yf))
    assert np.max(np.abs(f_paleo - f_pd)) < 0.004


def test_hour_angle_limits():
    deg = np.pi / 180.0
    phi = 17.5 * deg
    decl = 23.4 * deg
    # southern high latitude in northern summer: sun never reaches phi
    assert float(debm.hour_angle(phi, -75.0 * deg, decl)) == 0.0
    # very high northern latitude: sun never drops below phi ("midnight sun")
    assert float(debm.hour_angle(phi, 85.0 * deg, decl)) \
        == pytest.approx(np.pi, abs=1e-6)
    # equator: roughly ~0.4 day fraction above 17.5 deg
    h_eq = float(debm.hour_angle(phi, 0.0, 0.0))
    assert 0.3 < h_eq / np.pi < 0.5
    # insolation zero in polar night, positive otherwise
    assert float(debm.insolation(1361.0, 1.0, 0.0, -75.0 * deg, decl)) == 0.0
    assert float(debm.insolation(1361.0, 1.0, h_eq, 0.0, 0.0)) > 800.0


# ---------------------------------------------------------------- melt

def test_melt_components():
    grid = Grid(Mx=5, My=5, Lx=50e3, Ly=50e3)
    m = _model(grid)
    T_summer = jnp.full(grid.shape2, 276.15)
    z = jnp.zeros(grid.shape2)
    alb = jnp.full(grid.shape2, 0.6)
    t_july = (0.55) * SPY
    insol, temp, offset, total = m.melt_components(t_july, T_summer, z, alb)
    # warm, sunny: melt of order m/yr, insolation term dominates at alb 0.6
    assert 0.5 < float(total[2, 2]) * SPY < 20.0
    assert float(insol[2, 2]) > 0.0
    assert float(temp[2, 2]) > 0.0
    assert float(offset[2, 2]) < 0.0
    np.testing.assert_allclose(
        np.asarray(total), np.maximum(
            np.asarray(insol) + np.asarray(temp) + np.asarray(offset), 0.0),
        rtol=1e-6)
    # below the melting threshold: all components zero
    cold = jnp.full(grid.shape2, 260.0)
    out = m.melt_components(t_july, cold, z, alb)
    for comp in out:
        assert float(jnp.abs(comp).max()) == 0.0
    # higher surface -> more transmissivity but same insolation; melt with
    # elevation-corrected T would differ; here just check tau_a monotone
    _, _, _, tot_high = m.melt_components(
        t_july, T_summer, jnp.full(grid.shape2, 2000.0), alb)
    assert float(tot_high[2, 2]) > float(total[2, 2])


def test_albedo_feedback():
    grid = Grid(Mx=5, My=5, Lx=50e3, Ly=50e3)
    m = _model(grid)
    assert float(m.albedo_from_melt(jnp.asarray(0.0))) \
        == pytest.approx(m.albedo_max)
    # strong melt drives albedo to the bare-ice floor
    strong = jnp.asarray(20.0 / SPY)   # 20 m/yr ice equivalent
    assert float(m.albedo_from_melt(strong)) == pytest.approx(m.albedo_min)
    # intermediate melt: in between, decreasing
    mid = float(m.albedo_from_melt(jnp.asarray(2.0 / SPY)))
    assert m.albedo_min < mid < m.albedo_max


def test_update_carries_snow_and_albedo():
    grid = Grid(Mx=5, My=5, Lx=50e3, Ly=50e3)
    geom = new_geometry(jnp.full(grid.shape2, 500.0), jnp.zeros(grid.shape2))
    m = _model(grid)
    assert m.stateful and m.uses_albedo
    t0 = m.balance_year_start * SPY
    carry = SurfaceCarry(None, None, None)
    out, carry = m.update(geom, t0, SPY, carry)
    assert carry.snow is not None and carry.albedo is not None
    assert carry.firn is None                      # dEBM has no firn layer
    a = np.asarray(carry.albedo)
    assert np.all(a >= m.albedo_min - 1e-9) and np.all(a <= m.albedo_max + 1e-9)
    assert np.isfinite(float(out.smb[2, 2]))
    # melt season at 276 K summer: some net melt happened -> albedo dropped
    # at some point; run the warm half-year and check the feedback engaged
    m_warm = _model(grid, T_summer=283.15)
    out_w, carry_w = m_warm.update(geom, t0, SPY, SurfaceCarry(None, None, None))
    assert float(out_w.smb[2, 2]) < float(out.smb[2, 2])


def test_prescribed_albedo_field():
    grid = Grid(Mx=5, My=5, Lx=50e3, Ly=50e3)
    geom = new_geometry(jnp.full(grid.shape2, 500.0), jnp.zeros(grid.shape2))
    dark = _model(grid, albedo_field=jnp.full(grid.shape2, 0.47))
    bright = _model(grid, albedo_field=jnp.full(grid.shape2, 0.82))
    t0 = dark.balance_year_start * SPY
    smb_dark, _ = dark.update(geom, t0, SPY, SurfaceCarry(None, None, None))
    smb_bright, _ = bright.update(geom, t0, SPY, SurfaceCarry(None, None, None))
    assert float(smb_dark.smb[2, 2]) < float(smb_bright.smb[2, 2])


def test_factory_and_icemodel_end_to_end():
    from pism_tpu.coupler.factory import surface_from_config
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.state import ModelState
    from pism_tpu import Time

    grid = Grid(Mx=11, My=11, Lx=200e3, Ly=200e3)
    cfg = Config({"surface.models": "debm_simple",
                  "stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none"})
    a = atm.CosineYearlyCycle(
        temperature_mean_annual=jnp.full(grid.shape2, 258.15),
        temperature_mean_summer=jnp.full(grid.shape2, 274.15),
        precipitation=jnp.full(grid.shape2, 0.4 / SPY))
    surface = surface_from_config(
        cfg, inputs={"latitude": jnp.full(grid.shape2, 72.0)}, atmosphere=a)
    assert isinstance(surface, DEBMSimple)

    r = grid.radius
    H0 = jnp.maximum(2000.0 * (1.0 - (r / 150e3) ** 2), 0.0)
    state = ModelState(geometry=new_geometry(H0, jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg, surface=surface)
    state, stats = model.run(state, Time(0.0, 2.0 * SPY))
    assert state.surface_albedo is not None and state.snow_depth is not None
    a_end = np.asarray(state.surface_albedo)
    assert np.all(np.isfinite(a_end))
    assert np.all(a_end >= 0.469) and np.all(a_end <= 0.821)
    assert np.all(np.isfinite(np.asarray(state.geometry.ice_thickness)))


def test_debm_diagnostics_registry():
    from pism_tpu.model.diagnostics import SPATIAL
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.state import ModelState

    grid = Grid(Mx=7, My=7, Lx=100e3, Ly=100e3)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none"})
    m = _model(grid)
    geom = new_geometry(jnp.full(grid.shape2, 800.0), jnp.zeros(grid.shape2))
    state = ModelState(geometry=geom,
                       surface_albedo=jnp.full(grid.shape2, 0.6))
    model = IceModel(grid=grid, config=cfg, surface=m)
    t_summer = 0.55 * SPY
    for name in ("insolation", "surface_albedo",
                 "debm_insolation_driven_melt_flux",
                 "debm_temperature_driven_melt_flux",
                 "debm_offset_melt_flux"):
        val = np.asarray(SPATIAL[name].func(state, model, t_summer))
        assert val.shape == grid.shape2 and np.all(np.isfinite(val)), name
    ins = np.asarray(SPATIAL["insolation"].func(state, model, t_summer))
    assert ins.max() > 100.0          # northern-summer sun at lat 70
    off = np.asarray(SPATIAL["debm_offset_melt_flux"].func(state, model,
                                                         t_summer))
    assert off.min() < 0.0            # background term is a heat loss


def test_debm_restart_bit_stable(tmp_path):
    """Checkpoint/restore carries the dEBM albedo state: a run interrupted
    and restored matches the uninterrupted run bit for bit (reference
    regression-test pattern; albedo is model state via define_model_state)."""
    from pism_tpu import Time
    from pism_tpu.io import checkpoint as ckpt
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.state import ModelState

    grid = Grid(Mx=11, My=11, Lx=200e3, Ly=200e3)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none"})
    m = _model(grid, T_summer=279.15)
    r = grid.radius
    H0 = jnp.maximum(1800.0 * (1.0 - (r / 150e3) ** 2), 0.0)
    model = IceModel(grid=grid, config=cfg, surface=m)
    state0 = model.prepare_state(
        ModelState(geometry=new_geometry(H0, jnp.zeros(grid.shape2))))

    t_end = 4 * SPY
    sA, tA, _ = model.step_once(state0, 0.0, 2 * SPY)
    assert sA.surface_albedo is not None
    path = str(tmp_path / "restart_debm.nc")
    ckpt.save_state(path, sA, grid, tA, config=cfg)
    sA2, tA2 = ckpt.load_state(path, config=cfg)
    np.testing.assert_array_equal(np.asarray(sA.surface_albedo),
                                  np.asarray(sA2.surface_albedo))
    np.testing.assert_array_equal(np.asarray(sA.snow_depth),
                                  np.asarray(sA2.snow_depth))
    done_direct, _, _ = model.step_once(sA, tA, t_end - tA)
    done_restored, _, _ = model.step_once(sA2, tA2, t_end - tA2)
    np.testing.assert_array_equal(
        np.asarray(done_direct.geometry.ice_thickness),
        np.asarray(done_restored.geometry.ice_thickness))
    np.testing.assert_array_equal(np.asarray(done_direct.surface_albedo),
                                  np.asarray(done_restored.surface_albedo))


def test_paleo_and_albedo_files(tmp_path):
    """surface.debm_simple.paleo.file / albedo_input.file through
    inputs_from_files -> the factory-built model uses time-dependent
    orbital parameters and a prescribed albedo."""
    from pism_tpu.coupler.factory import inputs_from_files, surface_from_config
    from pism_tpu.io.nc4 import File

    grid = Grid(Mx=7, My=7, Lx=100e3, Ly=100e3)
    paleo = str(tmp_path / "orbit.nc")
    with File(paleo, "w") as f:
        f.define_dimension("time", None, attrs={"units": "years"})
        for name in ("eccentricity", "obliquity", "perihelion_longitude"):
            f.define_variable(name, ("time",))
        for k, (t, e, o, w) in enumerate([(-10000.0, 0.02, 24.0, 90.0),
                                          (0.0, 0.0167, 23.44, 102.947)]):
            f.append_time(t)
            f.write("eccentricity", np.asarray(e), time_index=k)
            f.write("obliquity", np.asarray(o), time_index=k)
            f.write("perihelion_longitude", np.asarray(w), time_index=k)
    albf = str(tmp_path / "alb.nc")
    with File(albf, "w") as f:
        f.define_dimension("y", grid.My, np.asarray(grid.y))
        f.define_dimension("x", grid.Mx, np.asarray(grid.x))
        f.define_variable("albedo", ("y", "x"), attrs={"units": "1"})
        f.write("albedo", np.full(grid.shape2, 0.55))

    cfg = Config({"surface.models": "debm_simple",
                  "surface.debm_simple.paleo.enabled": True,
                  "surface.debm_simple.paleo.file": paleo,
                  "surface.debm_simple.albedo_input.file": albf})
    a = atm.CosineYearlyCycle(
        temperature_mean_annual=jnp.full(grid.shape2, 260.15),
        temperature_mean_summer=jnp.full(grid.shape2, 277.15),
        precipitation=jnp.full(grid.shape2, 0.4 / SPY))
    inputs = inputs_from_files(cfg, grid, "surface")
    inputs["latitude"] = jnp.full(grid.shape2, 70.0)
    m = surface_from_config(cfg, inputs=inputs, atmosphere=a)
    assert m.paleo_series is not None and m.albedo_field is not None
    # orbital parameters interpolate in time (radians inside the model)
    d0, f0 = m._orbit(0.45 * SPY)
    d1, f1 = m._orbit(-10000.0 * SPY + 0.45 * SPY)
    assert float(jnp.abs(d0 - d1)) > 1e-4   # different epochs differ
    geom = new_geometry(jnp.full(grid.shape2, 600.0), jnp.zeros(grid.shape2))
    out, carry = m.update(geom, 0.0, SPY, SurfaceCarry(None, None, None))
    assert np.isfinite(float(out.smb[3, 3]))
