"""Coupler chain factory (PISM ``PCFactory``) and modifier models:
atmosphere frac_P / precip_scaling / anomaly / yearly_cycle / one_station,
surface simple / pik / anomaly / delta_T / cache, ocean given / delta_SMB /
frac_SMB / runoff_SMB / cache, sea-level chains."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import new_geometry
from pism_tpu.coupler.factory import (atmosphere_from_config,
                                      surface_from_config,
                                      ocean_from_config,
                                      sea_level_from_config)
from pism_tpu.util.forcing import ScalarForcing

SPY = 3.15569259747e7


@pytest.fixture
def geom():
    grid = Grid(Mx=6, My=6, Lx=60e3, Ly=60e3)
    return grid, new_geometry(jnp.full(grid.shape2, 1000.0),
                              jnp.zeros(grid.shape2))


def test_atmosphere_chain_uniform_delta_T_frac_P(geom):
    grid, g = geom
    cfg = Config({"atmosphere.models": "uniform,delta_T,frac_P",
                  "atmosphere.uniform.temperature": 260.0,
                  "atmosphere.uniform.precipitation": 910.0})  # kg/m2/yr
    dT = ScalarForcing.from_arrays([0.0, 100.0], [0.0, 5.0])
    fP = ScalarForcing.from_arrays([0.0, 100.0], [1.0, 2.0])
    a = atmosphere_from_config(cfg, {"delta_T": dT, "frac_P": fP})
    out = a(g, 50.0 * SPY)
    assert float(out.temperature[2, 2]) == pytest.approx(262.5)
    assert float(out.precipitation[2, 2]) * SPY == pytest.approx(1.5, rel=1e-6)


def test_atmosphere_precip_scaling(geom):
    grid, g = geom
    cfg = Config({"atmosphere.models": "uniform,precip_scaling",
                  "atmosphere.uniform.precipitation": 910.0})
    dT = lambda t: jnp.asarray(2.0)
    a = atmosphere_from_config(cfg, {"delta_T": dT})
    out = a(g, 0.0)
    assert float(out.precipitation[2, 2]) * SPY == pytest.approx(
        1.0 * np.exp(0.07042 * 2.0), rel=1e-5)


def test_atmosphere_anomaly_time_slices(geom):
    grid, g = geom
    cfg = Config({"atmosphere.models": "uniform,anomaly",
                  "atmosphere.uniform.temperature": 260.0})
    stack = jnp.stack([jnp.zeros(grid.shape2), jnp.full(grid.shape2, 3.0)])
    a = atmosphere_from_config(cfg, {
        "air_temp_anomaly": stack,
        "anomaly_times": jnp.asarray([0.0, 10 * SPY])})
    assert float(a(g, 5 * SPY).temperature[2, 2]) == 260.0
    assert float(a(g, 15 * SPY).temperature[2, 2]) == 263.0


def test_atmosphere_yearly_cycle_and_station(geom):
    grid, g = geom
    cfg = Config({"atmosphere.models": "yearly_cycle"})
    a = atmosphere_from_config(cfg, {
        "air_temp_mean_annual": jnp.full(grid.shape2, 255.0),
        "air_temp_mean_summer": jnp.full(grid.shape2, 265.0),
        "precipitation": jnp.full(grid.shape2, 0.3 / SPY)})
    # the cycle peaks on the configured summer day (reference
    # atmosphere.fausto_air_temp.summer_peak_day, default 196) and the
    # winter reflection sits half a year away
    peak = cfg.get_number("atmosphere.fausto_air_temp.summer_peak_day") / 365.0
    Ts = a.temperature_at(g, 0.0, peak)
    Tw = a.temperature_at(g, 0.0, peak - 0.5)
    assert float(Ts[2, 2]) == pytest.approx(265.0)
    assert float(Tw[2, 2]) == pytest.approx(245.0)

    cfg2 = Config({"atmosphere.models": "one_station"})
    st = atmosphere_from_config(cfg2, {
        "air_temp": ScalarForcing.from_arrays([0.0, 10.0], [250.0, 260.0]),
        "precipitation": lambda t: jnp.asarray(0.5 / SPY)})
    out = st(g, 5.0 * SPY)
    assert float(out.temperature[3, 3]) == pytest.approx(255.0)
    assert float(out.precipitation[3, 3]) * SPY == pytest.approx(0.5)


def test_surface_simple_pik_and_modifiers(geom):
    grid, g = geom
    cfg = Config({"atmosphere.models": "uniform",
                  "atmosphere.uniform.temperature": 258.0,
                  "atmosphere.uniform.precipitation": 455.0,
                  "surface.models": "simple,delta_T,cache",
                  "surface.cache.update_interval": 10.0})
    atm = atmosphere_from_config(cfg)
    dT = ScalarForcing.from_arrays([0.0, 100.0], [0.0, 10.0])
    s = surface_from_config(cfg, {"delta_T": dT}, atmosphere=atm)
    out = s(g, 57.0 * SPY)   # cache quantizes to 50 a -> dT = 5 K
    assert float(out.smb[2, 2]) * SPY == pytest.approx(0.5, rel=1e-6)
    assert float(out.temperature[2, 2]) == pytest.approx(263.0)

    cfg2 = Config({"surface.models": "pik", "atmosphere.models": "uniform",
                   "atmosphere.uniform.precipitation": 273.0})
    atm2 = atmosphere_from_config(cfg2)
    lat = jnp.full(grid.shape2, -75.0)
    spik = surface_from_config(cfg2, {"latitude": lat}, atmosphere=atm2)
    o = spik(g, 0.0)
    # Martin et al. (2011): 273.15 + 30 - 0.0075*1000 - 0.68775*75
    assert float(o.temperature[2, 2]) == pytest.approx(
        273.15 + 30.0 - 7.5 - 0.68775 * 75.0, rel=1e-6)
    assert float(o.smb[2, 2]) * SPY == pytest.approx(0.3, rel=1e-6)


def test_surface_anomaly(geom):
    grid, g = geom
    cfg = Config({"surface.models": "uniform,anomaly"})
    s = surface_from_config(cfg, {
        "climatic_mass_balance_anomaly": jnp.full(grid.shape2, 1.0 / SPY)})
    assert float(s(g, 0.0).smb[2, 2]) * SPY == pytest.approx(1.0)


def test_ocean_given_and_scalar_modifiers():
    grid = Grid(Mx=6, My=6, Lx=60e3, Ly=60e3)
    geom = new_geometry(jnp.full(grid.shape2, 400.0),
                        jnp.full(grid.shape2, -1000.0))
    melt = jnp.stack([jnp.full(grid.shape2, 1.0 / SPY),
                      jnp.full(grid.shape2, 3.0 / SPY)])
    cfg = Config({"ocean.models": "given,frac_SMB,delta_SMB"})
    oc = ocean_from_config(cfg, {
        "shelf_base_mass_flux": melt,
        "times": jnp.asarray([0.0, 10 * SPY]),
        "frac_SMB": lambda t: jnp.asarray(2.0),
        "delta_SMB": lambda t: jnp.asarray(0.5 / SPY)})
    m0 = float(oc(geom, 5 * SPY)[3, 3]) * SPY
    m1 = float(oc(geom, 15 * SPY)[3, 3]) * SPY
    assert m0 == pytest.approx(2.5, rel=1e-6)
    assert m1 == pytest.approx(6.5, rel=1e-6)


def test_ocean_runoff_smb_and_cache():
    grid = Grid(Mx=6, My=6, Lx=60e3, Ly=60e3)
    geom = new_geometry(jnp.full(grid.shape2, 400.0),
                        jnp.full(grid.shape2, -1000.0))
    cfg = Config({"ocean.models": "constant,runoff_SMB",
                  "ocean.constant.melt_rate": 1.0,
                  "ocean.sub_shelf_heat_flux_into_ice": 0.0})
    oc = ocean_from_config(cfg, {"delta_T": lambda t: jnp.asarray(4.0)})
    m = float(oc(geom, 0.0)[3, 3]) * SPY
    assert m > 1.0            # warming amplifies melt
    oc0 = ocean_from_config(cfg, {"delta_T": lambda t: jnp.asarray(0.0)})
    assert float(oc0(geom, 0.0)[3, 3]) * SPY == pytest.approx(1.0, rel=1e-6)


def test_sea_level_chain():
    grid = Grid(Mx=6, My=6, Lx=60e3, Ly=60e3)
    geom = new_geometry(jnp.full(grid.shape2, 400.0),
                        jnp.full(grid.shape2, -1000.0))
    cfg = Config({"sea_level.models": "constant,delta_sl",
                  "sea_level.constant.value": 0.0})
    slm = sea_level_from_config(cfg, {
        "delta_SL": ScalarForcing.from_arrays([0.0, 100.0], [0.0, -10.0])})
    assert float(slm(geom, 50 * SPY)[2, 2]) == pytest.approx(-5.0)


def test_unknown_names_raise():
    cfg = Config({"atmosphere.models": "bogus"})
    with pytest.raises(ValueError):
        atmosphere_from_config(cfg)
    cfg2 = Config({"ocean.models": "constant,bogus"})
    with pytest.raises(ValueError):
        ocean_from_config(cfg2)
    cfg3 = Config({"atmosphere.models": "given"})
    with pytest.raises(ValueError):   # missing required inputs
        atmosphere_from_config(cfg3)


def test_icemodel_applies_sea_level_forcing():
    """The sea-level coupler updates geometry.sea_level (and the flotation
    mask) inside the step loop (PISM step ordering item 10)."""
    import jax.numpy as jnp
    from pism_tpu import Time
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.coupler.sealevel import Constant as SLConstant, DeltaSL
    from pism_tpu.coupler.surface import Uniform as SurfUniform
    from pism_tpu.state import ModelState, floating_ice

    grid = Grid(Mx=9, My=9, Lx=45e3, Ly=45e3)
    cfg = Config({"stress_balance.model": "sia", "energy.model": "none",
                  "geometry.update.enabled": False})
    # ice of 300 m on bed at -290: floating at sl=0, grounded at sl=-100
    geom = new_geometry(jnp.full(grid.shape2, 300.0),
                        jnp.full(grid.shape2, -290.0))
    assert bool(floating_ice(geom.cell_type)[4, 4])
    slm = DeltaSL(inner=SLConstant(value=0.0),
                  offset=lambda t: jnp.asarray(-100.0))
    model = IceModel(grid=grid, config=cfg, surface=SurfUniform(smb=0.0),
                     sea_level=slm)
    state = ModelState(geometry=geom)
    state, _ = model.run(state, Time(0.0, SPY))
    assert float(state.geometry.sea_level[4, 4]) == -100.0
    assert not bool(floating_ice(state.geometry.cell_type)[4, 4])


def test_orographic_precipitation_modifier():
    """-atmosphere uniform,orographic_precipitation: precipitation is
    replaced by the LTOP field (wetter on the windward slope), temperature
    passes through from the inner model."""
    import numpy as np
    from pism_tpu.coupler.factory import atmosphere_from_config
    from pism_tpu.state import new_geometry

    grid = Grid(Mx=64, My=32, Lx=320e3, Ly=160e3)
    cfg = Config({
        "atmosphere.models": "uniform,orographic_precipitation",
        "atmosphere.uniform.temperature": 260.0,
        "atmosphere.orographic_precipitation.wind_direction": 270.0,
    })
    model = atmosphere_from_config(cfg, grid=grid)
    # ridge across the wind (north-south), westerly flow
    X, _ = np.meshgrid(grid.x, grid.y)
    H = 2000.0 * np.exp(-((X) / 40e3) ** 2)
    geom = new_geometry(jnp.asarray(H), jnp.zeros(grid.shape2))
    out = model(geom, 0.0)
    assert float(out.temperature[0, 0]) == 260.0
    P = np.asarray(out.precipitation)
    assert np.isfinite(P).all() and (P >= 0).all()
    cx = grid.shape2[1] // 2
    windward = P[:, : cx].max()
    lee = P[:, cx + 4:].min()
    assert windward > 2.0 * max(lee, 1e-12)  # rain shadow


def test_atmosphere_delta_P(geom):
    """Reference atmosphere::Delta_P: additive precipitation offset."""
    grid, g = geom
    cfg = Config({"atmosphere.models": "uniform,delta_P",
                  "atmosphere.uniform.precipitation": 910.0})  # 1 m/yr ice eq
    dP = ScalarForcing.from_arrays([0.0, 100.0], [0.0, 1.0 / SPY])
    a = atmosphere_from_config(cfg, {"delta_P": dP})
    out = a(g, 50.0 * SPY)
    assert float(out.precipitation[2, 2]) * SPY == pytest.approx(1.5, rel=1e-6)


def test_sea_level_delta_sl_2d_time_dependent(geom):
    """delta_sl_2d with a (T, My, Mx) frame stack: linear time
    interpolation, clamped outside the covered interval."""
    grid, g = geom
    cfg = Config({"sea_level.models": "constant,delta_sl_2d",
                  "sea_level.constant.value": 0.0})
    frames = jnp.stack([jnp.zeros(grid.shape2),
                        jnp.full(grid.shape2, 10.0)])
    times = jnp.asarray([0.0, 100.0 * SPY])
    sl = sea_level_from_config(cfg, {"delta_SL_2D": frames,
                                     "delta_SL_2D_times": times})
    assert float(sl(g, 0.0)[2, 2]) == pytest.approx(0.0)
    assert float(sl(g, 50.0 * SPY)[2, 2]) == pytest.approx(5.0)
    assert float(sl(g, 100.0 * SPY)[2, 2]) == pytest.approx(10.0)
    # clamped beyond the last frame
    assert float(sl(g, 500.0 * SPY)[2, 2]) == pytest.approx(10.0)
    # static 2D field still works
    sl2 = sea_level_from_config(cfg, {"delta_SL_2D": jnp.full(grid.shape2, 3.0)})
    assert float(sl2(g, 7.0)[1, 1]) == pytest.approx(3.0)
