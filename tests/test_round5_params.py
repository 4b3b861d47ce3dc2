"""Round-5 config-tail wirings: Fausto PDD factor bands, lateral fjord-wall
drag, runoff-fed hydrology, runoff_SMB constants, PICO fallbacks, sliding
scale factor, dt_force, front-retreat CFL gating, steady-flux interval."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry

SPY = 3.15569259747e7


def test_fausto_pdd_factor_bands():
    """surface.pdd.fausto.*: warm-regime factors at T_mj >= T_w, cold at
    <= T_c, cubic in between; latitude_beta_w forces warm south of it."""
    from pism_tpu.coupler.atmosphere import Uniform
    from pism_tpu.coupler.pdd import TemperatureIndex

    cfg = Config({"surface.pdd.fausto.enabled": True})
    lat = jnp.full((4, 4), 75.0)
    pdd = TemperatureIndex(atmosphere=Uniform(), config=cfg, latitude=lat)
    day = 86400.0
    f_snow, f_ice = pdd._factors(jnp.full((4, 4), 284.0), jnp.float32)
    assert float(f_ice[0, 0]) * day == pytest.approx(
        cfg.get_number("surface.pdd.fausto.beta_ice_w"))
    f_snow, f_ice = pdd._factors(jnp.full((4, 4), 270.0), jnp.float32)
    assert float(f_ice[0, 0]) * day == pytest.approx(
        cfg.get_number("surface.pdd.fausto.beta_ice_c"))
    f_mid = pdd._factors(jnp.full((4, 4), 277.65), jnp.float32)[1]
    assert (cfg.get_number("surface.pdd.fausto.beta_ice_w")
            < float(f_mid[0, 0]) * day
            < cfg.get_number("surface.pdd.fausto.beta_ice_c"))
    # south of latitude_beta_w: warm factors regardless of temperature
    pdd_s = TemperatureIndex(atmosphere=Uniform(), config=cfg,
                             latitude=jnp.full((4, 4), 65.0))
    f_s = pdd_s._factors(jnp.full((4, 4), 270.0), jnp.float32)[1]
    assert float(f_s[0, 0]) * day == pytest.approx(
        cfg.get_number("surface.pdd.fausto.beta_ice_w"))


def test_searise_coefficients_from_config():
    """atmosphere.fausto_air_temp.* coefficients flow into the SeaRISE
    parameterization (explicit override shifts the temperatures)."""
    from pism_tpu.coupler.atmosphere import SeariseGreenland

    lat = jnp.full((3, 3), 72.0)
    lon = jnp.full((3, 3), -40.0)
    p = jnp.zeros((3, 3))
    geom = new_geometry(jnp.full((3, 3), 1000.0), jnp.zeros((3, 3)))
    a0 = SeariseGreenland(latitude=lat, longitude=lon, precipitation=p,
                          config=Config())
    a1 = SeariseGreenland(latitude=lat, longitude=lon, precipitation=p,
                          config=Config({
                              "atmosphere.fausto_air_temp.d_ma": 315.98}))
    dT = float(a1(geom, 0.0).temperature[1, 1]
               - a0(geom, 0.0).temperature[1, 1])
    assert dT == pytest.approx(1.0, rel=1e-6)


def test_lateral_drag_slows_fjord_flow():
    """stress_balance.ssa.fd.lateral_drag: extra drag at icy cells touching
    ice-free bedrock slows the stream."""
    from pism_tpu.model.ssa import SSAFD
    from pism_tpu.physics.rheology import IsothermalGlen

    My, Mx = 20, 16
    grid = Grid(Mx=Mx, My=My, Lx=20e3, Ly=25e3, periodicity="x")
    H = np.full((My, Mx), 600.0)
    bed = np.full((My, Mx), -400.0)
    bed[:3, :] = 200.0     # rock walls north and south
    bed[-3:, :] = 200.0
    H[:3, :] = 0.0
    H[-3:, :] = 0.0
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))
    state = ModelState(geometry=geom)
    tau_c = jnp.full((My, Mx), 2.0e4)

    def solve(lateral):
        cfg = Config({"stress_balance.ssa.fd.lateral_drag.enabled": lateral,
                      "stress_balance.ssa.fd.velocity_change_rtol": 0.0})
        ssa = SSAFD(grid=grid, config=cfg, flow_law=IsothermalGlen(A=1e-16 / SPY),
                    taud_x=jnp.where(jnp.asarray(H) > 0, 2.2e4, 0.0),
                    taud_y=jnp.zeros((My, Mx)))
        u, v = ssa.solve(state, tau_c)
        return float(jnp.max(jnp.abs(u))) * SPY

    u_free = solve(False)
    u_drag = solve(True)
    assert u_drag < 0.95 * u_free
    assert u_drag > 0.0


def test_pseudo_plastic_sliding_scale_factor():
    """basal_resistance.pseudo_plastic.sliding_scale_factor: factor e
    multiplies the sliding speed at fixed basal stress (tau_c / e^q)."""
    from pism_tpu.physics.basal import SlidingLaw

    cfg = Config({"basal_resistance.pseudo_plastic.enabled": True,
                  "basal_resistance.pseudo_plastic.sliding_scale_factor": 4.0})
    law = SlidingLaw.from_config(cfg)
    law0 = SlidingLaw.from_config(Config(
        {"basal_resistance.pseudo_plastic.enabled": True}))
    u = jnp.asarray(100.0 / SPY)
    b_scaled = float(law.beta(1.0e5, u, 0.0 * u))
    b_plain = float(law0.beta(1.0e5, u, 0.0 * u))
    q = cfg.get_number("basal_resistance.pseudo_plastic.q")
    assert b_scaled == pytest.approx(b_plain / 4.0 ** q, rel=1e-6)


def test_runoff_smb_constants_from_config():
    """ocean.runoff_to_ocean_melt_*: the Xu power-law factor responds to
    the configured constants."""
    from pism_tpu.coupler.factory import ocean_from_config

    geom = new_geometry(jnp.zeros((4, 4)), jnp.full((4, 4), -500.0))
    for B, expect in ((0.0, 1.0), (1.0, None)):
        cfg = Config({"ocean.models": "constant,runoff_SMB",
                      "ocean.constant.melt_rate": 1.0,
                      "ocean.runoff_to_ocean_melt_factor": B})
        m = ocean_from_config(cfg, {"delta_T": lambda t: jnp.asarray(2.0)})
        base_cfg = Config({"ocean.models": "constant",
                           "ocean.constant.melt_rate": 1.0})
        base = float(ocean_from_config(base_cfg, {})(geom, 0.0)[1, 1])
        melt = float(m(geom, 0.0)[1, 1])
        if expect is not None:
            assert melt == pytest.approx(base, rel=1e-6)   # B = 0: no effect
        else:
            assert melt > 1.2 * base


def test_dt_force_overrides_adaptive():
    """-fixed_dt (time_stepping.dt_force) bypasses the stability limits."""
    from pism_tpu.coupler.surface import Uniform
    from pism_tpu.model.icemodel import IceModel

    grid = Grid(Mx=24, My=24, Lx=400e3, Ly=400e3)
    r = jnp.asarray(grid.radius)
    H = jnp.maximum(2000.0 * (1 - (r / 350e3) ** 2), 0.0)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none",
                  "time_stepping.dt_force": 0.25})
    m = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))
    from pism_tpu import Time
    st = ModelState(geometry=new_geometry(H, jnp.zeros(grid.shape2)))
    st, stats = m.run(st, Time(0.0, 2.0 * SPY))
    assert int(stats.nsteps) == 8       # 2 a / 0.25 a exactly
    assert float(stats.dt_min) == pytest.approx(0.25 * SPY, rel=1e-9)


def test_front_retreat_cfl_gating():
    """geometry.front_retreat.use_cfl wires CalvingModel.max_timestep into
    the dt selection (front_retreat appears in the limit accounting)."""
    from pism_tpu.model.icemodel import DT_LIMITS

    assert "front_retreat" in DT_LIMITS
    cfg = Config({"calving.methods": "thickness_calving",
                  "geometry.front_retreat.use_cfl": True})
    from pism_tpu.coupler.surface import Uniform
    from pism_tpu.model.icemodel import IceModel
    grid = Grid(Mx=12, My=12, Lx=60e3, Ly=60e3)
    m = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))
    assert m.front_retreat_cfl
    m2 = IceModel(grid=grid, config=Config(
        {"calving.methods": "thickness_calving"}), surface=Uniform(smb=0.0))
    assert not m2.front_retreat_cfl


def test_steady_flux_update_interval():
    """hydrology.steady.flux_update_interval: between interval crossings
    the stored discharge field is carried unchanged."""
    from pism_tpu.physics.hydrology import Steady

    grid = Grid(Mx=10, My=10, Lx=50e3, Ly=50e3)
    cfg = Config({"hydrology.model": "steady",
                  "hydrology.steady.flux_update_interval": 10.0})
    hy = Steady(grid=grid, config=cfg)
    x = np.asarray(grid.x)
    H = jnp.asarray(np.maximum(1000.0 * (1 - (x[None, :] / 40e3) ** 2), 0.0)
                    * np.ones((10, 1)))
    st = ModelState(geometry=new_geometry(H, jnp.zeros(grid.shape2)),
                    tillwat=jnp.full(grid.shape2, 2.0),
                    # melt above the till decay rate so the saturated till
                    # overflows into the routed discharge
                    basal_melt_rate=jnp.full(grid.shape2, 1e-7),
                    hydro_Q=jnp.zeros(grid.shape2))
    dt = 1.0 * SPY
    # crossing t = 0 -> solve happens
    st1 = hy.step(st, dt, t=10.0 * SPY)
    assert float(jnp.max(st1.hydro_Q)) > 0.0
    # mid-interval: the (zeroed) field is carried unchanged
    st2 = hy.step(st, dt, t=14.0 * SPY)
    assert float(jnp.max(st2.hydro_Q)) == 0.0
