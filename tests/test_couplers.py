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


def test_giventh_three_equation():
    """Holland & Jenkins (1999) 3-equation melt: T_b on the liquidus, melt
    monotone in thermal forcing, salt dilution throttles melt below the
    2-equation form, and sub-freezing ambient water freezes on."""
    from pism_tpu.coupler.ocean import GivenTH

    grid = Grid(Mx=8, My=8, Lx=100e3, Ly=100e3)
    geom = new_geometry(jnp.full(grid.shape2, 500.0),
                        jnp.full(grid.shape2, -2000.0))
    S = jnp.full(grid.shape2, 34.7)

    def melt(dtheta, two_eq=False):
        cfg = Config({"ocean.th.two_equation": two_eq})
        oc = GivenTH(theta_ocean=jnp.full(grid.shape2, 271.25 + dtheta),
                     salinity_ocean=S, config=cfg)
        o = oc.inputs(geom, 0.0)
        return (float(o.shelf_base_melt[4, 4]) * 3.15569259747e7,
                float(o.shelf_base_temperature[4, 4]))

    m0, Tb0 = melt(0.0)
    m1, _ = melt(0.5)
    m2, _ = melt(2.0)
    assert 0.5 < m0 < 10.0          # m/a at weak depth-driven forcing
    assert m0 < m1 < m2             # monotone in theta
    m2eq, _ = melt(0.5, two_eq=True)
    assert m1 < m2eq                # dilution throttles the 3-eq melt
    mfreeze, _ = melt(-2.5)
    assert mfreeze < 0.0            # freeze-on under sub-freezing ambient
    # T_b sits on the liquidus at some salinity below ambient
    oc = GivenTH(theta_ocean=jnp.full(grid.shape2, 271.25),
                 salinity_ocean=S, config=Config())
    o = oc.inputs(geom, 0.0)
    draft = float(oc._draft(geom)[4, 4])
    S_b = (Tb0 - (GivenTH.LIQ_B - GivenTH.LIQ_C * draft)) / GivenTH.LIQ_A
    assert 0.0 < S_b < 34.7


def test_ismip6_surface_anomaly_forcing():
    """ISMIP6 protocol: SMB/T = ref + anomaly(t) + gradient * (h - h_ref),
    piecewise-constant in time, clamped outside the forcing interval."""
    from pism_tpu.coupler.surface import ISMIP6

    SPY = 3.15569259747e7
    grid = Grid(Mx=8, My=8, Lx=100e3, Ly=100e3)
    geom = new_geometry(jnp.full(grid.shape2, 1000.0),
                        jnp.zeros(grid.shape2))  # h = 1000, h_ref = 900
    Nt = 3
    sm = ISMIP6(
        smb_ref=jnp.full(grid.shape2, 0.3 / SPY),
        temperature_ref=jnp.full(grid.shape2, 250.0),
        surface_ref=jnp.full(grid.shape2, 900.0),
        anomaly_times=jnp.asarray([0.0, 10 * SPY, 20 * SPY]),
        a_smb=jnp.stack([jnp.full(grid.shape2, k * (-0.1) / SPY)
                         for k in range(Nt)]),
        a_temp=jnp.stack([jnp.full(grid.shape2, float(k)) for k in range(Nt)]),
        dsmb_dz=jnp.stack([jnp.full(grid.shape2, -1e-4 / SPY)] * Nt),
        dtemp_dz=jnp.stack([jnp.full(grid.shape2, -0.007)] * Nt))
    import jax
    f = jax.jit(sm.__call__)
    s5 = f(geom, 5 * SPY)       # slice 0 + lapse over dh=100
    assert float(s5.smb[4, 4]) * SPY == pytest.approx(0.29, abs=1e-6)
    assert float(s5.temperature[4, 4]) == pytest.approx(249.3, abs=1e-6)
    s15 = f(geom, 15 * SPY)     # slice 1
    assert float(s15.smb[4, 4]) * SPY == pytest.approx(0.19, abs=1e-6)
    s99 = f(geom, 99 * SPY)     # clamped at the last slice
    assert float(s99.smb[4, 4]) * SPY == pytest.approx(0.09, abs=1e-6)
    sm0 = f(geom, -5 * SPY)     # clamped at the first slice
    assert float(sm0.smb[4, 4]) * SPY == pytest.approx(0.29, abs=1e-6)


def test_force_thickness_nudging():
    from pism_tpu.coupler.surface import ForceThickness, Uniform

    SPY = 3.15569259747e7
    grid = Grid(Mx=8, My=8, Lx=100e3, Ly=100e3)
    geom = new_geometry(jnp.full(grid.shape2, 1000.0), jnp.zeros(grid.shape2))
    ft = ForceThickness(inner=Uniform(smb=0.0),
                        target_thickness=jnp.full(grid.shape2, 1200.0))
    s = ft(geom, 0.0)
    # alpha = 3.17e-9/s ~ 0.1/a over a 200 m deficit -> +20 m/a
    assert float(s.smb[4, 4]) * SPY == pytest.approx(20.0, rel=0.01)
    # over-thick ice is drawn down
    ft2 = ForceThickness(inner=Uniform(smb=0.0),
                         target_thickness=jnp.full(grid.shape2, 500.0))
    assert float(ft2(geom, 0.0).smb[4, 4]) < 0.0

def test_pdd_stateful_snow_firn_cycle(flat_geometry):
    """Interannual snow/firn bookkeeping (reference TemperatureIndex model
    state): snow accumulates through winter, survives into firn at the
    balance-year rollover, and stepping through a year in pieces matches
    the stateless annual expectation."""
    grid, geom = flat_geometry
    cfg = Config()
    a = atm.Uniform(temperature=261.15, temperature_july=271.15,
                    precipitation=0.3 / SPY)
    pdd = TemperatureIndex(atmosphere=a, config=cfg)
    assert pdd.stateful

    # start at a balance-year boundary with zero depths
    from pism_tpu.coupler.surface import SurfaceCarry
    t0 = pdd.balance_year_start * SPY
    carry = SurfaceCarry(jnp.zeros(grid.shape2), jnp.zeros(grid.shape2), None)
    smb_sum = 0.0
    n = 8
    for k in range(n):
        out, carry = pdd.update(geom, t0 + k * SPY / n, SPY / n, carry)
        smb_sum += float(out.smb[2, 2]) * SPY / n
        if k == n // 2:
            # mid-winter (balance year starts in fall): snow has accumulated
            assert float(carry.snow[2, 2]) > 0.05
    # this climate has net accumulation; crossing into the next balance
    # year promotes the surviving snow to firn
    assert float(carry.firn[2, 2]) == 0.0
    survived = float(carry.snow[2, 2])
    assert survived > 0.0
    out, carry = pdd.update(geom, t0 + SPY, SPY / n, carry)
    # the balance-year rollover promotes firn_compaction_to_accumulation_
    # ratio (default 0.75) of the surviving snow to firn
    ratio = cfg.get_number("surface.pdd.firn_compaction_to_accumulation_ratio")
    assert float(carry.firn[2, 2]) == pytest.approx(ratio * survived,
                                                    rel=1e-12)

    annual = float(pdd(geom, t0).smb[2, 2]) * SPY
    assert smb_sum == pytest.approx(annual, rel=0.05)
    assert smb_sum > 0.0


def test_pdd_stateful_through_modifier_chain(flat_geometry):
    """Modifier wrappers forward the snow/firn carry to a stateful inner
    model (surface.update protocol)."""
    from pism_tpu.coupler.surface import Anomaly, SurfaceCarry

    grid, geom = flat_geometry
    cfg = Config()
    a = atm.Uniform(temperature=253.15, precipitation=0.3 / SPY)
    chain = Anomaly(inner=TemperatureIndex(atmosphere=a, config=cfg),
                    temp_anomaly=jnp.full(grid.shape2, 5.0))
    assert chain.stateful
    carry0 = SurfaceCarry(jnp.zeros(grid.shape2), jnp.zeros(grid.shape2),
                          None)
    out, carry = chain.update(geom, 0.0, SPY, carry0)
    assert float(carry.snow[2, 2]) >= 0.0
    # anomaly applied on top of the inner result
    inner_out, _ = chain.inner.update(geom, 0.0, SPY, carry0)
    np.testing.assert_allclose(np.asarray(out.temperature),
                               np.asarray(inner_out.temperature) + 5.0)


def test_atmosphere_given_time_dependent(flat_geometry):
    """-atmosphere given with a time axis (reference reads air_temp /
    precipitation stacks): temperature piecewise-linear in time,
    precipitation piecewise-constant, optional periodization (monthly
    climatology cycled forever)."""
    grid, geom = flat_geometry
    nt = 4
    times = np.arange(nt) * SPY / nt            # quarterly, one year
    T = np.stack([np.full(grid.shape2, 260.0 + 10.0 * k) for k in range(nt)])
    P = np.stack([np.full(grid.shape2, (k + 1) / SPY) for k in range(nt)])
    g = atm.Given(temperature=jnp.asarray(T), precipitation=jnp.asarray(P),
                  times=jnp.asarray(times), period=SPY)
    # exactly at a sample
    out = g(geom, times[1])
    assert float(out.temperature[2, 2]) == pytest.approx(270.0)
    assert float(out.precipitation[2, 2]) == pytest.approx(2.0 / SPY)
    # halfway between samples: T linear, P held at the left interval
    out = g(geom, 0.5 * (times[1] + times[2]))
    assert float(out.temperature[2, 2]) == pytest.approx(275.0)
    assert float(out.precipitation[2, 2]) == pytest.approx(2.0 / SPY)
    # periodized: one full period later, same values
    out2 = g(geom, 0.5 * (times[1] + times[2]) + SPY)
    assert float(out2.temperature[2, 2]) == pytest.approx(275.0)
    # instantaneous protocol: july temp equals the sampled temp, so the
    # PDD cosine reconstruction contributes nothing
    np.testing.assert_allclose(np.asarray(out.temperature_july),
                               np.asarray(out.temperature))
    # single-slice behavior unchanged
    g1 = atm.Given(temperature=jnp.full(grid.shape2, 263.15),
                   precipitation=jnp.full(grid.shape2, 0.3 / SPY))
    o1 = g1(geom, 123.0)
    assert float(o1.temperature[2, 2]) == pytest.approx(263.15)


def test_pdd_sigma_parameterization(flat_geometry):
    """surface.pdd.std_dev.param_enabled: sigma = a (T - 273.15) + b
    (Seguinot 2013) — colder climates get larger variability, so a cold
    site melts MORE than with the fixed default sigma when the
    parameterized sigma exceeds it."""
    grid, geom = flat_geometry
    a = atm.Uniform(temperature=263.15, temperature_july=272.15,
                    precipitation=0.3 / SPY)
    fixed = TemperatureIndex(atmosphere=a, config=Config())
    # parameterized: at T = 263 K, sigma = -0.15*(-10) + 0.66 = 2.16 K
    # (SMALLER than the fixed 5 K default -> less melt at sub-freezing T)
    param = TemperatureIndex(atmosphere=a, config=Config(
        {"surface.pdd.std_dev.param_enabled": True}))
    smb_fixed = float(fixed(geom, 0.0).smb[2, 2])
    smb_param = float(param(geom, 0.0).smb[2, 2])
    assert smb_param > smb_fixed      # less variability -> less melt


def test_surface_elevation_change_modifier(flat_geometry):
    """surface::ElevationChange: temperature lapse-corrected (capped at
    the melting point), SMB shifted or exponentially scaled by the
    implied temperature change."""
    from pism_tpu.coupler.factory import surface_from_config
    from pism_tpu.coupler.surface import ElevationChange, Uniform

    grid, _ = flat_geometry
    ref = jnp.zeros(grid.shape2)
    inner = Uniform(smb=0.5 / SPY, temperature=265.15)
    geom_hi = new_geometry(jnp.full(grid.shape2, 1000.0),
                           jnp.zeros(grid.shape2))
    # shift: SMB drops linearly with uplift
    m = ElevationChange(inner=inner, reference_surface=ref,
                        smb_lapse_rate=0.2 / SPY / 1000.0)
    out = m(geom_hi, 0.0)
    assert float(out.smb[2, 2]) * SPY == pytest.approx(0.3, rel=1e-6)
    assert float(out.temperature[2, 2]) == pytest.approx(265.15 - 6.0,
                                                         abs=1e-6)
    # scale: dT = -6 K, factor exp(0.07 * dT)
    m2 = ElevationChange(inner=inner, reference_surface=ref,
                         smb_exp_factor=0.07)
    out2 = m2(geom_hi, 0.0)
    assert float(out2.smb[2, 2]) * SPY \
        == pytest.approx(0.5 * np.exp(0.07 * -6.0), rel=1e-6)
    # factory chain
    cfg = Config({"surface.models": "uniform,elevation_change",
                  "surface.elevation_change.smb.lapse_rate": 0.2 / SPY / 1e3})
    chain = surface_from_config(cfg, inputs={"reference_surface": ref})
    assert isinstance(chain, ElevationChange)


def test_atmosphere_elevation_change_precip_shift(flat_geometry):
    grid, _ = flat_geometry
    geom_hi = new_geometry(jnp.full(grid.shape2, 1000.0),
                           jnp.zeros(grid.shape2))
    inner = atm.Uniform(temperature=260.15, precipitation=0.5 / SPY)
    m = atm.ElevationChange(inner=inner,
                            reference_surface=jnp.zeros(grid.shape2),
                            precip_lapse_rate=0.3 / SPY / 1000.0)
    out = m(geom_hi, 0.0)
    assert float(out.precipitation[2, 2]) * SPY == pytest.approx(0.2,
                                                                 rel=1e-6)
    # precip floored at zero for extreme uplift
    geom_vhi = new_geometry(jnp.full(grid.shape2, 3000.0),
                            jnp.zeros(grid.shape2))
    assert float(m(geom_vhi, 0.0).precipitation[2, 2]) == 0.0


def test_surface_budget_components(flat_geometry):
    """PDD and dEBM report their budget split (melt/runoff/accumulation)
    with SMB = accumulation - runoff, threaded through modifier chains
    (the surface_*_flux diagnostics family)."""
    from pism_tpu.coupler.surface import DeltaT as SurfDeltaT

    grid, geom = flat_geometry
    cfg = Config()
    a = atm.Uniform(temperature=268.15, temperature_july=278.15,
                    precipitation=0.5 / SPY)
    pdd = TemperatureIndex(atmosphere=a, config=cfg)
    out = pdd(geom, 0.0)
    assert out.melt is not None and out.runoff is not None \
        and out.accumulation is not None
    np.testing.assert_allclose(np.asarray(out.smb),
                               np.asarray(out.accumulation)
                               - np.asarray(out.runoff), rtol=1e-10)
    assert float(out.melt[2, 2]) > 0.0
    assert float(out.runoff[2, 2]) <= float(out.melt[2, 2])
    # components survive a modifier wrap
    chain = SurfDeltaT(inner=pdd, offset=lambda t: 0.0)
    out2 = chain(geom, 0.0)
    np.testing.assert_allclose(np.asarray(out2.melt), np.asarray(out.melt))


def test_pdd_sigma_field_from_file(flat_geometry, tmp_path):
    """surface.pdd.std_dev.file: a 2D air_temp_sd field overrides the
    scalar sigma (ISMIP6-style forcing)."""
    from pism_tpu.coupler.factory import inputs_from_files, surface_from_config
    from pism_tpu.io.nc4 import File

    grid, geom = flat_geometry
    path = str(tmp_path / "sd.nc")
    with File(path, "w") as f:
        f.define_dimension("y", grid.My, np.asarray(grid.y))
        f.define_dimension("x", grid.Mx, np.asarray(grid.x))
        f.define_variable("air_temp_sd", ("y", "x"), attrs={"units": "K"})
        f.write("air_temp_sd", np.full(grid.shape2, 2.0))
    cfg = Config({"surface.models": "pdd",
                  "surface.pdd.std_dev.file": path})
    a = atm.Uniform(temperature=263.15, temperature_july=272.15,
                    precipitation=0.3 / SPY)
    inputs = inputs_from_files(cfg, grid, "surface")
    assert "air_temp_sd" in inputs
    pdd2 = surface_from_config(cfg, inputs=inputs, atmosphere=a)
    pdd5 = TemperatureIndex(atmosphere=a, config=Config())  # sigma 5 K
    # smaller variability at sub-freezing temps -> less melt -> higher SMB
    assert float(pdd2(geom, 0.0).smb[2, 2]) > float(pdd5(geom, 0.0).smb[2, 2])


def test_atmosphere_pik(flat_geometry):
    """atmosphere::PIK (Martin et al. 2011): Antarctic T(h, lat)
    parameterizations, colder when higher/more poleward; the
    huybrechts_dewolde variant adds a summer cycle."""
    grid, geom = flat_geometry
    lat = jnp.full(grid.shape2, -75.0)
    P = jnp.full(grid.shape2, 0.2 / SPY)
    a = atm.PIK(latitude=lat, precipitation=P)
    out = a(geom, 0.0)
    # h = 1000 m, lat 75S: T_ma = 273.15 + 34.46 - 9.14 - 51.58 = 246.89
    assert float(out.temperature[2, 2]) == pytest.approx(246.89, abs=0.01)
    np.testing.assert_allclose(np.asarray(out.temperature_july),
                               np.asarray(out.temperature))
    a2 = atm.PIK(latitude=lat, precipitation=P,
                 parameterization="martin_huybrechts_dewolde")
    out2 = a2(geom, 0.0)
    # summer: 273.15 + 16.81 - 6.92 - 20.95 = 262.09
    assert float(out2.temperature_july[2, 2]) == pytest.approx(262.09,
                                                               abs=0.01)
    assert float(out2.temperature_july[2, 2]) > float(out2.temperature[2, 2])
    # poleward colder
    a3 = atm.PIK(latitude=jnp.full(grid.shape2, -85.0), precipitation=P)
    assert float(a3(geom, 0.0).temperature[2, 2]) \
        < float(out.temperature[2, 2])


def test_lingle_clark_uplift_initialization():
    """-uplift_file role: initializing from an observed uplift rate gives a
    model whose initial d(bed)/dt reproduces that rate, and the current
    bed is preserved exactly at t = 0."""
    from pism_tpu.model.beddef import LingleClark

    grid = Grid(Mx=33, My=33, Lx=800e3, Ly=800e3)
    cfg = Config({"bed_deformation.model": "lc",
                  "bed_deformation.lc.elastic_model": False})
    lc = LingleClark(grid=grid, config=cfg)
    bed0 = jnp.zeros(grid.shape2)
    geom = new_geometry(jnp.zeros(grid.shape2), bed0)
    # a smooth observed uplift bump (post-glacial rebound pattern), m/s
    up = 0.01 / SPY * jnp.exp(-(jnp.asarray(grid.radius) / 250e3) ** 2)
    state = lc.initialize(ModelState(geometry=geom), uplift_rate=up)
    # current bed unchanged by the initialization
    np.testing.assert_allclose(np.asarray(state.geometry.bed_elevation),
                               np.asarray(bed0), atol=1e-9)
    assert float(jnp.abs(state.bed_uplift).max()) > 0.0
    # one short step: measured d(bed)/dt matches the observed rate
    dt = 20.0 * SPY
    s2 = lc.step(state, dt)
    rate = (np.asarray(s2.geometry.bed_elevation)
            - np.asarray(state.geometry.bed_elevation)) / dt
    target = np.asarray(up)
    i = 16
    assert rate[i, i] == pytest.approx(target[i, i], rel=0.15)
    # without uplift init the bed would not move at all (zero anomaly)
    s_plain = lc.initialize(ModelState(geometry=geom))
    s_plain2 = lc.step(s_plain, dt)
    assert float(jnp.abs(s_plain2.geometry.bed_elevation).max()) < 1e-9


def test_bed_def_given(tmp_path):
    """-bed_def given (bed::Given role): bed(t) = reference + topg_delta(t),
    linearly interpolated in time, end values held outside the record."""
    from pism_tpu.io.nc4 import File
    from pism_tpu.model.beddef import GivenBed, bed_deformation_from_config

    grid = Grid(Mx=9, My=9, Lx=100e3, Ly=100e3)
    path = str(tmp_path / "beddef.nc")
    times_y = [0.0, 100.0, 200.0]
    with File(path, "w") as f:
        f.define_dimension("time", None, attrs={"units": "years"})
        f.define_dimension("y", grid.My, np.asarray(grid.y))
        f.define_dimension("x", grid.Mx, np.asarray(grid.x))
        f.define_variable("topg_delta", ("time", "y", "x"),
                          attrs={"units": "m"})
        for k, ty in enumerate(times_y):
            f.append_time(ty)
            f.write("topg_delta", np.full(grid.shape2, -10.0 * k),
                    time_index=k)

    cfg = Config({"bed_deformation.model": "given",
                  "bed_deformation.given.file": path})
    bd = bed_deformation_from_config(grid, cfg)
    assert isinstance(bd, GivenBed)

    bed0 = jnp.full(grid.shape2, 123.0)
    geom = new_geometry(jnp.zeros(grid.shape2), bed0)
    state = bd.initialize(ModelState(geometry=geom))
    # t = 0: delta = 0, bed = reference
    s = bd.step(state, 1.0, t=0.0)
    np.testing.assert_allclose(np.asarray(s.geometry.bed_elevation), 123.0)
    # t = 150 a: halfway between -10 and -20
    s = bd.step(state, 1.0, t=150.0 * SPY)
    np.testing.assert_allclose(np.asarray(s.geometry.bed_elevation),
                               123.0 - 15.0, rtol=1e-6)
    # beyond the record: held at the last slice
    s = bd.step(state, 1.0, t=1000.0 * SPY)
    np.testing.assert_allclose(np.asarray(s.geometry.bed_elevation),
                               123.0 - 20.0, rtol=1e-6)
    # jit-compatible with a traced time
    import jax
    s = jax.jit(lambda st, t: bd.step(st, 1.0, t=t))(state, 150.0 * SPY)
    np.testing.assert_allclose(np.asarray(s.geometry.bed_elevation),
                               123.0 - 15.0, rtol=1e-6)


def test_pdd_random_methods(flat_geometry):
    """PISM PDDrandMassBalance role: Monte-Carlo daily temperature draws.
    repeatable_random_process is bit-stable across calls; its climatology
    converges to the Calov-Greve expectation integral."""
    grid, geom = flat_geometry
    a = atm.Uniform(temperature=271.15, temperature_july=279.15,
                    precipitation=0.3 / SPY)
    exp = TemperatureIndex(atmosphere=a, config=Config())
    rep = TemperatureIndex(atmosphere=a, config=Config(
        {"surface.pdd.method": "repeatable_random_process"}))
    out_e = exp(geom, 0.0)
    out_r1 = rep(geom, 0.0)
    out_r2 = rep(geom, 0.0)
    # bit-stable across evaluations (fixed seed, time-keyed draws)
    np.testing.assert_array_equal(np.asarray(out_r1.smb),
                                  np.asarray(out_r2.smb))
    # Monte-Carlo climatology close to the expectation integral
    smb_e = float(np.asarray(out_e.smb)[2, 2]) * SPY
    smb_r = float(np.asarray(out_r1.smb)[2, 2]) * SPY
    assert smb_r == pytest.approx(smb_e, abs=max(0.15 * abs(smb_e), 0.05))
    # melt happens in both (summer peaks above freezing)
    assert float(np.asarray(out_r1.melt).max()) > 0.0

    with pytest.raises(ValueError):
        TemperatureIndex(atmosphere=a, config=Config(
            {"surface.pdd.method": "bogus"}))


def test_lingle_clark_update_interval_parity():
    """VERDICT r4 #7 (reference BedDef.cc bed_deformation.update_interval):
    solving the spectral step only on the interval cadence must track the
    every-step solution closely — the load anomaly is re-measured from the
    current thickness at each solve, so nothing accumulates wrongly."""
    from pism_tpu.model.beddef import LingleClark

    grid = Grid(Mx=33, My=33, Lx=800e3, Ly=800e3)
    disc = jnp.where(jnp.asarray(grid.radius) < 300e3, 1500.0, 0.0)

    def run(interval_years):
        cfg = Config({"bed_deformation.model": "lc",
                      "bed_deformation.update_interval": interval_years})
        lc = LingleClark(grid=grid, config=cfg)
        geom = new_geometry(jnp.zeros(grid.shape2), jnp.zeros(grid.shape2))
        state = lc.initialize(ModelState(geometry=geom))
        # load applied after initialization: the bed starts relaxing
        state = state.replace(geometry=state.geometry.replace(
            ice_thickness=disc))
        dt = 2.0 * SPY
        t = 0.0
        for _ in range(100):   # 200 years
            t += dt
            state = lc.step(state, dt, t=t)
        return np.asarray(state.geometry.bed_elevation)

    bed_every = run(0.0)     # solve every step
    bed_int = run(10.0)      # reference default cadence
    # the bed must actually deform...
    assert bed_every.min() < -20.0
    # ...and the interval solution tracks the every-step one
    err = np.max(np.abs(bed_int - bed_every))
    assert err < 0.1 * np.max(np.abs(bed_every))
