import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config
from pism_tpu.physics.enthalpy_converter import EnthalpyConverter
from pism_tpu.physics.rheology import (
    GPBLD, IsothermalGlen, PatersonBudd, flow_law_from_config)


@pytest.fixture
def EC():
    return EnthalpyConverter.from_config(Config())


def test_enthalpy_roundtrip_cold(EC):
    p = EC.pressure(1000.0)
    T = 250.0
    E = EC.enthalpy(T, 0.0, p)
    assert float(EC.temperature(E, p)) == pytest.approx(T)
    assert float(EC.water_fraction(E, p)) == 0.0


def test_enthalpy_roundtrip_temperate(EC):
    p = EC.pressure(500.0)
    omega = 0.005
    Tm = float(EC.melting_temperature(p))
    E = EC.enthalpy(Tm, omega, p)
    assert float(EC.water_fraction(E, p)) == pytest.approx(omega)
    assert float(EC.temperature(E, p)) == pytest.approx(Tm)


def test_melting_point_decreases_with_depth(EC):
    assert float(EC.melting_temperature(EC.pressure(4000.0))) < 273.15


def test_cts_continuity(EC):
    """Softness must be continuous across the cold-temperate transition."""
    law = GPBLD(EC=EC)
    p = EC.pressure(800.0)
    Es = float(EC.enthalpy_cts(p))
    below = float(law.softness(jnp.asarray(Es - 1.0), p))
    above = float(law.softness(jnp.asarray(Es + 1.0), p))
    assert above == pytest.approx(below, rel=1e-3)


def test_gpbld_softens_with_water(EC):
    law = GPBLD(EC=EC)
    p = EC.pressure(800.0)
    Es = float(EC.enthalpy_cts(p))
    dry = float(law.softness(jnp.asarray(Es), p))
    wet = float(law.softness(jnp.asarray(Es + 0.005 * law.EC.L0), p))
    assert wet > dry
    # capped at omega = 0.01
    very_wet = float(law.softness(jnp.asarray(Es + 0.05 * law.EC.L0), p))
    assert very_wet == pytest.approx(
        dry * (1 + law.water_frac_coeff * 0.01), rel=1e-6)


def test_paterson_budd_magnitude(EC):
    """A(-10 C) ~ 3e-25 1/(Pa^3 s) (Cuffey & Paterson order)."""
    law = PatersonBudd(EC=EC)
    A = float(law.softness_from_temp_pa(jnp.asarray(263.15)))
    assert 1e-25 < A < 1e-24


def test_hardness_softness_consistency(EC):
    law = PatersonBudd(EC=EC)
    p = EC.pressure(100.0)
    E = EC.enthalpy(255.0, 0.0, p)
    A = float(law.softness(E, p))
    B = float(law.hardness(E, p))
    assert B == pytest.approx(A ** (-1.0 / 3.0))


def test_factory(EC):
    cfg = Config({"stress_balance.sia.flow_law": "isothermal_glen"})
    law = flow_law_from_config(cfg, "sia")
    assert isinstance(law, IsothermalGlen)
    cfg = Config()
    assert isinstance(flow_law_from_config(cfg, "sia"), GPBLD)


def test_averaged_hardness_isothermal(EC):
    law = IsothermalGlen(EC=EC)
    z = jnp.linspace(0.0, 4000.0, 21)
    E = jnp.zeros((4, 4, 21))
    H = jnp.full((4, 4), 2000.0)
    B = law.averaged_hardness(H, E, z)
    assert np.allclose(np.asarray(B), law.A ** (-1 / 3.0), rtol=1e-12)


def test_topg_to_phi():
    """-topg_to_phi: till friction angle ramps with bed elevation; seeded
    into the state at prepare time and checkpointed as tillphi."""
    import jax.numpy as jnp
    import numpy as np

    from pism_tpu import Config, Grid
    from pism_tpu.coupler.surface import Uniform
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.physics.basal import MohrCoulombYieldStress
    from pism_tpu.state import ModelState, new_geometry

    cfg = Config({"basal_yield_stress.mohr_coulomb.topg_to_phi.enabled": True})
    mc = MohrCoulombYieldStress(config=cfg)
    bed = jnp.asarray([-500.0, -300.0, 200.0, 700.0, 1500.0])
    phi = np.asarray(mc.topg_to_phi(bed))
    np.testing.assert_allclose(phi, [15.0, 15.0, 30.0, 45.0, 45.0])

    grid = Grid(Mx=7, My=7, Lx=100e3, Ly=100e3)
    cfg2 = Config({"stress_balance.model": "ssa+sia",
                   "stress_balance.sia.flow_law": "isothermal_glen",
                   "stress_balance.ssa.flow_law": "isothermal_glen",
                   "energy.model": "none",
                   "basal_yield_stress.model": "mohr_coulomb",
                   "basal_yield_stress.mohr_coulomb.topg_to_phi.enabled":
                       True})
    bed2 = jnp.asarray(np.linspace(-400, 900, 49).reshape(7, 7))
    state = ModelState(geometry=new_geometry(jnp.full((7, 7), 800.0), bed2))
    model = IceModel(grid=grid, config=cfg2, surface=Uniform(smb=0.0))
    st = model.prepare_state(state)
    assert st.till_phi is not None
    p = np.asarray(st.till_phi)
    assert p.min() == 15.0 and p.max() == 45.0
    assert np.all(np.diff(p.ravel()) >= 0.0)   # monotone with the bed ramp


def test_tillphi_opt_update_rules():
    """tillphi_opt single update (Albrecht et al. 2022 role): phi decreases
    where the grounded surface sits above the target, increases below,
    respects the dead band, per-update cap and the [phi_min, phi_max]
    bounds, and leaves non-grounded cells untouched."""
    import jax.numpy as jnp
    import numpy as np

    from pism_tpu import Config, Grid
    from pism_tpu.physics.basal import MohrCoulombYieldStress
    from pism_tpu.state import ModelState, new_geometry

    cfg = Config({
        "basal_yield_stress.mohr_coulomb.tillphi_opt.enabled": True,
        "basal_yield_stress.mohr_coulomb.tillphi_opt.dphi_scale": 0.01,
        "basal_yield_stress.mohr_coulomb.tillphi_opt.dphi_max": 2.0,
        "basal_yield_stress.mohr_coulomb.tillphi_opt.phi_min": 5.0,
        "basal_yield_stress.mohr_coulomb.tillphi_opt.phi_max": 40.0,
        "basal_yield_stress.mohr_coulomb.tillphi_opt.dh_min": 1.0,
    })
    mc = MohrCoulombYieldStress(config=cfg)
    assert mc.opt_enabled and mc.opt_dt > 0

    # grounded column of ice; one floating column (deep bed)
    H = np.full((5, 5), 1000.0)
    bed = np.zeros((5, 5)); bed[:, 4] = -2000.0
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))
    phi0 = np.full((5, 5), 30.0)
    state = ModelState(geometry=geom, till_phi=jnp.asarray(phi0))

    target = np.asarray(geom.ice_surface_elevation).copy()
    target[0, 0] -= 50.0    # model 50 m too HIGH here  -> phi down by 0.5
    target[1, 1] += 50.0    # model 50 m too LOW here   -> phi up by 0.5
    target[2, 2] -= 500.0   # 5.0 deg raw change -> capped at dphi_max = 2
    target[3, 3] -= 0.5     # inside the dead band -> unchanged
    target[:, 4] -= 300.0   # floating column -> untouched

    out = np.asarray(mc.optimize_tillphi(state, jnp.asarray(target)).till_phi)
    assert out[0, 0] == pytest.approx(29.5)
    assert out[1, 1] == pytest.approx(30.5)
    assert out[2, 2] == pytest.approx(28.0)   # capped
    assert out[3, 3] == pytest.approx(30.0)   # dead band
    np.testing.assert_allclose(out[:, 4], 30.0)  # floating untouched

    # bounds: repeated application saturates at phi_min
    st = state
    tgt = np.asarray(geom.ice_surface_elevation) - 1e4
    for _ in range(30):
        st = mc.optimize_tillphi(st, jnp.asarray(tgt))
    assert np.asarray(st.till_phi)[0, 0] == pytest.approx(5.0)


def test_tillphi_opt_in_run_loop():
    """End-to-end: a growing dome above its target surface weakens the
    grounded till every tillphi_opt.dt; the run loop applies updates at the
    right times and seeds till_phi with the default."""
    import jax.numpy as jnp
    import numpy as np

    from pism_tpu import Config, Grid, Time
    from pism_tpu.coupler.surface import Uniform
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.state import ModelState, new_geometry

    SPY = 3.15569259747e7
    grid = Grid(Mx=11, My=11, Lx=200e3, Ly=200e3)
    cfg = Config({
        "stress_balance.model": "ssa+sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "stress_balance.ssa.flow_law": "isothermal_glen",
        "energy.model": "none",
        "basal_yield_stress.mohr_coulomb.tillphi_opt.enabled": True,
        "basal_yield_stress.mohr_coulomb.tillphi_opt.dt": 100.0,
        "basal_yield_stress.mohr_coulomb.tillphi_opt.dphi_scale": 0.01,
        "basal_yield_stress.mohr_coulomb.tillphi_opt.dh_min": 0.5,
    })
    # flat bed, modest dome, strong accumulation -> surface rises above the
    # initial surface (the default target)
    y, x = np.meshgrid(grid.y, grid.x, indexing="ij")
    r = np.hypot(x, y)
    H0 = np.maximum(800.0 * (1 - r / 180e3), 0.0)
    state = ModelState(geometry=new_geometry(jnp.asarray(H0),
                                             jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg,
                     surface=Uniform(smb=2.0 / SPY))
    assert model.yield_stress.opt_enabled
    state, _ = model.run(state, Time(0.0, 300.0 * SPY))
    phi = np.asarray(state.till_phi)
    icy = np.asarray(state.geometry.ice_thickness) > 10.0
    # 2 m/a over >= 100 a beats the dead band everywhere icy -> phi dropped
    assert (phi[icy] < 30.0).all()
    assert phi[icy].min() >= 2.0   # stayed above phi_min
    # ice-free far field untouched
    assert (phi[~icy] == 30.0).all()


def test_given_yield_stress():
    """-yield_stress given: prescribed tauc field (array or file), zeroed
    over ocean; the factory wires it with the grid for file reads."""
    import jax.numpy as jnp
    import numpy as np

    from pism_tpu import Config, Grid
    from pism_tpu.io.nc4 import File
    from pism_tpu.io import checkpoint as ckpt
    from pism_tpu.physics.basal import (GivenYieldStress,
                                        yield_stress_from_config)
    from pism_tpu.state import ModelState, new_geometry

    grid = Grid(Mx=9, My=9, Lx=100e3, Ly=100e3)
    tau = np.linspace(1e4, 2e5, 81).reshape(9, 9)
    H = np.full((9, 9), 500.0)
    bed = np.zeros((9, 9)); bed[:, -2:] = -2000.0; H[:, -1] = 0.0
    state = ModelState(geometry=new_geometry(jnp.asarray(H), jnp.asarray(bed)))

    ys = GivenYieldStress(Config({}), tau_c=tau)
    out = np.asarray(ys.compute(state))
    np.testing.assert_allclose(out[:, :-2], tau[:, :-2])
    assert (out[:, -1] == 0.0).all()      # ice-free ocean column zeroed

    # file path through the factory
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tauc.nc")
        with File(path, "w") as f:
            ckpt._setup_dims(f, grid)
            f.append_time(0.0)
            f.write("tauc", tau[None], dims=("time", "y", "x"),
                    attrs={"units": "Pa"})
        cfg = Config({"basal_yield_stress.model": "given",
                      "basal_yield_stress.given.file": path})
        ys2 = yield_stress_from_config(cfg, grid)
        np.testing.assert_allclose(np.asarray(ys2.tau_c), tau)

    # no array and no file -> explicit error
    with pytest.raises(ValueError):
        GivenYieldStress(Config({}))


def test_goldsby_kohlstedt_flow(EC):
    """GK composite law: finite positive creep, stronger at warm T and high
    stress; dislocation creep dominates at high stress, grain-size-sensitive
    mechanisms at low stress (Goldsby & Kohlstedt 2001)."""
    import jax.numpy as jnp
    from pism_tpu.physics.rheology import (GoldsbyKohlstedt, PatersonBudd,
                                           flow_law_from_config)
    from pism_tpu import Config

    gk = GoldsbyKohlstedt(EC=EC)
    p = EC.pressure(jnp.asarray(500.0))
    E_cold = EC.enthalpy(jnp.asarray(253.15), jnp.asarray(0.0), p)
    E_warm = EC.enthalpy(jnp.asarray(268.15), jnp.asarray(0.0), p)

    F_cold = float(gk.flow(jnp.asarray(1e5), E_cold, p))
    F_warm = float(gk.flow(jnp.asarray(1e5), E_warm, p))
    assert 0.0 < F_cold < F_warm

    # strain rate eps = F * sigma grows superlinearly in sigma
    # (dislocation n=4 dominates at high stress)
    F_lo = float(gk.flow(jnp.asarray(1e4), E_cold, p))
    F_hi = float(gk.flow(jnp.asarray(5e5), E_cold, p))
    assert F_hi > F_lo
    eps_hi = F_hi * 5e5
    eps_lo = F_lo * 1e4
    assert eps_hi / eps_lo > (5e5 / 1e4)      # superlinear

    # smaller grains -> faster GBS/diffusional creep at low stress
    gk_fine = GoldsbyKohlstedt(EC=EC, grain_size=1e-4)
    assert float(gk_fine.flow(jnp.asarray(1e4), E_cold, p)) > F_lo

    # magnitude sanity vs Paterson-Budd at typical SIA stress (same order)
    pb = PatersonBudd(EC=EC)
    F_pb = float(pb.flow(jnp.asarray(1e5),
                         EC.pressure_adjusted_temperature(E_cold, p) * 0 +
                         E_cold, p))
    assert 1e-4 < F_cold / F_pb < 1e4

    # softness/hardness are undefined, as in the reference
    import pytest as _pytest
    with _pytest.raises(RuntimeError):
        gk.softness(E_cold, p)
    with _pytest.raises(RuntimeError):
        gk.averaged_hardness(jnp.asarray(100.0), E_cold[None], jnp.asarray([0.0]))

    # factory: gk for SIA ok, refused for SSA
    cfg = Config({"stress_balance.sia.flow_law": "gk",
                  "stress_balance.ssa.flow_law": "gk"})
    law = flow_law_from_config(cfg, "sia")
    assert isinstance(law, GoldsbyKohlstedt)
    with _pytest.raises(ValueError):
        flow_law_from_config(cfg, "ssa")


def test_regularized_coulomb_sliding():
    """Zoet-Iverson regularized Coulomb: tau_b -> tau_c as |u| -> inf,
    power-law at low speed, always below the pseudo-plastic drag."""
    import jax.numpy as jnp
    from pism_tpu.physics.basal import SlidingLaw
    from pism_tpu import Config

    law = SlidingLaw.from_config(Config(
        {"basal_resistance.regularized_coulomb.enabled": True}))
    assert law.regularized_coulomb
    tau_c = 5e4
    SPY = 3.15569259747e7
    # fast sliding: tau_b = beta * |u| approaches tau_c (Coulomb limit)
    u_fast = 100000.0 / SPY
    tb_fast = float(law.beta(tau_c, jnp.asarray(u_fast), 0.0) * u_fast)
    assert tb_fast == pytest.approx(tau_c, rel=0.05)
    # slow sliding: well below tau_c
    u_slow = 1.0 / SPY
    tb_slow = float(law.beta(tau_c, jnp.asarray(u_slow), 0.0) * u_slow)
    assert tb_slow < 0.5 * tau_c
    # monotone increasing tau_b(|u|)
    speeds = jnp.asarray([1.0, 10.0, 100.0, 1000.0, 1e4]) / SPY
    tb = np.asarray(law.beta(tau_c, speeds, 0.0) * speeds)
    assert np.all(np.diff(tb) > 0)


def test_goldsby_kohlstedt_sia_end_to_end():
    """GK drives the generalized SIA diffusivity integral and the 3D
    velocity/strain-heating path (reference: SIAFD consumes the full
    flow(stress,...) form for non-Glen laws)."""
    import jax.numpy as jnp
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.verification import eismint2

    SPY = 3.15569259747e7
    es = eismint2.setup("A", Mx=31, Mz=11, Lz=5000.0)
    es.config.update({"stress_balance.sia.flow_law": "gk"})
    model = IceModel(grid=es.grid, config=es.config, surface=es.surface)
    state, t, stats = model.step_once(es.state, 0.0, 500.0 * SPY)
    H = np.asarray(state.geometry.ice_thickness)
    assert np.isfinite(H).all() and H.max() > 0.0
    assert int(stats.nsteps) >= 1
    # the ice flows: margin advances / interior flux nonzero
    sb = model.stress_balance.update(state)
    assert float(jnp.max(jnp.abs(sb.qe))) > 0.0
    assert np.isfinite(float(sb.max_diffusivity))
