"""Round-4 config-tail wirings: cold-bulge limiter, age-coupled SIA
enhancement, SSA Krylov-method choice, constant melange back pressure,
routing CFL factor, geometry source gating, and the parameter-count floor
(reference ``src/pism_config.cdl`` has ~600+ parameters)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry

SPY = 3.15569259747e7


def test_parameter_count_floor():
    from pism_tpu.config.parameters import PARAMETERS
    # round 5 pruned invented duplicate/alias entries (delta_fraction,
    # Schoof alias, lc.update_interval alias, ...) while wiring the rest;
    # the floor tracks the post-prune count
    assert len(PARAMETERS) >= 590


# ---------------------------------------------------------------- energy
def test_cold_bulge_limiter():
    """The column solve must not leave ice more than cold_bulge_max below
    its surface enthalpy (reference enthSystem bulge limiter)."""
    from pism_tpu.model.energy import EnergyModel, bootstrap_enthalpy
    from pism_tpu.ops.sia3d import SIA3D
    from pism_tpu.physics.enthalpy_converter import EnthalpyConverter

    Mz = 21
    grid = Grid(Mx=5, My=5, Lx=50e3, Ly=50e3, Mz=Mz, Lz=2000.0,
                vertical_spacing="equal")

    def run(bulge_max):
        cfg = Config({"grid.Mz": Mz, "grid.Lz": 2000.0,
                      "energy.enthalpy.cold_bulge_max": bulge_max})
        EC = EnthalpyConverter.from_config(cfg)
        em = EnergyModel(grid=grid, config=cfg, EC=EC)
        H = jnp.full(grid.shape2, 1500.0)
        geom = new_geometry(H, jnp.zeros(grid.shape2))
        # start the interior 40 K colder than the (warm) surface
        E0 = bootstrap_enthalpy(grid, EC, H, jnp.full(grid.shape2, 223.15))
        z3 = (5, 5, Mz)
        sia3 = SIA3D(u=jnp.zeros(z3), v=jnp.zeros(z3), w=jnp.zeros(z3),
                     strain_heating=jnp.zeros(z3),
                     max_u=jnp.zeros(()), max_v=jnp.zeros(()))
        state = ModelState(geometry=geom, enthalpy=E0,
                           basal_melt_rate=jnp.zeros(grid.shape2))
        T_s = jnp.full(grid.shape2, 263.15)
        res = em.step(state, sia3, T_s, 1.0 * SPY)
        E_sfc = EC.enthalpy(T_s, 0.0, EC.pressure(0.0))
        return np.asarray(res.enthalpy), float(E_sfc[2, 2])

    E_lim, E_sfc = run(5.0e3)               # tight limiter: binds
    assert E_lim.min() >= E_sfc - 5.0e3 - 1e-6
    E_free, _ = run(1.0e9)                  # effectively unlimited
    assert E_free.min() < E_sfc - 5.0e3     # the clamp was doing the work


# ------------------------------------------------- age-coupled enhancement
def _diffusivity_max(enhancement):
    from pism_tpu.ops import sia as sia_ops
    from pism_tpu.ops.stencils import Shifter
    from pism_tpu.physics.enthalpy_converter import EnthalpyConverter
    from pism_tpu.physics.rheology import PatersonBudd

    cfg = Config({"grid.Mz": 11})
    grid = Grid(Mx=21, My=21, Lx=200e3, Ly=200e3, Mz=11, Lz=3000.0)
    EC = EnthalpyConverter.from_config(cfg)
    law = PatersonBudd(EC=EC)
    x = np.asarray(grid.x) / 200e3
    H = 2500.0 * np.maximum(1.0 - x[None, :] ** 2 - x[:, None] ** 2, 0.0)
    H = jnp.asarray(H)
    geom = new_geometry(H, jnp.zeros(grid.shape2))
    E3 = jnp.full(grid.shape3, 9.0e4)
    flux = sia_ops.diffusivity(law, geom, E3, grid, Shifter(grid),
                               enhancement=enhancement)
    return float(flux.max_D)


def test_enhancement_field_matches_scalar():
    """A spatially-constant 3D enhancement must reproduce the scalar path
    exactly (the age-coupling plumbing is a pure refactor at e = const)."""
    grid3 = (21, 21, 11)
    d_scalar = _diffusivity_max(3.0)
    d_field = _diffusivity_max(jnp.full(grid3, 3.0))
    assert d_field == pytest.approx(d_scalar, rel=1e-12)
    assert _diffusivity_max(jnp.full(grid3, 6.0)) > 1.5 * d_scalar


def test_e_age_coupling_in_stress_balance():
    """stress_balance.sia.e_age_coupling: Holocene-deposited ice flows with
    enhancement_factor_interglacial (softer => larger diffusivity)."""
    from pism_tpu.model.stressbalance import StressBalance
    from pism_tpu.physics.enthalpy_converter import EnthalpyConverter
    from pism_tpu.physics.rheology import PatersonBudd

    Mz = 11
    cfg = Config({"grid.Mz": Mz, "age.enabled": True,
                  "stress_balance.sia.e_age_coupling": True,
                  "stress_balance.sia.enhancement_factor_interglacial": 8.0})
    grid = Grid(Mx=21, My=21, Lx=200e3, Ly=200e3, Mz=Mz, Lz=3000.0)
    EC = EnthalpyConverter.from_config(cfg)
    law = PatersonBudd(EC=EC)
    x = np.asarray(grid.x) / 200e3
    H = jnp.asarray(2500.0 * np.maximum(
        1.0 - x[None, :] ** 2 - x[:, None] ** 2, 0.0))
    sb = StressBalance(grid=grid, config=cfg, sia_flow_law=law, model="sia",
                       compute_3d=False)
    state = ModelState(geometry=new_geometry(H, jnp.zeros(grid.shape2)),
                       enthalpy=jnp.full(grid.shape3, 9.0e4),
                       age=jnp.full(grid.shape3, 100.0 * SPY))
    t = 2000.0 * SPY   # deposition time ~ +1900 a: Holocene => interglacial
    d_soft = float(sb.update(state, t=t).max_diffusivity)
    t_old = -50.0e3 * SPY  # deposited at -50 ka: glacial ice, e = e_sia
    d_hard = float(sb.update(state, t=t_old).max_diffusivity)
    assert d_soft == pytest.approx(8.0 * d_hard, rel=1e-5)
    # without the flag the age field is ignored
    cfg2 = Config({"grid.Mz": Mz})
    sb2 = StressBalance(grid=grid, config=cfg2, sia_flow_law=law, model="sia",
                        compute_3d=False)
    assert float(sb2.update(state, t=t).max_diffusivity) \
        == pytest.approx(d_hard, rel=1e-12)


# ------------------------------------------------------------ SSA Krylov
def test_ssa_krylov_method_cg():
    """krylov_method = cg solves the (symmetric-interior) Schoof stream to
    the same answer as the BiCGStab default."""
    from pism_tpu.model.ssa import SSAFD
    from pism_tpu.physics.rheology import IsothermalGlen
    from pism_tpu.verification.ssa_exact import ExactI

    ti = ExactI()
    My, Mx = 31, 11
    grid = Grid(Mx=Mx, My=My, Lx=10e3, Ly=60e3, periodicity="x")
    tau_c = jnp.asarray(np.tile(ti.tau_c(grid.y)[:, None], (1, Mx)))
    law = IsothermalGlen(A=float(ti.B) ** -3.0)
    geom = new_geometry(jnp.full(grid.shape2, ti.H0), jnp.zeros(grid.shape2))
    state = ModelState(geometry=geom)
    bc = np.zeros(grid.shape2, bool)
    bc[0, :] = bc[-1, :] = True

    def solve(method):
        cfg = Config({"stress_balance.ssa.fd.velocity_change_rtol": 0.0,
                      "stress_balance.ssa.fd.drag_jacobian": "exact",
                      "stress_balance.ssa.fd.krylov_method": method})
        ssa = SSAFD(grid=grid, config=cfg, flow_law=law,
                    bc_mask=jnp.asarray(bc),
                    bc_u=jnp.zeros(grid.shape2), bc_v=jnp.zeros(grid.shape2),
                    taud_x=jnp.full(grid.shape2, ti.f),
                    taud_y=jnp.zeros(grid.shape2))
        u, v = ssa.solve(state, tau_c)
        return np.asarray(u)

    u_cg = solve("cg")
    u_bi = solve("bicgstab")
    # both converge to the same discrete solution (the stopping tolerances,
    # not the method, set the ~1e-2 relative agreement floor here)
    np.testing.assert_allclose(u_cg, u_bi, atol=0.02 * np.abs(u_bi).max())
    assert u_cg.max() * SPY == pytest.approx(ExactI().velocity(
        Grid(Mx=Mx, My=My, Lx=10e3, Ly=60e3, periodicity="x").y).max() * SPY,
        rel=0.05)
    with pytest.raises(ValueError):
        solve("gmres")


# ------------------------------------------------------------------ ocean
def test_constant_melange_back_pressure():
    from pism_tpu.coupler.factory import ocean_from_config
    from pism_tpu.coupler.ocean import FracMBP, hydrostatic_water_column_pressure

    H = jnp.full((5, 5), 400.0)
    geom = new_geometry(H, jnp.full((5, 5), -600.0))  # floating shelf
    cfg = Config({"ocean.melange_back_pressure_fraction": 0.5})
    model = ocean_from_config(cfg)
    assert isinstance(model, FracMBP)
    Pw = np.asarray(model.water_column_pressure(geom, 0.0))
    P0 = np.asarray(hydrostatic_water_column_pressure(geom, 9.81, 910.0, 1028.0))
    assert (Pw > P0 + 1.0).all()     # melange raises the front pressure
    # default = 0: hydrostatic (None) exactly as before
    assert ocean_from_config(Config()).water_column_pressure(geom, 0.0) is None


# -------------------------------------------------------------- hydrology
def test_routing_cfl_factor_from_config():
    from pism_tpu.physics.hydrology import Routing
    cfg = Config({"grid.Mz": 5, "hydrology.routing.cfl_factor": 0.25})
    grid = Grid(Mx=11, My=11, Lx=50e3, Ly=50e3, Mz=5)
    r = Routing(grid=grid, config=cfg)
    assert r.cfl_factor == 0.25


# ----------------------------------------------------- geometry source gate
def test_use_surface_mass_balance_gate():
    """geometry.update.use_surface_mass_balance = False: the SMB no longer
    changes the ice volume (flow remains conservative)."""
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.coupler.surface import Uniform

    def run(use_smb):
        cfg = Config({"grid.Mz": 5, "energy.model": "none",
                      "stress_balance.model": "sia",
                      "stress_balance.sia.flow_law": "isothermal_glen",
                      "geometry.update.use_surface_mass_balance": use_smb})
        grid = Grid(Mx=31, My=31, Lx=600e3, Ly=600e3, Mz=5)
        x = np.asarray(grid.x) / 600e3
        H = jnp.asarray(2000.0 * np.maximum(
            1.0 - x[None, :] ** 2 - x[:, None] ** 2, 0.0))
        state = ModelState(geometry=new_geometry(H, jnp.zeros(grid.shape2)))
        model = IceModel(grid=grid, config=cfg,
                         surface=Uniform(smb=0.5 / SPY))  # 0.5 m/a everywhere
        state2, _, _ = model.step_once(state, 0.0, 20.0 * SPY)
        dv = float(jnp.sum(state2.geometry.ice_thickness - H)) \
            * grid.dx * grid.dy
        return dv

    dv_on = run(True)
    dv_off = run(False)
    area = 1.2e6 ** 2
    assert dv_on > 0.2 * 20.0 * 0.5 * area   # SMB adds volume
    assert abs(dv_off) < 0.01 * abs(dv_on)   # gated: flow only
