"""Steady-state thermal verification in the spirit of PISM exact tests
K and O (``src/verification/tests/exactTestK_O.c``; Bueler, Lingle & Brown):
conduction-only ice + bedrock columns.

Test-O analog: a motionless 3000 m slab at the basal pressure-melting point
with constant surface temperature and geothermal flux G reaches a steady
state in which the basal melt rate is fixed by the flux imbalance across
the basal interface,

    M_O = (G - k_i (T_m(p_b) - T_s) / H) / (rho_i * L),

the exact solution of the two-layer steady conduction problem (in the
bedrock the steady profile is linear carrying exactly G; in the ice it is
linear between the Dirichlet boundary values).

Test-K analog: with a cold base (no melt), the steady ice profile is linear
with slope G/k_i, i.e. T_base - T_s = G H / k_i, and the bedrock gradient
is G/k_b.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.model.btu import btu_from_config
from pism_tpu.model.energy import EnergyModel
from pism_tpu.ops.sia3d import SIA3D
from pism_tpu.physics.enthalpy_converter import EnthalpyConverter
from pism_tpu.state import ModelState, new_geometry

SPY = 3.15569259747e7


def _run_column(Ts, G, H0=1000.0, years=100000.0, nsteps=200, Mz=41,
                E_init_temperate=False):
    # Lz > H so the ice surface falls inside the grid (the partial-top-layer
    # Dirichlet needs the surface strictly below the top level)
    grid = Grid(Mx=3, My=3, Lx=10e3, Ly=10e3, Mz=Mz, Lz=1.15 * H0)
    cfg = Config({"energy.model": "enthalpy"})
    EC = EnthalpyConverter.from_config(cfg)
    em = EnergyModel(grid=grid, config=cfg, EC=EC)

    H = jnp.full(grid.shape2, H0)
    geom = new_geometry(H, jnp.zeros(grid.shape2))
    z = jnp.asarray(grid.z)
    p = EC.pressure(jnp.maximum(H[..., None] - z, 0.0))
    if E_init_temperate:
        # start exactly at the pressure-melting profile
        E = EC.enthalpy(EC.melting_temperature(p), 0.0, p)
    else:
        E = EC.enthalpy(jnp.full(p.shape, Ts), 0.0, p)
    state = ModelState(geometry=geom, enthalpy=E)

    zeros3 = jnp.zeros(grid.shape2 + (Mz,))
    sia3 = SIA3D(u=zeros3, v=zeros3, w=zeros3, strain_heating=zeros3,
                 max_u=jnp.zeros(()), max_v=jnp.zeros(()))
    T_sfc = jnp.full(grid.shape2, Ts)
    Gf = jnp.full(grid.shape2, G)

    dt = years * SPY / nsteps

    import jax

    def scan_steps(E0):
        def body(E, _):
            res = em.step(state.replace(enthalpy=E), sia3, T_sfc, dt,
                          geothermal_flux=Gf)
            return res.enthalpy, res.basal_melt_rate
        return jax.lax.scan(body, E0, None, length=nsteps)

    E_fin, melts = jax.jit(scan_steps)(state.enthalpy)
    state = state.replace(enthalpy=E_fin, basal_melt_rate=melts[-1])
    return grid, cfg, EC, state


def test_O_steady_basal_melt_rate():
    """Warm-based slab: steady melt = flux imbalance / (rho L)."""
    cfg = Config({})
    k_i = cfg.get_number("constants.ice.thermal_conductivity")
    rho_i = cfg.get_number("constants.ice.density")
    L = cfg.get_number("constants.fresh_water.latent_heat_of_fusion")
    H0, G = 1000.0, 0.042    # thermal diffusion time ~30 kyr: equilibrates
    EC = EnthalpyConverter.from_config(cfg)
    Tm_base = float(EC.melting_temperature(EC.pressure(jnp.asarray(H0))))
    Ts = Tm_base - 5.0       # cold enough for stable conduction, warm base

    grid, _, _, state = _run_column(Ts, G, H0=H0, years=300000.0,
                                    E_init_temperate=True)
    M_exact = (G - k_i * (Tm_base - Ts) / H0) / (rho_i * L)
    assert M_exact > 0
    M = float(state.basal_melt_rate[1, 1])
    assert M == pytest.approx(M_exact, rel=0.05)


def test_K_steady_cold_profile():
    """Cold-based slab: steady linear profile with slope G/k_i."""
    cfg = Config({})
    k_i = cfg.get_number("constants.ice.thermal_conductivity")
    H0, G = 1000.0, 0.02
    Ts = 233.15              # very cold surface: base stays below melting

    grid, _, EC, state = _run_column(Ts, G, H0=H0, years=300000.0)
    z = np.asarray(grid.z)
    in_ice = z <= H0 - 1.0     # compare in-ice levels only
    p = np.asarray(EC.pressure(jnp.maximum(H0 - jnp.asarray(z), 0.0)))
    T = np.asarray(EC.temperature(state.enthalpy[1, 1], jnp.asarray(p)))
    T_exact = Ts + G / k_i * (H0 - z)
    # base must be cold (verifies we are in the test-K regime)
    Tm_base = float(EC.melting_temperature(EC.pressure(jnp.asarray(H0))))
    assert T_exact[0] < Tm_base
    # interior profile within 0.5 K of the exact steady solution
    err = np.max(np.abs(T - T_exact)[in_ice])
    assert err < 0.5
    # melt-free
    assert float(jnp.max(jnp.abs(state.basal_melt_rate))) < 1e-14


def test_K_bedrock_gradient():
    """BTU steady state: linear bedrock profile carrying exactly G."""
    grid = Grid(Mx=3, My=3, Lx=10e3, Ly=10e3, Mz=11, Lz=1000.0,
                Mbz=11, Lbz=1000.0)
    cfg = Config({})
    btu = btu_from_config(grid, cfg)
    k_b = cfg.get_number("energy.bedrock_thermal.conductivity")
    G = 0.05
    T_top = jnp.full(grid.shape2, 260.0)
    Gf = jnp.full(grid.shape2, G)
    bed_T = btu.init_temperature(T_top, Gf)
    dt = 2000.0 * SPY
    for _ in range(200):
        bed_T, flux = btu.step(bed_T, T_top, Gf, dt)
    # top flux equals geothermal at steady state
    assert float(flux[1, 1]) == pytest.approx(G, rel=1e-3)
    # bottom-to-top temperature difference = G * Lbz / k_b
    dT = float(bed_T[1, 1, 0] - bed_T[1, 1, -1])
    assert dT == pytest.approx(G * 1000.0 / k_b, rel=1e-3)
