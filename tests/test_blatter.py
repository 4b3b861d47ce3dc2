"""Blatter-Pattyn solver tests against analytic limits.

- SIA limit: periodic inclined slab with no slip -> Glen shear profile
  u(z) = (A/2) (rho g sin a)^n [H^(n+1) - (H-z)^(n+1)]   (n = 3)
- SSA limit: same slab on a plastic bed with weak till -> plug flow with
  tau_b = tau_d, uniform u over depth.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.model.blatter import BlatterSolver
from pism_tpu.physics.rheology import IsothermalGlen
from pism_tpu.state import ModelState, new_geometry

SPY = 3.15569259747e7
A = 1e-16 / SPY
RHO, G = 910.0, 9.81


def _slab(Mz=25, H0=1000.0):
    grid = Grid(Mx=8, My=8, Lx=40e3, Ly=40e3, Mz=Mz, Lz=H0,
                vertical_spacing="equal", periodicity="xy")
    geom = new_geometry(jnp.full(grid.shape2, H0), jnp.zeros(grid.shape2))
    return grid, ModelState(geometry=geom)


def test_sia_limit_shear_profile():
    """No-slip slab: Blatter reproduces the analytic Glen shear profile."""
    H0, slope = 1000.0, 0.02
    grid, state = _slab(Mz=25, H0=H0)
    cfg = Config({"basal_resistance.plastic.regularization": 1e-4})  # m/a
    law = IsothermalGlen(A=A)
    taud = RHO * G * H0 * slope
    solver = BlatterSolver(grid=grid, config=cfg, flow_law=law,
                           taud_x=jnp.full(grid.shape2, taud),
                           taud_y=jnp.zeros(grid.shape2))
    tau_c = jnp.full(grid.shape2, 1e8)  # effectively no slip
    u, v, info = solver.solve(state, tau_c, diagnostics=True)

    z = np.asarray(grid.z)
    exact = (A / 2.0) * (RHO * G * slope) ** 3 * (H0 ** 4 - (H0 - z) ** 4)
    got = np.asarray(u)[4, 4]
    # surface velocity within a few % (first-order FD in z; no-slip via
    # large tau_c is approximate)
    assert got[-1] * SPY == pytest.approx(exact[-1] * SPY, rel=0.08)
    # profile shape: monotone increasing, near-zero at the bed
    assert got[0] * SPY < 0.05 * got[-1] * SPY
    assert np.all(np.diff(got) >= -1e-12)
    # mid-depth value
    assert got[12] * SPY == pytest.approx(exact[12] * SPY, rel=0.12)
    assert float(jnp.abs(v).max()) * SPY < 1e-3


def test_ssa_limit_plug_flow():
    """Weak plastic bed: plug flow, tau_b ~ tau_d, u uniform over depth."""
    H0, slope = 1000.0, 0.002
    grid, state = _slab(Mz=15, H0=H0)
    cfg = Config()
    law = IsothermalGlen(A=A)
    taud = RHO * G * H0 * slope
    # plastic till with tau_c < tau_d has no static balance on a periodic
    # slab; use the regularized-plastic "linear at u_reg" property instead:
    # tau_b = tau_c u / sqrt(u^2 + u_reg^2) -> equilibrium at
    # u = u_reg * tau_d / sqrt(tau_c^2 - tau_d^2)
    tau_c_val = 2.0 * taud
    u_reg = 100.0 / SPY
    cfg.update({"basal_resistance.plastic.regularization": 100.0})  # m/a
    solver = BlatterSolver(grid=grid, config=cfg, flow_law=law,
                           taud_x=jnp.full(grid.shape2, taud),
                           taud_y=jnp.zeros(grid.shape2))
    tau_c = jnp.full(grid.shape2, tau_c_val)
    u, v, info = solver.solve(state, tau_c, diagnostics=True)
    got = np.asarray(u)[4, 4]
    u_expect = u_reg * taud / np.sqrt(tau_c_val ** 2 - taud ** 2)
    assert got[0] * SPY == pytest.approx(u_expect * SPY, rel=0.05)
    # plug flow: tiny shear over depth (slides >> deforms)
    assert (got[-1] - got[0]) / got[0] < 0.25
