"""SSAFEM (Q1 Galerkin SSA) tests: exact Schoof stream, FD cross-check,
full-model integration. PISM-analog: ``ssa_testi -ssa_method fem`` and the
SSAFD/SSAFEM consistency checks."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.model.ssa import SSAFD
from pism_tpu.model.ssafem import SSAFEM
from pism_tpu.physics.rheology import IsothermalGlen
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.verification.ssa_exact import ExactI

SPY = 3.15569259747e7


def _test_I_problem(My, Mx=11):
    ti = ExactI()
    grid = Grid(Mx=Mx, My=My, Lx=10e3, Ly=60e3, periodicity="x")
    tau_c = jnp.asarray(np.tile(ti.tau_c(grid.y)[:, None], (1, Mx)))
    law = IsothermalGlen(A=float(ti.B) ** -3.0)
    geom = new_geometry(jnp.full(grid.shape2, ti.H0), jnp.zeros(grid.shape2))
    state = ModelState(geometry=geom)
    bc = np.zeros(grid.shape2, bool)
    bc[0, :] = bc[-1, :] = True
    # discretization error (~1% at My=61) dominates: a loose Newton rtol
    # keeps the test cheap without touching the asserted accuracy
    cfg = Config({"stress_balance.ssa.fd.newton_rtol": 3e-5})
    kw = dict(grid=grid, config=cfg, flow_law=law,
              bc_mask=jnp.asarray(bc),
              bc_u=jnp.zeros(grid.shape2), bc_v=jnp.zeros(grid.shape2),
              taud_x=jnp.full(grid.shape2, ti.f),
              taud_y=jnp.zeros(grid.shape2))
    return ti, grid, state, tau_c, kw


def test_fem_I_exact_stream():
    ti, grid, state, tau_c, kw = _test_I_problem(31)
    ssa = SSAFEM(**kw)
    u, v = jax.jit(lambda s: ssa.solve(s, tau_c))(state)
    u = np.asarray(u)
    err = np.abs(u[:, 5] - ti.velocity(grid.y)).max() * SPY
    assert err < 40.0                             # m/a on a ~780 m/a stream
    assert np.abs(np.asarray(v)).max() * SPY < 0.01


@pytest.mark.slow
def test_fem_I_convergence():
    errs = []
    for My in (31, 61):
        ti, grid, state, tau_c, kw = _test_I_problem(My)
        u, v = jax.jit(lambda s: SSAFEM(**kw).solve(s, tau_c))(state)
        errs.append(np.abs(np.asarray(u)[:, 5]
                           - ti.velocity(grid.y)).max() * SPY)
    assert errs[1] < 12.0
    assert errs[1] < 0.45 * errs[0]               # ~O(h^2)


def test_fem_matches_fd():
    """FD and FEM discretize the same PDE: centerline velocities agree to
    within their (larger, FEM) discretization error."""
    ti, grid, state, tau_c, kw = _test_I_problem(31)
    u_fd, _ = jax.jit(lambda s: SSAFD(**kw).solve(s, tau_c))(state)
    u_fe, _ = jax.jit(lambda s: SSAFEM(**kw).solve(s, tau_c))(state)
    u_fd, u_fe = np.asarray(u_fd), np.asarray(u_fe)
    rel = np.abs(u_fe[:, 5] - u_fd[:, 5]).max() / np.abs(u_fd).max()
    # both schemes carry O(h^2) error at My=31 (~4% FEM, ~2% FD); the
    # slow-marked convergence test pins the rate
    assert rel < 0.08


def test_fem_in_icemodel():
    """stress_balance.ssa.method = fem drives the full model: a short
    hybrid run on a synthetic grounded stream stays finite and produces
    sliding."""
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.coupler.surface import Uniform

    grid = Grid(Mx=24, My=24, Lx=100e3, Ly=100e3, Mz=5, Lz=4000.0)
    cfg = Config({
        "stress_balance.model": "ssa+sia",
        "stress_balance.ssa.method": "fem",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "stress_balance.ssa.flow_law": "isothermal_glen",
        "energy.model": "none",
        "basal_yield_stress.model": "constant",
        "basal_yield_stress.constant.value": 20e3,
    })
    r = jnp.asarray(grid.radius)
    H = jnp.maximum(2500.0 * (1.0 - (r / 90e3) ** 2), 0.0)
    geom = new_geometry(H, jnp.zeros(grid.shape2))
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.1 / SPY))
    assert isinstance(model.ssa, SSAFEM)   # factory honored ssa.method=fem
    state = model.prepare_state(ModelState(geometry=geom))
    sb = model.stress_balance.update(state,
                                     model.yield_stress.compute(state))
    speed = np.sqrt(np.asarray(sb.u_ssa) ** 2 + np.asarray(sb.v_ssa) ** 2)
    assert np.isfinite(speed).all()
    assert np.isfinite(np.asarray(sb.qe)).all()
    assert speed.max() * SPY > 0.5   # the dome actually slides
