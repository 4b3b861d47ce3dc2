"""Verification against exact isothermal-SIA similarity solutions
(PISM ``pismv`` tests B and C; tolerances comparable to PISM's
``test/vfnow.py`` expectations)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState
from pism_tpu.model.icemodel import IceModel
from pism_tpu.coupler.surface import Uniform, FunctionSurface
from pism_tpu.state import new_geometry
from pism_tpu.verification import halfar

SPY = 3.15569259747e7


def _config(method="mahaffy"):
    return Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "stress_balance.sia.surface_gradient_method": method,
        "energy.model": "none",
    })


def _run_B(Mx, years=1000.0):
    sol = halfar.test_B()
    t0, t_end = sol.t0, sol.t0 + years * SPY
    grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
    H0 = sol.thickness(t0, grid.radius)
    state = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=_config(), surface=Uniform(smb=0.0))
    state, tf, stats = model.step_once(state, t0, t_end - t0)
    He = sol.thickness(t_end, grid.radius)
    return halfar.error_norms(np.asarray(state.geometry.ice_thickness), He), stats


def test_B_halfar_accuracy():
    errs, stats = _run_B(61)
    assert int(stats.nsteps) > 100          # adaptive dt active
    assert errs["dome_H"] < 5.0             # meters, on a 3000 m dome
    assert errs["avg_H"] < 15.0
    assert errs["max_H"] < 400.0            # margin-dominated


def test_B_convergence_under_refinement():
    coarse, _ = _run_B(31)
    fine, _ = _run_B(61)
    assert fine["avg_H"] < 0.7 * coarse["avg_H"]
    assert fine["dome_H"] < 0.7 * coarse["dome_H"]


def test_C_growing_dome():
    sol = halfar.test_C()
    t_start, t_end = 0.6 * sol.t0, sol.t0
    grid = Grid(Mx=61, My=61, Lx=900e3, Ly=900e3)
    H0 = sol.thickness(t_start, grid.radius)
    state = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2)))

    def smb(geometry, t):
        m = sol.lam / t * geometry.ice_thickness
        return m, jnp.full(geometry.ice_thickness.shape, 263.15)

    model = IceModel(grid=grid, config=_config(), surface=FunctionSurface(smb))
    state, tf, stats = model.step_once(state, t_start, t_end - t_start)
    He = sol.thickness(t_end, grid.radius)
    errs = halfar.error_norms(np.asarray(state.geometry.ice_thickness), He)
    assert errs["dome_H"] < 40.0
    assert errs["avg_H"] < 30.0


def test_mass_conservation_exact():
    """Zero SMB => the flux-form update conserves volume to roundoff."""
    sol = halfar.test_B()
    grid = Grid(Mx=41, My=41, Lx=900e3, Ly=900e3)
    H0 = sol.thickness(sol.t0, grid.radius)
    state = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=_config(), surface=Uniform(smb=0.0))
    V0 = float(jnp.sum(state.geometry.ice_thickness))
    state, _, stats = model.step_once(state, sol.t0, 200 * SPY)
    V1 = float(jnp.sum(state.geometry.ice_thickness))
    assert abs(V1 - V0) / V0 < 1e-12
    assert float(stats.sum_nonneg) == 0.0


def test_restart_bit_stable():
    """Run 2 segments vs 1 segment of twice the length: identical bits
    (PISM's restart-exactness regression; SURVEY.md §4)."""
    sol = halfar.test_B()
    grid = Grid(Mx=31, My=31, Lx=900e3, Ly=900e3)
    H0 = sol.thickness(sol.t0, grid.radius)
    state0 = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=_config(), surface=Uniform(smb=0.0))

    # run A: two 50-year segments, state stays on device
    sA, tA, _ = model.step_once(state0, sol.t0, 50 * SPY)
    sA, tA, _ = model.step_once(sA, tA, sol.t0 + 100 * SPY - tA)

    # run B: same segments, but the state round-trips through host numpy
    # between them (the checkpoint/restart analog)
    sB, tB, _ = model.step_once(state0, sol.t0, 50 * SPY)
    sB = ModelState(geometry=new_geometry(
        jnp.asarray(np.asarray(sB.geometry.ice_thickness)),
        jnp.asarray(np.asarray(sB.geometry.bed_elevation))))
    sB, tB2, _ = model.step_once(sB, tB, sol.t0 + 100 * SPY - tB)

    a = np.asarray(sA.geometry.ice_thickness)
    b = np.asarray(sB.geometry.ice_thickness)
    np.testing.assert_array_equal(a, b)
