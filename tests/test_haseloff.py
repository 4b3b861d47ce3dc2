"""Haseloff margin-treatment test: ice must not be pushed uphill onto
ice-free bedrock walls (the failure mode the scheme exists for)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.coupler.surface import Uniform
from pism_tpu.model.icemodel import IceModel
from pism_tpu.ops import sia as sia_ops
from pism_tpu.ops.stencils import Shifter
from pism_tpu.physics.rheology import IsothermalGlen
from pism_tpu.state import ModelState, new_geometry

SPY = 3.15569259747e7


def _wall_setup():
    """Thick ice sitting against a higher ice-free bedrock ridge."""
    grid = Grid(Mx=20, My=10, Lx=100e3, Ly=50e3)
    bed = np.zeros(grid.shape2)
    bed[:, 12:] = 2500.0           # bedrock wall, higher than the ice surface
    H = np.zeros(grid.shape2)
    H[:, :12] = 2000.0
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))
    return grid, geom


def test_wall_gradient_zeroed():
    grid, geom = _wall_setup()
    sh = Shifter(grid)
    g_mah = sia_ops.surface_gradient(geom, grid, sh, "mahaffy")
    g_has = sia_ops.surface_gradient(geom, grid, sh, "haseloff")
    # mahaffy sees a big positive surface step at the wall face (column 11)
    assert float(g_mah.sx_e[5, 11]) > 0.01
    # haseloff zeroes the across-face gradient there
    assert float(g_has.sx_e[5, 11]) == 0.0
    # away from margins the schemes agree exactly
    np.testing.assert_allclose(np.asarray(g_has.sx_e[:, :10]),
                               np.asarray(g_mah.sx_e[:, :10]))


def test_no_flow_up_the_wall():
    grid, geom = _wall_setup()
    cfg_h = Config({"stress_balance.model": "sia",
                    "stress_balance.sia.flow_law": "isothermal_glen",
                    "stress_balance.sia.surface_gradient_method": "haseloff",
                    "energy.model": "none"})
    model = IceModel(grid=grid, config=cfg_h, surface=Uniform(smb=0.0))
    state = ModelState(geometry=geom)
    out, t, _ = model.step_once(state, 0.0, 50 * SPY)
    H1 = np.asarray(out.geometry.ice_thickness)
    # no ice deposited on the high bedrock
    assert H1[:, 13:].max() == 0.0
    # with plain mahaffy, the spurious wall gradient drives ice onto the
    # ridge via the diffusive flux
    cfg_m = Config({"stress_balance.model": "sia",
                    "stress_balance.sia.flow_law": "isothermal_glen",
                    "stress_balance.sia.surface_gradient_method": "mahaffy",
                    "energy.model": "none"})
    model_m = IceModel(grid=grid, config=cfg_m, surface=Uniform(smb=0.0))
    out_m, _, _ = model_m.step_once(state, 0.0, 50 * SPY)
    Hm = np.asarray(out_m.geometry.ice_thickness)
    assert Hm[:, 12].max() >= H1[:, 12].max()  # haseloff moves no more ice in
