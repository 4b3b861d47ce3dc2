"""Ensemble (vmapped member axis) tests: BASELINE config #5 in miniature."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.coupler.surface import FunctionSurface
from pism_tpu.model.icemodel import IceModel
from pism_tpu.parallel.ensemble import EnsembleRunner, broadcast_state, stack_states
from pism_tpu.parallel.mesh import make_mesh
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.verification import halfar

SPY = 3.15569259747e7


def test_ensemble_members_diverge():
    """Three members with different SMB scalings evolve differently, in one
    vmapped program."""
    sol = halfar.test_B()
    grid = Grid(Mx=31, My=31, Lx=900e3, Ly=900e3)
    cfg = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "energy.model": "none",
    })
    H0 = jnp.asarray(sol.thickness(sol.t0, grid.radius))

    scales = jnp.asarray([0.0, 1.0, 2.0])

    def smb(geometry, t):
        # the per-member parameter rides in on the (otherwise unused here)
        # Href field, so vmap maps over it with the rest of the state
        scale = geometry.ice_area_specific_volume[0, 0]
        m = scale * 0.3 / SPY * jnp.ones_like(geometry.ice_thickness)
        return m, jnp.full(geometry.ice_thickness.shape, 253.15)

    model = IceModel(grid=grid, config=cfg, surface=FunctionSurface(smb))

    members = []
    for s in [0.0, 1.0, 2.0]:
        g = new_geometry(H0, jnp.zeros(grid.shape2),
                         Href=jnp.full(grid.shape2, s))
        members.append(model.prepare_state(ModelState(geometry=g)))
    batched = stack_states(members)

    runner = EnsembleRunner(model=model)
    out, stats = runner.run_segment(batched, sol.t0, sol.t0 + 50 * SPY)

    V = np.asarray(jnp.sum(out.geometry.ice_thickness, axis=(1, 2)))
    assert V[2] > V[1] > V[0]              # more accumulation, more volume
    assert int(stats.nsteps[0]) >= 1
    # member 0 (zero SMB) conserves volume exactly
    V0_init = float(jnp.sum(H0))
    assert abs(V[0] - V0_init) / V0_init < 1e-12


def test_ensemble_sharded_over_mesh():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    sol = halfar.test_B()
    grid = Grid(Mx=16, My=16, Lx=900e3, Ly=900e3)
    cfg = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "energy.model": "none",
    })
    from pism_tpu.coupler.surface import Uniform
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))
    H0 = jnp.asarray(sol.thickness(sol.t0, grid.radius))
    base = model.prepare_state(
        ModelState(geometry=new_geometry(H0, jnp.zeros(grid.shape2))))
    batched = broadcast_state(base, 8)

    mesh = make_mesh(devices, ensemble=8)   # pure ensemble axis
    runner = EnsembleRunner(model=model)
    sharded = runner.shard(batched, mesh)
    out, stats = runner.run_segment(sharded, sol.t0, sol.t0 + 20 * SPY)
    H = np.asarray(out.geometry.ice_thickness)
    assert H.shape[0] == 8
    # identical members stay identical
    np.testing.assert_array_equal(H[0], H[7])
