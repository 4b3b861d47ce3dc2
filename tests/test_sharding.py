"""Mesh-shape invariance: the analog of PISM's "same answer under
mpiexec -n 1..4" regression runs (SURVEY.md §4). A jitted SIA step over a
sharded state on a 2x4 CPU device mesh must match the single-device result;
the manual ppermute halo library must match the GSPMD path bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.model.icemodel import IceModel
from pism_tpu.coupler.surface import Uniform
from pism_tpu.parallel.mesh import make_mesh, shard_state, sharding2d
from pism_tpu.parallel import halo
from pism_tpu.ops import stencils as st
from pism_tpu.verification import halfar

SPY = 3.15569259747e7


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return d


def _setup(Mx=64):
    sol = halfar.test_B()
    grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
    cfg = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "energy.model": "none",
    })
    H0 = sol.thickness(sol.t0, grid.radius)
    state = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))
    return sol, grid, state, model


def test_sharded_run_matches_single_device(devices):
    sol, grid, state, model = _setup()

    s1, t1, _ = model.step_once(state, sol.t0, 20 * SPY)

    mesh = make_mesh(devices, shape=(2, 4))
    state_sh = shard_state(state, mesh)
    s8, t8, _ = model.step_once(state_sh, sol.t0, 20 * SPY)

    a = np.asarray(s1.geometry.ice_thickness)
    b = np.asarray(s8.geometry.ice_thickness)
    assert t1 == t8
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


def test_halo_pad_matches_shift(devices, rng):
    """Manual ppermute halo exchange reproduces clamped/periodic shifts."""
    mesh = make_mesh(devices, shape=(2, 4))
    a = jnp.asarray(rng.normal(size=(16, 32)))

    for periodic in [(False, False), (True, True)]:
        def local_id(p):
            return halo.crop(p, 1)

        fn = halo.stencil_shard_map(local_id, mesh, width=1, periodic=periodic)
        np.testing.assert_allclose(np.asarray(fn(a)), np.asarray(a), atol=0)

        # a 4-neighbor stencil through the halo path vs the global path
        def lap_local(p):
            return (p[2:, 1:-1] + p[:-2, 1:-1] + p[1:-1, 2:] + p[1:-1, :-2]
                    - 4.0 * p[1:-1, 1:-1])

        fn = halo.stencil_shard_map(lap_local, mesh, width=1, periodic=periodic)
        got = np.asarray(fn(a))

        py, px = periodic
        ref = (st.shift(a, 1, 0, py, px) + st.shift(a, -1, 0, py, px)
               + st.shift(a, 0, 1, py, px) + st.shift(a, 0, -1, py, px) - 4.0 * a)
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-12)


def test_mesh_factorization():
    from pism_tpu.parallel.mesh import best_factorization
    assert best_factorization(8) == (2, 4)
    assert best_factorization(16) == (4, 4)
    assert best_factorization(7) == (1, 7)
