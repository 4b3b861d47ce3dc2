"""Schoof (2003) bed smoother: smoothing, moments, theta, SIA wiring.

PISM-analog: ``src/stressbalance/sia/tests`` exercise BedSmoother through
SIAFD; here the component is tested directly plus through StressBalance.
"""

import numpy as np
import jax.numpy as jnp

from pism_tpu import Config, Grid
from pism_tpu.ops import bedsmoother as bsm
from pism_tpu.ops import sia as sia_ops
from pism_tpu.ops.stencils import Shifter
from pism_tpu.physics.rheology import IsothermalGlen
from pism_tpu.state import new_geometry
from pism_tpu.verification import halfar


def _grid():
    return Grid(Mx=64, My=64, Lx=400e3, Ly=400e3)


def test_flat_bed_identity():
    grid = _grid()
    bed = jnp.full(grid.shape2, 100.0)
    sm = bsm.preprocess_bed(bed, grid.dx, grid.dy, 50e3)
    np.testing.assert_allclose(np.asarray(sm.bed), 100.0, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sm.C2), 0.0, atol=1e-9)
    th = bsm.theta(sm, jnp.full(grid.shape2, 1000.0))
    np.testing.assert_allclose(np.asarray(th), 1.0, rtol=1e-12)


def test_linear_bed_interior_identity():
    """A resolved constant slope has no unresolved roughness: b_s = b and
    theta = 1 away from the (shrunken-window) domain edges."""
    grid = _grid()
    x = jnp.asarray(grid.x)[None, :] * jnp.ones((grid.My, 1))
    bed = 1e-3 * x
    sm = bsm.preprocess_bed(bed, grid.dx, grid.dy, 3 * grid.dx)
    inner = (slice(6, -6), slice(6, -6))
    np.testing.assert_allclose(np.asarray(sm.bed[inner]),
                               np.asarray(bed[inner]), atol=1e-6)
    th = bsm.theta(sm, jnp.full(grid.shape2, 1000.0))
    np.testing.assert_allclose(np.asarray(th[inner]), 1.0, atol=1e-6)


def test_rough_bed_reduces_theta():
    """Sub-window sinusoidal bumps: <b~> ~ 0, C2 ~ amp^2/2, theta < 1 and
    decreasing with bump amplitude; thin ice shuts the flux off."""
    grid = _grid()
    x = jnp.asarray(grid.x)[None, :] * jnp.ones((grid.My, 1))
    for amp, lo, hi in [(50.0, 0.85, 0.999), (200.0, 0.2, 0.96)]:
        bed = amp * jnp.sin(2 * np.pi * x / (4 * grid.dx))
        sm = bsm.preprocess_bed(bed, grid.dx, grid.dy, 8 * grid.dx)
        inner = (slice(12, -12), slice(12, -12))
        np.testing.assert_allclose(np.asarray(sm.bed[inner]), 0.0, atol=amp * 0.15)
        np.testing.assert_allclose(np.asarray(sm.C2[inner]), amp ** 2 / 2,
                                   rtol=0.25)
        th = np.asarray(bsm.theta(sm, jnp.full(grid.shape2, 1000.0)))[inner]
        assert lo < th.mean() < hi, (amp, th.mean())
        th_thin = np.asarray(bsm.theta(sm, jnp.full(grid.shape2, amp)))[inner]
        assert th_thin.mean() < th.mean()


def test_stressbalance_wiring_flat_vs_rough():
    """Through StressBalance, holding the ICE SURFACE fixed (ice fills the
    bumps): the smoothed-bed thickness then equals the flat-bed thickness,
    so the rough-bed flux is the flat-bed flux scaled by theta < 1. A flat
    bed with the smoother on matches the smoother off exactly."""
    from pism_tpu.model.stressbalance import StressBalance
    from pism_tpu.state import ModelState

    grid = Grid(Mx=61, My=61, Lx=900e3, Ly=900e3)
    sol = halfar.test_B()
    H0 = jnp.asarray(sol.thickness(sol.t0, grid.radius))
    surf = H0  # flat zero bed: s = H0

    def run(bed, rng):
        cfg = Config({"stress_balance.sia.bed_smoother.range": rng,
                      "stress_balance.sia.flow_law": "isothermal_glen",
                      "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS})
        law = IsothermalGlen(A=halfar.A_SOFTNESS)
        sb = StressBalance(grid=grid, config=cfg, sia_flow_law=law,
                           model="sia")
        H = jnp.maximum(surf - bed, 0.0)  # same surface, ice fills bumps
        geom = new_geometry(H, bed)
        res = sb.update(ModelState(geometry=geom))
        return np.abs(np.asarray(res.qe)).sum()

    flat = jnp.zeros(grid.shape2)
    x = jnp.asarray(grid.x)[None, :] * jnp.ones((grid.My, 1))
    rough = 150.0 * jnp.sin(2 * np.pi * x / (3 * grid.dx))

    q_flat_off = run(flat, 0.0)
    q_flat_on = run(flat, 5e3)
    q_rough_on = run(rough, 5e3)
    assert q_flat_on == q_flat_off
    assert q_rough_on < 0.98 * q_flat_on
