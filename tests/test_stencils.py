import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu.grid import Grid
from pism_tpu.ops import stencils as st
from pism_tpu.ops.stencils import Shifter


def test_shift_clamped(rng):
    a = jnp.asarray(rng.normal(size=(5, 7)))
    b = st.shift(a, 0, 1)
    assert np.allclose(b[:, :-1], a[:, 1:])
    assert np.allclose(b[:, -1], a[:, -1])  # edge clamp
    c = st.shift(a, -1, 0)
    assert np.allclose(c[1:, :], a[:-1, :])
    assert np.allclose(c[0, :], a[0, :])


def test_shift_periodic(rng):
    a = jnp.asarray(rng.normal(size=(5, 7)))
    b = st.shift(a, 0, 2, periodic_x=True)
    assert np.allclose(b, np.roll(a, -2, axis=1))
    c = st.shift(a, -1, 0, periodic_y=True)
    assert np.allclose(c, np.roll(a, 1, axis=0))


def test_divergence_telescopes_to_boundary(rng):
    """Interior divergence of any staggered flux sums to the boundary flux
    (discrete divergence theorem) - the conservation property mass transport
    relies on."""
    grid = Grid(Mx=8, My=6, Lx=7e3 / 2, Ly=5e3 / 2)
    sh = Shifter(grid)
    QE = jnp.asarray(rng.normal(size=(6, 8)))
    QN = jnp.asarray(rng.normal(size=(6, 8)))
    # zero fluxes on the domain-boundary faces
    QE = QE.at[:, -1].set(0.0).at[:, 0].set(0.0)
    QN = QN.at[-1, :].set(0.0).at[0, :].set(0.0)
    div = st.div_staggered(QE, QN, grid.dx, grid.dy, sh)
    # with all boundary faces zero, total divergence telescopes to zero
    total = float(jnp.sum(div) * grid.dx * grid.dy)
    assert total == pytest.approx(0.0, abs=1e-6)


def test_gradients_linear_field_exact():
    grid = Grid(Mx=12, My=10, Lx=11e3 / 2, Ly=9e3 / 2)
    sh = Shifter(grid)
    X, Y = np.meshgrid(grid.x, grid.y)
    s = jnp.asarray(2.0 * X + 3.0 * Y)
    gx = st.grad_x_east(s, grid.dx, sh)
    gy = st.grad_y_east(s, grid.dy, sh)
    # interior faces exact
    assert np.allclose(gx[:, :-1], 2.0)
    assert np.allclose(gy[1:-1, :-1], 3.0)
    cx, cy = st.centered_grad(s, grid.dx, grid.dy, sh)
    assert np.allclose(cx[:, 1:-1], 2.0)
    assert np.allclose(cy[1:-1, :], 3.0)


def test_upwind_selects_donor():
    sh = Shifter(Grid(Mx=4, My=3, Lx=1.5e3, Ly=1e3))
    a = jnp.asarray([[1.0, 2.0, 3.0, 4.0]] * 3)
    u_pos = jnp.ones_like(a)
    u_neg = -jnp.ones_like(a)
    assert np.allclose(st.upwind_flux_east(u_pos, a, sh), a)
    assert np.allclose(st.upwind_flux_east(u_neg, a, sh)[:, :-1], -a[:, 1:])
