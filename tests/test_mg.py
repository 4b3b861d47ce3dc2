"""Geometric-multigrid preconditioner tests (ops/mg.py)."""

import numpy as np
import jax.numpy as jnp

from pism_tpu import Grid
from pism_tpu.ops import mg, ssa as ssa_ops
from pism_tpu.ops.stencils import Shifter


def _problem(My=48, Mx=40, seed=0):
    """SSA-like variable-coefficient SPD system on a non-periodic grid."""
    rng = np.random.default_rng(seed)
    grid = Grid(Mx=Mx, My=My, Lx=400e3, Ly=480e3)
    sh = Shifter(grid)
    dx, dy = grid.dx, grid.dy
    # nuH spanning three decades, smooth + rough component
    y, x = np.meshgrid(np.linspace(0, 1, My), np.linspace(0, 1, Mx),
                       indexing="ij")
    lognu = 15.0 + 1.5 * np.sin(3 * x) * np.cos(2 * y) \
        + 0.5 * rng.standard_normal((My, Mx))
    nu_c = jnp.asarray(10.0 ** lognu)
    nuH = ssa_ops.NuH(e=0.5 * (nu_c + sh(nu_c, 0, 1)),
                      n=0.5 * (nu_c + sh(nu_c, 1, 0)))
    beta = jnp.asarray(10.0 ** (3.0 + 2.0 * rng.random((My, Mx))))
    bc = np.zeros((My, Mx), bool)
    bc[0, :] = bc[-1, :] = bc[:, 0] = bc[:, -1] = True
    bc = jnp.asarray(bc)
    bu = jnp.asarray(rng.standard_normal((My, Mx)) * 1e2)
    bv = jnp.asarray(rng.standard_normal((My, Mx)) * 1e2)
    bu = jnp.where(bc, 0.0, bu)
    bv = jnp.where(bc, 0.0, bv)

    def matvec(xp):
        Au, Av = ssa_ops.apply_operator(
            jnp.where(bc, 0.0, xp[0]), jnp.where(bc, 0.0, xp[1]),
            nuH, beta, dx, dy, sh)
        return (jnp.where(bc, xp[0], Au), jnp.where(bc, xp[1], Av))

    return grid, sh, nuH, beta, bc, (bu, bv), matvec, dx, dy


def test_vcycle_beats_jacobi():
    grid, sh, nuH, beta, bc, b, matvec, dx, dy = _problem()
    zero = (jnp.zeros_like(b[0]), jnp.zeros_like(b[1]))

    du, dv = ssa_ops.operator_diagonal(nuH, beta, dx, dy, sh)
    du = jnp.where(bc, 1.0, jnp.maximum(du, 1e-12))
    dv = jnp.where(bc, 1.0, jnp.maximum(dv, 1e-12))
    _, it_jac, r2_jac = ssa_ops.bicgstab_solve(
        matvec, b, zero, lambda r: (r[0] / du, r[1] / dv),
        rtol=1e-8, max_iter=400)

    pre = mg.make_preconditioner(nuH, beta, bc, dx, dy, sh)
    x_mg, it_mg, r2_mg = ssa_ops.bicgstab_solve(
        matvec, b, zero, pre, rtol=1e-8, max_iter=400)

    bb = float(jnp.sum(b[0] ** 2) + jnp.sum(b[1] ** 2))
    assert float(r2_mg) <= 1e-16 * bb
    # MG cuts the iteration count by a large factor on this 3-decade
    # coefficient contrast (the whole point of the hierarchy)
    assert int(it_mg) * 3 < int(it_jac)

    # and the solution really solves the system
    Ax = matvec(x_mg)
    res = float(jnp.sum((Ax[0] - b[0]) ** 2 + (Ax[1] - b[1]) ** 2))
    bb = float(jnp.sum(b[0] ** 2 + b[1] ** 2))
    assert res < 1e-14 * bb


def test_restrict_prolong_shapes():
    a = jnp.asarray(np.arange(35.0).reshape(7, 5))
    r = mg._restrict(a)
    assert r.shape == (4, 3)
    p = mg._prolong(r, (7, 5))
    assert p.shape == (7, 5)
    # constant fields are preserved exactly by both transfers
    c = jnp.ones((7, 5))
    np.testing.assert_allclose(np.asarray(mg._prolong(mg._restrict(c), (7, 5))),
                               1.0)


def test_linemg_preconditioner_solves_and_beats_line():
    """The V(1,1) cycle with the alternating-direction line smoother
    (``preconditioner = linemg``) solves the variable-coefficient system
    and needs no more Krylov iterations than the plain line
    preconditioner (the coarse correction adds the global coupling line
    relaxation lacks)."""
    grid, sh, nuH, beta, bc, b, matvec, dx, dy = _problem()
    zero = (jnp.zeros(grid.shape2), jnp.zeros(grid.shape2))

    pre_line = ssa_ops.make_line_preconditioner(nuH, beta, bc, dx, dy, sh)
    _, it_line, _ = ssa_ops.bicgstab_solve(
        matvec, b, zero, pre_line, rtol=1e-8, max_iter=400)

    pre = mg.make_preconditioner(nuH, beta, bc, dx, dy, sh,
                                 smoother="line", pre=1, post=1,
                                 coarse_sweeps=4)
    x, it, r2 = ssa_ops.bicgstab_solve(
        matvec, b, zero, pre, rtol=1e-8, max_iter=400)

    bb = float(jnp.sum(b[0] ** 2) + jnp.sum(b[1] ** 2))
    assert float(r2) <= 1e-16 * bb
    assert int(it) <= int(it_line)
    Ax = matvec(x)
    res = float(jnp.sum((Ax[0] - b[0]) ** 2 + (Ax[1] - b[1]) ** 2))
    assert res < 1e-14 * bb
