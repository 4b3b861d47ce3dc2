"""Inverse toolkit tests: adjoint gradient correctness (vs finite
differences) and a twin experiment recovering basal yield stress."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.model.ssa import SSAFD
from pism_tpu.physics.rheology import IsothermalGlen
from pism_tpu.inverse.ssa_inverse import TaucInversion, make_differentiable_solve

SPY = 3.15569259747e7


@pytest.fixture(scope="module")
def stream_problem():
    """Small plastic-till stream: uniform thickness, prescribed driving
    stress, Dirichlet side walls (test-I-like geometry)."""
    My, Mx = 24, 8
    grid = Grid(Mx=Mx, My=My, Lx=8e3, Ly=48e3, periodicity="x")
    cfg = Config()
    law = IsothermalGlen(A=(3.7e8) ** -3.0)
    geom = new_geometry(jnp.full(grid.shape2, 2000.0), jnp.zeros(grid.shape2))
    state = ModelState(geometry=geom)
    bc = np.zeros(grid.shape2, bool)
    bc[0, :] = bc[-1, :] = True
    f = 910.0 * 9.81 * 2000.0 * 0.001
    ssa = SSAFD(grid=grid, config=cfg, flow_law=law,
                bc_mask=jnp.asarray(bc),
                bc_u=jnp.zeros(grid.shape2), bc_v=jnp.zeros(grid.shape2),
                taud_x=jnp.full(grid.shape2, f),
                taud_y=jnp.zeros(grid.shape2))
    # "true" till: weak channel in the middle, strong margins
    y = grid.y
    tau_true = 0.6 * f + 1.2 * f * (np.abs(y) / 40e3) ** 4
    tau_true = jnp.asarray(np.tile(tau_true[:, None], (1, Mx)))
    return grid, cfg, ssa, state, tau_true


def test_adjoint_gradient_matches_finite_difference(stream_problem):
    grid, cfg, ssa, state, tau_true = stream_problem
    u_obs, v_obs = ssa.solve(state, tau_true)
    inv = TaucInversion(ssa=ssa, state=state, u_obs=u_obs, v_obs=v_obs,
                        reg_weight=0.0)

    tau0 = jnp.full(grid.shape2, 1.0e4)
    J0, g = jax.jit(jax.value_and_grad(inv.misfit))(tau0)
    assert np.isfinite(float(J0)) and np.isfinite(np.asarray(g)).all()

    # directional finite-difference check (one jitted misfit, two evals)
    rng = np.random.default_rng(7)
    direction = jnp.asarray(rng.normal(size=grid.shape2)) * 100.0
    mis = jax.jit(inv.misfit)
    eps = 1.0
    Jp = float(mis(tau0 + eps * direction))
    Jm = float(mis(tau0 - eps * direction))
    fd = (Jp - Jm) / (2 * eps)
    ad = float(jnp.sum(g * direction))
    assert ad == pytest.approx(fd, rel=2e-2)


@pytest.mark.slow
def test_twin_experiment_recovers_weak_channel(stream_problem):
    grid, cfg, ssa, state, tau_true = stream_problem
    u_obs, v_obs = ssa.solve(state, tau_true)
    assert float(jnp.abs(u_obs).max()) * SPY > 5.0  # stream actually flows

    inv = TaucInversion(ssa=ssa, state=state, u_obs=u_obs, v_obs=v_obs,
                        reg_weight=1e-12)
    # start from a weaker-than-true till so sliding is active and the
    # misfit gradient is alive (tau_c above the driving stress is a dead
    # zone for plastic till: u ~ 0 regardless, d u/d tau_c ~ 0)
    f = 910.0 * 9.81 * 2000.0 * 0.001
    tau0 = jnp.full(grid.shape2, 0.45 * f)
    res = inv.run(tau0, iterations=10, learning_rate=0.25)

    m = np.asarray(res.misfits)
    assert m.min() < 0.25 * m[0]     # misfit reduced by > 4x

    # recovered velocities approach observations (20 Adam iterations of a
    # nonconvex problem: expect qualitative recovery, not convergence)
    du = np.abs(np.asarray(res.u) - np.asarray(u_obs)) * SPY
    assert du.max() < 0.75 * np.abs(np.asarray(u_obs)).max() * SPY

    # tau_c moves toward the truth in the fast-flowing interior (10 Adam
    # iterations: expect the right neighborhood, not convergence)
    c = grid.My // 2
    rec = float(res.tau_c[c, 4])
    true = float(tau_true[c, 4])
    start = float(tau0[c, 4])
    assert abs(rec - true) < abs(start - true) + 0.5 * true
    assert rec == pytest.approx(true, rel=0.55)


@pytest.fixture(scope="module")
def shelf_problem():
    """Confined floating shelf (no basal drag): thickness ramp, inflow
    Dirichlet BC — hardness B is the live design variable here."""
    My, Mx = 11, 31
    grid = Grid(Mx=Mx, My=My, Lx=75e3, Ly=25e3, periodicity="y")
    cfg = Config()
    law = IsothermalGlen(A=1e-25)
    Hx = np.linspace(600.0, 250.0, Mx)
    H = jnp.asarray(np.tile(Hx[None, :], (My, 1)))
    geom = new_geometry(H, jnp.full(grid.shape2, -2000.0))
    state = ModelState(geometry=geom)
    bc = np.zeros(grid.shape2, bool)
    bc[:, 0] = True
    u_in = np.zeros(grid.shape2)
    u_in[:, 0] = 150.0 / SPY
    ssa = SSAFD(grid=grid, config=cfg, flow_law=law,
                bc_mask=jnp.asarray(bc), bc_u=jnp.asarray(u_in),
                bc_v=jnp.zeros(grid.shape2))
    # "true" hardness: soft (damaged) band across the middle of the shelf
    B0 = float(law.hardness(jnp.zeros(()), jnp.zeros(())))
    Bx = np.full(Mx, B0)
    Bx[12:19] = 0.55 * B0
    B_true = jnp.asarray(np.tile(Bx[None, :], (My, 1)))
    return grid, ssa, state, B_true, B0


def test_hardness_adjoint_gradient(shelf_problem):
    """IP_SSAHardavForwardProblem analog: adjoint dJ/dB vs finite
    differences in a random direction."""
    from pism_tpu.inverse.ssa_inverse import HardnessInversion

    grid, ssa, state, B_true, B0 = shelf_problem
    u_obs, v_obs = ssa.solve(state, None, hardness=B_true)
    inv = HardnessInversion(ssa=ssa, state=state, u_obs=u_obs, v_obs=v_obs,
                            reg_weight=0.0)
    B_init = jnp.full(grid.shape2, B0)
    J0, g = jax.jit(jax.value_and_grad(inv.misfit))(B_init)
    assert np.isfinite(float(J0)) and np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(jnp.asarray(g)).max()) > 0.0

    rng = np.random.default_rng(3)
    direction = jnp.asarray(rng.normal(size=grid.shape2)) * 1e4
    mis = jax.jit(inv.misfit)
    eps = 1.0
    fd = (float(mis(B_init + eps * direction))
          - float(mis(B_init - eps * direction))) / (2 * eps)
    ad = float(jnp.sum(g * direction))
    assert ad == pytest.approx(fd, rel=2e-2)


@pytest.mark.slow
def test_hardness_twin_recovers_soft_band(shelf_problem):
    from pism_tpu.inverse.ssa_inverse import HardnessInversion

    grid, ssa, state, B_true, B0 = shelf_problem
    u_obs, v_obs = ssa.solve(state, None, hardness=B_true)
    inv = HardnessInversion(ssa=ssa, state=state, u_obs=u_obs, v_obs=v_obs,
                            reg_weight=1e-12)
    res = inv.run(jnp.full(grid.shape2, B0), iterations=12,
                  learning_rate=0.05)
    m = np.asarray(res.misfits)
    assert m.min() < 0.25 * m[0]
    # recovered hardness drops inside the soft band relative to outside
    B_rec = np.asarray(res.tau_c)
    c = grid.My // 2
    assert B_rec[c, 15] < 0.85 * B_rec[c, 4]


def test_regularization_functionals():
    """IP_*Functional family: H1 penalizes any gradient quadratically, TV
    linearly (edge-preserving), L2 damps toward the prior."""
    import numpy as np
    from pism_tpu.inverse.ssa_inverse import regularization_term

    theta_smooth = jnp.asarray(np.linspace(0, 1, 64).reshape(8, 8))
    step = np.zeros((8, 8)); step[:, 4:] = 1.0
    theta_step = jnp.asarray(step)
    w = 1.0
    # same total variation; H1 charges the step FAR more than the ramp
    h1_ramp = float(regularization_term(theta_smooth, "h1", w))
    h1_step = float(regularization_term(theta_step, "h1", w))
    tv_ramp = float(regularization_term(theta_smooth, "tv", w))
    tv_step = float(regularization_term(theta_step, "tv", w))
    # note jnp.roll wraps: both fields pay a wrap-around edge, equally
    assert h1_step / max(h1_ramp, 1e-30) > tv_step / max(tv_ramp, 1e-30)
    # l2 about a prior: zero at the prior, positive away
    prior = theta_smooth
    assert float(regularization_term(theta_smooth, "l2", w, prior=prior)) == 0.0
    assert float(regularization_term(theta_step, "l2", w, prior=prior)) > 0.0
    # gradients exist and are finite for all kinds
    for kind in ("h1", "l2", "tv"):
        g = jax.grad(lambda th: regularization_term(th, kind, w))(theta_step)
        assert bool(jnp.isfinite(g).all())
    with pytest.raises(ValueError):
        regularization_term(theta_step, "nope", w)


def test_parameterization_roundtrip_and_derivative():
    from pism_tpu.inverse.parameterizations import Parameterization
    vals = jnp.asarray([1.0e3, 5.0e4, 2.0e5])
    for kind in ("ident", "square", "exp", "trunc"):
        p = Parameterization(kind=kind, scale=1.0e5)
        z = p.design(vals)
        np.testing.assert_allclose(np.asarray(p.value(z)), np.asarray(vals),
                                   rtol=1e-10)
        # autodiff derivative matches finite differences
        g = jax.grad(lambda zz: jnp.sum(p.value(zz)))(z)
        h = 1e-6
        fd = (p.value(z + h) - p.value(z - h)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=1e-5)


def test_taylor_remainder_convergence(stream_problem):
    """Second-order Taylor remainder test (the standard adjoint
    verification): |J(x+h d) - J(x) - h g.d| = O(h^2). A wrong gradient
    makes the remainder O(h)."""
    grid, cfg, ssa, state, tau_true = stream_problem
    u_obs, v_obs = ssa.solve(state, tau_true)
    inv = TaucInversion(ssa=ssa, state=state, u_obs=u_obs, v_obs=v_obs,
                        reg_weight=0.0)
    mis = jax.jit(inv.misfit)
    tau0 = jnp.full(grid.shape2, 1.0e4)
    J0, g = jax.jit(jax.value_and_grad(inv.misfit))(tau0)

    rng = np.random.default_rng(3)
    slopes = []
    for _ in range(3):   # several independent directions
        d = jnp.asarray(rng.normal(size=grid.shape2))
        gd = float(jnp.sum(g * d))
        hs = np.asarray([400.0, 200.0, 100.0, 50.0])
        rem = np.asarray([abs(float(mis(tau0 + h * d)) - float(J0) - h * gd)
                          for h in hs])
        # fit log-log slope; O(h^2) => slope ~ 2
        slope = np.polyfit(np.log(hs), np.log(np.maximum(rem, 1e-300)), 1)[0]
        slopes.append(slope)
    assert min(slopes) > 1.7, slopes


def test_bounded_lbfgs_on_quadratic():
    """The optimizer itself: bound-constrained quadratic with known
    solution; interior components reach the unconstrained optimum, the
    constrained component sits on its bound; the convergence ladder
    reports the reason."""
    from pism_tpu.inverse.lbfgs import BoundedLBFGS

    A = np.diag([1.0, 10.0, 100.0])
    b = np.array([1.0, -2.0, 3.0])

    def vg(x):
        x = np.asarray(x)
        return 0.5 * x @ A @ x - b @ x, A @ x - b

    # unconstrained optimum: [1, -0.2, 0.03]; constrain x0 <= 0.5
    opt = BoundedLBFGS(value_and_grad=vg,
                       lower=np.full(3, -1.0), upper=np.array([0.5, 1., 1.]),
                       max_iterations=200, grtol=1e-10, gatol=1e-10)
    res = opt.run(np.zeros(3))
    assert res.converged, res.reason
    np.testing.assert_allclose(res.x, [0.5, -0.2, 0.03], atol=1e-6)
    assert len(res.log) >= 2
    assert res.log[-1].pgrad_norm <= 1e-9


@pytest.mark.slow
def test_lbfgs_twin_inversion(stream_problem):
    grid, cfg, ssa, state, tau_true = stream_problem
    u_obs, v_obs = ssa.solve(state, tau_true)
    inv = TaucInversion(ssa=ssa, state=state, u_obs=u_obs, v_obs=v_obs,
                        reg_weight=1e-12)
    f = 910.0 * 9.81 * 2000.0 * 0.001
    res, opt = inv.run_lbfgs(jnp.full(grid.shape2, 0.45 * f),
                             max_iterations=25, tauc_max=10 * f)
    m = np.asarray(res.misfits)
    assert m[-1] < 0.2 * m[0]          # misfit reduced substantially
    assert opt.log[0].pgrad_norm > opt.log[-1].pgrad_norm
