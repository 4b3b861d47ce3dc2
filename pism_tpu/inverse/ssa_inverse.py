"""Inverse problems for the SSA: basal yield-stress inversion.

Rebuild of PISM ``src/inverse/`` (``IP_SSATaucForwardProblem``,
``IP_*Functional``, TAO optimizers, driven from ``pismi.py``) — upgraded to
the JAX-native formulation: the forward SSA solve is made differentiable via
the **implicit function theorem** (a ``jax.custom_vjp`` whose backward pass
solves the adjoint system J^T lambda = dJ/du with the same matrix-free
Krylov used by the forward Newton), so any gradient-based optimizer (optax,
L-BFGS, plain gradient descent) can minimize a velocity-misfit functional
with exact adjoint gradients — replacing PISM's hand-coded TAO pipeline.

The design variable is parameterized as tau_c = exp(theta) (PISM's
``IPDesignVariableParameterization`` "exp" choice) to keep tau_c positive
and to precondition the optimization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .. import state as S
from ..ops import ssa as ssa_ops
from .parameterizations import Parameterization


class InversionResult(NamedTuple):
    tau_c: jnp.ndarray        # the design variable (tau_c OR hardness B)
    u: jnp.ndarray
    v: jnp.ndarray
    misfits: jnp.ndarray      # per-iteration J values


def make_differentiable_solve(ssa, state: S.ModelState, design="tau_c",
                              tau_c=None):
    """Return fn(design_var) -> (u, v), differentiable w.r.t. the design
    variable: ``design = "tau_c"`` (basal yield stress,
    ``IP_SSATaucForwardProblem``) or ``design = "hardness"``
    (vertically-averaged hardness B, ``IP_SSAHardavForwardProblem`` — the
    design variable for shelf inversions where basal drag vanishes).

    Forward: the regular (non-differentiable, while_loop) Newton-Picard
    solve. Backward: adjoint solve with the true Jacobian transpose via
    jax.vjp of the residual at the converged state.
    """
    by_hardness = design == "hardness"

    # The implicit-function-theorem gradient is exact only at F(u*) = 0;
    # the production solver's velocity-change hard stop (1e-4, matching the
    # reference's picard_rtol) leaves residuals far too loose for adjoint
    # consistency. Clone the solver with the stop off and a tight Newton
    # tolerance for the inverse forward solves.
    import dataclasses

    from ..config.config import Config
    _cfg = Config.from_json(ssa.config.to_json())
    _cfg.update({
        "stress_balance.ssa.fd.velocity_change_rtol": 0.0,
        "stress_balance.ssa.fd.newton_rtol": min(
            _cfg.get_number("stress_balance.ssa.fd.newton_rtol"), 1.0e-8),
    })
    ssa = dataclasses.replace(ssa, config=_cfg)

    def _solve_raw(dv):
        if by_hardness:
            return ssa.solve(state, tau_c, hardness=dv)
        return ssa.solve(state, dv)

    solve = jax.custom_vjp(_solve_raw)

    def fwd(dv):
        u, v = _solve_raw(dv)
        return (u, v), (dv, u, v)

    def bwd(saved, cotangents):
        dv, u, v = saved
        ubar, vbar = cotangents
        if by_hardness:
            P = ssa.build_problem(state, tau_c, differentiable_beta=True,
                                  hardness=dv)
        else:
            P = ssa.build_problem(state, dv, differentiable_beta=True)
        free = P["free"]
        uv = free((u, v))

        # F(uv, p) = 0 at the solution. d(uv)/dp = -J_uv^{-1} J_p.
        # cotangent: p_bar = -J_p^T (J_uv^{-T} uv_bar)
        def F_of_uv(x):
            return P["residual"](x)

        def F_of_design(p):
            if by_hardness:
                Pp = ssa.build_problem(state, tau_c,
                                       differentiable_beta=True, hardness=p)
                return Pp["residual"](uv)
            return P["residual"](uv, p)

        _, vjp_uv = jax.vjp(F_of_uv, uv)
        _, vjp_tau = jax.vjp(F_of_design, dv)

        def JT_matvec(lam):
            lam_f = free(lam)
            (out,) = vjp_uv(lam_f)
            return (out[0] + jnp.where(P["bc_mask"], lam[0], 0.0),
                    out[1] + jnp.where(P["bc_mask"], lam[1], 0.0))

        # Jacobi preconditioner from the frozen-coefficient diagonal
        nuH = P["make_nuH"](*P["full"](uv))
        beta = P["beta_fn"](*P["full"](uv))
        du, dv = ssa_ops.operator_diagonal(nuH, beta, ssa.grid.dx, ssa.grid.dy,
                                           ssa.sh)
        du = jnp.where(P["bc_mask"], 1.0, jnp.maximum(du, 1e-12))
        dv = jnp.where(P["bc_mask"], 1.0, jnp.maximum(dv, 1e-12))

        rhs = free((ubar, vbar))
        zero = (jnp.zeros_like(u), jnp.zeros_like(v))
        lam, iters, _ = ssa_ops.bicgstab_solve(
            JT_matvec, rhs, zero, lambda r: (r[0] / du, r[1] / dv),
            rtol=1e-8, max_iter=1000)
        lam = free(lam)
        (tau_bar,) = vjp_tau(lam)
        return (-tau_bar,)

    solve.defvjp(fwd, bwd)
    return solve


def regularization_term(theta, kind: str, weight: float, eps: float = 1e-4,
                        prior=None, grad_scale: float = 1.0):
    """Design-variable regularization functionals (reference
    ``src/inverse/functional/``): ``h1`` = |grad theta|^2 smoothing
    (IP_H1NormFunctional), ``l2`` = |theta - prior|^2 damping
    (IP_L2NormFunctional), ``tv`` = eps-regularized total variation
    sum sqrt(|grad theta|^2 + eps^2) (IPTotalVariationFunctional —
    edge-preserving: allows sharp till-strength contrasts H1 smears)."""
    if kind == "l2":
        d = theta if prior is None else theta - prior
        return 0.5 * weight * jnp.sum(d ** 2)
    # gradient terms carry the nondimensionalizing length scale
    # (reference inverse.ssa.length_scale): grad_scale = L / dx
    gx = (jnp.roll(theta, -1, 1) - theta) * grad_scale
    gy = (jnp.roll(theta, -1, 0) - theta) * grad_scale
    if kind == "h1":
        return 0.5 * weight * (jnp.sum(gx ** 2) + jnp.sum(gy ** 2))
    if kind == "tv":
        return weight * jnp.sum(jnp.sqrt(gx ** 2 + gy ** 2 + eps ** 2))
    raise ValueError(f"unknown regularization {kind!r} (h1 | l2 | tv)")


@dataclass
class TaucInversion:
    """Gradient-based tau_c inversion from observed surface velocities
    (PISM ``pismi.py -inv_method tikhonov_*`` analog)."""

    ssa: object
    state: S.ModelState
    u_obs: jnp.ndarray
    v_obs: jnp.ndarray
    obs_mask: Optional[jnp.ndarray] = None   # where observations count
    reg_weight: float = 1.0e-10              # regularization weight
    reg_kind: str = "h1"                     # h1 | l2 | tv
    theta_prior: Optional[jnp.ndarray] = None  # l2 prior, design-var scale
    # design-variable parameterization (reference
    # ``inverse.design.param``); default matches round 1: tau_c = exp(theta)
    param: Parameterization = Parameterization(kind="exp", scale=1.0)
    #: reference inverse.ssa.velocity_misfit_weight
    misfit_weight: float = 1.0
    #: grad_scale = inverse.ssa.length_scale / dx (1 = dimensionless diffs)
    grad_scale: float = 1.0
    #: reference inverse.design.tv_epsilon
    tv_eps: float = 1e-4

    def misfit(self, tau_c):
        """Dimensionless velocity misfit: mean |u - u_obs|^2 normalized by
        the mean observed speed^2, so J = O(1) and optimizer epsilons
        (optax adam eps ~ 1e-8) do not swamp the gradients."""
        solve = make_differentiable_solve(self.ssa, self.state)
        u, v = solve(tau_c)
        w = self.obs_mask if self.obs_mask is not None else \
            S.icy(self.state.geometry.cell_type)
        w = w.astype(u.dtype)
        du = (u - self.u_obs) * w
        dv = (v - self.v_obs) * w
        n = jnp.maximum(jnp.sum(w), 1.0)
        obs2 = (jnp.sum(self.u_obs ** 2 * w) + jnp.sum(self.v_obs ** 2 * w)) / n
        J_mis = 0.5 * (jnp.sum(du ** 2) + jnp.sum(dv ** 2)) / n
        return self.misfit_weight * J_mis / jnp.maximum(obs2, 1e-30)

    def objective(self, theta):
        """theta = design variable; tau_c = param.value(theta); Tikhonov
        regularization of the selected kind on the design variable."""
        tau_c = self.param.value(theta)
        J = self.misfit(tau_c)
        return J + regularization_term(theta, self.reg_kind, self.reg_weight,
                                       prior=self.theta_prior,
                                       eps=self.tv_eps,
                                       grad_scale=self.grad_scale)

    def run_lbfgs(self, tau_c0, max_iterations: int = 50,
                  tauc_min: float = 1.0, tauc_max: float = 5.0e6,
                  grtol: float = 1.0e-5, steptol: float = 1.0e-12,
                  monitor=None, misfit_target=None):
        """Bounded L-BFGS inversion (the reference's TAO ``blmvm`` role):
        bound constraints from tauc_min/tauc_max mapped into design space,
        TAO-style convergence ladder, per-iterate log."""
        import numpy as np

        from .lbfgs import BoundedLBFGS

        theta0 = self.param.design(jnp.maximum(jnp.asarray(tau_c0), tauc_min))
        vg = jax.jit(jax.value_and_grad(self.objective))
        lo = float(self.param.design(jnp.asarray(tauc_min)))
        hi = float(self.param.design(jnp.asarray(tauc_max)))

        def split(theta):
            tau_c = self.param.value(theta)
            Jm = self.misfit(tau_c)
            return Jm, regularization_term(theta, self.reg_kind,
                                           self.reg_weight,
                                           prior=self.theta_prior,
                                           eps=self.tv_eps,
                                           grad_scale=self.grad_scale)

        opt = BoundedLBFGS(value_and_grad=lambda x: vg(jnp.asarray(x)),
                           lower=np.full(theta0.shape, lo),
                           upper=np.full(theta0.shape, hi),
                           max_iterations=max_iterations, grtol=grtol,
                           steptol=steptol, monitor=monitor,
                           misfit_target=misfit_target,
                           breakdown=jax.jit(split))
        res = opt.run(np.asarray(theta0))
        tau_c = self.param.value(jnp.asarray(res.x))
        u, v = self.ssa.solve(self.state, tau_c)
        return InversionResult(
            tau_c=tau_c, u=u, v=v,
            misfits=jnp.asarray([r.J for r in res.log])), res

    def run(self, tau_c0, iterations: int = 30, learning_rate: float = 0.3):
        """Adam on the design variable. Returns the inversion trajectory."""
        import optax

        theta = self.param.design(jnp.maximum(jnp.asarray(tau_c0), 1.0))
        opt = optax.adam(learning_rate)
        opt_state = opt.init(theta)
        grad_fn = jax.jit(jax.value_and_grad(self.objective))

        misfits = []
        best = (jnp.inf, theta)
        for k in range(iterations):
            J, g = grad_fn(theta)
            misfits.append(float(J))
            if float(J) < best[0]:
                best = (float(J), theta)
            updates, opt_state = opt.update(g, opt_state)
            theta = optax.apply_updates(theta, updates)
        # return the best evaluated iterate (the raw last step can overshoot
        # into the plastic dead zone, where gradients vanish)
        tau_c = self.param.value(best[1])
        u, v = self.ssa.solve(self.state, tau_c)
        return InversionResult(tau_c=tau_c, u=u, v=v,
                               misfits=jnp.asarray(misfits))


@dataclass
class HardnessInversion:
    """Gradient-based inversion of the vertically-averaged ice hardness B
    from observed surface velocities (PISM ``IP_SSAHardavForwardProblem``
    analog) — the natural design variable over floating ice, where basal
    drag vanishes and tau_c carries no signal. Parameterized as
    B = exp(theta) (positive, log-preconditioned)."""

    ssa: object
    state: S.ModelState
    u_obs: jnp.ndarray
    v_obs: jnp.ndarray
    tau_c: Optional[jnp.ndarray] = None      # held fixed during inversion
    obs_mask: Optional[jnp.ndarray] = None
    reg_weight: float = 1.0e-10
    reg_kind: str = "h1"                     # h1 | l2 | tv
    theta_prior: Optional[jnp.ndarray] = None
    param: Parameterization = Parameterization(kind="exp", scale=1.0)

    def misfit(self, hardness):
        solve = make_differentiable_solve(self.ssa, self.state,
                                          design="hardness",
                                          tau_c=self.tau_c)
        u, v = solve(hardness)
        w = self.obs_mask if self.obs_mask is not None else \
            S.icy(self.state.geometry.cell_type)
        w = w.astype(u.dtype)
        du = (u - self.u_obs) * w
        dv = (v - self.v_obs) * w
        n = jnp.maximum(jnp.sum(w), 1.0)
        obs2 = (jnp.sum(self.u_obs ** 2 * w) + jnp.sum(self.v_obs ** 2 * w)) / n
        J_mis = 0.5 * (jnp.sum(du ** 2) + jnp.sum(dv ** 2)) / n
        return J_mis / jnp.maximum(obs2, 1e-30)

    def objective(self, theta):
        B = self.param.value(theta)
        J = self.misfit(B)
        return J + regularization_term(theta, self.reg_kind, self.reg_weight,
                                       prior=self.theta_prior)

    def run(self, hardness0, iterations: int = 30, learning_rate: float = 0.1):
        import optax

        theta = self.param.design(jnp.maximum(jnp.asarray(hardness0), 1.0))
        opt = optax.adam(learning_rate)
        opt_state = opt.init(theta)
        grad_fn = jax.jit(jax.value_and_grad(self.objective))

        misfits = []
        best = (jnp.inf, theta)
        for _ in range(iterations):
            J, g = grad_fn(theta)
            misfits.append(float(J))
            if float(J) < best[0]:
                best = (float(J), theta)
            updates, opt_state = opt.update(g, opt_state)
            theta = optax.apply_updates(theta, updates)
        B = self.param.value(best[1])
        u, v = self.ssa.solve(self.state, self.tau_c, hardness=B)
        return InversionResult(tau_c=B, u=u, v=v,
                               misfits=jnp.asarray(misfits))
