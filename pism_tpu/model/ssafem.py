"""SSA stress balance, Q1 Galerkin finite-element discretization (SSAFEM).

Rebuild of PISM ``src/stressbalance/ssa/SSAFEM.cc`` (reference mount empty
at survey time; rebuilt from the PISM manual's description: Q1 elements,
2x2 Gauss quadrature, SNES Newton on the weak-form residual) on the
whole-array FEM kit in :mod:`pism_tpu.ops.fem` — no element loops, no
assembled matrix: the residual and its Jacobian-vector products are fused
XLA expressions and the linear solves are matrix-free BiCGStab, exactly
like the FD variant.

Weak form (test functions phi for each equation):
  int [ 2 nuH (2 u_x + v_y) phi_x + nuH (u_y + v_x) phi_y
        + beta u phi - taud_x phi ] dA = 0
  int [ 2 nuH (2 v_y + u_x) phi_y + nuH (u_y + v_x) phi_x
        + beta v phi - taud_y phi ] dA = 0
with nu = (B/2) eps_eff^((1-n)/n) evaluated at the quadrature points and
the natural (zero membrane stress) boundary condition on the domain edge;
ice-free nodes are Dirichlet rows (u = v = 0 or the prescribed BC values).
Elements containing any ice-free node carry no stress (PISM's element
icy-mask), so margins decouple like the FD CFBC scheme's decoupled faces;
the depth-integrated front-pressure boundary integral is not applied (use
SSAFD for shelf-front-dominated configurations).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import fem
from ..ops import ssa as ssa_ops
from ..ops.stencils import Shifter
from ..physics.basal import SlidingLaw
from .. import state as S
from ..util.units import SEC_PER_YEAR as SPY


@dataclass
class SSAFEM:
    grid: object
    config: object
    flow_law: object
    sliding_law: Optional[SlidingLaw] = None
    bc_mask: Optional[jnp.ndarray] = None
    bc_u: Optional[jnp.ndarray] = None
    bc_v: Optional[jnp.ndarray] = None
    taud_x: Optional[jnp.ndarray] = None
    taud_y: Optional[jnp.ndarray] = None

    def __post_init__(self):
        cfg = self.config
        self.sh = Shifter(self.grid)
        self.n_glen = cfg.get_number("stress_balance.ssa.Glen_exponent")
        self.e_ssa = cfg.get_number("stress_balance.ssa.enhancement_factor")
        self.rho = cfg.get_number("constants.ice.density")
        self.g = cfg.get_number("constants.standard_gravity")
        self.picard_warmup = cfg.get_int("stress_balance.ssa.fd.picard_warmup")
        self.newton_rtol = cfg.get_number("stress_balance.ssa.fd.newton_rtol")
        self.newton_max = cfg.get_int("stress_balance.ssa.fd.newton_max_iterations")
        self.ksp_rtol = cfg.get_number("stress_balance.ssa.fd.ksp_rtol")
        self.ksp_max = cfg.get_int("stress_balance.ssa.fd.ksp_max_it")
        self.epsilon = cfg.get_number("stress_balance.ssa.epsilon")
        svel = cfg.get_number("stress_balance.ssa.Schoof_regularizing_velocity", "m s-1")
        slen = cfg.get_number("stress_balance.ssa.Schoof_regularizing_length", "m")
        self.eps_reg2 = (svel / slen) ** 2
        self.beta_floor = cfg.get_number("stress_balance.ssa.fd.beta_floor")
        self.subgl_drag = cfg.get_flag("geometry.grounded_cell_fraction")
        self.solve_dtype = cfg.get_string("stress_balance.ssa.fd.solve_dtype")
        if self.solve_dtype == "auto":
            # same resolution rule as SSAFD (see model/ssa.py): f32 carry
            # under the velocity-change stop, mixed for full convergence
            chg = cfg.get_number("stress_balance.ssa.fd.velocity_change_rtol")
            self.solve_dtype = "float32" if chg > 0.0 else "mixed"
        if self.sliding_law is None:
            self.sliding_law = SlidingLaw.from_config(cfg)

    # -- coefficient helpers (shared logic with SSAFD, FD module) ----------
    def _hardness(self, state: S.ModelState):
        H = state.geometry.ice_thickness
        if state.enthalpy is None:
            B = self.flow_law.hardness(jnp.zeros_like(H), jnp.zeros_like(H))
        else:
            B = self.flow_law.averaged_hardness(
                H, state.enthalpy, jnp.asarray(self.grid.z, H.dtype))
        return B * self.e_ssa ** (-1.0 / self.n_glen)

    def driving_stress(self, geometry, icy):
        from .ssa import SSAFD
        return SSAFD.driving_stress(self, geometry, icy)

    # -- weak-form residual -------------------------------------------------
    def build_problem(self, state: S.ModelState, tau_c=None,
                      differentiable_beta: bool = False) -> dict:
        grid = self.grid
        geom = state.geometry
        H = geom.ice_thickness
        dtype = H.dtype
        dx, dy = grid.dx, grid.dy
        shape = H.shape
        n = self.n_glen

        icy = S.icy(geom.cell_type)
        B = self._hardness(state)
        if self.taud_x is not None:
            bx = jnp.asarray(self.taud_x, dtype)
            by = jnp.asarray(self.taud_y, dtype)
        else:
            bx, by = self.driving_stress(geom, icy)

        if tau_c is None:
            tau_c = jnp.zeros_like(H)
        grounded_ice_mask = S.grounded_ice(geom.cell_type)
        gf = geom.cell_grounded_fraction if self.subgl_drag else None

        if self.bc_mask is not None:
            bc_mask = jnp.asarray(self.bc_mask, bool) | ~icy
            bc_u = jnp.where(jnp.asarray(self.bc_mask, bool),
                             jnp.asarray(self.bc_u, dtype), 0.0)
            bc_v = jnp.where(jnp.asarray(self.bc_mask, bool),
                             jnp.asarray(self.bc_v, dtype), 0.0)
        else:
            bc_mask = ~icy
            bc_u = jnp.zeros_like(H)
            bc_v = jnp.zeros_like(H)

        def free(x):
            return (jnp.where(bc_mask, 0.0, x[0]),
                    jnp.where(bc_mask, 0.0, x[1]))

        def full(x):
            return (jnp.where(bc_mask, bc_u, x[0]),
                    jnp.where(bc_mask, bc_v, x[1]))

        # element coefficient fields (per quadrature point); wrap elements
        # of non-periodic axes are masked out of every integral
        valid = fem.element_validity(shape, grid.periodic_x, grid.periodic_y,
                                     dtype)
        ic = fem.corners(icy)
        icy_el = (ic[0] & ic[1] & ic[2] & ic[3]).astype(dtype) * valid
        H_q = fem.quad_values(fem.corners(H))
        B_q = fem.quad_values(fem.corners(B))
        rescale = SPY ** ((n - 1.0) / n)
        reg2_a = self.eps_reg2 * SPY * SPY

        def nuH_q(u, v):
            """nu*H at the quadrature points (list of 4 element arrays);
            strain rates in 1/year for f32 range safety (see
            ops.ssa.compute_nuH)."""
            ux, uy = fem.quad_gradients(fem.corners(u), dx, dy)
            vx, vy = fem.quad_gradients(fem.corners(v), dx, dy)
            out = []
            for q in range(4):
                exx, eyy = ux[q] * SPY, vy[q] * SPY
                exy2 = (uy[q] + vx[q]) * SPY
                eps2 = exx ** 2 + eyy ** 2 + exx * eyy \
                    + 0.25 * exy2 ** 2 + reg2_a
                nu = 0.5 * B_q[q] * eps2 ** ((1.0 - n) / (2.0 * n)) * rescale
                out.append((nu * H_q[q] + self.epsilon) * icy_el)
            return out

        def beta_fn(u, v, tc=tau_c, reg=None):
            if gf is not None:
                tc_eff = tc * jnp.where(icy, gf, 0.0)
            else:
                tc_eff = jnp.where(grounded_ice_mask, tc, 0.0)
            return self.sliding_law.beta(tc_eff, u, v, reg=reg) + self.beta_floor

        taux_q = fem.quad_values(fem.corners(jnp.where(icy, bx, 0.0)))
        tauy_q = fem.quad_values(fem.corners(jnp.where(icy, by, 0.0)))
        icy_q = fem.quad_values(fem.corners(icy.astype(dtype)))
        taux_q = [t * valid for t in taux_q]
        tauy_q = [t * valid for t in tauy_q]
        icy_q = [t * valid for t in icy_q]

        def assemble(u, v, nu_q, beta_nodes, with_load=True):
            """Weak-form residual given frozen-or-live coefficients; with
            with_load=False returns the LINEAR operator part only (for
            Krylov matvecs — the full assembly is affine)."""
            ux, uy = fem.quad_gradients(fem.corners(u), dx, dy)
            vx, vy = fem.quad_gradients(fem.corners(v), dx, dy)
            bu_q = fem.quad_values(fem.corners(beta_nodes * u))
            bv_q = fem.quad_values(fem.corners(beta_nodes * v))
            fx_u = [2.0 * nu_q[q] * (2.0 * ux[q] + vy[q]) for q in range(4)]
            fy_u = [nu_q[q] * (uy[q] + vx[q]) for q in range(4)]
            fx_v = [nu_q[q] * (uy[q] + vx[q]) for q in range(4)]
            fy_v = [2.0 * nu_q[q] * (2.0 * vy[q] + ux[q]) for q in range(4)]
            if with_load:
                f0_u = [icy_q[q] * bu_q[q] - taux_q[q] for q in range(4)]
                f0_v = [icy_q[q] * bv_q[q] - tauy_q[q] for q in range(4)]
            else:
                f0_u = [icy_q[q] * bu_q[q] for q in range(4)]
                f0_v = [icy_q[q] * bv_q[q] for q in range(4)]
            Ru = fem.integrate((f0_u, fx_u, fy_u), dx, dy)
            Rv = fem.integrate((f0_v, fx_v, fy_v), dx, dy)
            return Ru, Rv

        def residual(uv, tc=tau_c):
            u, v = full(uv)
            beta = beta_fn(u, v, tc)
            if not differentiable_beta:
                beta = jax.lax.stop_gradient(beta)
            return free(assemble(u, v, nuH_q(u, v), beta))

        def diag(nu_q, beta_nodes):
            """Jacobi diagonal of the frozen-coefficient weak form."""
            J = dx * dy / 4.0
            sx, sy = 2.0 / dx, 2.0 / dy
            b_q = fem.quad_values(fem.corners(beta_nodes))
            du, dv = [], []
            for a in range(4):
                au = 0.0
                av = 0.0
                for q in range(4):
                    gx = (sx * fem.DNDXI_TAB[a][q]) ** 2
                    gy = (sy * fem.DNDETA_TAB[a][q]) ** 2
                    Nq2 = fem.N_TAB[a][q] ** 2
                    mass = icy_q[q] * b_q[q] * Nq2
                    au = au + nu_q[q] * (4.0 * gx + gy) + mass
                    av = av + nu_q[q] * (4.0 * gy + gx) + mass
                du.append(J * au)
                dv.append(J * av)
            return (fem.scatter_to_nodes(du), fem.scatter_to_nodes(dv))

        return dict(residual=residual, free=free, full=full,
                    assemble=assemble, nuH_q=nuH_q, beta_fn=beta_fn,
                    diag=diag, bc_mask=bc_mask, bc_u=bc_u, bc_v=bc_v,
                    bx=bx, by=by, icy=icy, tau_c=tau_c)

    # -- nonlinear solve ------------------------------------------------------
    def solve(self, state: S.ModelState, tau_c=None, u0=None, v0=None,
              diagnostics: bool = False, water_column_pressure=None):
        """Picard continuation warmup + safeguarded Newton on the FEM
        residual; same float64-island redirect as SSAFD (see SSAFD.solve).

        ``water_column_pressure`` (melange back pressure) is accepted for
        interface parity but has no effect: SSAFEM does not apply the
        front-pressure boundary integral (module docstring) — use SSAFD
        for shelf-front-dominated configurations."""
        out_dtype = state.geometry.ice_thickness.dtype
        if out_dtype != jnp.float64 and self.solve_dtype == "float64":
            f64 = lambda a: None if a is None else jnp.asarray(a, jnp.float64)
            geom64 = state.geometry.replace(
                ice_thickness=f64(state.geometry.ice_thickness),
                bed_elevation=f64(state.geometry.bed_elevation),
                sea_level=f64(state.geometry.sea_level),
                ice_surface_elevation=f64(state.geometry.ice_surface_elevation))
            state = state.replace(
                geometry=geom64, enthalpy=f64(state.enthalpy),
                u_ssa=f64(state.u_ssa), v_ssa=f64(state.v_ssa))
            res = self.solve(state, None if tau_c is None else f64(tau_c),
                             f64(u0), f64(v0), diagnostics)
            if diagnostics:
                u, v, info = res
                return u.astype(out_dtype), v.astype(out_dtype), info
            u, v = res
            return u.astype(out_dtype), v.astype(out_dtype)

        H = state.geometry.ice_thickness
        dtype = H.dtype

        P = self.build_problem(state, tau_c)
        free, full = P["free"], P["full"]
        residual, assemble = P["residual"], P["assemble"]
        nuH_q, beta_fn, diag = P["nuH_q"], P["beta_fn"], P["diag"]
        bc_mask = P["bc_mask"]
        bx, by = P["bx"], P["by"]

        ddt = jnp.float64 if dtype == jnp.float32 else None

        def dot(a, b_):
            if ddt is not None:
                return jnp.sum(a[0].astype(ddt) * b_[0].astype(ddt)) \
                    + jnp.sum(a[1].astype(ddt) * b_[1].astype(ddt))
            return jnp.sum(a[0] * b_[0]) + jnp.sum(a[1] * b_[1])

        u_init = u0 if u0 is not None else (
            state.u_ssa if state.u_ssa is not None else jnp.zeros_like(H))
        v_init = v0 if v0 is not None else (
            state.v_ssa if state.v_ssa is not None else jnp.zeros_like(H))
        uv = free((u_init, v_init))

        F0 = residual(uv)
        rtol = self.newton_rtol if dtype == jnp.float64 else \
            max(self.newton_rtol, 3.0e-5)
        tol2 = jnp.maximum(rtol ** 2 * dot(F0, F0),
                           jnp.asarray(1e-300, dtype))

        def jacobi(d_u, d_v):
            d_u = jnp.where(bc_mask, 1.0, jnp.maximum(d_u, 1e-12))
            d_v = jnp.where(bc_mask, 1.0, jnp.maximum(d_v, 1e-12))
            return lambda r: (r[0] / d_u, r[1] / d_v)

        # Picard warmup with drag-regularization continuation (cf. SSAFD):
        # solve the frozen-coefficient linear weak form by BiCGStab.
        reg0 = 1000.0 / SPY
        reg_final = self.sliding_law.plastic_reg
        nwarm = max(self.picard_warmup, 1)
        decay = (reg_final / reg0) ** (1.0 / nwarm)

        def picard_iter(i, uv):
            u, v = full(uv)
            nu_q = nuH_q(u, v)
            reg = jnp.maximum(reg0 * decay ** (i + 1.0), reg_final)
            beta = beta_fn(u, v, reg=reg)

            def matvec(x):
                xu, xv = free(x)
                Au, Av = assemble(xu, xv, nu_q, beta, with_load=False)
                out = free((Au, Av))
                return (out[0] + jnp.where(bc_mask, x[0], 0.0),
                        out[1] + jnp.where(bc_mask, x[1], 0.0))

            # residual of the affine map at u = bc values gives the RHS
            # (carries the driving-stress load + nonzero-Dirichlet coupling)
            zu, zv = full((jnp.zeros_like(H), jnp.zeros_like(H)))
            R0 = free(assemble(zu, zv, nu_q, beta))
            rhs = (-R0[0], -R0[1])
            sol, _, _ = ssa_ops.bicgstab_solve(
                matvec, rhs, free(uv), jacobi(*diag(nu_q, beta)),
                rtol=self.ksp_rtol, max_iter=self.ksp_max, dot_dtype=ddt)
            return free(sol)

        uv = jax.lax.fori_loop(0, self.picard_warmup, picard_iter, uv)

        # safeguarded Newton: line-search candidates vs a Picard sweep
        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.0625, 0.01], dtype)

        def newton_body(carry):
            uv, F, F2, _chg2, _F2prev, it = carry
            u, v = full(uv)
            nu_q = nuH_q(u, v)
            beta = beta_fn(u, v)

            # linearize once per sweep (jax.jvp would recompute the primal
            # residual at every Krylov iteration)
            _, jvp_lin = jax.linearize(residual, uv)

            def jmv(d):
                Jd = jvp_lin(free(d))
                return (Jd[0] + jnp.where(bc_mask, d[0], 0.0),
                        Jd[1] + jnp.where(bc_mask, d[1], 0.0))

            zero = (jnp.zeros_like(F[0]), jnp.zeros_like(F[1]))
            d, _, _ = ssa_ops.bicgstab_solve(
                jmv, (-F[0], -F[1]), zero, jacobi(*diag(nu_q, beta)),
                rtol=self.ksp_rtol, max_iter=self.ksp_max, dot_dtype=ddt)
            d = free(d)

            def trial(alpha):
                cand = (uv[0] + alpha * d[0], uv[1] + alpha * d[1])
                Fc = residual(cand)
                return cand, Fc, dot(Fc, Fc)

            cands = [trial(alphas[k]) for k in range(alphas.shape[0])]
            uv_p = picard_iter(jnp.asarray(nwarm, jnp.float64), uv)
            Fp = residual(uv_p)
            cands.append((uv_p, Fp, dot(Fp, Fp)))

            F2s = jnp.stack([c[2] for c in cands])
            best = jnp.argmin(F2s)
            uv_new = tuple(
                jnp.select([best == k for k in range(len(cands))],
                           [c[0][i] for c in cands]) for i in (0, 1))
            F_new = tuple(
                jnp.select([best == k for k in range(len(cands))],
                           [c[1][i] for c in cands]) for i in (0, 1))
            F2_new = F2s[best]
            chg = (uv_new[0] - uv[0], uv_new[1] - uv[1])
            return (uv_new, F_new, F2_new, dot(chg, chg), F2, it + 1)

        def newton_cond(carry):
            _uv, _F, F2, chg2, F2prev, it = carry
            unconverged = F2 > tol2
            progressing = F2 < 0.999 * F2prev
            return unconverged & progressing & (it < self.newton_max)

        F = residual(uv)
        F2 = dot(F, F)
        big = jnp.asarray(jnp.inf, F2.dtype)
        uv, F, F2, chg2, _, iters = jax.lax.while_loop(
            newton_cond, newton_body,
            (uv, F, F2, big, big, jnp.asarray(0)))

        u, v = full(uv)
        if diagnostics:
            return u, v, dict(iterations=iters, residual2=F2, tol2=tol2)
        return u, v
