"""Blatter-Pattyn 3D first-order ("higher-order") stress balance.

Rebuild of PISM ``src/stressbalance/blatter/`` — with a different, TPU-native
discretization. The reference uses Q1 FEM on an extruded mesh with PETSc
SNES + geometric multigrid (vertical semi-coarsening). Here the equations
are discretized in a terrain-following coordinate zeta = z_above_base / H
on the existing (My, Mx, Mz) grid (small-metric simplification: horizontal
metric corrections from grad H / grad b are neglected in the membrane terms;
vertical shear terms are exact), and solved matrix-free:

  d/dx(4 nu u_x + 2 nu v_y) + d/dy(nu (u_y + v_x))
      + d/dz(nu u_z) = rho g s_x          (x-momentum, per unit volume)

with nu = (B/2)(eps^2 + reg)^((1-n)/(2n)),
eps^2 = u_x^2 + v_y^2 + u_x v_y + 1/4 (u_y+v_x)^2 + 1/4 u_z^2 + 1/4 v_z^2,
u_z = u_zeta / (H dzeta-scale).

Boundary conditions: stress-free surface (u_zeta = 0 at zeta=1); basal
sliding nu u_z = beta u at zeta=0 (beta from the same sliding laws as the
SSA); lateral ice-free cells are Dirichlet zero, stress decoupled (no
calving-front pressure term yet — use for grounded/periodic configurations).

Solver: Newton iterations with exact autodiff JVPs, BiCGStab, and a
vertical-line preconditioner: the dominant d/dz(nu d/dz) coupling plus the
horizontal diagonal is inverted per column with the batched Thomas kernel —
the TPU-natural analog of the reference's vertical semi-coarsening
multigrid. Verified against the analytic inclined-slab (SIA-limit) and
plug-flow (SSA-limit) solutions in tests/test_blatter.py.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import state as S
from ..ops import ssa as ssa_ops
from ..ops import stencils as st
from ..ops.stencils import Shifter
from ..physics.basal import SlidingLaw
from ..util.tridiag import solve_batched
from ..util.units import SEC_PER_YEAR


@dataclass
class BlatterSolver:
    grid: object
    config: object
    flow_law: object
    sliding_law: Optional[SlidingLaw] = None
    taud_x: Optional[jnp.ndarray] = None   # prescribed driving stress (tests)
    taud_y: Optional[jnp.ndarray] = None

    def __post_init__(self):
        cfg = self.config
        self.sh = Shifter(self.grid)
        self.n_glen = cfg.get_number("stress_balance.ssa.Glen_exponent")
        self.rho = cfg.get_number("constants.ice.density")
        self.g = cfg.get_number("constants.standard_gravity")
        self.ksp_rtol = cfg.get_number("stress_balance.ssa.fd.ksp_rtol")
        self.ksp_max = cfg.get_int("stress_balance.ssa.fd.ksp_max_it")
        self.newton_max = cfg.get_int("stress_balance.ssa.fd.newton_max_iterations")
        self.newton_rtol = cfg.get_number("stress_balance.ssa.fd.newton_rtol")
        svel = cfg.get_number("stress_balance.ssa.Schoof_regularizing_velocity", "m s-1")
        slen = cfg.get_number("stress_balance.ssa.Schoof_regularizing_length", "m")
        self.eps_reg2 = (svel / slen) ** 2
        self.beta_floor = cfg.get_number("stress_balance.ssa.fd.beta_floor")
        if self.sliding_law is None:
            self.sliding_law = SlidingLaw.from_config(cfg)
        # normalized vertical coordinate from the ice grid levels
        z = np.asarray(self.grid.z)
        self.zeta = jnp.asarray(z / max(z[-1], 1.0))
        self.dzeta = jnp.asarray(np.diff(z / max(z[-1], 1.0)))

    # ------------------------------------------------------------------
    def solve(self, state: S.ModelState, tau_c=None, u0=None, v0=None,
              diagnostics: bool = False):
        grid, sh = self.grid, self.sh
        geom = state.geometry
        H2 = jnp.asarray(geom.ice_thickness, jnp.float64)
        mask = geom.cell_type
        dx, dy = grid.dx, grid.dy
        Mz = grid.Mz
        zeta, dzeta = self.zeta, self.dzeta
        SPY = SEC_PER_YEAR

        icy = S.icy(mask)
        icy_e = sh(icy, 0, 1)
        icy_n = sh(icy, 1, 0)
        keep_e = (icy & icy_e).astype(jnp.float64)[..., None]
        keep_n = (icy & icy_n).astype(jnp.float64)[..., None]
        Hs = jnp.maximum(H2, 1.0)[..., None]     # (My, Mx, 1)

        # hardness per level from enthalpy (or constant)
        if state.enthalpy is None:
            B3 = self.flow_law.hardness(jnp.zeros(grid.shape3, jnp.float64),
                                        jnp.zeros(grid.shape3, jnp.float64))
        else:
            depth = jnp.maximum(H2[..., None] - jnp.asarray(grid.z), 0.0)
            p = self.flow_law.EC.pressure(depth)
            B3 = self.flow_law.hardness(jnp.asarray(state.enthalpy, jnp.float64), p)

        # driving stress (per unit area, multiplied by H in the residual)
        if self.taud_x is not None:
            bx2 = jnp.asarray(self.taud_x, jnp.float64)
            by2 = jnp.asarray(self.taud_y, jnp.float64)
        else:
            sx, sy = st.centered_grad(geom.ice_surface_elevation, dx, dy, sh)
            bx2 = -self.rho * self.g * H2 * jnp.asarray(sx, jnp.float64)
            by2 = -self.rho * self.g * H2 * jnp.asarray(sy, jnp.float64)
        # per-volume driving term: tau_d / H  [Pa/m] (Blatter is a
        # per-level balance, unlike the depth-integrated SSA)
        bx = jnp.broadcast_to((bx2[..., None] / Hs), grid.shape3)
        by = jnp.broadcast_to((by2[..., None] / Hs), grid.shape3)

        if tau_c is None:
            tau_c = jnp.zeros_like(H2)
        tau_eff = jnp.where(S.grounded_ice(mask), jnp.asarray(tau_c, jnp.float64), 0.0)

        bc3 = (~icy)[..., None] & jnp.ones((1, 1, Mz), bool)

        dz_l = jnp.concatenate([dzeta[:1], dzeta])      # below level k (clamped)
        dz_u = jnp.concatenate([dzeta, dzeta[-1:]])     # above level k (clamped)
        # finite-volume cell heights: half cells at the bed and surface so
        # the column weights sum to exactly 1 (the discrete column balance
        # must equate basal traction with the integrated driving stress)
        dz0 = jnp.concatenate([jnp.zeros(1), dzeta])
        dz1 = jnp.concatenate([dzeta, jnp.zeros(1)])
        dz_c = 0.5 * (dz0 + dz1)

        def free(x):
            return (jnp.where(bc3, 0.0, x[0]), jnp.where(bc3, 0.0, x[1]))

        def strain_and_nu(u, v):
            """Effective viscosity at cell centers/levels (1/year units
            internally for f32-safe powers; rescaled to SI)."""
            u_a, v_a = u * SPY, v * SPY
            ux = (sh(u_a, 0, 1) - sh(u_a, 0, -1)) / (2 * dx)
            vy = (sh(v_a, 1, 0) - sh(v_a, -1, 0)) / (2 * dy)
            uy = (sh(u_a, 1, 0) - sh(u_a, -1, 0)) / (2 * dy)
            vx = (sh(v_a, 0, 1) - sh(v_a, 0, -1)) / (2 * dx)
            # vertical shear du/dz = du/dzeta / H (centered, one-sided ends)
            def ddz(a):
                d_int = (a[..., 2:] - a[..., :-2]) / (dz_l[1:-1] + dz_u[1:-1])
                d_lo = (a[..., 1:2] - a[..., 0:1]) / dzeta[0]
                d_hi = (a[..., -1:] - a[..., -2:-1]) / dzeta[-1]
                return jnp.concatenate([d_lo, d_int, d_hi], axis=-1) / Hs
            uz = ddz(u_a)
            vz = ddz(v_a)
            reg_a = self.eps_reg2 * SPY * SPY
            eps2 = (ux ** 2 + vy ** 2 + ux * vy + 0.25 * (uy + vx) ** 2
                    + 0.25 * uz ** 2 + 0.25 * vz ** 2 + reg_a)
            nu = 0.5 * B3 * eps2 ** ((1.0 - self.n_glen) / (2.0 * self.n_glen)) \
                * SPY ** ((self.n_glen - 1.0) / self.n_glen)
            return nu

        def residual(uv):
            u, v = free(uv)
            nu = strain_and_nu(u, v)

            # --- membrane terms per level (per-volume: nu on faces) -------
            nuH_e = 0.5 * (nu + sh(nu, 0, 1)) * keep_e
            nuH_n = 0.5 * (nu + sh(nu, 1, 0)) * keep_n

            ux_e = (sh(u, 0, 1) - u) / dx
            vy_e = (sh(v, 1, 0) + sh(v, 1, 1) - sh(v, -1, 0) - sh(v, -1, 1)) / (4 * dy)
            Txx_e = nuH_e * (4.0 * ux_e + 2.0 * vy_e)

            uy_n = (sh(u, 1, 0) - u) / dy
            vx_n = (sh(v, 0, 1) + sh(v, 1, 1) - sh(v, 0, -1) - sh(v, 1, -1)) / (4 * dx)
            Txy_n = nuH_n * (uy_n + vx_n)

            div_x = ((Txx_e - sh(Txx_e, 0, -1)) / dx
                     + (Txy_n - sh(Txy_n, -1, 0)) / dy)

            vy_n = (sh(v, 1, 0) - v) / dy
            ux_n = (sh(u, 0, 1) + sh(u, 1, 1) - sh(u, 0, -1) - sh(u, 1, -1)) / (4 * dx)
            Tyy_n = nuH_n * (4.0 * vy_n + 2.0 * ux_n)

            uy_e = (sh(u, 1, 0) + sh(u, 1, 1) - sh(u, -1, 0) - sh(u, -1, 1)) / (4 * dy)
            vx_e = (sh(v, 0, 1) - v) / dx
            Txy_e = nuH_e * (uy_e + vx_e)

            div_y = ((Txy_e - sh(Txy_e, 0, -1)) / dx
                     + (Tyy_n - sh(Tyy_n, -1, 0)) / dy)

            # --- vertical shear term: (1/H) d/dzeta(nu u_zeta / H) --------
            nu_mid = 0.5 * (nu[..., 1:] + nu[..., :-1])

            def vert(a):
                flux = nu_mid * (a[..., 1:] - a[..., :-1]) / dzeta / Hs
                # surface: stress-free (flux 0); base handled via beta below
                lo = jnp.zeros_like(flux[..., :1])
                fz = jnp.concatenate([lo, flux, jnp.zeros_like(flux[..., :1])],
                                     axis=-1)
                return (fz[..., 1:] - fz[..., :-1]) / dz_c / Hs

            Vu = vert(u)
            Vv = vert(v)

            # --- basal sliding at the bottom level ------------------------
            beta = jax.lax.stop_gradient(
                self.sliding_law.beta(tau_eff, u[..., 0], v[..., 0])
                + self.beta_floor)
            drag_u = jnp.zeros(grid.shape3).at[..., 0].set(
                beta * u[..., 0] / (dz_c[0] * Hs[..., 0]))
            drag_v = jnp.zeros(grid.shape3).at[..., 0].set(
                beta * v[..., 0] / (dz_c[0] * Hs[..., 0]))

            Fx = -(div_x + Vu - drag_u) - bx
            Fy = -(div_y + Vv - drag_v) - by
            return free((Fx, Fy))

        # ------------------------------------------------------------------
        def dot(a, b_):
            return jnp.sum(a[0] * b_[0]) + jnp.sum(a[1] * b_[1])

        def make_precond(uv):
            """Vertical-line preconditioner: invert (diag_h + d/dz nu d/dz)
            per column with the batched Thomas kernel."""
            u, v = free(uv)
            nu = strain_and_nu(u, v)
            nuH_e = 0.5 * (nu + sh(nu, 0, 1)) * keep_e
            nuH_n = 0.5 * (nu + sh(nu, 1, 0)) * keep_n
            diag_h = (4.0 * (nuH_e + sh(nuH_e, 0, -1)) / dx ** 2
                      + (nuH_n + sh(nuH_n, -1, 0)) / dy ** 2)
            nu_mid = 0.5 * (nu[..., 1:] + nu[..., :-1])
            w = nu_mid / dzeta / (Hs ** 2)            # interface weights
            lo = jnp.concatenate([jnp.zeros_like(w[..., :1]), w], axis=-1)
            hi = jnp.concatenate([w, jnp.zeros_like(w[..., :1])], axis=-1)
            beta = self.sliding_law.beta(tau_eff, u[..., 0], v[..., 0]) \
                + self.beta_floor
            a = -lo / dz_c
            c = -hi / dz_c
            b = diag_h + (lo + hi) / dz_c
            b = b.at[..., 0].add(beta / (dz_c[0] * Hs[..., 0]))
            b = jnp.where(bc3, 1.0, jnp.maximum(b, 1e-12))
            a = jnp.where(bc3, 0.0, a)
            c = jnp.where(bc3, 0.0, c)

            def precond(r):
                return (solve_batched(a, b, c, r[0]),
                        solve_batched(a, b, c, r[1]))

            return precond

        zero3 = jnp.zeros(grid.shape3, jnp.float64)
        u_init = zero3 if u0 is None else jnp.asarray(u0, jnp.float64)
        v_init = zero3 if v0 is None else jnp.asarray(v0, jnp.float64)
        uv = free((u_init, v_init))

        b_norm2 = dot(free((bx, by)), free((bx, by)))
        tol2 = jnp.maximum(self.newton_rtol ** 2 * b_norm2, 1e-300)
        alphas = jnp.asarray([1.0, 0.5, 0.25, 0.0625, 0.01])

        def newton_body(carry):
            uv, F, F2, chg2, it = carry

            def jmv(d):
                df = free(d)
                _, Jd = jax.jvp(residual, (uv,), (df,))
                return (Jd[0] + jnp.where(bc3, d[0], 0.0),
                        Jd[1] + jnp.where(bc3, d[1], 0.0))

            precond = make_precond(uv)
            negF = (-F[0], -F[1])
            zero = (jnp.zeros_like(F[0]), jnp.zeros_like(F[1]))
            d, _, _ = ssa_ops.bicgstab_solve(
                jmv, negF, zero, precond, rtol=self.ksp_rtol,
                max_iter=self.ksp_max)
            d = free(d)

            def trial(alpha):
                cand = (uv[0] + alpha * d[0], uv[1] + alpha * d[1])
                Fc = residual(cand)
                return dot(Fc, Fc)

            norms = jax.vmap(trial)(alphas)
            k = jnp.argmin(norms)
            uv_new = (uv[0] + alphas[k] * d[0], uv[1] + alphas[k] * d[1])
            F2_new = norms[k]
            worse = F2_new >= F2
            uv_new = (jnp.where(worse, uv[0], uv_new[0]),
                      jnp.where(worse, uv[1], uv_new[1]))
            F_new = residual(uv_new)
            F2_new = jnp.where(worse, F2, F2_new)
            dchg = (uv_new[0] - uv[0], uv_new[1] - uv[1])
            chg2 = dot(dchg, dchg) / jnp.maximum(dot(uv_new, uv_new), 1e-300)
            return (uv_new, F_new, F2_new, chg2, it + 1)

        def newton_cond(carry):
            _, _, F2, chg2, it = carry
            return (F2 > tol2) & (chg2 > 1e-16) & (it < self.newton_max)

        F0 = residual(uv)
        uv, F, F2, chg2, iters = jax.lax.while_loop(
            newton_cond, newton_body,
            (uv, F0, dot(F0, F0), jnp.asarray(1.0), jnp.asarray(0)))

        u, v = free(uv)
        if diagnostics:
            return u, v, {"newton_iters": iters, "F2_final": F2,
                          "tol2": tol2, "b_norm2": b_norm2}
        return u, v
