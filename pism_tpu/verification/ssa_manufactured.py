"""Manufactured-solution verification of the nonlinear SSA.

The reference verifies its SSA against exact solutions (tests I/J in
``src/verification``). Test I (plastic-till stream) is implemented in
``ssa_exact.py``; this module covers the role of the smooth periodic shelf
test (J): a doubly periodic manufactured solution that exercises the FULL
nonlinear operator — variable thickness, Glen viscosity with the Schoof
regularization, both momentum components coupled, and (unlike J, which is
floating) linear basal drag.

The compensatory driving stress is computed from the *continuous*
equations with exact pointwise derivatives (jax.grad on the closed-form
fields — no finite differencing, no symbolic algebra):

    taud* = -div(2 nu H [2 e_xx + e_yy, e_xy; e_xy, 2 e_yy + e_xx]) + beta u*

so the discrete solution must converge to (u*, v*) at the scheme's order
(O(h^2) centered differences). The continuous viscosity uses the same
Schoof strain-rate regularization and additive nuH epsilon as the solver
(both read from the config), and the field period matches the grid's wrap
distance Mx*dx (the grid stores both interval endpoints, so the periodic
image distance exceeds 2*Lx by one dx).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

SPY = 3.15569259747e7


class ManufacturedSSA:
    """Closed-form periodic fields + compensatory source."""

    def __init__(self, L=400.0e3, H0=800.0, H1=100.0,
                 U0=300.0 / SPY, V0=200.0 / SPY,
                 A=1.0e-16 / SPY, n=3.0,
                 tau_c=5.0e4, u_threshold=100.0 / SPY):
        self.L = L
        self.H0, self.H1 = H0, H1
        self.U0, self.V0 = U0, V0
        self.A, self.n = A, n
        self.B = A ** (-1.0 / n)
        self.tau_c = tau_c
        self.u_threshold = u_threshold
        self.beta = tau_c / u_threshold       # pseudo-plastic q = 1
        # set per-grid in solve_on
        self.k = np.pi / L
        self.eps_reg2 = 0.0
        self.epsilon_nuH = 0.0

    # closed-form fields ----------------------------------------------------
    def u(self, x, y):
        return self.U0 * jnp.sin(self.k * x) * jnp.cos(self.k * y)

    def v(self, x, y):
        return self.V0 * jnp.cos(self.k * x) * jnp.sin(self.k * y)

    def H(self, x, y):
        return self.H0 + self.H1 * jnp.cos(self.k * x) * jnp.cos(self.k * y)

    # continuous operator ---------------------------------------------------
    def _stress(self, x, y):
        ux = jax.grad(self.u, 0)(x, y)
        uy = jax.grad(self.u, 1)(x, y)
        vx = jax.grad(self.v, 0)(x, y)
        vy = jax.grad(self.v, 1)(x, y)
        eps2 = ux ** 2 + vy ** 2 + ux * vy + 0.25 * (uy + vx) ** 2 \
            + self.eps_reg2
        nu = 0.5 * self.B * eps2 ** ((1.0 - self.n) / (2.0 * self.n))
        nuH = nu * self.H(x, y) + self.epsilon_nuH
        Txx = nuH * (4.0 * ux + 2.0 * vy)
        Tyy = nuH * (4.0 * vy + 2.0 * ux)
        Txy = nuH * (uy + vx)
        return Txx, Txy, Tyy

    def taud(self, x, y):
        """Compensatory driving stress (what the discrete b must be)."""
        dTxx_dx = jax.grad(lambda a, b_: self._stress(a, b_)[0], 0)(x, y)
        dTxy_dy = jax.grad(lambda a, b_: self._stress(a, b_)[1], 1)(x, y)
        dTxy_dx = jax.grad(lambda a, b_: self._stress(a, b_)[1], 0)(x, y)
        dTyy_dy = jax.grad(lambda a, b_: self._stress(a, b_)[2], 1)(x, y)
        fx = -(dTxx_dx + dTxy_dy) + self.beta * self.u(x, y)
        fy = -(dTxy_dx + dTyy_dy) + self.beta * self.v(x, y)
        return fx, fy

    # discrete solve ----------------------------------------------------------
    def solve_on(self, Mx):
        """Solve the discrete SSA on an Mx x Mx periodic grid; return
        (max_error [m/s], grid)."""
        from ..config.config import Config
        from ..grid import Grid
        from ..model.ssa import SSAFD
        from ..physics.rheology import IsothermalGlen
        from ..state import ModelState, new_geometry

        grid = Grid(Mx=Mx, My=Mx, Lx=self.L, Ly=self.L, periodicity="xy")
        cfg = Config({
            "basal_resistance.pseudo_plastic.enabled": True,
            "basal_resistance.pseudo_plastic.q": 1.0,
            "basal_resistance.pseudo_plastic.u_threshold":
                self.u_threshold * SPY,
            "stress_balance.ssa.fd.preconditioner": "mg",
            # the manufactured strain field passes through zeros; with the
            # production-tiny Schoof regularization the Glen viscosity
            # spikes ~100x along those lines and pointwise convergence is
            # delayed until dx resolves the spike width. A regularization
            # comparable to the typical strain rate keeps nu smooth — the
            # continuous form below uses the same value, so this still
            # verifies the discretization exactly.
            "stress_balance.ssa.Schoof_regularizing_velocity": 100.0,  # m/a
            "stress_balance.ssa.Schoof_regularizing_length": 100.0,    # km
        })
        # match the solver's regularizations and the grid's wrap period
        svel = cfg.get_number("stress_balance.ssa.Schoof_regularizing_velocity",
                              "m s-1")
        slen = cfg.get_number("stress_balance.ssa.Schoof_regularizing_length",
                              "m")
        self.eps_reg2 = (svel / slen) ** 2
        self.epsilon_nuH = cfg.get_number("stress_balance.ssa.epsilon")
        self.k = 4.0 * np.pi / (Mx * grid.dx)   # two periods per wrap

        X, Y = np.meshgrid(grid.x, grid.y)
        X = jnp.asarray(X)
        Y = jnp.asarray(Y)
        pt = jax.vmap(jax.vmap(lambda a, b: jnp.stack(self.taud(a, b))))
        td = pt(X, Y)
        H = jax.vmap(jax.vmap(self.H))(X, Y)
        geom = new_geometry(H, jnp.zeros(grid.shape2))  # grounded, bed = 0
        ssa = SSAFD(grid=grid, config=cfg, flow_law=IsothermalGlen(A=self.A),
                    taud_x=td[:, :, 0], taud_y=td[:, :, 1])
        u, v = ssa.solve(ModelState(geometry=geom),
                         jnp.full(grid.shape2, self.tau_c))
        u_ex = jax.vmap(jax.vmap(self.u))(X, Y)
        v_ex = jax.vmap(jax.vmap(self.v))(X, Y)
        err = float(jnp.maximum(jnp.abs(u - u_ex).max(),
                                jnp.abs(v - v_ex).max()))
        return err, grid
