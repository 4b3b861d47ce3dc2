"""Exact solutions for SSA verification (tests I and J).

Test I — plastic-till ice stream (Schoof 2006; PISM ``pismv -test I``,
reference implementation ``src/verification/tests/exactTestsIJ.c`` — not
copied; re-derived below from the flowline force balance):

Uniform thickness H0 and hardness B, constant driving stress f = rho g H0 a
in +x, till yield stress tau_c(y) = f |y/L|^m. Cross-flow force balance
    d/dy [ B H0 2^(-1/n) |u_y|^(1/n - 1) u_y ] = tau_c(y) - f
integrated twice with symmetry (T(0) = 0) and margin conditions
u(y0) = u_y(y0) = 0 at y0 = L (m+1)^(1/m) gives, with C = B H0 2^(-1/n),
a = 1 / ((m+1) L^m), and n = 3:

    u(y) = (f/C)^3 [ F(y0) - F(|y|) ],
    F(y) = y^4/4 - 3 a y^(m+4)/(m+4) + 3 a^2 y^(2m+4)/(2m+4)
           - a^3 y^(3m+4)/(3m+4).

Test J — linearized periodic ice shelf (Bueler & Brown): not yet
implemented; see tests/test_ssa.py for the floating-shelf checks used
instead.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: PISM test I parameters (Bueler & Brown 2009)
M_SCHOOF = 10.0
L_SCHOOF = 40.0e3        # m
H0 = 2000.0              # m
B_HARDNESS = 3.7e8       # Pa s^(1/3)
SLOPE = 0.001            # surface slope magnitude (downhill +x)
RHO = 910.0
G = 9.81
N_GLEN = 3.0


@dataclass(frozen=True)
class ExactI:
    m: float = M_SCHOOF
    L: float = L_SCHOOF
    H0: float = H0
    B: float = B_HARDNESS
    slope: float = SLOPE

    @property
    def f(self) -> float:
        """Driving stress magnitude [Pa]."""
        return RHO * G * self.H0 * self.slope

    @property
    def y0(self) -> float:
        """Stream half-width (where tau_c grows past f)."""
        return self.L * (self.m + 1.0) ** (1.0 / self.m)

    def tau_c(self, y) -> np.ndarray:
        return self.f * np.abs(np.asarray(y) / self.L) ** self.m

    def velocity(self, y) -> np.ndarray:
        """Exact u(y) [m/s] (v = 0)."""
        m, L = self.m, self.L
        C = self.B * self.H0 * 2.0 ** (-1.0 / N_GLEN)
        a = 1.0 / ((m + 1.0) * L ** m)

        def F(yy):
            return (yy ** 4 / 4.0
                    - 3.0 * a * yy ** (m + 4.0) / (m + 4.0)
                    + 3.0 * a ** 2 * yy ** (2.0 * m + 4.0) / (2.0 * m + 4.0)
                    - a ** 3 * yy ** (3.0 * m + 4.0) / (3.0 * m + 4.0))

        yy = np.minimum(np.abs(np.asarray(y, float)), self.y0)
        u = (self.f / C) ** 3 * (F(self.y0) - F(yy))
        return np.maximum(u, 0.0)


@dataclass(frozen=True)
class ExactV:
    """Test V — van der Veen (1985) unconfined flowline ice shelf
    (PISM ``pismv -test V``; reference ``src/verification/tests/exactTestV``
    role — re-derived from the closed form, the reference mount was empty):

    A floating shelf fed at x = 0 with velocity u0 and thickness H0.
    Steady mass conservation d(uH)/dx = 0 gives uH = q0 = u0 H0; the
    flowline SSA with zero basal drag and the calving-front condition
    satisfied everywhere reduces to

        du/dx = C H^n,   C = [ rho_i g (1 - rho_i/rho_w) / (4 B) ]^n

    (B = hardness). With H = q0/u, u^n du = C q0^n dx integrates to

        u(x) = [ u0^(n+1) + (n+1) C q0^n x ]^(1/(n+1)),   H(x) = q0/u(x).

    Because the analytic profile satisfies the front condition exactly,
    the discrete front position may be placed anywhere downstream; the
    numerical CFBC error shows up as a deviation of u near the front.
    """

    u0: float = 300.0 / 3.15569259747e7   # m/s inflow velocity
    H0v: float = 600.0                    # m inflow thickness
    B: float = 1.9e8                      # Pa s^(1/3) (cold shelf hardness)
    rho_i: float = RHO
    rho_w: float = 1028.0
    n: float = N_GLEN

    @property
    def C(self) -> float:
        return (self.rho_i * G * (1.0 - self.rho_i / self.rho_w)
                / (4.0 * self.B)) ** self.n

    def velocity(self, x) -> np.ndarray:
        q0 = self.u0 * self.H0v
        np1 = self.n + 1.0
        return (self.u0 ** np1 + np1 * self.C * q0 ** self.n
                * np.asarray(x, float)) ** (1.0 / np1)

    def thickness(self, x) -> np.ndarray:
        return self.u0 * self.H0v / self.velocity(x)
