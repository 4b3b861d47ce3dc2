"""Exact steady / quasi-steady isothermal SIA solutions (tests A, D, H, L).

Re-derivations of the remaining members of the Bueler et al. (2005)
isothermal verification family used by PISM's ``pismv``
(reference implementation ``src/verification/tests/exactTestsABCD.c``,
``exactTestH.c``, ``exactTestL.cc`` — code not copied; solutions re-derived
from the governing equations as published):

* **Test A** — steady ice cap with constant accumulation ``M0`` inside a
  fixed margin ``r = L`` (ice removed beyond ``L``, PISM's ``-ocean_kill``
  role).  Integrating the steady radial SIA mass balance
  ``(1/r) d(r q)/dr = M0`` with flux
  ``q = Gamma H^{n+2} |H'|^{n-1} (-H')`` and ``H(L) = 0`` gives the closed
  form

      H(r)^{(2n+2)/n} = 2 (M0 / (2 Gamma))^{1/n}
                        * (L^{(n+1)/n} - r^{(n+1)/n}).

* **Test D** — time-dependent compensatory accumulation: the steady test-A
  profile plus a smooth oscillating annular perturbation.  The
  compensatory source ``M_c = dH/dt + div(q(H))`` is evaluated with
  autodiff on the exact radial profile (the reference instead carries the
  hand-derived expressions in C; autodiff of the same formulas is exact to
  machine precision).

* **Test H** — moving-margin similarity solution coupled to pointwise
  isostasy.  With bed ``b = -f H`` (``f = rho_i / rho_r``) the surface is
  ``h = (1 - f) H`` and the SIA flux gains a factor ``(1-f)^n``, so the
  flat-bed lambda-family similarity solution applies with softness
  ``A_eff = A (1 - f)^n``.

* **Test L role** — steady SIA over non-flat bed.  The published test L
  fixes a particular bed/accumulation pair; since the reference mount is
  unavailable the same *role* is covered with a documented smooth bed and
  accumulation, with the exact steady profile obtained from the regular ODE

      dw/dr = -(8/3) [ w^{5/8} b'(r) + (q(r)/Gamma)^{1/3} ],   w = H^{8/3}

  (n = 3) integrated inward from ``w(L) = 0`` with a high-order adaptive
  integrator (the reference uses a GSL ODE solver the same way).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np

from ..util.units import SEC_PER_YEAR
from .halfar import A_SOFTNESS, GLEN_N, RHO_ICE, SimilaritySolution, gamma


# ---------------------------------------------------------------- test A

@dataclass(frozen=True)
class SteadyCap:
    """Steady ice cap with constant accumulation M0 inside margin L."""

    M0: float = 0.3 / SEC_PER_YEAR     # m/s ice-equivalent
    L: float = 750.0e3                 # margin radius [m]
    n: float = GLEN_N
    A: float = A_SOFTNESS

    def thickness(self, r):
        r = np.abs(np.asarray(r, dtype=np.float64))
        n = self.n
        G = gamma(self.A, n)
        p = (n + 1.0) / n
        inner = 2.0 * (self.M0 / (2.0 * G)) ** (1.0 / n) * \
            np.maximum(self.L ** p - r ** p, 0.0)
        return inner ** (n / (2.0 * n + 2.0))

    def accumulation(self, r):
        """M0 inside the margin; 0 outside (ice there is killed instead)."""
        r = np.abs(np.asarray(r, dtype=np.float64))
        return np.where(r < self.L, self.M0, 0.0)


def test_A() -> SteadyCap:
    return SteadyCap()


# ---------------------------------------------------------------- test E

@dataclass(frozen=True)
class SlidingCap:
    """Test E (Bueler et al. 2005): the steady test-A cap with basal
    sliding prescribed in an annular sector and a compensatory
    accumulation so the test-A thickness remains an exact steady state.

    The sliding coefficient is a separable bump

        mu(r, theta) = mu_max * 4 (r - r1)(r2 - r) / (r2 - r1)^2
                              * 4 (th - th1)(th2 - th) / (th2 - th1)^2

    inside ``r1 < r < r2``, ``th1 < theta < th2`` and zero outside; the
    basal sliding velocity is ``u_b = mu tau_b`` with ``tau_b = rho g H
    |grad h|`` directed down-gradient (radially outward on the flat-bed
    cap), and the compensatory accumulation is

        M_E = M_A + div(H u_b)

    (reference: ``src/verification/tests/exactTestsABCDE.c`` — not
    readable here, mount empty; the construction is re-derived from the
    published description and made exact by evaluating ``div(H u_b)``
    with autodiff on the closed-form flux, so the verification is
    self-consistent regardless of the exact upstream sector constants).
    """

    cap: SteadyCap = SteadyCap()
    mu_max: float = 2.5e-11            # m s^-1 Pa^-1 (peak sliding coeff)
    r1: float = 200.0e3
    r2: float = 700.0e3
    th1: float = 10.0 * np.pi / 180.0
    th2: float = 40.0 * np.pi / 180.0
    rho: float = RHO_ICE
    g: float = 9.81

    def thickness(self, r):
        return self.cap.thickness(r)

    def _fields(self, x, y):
        """Closed-form (H, u_b, v_b) at points (x, y) — jax-traceable.

        Every intermediate is kept finite everywhere (clamped powers,
        origin-regularized r and atan2) so autodiff through the sector
        masks never produces NaN: the margin singularity of H' lies
        outside the sliding sector (r2 < L), where the masked branch is
        exactly zero."""
        import jax.numpy as jnp
        n = self.cap.n
        G = gamma(self.cap.A, n)
        p = (n + 1.0) / n
        L, M0 = self.cap.L, self.cap.M0
        r = jnp.sqrt(x * x + y * y + 1.0)   # +1 m^2: finite grad at origin
        C = 2.0 * (M0 / (2.0 * G)) ** (1.0 / n)
        e = n / (2.0 * n + 2.0)
        inner = C * (L ** p - r ** p)
        inner_c = jnp.clip(inner, 1.0, None)   # >= 1 keeps powers finite
        H = jnp.where(inner > 0.0, inner_c ** e, 0.0)
        dHdr = e * inner_c ** (e - 1.0) * (-C * p * r ** (p - 1.0))
        theta = jnp.arctan2(y, jnp.where(jnp.abs(x) + jnp.abs(y) < 1.0,
                                         1.0, x))
        gr = 4.0 * (r - self.r1) * (self.r2 - r) / (self.r2 - self.r1) ** 2
        gt = 4.0 * (theta - self.th1) * (self.th2 - theta) \
            / (self.th2 - self.th1) ** 2
        in_sector = (r > self.r1) & (r < self.r2) & \
            (theta > self.th1) & (theta < self.th2)
        mu = jnp.where(in_sector, self.mu_max * gr * gt, 0.0)
        tau_b = self.rho * self.g * H * jnp.abs(dHdr)
        speed = mu * tau_b             # down-gradient = radially outward
        u = speed * x / r
        v = speed * y / r
        return H, u, v

    def sliding_velocity(self, x, y):
        import jax
        import jax.numpy as jnp
        x = jnp.asarray(x, jnp.float64)
        y = jnp.asarray(y, jnp.float64)
        _, u, v = self._fields(x, y)
        return np.asarray(u), np.asarray(v)

    def accumulation(self, x, y):
        """M_E = M_A + div(H u_b), the divergence evaluated by autodiff
        of the closed-form sliding flux (exact to machine precision)."""
        import jax
        import jax.numpy as jnp

        def qx(px, py):
            H, u, _ = self._fields(px, py)
            return H * u

        def qy(px, py):
            H, _, v = self._fields(px, py)
            return H * v

        div = jax.vmap(lambda px, py: jax.grad(qx, 0)(px, py)
                       + jax.grad(qy, 1)(px, py))
        X = jnp.asarray(np.ravel(x), jnp.float64)
        Y = jnp.asarray(np.ravel(y), jnp.float64)
        Mc = np.asarray(div(X, Y)).reshape(np.shape(x))
        r = np.sqrt(np.asarray(x) ** 2 + np.asarray(y) ** 2)
        return np.asarray(self.cap.accumulation(r)) + Mc


def test_E() -> SlidingCap:
    return SlidingCap()


# ---------------------------------------------------------------- test H

@dataclass(frozen=True)
class IsostasySimilarity:
    """Test H: lambda-family similarity solution with bed b = -f H."""

    f: float = RHO_ICE / 3300.0
    lam: float = 5.0
    H0: float = 3600.0
    R0: float = 750.0e3

    @property
    def flat(self) -> SimilaritySolution:
        A_eff = A_SOFTNESS * (1.0 - self.f) ** GLEN_N
        return SimilaritySolution(H0=self.H0, R0=self.R0, lam=self.lam,
                                  A=A_eff)

    def thickness(self, t, r):
        return self.flat.thickness(t, r)

    def bed(self, t, r):
        return -self.f * self.thickness(t, r)


def test_H() -> IsostasySimilarity:
    return IsostasySimilarity()


# ---------------------------------------------------------------- test L role

@dataclass(frozen=True)
class SteadyCapOnBed:
    """Steady cap over a smooth radial bed; exact H from an adaptive ODE.

    bed(r) = b0 cos(pi r / L) — a central bump descending to -b0 at the
    margin; accumulation constant M0 as in test A.  (Coefficients are this
    rebuild's documented choice; the published test L plays the same role
    with its own bed/accumulation pair.)
    """

    M0: float = 0.3 / SEC_PER_YEAR
    L: float = 750.0e3
    b0: float = 500.0
    n: float = GLEN_N

    def bed(self, r):
        r = np.abs(np.asarray(r, dtype=np.float64))
        return self.b0 * np.cos(np.pi * r / self.L)

    def bed_slope(self, r):
        r = np.abs(np.asarray(r, dtype=np.float64))
        return -self.b0 * np.pi / self.L * np.sin(np.pi * r / self.L)

    def flux(self, r):
        """Steady flux q(r) = M0 r / 2 (per unit arc length)."""
        return self.M0 * np.abs(np.asarray(r, dtype=np.float64)) / 2.0

    def solve(self, r_eval) -> np.ndarray:
        """Exact steady thickness at radii ``r_eval`` via the w=H^{8/3} ODE."""
        from scipy.integrate import solve_ivp

        G = gamma(A_SOFTNESS, self.n)

        def rhs(r, w):
            w0 = max(w[0], 0.0)
            H53 = w0 ** (5.0 / 8.0)
            return [-(8.0 / 3.0) * (H53 * self.bed_slope(r)
                                    + (self.flux(r) / G) ** (1.0 / 3.0))]

        # integrate inward from the margin (r: L -> ~0); solve_ivp handles
        # the decreasing independent variable directly
        r_lo = 1.0e3
        sol = solve_ivp(rhs, (self.L, r_lo), [0.0], rtol=1e-10, atol=1e-8,
                        dense_output=True, method="RK45")
        if not sol.success:
            raise RuntimeError(f"test L ODE failed: {sol.message}")
        r = np.abs(np.asarray(r_eval, dtype=np.float64))
        w_flat = sol.sol(np.clip(r.ravel(), r_lo, self.L))[0]
        w = np.where(r <= r_lo, sol.y[0][-1],
                     np.where(r >= self.L, 0.0, w_flat.reshape(r.shape)))
        return np.maximum(w, 0.0) ** (3.0 / 8.0)


def test_L() -> SteadyCapOnBed:
    return SteadyCapOnBed()


# ---------------------------------------------------------------- test D

def make_test_D(Cp: float = 200.0, Tp: float = 5000.0 * SEC_PER_YEAR,
                Rc: float = 450.0e3, W: float = 300.0e3):
    """Test D: oscillating annular perturbation with compensatory source.

    Returns ``(H_exact, M_comp)``.  Both take ``(t, r)`` with ``r`` an
    array of radii; ``M_comp`` is jax-traceable (usable inside the jitted
    step loop), ``H_exact`` returns numpy.  The compensatory accumulation
    ``M_c = dH/dt + div(q(H))`` is obtained by autodiff of the exact radial
    profile through the SIA flux (machine-precision equivalent of the
    reference's hand-derived C expressions).
    """
    import jax
    import jax.numpy as jnp

    cap = SteadyCap()
    n = cap.n
    G = gamma(cap.A, n)
    p = (n + 1.0) / n

    def H_of(t, r):
        inner = 2.0 * (cap.M0 / (2.0 * G)) ** (1.0 / n) * \
            jnp.maximum(cap.L ** p - r ** p, 0.0)
        Hs = inner ** (n / (2.0 * n + 2.0))
        x = (r - Rc) / W
        bump = jnp.where(jnp.abs(x) < 0.5,
                         jnp.cos(jnp.pi * x) ** 2, 0.0)
        return Hs + Cp * jnp.sin(2.0 * jnp.pi * t / Tp) * bump

    dH_dt = jax.grad(H_of, argnums=0)
    dH_dr = jax.grad(H_of, argnums=1)

    def rq(t, r):
        H = H_of(t, r)
        s = dH_dr(t, r)
        return r * G * H ** (n + 2.0) * jnp.abs(s) ** (n - 1.0) * (-s)

    drq_dr = jax.grad(rq, argnums=1)

    def M_point(t, r):
        return dH_dt(t, r) + drq_dr(t, r) / r

    M_v = jax.vmap(M_point, in_axes=(None, 0))
    H_v = jax.vmap(H_of, in_axes=(None, 0))

    def M_comp(t, r):
        """Traceable compensatory accumulation on an array of radii."""
        ra = jnp.maximum(jnp.abs(jnp.asarray(r, dtype=jnp.float64)), 1.0)
        out = M_v(t, ra.ravel()).reshape(ra.shape)
        # outside the margin the exact profile is 0; no compensation there
        return jnp.where(ra < 0.999 * cap.L, out, 0.0)

    def H_exact(t, r):
        ra = np.maximum(np.abs(np.asarray(r, dtype=np.float64)), 1.0)
        return np.asarray(H_v(float(t), ra.ravel())).reshape(ra.shape)

    return H_exact, M_comp
