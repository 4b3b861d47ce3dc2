"""Manufactured-solution verification of the thermo-coupled SIA.

Fills the role of PISM's verification tests F/G (``src/verification/``,
Bueler et al. 2007: exact thermomechanically coupled solutions built from
hand-derived series with compensatory sources). Instead of transcribing
those series, the compensatory source is computed here by automatic
differentiation of the CONTINUOUS flux law: choose closed-form fields
H(r) and T(r, z), define the exact radial flux

    q_r(r) = -2 (rho g)^n |s'(r)|^(n-1) s'(r)
             * int_0^H A(T(r, z)) (H - z)^(n+1) dz

with the z-integral by fixed-order Gauss-Legendre quadrature, and obtain
the steady compensatory mass balance from the exact divergence

    M_c(r) = (1/r) d(r q_r)/dr        (radial symmetry)

via ``jax.grad`` — exact to quadrature/roundoff, no truncation error and
no hand-derived series to mis-transcribe. Feeding (M_c, T) to the model
and starting at the exact H, any drift is purely the discretization error
of the coupled diffusivity + transport scheme; it must shrink under grid
refinement. This is the same verification contract as test F (steady;
test G adds a time-periodic wobble, reproducible here by making H depend
on t — not yet wired).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

SPY = 3.15569259747e7


@dataclass
class ManufacturedThermoSIA:
    """Test-F-like steady dome with a prescribed temperature field.

    H(r) = H0 (1 - (r/L)^p)^q for r < L (smooth, margin-flat enough that
    the compensatory SMB stays bounded); T(r, z) warms toward the base
    with a Gaussian radial modulation. Softness is the cold branch of
    Paterson-Budd, matching the model configured with flow law "pb" below
    the critical temperature.
    """

    H0: float = 3000.0          # m, center thickness
    L: float = 600e3            # m, margin radius
    p: float = 2.0
    q: float = 1.0
    Ts: float = 243.15          # K, surface temperature
    dTb: float = 25.0           # K, basal warming at the center
    n: float = 3.0
    rho: float = 910.0
    g: float = 9.81
    # Paterson-Budd two-branch Arrhenius on the PRESSURE-ADJUSTED
    # temperature — must match the model's "pb" flow law exactly
    A_cold: float = 3.610e-13   # Pa^-3 s^-1
    A_warm: float = 1.730e3
    Q_cold: float = 6.0e4       # J/mol
    Q_warm: float = 13.9e4
    T_critical: float = 263.15
    R: float = 8.31441
    beta_cc: float = 7.9e-8     # Clausius-Clapeyron [K/Pa]
    p_air: float = 101325.0
    nz_quad: int = 64

    def thickness(self, r):
        x = jnp.clip(jnp.abs(r) / self.L, 0.0, 1.0)
        return self.H0 * (1.0 - x ** self.p) ** self.q

    def temperature(self, r, z):
        """T(r, z): surface value plus basal warming decaying with height
        and radius (bounded, smooth)."""
        H = self.thickness(r)
        zeta = jnp.clip(z / jnp.maximum(H, 1.0), 0.0, 1.0)
        radial = jnp.exp(-(r / (0.6 * self.L)) ** 2)
        return self.Ts + self.dTb * radial * (1.0 - zeta) ** 2

    def softness(self, T, depth):
        """Paterson-Budd softness on the pressure-adjusted temperature
        T_pa = T + beta_cc p (exactly the model's "pb" law)."""
        p = self.p_air + self.rho * self.g * jnp.maximum(depth, 0.0)
        T_pa = T + self.beta_cc * p
        A = jnp.where(T_pa < self.T_critical, self.A_cold, self.A_warm)
        Q = jnp.where(T_pa < self.T_critical, self.Q_cold, self.Q_warm)
        return A * jnp.exp(-Q / (self.R * T_pa))

    # -- exact flux and compensatory mass balance --------------------------
    def _gauss(self):
        x, w = np.polynomial.legendre.leggauss(self.nz_quad)
        return jnp.asarray(0.5 * (x + 1.0)), jnp.asarray(0.5 * w)

    def flux(self, r):
        """Exact radial volume flux q_r(r) [m^2/s] (scalar r)."""
        zeta, w = self._gauss()
        H = self.thickness(r)
        dsdr = jax.grad(self.thickness)(r)   # flat bed: s = H
        z = zeta * H
        K = H * jnp.sum(w * self.softness(self.temperature(r, z), H - z)
                        * (H - z) ** (self.n + 1.0))
        D = 2.0 * (self.rho * self.g) ** self.n \
            * jnp.abs(dsdr) ** (self.n - 1.0) * K
        return -D * dsdr

    def compensatory_smb(self, r):
        """M_c(r) = div q = (1/r) d(r q_r)/dr, exact via autodiff."""
        r = jnp.maximum(jnp.abs(r), 1e-3)
        dq = jax.grad(lambda rr: rr * self.flux(rr))(r)
        return dq / r

    # -- model-facing fields ------------------------------------------------
    def setup(self, grid, config):
        """Build (initial state, surface model) for IceModel: exact H,
        enthalpy from the exact T, compensatory SMB as the climate."""
        from ..config.config import Config
        from ..coupler.surface import FunctionSurface
        from ..physics.enthalpy_converter import EnthalpyConverter
        from ..state import ModelState, new_geometry

        r2d = jnp.asarray(grid.radius)
        H = self.thickness(r2d)
        geometry = new_geometry(H, jnp.zeros(grid.shape2))

        EC = EnthalpyConverter.from_config(config)
        z = jnp.asarray(grid.z)
        T3 = self.temperature(r2d[..., None], z[None, None, :])
        depth = jnp.maximum(H[..., None] - z[None, None, :], 0.0)
        p3 = EC.pressure(depth)
        E = EC.enthalpy(jnp.minimum(T3, EC.melting_temperature(p3)),
                        jnp.zeros_like(T3), p3)

        Mc = jax.vmap(jax.vmap(self.compensatory_smb))(r2d)
        Mc = jnp.where(r2d < 0.999 * self.L, Mc, -0.1 / SPY)
        Ts2d = self.temperature(r2d, H)

        def climate(geometry, t):
            dt_ = geometry.ice_thickness.dtype
            return Mc.astype(dt_), Ts2d.astype(dt_)

        state = ModelState(geometry=geometry, enthalpy=E)
        return state, FunctionSurface(climate)


@dataclass
class ManufacturedThermoSIAPeriodic(ManufacturedThermoSIA):
    """Test-G role: the steady manufactured dome of the base class with a
    time-periodic thickness wobble superposed (PISM's test G is test F plus
    a sinusoidal perturbation; reference ``src/verification/tests``,
    Bueler et al. 2007),

        H(t, r) = H_F(r) * (1 + a sin(2 pi t / Tp) exp(-(r / sigma)^2)),

    and a compensatory mass balance that is exact for the TIME-DEPENDENT
    problem,

        M_c(t, r) = dH/dt + (1/r) d(r q_r(t, r))/dr,

    with both terms by autodiff.  The temperature field is held at the
    steady field T(r, z) of the base class (evaluated against the steady
    thickness), so the prescribed-enthalpy model state remains exact for
    all t while the flux integral still sees the oscillating geometry:

        q_r(t, r) = -2 (rho g)^n |dH/dr|^(n-1) dH/dr
                    * int_0^{H(t)} A(T(r, z)) (H(t) - z)^(n+1) dz.

    After an integer number of periods the exact solution returns to the
    initial state, so the drift |H_num(Tp) - H_F| is pure discretization
    error of the coupled transient scheme.
    """

    amplitude: float = 0.1          # relative wobble at the dome
    period: float = 1000.0 * SPY    # s
    sigma_frac: float = 0.4         # radial extent of the wobble / L

    def thickness_t(self, t, r):
        wob = self.amplitude * jnp.sin(2.0 * jnp.pi * t / self.period) \
            * jnp.exp(-(r / (self.sigma_frac * self.L)) ** 2)
        return self.thickness(r) * (1.0 + wob)

    def flux_t(self, t, r):
        """Exact radial flux at time t (scalar t, r)."""
        zeta, w = self._gauss()
        H = self.thickness_t(t, r)
        dsdr = jax.grad(self.thickness_t, argnums=1)(t, r)
        z = zeta * H
        # T frozen at the steady field (see class docstring)
        K = H * jnp.sum(w * self.softness(self.temperature(r, z), H - z)
                        * jnp.maximum(H - z, 0.0) ** (self.n + 1.0))
        D = 2.0 * (self.rho * self.g) ** self.n \
            * jnp.abs(dsdr) ** (self.n - 1.0) * K
        return -D * dsdr

    def compensatory_smb_t(self, t, r):
        """M_c(t, r) = dH/dt + div q, exact via autodiff (scalars)."""
        r = jnp.maximum(jnp.abs(r), 1e-3)
        dHdt = jax.grad(self.thickness_t, argnums=0)(t, r)
        dq = jax.grad(lambda rr: rr * self.flux_t(t, rr), argnums=0)(r)
        return dHdt + dq / r

    def setup(self, grid, config):
        """Initial state at t = 0 (the steady dome) plus a time-dependent
        compensatory climate evaluated inside the jitted step."""
        from ..coupler.surface import FunctionSurface
        from ..state import ModelState

        state, _ = ManufacturedThermoSIA.setup(self, grid, config)
        r2d = jnp.asarray(grid.radius)
        Ts2d = self.temperature(r2d, self.thickness(r2d))
        mc_grid = jax.vmap(jax.vmap(self.compensatory_smb_t, (None, 0)),
                           (None, 0))

        def climate(geometry, t):
            dt_ = geometry.ice_thickness.dtype
            Mc = mc_grid(jnp.asarray(t, r2d.dtype), r2d)
            Mc = jnp.where(r2d < 0.999 * self.L, Mc, -0.1 / SPY)
            return Mc.astype(dt_), Ts2d.astype(dt_)

        return state, FunctionSurface(climate)
