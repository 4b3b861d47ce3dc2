"""Fracture density phase field.

Rebuild of PISM ``src/fracturedensity/FractureDensity.cc`` (Albrecht &
Levermann 2012, The Cryosphere 6): a 2D scalar phase field phi in [0, 1]
advected with the vertically-averaged (membrane) velocity, with a
strain-rate (or stress) source above an initiation threshold, healing
below a healing threshold, a fracture-age companion field, and an
optional rheology-softening feedback
(flow enhancement ~ (1 - (1 - eps) phi)^(-n)).

Option set (config group ``fracture_density``, PISM names):

- ``gamma`` / ``initiation_threshold``: growth rate factor and the
  effective-strain-rate threshold of the default criterion,
- ``max_shear_stress``: switch the initiation criterion to the maximum
  shear stress tau_max = B eps_e^(1/n-1) (e1 - e2)/2 against
  ``initiation_stress_threshold`` (falls back to the principal
  strain-rate shear when no hardness is available),
- ``lefm``: tensile-stress criterion sigma_1 = 2 B eps_e^(1/n-1) e1
  against ``initiation_stress_threshold`` (the LEFM mode-I opening
  criterion reduced to its far-field tensile-stress form),
- ``borstad_limit``: instead of incremental growth, damage jumps to the
  Borstad et al. (2016) constitutive-envelope equilibrium
  phi_b = 1 - (eps_cr / eps_e)^(1/n) where the criterion is exceeded,
- ``gamma_h`` / ``healing_threshold`` / ``constant_healing`` /
  ``fracture_weighted_healing``: healing proportional to the shortfall
  of the largest principal strain rate below the threshold (or a
  constant rate), optionally weighted by (1 - phi),
- ``include_grounded_ice``: grow fractures on grounded ice too
  (default: floating only, the Albrecht-Levermann shelf setting),
- ``constant_fd``: freeze growth/healing — pure transport,
- ``fd2d_scheme``: minmod-limited second-order upwind transport
  (off = first-order donor cell),
- ``phi0``: fracture density pinned at inflow (velocity Dirichlet) cells,
- ``softening_lower_limit``: rheology feedback (consumed by the SSA's
  hardness computation; 1 = off).

[The reference mount was empty at survey time; semantics re-derived from
the published model description and the upstream option list.]
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax.numpy as jnp

from .. import state as S
from ..ops.stencils import Shifter


class FractureStep(NamedTuple):
    density: jnp.ndarray
    age: Optional[jnp.ndarray]


def _minmod(a, b):
    return jnp.where(a * b <= 0.0, 0.0,
                     jnp.where(jnp.abs(a) < jnp.abs(b), a, b))


@dataclass
class FractureDensity:
    grid: object
    config: object
    bc_mask: object = None      # inflow (velocity Dirichlet) cells -> phi0

    def __post_init__(self):
        cfg = self.config
        self.gamma = cfg.get_number("fracture_density.gamma")
        self.eps_cr = cfg.get_number("fracture_density.initiation_threshold")
        self.sigma_cr = cfg.get_number(
            "fracture_density.initiation_stress_threshold")
        self.gamma_h = cfg.get_number("fracture_density.gamma_h")
        self.eps_h = cfg.get_number("fracture_density.healing_threshold")
        self.soft_min = cfg.get_number("fracture_density.softening_lower_limit")
        self.phi0 = cfg.get_number("fracture_density.phi0")
        self.constant_fd = cfg.get_flag("fracture_density.constant_fd")
        self.constant_healing = cfg.get_flag(
            "fracture_density.constant_healing")
        self.weighted_healing = cfg.get_flag(
            "fracture_density.fracture_weighted_healing")
        self.include_grounded = cfg.get_flag(
            "fracture_density.include_grounded_ice")
        self.max_shear = cfg.get_flag("fracture_density.max_shear_stress")
        self.lefm = cfg.get_flag("fracture_density.lefm")
        self.borstad = cfg.get_flag("fracture_density.borstad_limit")
        self.limited = cfg.get_flag("fracture_density.fd2d_scheme")
        self.n_glen = cfg.get_number("stress_balance.ssa.Glen_exponent")
        self.sh = Shifter(self.grid)

    # -- kinematics -------------------------------------------------------

    def _strain_rates(self, u, v):
        """(e1, e2, eps_e): principal strain rates and the SSA effective
        strain rate sqrt(exx^2 + eyy^2 + exx eyy + exy^2)."""
        sh = self.sh
        dx, dy = self.grid.dx, self.grid.dy
        exx = (sh(u, 0, 1) - sh(u, 0, -1)) / (2 * dx)
        eyy = (sh(v, 1, 0) - sh(v, -1, 0)) / (2 * dy)
        uy = (sh(u, 1, 0) - sh(u, -1, 0)) / (2 * dy)
        vx = (sh(v, 0, 1) - sh(v, 0, -1)) / (2 * dx)
        exy = 0.5 * (uy + vx)
        mean = 0.5 * (exx + eyy)
        rad = jnp.sqrt((0.5 * (exx - eyy)) ** 2 + exy ** 2)
        eps_e = jnp.sqrt(exx ** 2 + eyy ** 2 + exx * eyy + exy ** 2)
        return mean + rad, mean - rad, eps_e

    def _advect(self, q, u, v):
        """Advective-form transport term -(u q_x + v q_y). With
        ``fd2d_scheme`` on this is a minmod-MUSCL flux-form update plus
        the compressibility correction q div(u) (so the scheme is TVD and
        exactly mass-conserving for divergence-free flow, yet still
        advective — divergent flow does not concentrate the phase field);
        off = plain donor-cell gradients."""
        sh = self.sh
        dx, dy = self.grid.dx, self.grid.dy
        if not self.limited:
            qx = jnp.where(u >= 0, (q - sh(q, 0, -1)) / dx,
                           (sh(q, 0, 1) - q) / dx)
            qy = jnp.where(v >= 0, (q - sh(q, -1, 0)) / dy,
                           (sh(q, 1, 0) - q) / dy)
            return -(u * qx + v * qy)

        def axis_term(off, vel, h):
            east = lambda a: sh(a, *off)
            west = lambda a: sh(a, *(-o for o in off))
            slope = _minmod(q - west(q), east(q) - q)
            qL = q + 0.5 * slope                       # left state at + face
            qR = east(q) - 0.5 * east(slope)           # right state at + face
            uf = 0.5 * (vel + east(vel))
            F_e = uf * jnp.where(uf >= 0, qL, qR)
            F_w, uf_w = west(F_e), west(uf)
            return -(F_e - F_w) / h + q * (uf - uf_w) / h

        return axis_term((0, 1), u, dx) + axis_term((1, 0), v, dy)

    # -- physics ----------------------------------------------------------

    def _criterion(self, e1, e2, eps_e, hardness):
        """(exceeded mask, 'spreading' measure entering the Borstad
        envelope). Stress criteria use sigma = B eps_e^(1/n-1) * (...)
        from the constitutive law when a vertically-averaged hardness B
        is supplied; they degrade to strain-rate criteria otherwise."""
        if (self.max_shear or self.lefm) and hardness is not None:
            visc = hardness * jnp.maximum(eps_e, 1e-30) ** (1.0 / self.n_glen - 1.0)
            stress = visc * 0.5 * (e1 - e2) if self.max_shear \
                else 2.0 * visc * e1
            return stress > self.sigma_cr
        if self.max_shear:
            return 0.5 * (e1 - e2) > self.eps_cr
        if self.lefm:
            return e1 > self.eps_cr
        return eps_e > self.eps_cr

    def step(self, state: S.ModelState, u, v, dt, hardness=None,
             age=None) -> FractureStep:
        """One explicit step of (phi, fracture_age). ``age`` defaults to
        ``state.fracture_age``; pass ``hardness`` (vertically-averaged B)
        to enable the stress-based criteria."""
        phi = state.fracture_density
        if age is None:
            age = state.fracture_age
        e1, e2, eps_e = self._strain_rates(u, v)
        icy = S.icy(state.geometry.cell_type)

        phi_new = phi + dt * self._advect(phi, u, v)
        growing = jnp.zeros_like(phi, bool)
        if not self.constant_fd:
            region = icy if self.include_grounded \
                else S.floating_ice(state.geometry.cell_type)
            exceed = self._criterion(e1, e2, eps_e, hardness) & region
            if self.borstad:
                # equilibrium damage from inverting the constitutive law
                # (Borstad et al. 2016): ice at eps_e carries the
                # threshold stress once phi = 1 - (eps_cr/eps_e)^(1/n)
                phi_b = 1.0 - (self.eps_cr /
                               jnp.maximum(eps_e, 1e-30)) ** (1.0 / self.n_glen)
                target = jnp.where(exceed, jnp.maximum(phi_b, 0.0), 0.0)
                growing = exceed & (target > phi_new)
                phi_new = jnp.where(growing, target, phi_new)
            else:
                source = self.gamma * jnp.maximum(e1, 0.0) * (1.0 - phi)
                growing = exceed & (source > 0.0)
                phi_new = phi_new + dt * jnp.where(exceed, source, 0.0)

            if self.constant_healing:
                heal = self.gamma_h * self.eps_h
            else:
                heal = self.gamma_h * jnp.maximum(self.eps_h - e1, 0.0)
            if self.weighted_healing:
                heal = heal * (1.0 - phi)
            phi_new = phi_new - dt * heal

        phi_new = jnp.where(icy, jnp.clip(phi_new, 0.0, 1.0), 0.0)
        if self.bc_mask is not None:
            phi_new = jnp.where(jnp.asarray(self.bc_mask, bool),
                                self.phi0, phi_new)

        age_new = None
        if age is not None:
            age_new = age + dt * self._advect(age, u, v) + dt
            age_new = jnp.where(growing, 0.0, age_new)   # fresh fractures
            age_new = jnp.where(icy & (phi_new > 0.0),
                                jnp.maximum(age_new, 0.0), 0.0)
        return FractureStep(density=phi_new, age=age_new)

    def flow_enhancement(self, phi, n_glen=3.0):
        """Softening feedback: multiply ice softness by
        (1 - (1 - eps) phi)^(-n), eps = softening_lower_limit (PISM
        ``fracture_density`` softening: the hardness multiplier
        1 - (1-eps) phi is bounded below by eps). eps = 1 disables it."""
        if self.soft_min == 1.0:
            return jnp.ones_like(phi)
        eps = self.soft_min
        hard = jnp.maximum(1.0 - (1.0 - eps) * phi, eps)
        return hard ** (-n_glen)
