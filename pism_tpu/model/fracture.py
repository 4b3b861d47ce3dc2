"""Fracture density phase field.

Rebuild of PISM ``src/fracturedensity/`` (Albrecht & Levermann 2012): a 2D
scalar phase field phi in [0, 1] advected with the vertically-averaged
velocity, with a strain-rate source above an initiation threshold, healing
below a healing threshold, and an optional rheology-softening feedback
(flow enhancement ~ (1 - (1 - eps) phi)^(-n)).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .. import state as S
from ..ops.stencils import Shifter


@dataclass
class FractureDensity:
    grid: object
    config: object

    def __post_init__(self):
        cfg = self.config
        self.gamma = cfg.get_number("fracture_density.gamma")
        self.eps_cr = cfg.get_number("fracture_density.initiation_threshold")
        self.gamma_h = cfg.get_number("fracture_density.gamma_h")
        self.eps_h = cfg.get_number("fracture_density.healing_threshold")
        self.soft_min = cfg.get_number("fracture_density.softening_lower_limit")
        self.sh = Shifter(self.grid)

    def _effective_strain_rate(self, u, v):
        sh = self.sh
        dx, dy = self.grid.dx, self.grid.dy
        ux = (sh(u, 0, 1) - sh(u, 0, -1)) / (2 * dx)
        uy = (sh(u, 1, 0) - sh(u, -1, 0)) / (2 * dy)
        vx = (sh(v, 0, 1) - sh(v, 0, -1)) / (2 * dx)
        vy = (sh(v, 1, 0) - sh(v, -1, 0)) / (2 * dy)
        return jnp.sqrt(ux ** 2 + vy ** 2 + ux * vy + 0.25 * (uy + vx) ** 2)

    def step(self, state: S.ModelState, u, v, dt) -> jnp.ndarray:
        phi = state.fracture_density
        sh = self.sh
        grid = self.grid
        # upwind advection with the vertically-averaged (membrane) velocity
        dpx = jnp.where(u >= 0, (phi - sh(phi, 0, -1)) / grid.dx,
                        (sh(phi, 0, 1) - phi) / grid.dx)
        dpy = jnp.where(v >= 0, (phi - sh(phi, -1, 0)) / grid.dy,
                        (sh(phi, 1, 0) - phi) / grid.dy)
        eps_e = self._effective_strain_rate(u, v)
        source = self.gamma * jnp.maximum(eps_e - self.eps_cr, 0.0) * (1.0 - phi)
        healing = self.gamma_h * jnp.maximum(self.eps_h - eps_e, 0.0) * phi
        phi_new = phi + dt * (-u * dpx - v * dpy + source - healing)
        icy = S.icy(state.geometry.cell_type)
        return jnp.where(icy, jnp.clip(phi_new, 0.0, 1.0), 0.0)

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
