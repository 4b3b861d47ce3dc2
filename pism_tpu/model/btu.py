"""Bedrock thermal unit (BTU).

Rebuild of PISM ``src/energy/BTU_*`` (``BTU_Full``, ``BTU_Minimal``,
``bedrockColumn.cc``): heat conduction in a bedrock layer of thickness Lbz
below the ice, solved implicitly per column by the shared batched Thomas
kernel. Top boundary: Dirichlet at the ice basal temperature; bottom:
Neumann geothermal flux. The BTU's output is the conductive flux at the
bedrock top, which replaces the raw geothermal flux as the lower boundary
condition of the ice enthalpy solve.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..util.tridiag import solve_batched


@dataclass
class BTUMinimal:
    """No bedrock layer: passes the geothermal flux straight through."""

    grid: object
    config: object

    def init_temperature(self, T_base, geothermal):
        return None

    def step(self, bedrock_T, T_base_ice, geothermal, dt):
        return bedrock_T, geothermal


@dataclass
class BTUFull:
    grid: object
    config: object

    def __post_init__(self):
        cfg = self.config
        self.k = cfg.get_number("energy.bedrock_thermal.conductivity")
        rho = cfg.get_number("energy.bedrock_thermal.density")
        c = cfg.get_number("energy.bedrock_thermal.specific_heat_capacity")
        self.kappa = self.k / (rho * c)
        zb = np.asarray(self.grid.zb)          # -Lbz .. 0
        self.dz = float(zb[1] - zb[0])
        self.Mbz = self.grid.Mbz

    def init_temperature(self, T_base, geothermal):
        """Steady conductive profile: T(z) = T_top + (G/k)(0 - z)."""
        zb = jnp.asarray(np.asarray(self.grid.zb), T_base.dtype)
        return T_base[..., None] + (geothermal / self.k)[..., None] * (0.0 - zb)

    def step(self, bedrock_T, T_base_ice, geothermal, dt):
        """Advance bedrock temperature; return (T_new, flux_at_top).

        bedrock_T: (My, Mx, Mbz), level 0 at z=-Lbz, level Mbz-1 at z=0.
        """
        dz, kap = self.dz, self.kappa
        n = self.Mbz
        r = dt * kap / dz ** 2

        a = jnp.full(bedrock_T.shape, -r, bedrock_T.dtype)
        c = jnp.full(bedrock_T.shape, -r, bedrock_T.dtype)
        b = 1.0 + 2.0 * r + jnp.zeros_like(bedrock_T)
        d = bedrock_T

        # bottom (k=0): Neumann geothermal upward flux q = -k dT/dz = G
        # => dT/dz = -G/k => T_0 - T_1 = +G dz / k (warmer below)
        b = b.at[..., 0].set(1.0)
        c = c.at[..., 0].set(-1.0)
        d = d.at[..., 0].set(geothermal * dz / self.k)
        # top (k=n-1): Dirichlet ice basal temperature
        a = a.at[..., -1].set(0.0)
        b = b.at[..., -1].set(1.0)
        d = d.at[..., -1].set(T_base_ice)

        T_new = solve_batched(a, b, c, d)
        # conductive flux upward at the top: q = -k dT/dz
        flux_top = -self.k * (T_new[..., -1] - T_new[..., -2]) / dz
        return T_new, flux_top


def btu_from_config(grid, config):
    if grid.Mbz > 1 and grid.Lbz > 0:
        return BTUFull(grid=grid, config=config)
    return BTUMinimal(grid=grid, config=config)
