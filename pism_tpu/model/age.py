"""Ice age transport (and isochrone tracking support).

Rebuild of PISM ``src/age/`` (``AgeModel``, ``AgeColumnSystem``):
dA/dt + u A_x + v A_y + w A_z = 1, with horizontal advection explicit
first-order upwind and vertical advection implicit upwind per column — the
same batched-bidiagonal structure as the energy solve, solved by the shared
Thomas kernel over all columns at once.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from .. import state as S
from ..ops.sia3d import SIA3D
from ..ops.stencils import Shifter
from ..util.tridiag import solve_batched


@dataclass
class AgeModel:
    grid: object
    config: object

    def __post_init__(self):
        self.sh = Shifter(self.grid)
        z = np.asarray(self.grid.z)
        self.dz = jnp.asarray(np.diff(z))
        self.z = jnp.asarray(z)

    def step(self, state: S.ModelState, sia3: SIA3D, dt) -> jnp.ndarray:
        A = state.age
        H = state.geometry.ice_thickness
        grid, sh = self.grid, self.sh
        z, dz = self.z.astype(A.dtype), self.dz.astype(A.dtype)
        Hc = H[..., None]

        u, v, w = sia3.u, sia3.v, sia3.w
        dAdx_up = jnp.where(u >= 0.0, (A - sh(A, 0, -1)) / grid.dx,
                            (sh(A, 0, 1) - A) / grid.dx)
        dAdy_up = jnp.where(v >= 0.0, (A - sh(A, -1, 0)) / grid.dy,
                            (sh(A, 1, 0) - A) / grid.dy)
        rhs = A + dt * (1.0 - u * dAdx_up - v * dAdy_up)

        dz_l = jnp.concatenate([dz[:1], dz])
        dz_u = jnp.concatenate([dz, dz[-1:]])
        w_pos = jnp.maximum(w, 0.0)
        w_neg = jnp.minimum(w, 0.0)
        a = -dt * w_pos / dz_l
        c = dt * w_neg / dz_u
        b = 1.0 - a - c

        # surface & above: new ice has age 0 (accumulation); base: w ~ 0 or
        # melting, the upwind scheme needs no extra row
        is_air = z > Hc
        a = jnp.where(is_air, 0.0, a)
        c = jnp.where(is_air, 0.0, c)
        b = jnp.where(is_air, 1.0, b)
        d = jnp.where(is_air, 0.0, rhs)

        A_new = solve_batched(a, b, c, d)
        icy = S.icy(state.geometry.cell_type)
        A_new = jnp.where(icy[..., None], jnp.maximum(A_new, 0.0), 0.0)
        return A_new
