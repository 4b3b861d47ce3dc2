"""Isochrone (deposition-layer) tracing.

Rebuild of PISM ``src/age/Isochrones`` (2.1+; Born & Robinson layer-tracing
scheme): the ice column is split into layers bounded by isochrones — surfaces
of constant deposition time. Accumulation feeds the current top layer;
surface melt consumes layers from the top, basal melt from the bottom;
horizontal transport moves layer thickness with the column's mass flux
(bulk approximation: each layer carries its proportional share of the total
staggered flux, upwinded). Layer budget closure is enforced by rescaling
the stack to the evolved ice thickness each step.

The layer count is static (fixed array dimension); new isochrones are
activated by bumping the traced ``top`` index at requested deposition
times — structure-stable for ``lax.while_loop``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .. import state as S
from ..ops import stencils as st
from ..ops.stencils import Shifter


class IsochroneState(NamedTuple):
    layers: jnp.ndarray        # (My, Mx, NL) layer thicknesses [m]
    top: jnp.ndarray           # scalar int32: index of the active top layer
    deposition_times: jnp.ndarray  # (NL,) activation times [s] (inf = unused)


@dataclass
class Isochrones:
    grid: object
    n_layers: int = 16

    def __post_init__(self):
        self.sh = Shifter(self.grid)

    def initialize(self, thickness, deposition_times_s) -> IsochroneState:
        """All current ice goes into layer 0; later layers activate at the
        given model times."""
        NL = self.n_layers
        layers = jnp.zeros(self.grid.shape2 + (NL,), thickness.dtype)
        layers = layers.at[..., 0].set(thickness)
        times = jnp.full((NL,), jnp.inf)
        times = times.at[1:1 + len(deposition_times_s)].set(
            jnp.asarray(deposition_times_s)[: NL - 1])
        return IsochroneState(layers=layers, top=jnp.asarray(0, jnp.int32),
                              deposition_times=times)

    def step(self, iso: IsochroneState, t, dt, Qe, Qn, H_old, H_new,
             smb_applied, bmb_applied) -> IsochroneState:
        """Advance the layer stack by one mass-transport step.

        Qe, Qn: limited total staggered flux [m^2/s] used for H transport;
        smb_applied/bmb_applied: effective rates [m/s] (+ = add at surface /
        remove at base).
        """
        sh = self.sh
        dx, dy = self.grid.dx, self.grid.dy
        layers = iso.layers
        NL = layers.shape[-1]

        # activate a new top layer when its deposition time has passed
        next_idx = jnp.minimum(iso.top + 1, NL - 1)
        activate = t >= iso.deposition_times[next_idx]
        top = jnp.where(activate, next_idx, iso.top)

        # --- horizontal transport: proportional share of the total flux ----
        frac = layers / jnp.maximum(H_old, 1e-9)[..., None]
        frac_e = jnp.where((Qe >= 0.0)[..., None], frac, sh(frac, 0, 1))
        frac_n = jnp.where((Qn >= 0.0)[..., None], frac, sh(frac, 1, 0))
        Qe_l = Qe[..., None] * frac_e
        Qn_l = Qn[..., None] * frac_n
        div = ((Qe_l - sh(Qe_l, 0, -1)) / dx
               + (Qn_l - sh(Qn_l, -1, 0)) / dy)
        layers = jnp.maximum(layers - dt * div, 0.0)

        # --- surface mass balance on the top layer -------------------------
        lid = jnp.arange(NL)
        is_top = lid == top
        add = jnp.maximum(smb_applied, 0.0) * dt
        layers = layers + jnp.where(is_top, add[..., None], 0.0)
        # surface melt consumes layers from the top down
        melt_s = jnp.maximum(-smb_applied, 0.0) * dt

        def melt_from_top(k, carry):
            layers, remaining = carry
            idx = top - k                       # top, top-1, ...
            valid = idx >= 0
            li = jnp.clip(idx, 0, NL - 1)
            d = layers[..., li]
            take = jnp.where(valid, jnp.minimum(d, remaining), 0.0)
            layers = layers.at[..., li].add(-take)
            return layers, remaining - take

        layers, _ = jax.lax.fori_loop(0, NL, melt_from_top, (layers, melt_s))

        # --- basal melt consumes layers from the bottom up ------------------
        melt_b = jnp.maximum(bmb_applied, 0.0) * dt

        def melt_from_bottom(k, carry):
            layers, remaining = carry
            d = layers[..., k]
            take = jnp.minimum(d, remaining)
            layers = layers.at[..., k].add(-take)
            return layers, remaining - take

        layers, _ = jax.lax.fori_loop(0, NL, melt_from_bottom, (layers, melt_b))

        # --- closure: rescale the stack to the evolved thickness -----------
        total = jnp.sum(layers, axis=-1)
        scale = jnp.where(total > 1e-9, H_new / jnp.maximum(total, 1e-9), 0.0)
        layers = layers * scale[..., None]

        return IsochroneState(layers=layers, top=top,
                              deposition_times=iso.deposition_times)

    def isochrone_depths(self, iso: IsochroneState, thickness):
        """Depth below the surface of each isochrone (layer upper boundary),
        (My, Mx, NL); the standard comparison quantity against radargrams."""
        cums = jnp.cumsum(iso.layers[..., ::-1], axis=-1)[..., ::-1]
        # depth of the top of layer l = sum of layers above it
        above = cums - iso.layers
        return above
