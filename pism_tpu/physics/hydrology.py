"""Subglacial hydrology.

Rebuild of PISM ``src/hydrology/``:

- ``NullTransport``: the till-water-layer ODE only (all PISM hydrology
  models share it): dW_till/dt = (rho_i/rho_w) m_b - C, clipped to
  [0, W_max]. No lateral transport.
- ``Routing``: conservative lateral routing of a transportable water layer W
  along the hydraulic potential, with its own CFL-subcycled explicit steps
  (flux q = -k W^alpha |grad psi|^(beta-2) grad psi), feeding the till layer
  first. Implemented as a fixed-count lax.fori_loop of masked upwind steps.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .. import state as S
from ..ops import stencils as st
from ..ops.stencils import Shifter


@dataclass
class NullTransport:
    """PISM ``hydrology::NullTransport``."""

    grid: object
    config: object

    def __post_init__(self):
        cfg = self.config
        self.W_max = cfg.get_number("hydrology.tillwat_max")
        self.C = cfg.get_number("hydrology.tillwat_decay_rate", "m s-1")
        self.rho_i = cfg.get_number("constants.ice.density")
        self.rho_w = cfg.get_number("constants.fresh_water.density")

    def max_timestep(self):
        return None

    def step(self, state: S.ModelState, dt) -> S.ModelState:
        W = state.tillwat
        if W is None:
            W = jnp.zeros_like(state.geometry.ice_thickness)
        m_b = state.basal_melt_rate
        if m_b is None:
            m_b = jnp.zeros_like(W)
        inflow = (self.rho_i / self.rho_w) * m_b
        W = jnp.clip(W + dt * (inflow - self.C), 0.0, self.W_max)
        # no till water under floating ice or ocean
        W = jnp.where(S.ocean(state.geometry.cell_type), 0.0, W)
        return state.replace(tillwat=W)


@dataclass
class Routing(NullTransport):
    """PISM ``hydrology::Routing``: lateral routing along the hydraulic
    potential psi = rho_w g b + P_overburden (zero till-effective-pressure
    approximation), explicit upwind with internal CFL subcycling."""

    n_subcycles: int = 8

    def __post_init__(self):
        super().__post_init__()
        cfg = self.config
        self.k = cfg.get_number("hydrology.hydraulic_conductivity")
        self.alpha = cfg.get_number("hydrology.alpha")
        self.beta_exp = cfg.get_number("hydrology.beta")
        self.g = cfg.get_number("constants.standard_gravity")
        self.sh = Shifter(self.grid)

    def max_timestep(self):
        return None

    def step(self, state: S.ModelState, dt) -> S.ModelState:
        state = NullTransport.step(self, state, dt)  # fill till layer first
        grid, sh = self.grid, self.sh
        H = state.geometry.ice_thickness
        b = state.geometry.bed_elevation
        W = state.hydro_W
        if W is None:
            W = jnp.zeros_like(H)

        # overflow of the till layer feeds the transportable layer
        m_b = state.basal_melt_rate if state.basal_melt_rate is not None else jnp.zeros_like(H)
        inflow = (self.rho_i / self.rho_w) * m_b
        overflow = jnp.where(state.tillwat >= self.W_max, inflow, 0.0)

        psi = self.rho_w * self.g * b + self.rho_i * self.g * H

        dt_sub = dt / self.n_subcycles

        def substep(W, _):
            # staggered fluxes q = -K(W, |grad psi|) grad psi
            dpx = st.grad_x_east(psi, grid.dx, sh)
            dpy = st.grad_y_north(psi, grid.dy, sh)
            gpe = jnp.sqrt(dpx ** 2 + st.grad_y_east(psi, grid.dy, sh) ** 2) + 1e-12
            gpn = jnp.sqrt(st.grad_x_north(psi, grid.dx, sh) ** 2 + dpy ** 2) + 1e-12
            # upwind W onto faces by the flux direction (downgradient)
            We = jnp.where(dpx <= 0.0, W, sh(W, 0, 1))
            Wn = jnp.where(dpy <= 0.0, W, sh(W, 1, 0))
            Ke = self.k * We ** self.alpha * gpe ** (self.beta_exp - 2.0)
            Kn = self.k * Wn ** self.alpha * gpn ** (self.beta_exp - 2.0)
            qe = -Ke * dpx
            qn = -Kn * dpy
            # donor-cell limiting to keep W >= 0
            from ..model.geometry_evolution import limit_flux
            qe, qn = limit_flux(qe, qn, W, dt_sub, grid.dx, grid.dy, sh)
            div = st.div_staggered(qe, qn, grid.dx, grid.dy, sh)
            W_new = jnp.maximum(W + dt_sub * (overflow - div), 0.0)
            W_new = jnp.where(S.ocean(state.geometry.cell_type), 0.0, W_new)
            return W_new, None

        W, _ = jax.lax.scan(substep, W, None, length=self.n_subcycles)
        return state.replace(hydro_W=W)


def hydrology_from_config(grid, config):
    name = config.get_string("hydrology.model")
    if name in ("null", ""):
        return NullTransport(grid=grid, config=config)
    if name == "routing":
        return Routing(grid=grid, config=config)
    raise ValueError(f"unknown hydrology model {name!r}")
