"""Ocean boundary models (sub-shelf melt).

Rebuild of PISM ``src/coupler/ocean/``: models supply the sub-shelf basal
melt rate [m/s ice equivalent] (+ = melting) and the sub-shelf water
temperature, given geometry and time. ``Constant``, ``PIK`` (melt scaled by
depth; Martin et al. 2011), ``GivenTH`` (Holland & Jenkins 1999 3-equation
melt from ambient T, S), and the PICO box model live in ``pico.py``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from .. import state as S
from ..util.units import SEC_PER_YEAR


class OceanInputs(NamedTuple):
    shelf_base_melt: jnp.ndarray     # m/s ice equivalent (+ = melt)
    shelf_base_temperature: jnp.ndarray  # K at the ice-shelf base


class OceanModel:
    def __call__(self, geometry, t):
        """Return melt rate only (IceModel consumes this); use ``inputs``
        for the full set."""
        return self.inputs(geometry, t).shelf_base_melt

    def inputs(self, geometry, t) -> OceanInputs:
        raise NotImplementedError

    @staticmethod
    def _draft(geometry, rho_i=910.0, rho_w=1028.0):
        """Ice draft (depth of shelf base below sea level), >= 0."""
        return jnp.maximum(
            geometry.sea_level - (geometry.ice_surface_elevation
                                  - geometry.ice_thickness), 0.0)


@dataclass
class Constant(OceanModel):
    """PISM ``-ocean constant``: melt from a constant heat flux into the
    shelf base (or a prescribed rate)."""

    config: object = None
    melt_rate: Optional[float] = None   # m/s ice equivalent; overrides flux

    def __post_init__(self):
        cfg = self.config
        self.rho_i = cfg.get_number("constants.ice.density")
        self.L = cfg.get_number("constants.fresh_water.latent_heat_of_fusion")
        self.heat_flux = cfg.get_number("ocean.sub_shelf_heat_flux_into_ice")
        if self.melt_rate is None:
            self.melt_rate = cfg.get_number("ocean.constant.melt_rate", "m s-1")

    def inputs(self, geometry, t) -> OceanInputs:
        H = geometry.ice_thickness
        rate = self.melt_rate + self.heat_flux / (self.rho_i * self.L)
        melt = jnp.full(H.shape, rate, H.dtype)
        # pressure-melting temperature at the shelf base
        draft = self._draft(geometry)
        T = 273.15 - 7.9e-8 * (self.rho_i * 9.81 * jnp.maximum(H, 0.0))
        return OceanInputs(melt, T)


@dataclass
class PIK(OceanModel):
    """PISM ``-ocean pik`` (Martin et al. 2011): melt proportional to the
    pressure-melting-point depression at the shelf draft."""

    config: object = None

    def __post_init__(self):
        cfg = self.config
        self.rho_i = cfg.get_number("constants.ice.density")
        self.rho_w = cfg.get_number("constants.sea_water.density")
        self.c_w = cfg.get_number("constants.sea_water.specific_heat_capacity")
        self.L = cfg.get_number("constants.fresh_water.latent_heat_of_fusion")
        self.melt_factor = cfg.get_number("ocean.pik_melt_factor")
        self.T_ocean = 271.15  # PISM: -2 degC ambient

    def inputs(self, geometry, t) -> OceanInputs:
        draft = self._draft(geometry, self.rho_i, self.rho_w)
        # potential temperature above in-situ freezing point at the draft
        T_f = 273.15 - 0.0575 * 35.0 + 0.0832e-2 - 7.64e-4 * draft  # Beckmann-Goosse
        dT = jnp.maximum(self.T_ocean - T_f, 0.0)
        gamma_T = 1e-4
        melt = (self.melt_factor * self.rho_w * self.c_w * gamma_T
                / (self.rho_i * self.L)) * dT
        return OceanInputs(melt, T_f)


@dataclass
class GivenTH(OceanModel):
    """PISM ``-ocean th``: Holland & Jenkins (1999) 3-equation sub-shelf
    melt from ambient potential temperature and salinity fields.

    The three interface equations (liquidus T_b = a S_b + b + c z_b; heat
    balance rho_w c_w gamma_T (theta_o - T_b) = m rho_i [L + c_i (T_b -
    T_ice)]; salt balance rho_w gamma_S (S_o - S_b) = m rho_i S_b) reduce
    to one quadratic in the interface salinity S_b — solved in closed form
    per cell, so the whole coupler is a handful of fused elementwise ops.
    Positive melt dilutes (S_b < S_o); freeze-on concentrates. With
    ``ocean.th.two_equation`` the salt equation is dropped (S_b = S_o),
    recovering the simplified form.
    """

    theta_ocean: jnp.ndarray       # K, ambient potential temperature
    salinity_ocean: jnp.ndarray    # g/kg
    config: object = None

    #: Holland & Jenkins liquidus: T_f = a S + b + c z  (z < 0 below sl)
    LIQ_A = -0.0575
    LIQ_B = 273.15 + 0.0832e-2
    LIQ_C = 7.53e-4  # K/m, applied to z (negative below sea level)

    def __post_init__(self):
        cfg = self.config
        self.rho_i = cfg.get_number("constants.ice.density")
        self.rho_w = cfg.get_number("constants.sea_water.density")
        self.c_w = cfg.get_number("constants.sea_water.specific_heat_capacity")
        self.c_i = cfg.get_number("constants.ice.specific_heat_capacity")
        self.L = cfg.get_number("constants.fresh_water.latent_heat_of_fusion")
        self.gamma_T = cfg.get_number("ocean.th.gamma_T")
        self.gamma_S = cfg.get_number("ocean.th.gamma_S")
        self.T_ice = cfg.get_number("ocean.th.ice_temperature")
        self.two_eq = cfg.get_flag("ocean.th.two_equation")

    def inputs(self, geometry, t) -> OceanInputs:
        draft = self._draft(geometry, self.rho_i, self.rho_w)
        dtype = geometry.ice_thickness.dtype
        S_o = jnp.asarray(self.salinity_ocean, dtype)
        theta = jnp.asarray(self.theta_ocean, dtype)
        a, b = self.LIQ_A, self.LIQ_B
        Tz = b - self.LIQ_C * draft          # liquidus at S = 0, z = -draft
        cw_gT = self.c_w * self.gamma_T
        gS = self.gamma_S

        if self.two_eq:
            T_b = a * S_o + Tz
            dT = jnp.maximum(theta - T_b, 0.0)
            melt = (self.rho_w * cw_gT / (self.rho_i * self.L)) * dT
            return OceanInputs(melt, T_b)

        # quadratic A S_b^2 + B S_b + C = 0 from eliminating m and T_b
        Li = self.L + self.c_i * (Tz - self.T_ice)
        A = a * (gS * self.c_i - cw_gT)
        Bq = cw_gT * (theta - Tz) + gS * Li - gS * S_o * self.c_i * a
        C = -gS * S_o * Li
        disc = jnp.sqrt(jnp.maximum(Bq * Bq - 4.0 * A * C, 0.0))
        # A < 0 for physical coefficients; the root with S_b > 0 is
        # (-B + disc)/(2A) written stably via the product form
        S_b = (2.0 * C) / (-Bq - disc)
        S_b = jnp.clip(S_b, 1.0, 2.0 * jnp.maximum(S_o, 1.0))
        T_b = a * S_b + Tz
        melt = (self.rho_w * gS / self.rho_i) * (S_o - S_b) / \
            jnp.maximum(S_b, 1.0)
        return OceanInputs(melt, T_b)


@dataclass
class Anomaly(OceanModel):
    """Additive melt anomaly on top of an inner model."""

    inner: OceanModel
    anomaly: jnp.ndarray  # m/s

    def inputs(self, geometry, t) -> OceanInputs:
        o = self.inner.inputs(geometry, t)
        return OceanInputs(o.shelf_base_melt + jnp.asarray(self.anomaly),
                           o.shelf_base_temperature)
