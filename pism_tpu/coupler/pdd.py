"""Positive-degree-day (temperature index) surface mass balance.

Rebuild of PISM ``surface::TemperatureIndex`` + ``localMassBalance.cc``: the
expected positive degree days come from the Calov & Greve (2005) integral
over a yearly temperature cycle with Gaussian daily variability sigma,

    E[max(T, 0)] = sigma/sqrt(2 pi) exp(-T^2 / (2 sigma^2))
                   + (T/2) erfc(-T / (sqrt(2) sigma)),

accumulated over N sub-year intervals; snow falls when air temperature is
below a threshold (linear transition); PDDs melt snow first (factor_snow),
a fraction of snow melt refreezes, remaining PDDs melt ice (factor_ice).
The whole computation is a fused ``lax.fori_loop`` over the yearly cycle per
step — one vectorized pass over the grid per interval.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from ..util.units import SEC_PER_YEAR
from .atmosphere import AtmosphereModel
from .surface import SurfaceInputs, SurfaceModel


def expected_pdd_rate(T, T_threshold, sigma):
    """Calov-Greve expectation of max(T - T_threshold, 0) [K] per unit time."""
    dT = T - T_threshold
    sig = jnp.maximum(sigma, 1e-3)
    z = dT / (jnp.sqrt(2.0) * sig)
    return (sig / jnp.sqrt(2.0 * jnp.pi) * jnp.exp(-z ** 2)
            + 0.5 * dT * jax.scipy.special.erfc(-z))


@dataclass
class TemperatureIndex(SurfaceModel):
    """PDD surface model (PISM ``-surface pdd``)."""

    atmosphere: AtmosphereModel
    config: object = None
    n_intervals: int = 52   # weekly sub-year resolution, PISM default-ish

    def __post_init__(self):
        cfg = self.config
        self.factor_snow = cfg.get_number("surface.pdd.factor_snow", "m K-1 s-1")
        self.factor_ice = cfg.get_number("surface.pdd.factor_ice", "m K-1 s-1")
        self.refreeze = cfg.get_number("surface.pdd.refreeze")
        self.sigma = cfg.get_number("surface.pdd.std_dev.value")
        self.T_melt = cfg.get_number("surface.pdd.positive_threshold_temp")
        self.T_all_snow = cfg.get_number("surface.pdd.air_temp_all_precip_as_snow")
        self.T_all_rain = cfg.get_number("surface.pdd.air_temp_all_precip_as_rain")
        self.rho_i = cfg.get_number("constants.ice.density")
        self.rho_w = cfg.get_number("constants.fresh_water.density")

    def __call__(self, geometry, t) -> SurfaceInputs:
        atm = self.atmosphere(geometry, t)
        Ta, Tj, precip = atm.temperature, atm.temperature_july, atm.precipitation
        dtype = Ta.dtype
        N = self.n_intervals
        dt_i = SEC_PER_YEAR / N

        def interval(k, carry):
            smb, snow = carry
            frac = (k + 0.5) / N
            T = Ta + (Tj - Ta) * jnp.cos(2.0 * jnp.pi * (frac - 0.5))
            # snow fraction of precipitation: 1 below T_all_snow, 0 above rain
            sf = jnp.clip((self.T_all_rain - T)
                          / (self.T_all_rain - self.T_all_snow), 0.0, 1.0)
            snowfall = precip * sf * dt_i            # m ice equivalent
            snow = snow + snowfall
            # degree-day supply this interval [K s] -> [K day]
            pdd = expected_pdd_rate(T, self.T_melt, self.sigma) * dt_i / 86400.0
            # melt snow first
            snow_melt_cap = self.factor_snow * 86400.0 * pdd
            snow_melt = jnp.minimum(snow, snow_melt_cap)
            pdd_left = jnp.where(snow_melt_cap > 0,
                                 pdd * (1.0 - snow_melt / jnp.maximum(snow_melt_cap, 1e-30)),
                                 pdd)
            ice_melt = self.factor_ice * 86400.0 * pdd_left
            refrozen = self.refreeze * snow_melt
            smb = smb + snowfall - snow_melt - ice_melt + refrozen
            snow = snow - snow_melt
            return smb, snow

        smb0 = jnp.zeros_like(Ta)
        smb, snow = jax.lax.fori_loop(0, N, interval, (smb0, smb0))
        # annual-mean SMB rate [m/s ice equivalent]
        smb_rate = smb / SEC_PER_YEAR
        # ice surface temperature: annual mean air temp, capped at melting
        T_surf = jnp.minimum(Ta, 273.15)
        return SurfaceInputs(smb=smb_rate.astype(dtype), temperature=T_surf)
