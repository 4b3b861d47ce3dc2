"""Atmosphere boundary models.

Rebuild of PISM ``src/coupler/atmosphere/``: models supply near-surface air
temperature [K] and precipitation [m/s ice equivalent] as functions of
geometry and model time; "modifier" models chain on top (lapse-rate
elevation corrections, scalar offsets). All are pure callables usable
inside jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp

from ..util.units import SEC_PER_YEAR


class AtmosphereInputs(NamedTuple):
    temperature: jnp.ndarray      # mean-annual near-surface air temp [K]
    temperature_july: jnp.ndarray  # mean summer temp [K] (for yearly cycles)
    precipitation: jnp.ndarray    # [m/s ice equivalent]


class AtmosphereModel:
    #: day of year of the summer temperature peak of the cosine annual
    #: cycle (reference atmosphere.fausto_air_temp.summer_peak_day; the
    #: factory overrides it from the config)
    summer_peak_day: float = 182.5

    def __call__(self, geometry, t) -> AtmosphereInputs:
        raise NotImplementedError

    def temperature_at(self, geometry, t, year_fraction):
        """Instantaneous air temperature within the yearly cycle (PISM
        ``AtmosphereModel::temp_time_series``): cosine cycle peaking on
        ``summer_peak_day``."""
        a = self(geometry, t)
        Ta, Tj = a.temperature, a.temperature_july
        peak = self.summer_peak_day / 365.0
        cycle = jnp.cos(2.0 * jnp.pi * (year_fraction - peak))
        return Ta + (Tj - Ta) * cycle


@dataclass
class Uniform(AtmosphereModel):
    temperature: float = 263.15
    temperature_july: Optional[float] = None
    precipitation: float = 0.0  # m/s ice equivalent

    def __call__(self, geometry, t) -> AtmosphereInputs:
        shp = geometry.ice_thickness.shape
        dt_ = geometry.ice_thickness.dtype
        Tj = self.temperature_july if self.temperature_july is not None \
            else self.temperature
        return AtmosphereInputs(
            jnp.full(shp, self.temperature, dt_),
            jnp.full(shp, Tj, dt_),
            jnp.full(shp, self.precipitation, dt_))


@dataclass
class Given(AtmosphereModel):
    """Prescribed fields (PISM ``-atmosphere given``): either single time
    slices or ``(Nt, My, Mx)`` stacks with a ``times`` axis [s].  Following
    the reference's I/O semantics, air temperature is interpolated
    piecewise-linearly in time while precipitation (a mass flux with
    ``cell_methods = "time: mean"``) is piecewise-constant over its
    intervals.  ``period`` > 0 periodizes the forcing (PISM
    ``atmosphere.given.periodic``), e.g. a 1-year monthly climatology
    cycled forever.  With a time axis the model reports the instantaneous
    temperature (``temperature_july`` left equal to it), so the PDD/dEBM
    cosine cycle reconstruction drops out and sub-year forcing is seen
    directly."""

    temperature: jnp.ndarray
    precipitation: jnp.ndarray
    temperature_july: Optional[jnp.ndarray] = None
    times: Optional[jnp.ndarray] = None    # (Nt,) [s], sorted
    period: float = 0.0                    # [s]; > 0 cycles the series

    def _t(self, t):
        times = jnp.asarray(self.times)
        if self.period > 0.0:
            t0 = times[0]
            t = t0 + jnp.mod(t - t0, self.period)
        return t, times

    def _linear(self, field, t, dtype):
        f = jnp.asarray(field, dtype)
        if self.times is None or f.ndim == 2:
            return f
        tt, times = self._t(t)
        k = jnp.clip(jnp.searchsorted(times, tt, side="right") - 1,
                     0, times.shape[0] - 2)
        w = jnp.clip((tt - times[k]) / jnp.maximum(times[k + 1] - times[k],
                                                   1e-30), 0.0, 1.0)
        return (1.0 - w.astype(dtype)) * f[k] + w.astype(dtype) * f[k + 1]

    def _constant(self, field, t, dtype):
        f = jnp.asarray(field, dtype)
        if self.times is None or f.ndim == 2:
            return f
        tt, times = self._t(t)
        k = jnp.clip(jnp.searchsorted(times, tt, side="right") - 1,
                     0, times.shape[0] - 1)
        return f[k]

    def __call__(self, geometry, t) -> AtmosphereInputs:
        dt_ = geometry.ice_thickness.dtype
        Ta = self._linear(self.temperature, t, dt_)
        Tj = Ta if self.temperature_july is None \
            else jnp.asarray(self.temperature_july, dt_)
        return AtmosphereInputs(Ta, Tj,
                                self._constant(self.precipitation, t, dt_))


@dataclass
class SeariseGreenland(AtmosphereModel):
    """Fausto et al. (2009) Greenland temperature parameterization (PISM
    ``atmosphere::SeariseGreenland``):
      T_ma  = 41.83 - 6.309e-3 h - 0.7189 lat - 0.0672 lon  [degC]
      T_jul = 14.70 - 5.426e-3 h - 0.1585 lat + 0.0518 lon  [degC]
    with h = max(surface elevation, 0). Precipitation must be supplied
    (PISM reads it from the input file)."""

    latitude: jnp.ndarray      # degrees N
    longitude: jnp.ndarray     # degrees W as negative? PISM uses degrees E in [-90,-10]
    precipitation: jnp.ndarray  # m/s ice equivalent
    config: object = None      # coefficients from atmosphere.fausto_air_temp.*

    def __post_init__(self):
        # the published Fausto et al. (2009) coefficients are the config
        # defaults; atmosphere.fausto_air_temp.* overrides them
        c = {}
        if self.config is not None:
            for k in ("d_ma", "gamma_ma", "c_ma", "kappa_ma",
                      "d_mj", "gamma_mj", "c_mj", "kappa_mj"):
                c[k] = self.config.get_number(
                    "atmosphere.fausto_air_temp." + k)
        else:
            c = dict(d_ma=314.98, gamma_ma=-6.309e-3, c_ma=-0.7189,
                     kappa_ma=-0.0672, d_mj=287.85, gamma_mj=-5.426e-3,
                     c_mj=-0.1585, kappa_mj=0.0518)
        self._coef = c

    def __call__(self, geometry, t) -> AtmosphereInputs:
        dt_ = geometry.ice_thickness.dtype
        h = jnp.maximum(geometry.ice_surface_elevation, 0.0)
        lat = jnp.asarray(self.latitude, dt_)
        lon = jnp.asarray(self.longitude, dt_)
        c = self._coef
        T_ma = c["d_ma"] + c["gamma_ma"] * h + c["c_ma"] * lat \
            + c["kappa_ma"] * lon
        T_jul = c["d_mj"] + c["gamma_mj"] * h + c["c_mj"] * lat \
            + c["kappa_mj"] * lon
        return AtmosphereInputs(T_ma.astype(dt_), T_jul.astype(dt_),
                                jnp.asarray(self.precipitation, dt_))


@dataclass
class PIK(AtmosphereModel):
    """PISM ``-atmosphere pik`` (``atmosphere::PIK``): Antarctic air
    temperature parameterizations from surface elevation and latitude.

    ``parameterization``:
    - ``martin`` (default): mean-annual temperature from Martin et al.
      (2011) eq. 1, T_ma = 273.15 + 34.46 - 0.00914 h - 0.68775 |lat|;
      no seasonal cycle (summer = annual).
    - ``martin_huybrechts_dewolde``: Martin mean-annual plus the
      Huybrechts & de Wolde (1999) summer temperature
      T_s = 273.15 + 16.81 - 0.00692 h - 0.27937 |lat|.

    Precipitation must be supplied (the reference reads it from the
    input file)."""

    latitude: jnp.ndarray       # degrees (negative south)
    precipitation: jnp.ndarray  # m/s ice equivalent
    parameterization: str = "martin"

    def __call__(self, geometry, t) -> AtmosphereInputs:
        dt_ = geometry.ice_thickness.dtype
        h = jnp.maximum(geometry.ice_surface_elevation, 0.0)
        lat = jnp.abs(jnp.asarray(self.latitude, dt_))
        T_ma = 273.15 + 34.46 - 0.00914 * h - 0.68775 * lat
        if self.parameterization == "martin_huybrechts_dewolde":
            T_s = 273.15 + 16.81 - 0.00692 * h - 0.27937 * lat
        else:
            T_s = T_ma
        return AtmosphereInputs(T_ma.astype(dt_), T_s.astype(dt_),
                                jnp.asarray(self.precipitation, dt_))


@dataclass
class ElevationChange(AtmosphereModel):
    """Lapse-rate modifier (PISM ``atmosphere::ElevationChange``): corrects
    an inner model's temperature for surface-elevation change relative to a
    reference surface."""

    inner: AtmosphereModel
    reference_surface: jnp.ndarray
    lapse_rate: float = 6.0e-3   # K/m (positive: cooler when higher)
    precip_scale_factor: float = 0.0  # "scale": exp factor per K of warming
    precip_lapse_rate: float = 0.0    # "shift": m/s ice-eq per m of uplift
    #   (reference atmosphere.elevation_change.precipitation.method
    #    scale | shift; both off by default)

    def __call__(self, geometry, t) -> AtmosphereInputs:
        a = self.inner(geometry, t)
        dh = geometry.ice_surface_elevation - jnp.asarray(
            self.reference_surface, geometry.ice_thickness.dtype)
        dT = -self.lapse_rate * dh
        precip = a.precipitation
        if self.precip_scale_factor != 0.0:
            precip = precip * jnp.exp(self.precip_scale_factor * dT)
        if self.precip_lapse_rate != 0.0:
            precip = jnp.maximum(precip - self.precip_lapse_rate * dh, 0.0)
        return AtmosphereInputs(a.temperature + dT, a.temperature_july + dT,
                                precip)


@dataclass
class DeltaT(AtmosphereModel):
    """Scalar temperature offset forcing (PISM ``-atmosphere ...,delta_T``).
    ``offset(t)`` is a host-provided callable of model time -> K; for traced
    use provide a jnp-compatible function (e.g. ``util.forcing.ScalarForcing``)."""

    inner: AtmosphereModel
    offset: Callable

    def __call__(self, geometry, t) -> AtmosphereInputs:
        a = self.inner(geometry, t)
        dT = self.offset(t)
        return AtmosphereInputs(a.temperature + dT, a.temperature_july + dT,
                                a.precipitation)


@dataclass
class DeltaP(AtmosphereModel):
    """Scalar precipitation offset forcing (reference
    ``atmosphere::Delta_P``, ``-atmosphere ...,delta_P``): an additive
    time-dependent offset in kg m-2 s-1 (here m ice-equivalent s-1)."""

    inner: AtmosphereModel
    offset: Callable            # t -> m s-1 ice equivalent

    def __call__(self, geometry, t) -> AtmosphereInputs:
        a = self.inner(geometry, t)
        return AtmosphereInputs(a.temperature, a.temperature_july,
                                a.precipitation + self.offset(t))


@dataclass
class FracP(AtmosphereModel):
    """Scalar precipitation scaling (PISM ``-atmosphere ...,frac_P``):
    precipitation is multiplied by a time-dependent factor."""

    inner: AtmosphereModel
    fraction: Callable          # t -> dimensionless factor

    def __call__(self, geometry, t) -> AtmosphereInputs:
        a = self.inner(geometry, t)
        return AtmosphereInputs(a.temperature, a.temperature_july,
                                a.precipitation * self.fraction(t))


@dataclass
class PrecipitationScaling(AtmosphereModel):
    """PISM ``-atmosphere ...,precip_scaling``: exponential precipitation
    scaling with a temperature-offset time series,
    P -> P exp(C dT(t)), C = ``atmosphere.precip_exponential_factor_for_temperature``
    (Huybrechts & de Wolde 1999: ~7.8%/K for Greenland)."""

    inner: AtmosphereModel
    delta_T: Callable           # t -> K offset
    exp_factor: float = 0.07042

    def __call__(self, geometry, t) -> AtmosphereInputs:
        a = self.inner(geometry, t)
        scale = jnp.exp(self.exp_factor * self.delta_T(t))
        return AtmosphereInputs(a.temperature, a.temperature_july,
                                a.precipitation * scale)


@dataclass
class Anomaly(AtmosphereModel):
    """2D anomaly modifier (PISM ``-atmosphere ...,anomaly``): adds
    prescribed temperature/precipitation anomaly fields (optionally
    time-sliced: pass (Nt, My, Mx) stacks with ``times``)."""

    inner: AtmosphereModel
    temp_anomaly: Optional[jnp.ndarray] = None      # K
    precip_anomaly: Optional[jnp.ndarray] = None    # m/s
    times: Optional[jnp.ndarray] = None             # (Nt,) [s] if stacked
    period: float = 0.0   # [s]; > 0 cycles (atmosphere.anomaly.periodic)

    def _slice(self, field, t, dtype):
        if field is None:
            return jnp.zeros((), dtype)
        f = jnp.asarray(field, dtype)
        if self.times is None or f.ndim == 2:
            return f
        times = jnp.asarray(self.times)
        if self.period > 0.0:
            t = times[0] + jnp.mod(t - times[0], self.period)
        k = jnp.clip(jnp.searchsorted(times, t, side="right") - 1,
                     0, times.shape[0] - 1)
        return f[k]

    def __call__(self, geometry, t) -> AtmosphereInputs:
        a = self.inner(geometry, t)
        dt_ = a.temperature.dtype
        dT = self._slice(self.temp_anomaly, t, dt_)
        dP = self._slice(self.precip_anomaly, t, dt_)
        return AtmosphereInputs(a.temperature + dT, a.temperature_july + dT,
                                a.precipitation + dP)


@dataclass
class CosineYearlyCycle(AtmosphereModel):
    """PISM ``-atmosphere yearly_cycle``: prescribed mean-annual and
    mean-summer temperature fields plus precipitation; the base class's
    cosine cycle interpolates within the year. An optional ``scaling(t)``
    time series modulates the amplitude (PISM ``-atmosphere_yearly_cycle_
    scaling_file``)."""

    temperature_mean_annual: jnp.ndarray   # K
    temperature_mean_summer: jnp.ndarray   # K
    precipitation: jnp.ndarray             # m/s ice equivalent
    scaling: Optional[Callable] = None     # t -> amplitude factor

    def __call__(self, geometry, t) -> AtmosphereInputs:
        dt_ = geometry.ice_thickness.dtype
        Ta = jnp.asarray(self.temperature_mean_annual, dt_)
        Tj = jnp.asarray(self.temperature_mean_summer, dt_)
        if self.scaling is not None:
            Tj = Ta + (Tj - Ta) * self.scaling(t)
        return AtmosphereInputs(Ta, Tj, jnp.asarray(self.precipitation, dt_))


@dataclass
class WeatherStation(AtmosphereModel):
    """PISM ``-atmosphere one_station`` (``WeatherStation.cc``): scalar
    time series of air temperature and precipitation applied uniformly
    over the whole domain."""

    temperature: Callable        # t -> K
    precipitation: Callable      # t -> m/s ice equivalent

    def __call__(self, geometry, t) -> AtmosphereInputs:
        shp = geometry.ice_thickness.shape
        dt_ = geometry.ice_thickness.dtype
        T = jnp.broadcast_to(jnp.asarray(self.temperature(t), dt_), shp)
        P = jnp.broadcast_to(jnp.asarray(self.precipitation(t), dt_), shp)
        return AtmosphereInputs(T, T, P)
