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

    def water_column_pressure(self, geometry, t):
        """Average water-column pressure over the submerged front face
        [Pa], or ``None`` for the hydrostatic default (reference
        ``ocean::Ocean::average_water_column_pressure``; the melange
        back-pressure modifiers raise it)."""
        inner = getattr(self, "inner", None)
        if inner is not None:
            return inner.water_column_pressure(geometry, t)
        return None

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
        self.S_ocean = cfg.get_number("constants.sea_water.salinity")
        self.T_ocean = 271.15  # PISM: -2 degC ambient

    def inputs(self, geometry, t) -> OceanInputs:
        draft = self._draft(geometry, self.rho_i, self.rho_w)
        # potential temperature above in-situ freezing point at the draft
        T_f = 273.15 - 0.0575 * self.S_ocean + 0.0832e-2 \
            - 7.64e-4 * draft   # Beckmann-Goosse freezing point
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
    salinity_ocean: jnp.ndarray    # g/kg (both 2D or (Nt, My, Mx) stacks)
    config: object = None
    times: Optional[jnp.ndarray] = None    # (Nt,) [s], sorted
    period: float = 0.0                    # [s]; > 0 cycles the series

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
        self.clip_salinity = cfg.get_flag("ocean.th.clip_salinity")

    def _slice(self, field, t, dtype):
        """Piecewise-linear time interpolation of an (Nt, My, Mx) stack."""
        f = jnp.asarray(field, dtype)
        if self.times is None or f.ndim == 2:
            return f
        times = jnp.asarray(self.times)
        tt = jnp.asarray(t)
        if self.period > 0.0:
            tt = times[0] + jnp.mod(tt - times[0], self.period)
        k = jnp.clip(jnp.searchsorted(times, tt, side="right") - 1,
                     0, times.shape[0] - 2)
        w = jnp.clip((tt - times[k])
                     / jnp.maximum(times[k + 1] - times[k], 1e-30),
                     0.0, 1.0).astype(dtype)
        return (1.0 - w) * f[k] + w * f[k + 1]

    def inputs(self, geometry, t) -> OceanInputs:
        draft = self._draft(geometry, self.rho_i, self.rho_w)
        dtype = geometry.ice_thickness.dtype
        S_o = self._slice(self.salinity_ocean, t, dtype)
        theta = self._slice(self.theta_ocean, t, dtype)
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
        if self.clip_salinity:
            # reference ocean.th.clip_salinity: keep the interface salinity
            # in a physical range (guards freeze-on blowup at fresh inputs)
            S_b = jnp.clip(S_b, 1.0, 2.0 * jnp.maximum(S_o, 1.0))
        T_b = a * S_b + Tz
        melt = (self.rho_w * gS / self.rho_i) * (S_o - S_b) / \
            jnp.maximum(S_b, 1.0)
        return OceanInputs(melt, T_b)


@dataclass
class Given(OceanModel):
    """PISM ``-ocean given``: prescribed sub-shelf melt rate and temperature
    fields (optionally time-sliced stacks with ``times``)."""

    melt_rate: jnp.ndarray                 # m/s ice equivalent (2D or (Nt,My,Mx))
    temperature: Optional[jnp.ndarray] = None   # K
    times: Optional[jnp.ndarray] = None    # (Nt,) [s], sorted
    period: float = 0.0                    # [s]; > 0 cycles the series
    #   (reference ocean.given.periodic)

    def _slice(self, field, t, dtype):
        f = jnp.asarray(field, dtype)
        if self.times is None or f.ndim == 2:
            return f
        times = jnp.asarray(self.times)
        if self.period > 0.0:
            t = times[0] + jnp.mod(t - times[0], self.period)
        k = jnp.clip(jnp.searchsorted(times, t, side="right") - 1,
                     0, times.shape[0] - 1)
        return f[k]

    def inputs(self, geometry, t) -> OceanInputs:
        dtype = geometry.ice_thickness.dtype
        melt = self._slice(self.melt_rate, t, dtype)
        if self.temperature is not None:
            T = self._slice(self.temperature, t, dtype)
        else:
            T = jnp.full(geometry.ice_thickness.shape, 271.15, dtype)
        return OceanInputs(melt, T)


@dataclass
class Anomaly(OceanModel):
    """Additive melt anomaly on top of an inner model (optionally a
    (Nt, My, Mx) stack with ``times``; ``period`` cycles it — reference
    ocean.anomaly.periodic)."""

    inner: OceanModel
    anomaly: jnp.ndarray  # m/s
    times: Optional[jnp.ndarray] = None
    period: float = 0.0

    def inputs(self, geometry, t) -> OceanInputs:
        o = self.inner.inputs(geometry, t)
        a = jnp.asarray(self.anomaly)
        if self.times is not None and a.ndim == 3:
            times = jnp.asarray(self.times)
            tt = t
            if self.period > 0.0:
                tt = times[0] + jnp.mod(tt - times[0], self.period)
            k = jnp.clip(jnp.searchsorted(times, tt, side="right") - 1,
                         0, times.shape[0] - 1)
            a = a[k]
        return OceanInputs(o.shelf_base_melt + a,
                           o.shelf_base_temperature)


@dataclass
class DeltaT(OceanModel):
    """PISM ``-ocean ...,delta_T``: scalar offset time series on the
    sub-shelf water temperature. For melt models that respond to thermal
    forcing the melt is adjusted with a linear sensitivity
    d(melt)/dT (PISM applies the offset to the temperature field that the
    inner model then consumes; here inner models are closed-form, so the
    shift is applied to their output temperature and, optionally, melt)."""

    inner: OceanModel
    offset: Callable                  # t -> K
    melt_sensitivity: float = 0.0     # m/s per K of warming (0 = T-only)

    def inputs(self, geometry, t) -> OceanInputs:
        o = self.inner.inputs(geometry, t)
        dT = self.offset(t)
        return OceanInputs(o.shelf_base_melt + self.melt_sensitivity * dT,
                           o.shelf_base_temperature + dT)


@dataclass
class DeltaSMB(OceanModel):
    """PISM ``-ocean ...,delta_SMB``: scalar additive offset time series on
    the sub-shelf mass flux."""

    inner: OceanModel
    offset: Callable                  # t -> m/s ice equivalent

    def inputs(self, geometry, t) -> OceanInputs:
        o = self.inner.inputs(geometry, t)
        return OceanInputs(o.shelf_base_melt + self.offset(t),
                           o.shelf_base_temperature)


@dataclass
class FracSMB(OceanModel):
    """PISM ``-ocean ...,frac_SMB``: scalar multiplicative scaling time
    series on the sub-shelf mass flux."""

    inner: OceanModel
    fraction: Callable                # t -> dimensionless

    def inputs(self, geometry, t) -> OceanInputs:
        o = self.inner.inputs(geometry, t)
        return OceanInputs(o.shelf_base_melt * self.fraction(t),
                           o.shelf_base_temperature)


@dataclass
class RunoffSMB(OceanModel):
    """PISM ``-ocean ...,runoff_SMB`` (``ocean::Runoff_SMB``): scale the
    sub-shelf melt with surface-runoff changes driven by an air-temperature
    anomaly time series dT(t). Runoff enhances plume-driven melt following
    the Xu et al. (2013) power-law fit:

        melt -> melt * (1 + B * Q^alpha * dT^beta),  Q = a dT

    with a = ``ocean.runoff_to_ocean_melt.temp_to_runoff_a`` (runoff change
    per K) and the Xu et al. exponents alpha ~ 0.54, beta ~ 1.17."""

    inner: OceanModel
    delta_T: Callable                 # t -> K air-temperature anomaly
    temp_to_runoff_a: float = 0.1     # (fractional) runoff change per K
    melt_factor_B: float = 1.0
    alpha: float = 0.54
    beta: float = 1.17

    def inputs(self, geometry, t) -> OceanInputs:
        o = self.inner.inputs(geometry, t)
        dT = jnp.maximum(self.delta_T(t), 0.0)
        Q = self.temp_to_runoff_a * dT
        factor = 1.0 + self.melt_factor_B * Q ** self.alpha * dT ** self.beta
        return OceanInputs(o.shelf_base_melt * factor,
                           o.shelf_base_temperature)


def hydrostatic_water_column_pressure(geometry, g=9.81, rho_i=910.0,
                                      rho_w=1028.0):
    """Default average water-column pressure over the submerged part of a
    calving front [Pa]: (1/2) rho_w g d^2 / H (so H * (P_ice_avg - P_water)
    is the Winkelmann et al. 2011 CFBC pressure imbalance)."""
    H = geometry.ice_thickness
    d = jnp.minimum(jnp.maximum(geometry.sea_level
                                - geometry.bed_elevation, 0.0),
                    (rho_i / rho_w) * H)
    return 0.5 * g * rho_w * d ** 2 / jnp.maximum(H, 1.0)


@dataclass
class FracMBP(OceanModel):
    """PISM ``-ocean ...,frac_MBP`` (``ocean::Frac_MBP``): melange back
    pressure as a fraction lambda of the maximum possible support — the
    average water-column pressure at the front is raised to
    (1 - lambda) P_water + lambda P_ice_avg, so lambda = 1 removes the
    spreading stress at the calving front entirely."""

    inner: OceanModel
    fraction: Callable                # t -> lambda in [0, 1]
    g: float = 9.81
    rho_i: float = 910.0
    rho_w: float = 1028.0

    def inputs(self, geometry, t) -> OceanInputs:
        return self.inner.inputs(geometry, t)

    def water_column_pressure(self, geometry, t):
        Pw = self.inner.water_column_pressure(geometry, t)
        if Pw is None:
            Pw = hydrostatic_water_column_pressure(geometry, self.g,
                                                   self.rho_i, self.rho_w)
        lam = jnp.clip(self.fraction(t), 0.0, 1.0)
        P_ice = 0.5 * self.g * self.rho_i * geometry.ice_thickness
        return (1.0 - lam) * Pw + lam * P_ice


@dataclass
class DeltaMBP(OceanModel):
    """PISM ``-ocean ...,delta_MBP`` (``ocean::Delta_MBP``): scalar melange
    back pressure offset [Pa] added to the average water-column pressure
    at the front."""

    inner: OceanModel
    offset: Callable                  # t -> Pa
    g: float = 9.81
    rho_i: float = 910.0
    rho_w: float = 1028.0

    def inputs(self, geometry, t) -> OceanInputs:
        return self.inner.inputs(geometry, t)

    def water_column_pressure(self, geometry, t):
        Pw = self.inner.water_column_pressure(geometry, t)
        if Pw is None:
            Pw = hydrostatic_water_column_pressure(geometry, self.g,
                                                   self.rho_i, self.rho_w)
        return Pw + self.offset(t)


@dataclass
class Cache(OceanModel):
    """PISM ``-ocean ...,cache``: piecewise-constant clock for an expensive
    inner model (see ``surface.Cache`` for the traced-equivalence note)."""

    inner: OceanModel
    update_interval: float            # seconds

    def inputs(self, geometry, t) -> OceanInputs:
        tq = jnp.floor(t / self.update_interval) * self.update_interval
        return self.inner.inputs(geometry, tq)
