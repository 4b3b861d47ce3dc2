"""dEBM-simple surface mass balance (diurnal energy balance model).

Rebuild of PISM ``surface::DEBMSimple`` + ``DEBMSimplePointwise``
(``src/coupler/surface/DEBMSimple.cc``, ``DEBMSimplePointwise.cc``; PISM
2.1+), the Krebs-Kanzow et al. (2018) / Zeitz et al. (2021) insolation- and
temperature-driven melt scheme:

    M = (h_phi / pi) / (rho_w L_m) * [ tau_A(z) (1 - albedo) S_mean
                                       + c1 T_eff + c2 ]        if T > T_min

where ``h_phi`` is the hour angle at which the sun reaches the minimum
elevation angle Phi (so ``h_phi/pi`` is the fraction of the day in the melt
period), ``S_mean`` the mean top-of-atmosphere insolation during that
period, ``tau_A`` a linear-in-elevation atmospheric transmissivity,
``T_eff`` the Calov-Greve expected positive excess over the melting point
(shared with the PDD scheme), and ``c2 < 0`` a background (longwave loss)
term.  The melt-albedo feedback is the linear parameterization

    albedo = clip(albedo_max + albedo_slope * rho_w * M_prev,
                  albedo_min, albedo_max)

with ``M_prev`` the melt rate of the previous evaluation interval; the
albedo is model state (checkpointed) so the feedback survives restarts,
exactly like the reference.  Orbital forcing comes in two modes: the
present-day trigonometric expansions of solar declination and the
sun-earth distance factor (Liou 2002 / Spencer 1971), or the paleo mode
computing both from orbital parameters (eccentricity, obliquity,
perihelion longitude; Berger 1978, as in the reference's port of the
GISM/CESM ``shr_orb`` code), optionally time-dependent from a forcing
series.

Snow bookkeeping mirrors the PDD model (``coupler/pdd.py``): a snow-depth
field persists across steps, melt is applied snow-first-then-ice, a
configurable fraction of snow melt (optionally also ice melt) refreezes,
and the snow depth resets at the balance-year start.  There is no firn
layer (the reference's DEBMSimple tracks snow only); the firn carry slot
is passed through untouched.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..util.units import SEC_PER_YEAR
from .atmosphere import AtmosphereModel
from .pdd import expected_pdd_rate
from .surface import SurfaceCarry, SurfaceInputs, SurfaceModel

#: spring (March) equinox as a day number, shared by both orbital modes
EQUINOX_DAY = 80.0


# ---------------------------------------------------------------------------
# Orbital geometry (pure functions; angles in radians)
# ---------------------------------------------------------------------------

def solar_declination_present_day(year_fraction):
    """Solar declination [rad] from the year fraction (0 = Jan 1); Liou
    (2002) eq. 2.2.10 / Spencer (1971) trigonometric expansion (reference
    ``DEBMSimplePointwise::solar_declination_present_day``)."""
    t = 2.0 * jnp.pi * year_fraction
    return (0.006918
            - 0.399912 * jnp.cos(t) + 0.070257 * jnp.sin(t)
            - 0.006758 * jnp.cos(2 * t) + 0.000907 * jnp.sin(2 * t)
            - 0.002697 * jnp.cos(3 * t) + 0.001480 * jnp.sin(3 * t))


def distance_factor_present_day(year_fraction):
    """(d_mean/d)^2 sun-earth inverse-square factor; Liou (2002)
    eq. 2.2.9 / Spencer (1971)."""
    t = 2.0 * jnp.pi * year_fraction
    return (1.000110
            + 0.034221 * jnp.cos(t) + 0.001280 * jnp.sin(t)
            + 0.000719 * jnp.cos(2 * t) + 0.000077 * jnp.sin(2 * t))


def solar_longitude(year_fraction, eccentricity, perihelion_longitude):
    """True solar longitude [rad] measured from the spring equinox, from
    the mean longitude via the equation-of-center expansion (Berger 1978;
    reference ``DEBMSimplePointwise::solar_longitude``)."""
    e = eccentricity
    # the sun's apparent longitude at perigee: the orbit's longitude of
    # perihelion + pi (CESM shr_orb "mvelpp" convention)
    w = perihelion_longitude + jnp.pi
    beta = jnp.sqrt(1.0 - e * e)
    # mean longitude at the given time, anchored so lambda = 0 at the
    # spring equinox (day EQUINOX_DAY)
    lambda_m = (-2.0 * ((e / 2.0 + e ** 3 / 8.0) * (1.0 + beta) * jnp.sin(-w)
                        - e * e / 4.0 * (0.5 + beta) * jnp.sin(-2.0 * w)
                        + e ** 3 / 8.0 * (1.0 / 3.0 + beta) * jnp.sin(-3.0 * w))
                + 2.0 * jnp.pi * (year_fraction - EQUINOX_DAY / 365.0))
    return (lambda_m
            + (2.0 * e - e ** 3 / 4.0) * jnp.sin(lambda_m - w)
            + 5.0 / 4.0 * e * e * jnp.sin(2.0 * (lambda_m - w))
            + 13.0 / 12.0 * e ** 3 * jnp.sin(3.0 * (lambda_m - w)))


def solar_declination_paleo(year_fraction, eccentricity, obliquity,
                            perihelion_longitude):
    """sin(declination) = sin(obliquity) sin(solar longitude)."""
    lam = solar_longitude(year_fraction, eccentricity, perihelion_longitude)
    return jnp.arcsin(jnp.sin(obliquity) * jnp.sin(lam))


def distance_factor_paleo(year_fraction, eccentricity, perihelion_longitude):
    """(d_mean/d)^2 from the orbit ellipse: ((1 + e cos(nu)) / (1-e^2))^2
    with nu = lambda - perihelion_longitude the true anomaly."""
    e = eccentricity
    lam = solar_longitude(year_fraction, e, perihelion_longitude)
    return ((1.0 + e * jnp.cos(lam - (perihelion_longitude + jnp.pi)))
            / (1.0 - e * e)) ** 2


def hour_angle(phi, latitude, declination):
    """Hour angle [rad] at which the sun reaches elevation angle ``phi``
    (reference ``DEBMSimplePointwise::hour_angle``); 0 when the sun never
    reaches it (polar night w.r.t. phi), pi during "melt-period midnight
    sun"."""
    cos_h = ((jnp.sin(phi) - jnp.sin(latitude) * jnp.sin(declination))
             / jnp.maximum(jnp.cos(latitude) * jnp.cos(declination), 1e-12))
    return jnp.arccos(jnp.clip(cos_h, -1.0, 1.0))


def insolation(solar_constant, distance_factor, h_phi, latitude, declination):
    """Mean top-of-atmosphere insolation [W m-2] during the melt period
    (Krebs-Kanzow et al. 2018 eq. 2)."""
    h = jnp.maximum(h_phi, 1e-9)
    mean = (h * jnp.sin(latitude) * jnp.sin(declination)
            + jnp.cos(latitude) * jnp.cos(declination) * jnp.sin(h)) / h
    return jnp.where(h_phi > 0.0, solar_constant * distance_factor * mean, 0.0)


# ---------------------------------------------------------------------------
# The surface model
# ---------------------------------------------------------------------------

@dataclass
class DEBMSimple(SurfaceModel):
    """dEBM-simple surface model (PISM ``-surface debm_simple``).

    ``latitude`` is in degrees north.  ``albedo_field`` (optional)
    prescribes the albedo from input instead of the melt
    parameterization (reference ``surface.debm_simple.albedo_input.file``).
    ``paleo_series`` (optional) is a ``(times, eccentricity, obliquity,
    perihelion_longitude)`` tuple of 1D arrays (radians) for
    time-dependent orbital forcing (reference
    ``surface.debm_simple.paleo.file``).
    """

    atmosphere: AtmosphereModel
    latitude: jnp.ndarray            # degrees N
    config: object = None
    albedo_field: object = None      # optional prescribed albedo (2D)
    paleo_series: object = None      # optional (t, ecc, obl, peri) arrays
    n_intervals: int = 0             # sub-intervals per update window; 0 =
    #                                  surface.debm_simple.max_evals_per_year
    #                                  / 2 (every [t,t+dt] window gets that
    #                                  many midpoints, at least bi-weekly
    #                                  for dt <= 1 a at the default 52)

    stateful = True
    uses_albedo = True

    def __post_init__(self):
        cfg = self.config
        g = cfg.get_number
        if self.n_intervals <= 0:
            self.n_intervals = max(
                int(cfg.get_number(
                    "surface.debm_simple.max_evals_per_year")) // 2, 2)
        deg = jnp.pi / 180.0
        self.albedo_max = g("surface.debm_simple.albedo_max")
        self.albedo_min = g("surface.debm_simple.albedo_min")
        self.albedo_slope = g("surface.debm_simple.albedo_slope")  # m2 s kg-1
        self.albedo_ocean = g("surface.debm_simple.albedo_ocean")
        self.c1 = g("surface.debm_simple.c1")                      # W m-2 K-1
        self.c2 = g("surface.debm_simple.c2")                      # W m-2
        self.T_melt_min = g("surface.debm_simple.melting_threshold_temp")
        self.T_pos = g("surface.debm_simple.positive_threshold_temp")
        self.phi = g("surface.debm_simple.phi") * deg
        self.S0 = g("surface.debm_simple.solar_constant")          # W m-2
        self.sigma = g("surface.debm_simple.std_dev")
        self.sigma_a = g("surface.debm_simple.std_dev.param_a")
        self.sigma_b = g("surface.debm_simple.std_dev.param_b")
        self.sigma_param = cfg.get_flag("surface.debm_simple.std_dev.param_enabled")
        self.tau_a0 = g("surface.debm_simple.tau_a_intercept")
        self.tau_az = g("surface.debm_simple.tau_a_slope")         # m-1
        self.paleo = cfg.get_flag("surface.debm_simple.paleo.enabled")
        self.ecc = g("surface.debm_simple.paleo.eccentricity")
        self.obl = g("surface.debm_simple.paleo.obliquity") * deg
        self.peri = g("surface.debm_simple.paleo.perihelion_longitude") * deg
        self.refreeze = g("surface.debm_simple.refreeze")
        self.refreeze_ice = cfg.get_flag("surface.debm_simple.refreeze_ice_melt")
        self.precip_as_snow = cfg.get_flag(
            "surface.debm_simple.interpret_precip_as_snow")
        self.T_all_snow = g("surface.debm_simple.air_temp_all_precip_as_snow")
        self.T_all_rain = g("surface.debm_simple.air_temp_all_precip_as_rain")
        self.balance_year_start = g(
            "surface.pdd.balance_year_start_day") / 365.0
        self.rho_i = g("constants.ice.density")
        self.rho_w = g("constants.fresh_water.density")
        self.L_m = g("constants.fresh_water.latent_heat_of_fusion")
        self.initial_albedo = self.albedo_max

    def max_timestep(self, t) -> float:
        return SEC_PER_YEAR

    # -- orbital state at time t ------------------------------------------
    def _orbit(self, t):
        """(declination, distance_factor) at model time t [s]."""
        yf = t / SEC_PER_YEAR
        yf = yf - jnp.floor(yf)
        if not self.paleo:
            return (solar_declination_present_day(yf),
                    distance_factor_present_day(yf))
        if self.paleo_series is not None:
            times, ecc, obl, peri = self.paleo_series
            e = jnp.interp(t, times, ecc)
            o = jnp.interp(t, times, obl)
            w = jnp.interp(t, times, peri)
        else:
            e, o, w = self.ecc, self.obl, self.peri
        return (solar_declination_paleo(yf, e, o, w),
                distance_factor_paleo(yf, e, w))

    # -- pointwise melt (reference DEBMSimplePointwise::melt) ---------------
    def melt_components(self, t, T, surface_elevation, albedo):
        """Per-unit-time melt split [m ice-equivalent / s]:
        (insolation-driven, temperature-driven, offset, total)."""
        dtype = T.dtype
        decl, dist = self._orbit(t)
        lat = jnp.asarray(self.latitude, dtype) * (jnp.pi / 180.0)
        h = hour_angle(self.phi, lat, decl.astype(dtype))
        S = insolation(self.S0, dist.astype(dtype), h, lat, decl.astype(dtype))
        tau_a = self.tau_a0 + self.tau_az * jnp.maximum(surface_elevation, 0.0)
        sigma = jnp.asarray(self.sigma, dtype)
        if self.sigma_param:
            sigma = jnp.maximum(
                self.sigma_a * (T - 273.15) + self.sigma_b, 1e-3)
        Teff = expected_pdd_rate(T, self.T_pos, sigma)
        # W m-2 -> m water-equivalent / s -> m ice-equivalent / s
        to_ice = (h / jnp.pi) / (self.rho_w * self.L_m) * (self.rho_w / self.rho_i)
        insol = to_ice * tau_a * (1.0 - albedo) * S
        tempm = to_ice * self.c1 * Teff
        offset = to_ice * self.c2
        cold = T < self.T_melt_min
        total = jnp.where(cold, 0.0, jnp.maximum(insol + tempm + offset, 0.0))
        return (jnp.where(cold, 0.0, insol), jnp.where(cold, 0.0, tempm),
                jnp.where(cold, 0.0, offset), total)

    def albedo_from_melt(self, melt_ice_rate):
        """Linear melt-albedo feedback; melt in m ice-equivalent / s."""
        melt_mass = melt_ice_rate * self.rho_i        # kg m-2 s-1
        return jnp.clip(self.albedo_max + self.albedo_slope * melt_mass,
                        self.albedo_min, self.albedo_max)

    # -- stateful protocol ---------------------------------------------------
    def update(self, geometry, t, dt, carry: SurfaceCarry):
        shp = geometry.ice_thickness.shape
        dtype = geometry.ice_thickness.dtype
        snow = carry.snow if carry.snow is not None else jnp.zeros(shp, dtype)
        albedo = (carry.albedo if carry.albedo is not None
                  else jnp.full(shp, self.initial_albedo, dtype))
        N = self.n_intervals
        dt_i = dt / N

        def balance_year(tk):
            return jnp.floor(tk / SEC_PER_YEAR - self.balance_year_start)

        def interval(k, st):
            smb, melt_a, runoff_a, acc_a, snow, albedo, yr = st
            tk = t + (k + 0.5) * dt_i
            dt_if = jnp.asarray(dt_i, dtype)
            atm = self.atmosphere(geometry, tk)
            Ta, Tj, precip = (atm.temperature.astype(dtype),
                              atm.temperature_july.astype(dtype),
                              atm.precipitation.astype(dtype))
            frac = tk / SEC_PER_YEAR - jnp.floor(tk / SEC_PER_YEAR)
            T = Ta + (Tj - Ta) * jnp.cos(2.0 * jnp.pi * (frac - 0.5)).astype(dtype)
            yr_k = balance_year(tk)
            snow = jnp.where(yr_k > yr, 0.0, snow)     # balance-year reset
            if self.precip_as_snow:
                sf = jnp.ones_like(T)
            else:
                sf = jnp.clip((self.T_all_rain - T)
                              / (self.T_all_rain - self.T_all_snow), 0.0, 1.0)
            snowfall = precip * sf * dt_if             # m ice equivalent
            snow = snow + snowfall
            alb = (jnp.asarray(self.albedo_field, dtype)
                   if self.albedo_field is not None else albedo)
            # ice-free (ocean) cells use the fixed ocean albedo
            # (surface.debm_simple.albedo_ocean)
            from .. import state as S
            alb = jnp.where(S.icy(geometry.cell_type), alb,
                            jnp.asarray(self.albedo_ocean, dtype))
            z = geometry.ice_surface_elevation.astype(dtype)
            _, _, _, M = self.melt_components(tk, T, z, alb)
            albedo = self.albedo_from_melt(M)
            melt_amt = M * dt_if
            snow_melt = jnp.minimum(snow, melt_amt)
            ice_melt = melt_amt - snow_melt
            refrozen = self.refreeze * snow_melt
            if self.refreeze_ice:
                refrozen = refrozen + self.refreeze * ice_melt
            smb = smb + snowfall - melt_amt + refrozen
            melt_a = melt_a + melt_amt
            runoff_a = runoff_a + melt_amt - refrozen
            acc_a = acc_a + snowfall
            snow = snow - snow_melt
            return smb, melt_a, runoff_a, acc_a, snow, albedo, yr_k

        smb0 = jnp.zeros(shp, dtype)
        yr0 = balance_year(t - 1e-3 * dt_i)
        smb, melt_a, runoff_a, acc_a, snow, albedo, _ = jax.lax.fori_loop(
            0, N, interval, (smb0, smb0, smb0, smb0, snow, albedo, yr0))
        Ta = self.atmosphere(geometry, t).temperature.astype(dtype)
        out = SurfaceInputs(smb=(smb / dt).astype(dtype),
                            temperature=jnp.minimum(Ta, 273.15),
                            melt=(melt_a / dt).astype(dtype),
                            runoff=(runoff_a / dt).astype(dtype),
                            accumulation=(acc_a / dt).astype(dtype))
        return out, SurfaceCarry(snow=snow.astype(dtype), firn=carry.firn,
                                 albedo=albedo.astype(dtype))

    # -- stateless climatology ------------------------------------------------
    def __call__(self, geometry, t) -> SurfaceInputs:
        t0 = (jnp.floor(t / SEC_PER_YEAR) + self.balance_year_start) \
            * SEC_PER_YEAR
        out, _ = self.update(geometry, t0, SEC_PER_YEAR,
                             SurfaceCarry(None, None, None))
        return out
