"""Surface (climate) boundary models.

Rebuild of PISM ``src/coupler/surface/``: a surface model supplies the ice
surface mass balance (SMB, m/s ice-equivalent) and ice surface temperature
given the current geometry and model time. Models are pure callables so they
can live inside the jitted step; file-driven models pre-load their forcing
onto the device as arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax.numpy as jnp


class SurfaceInputs(NamedTuple):
    smb: jnp.ndarray        # surface mass balance [m/s ice equivalent]
    temperature: jnp.ndarray  # ice surface temperature [K]
    # optional budget components from melt-scheme models (PDD/dEBM), for
    # the surface_*_flux diagnostics and the cryo-hydrologic warming
    # melt-presence indicator; None from prescribed-SMB models
    melt: Optional[jnp.ndarray] = None          # m/s ice equivalent
    runoff: Optional[jnp.ndarray] = None        # m/s (melt - refreeze)
    accumulation: Optional[jnp.ndarray] = None  # m/s (snowfall)


class SurfaceCarry(NamedTuple):
    """Model-state fields threaded through stateful surface models
    (checkpointed; reference ``define_model_state``): PDD snow/firn
    bookkeeping depths and the dEBM-simple albedo.  Slots a model does
    not use pass through as ``None``."""

    snow: Optional[jnp.ndarray] = None    # m ice equivalent
    firn: Optional[jnp.ndarray] = None    # m ice equivalent
    albedo: Optional[jnp.ndarray] = None  # 1


class SurfaceModel:
    """Base interface (PISM ``surface::SurfaceModel``).

    Two evaluation protocols:

    - stateless: ``model(geometry, t)`` returns the instantaneous /
      climatological :class:`SurfaceInputs` (every model supports this);
    - stateful: ``model.update(geometry, t, dt, carry)`` integrates
      the surface budget over ``[t, t+dt]`` threading a
      :class:`SurfaceCarry` of model-state fields (reference
      ``surface::TemperatureIndex`` snow/firn depths,
      ``surface::DEBMSimple`` albedo). Stateless models ignore and pass
      the carry through; modifier chains forward the carry to their inner
      model and transform the result via ``_transform``.
    """

    def __call__(self, geometry, t) -> SurfaceInputs:
        inner = getattr(self, "inner", None)
        if inner is not None:
            return self._transform(inner(geometry, t), geometry, t)
        raise NotImplementedError

    def _transform(self, s: "SurfaceInputs", geometry, t) -> "SurfaceInputs":
        """Modifier hook: transform the inner model's output."""
        raise NotImplementedError

    @property
    def stateful(self) -> bool:
        inner = getattr(self, "inner", None)
        return bool(inner is not None and inner.stateful)

    def update(self, geometry, t, dt, carry: "SurfaceCarry"):
        inner = getattr(self, "inner", None)
        if inner is not None:
            s, carry = inner.update(geometry, t, dt, carry)
            return self._transform(s, geometry, t), carry
        return self(geometry, t), carry

    @property
    def uses_albedo(self) -> bool:
        inner = getattr(self, "inner", None)
        return bool(inner is not None and inner.uses_albedo)

    @property
    def midpoint_sampling(self) -> bool:
        """True when forcing should be sampled at the step midpoint
        (GivenStreamed); forwarded through modifier wrappers so e.g.
        ``-surface given,delta_T`` keeps midpoint sampling."""
        inner = getattr(self, "inner", None)
        return bool(inner is not None
                    and getattr(inner, "midpoint_sampling", False))

    def max_timestep(self, t) -> float:
        inner = getattr(self, "inner", None)
        return inner.max_timestep(t) if inner is not None else jnp.inf


@dataclass
class Uniform(SurfaceModel):
    """Spatially uniform, constant in time."""

    smb: float = 0.0          # m/s ice equivalent
    temperature: float = 263.15

    def __call__(self, geometry, t) -> SurfaceInputs:
        shp = geometry.ice_thickness.shape
        dt_ = geometry.ice_thickness.dtype
        return SurfaceInputs(
            smb=jnp.full(shp, self.smb, dt_),
            temperature=jnp.full(shp, self.temperature, dt_),
        )


@dataclass
class Given(SurfaceModel):
    """Prescribed fields (PISM ``-surface given``): single time slices or
    ``(Nt, My, Mx)`` stacks with a ``times`` axis [s].  SMB (a mass flux,
    ``cell_methods = "time: mean"``) is piecewise-constant over its
    intervals, temperature piecewise-linear; ``period`` > 0 cycles the
    series (PISM ``surface.given.periodic``)."""

    smb_field: jnp.ndarray
    temperature_field: jnp.ndarray
    times: Optional[jnp.ndarray] = None    # (Nt,) [s], sorted
    period: float = 0.0                    # [s]; > 0 cycles the series

    def _t(self, t):
        times = jnp.asarray(self.times)
        if self.period > 0.0:
            t0 = times[0]
            t = t0 + jnp.mod(t - t0, self.period)
        return t, times

    def _slice(self, field, t, linear):
        f = jnp.asarray(field)
        if self.times is None or f.ndim == 2:
            return f
        tt, times = self._t(t)
        if linear:
            k = jnp.clip(jnp.searchsorted(times, tt, side="right") - 1,
                         0, times.shape[0] - 2)
            w = jnp.clip((tt - times[k])
                         / jnp.maximum(times[k + 1] - times[k], 1e-30),
                         0.0, 1.0).astype(f.dtype)
            return (1.0 - w) * f[k] + w * f[k + 1]
        k = jnp.clip(jnp.searchsorted(times, tt, side="right") - 1,
                     0, times.shape[0] - 1)
        return f[k]

    def __call__(self, geometry, t) -> SurfaceInputs:
        return SurfaceInputs(self._slice(self.smb_field, t, linear=False),
                             self._slice(self.temperature_field, t,
                                         linear=True))


@dataclass
class GivenStreamed(SurfaceModel):
    """PISM ``-surface given`` reading time slices from file DURING the run
    (forcings too large to pre-load into HBM): each field is a
    ``coupler.stream.ForcingStream`` whose reader thread prefetches ahead
    of model time; inside the jitted step the lookup is a host-RAM
    callback, not file I/O."""

    smb: object           # ForcingStream [m/s ice equivalent]
    temperature: object   # ForcingStream [K]

    #: sample the piecewise-constant series at the step MIDPOINT: the value
    #: attributed to [t, t+dt) is the slice covering its center (the
    #: one-point approximation of the reference's interval-averaged given
    #: forcing). Start-point sampling is knife-edged against the
    #: time_stepping.resolution dt quantization: steps land O(1 s) before
    #: forcing epochs and every slice update arrives one step late.
    midpoint_sampling = True

    def __call__(self, geometry, t) -> SurfaceInputs:
        dt_ = geometry.ice_thickness.dtype
        return SurfaceInputs(self.smb.slice_at(t).astype(dt_),
                             self.temperature.slice_at(t).astype(dt_))


@dataclass
class FunctionSurface(SurfaceModel):
    """Wraps fn(geometry, t) -> (smb, temperature); used by the verification
    setups (EISMINT II parameterizations, Halfar compensatory sources)."""

    fn: Callable

    def __call__(self, geometry, t) -> SurfaceInputs:
        smb, temp = self.fn(geometry, t)
        return SurfaceInputs(jnp.asarray(smb), jnp.asarray(temp))


@dataclass
class ElevationDependent(SurfaceModel):
    """PISM ``-surface elevation``: piecewise-linear SMB(z) ramp."""

    z_min: float
    z_ela: float
    z_max: float
    m_min: float   # SMB at z_min [m/s]
    m_max: float   # SMB at z_max
    temperature: float = 263.15

    def __call__(self, geometry, t) -> SurfaceInputs:
        z = geometry.ice_surface_elevation
        # linear ramp: m_min at z_min -> 0 at z_ela -> m_max at z_max
        below = self.m_min * (self.z_ela - z) / (self.z_ela - self.z_min)
        above = self.m_max * (z - self.z_ela) / (self.z_max - self.z_ela)
        smb = jnp.where(z < self.z_ela, -below, above)
        smb = jnp.clip(smb, self.m_min, self.m_max)
        T = jnp.full(z.shape, self.temperature, z.dtype)
        return SurfaceInputs(smb, T)


@dataclass
class ISMIP6(SurfaceModel):
    """PISM ``-surface ismip6`` (``src/coupler/surface/ISMIP6Climate.cc``):
    the ISMIP6 protocol's anomaly-plus-elevation-correction forcing

        SMB(t) = SMB_ref + aSMB(t) + dSMBdz(t) * (h - h_ref)
        T(t)   = T_ref   + aST(t)  + dSTdz(t)  * (h - h_ref)

    where the reference climate (SMB_ref, T_ref) and reference surface
    h_ref are time-constant and the anomalies are supplied per time slice.
    Forcing slices are pre-loaded device arrays: ``anomaly_times`` [s] with
    (Nt, My, Mx) anomaly stacks, indexed by piecewise-constant lookup in
    model time (trace-safe; clamped at the ends).
    """

    smb_ref: jnp.ndarray            # m/s ice equivalent
    temperature_ref: jnp.ndarray    # K
    surface_ref: jnp.ndarray        # h_ref [m]
    anomaly_times: jnp.ndarray = None       # (Nt,) [s], sorted
    a_smb: jnp.ndarray = None                # (Nt, My, Mx) [m/s]
    a_temp: jnp.ndarray = None               # (Nt, My, Mx) [K]
    dsmb_dz: jnp.ndarray = None              # (Nt, My, Mx) [m/s / m]
    dtemp_dz: jnp.ndarray = None             # (Nt, My, Mx) [K / m]

    def _slice(self, stack, t, dtype):
        if stack is None:
            return jnp.zeros((), dtype)
        times = jnp.asarray(self.anomaly_times)
        k = jnp.clip(jnp.searchsorted(times, t, side="right") - 1,
                     0, times.shape[0] - 1)
        return jnp.asarray(stack, dtype)[k]

    def __call__(self, geometry, t) -> SurfaceInputs:
        h = geometry.ice_surface_elevation
        dt_ = h.dtype
        dh = h - jnp.asarray(self.surface_ref, dt_)
        smb = (jnp.asarray(self.smb_ref, dt_)
               + self._slice(self.a_smb, t, dt_)
               + self._slice(self.dsmb_dz, t, dt_) * dh)
        T = (jnp.asarray(self.temperature_ref, dt_)
             + self._slice(self.a_temp, t, dt_)
             + self._slice(self.dtemp_dz, t, dt_) * dh)
        return SurfaceInputs(smb, T)


@dataclass
class Simple(SurfaceModel):
    """PISM ``-surface simple`` (``surface::Simple``): the identity
    coupling — SMB = atmosphere precipitation (all precip treated as ice
    accumulation), ice surface temperature = mean-annual air temperature."""

    atmosphere: object          # AtmosphereModel

    def __call__(self, geometry, t) -> SurfaceInputs:
        a = self.atmosphere(geometry, t)
        return SurfaceInputs(a.precipitation, a.temperature)


@dataclass
class PIK(SurfaceModel):
    """PISM ``-surface pik`` (``src/coupler/surface/PIK.cc``): SMB = precip
    from the atmosphere; ice surface temperature from the Martin et al.
    (2011, TC) Antarctic parameterization

        T_s [K] = 273.15 + 30 - 0.0075 h - 0.68775 |lat|

    with h the surface elevation [m] and lat in degrees (|lat| = degrees
    south for Antarctica), capped at the melting point."""

    atmosphere: object
    latitude: jnp.ndarray       # degrees (negative in the south)

    def __call__(self, geometry, t) -> SurfaceInputs:
        a = self.atmosphere(geometry, t)
        h = geometry.ice_surface_elevation
        lat = jnp.abs(jnp.asarray(self.latitude, h.dtype))
        T = 273.15 + 30.0 - 0.0075 * h - 0.68775 * lat
        return SurfaceInputs(a.precipitation, jnp.minimum(T, 273.15))


@dataclass
class Anomaly(SurfaceModel):
    """PISM ``-surface ...,anomaly``: adds prescribed SMB / temperature
    anomaly fields to an inner model (time-sliced stacks supported)."""

    inner: SurfaceModel
    smb_anomaly: Optional[jnp.ndarray] = None       # m/s
    temp_anomaly: Optional[jnp.ndarray] = None      # K
    times: Optional[jnp.ndarray] = None             # (Nt,) [s] if stacked
    period: float = 0.0   # [s]; > 0 cycles (surface.anomaly.periodic)

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

    def _transform(self, s, geometry, t) -> SurfaceInputs:
        dt_ = s.smb.dtype
        return s._replace(
            smb=s.smb + self._slice(self.smb_anomaly, t, dt_),
            temperature=s.temperature + self._slice(self.temp_anomaly, t,
                                                    dt_))


@dataclass
class DeltaT(SurfaceModel):
    """PISM ``-surface ...,delta_T``: scalar ice-surface-temperature offset
    time series on top of an inner model."""

    inner: SurfaceModel
    offset: Callable            # t -> K

    def _transform(self, s, geometry, t) -> SurfaceInputs:
        return s._replace(temperature=s.temperature + self.offset(t))


@dataclass
class ElevationChange(SurfaceModel):
    """PISM ``-surface ...,elevation_change`` (``surface::ElevationChange``):
    correct an inner model's outputs for surface-elevation change relative
    to a reference surface — temperature by a lapse rate, SMB either
    shifted by an SMB lapse rate or scaled exponentially with the implied
    temperature change (reference ``surface.elevation_change.smb.method``
    shift | scale)."""

    inner: SurfaceModel
    reference_surface: jnp.ndarray
    temp_lapse_rate: float = 6.0e-3   # K/m
    smb_lapse_rate: float = 0.0       # m/s ice-eq per m of uplift ("shift")
    smb_exp_factor: float = 0.0       # per K of implied warming ("scale")

    def _transform(self, s: SurfaceInputs, geometry, t) -> SurfaceInputs:
        dh = geometry.ice_surface_elevation - jnp.asarray(
            self.reference_surface, geometry.ice_thickness.dtype)
        dT = -self.temp_lapse_rate * dh
        smb = s.smb
        if self.smb_exp_factor != 0.0:
            smb = smb * jnp.exp(self.smb_exp_factor * dT)
        if self.smb_lapse_rate != 0.0:
            smb = smb - self.smb_lapse_rate * dh
        return s._replace(smb=smb,
                          temperature=jnp.minimum(s.temperature + dT,
                                                  273.15))


@dataclass
class Cache(SurfaceModel):
    """PISM ``-surface ...,cache`` (``surface::Cache``): update the inner
    (expensive) model only every ``update_interval`` and reuse the result
    in between. In the traced step the equivalent is quantizing the time
    argument — the inner model sees a piecewise-constant clock, so XLA CSE
    reuses the computation within a segment and results are identical to
    the reference semantics (stale-by-up-to-interval forcing)."""

    inner: SurfaceModel
    update_interval: float      # seconds

    def __call__(self, geometry, t) -> SurfaceInputs:
        tq = jnp.floor(t / self.update_interval) * self.update_interval
        return self.inner(geometry, tq)

    def update(self, geometry, t, dt, carry):
        # a stateful inner model must see every (t, dt) interval exactly
        # once — caching would drop state updates — so forward unquantized
        if self.stateful:
            return self.inner.update(geometry, t, dt, carry)
        return self(geometry, t), carry


@dataclass
class ForceThickness(SurfaceModel):
    """PISM ``-surface ...,forcing`` (``surface::ForceThickness``): nudge
    the SMB of an inner model toward a target thickness,
    SMB += -alpha (H - H_target), applied only where the target has ice
    (PISM applies a stronger alpha on ice-free target cells to clear
    spurious ice)."""

    inner: SurfaceModel
    target_thickness: jnp.ndarray    # m
    alpha: float = 3.17e-9           # 1/s  (PISM default ~0.1/year)
    ice_free_alpha_factor: float = 1.0
    start_time: float = -1.0e30      # [s]; nudging off before this
    #   (reference surface.force_to_thickness.start_time)

    def _transform(self, s, geometry, t) -> SurfaceInputs:
        H = geometry.ice_thickness
        Ht = jnp.asarray(self.target_thickness, H.dtype)
        alpha = jnp.where(Ht > 1.0, self.alpha,
                          self.alpha * self.ice_free_alpha_factor)
        alpha = jnp.where(jnp.asarray(t) >= self.start_time, alpha, 0.0)
        return s._replace(smb=s.smb - alpha * (H - Ht))
