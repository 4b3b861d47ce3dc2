"""Surface (climate) boundary models.

Rebuild of PISM ``src/coupler/surface/``: a surface model supplies the ice
surface mass balance (SMB, m/s ice-equivalent) and ice surface temperature
given the current geometry and model time. Models are pure callables so they
can live inside the jitted step; file-driven models pre-load their forcing
onto the device as arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax.numpy as jnp


class SurfaceInputs(NamedTuple):
    smb: jnp.ndarray        # surface mass balance [m/s ice equivalent]
    temperature: jnp.ndarray  # ice surface temperature [K]


class SurfaceModel:
    """Base interface (PISM ``surface::SurfaceModel``)."""

    def __call__(self, geometry, t) -> SurfaceInputs:
        raise NotImplementedError

    def max_timestep(self, t) -> float:
        return jnp.inf


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
    """Prescribed (time-constant) fields (PISM ``-surface given`` with a
    single time slice)."""

    smb_field: jnp.ndarray
    temperature_field: jnp.ndarray

    def __call__(self, geometry, t) -> SurfaceInputs:
        return SurfaceInputs(jnp.asarray(self.smb_field),
                             jnp.asarray(self.temperature_field))


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
