"""Sea-level forcing models.

Rebuild of PISM ``src/coupler/ocean/sea_level/`` (``Initialization``,
``Delta_SL``, ``Delta_SL_2D``): supply the sea-level field entering the
flotation criterion. Scalar forcings take a host-provided callable of model
time (a ``ScalarForcing`` analog); 2D variants take fields.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp


class SeaLevelModel:
    def __call__(self, geometry, t):
        raise NotImplementedError


@dataclass
class Constant(SeaLevelModel):
    value: float = 0.0

    def __call__(self, geometry, t):
        H = geometry.ice_thickness
        return jnp.full(H.shape, self.value, H.dtype)


@dataclass
class DeltaSL(SeaLevelModel):
    """Scalar offset on an inner model (PISM ``-sea_level ...,delta_sl``)."""

    inner: SeaLevelModel
    offset: Callable    # t -> meters (jnp-traceable)

    def __call__(self, geometry, t):
        return self.inner(geometry, t) + self.offset(t)


@dataclass
class DeltaSL2D(SeaLevelModel):
    """2D offset field (PISM ``delta_sl_2d``). ``offset_field`` is either a
    static (My, Mx) field or a time stack (T, My, Mx) with ``times`` [s]
    (reference: ``ocean.delta_sl_2d.file`` frames, linearly interpolated in
    time and held constant outside the covered interval)."""

    inner: SeaLevelModel
    offset_field: jnp.ndarray
    times: Optional[jnp.ndarray] = None
    period: float = 0.0   # [s]; > 0 cycles (sea_level.delta_sl_2d.periodic)

    def __call__(self, geometry, t):
        f = jnp.asarray(self.offset_field)
        if f.ndim == 3 and self.times is None:
            raise ValueError(
                "DeltaSL2D: offset_field has a time axis (T, My, Mx) but "
                "no `times` coordinates were given")
        if self.times is None or f.ndim == 2:
            return self.inner(geometry, t) + f
        ts = jnp.asarray(self.times)
        if self.period > 0.0:
            t = ts[0] + jnp.mod(t - ts[0], self.period)
        tq = jnp.clip(t, ts[0], ts[-1])
        k = jnp.clip(jnp.searchsorted(ts, tq, side="right") - 1,
                     0, ts.shape[0] - 2)
        w = (tq - ts[k]) / jnp.maximum(ts[k + 1] - ts[k], 1e-30)
        frame = (1.0 - w) * f[k] + w * f[k + 1]
        return self.inner(geometry, t) + frame
