"""Scalar time-series forcing.

Rebuild of PISM ``src/util/ScalarForcing.cc``: 1D (time, value) forcing
series (e.g. ``-atmosphere ...,delta_T -atmosphere_delta_T_file``),
periodized or clamped, linearly interpolated in time. The series is baked
into the jitted step as device arrays, so evaluation at a traced model time
is a fused ``jnp.interp`` — no host callback per step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .units import SEC_PER_YEAR


@dataclass(frozen=True)
class ScalarForcing:
    times: jnp.ndarray      # [s], increasing
    values: jnp.ndarray
    periodic: bool = False

    @staticmethod
    def from_arrays(times_years, values, periodic: bool = False) -> "ScalarForcing":
        t = np.asarray(times_years, float) * SEC_PER_YEAR
        order = np.argsort(t)
        return ScalarForcing(jnp.asarray(t[order]),
                             jnp.asarray(np.asarray(values, float)[order]),
                             periodic)

    @staticmethod
    def from_file(path: str, variable: str, time_name: str = "time",
                  periodic: bool = False, calendar: str = "365_day",
                  reference_date: str = "1-1-1") -> "ScalarForcing":
        """Read a (time, value) series from a NetCDF-4/HDF5 file (PISM
        reads e.g. ``delta_T`` files). Dated CF time axes are aligned to
        model time under the run calendar (see
        ``util.timecal.parse_time_units``)."""
        from ..io.nc4 import File
        from .timecal import parse_time_units
        with File(path, "r") as f:
            t = np.asarray(f.read(time_name), float)
            units = dict(f.read_attrs(time_name)).get("units", b"seconds")
            if isinstance(units, bytes):
                units = units.decode()
            v = np.asarray(f.read(variable), float)
        scale, offset = parse_time_units(str(units), calendar,
                                         reference_date)
        t = t * scale + offset
        return ScalarForcing(jnp.asarray(t), jnp.asarray(v), periodic)

    def __call__(self, t):
        """Value at model time t [s] (traced-safe)."""
        tt = jnp.asarray(t)
        t0, t1 = self.times[0], self.times[-1]
        if self.periodic:
            period = t1 - t0
            tt = t0 + jnp.mod(tt - t0, jnp.maximum(period, 1.0))
        return jnp.interp(tt, self.times, self.values)
