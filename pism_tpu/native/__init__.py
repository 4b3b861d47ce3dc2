"""ctypes bindings for the native runtime helpers (pism_native.cpp).

Compiled on demand with g++ (cached next to the source); every entry point
has a pure-numpy fallback so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pism_native.cpp")
_SO = os.path.join(_DIR, "libpism_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def build(force: bool = False) -> bool:
    """Compile the shared library; returns True on success."""
    global _lib, _tried
    if not force and os.path.exists(_SO) and \
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _load()
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
            check=True, capture_output=True)
        return _load()
    except (OSError, subprocess.CalledProcessError):
        return False


def _load() -> bool:
    global _lib
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return False
    lib.gregorian_day_number.restype = ctypes.c_longlong
    lib.gregorian_day_number.argtypes = [ctypes.c_int] * 3
    lib.gregorian_date.restype = None
    lib.gregorian_date.argtypes = [ctypes.c_longlong] + \
        [ctypes.POINTER(ctypes.c_int)] * 3
    lib.fixed_day_number.restype = ctypes.c_longlong
    lib.fixed_day_number.argtypes = [ctypes.c_int] * 4
    lib.is_gregorian_leap.restype = ctypes.c_int
    lib.is_gregorian_leap.argtypes = [ctypes.c_int]
    dp = ctypes.POINTER(ctypes.c_double)
    lib.regrid_bilinear.restype = None
    lib.regrid_bilinear.argtypes = [dp, dp, dp,
                                    ctypes.c_longlong, ctypes.c_longlong,
                                    dp, dp,
                                    ctypes.c_longlong, ctypes.c_longlong,
                                    ctypes.c_double, dp]
    _lib = lib
    return True


def available() -> bool:
    global _tried
    if _lib is None and not _tried:
        _tried = True
        build()
    return _lib is not None


# ---------------------------------------------------------------------------
# Calendar API (PISM's bundled calcalcs analog)
# ---------------------------------------------------------------------------

_CUM365 = np.asarray([0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334])


def day_number(year: int, month: int, day: int, calendar: str = "gregorian") -> int:
    """Days since (and including) 0001-01-01 under the given calendar."""
    if available():
        if calendar in ("gregorian", "standard", "proleptic_gregorian"):
            return int(_lib.gregorian_day_number(year, month, day))
        return int(_lib.fixed_day_number(year, month, day,
                                         1 if calendar == "360_day" else 0))
    # numpy/python fallback
    if calendar in ("gregorian", "standard", "proleptic_gregorian"):
        a = (14 - month) // 12
        y = year + 4800 - a
        m = month + 12 * a - 3
        jdn = day + (153 * m + 2) // 5 + 365 * y + y // 4 - y // 100 \
            + y // 400 - 32045
        return jdn - 1721426 + 1
    if calendar == "360_day":
        return (year - 1) * 360 + (month - 1) * 30 + (day - 1) + 1
    return (year - 1) * 365 + int(_CUM365[month - 1]) + (day - 1) + 1


def gregorian_date(dayno: int):
    """Inverse of day_number for the Gregorian calendar: (y, m, d)."""
    if available():
        y = ctypes.c_int()
        m = ctypes.c_int()
        d = ctypes.c_int()
        _lib.gregorian_date(dayno, ctypes.byref(y), ctypes.byref(m),
                            ctypes.byref(d))
        return y.value, m.value, d.value
    jdn = dayno + 1721426 - 1
    f = jdn + 1401 + (((4 * jdn + 274277) // 146097) * 3) // 4 - 38
    e = 4 * f + 3
    g = (e % 1461) // 4
    h = 5 * g + 2
    day = (h % 153) // 5 + 1
    month = ((h // 153 + 2) % 12) + 1
    year = e // 1461 - 4716 + (12 + 2 - month) // 12
    return int(year), int(month), int(day)


# ---------------------------------------------------------------------------
# Regridding API (PISM io_helpers regrid analog)
# ---------------------------------------------------------------------------

def regrid_bilinear(src, xs, ys, xt, yt, fill=np.nan) -> np.ndarray:
    """Bilinearly regrid src(ys, xs) onto the (yt, xt) grid, boundary-
    clamped, missing values (== fill or NaN) handled by weight
    renormalization."""
    src = np.ascontiguousarray(src, np.float64)
    xs = np.ascontiguousarray(xs, np.float64)
    ys = np.ascontiguousarray(ys, np.float64)
    xt = np.ascontiguousarray(xt, np.float64)
    yt = np.ascontiguousarray(yt, np.float64)
    out = np.empty((yt.size, xt.size), np.float64)
    if available():
        dp = ctypes.POINTER(ctypes.c_double)
        _lib.regrid_bilinear(
            src.ctypes.data_as(dp), xs.ctypes.data_as(dp),
            ys.ctypes.data_as(dp), xs.size, ys.size,
            xt.ctypes.data_as(dp), yt.ctypes.data_as(dp),
            xt.size, yt.size, float(fill), out.ctypes.data_as(dp))
        return out
    # numpy fallback
    fy = np.clip(np.interp(yt, ys, np.arange(ys.size)), 0, ys.size - 1)
    fx = np.clip(np.interp(xt, xs, np.arange(xs.size)), 0, xs.size - 1)
    j0 = np.floor(fy).astype(int)
    i0 = np.floor(fx).astype(int)
    j1 = np.minimum(j0 + 1, ys.size - 1)
    i1 = np.minimum(i0 + 1, xs.size - 1)
    wy = (fy - j0)[:, None]
    wx = (fx - i0)[None, :]
    vals = [src[np.ix_(j0, i0)], src[np.ix_(j0, i1)],
            src[np.ix_(j1, i0)], src[np.ix_(j1, i1)]]
    wts = [(1 - wy) * (1 - wx), (1 - wy) * wx, wy * (1 - wx), wy * wx]
    acc = np.zeros_like(out)
    wsum = np.zeros_like(out)
    for v, w in zip(vals, wts):
        valid = ~(np.isnan(v) | (v == fill))
        acc += np.where(valid, w * v, 0.0)
        wsum += np.where(valid, w, 0.0)
    with np.errstate(invalid="ignore"):
        out = np.where(wsum > 0, acc / np.maximum(wsum, 1e-300), fill)
    return out
