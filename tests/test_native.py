"""Native (C++/ctypes) runtime helpers: calendar arithmetic and bilinear
regridding — compiled path vs numpy fallback equivalence."""

import datetime

import numpy as np
import pytest

from pism_tpu import native


def test_native_builds():
    assert native.build() is True  # g++ is in the image


def test_gregorian_day_number_matches_python_datetime():
    base = native.day_number(1, 1, 1, "gregorian")
    assert base == 1
    for (y, m, d) in [(2000, 3, 1), (1970, 1, 1), (2026, 8, 16), (1600, 2, 29)]:
        got = native.day_number(y, m, d, "gregorian") - base
        want = (datetime.date(y, m, d) - datetime.date(1, 1, 1)).days
        assert got == want, (y, m, d)


def test_gregorian_roundtrip():
    for dn in [1, 365, 366, 730000, 739000]:
        y, m, d = native.gregorian_date(dn)
        assert native.day_number(y, m, d, "gregorian") == dn


def test_fixed_calendars():
    assert native.day_number(1, 1, 1, "365_day") == 1
    assert native.day_number(2, 1, 1, "365_day") == 366
    assert native.day_number(1, 3, 1, "365_day") == 60  # no leap day
    assert native.day_number(2, 1, 1, "360_day") == 361


def test_regrid_exact_on_linear_field():
    xs = np.linspace(0, 10, 21)
    ys = np.linspace(0, 5, 11)
    X, Y = np.meshgrid(xs, ys)
    src = 2.0 * X - 3.0 * Y + 1.0
    xt = np.linspace(0.5, 9.5, 37)
    yt = np.linspace(0.2, 4.8, 17)
    out = native.regrid_bilinear(src, xs, ys, xt, yt)
    XT, YT = np.meshgrid(xt, yt)
    np.testing.assert_allclose(out, 2.0 * XT - 3.0 * YT + 1.0, rtol=1e-12)


def test_regrid_missing_values_renormalized():
    xs = np.linspace(0, 1, 2)
    ys = np.linspace(0, 1, 2)
    src = np.array([[1.0, np.nan], [1.0, np.nan]])
    out = native.regrid_bilinear(src, xs, ys, np.asarray([0.5]),
                                 np.asarray([0.5]))
    assert out[0, 0] == pytest.approx(1.0)   # missing corner ignored
    src_all_bad = np.full((2, 2), np.nan)
    out2 = native.regrid_bilinear(src_all_bad, xs, ys, np.asarray([0.5]),
                                  np.asarray([0.5]))
    assert np.isnan(out2[0, 0])


def test_native_matches_numpy_fallback(rng):
    xs = np.sort(rng.uniform(0, 100, 40))
    ys = np.sort(rng.uniform(0, 50, 30))
    src = rng.normal(size=(30, 40))
    xt = np.linspace(5, 95, 23)
    yt = np.linspace(2, 48, 13)
    assert native.build()
    out_c = native.regrid_bilinear(src, xs, ys, xt, yt)
    # force the numpy fallback
    saved = native._lib
    try:
        native._lib = None
        native._tried = True
        out_np = native.regrid_bilinear(src, xs, ys, xt, yt)
    finally:
        native._lib = saved
        native._tried = True
    np.testing.assert_allclose(out_c, out_np, rtol=1e-10, atol=1e-12)
