import numpy as np
import pytest

from pism_tpu.util.units import SEC_PER_YEAR, convert, conversion_factor, Unit


def test_basic_conversions():
    assert convert(1.0, "km", "m") == 1000.0
    assert convert(1.0, "year", "seconds") == pytest.approx(SEC_PER_YEAR)
    assert convert(1.0, "m year-1", "m s-1") == pytest.approx(1.0 / SEC_PER_YEAR)
    assert convert(910.0, "kg m-3", "g cm-3") == pytest.approx(0.91)


def test_compound_and_slash():
    assert conversion_factor("kg m-2 year-1", "kg m-2 s-1") == pytest.approx(1 / SEC_PER_YEAR)
    assert conversion_factor("m/s", "m s-1") == 1.0
    assert conversion_factor("J kg-1", "J kg-1") == 1.0
    assert conversion_factor("mW m-2", "W m-2") == pytest.approx(1e-3)


def test_affine_celsius():
    assert convert(0.0, "degC", "K") == pytest.approx(273.15)
    assert convert(283.15, "K", "degC") == pytest.approx(10.0)


def test_incompatible_raises():
    with pytest.raises(ValueError):
        convert(1.0, "m", "s")
    with pytest.raises(ValueError):
        convert(1.0, "kg", "m s-1")


def test_pressure_exponents():
    u = Unit.parse("Pa-3 s-1")
    v = Unit.parse("Pa^-3 s^-1")
    assert u.dims == v.dims
    # 1e-16 Pa^-3 a^-1 in SI
    assert convert(1e-16, "Pa-3 year-1", "Pa-3 s-1") == pytest.approx(1e-16 / SEC_PER_YEAR)
