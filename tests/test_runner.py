"""pismv-driver tests: the verification runner (pism_tpu/verification/
runner.py, the analog of PISM's ``pismv`` executable, reference
``src/pismv.cc`` / ``src/verification/iceCompModel.cc``) must set up, run,
and report each supported letter, and the errors must stay inside loose
regression bands (the tight accuracy/convergence checks live in the
per-solution test modules)."""

import pytest

from pism_tpu.verification import runner


def test_runner_K_exact():
    # conduction column reaches the exact linear steady profile
    e = runner.run_test("K", Mz=41, years=300000.0)
    assert e["maxT_ice"] < 1e-2
    assert e["bed_flux_err"] < 1e-8
    assert e["bed_dT_err"] < 1e-6


def test_runner_O_bmelt():
    e = runner.run_test("O")
    assert e["prcnt_err"] < 1.0


def test_runner_A_small():
    e = runner.run_test("A", Mx=31, years=200.0)
    # margin staircase dominates max_H; volume error is the headline
    assert e["prcnt_volume"] < 5.0


def test_runner_G_returns_to_start():
    # one full period on a coarse grid: drift is pure discretization error
    e = runner.run_test("G", Mx=31, Mz=21, years=200.0)
    assert e["prcnt_volume"] < 1.0
    assert e["dome_H"] < 50.0


def test_runner_unknown_letter():
    with pytest.raises(ValueError):
        runner.run_test("Z")
