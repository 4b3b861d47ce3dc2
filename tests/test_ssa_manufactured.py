"""Manufactured-solution convergence of the nonlinear SSA discretization
(the role of the reference's smooth exact shelf test J; see
verification/ssa_manufactured.py)."""

import math

from pism_tpu.verification.ssa_manufactured import ManufacturedSSA

SPY = 3.15569259747e7


def test_ssa_manufactured_convergence():
    m = ManufacturedSSA()
    e33, _ = m.solve_on(33)
    e65, _ = m.solve_on(65)
    # absolute accuracy: < 2 m/a on a ~300 m/a field at 25 km
    assert e33 * SPY < 2.0
    # second-order convergence (allow slack for the max-norm)
    rate = math.log2(e33 / e65)
    assert rate > 1.5
