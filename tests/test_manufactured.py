"""Manufactured-solution verification of the thermo-coupled SIA (the role
of PISM verification tests F/G): exact H and T with an autodiff-exact
compensatory SMB; any drift from the exact state is pure discretization
error and must converge under refinement."""

import numpy as np
import jax.numpy as jnp

from pism_tpu import Config, Grid, Time
from pism_tpu.model.icemodel import IceModel
from pism_tpu.verification.manufactured import ManufacturedThermoSIA, SPY


def _drift(Mx, Mz, years=200.0):
    ms = ManufacturedThermoSIA()
    grid = Grid(Mx=Mx, My=Mx, Lx=750e3, Ly=750e3, Mz=Mz, Lz=3500.0)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "pb",
                  "energy.model": "none"})
    state, surface = ms.setup(grid, cfg)
    H0 = state.geometry.ice_thickness
    model = IceModel(grid=grid, config=cfg, surface=surface)
    st, stats = model.run(state, Time(0.0, years * SPY))
    assert int(stats.nsteps) > 3
    return float(jnp.abs(st.geometry.ice_thickness - H0).max())


def test_thermo_sia_manufactured_convergence():
    """200 years on a 3000 m thermo-coupled dome: the discrete solution
    stays within ~1 m of the exact one and the drift converges ~O(h^2).
    A physics mismatch (e.g. dropping the pressure adjustment in the
    Paterson-Budd softness) shows up as a resolution-INDEPENDENT drift of
    several meters — this test pins the coupling, not just the scheme."""
    d_coarse = _drift(41, 21)
    d_fine = _drift(81, 41)
    assert d_coarse < 2.0          # m, 0.07% of the dome thickness
    assert d_fine < 0.45 * d_coarse


def test_compensatory_smb_is_exact_divergence():
    """The autodiff M_c equals the hand-derived divergence for an
    isothermal power-law profile where div q is available in closed form
    via finite differences of the flux at machine-tight spacing."""
    ms = ManufacturedThermoSIA(dTb=0.0)   # isothermal: T = Ts everywhere
    r = 300e3
    h = 1.0   # m; flux varies over ~100 km, so FD error ~ (h/L)^2 ~ 1e-10
    q = ms.flux
    div_fd = ((r + h) * q(r + h) - (r - h) * q(r - h)) / (2 * h * r)
    np.testing.assert_allclose(float(ms.compensatory_smb(r)),
                               float(div_fd), rtol=1e-6)
