"""Regional (outlet-glacier subdomain) mode tests — rebuild of PISM
``src/regional/`` (IceRegionalModel): inside the no-model strip the
thickness is frozen, the SIA surface gradient and SSA driving stress are
zeroed (SIAFD_Regional / SSAFD_Regional), and the yield stress is huge
(RegionalYieldStress), so the strip acts as a stationary Dirichlet frame
around the modeled subdomain."""

import numpy as np
import jax.numpy as jnp

from pism_tpu import Config, Grid
from pism_tpu.coupler.surface import Uniform
from pism_tpu.model.icemodel import IceModel
from pism_tpu.state import ModelState, new_geometry

SPY = 3.15569259747e7


def _setup(with_strip):
    grid = Grid(Mx=32, My=24, Lx=160e3, Ly=120e3)
    # steep grounded slab sloping down +x: strong driving stress everywhere,
    # including at the domain edges
    X = np.tile(np.linspace(0.0, 1.0, 32)[None, :], (24, 1))
    bed = 2000.0 - 1500.0 * X
    H = np.full(grid.shape2, 800.0)
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))

    nmm = np.zeros(grid.shape2, bool)
    nmm[:2, :] = nmm[-2:, :] = True
    nmm[:, :2] = nmm[:, -2:] = True

    cfg = Config({
        "stress_balance.model": "ssa+sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "stress_balance.ssa.flow_law": "isothermal_glen",
        "energy.model": "none",
        # weak constant till so the modeled interior actually slides
        "basal_yield_stress.model": "constant",
        "basal_yield_stress.constant.value": 2.0e4,
        "regional.enabled": with_strip,
        "runtime.device_loop": False,
    })
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0),
                     no_model_mask=jnp.asarray(nmm) if with_strip else None)
    return model, ModelState(geometry=geom), nmm


def test_no_model_strip_freezes_and_pins():
    model, state, nmm = _setup(True)
    state = model.prepare_state(state)
    H0 = np.asarray(state.geometry.ice_thickness).copy()

    out, t, stats = model.step_once(state, 0.0, 5 * SPY)
    H1 = np.asarray(out.geometry.ice_thickness)

    # strip thickness is exactly frozen
    assert np.array_equal(H1[nmm], H0[nmm])
    # interior evolves (the slab spreads under the driving stress)
    assert np.abs(H1[~nmm] - H0[~nmm]).max() > 1e-3
    # sliding velocity in the strip is pinned by the huge yield stress and
    # the zeroed driving stress (well under 1 m/a on a steep slab)
    u = np.abs(np.asarray(out.u_ssa)) * SPY
    v = np.abs(np.asarray(out.v_ssa)) * SPY
    assert max(u[nmm].max(), v[nmm].max()) < 1.0
    assert u[~nmm].max() > 1.0   # the modeled interior does slide


def test_strip_velocity_much_smaller_than_unrestricted():
    model_r, state_r, nmm = _setup(True)
    model_f, state_f, _ = _setup(False)
    out_r, _, _ = model_r.step_once(model_r.prepare_state(state_r), 0.0, 5 * SPY)
    out_f, _, _ = model_f.step_once(model_f.prepare_state(state_f), 0.0, 5 * SPY)
    sp_r = np.hypot(np.asarray(out_r.u_ssa), np.asarray(out_r.v_ssa)) * SPY
    sp_f = np.hypot(np.asarray(out_f.u_ssa), np.asarray(out_f.v_ssa)) * SPY
    assert sp_f[nmm].max() > 10 * max(sp_r[nmm].max(), 1e-12)
