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


def test_sia_strip_faces_use_stored_surface_gradient():
    """SIAFD_Regional: faces touching the strip see the stored-surface
    gradient, so the strip keeps exchanging diffusive flux with the
    interior consistently with the stored frame (not zero, the old
    simplification)."""
    import jax.numpy as jnp
    from pism_tpu.ops import sia as sia_ops
    from pism_tpu.ops.stencils import Shifter
    from pism_tpu.physics.rheology import IsothermalGlen

    grid = Grid(Mx=16, My=12, Lx=80e3, Ly=60e3)
    sh = Shifter(grid)
    X = np.tile(np.linspace(0.0, 1.0, 16)[None, :], (12, 1))
    H = 1000.0 + 200.0 * X          # sloped slab
    geom = new_geometry(jnp.asarray(H), jnp.zeros(grid.shape2))
    nmm = np.zeros(grid.shape2, bool)
    nmm[:, :3] = True               # strip on the west edge
    stored = jnp.asarray(2000.0 - 300.0 * X)   # a DIFFERENT stored surface
    law = IsothermalGlen(A=1e-16 / 3.15569259747e7)

    flux = sia_ops.diffusivity(law, geom, None, grid, sh,
                               no_model_mask=jnp.asarray(nmm),
                               stored_surface=stored)
    ref = sia_ops.diffusivity(law, geom, None, grid, sh)

    qe = np.asarray(flux.qe)
    # east faces fully inside the modeled interior: unchanged
    assert np.allclose(qe[:, 5:-1], np.asarray(ref.qe)[:, 5:-1])
    # the strip-boundary face (between column 2 in-strip and 3 interior)
    # uses the stored gradient: stored slope is NEGATIVE (-300/80e3*...)
    # so the flux is positive (downhill is -x -> q_e = -D * s_x > 0)
    assert qe[:, 2].min() > 0.0
    # actual surface slopes +x, so without the override it would be negative
    assert np.asarray(ref.qe)[:, 2].max() < 0.0

    # zero_gradient option: those faces carry no flux at all
    flux0 = sia_ops.diffusivity(law, geom, None, grid, sh,
                                no_model_mask=jnp.asarray(nmm),
                                stored_surface=stored,
                                regional_zero_gradient=True)
    assert np.all(np.asarray(flux0.qe)[:, :3] == 0.0)
    assert np.allclose(np.asarray(flux0.qe)[:, 5:-1],
                       np.asarray(ref.qe)[:, 5:-1])


def test_strip_driving_stress_from_stored_fields():
    """SSAFD_Regional: in-strip driving stress is -rho g thkstore
    grad(usurfstore) with differences confined to the strip."""
    model, state, nmm = _setup(True)
    state = model.prepare_state(state)
    # the stored frame defaults to the initial geometry
    assert model.usurf_store is not None and model.thk_store is not None
    out, _, _ = model.step_once(state, 0.0, 2 * SPY)
    u = np.asarray(out.u_ssa) * SPY
    # the slab slopes down +x with the SAME stored slope in the strip, so
    # in-strip cells (pinned by the 1e6 Pa yield stress) creep slowly +x
    # rather than being torn by a zero-taud discontinuity; still slow:
    assert np.abs(u[nmm]).max() < 5.0


def test_interior_invariant_when_strip_widens():
    """The PISM regional contract: the strip shields the interior, so
    widening it (2 -> 4 cells) barely changes the solution well inside.
    Realistic outlet-glacier setup: an active weak-bedded dome in the
    center, a near-stationary strong-bedded far field reaching the strip
    (a regional cutout is placed so its boundary crosses slow ice)."""
    import jax.numpy as jnp
    from pism_tpu.physics.basal import GivenYieldStress

    grid = Grid(Mx=40, My=30, Lx=200e3, Ly=150e3)
    XX, YY = np.meshgrid(grid.x, grid.y)
    r = np.hypot(XX, YY)
    H0 = 600.0 + 1400.0 * np.exp(-(r / 50e3) ** 2)
    tauc = np.where(r < 70e3, 3.0e4, 1.0e8)   # weak center, rigid far field

    def run(width):
        nmm = np.zeros(grid.shape2, bool)
        nmm[:width, :] = nmm[-width:, :] = True
        nmm[:, :width] = nmm[:, -width:] = True
        cfg = Config({
            "stress_balance.model": "ssa+sia",
            "stress_balance.sia.flow_law": "isothermal_glen",
            "stress_balance.ssa.flow_law": "isothermal_glen",
            "energy.model": "none",
            "basal_yield_stress.model": "given",
            "regional.enabled": True,
            "runtime.device_loop": False,
        })
        model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0),
                         yield_stress=GivenYieldStress(cfg, tau_c=jnp.asarray(tauc)),
                         no_model_mask=jnp.asarray(nmm))
        st = model.prepare_state(ModelState(
            geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2))))
        out, _, _ = model.step_once(st, 0.0, 10 * SPY)
        return np.asarray(out.geometry.ice_thickness)

    H2, H4 = run(2), run(4)
    interior = np.zeros(H2.shape, bool)
    interior[8:-8, 8:-8] = True
    evol = np.abs(H2[interior] - H0[interior]).max()
    assert evol > 0.5                      # the interior genuinely evolves
    diff = np.abs(H2[interior] - H4[interior]).max()
    assert diff < 0.02 * evol              # ... but is shielded by the strip
