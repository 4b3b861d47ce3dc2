"""Verification vs the remaining isothermal exact solutions (PISM ``pismv``
tests A, D, H and the test-L role; reference
``src/verification/tests/exactTests{ABCD,H}.c``, ``exactTestL.cc``)."""

import numpy as np
import jax.numpy as jnp

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.model.icemodel import IceModel
from pism_tpu.model.calving import CalvingModel
from pism_tpu.coupler.surface import FunctionSurface
from pism_tpu.verification import exact_steady as es
from pism_tpu.verification import halfar

SPY = 3.15569259747e7


def _config(extra=None):
    cfg = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "energy.model": "none",
    })
    if extra:
        cfg.update(extra)
    return cfg


def _ocean_kill_beyond(grid, config, L):
    kill = grid.radius > L
    config.update({"calving.methods": "ocean_kill"})
    return CalvingModel(grid=grid, config=config,
                        ocean_kill_mask=jnp.asarray(kill))


def test_A_steady_margin():
    """Start from the exact steady cap; the numerical solution must hold it."""
    cap = es.test_A()
    grid = Grid(Mx=61, My=61, Lx=900e3, Ly=900e3)
    cfg = _config()
    He = cap.thickness(grid.radius)
    M = jnp.asarray(cap.accumulation(grid.radius))

    def smb(geometry, t):
        return M, jnp.full(geometry.ice_thickness.shape, 263.15)

    state = ModelState(geometry=new_geometry(jnp.asarray(He),
                                             jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg, surface=FunctionSurface(smb),
                     calving=_ocean_kill_beyond(grid, cfg, cap.L))
    state, tf, stats = model.step_once(state, 0.0, 2000.0 * SPY)
    errs = halfar.error_norms(np.asarray(state.geometry.ice_thickness), He)
    assert int(stats.nsteps) > 50
    # the margin has unbounded slope: max errors concentrate there and do
    # not converge (Bueler et al. 2005 report the same for the fixed-margin
    # tests); dome and average errors do converge
    assert errs["dome_H"] < 30.0      # on a ~3280 m dome
    assert errs["avg_H"] < 100.0
    assert errs["max_H"] < 1500.0


def test_D_compensatory_oscillation():
    """Time-dependent compensatory accumulation over half a period."""
    H_exact, M_comp = es.make_test_D()
    cap = es.SteadyCap()
    grid = Grid(Mx=61, My=61, Lx=900e3, Ly=900e3)
    cfg = _config()
    r = jnp.asarray(grid.radius)
    H0 = H_exact(0.0, grid.radius)

    def smb(geometry, t):
        return M_comp(t, r), jnp.full(geometry.ice_thickness.shape, 263.15)

    state = ModelState(geometry=new_geometry(jnp.asarray(H0),
                                             jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg, surface=FunctionSurface(smb),
                     calving=_ocean_kill_beyond(grid, cfg, cap.L))
    t_end = 2500.0 * SPY   # half an oscillation period
    state, tf, stats = model.step_once(state, 0.0, t_end)
    He = H_exact(t_end, grid.radius)
    errs = halfar.error_norms(np.asarray(state.geometry.ice_thickness), He)
    assert errs["dome_H"] < 35.0
    assert errs["avg_H"] < 110.0


def test_H_isostasy_similarity():
    """Moving margin + pointwise isostasy: bed must track -f H exactly."""
    sol = es.test_H()
    flat = sol.flat
    t0, t1 = 0.6 * flat.t0, flat.t0
    grid = Grid(Mx=61, My=61, Lx=900e3, Ly=900e3)
    cfg = _config({
        "bed_deformation.model": "iso",
        "bed_deformation.lithosphere_density": halfar.RHO_ICE / sol.f,
        # test H uses the effective softness A (1-f)^n in the *exact*
        # solution; the model runs the true softness over the deformed bed
    })
    H0 = sol.thickness(t0, grid.radius)
    b0 = sol.bed(t0, grid.radius)

    def smb(geometry, t):
        m = sol.lam / t * geometry.ice_thickness
        return m, jnp.full(geometry.ice_thickness.shape, 263.15)

    state = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.asarray(b0)))
    model = IceModel(grid=grid, config=cfg, surface=FunctionSurface(smb))
    state, tf, stats = model.step_once(state, t0, t1 - t0)
    He = sol.thickness(t1, grid.radius)
    Hn = np.asarray(state.geometry.ice_thickness)
    errs = halfar.error_norms(Hn, He)
    assert errs["dome_H"] < 60.0
    assert errs["avg_H"] < 40.0
    # the bed must satisfy b = -f H wherever there is ice (isostasy exact)
    bn = np.asarray(state.geometry.bed_elevation)
    icy = Hn > 1.0
    assert np.max(np.abs(bn + sol.f * Hn)[icy]) < 1e-6


def test_L_steady_on_bed():
    """Steady cap over a non-flat bed (exact profile from the radial ODE)."""
    cap = es.test_L()
    grid = Grid(Mx=61, My=61, Lx=900e3, Ly=900e3)
    cfg = _config()
    He = cap.solve(grid.radius)
    bed = cap.bed(grid.radius)
    M = jnp.asarray(np.where(grid.radius < cap.L, cap.M0, 0.0))

    def smb(geometry, t):
        return M, jnp.full(geometry.ice_thickness.shape, 263.15)

    state = ModelState(geometry=new_geometry(jnp.asarray(He),
                                             jnp.asarray(bed)))
    model = IceModel(grid=grid, config=cfg, surface=FunctionSurface(smb),
                     calving=_ocean_kill_beyond(grid, cfg, cap.L))
    state, tf, stats = model.step_once(state, 0.0, 1000.0 * SPY)
    errs = halfar.error_norms(np.asarray(state.geometry.ice_thickness), He)
    assert errs["dome_H"] < 15.0
    assert errs["avg_H"] < 160.0     # margin-singularity dominated
    assert errs["max_H"] < 1600.0


def test_L_average_error_converges():
    """Refinement 31 -> 61 must shrink the interior (average) error."""
    def run(Mx):
        cap = es.test_L()
        grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
        cfg = _config()
        He = cap.solve(grid.radius)
        M = jnp.asarray(np.where(grid.radius < cap.L, cap.M0, 0.0))

        def smb(geometry, t):
            return M, jnp.full(geometry.ice_thickness.shape, 263.15)

        state = ModelState(geometry=new_geometry(
            jnp.asarray(He), jnp.asarray(cap.bed(grid.radius))))
        model = IceModel(grid=grid, config=cfg, surface=FunctionSurface(smb),
                         calving=_ocean_kill_beyond(grid, cfg, cap.L))
        state, _, _ = model.step_once(state, 0.0, 1000.0 * SPY)
        return halfar.error_norms(
            np.asarray(state.geometry.ice_thickness), He)

    coarse, fine = run(31), run(61)
    assert fine["avg_H"] < 0.85 * coarse["avg_H"]
    assert fine["rel_volume"] < 0.85 * coarse["rel_volume"]


def test_E_sliding_sector_steady():
    """Test E (Bueler et al. 2005 role): the test-A cap with prescribed
    sector sliding and autodiff-compensatory accumulation stays as close
    to the exact profile as plain test A does (the sliding adds no
    additional drift), and the sliding field itself is nontrivial."""
    from pism_tpu.verification.runner import run_E, run_A

    errs_E = run_E(Mx=31, years=300.0)
    errs_A = run_A(Mx=31, years=300.0)
    # the dominant error is the shared margin discretization; the sector
    # sliding must not add more than a small fraction on top of test A
    assert errs_E["avg_H"] < 1.3 * errs_A["avg_H"] + 5.0
    assert errs_E["dome_H"] < errs_A["dome_H"] + 10.0

    sc = es.test_E()
    x = np.linspace(-900e3, 900e3, 31)
    X, Y = np.meshgrid(x, x)
    ub, vb = sc.sliding_velocity(X, Y)
    spy = 3.15569259747e7
    speed = np.hypot(ub, vb) * spy
    assert speed.max() > 10.0           # sliding really present (m/a)
    # zero outside the sector
    r = np.hypot(X, Y)
    outside = (r < sc.r1) | (r > sc.r2)
    assert np.abs(speed[outside]).max() == 0.0
    # compensatory accumulation integrates to ~the sliding flux out of the
    # sector = 0 net (divergence theorem: flux vanishes on the boundary)
    M = sc.accumulation(X, Y)
    Mc = M - np.asarray(es.SteadyCap().accumulation(r))
    dx = x[1] - x[0]
    net = Mc.sum() * dx * dx * spy      # m^3/a
    gross = np.abs(Mc).sum() * dx * dx * spy
    assert abs(net) < 0.05 * gross
