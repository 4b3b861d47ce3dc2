"""Fracture density tests: band advection on a prescribed velocity field,
growth/healing options, fracture age, Borstad envelope, inflow pinning
(reference src/fracturedensity/FractureDensity.cc semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.model.fracture import FractureDensity

SPY = 3.15569259747e7


def shelf_state(grid, H0=300.0):
    """All-floating shelf (deep bed)."""
    H = jnp.full(grid.shape2, H0)
    return ModelState(geometry=new_geometry(H, jnp.full(grid.shape2, -2000.0)))


def make_fd(grid, **over):
    cfg = Config({"fracture_density.enabled": True, **over})
    return FractureDensity(grid=grid, config=cfg)


def test_crevasse_band_advects_with_prescribed_velocity():
    """A phi band in a uniform flow moves downstream at the flow speed;
    the limited scheme preserves the band's mass and keeps its peak
    better than donor-cell."""
    grid = Grid(Mx=101, My=5, Lx=100e3, Ly=5e3, periodicity="xy")
    state = shelf_state(grid)
    u = jnp.full(grid.shape2, 100.0 / SPY)   # 100 m/a downstream
    v = jnp.zeros(grid.shape2)
    x = np.asarray(grid.x)
    band0 = np.exp(-((x + 50e3) / 8e3) ** 2)          # band near x=-50 km
    phi0 = jnp.asarray(np.tile(band0[None, :], (grid.My, 1))) * 0.8

    results = {}
    for limited in (True, False):
        fd = make_fd(grid, **{"fracture_density.constant_fd": True,
                              "fracture_density.fd2d_scheme": limited})
        phi = phi0
        dt = 2.0 * SPY                                 # CFL = u dt/dx = 0.1
        nsteps = 250                                   # 500 years
        st = state.replace(fracture_density=phi)
        for _ in range(nsteps):
            phi = fd.step(st.replace(fracture_density=phi), u, v, dt).density
        results[limited] = np.asarray(phi)

    for limited, phi in results.items():
        c = grid.My // 2
        # center of mass moved by u * T = 100 m/a * 500 a = 50 km
        com = float((x * phi[c]).sum() / phi[c].sum())
        assert com == pytest.approx(0.0, abs=2.0 * grid.dx), (limited, com)
        # advection alone conserves the band mass (periodic, uniform u)
        np.testing.assert_allclose(phi[c].sum(), 0.8 * band0.sum(), rtol=0.02)
    # the minmod-limited scheme is less diffusive than donor-cell
    assert results[True].max() > results[False].max() + 0.02


def test_growth_floating_only_and_age_reset():
    """Divergent flow above the threshold grows phi on floating ice only
    (include_grounded_ice extends it); fracture age accumulates where
    intact and resets where fractures grow."""
    grid = Grid(Mx=31, My=31, Lx=30e3, Ly=30e3)
    H = jnp.full(grid.shape2, 300.0)
    bed = np.full(grid.shape2, -2000.0)
    bed[:, :10] = -100.0                     # west strip grounded
    geom = new_geometry(H, jnp.asarray(bed))
    state = ModelState(geometry=geom,
                       fracture_density=jnp.zeros(grid.shape2),
                       fracture_age=jnp.full(grid.shape2, 10.0 * SPY))
    grounded = np.asarray(bed) == -100.0
    # uniform spreading: exx = eyy = 2e-9 / s >> threshold 7e-10
    X, Y = np.meshgrid(grid.x, grid.y)
    u = jnp.asarray(2e-9 * X)
    v = jnp.asarray(2e-9 * Y)
    dt = 0.5 * SPY

    fd = make_fd(grid)
    res = fd.step(state, u, v, dt)
    phi = np.asarray(res.density)
    assert phi[~grounded].max() > 1e-4           # floating ice fractures
    assert phi[grounded].max() == 0.0            # grounded ice does not
    age = np.asarray(res.age)
    assert (age[phi > 1e-6] == 0.0).all()        # fresh fractures: age 0
    # intact interior cells aged by dt
    intact = (~grounded) & (phi <= 1e-6)
    if intact.any():
        assert age[intact].max() == pytest.approx(10.0 * SPY + dt, rel=1e-6)

    fd_g = make_fd(grid, **{"fracture_density.include_grounded_ice": True})
    phi_g = np.asarray(fd_g.step(state, u, v, dt).density)
    assert phi_g[grounded].max() > 1e-4          # option extends to grounded


def test_healing_options():
    """Below the healing threshold phi decays; constant_healing decays
    everywhere at a fixed rate; fracture_weighted_healing slows healing
    of heavily fractured ice."""
    grid = Grid(Mx=11, My=11, Lx=10e3, Ly=10e3)
    state = shelf_state(grid)
    phi0 = jnp.full(grid.shape2, 0.5)
    st = state.replace(fracture_density=phi0)
    u = v = jnp.zeros(grid.shape2)               # e1 = 0 < healing threshold
    dt = 1.0 * SPY
    gh = {"fracture_density.gamma_h": 1.0}

    phi_h = np.asarray(make_fd(grid, **gh).step(st, u, v, dt).density)
    assert (phi_h < 0.5).all()                   # strain-gated healing acts
    expected = 0.5 - 1.0 * 2.0e-10 * dt          # gamma_h*(eps_h - 0)*dt
    np.testing.assert_allclose(phi_h, expected, rtol=1e-6)

    phi_c = np.asarray(make_fd(grid, **gh,
        **{"fracture_density.constant_healing": True}).step(
            st, u, v, dt).density)
    np.testing.assert_allclose(phi_c, expected, rtol=1e-6)

    phi_w = np.asarray(make_fd(grid, **gh,
        **{"fracture_density.fracture_weighted_healing": True}).step(
            st, u, v, dt).density)
    assert (phi_w > phi_h - 1e-12).all()         # (1-phi) weight heals less
    np.testing.assert_allclose(phi_w, 0.5 - (1 - 0.5) * 2.0e-10 * dt,
                               rtol=1e-6)

    # constant_fd freezes everything but transport
    phi_f = np.asarray(make_fd(grid, **gh,
        **{"fracture_density.constant_fd": True}).step(st, u, v, dt).density)
    np.testing.assert_allclose(phi_f, 0.5)


def test_borstad_envelope_and_stress_criteria():
    """borstad_limit: damage jumps to 1 - (eps_cr/eps_e)^(1/n) where the
    criterion is exceeded; max_shear_stress with a hardness uses the
    constitutive stress against the Pa threshold."""
    grid = Grid(Mx=21, My=21, Lx=20e3, Ly=20e3)
    state = shelf_state(grid)
    st = state.replace(fracture_density=jnp.zeros(grid.shape2))
    X, Y = np.meshgrid(grid.x, grid.y)
    k = 4.0e-9
    u, v = jnp.asarray(k * X), jnp.asarray(k * Y)   # eps_e = sqrt(3)*k

    fd = make_fd(grid, **{"fracture_density.borstad_limit": True})
    phi = np.asarray(fd.step(st, u, v, 0.1 * SPY).density)
    eps_e = np.sqrt(3.0) * k
    target = 1.0 - (fd.eps_cr / eps_e) ** (1.0 / 3.0)
    inner = phi[5:-5, 5:-5]
    np.testing.assert_allclose(inner, target, rtol=1e-6)

    # pure shear u = c*y: tau_max = B * eps_e^(1/n-1) * (e1-e2)/2
    c = 2.0e-9
    us, vs = jnp.asarray(c * Y), jnp.zeros(grid.shape2)
    B = 1.0e8                                    # Pa s^(1/3)
    exy = c / 2.0
    tau_max = B * exy ** (1.0 / 3.0)             # eps_e = exy here
    for thresh, expect_growth in ((tau_max * 0.5, True),
                                  (tau_max * 2.0, False)):
        fd_s = make_fd(grid, **{
            "fracture_density.max_shear_stress": True,
            "fracture_density.initiation_stress_threshold": float(thresh)})
        phi_s = np.asarray(fd_s.step(
            st, us, vs, 0.5 * SPY,
            hardness=jnp.full(grid.shape2, B)).density)
        grew = phi_s[5:-5, 5:-5].max() > 0.0
        assert grew == expect_growth, (thresh, phi_s.max())


def test_inflow_pinning_phi0():
    grid = Grid(Mx=21, My=5, Lx=20e3, Ly=5e3, periodicity="y")
    state = shelf_state(grid)
    bc = np.zeros(grid.shape2, bool)
    bc[:, 0] = True
    cfg = Config({"fracture_density.enabled": True,
                  "fracture_density.phi0": 0.25,
                  "fracture_density.constant_fd": True})
    fd = FractureDensity(grid=grid, config=cfg, bc_mask=jnp.asarray(bc))
    st = state.replace(fracture_density=jnp.full(grid.shape2, 0.9))
    phi = np.asarray(fd.step(st, jnp.zeros(grid.shape2),
                             jnp.zeros(grid.shape2), SPY).density)
    assert (phi[:, 0] == 0.25).all()
    assert (phi[:, 1:] == 0.9).all()
