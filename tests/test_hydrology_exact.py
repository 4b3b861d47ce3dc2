"""Routing hydrology vs the exact radial steady state (test-P role;
PISM verifies hydrology the same way via ``pismv`` test P)."""

import numpy as np
import jax.numpy as jnp

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.physics.hydrology import Routing
from pism_tpu.verification.hydrology_exact import RoutingSteady

SPY = 3.15569259747e7


def _setup(Mx=51):
    sol = RoutingSteady()
    grid = Grid(Mx=Mx, My=Mx, Lx=30e3, Ly=30e3)
    cfg = Config({
        "hydrology.model": "routing",
        "hydrology.tillwat_decay_rate": 0.0,   # all melt overflows to W
        "hydrology.hydraulic_conductivity": sol.k,
        "hydrology.alpha": sol.alpha,
        "hydrology.beta": sol.beta,
    })
    r = grid.radius
    geometry = new_geometry(jnp.asarray(sol.thickness(r)),
                            jnp.asarray(sol.bed(r)))
    W_max = cfg.get_number("hydrology.tillwat_max")
    state = ModelState(
        geometry=geometry,
        # till layer pre-filled so the basal melt routes laterally
        tillwat=jnp.full(grid.shape2, W_max),
        basal_melt_rate=jnp.asarray(np.where(r < sol.R_i, sol.melt, 0.0)),
        hydro_W=jnp.zeros(grid.shape2),
    )
    return sol, grid, cfg, state


def test_routing_steady_state_matches_exact():
    sol, grid, cfg, state = _setup()
    hydro = Routing(grid=grid, config=cfg)

    import jax

    @jax.jit
    def advance(state):
        return hydro.step(state, 7.0 * 24 * 3600.0)   # one week, 8 subcycles

    for _ in range(120):     # ~2.3 years: several fill-time constants
        state = advance(state)

    W = np.asarray(state.hydro_W)
    r = grid.radius
    We = sol.water_thickness(r)
    # compare inside the ice, away from the divide (q -> 0, W -> 0 there)
    sel = (r > 0.2 * sol.R_i) & (r < 0.9 * sol.R_i)
    rel = np.abs(W[sel] - We[sel]) / We[sel]
    assert np.median(rel) < 0.15
    assert np.mean(rel) < 0.25
    # and the divide region must stay nearly dry
    assert W[r < 0.05 * sol.R_i].max() < 2.0 * We[sel].max()


def test_routing_steady_mass_balance():
    """At steady state, input inside radius r equals outward flux through r
    (checked via the global budget: total W stops growing)."""
    sol, grid, cfg, state = _setup(Mx=41)
    hydro = Routing(grid=grid, config=cfg)
    import jax

    @jax.jit
    def advance(state):
        return hydro.step(state, 7.0 * 24 * 3600.0)

    for _ in range(100):
        state = advance(state)
    total1 = float(jnp.sum(state.hydro_W))
    for _ in range(20):
        state = advance(state)
    total2 = float(jnp.sum(state.hydro_W))
    assert abs(total2 - total1) / total1 < 0.02


def test_steady_hydrology_flow_accumulation():
    """hydrology.model=steady (reference hydrology::SteadyState role):
    instantaneous routing of the water input down the hydraulic potential.
    On a uniform slab over a tilted bed the discharge grows linearly
    downstream and the total outflow equals the total input."""
    import jax
    from pism_tpu.physics.hydrology import Steady

    grid = Grid(Mx=21, My=5, Lx=10e3, Ly=2.5e3)
    cfg = Config({"hydrology.model": "steady",
                  "hydrology.tillwat_decay_rate": 0.0})
    # bed drops toward +x; uniform 500 m slab on the left 15 columns
    x = np.linspace(0, 1, grid.Mx)
    bed = np.tile(100.0 * (1.0 - x), (grid.My, 1))
    H = np.where(np.arange(grid.Mx) < 15, 500.0, 0.0) * np.ones((grid.My, 1))
    melt = 1e-9  # m/s ice equivalent, uniform
    W_max = cfg.get_number("hydrology.tillwat_max")
    state = ModelState(
        geometry=new_geometry(jnp.asarray(H), jnp.asarray(bed)),
        tillwat=jnp.full(grid.shape2, W_max),      # saturated: all melt routes
        basal_melt_rate=jnp.full(grid.shape2, melt),
        hydro_Q=jnp.zeros(grid.shape2))
    hydro = Steady(grid=grid, config=cfg)
    state = jax.jit(lambda s: hydro.step(s, 86400.0))(state)
    q = np.asarray(state.hydro_Q)
    # all icy cells drain east, so q_sg = Q / dy (east-face length);
    # sink cells (incl. the receiving ice-free cell) report Q / dx
    Q_icy = q[:, :15] * grid.dy
    Q_out = q[:, 15] * grid.dx

    rho_i, rho_w = 910.0, 1000.0
    inp_cell = (rho_i / rho_w) * melt * grid.dx * grid.dy
    # interior row: discharge accumulates linearly downstream (+x)
    np.testing.assert_allclose(Q_icy[2], inp_cell * np.arange(1, 16),
                               rtol=1e-6)
    # mass balance: flux carried by the last icy column = all input upstream
    icy_cells = 15 * grid.My
    assert np.isclose(Q_icy[:, 14].sum(), inp_cell * icy_cells, rtol=1e-6)
    # the exiting flux lands in the first ice-free cell (where the
    # frontal-melt plume reads it) and propagates no further
    np.testing.assert_allclose(Q_out, inp_cell * 15, rtol=1e-6)
    assert np.all(q[:, 16:] == 0.0)
