"""Isochrone layer-tracing tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Grid
from pism_tpu.model.isochrones import Isochrones

SPY = 3.15569259747e7


@pytest.fixture
def setup():
    grid = Grid(Mx=8, My=6, Lx=40e3, Ly=30e3)
    iso_model = Isochrones(grid=grid, n_layers=6)
    H0 = jnp.full(grid.shape2, 1000.0)
    iso = iso_model.initialize(H0, [100.0 * SPY, 200.0 * SPY, 300.0 * SPY])
    return grid, iso_model, H0, iso


def test_accumulation_fills_active_layer(setup):
    grid, m, H0, iso = setup
    zeroQ = jnp.zeros(grid.shape2)
    smb = jnp.full(grid.shape2, 0.5 / SPY)
    dt = 50.0 * SPY
    H1 = H0 + 0.5 * 50.0
    # t=0: layer 0 active
    iso = m.step(iso, 0.0, dt, zeroQ, zeroQ, H0, H1, smb, zeroQ)
    assert float(iso.layers[3, 3, 0]) == pytest.approx(1025.0)
    assert int(iso.top) == 0
    # t=150y: layer 1 should have activated (deposition time 100y)
    H2 = H1 + 25.0
    iso = m.step(iso, 150.0 * SPY, dt, zeroQ, zeroQ, H1, H2, smb, zeroQ)
    assert int(iso.top) == 1
    assert float(iso.layers[3, 3, 1]) == pytest.approx(25.0)
    # stack always sums to the ice thickness
    np.testing.assert_allclose(np.asarray(iso.layers.sum(-1)),
                               np.asarray(H2), rtol=1e-12)


def test_surface_melt_eats_top_layers(setup):
    grid, m, H0, iso = setup
    zeroQ = jnp.zeros(grid.shape2)
    smb_pos = jnp.full(grid.shape2, 1.0 / SPY)
    dt = 30.0 * SPY
    iso = m.step(iso, 150.0 * SPY, dt, zeroQ, zeroQ, H0, H0 + 30, smb_pos, zeroQ)
    assert int(iso.top) == 1 and float(iso.layers[2, 2, 1]) == pytest.approx(30.0)
    # now melt 40 m: consumes all 30 m of layer 1 and 10 m of layer 0
    smb_neg = jnp.full(grid.shape2, -40.0 / (30.0 * SPY))
    iso = m.step(iso, 180.0 * SPY, dt, zeroQ, zeroQ, H0 + 30, H0 - 10,
                 smb_neg, zeroQ)
    assert float(iso.layers[2, 2, 1]) == pytest.approx(0.0, abs=1e-9)
    assert float(iso.layers[2, 2, 0]) == pytest.approx(990.0)


def test_basal_melt_eats_bottom_layer(setup):
    grid, m, H0, iso = setup
    zeroQ = jnp.zeros(grid.shape2)
    bmb = jnp.full(grid.shape2, 20.0 / (10.0 * SPY))
    dt = 10.0 * SPY
    iso = m.step(iso, 0.0, dt, zeroQ, zeroQ, H0, H0 - 20, zeroQ, bmb)
    assert float(iso.layers[2, 2, 0]) == pytest.approx(980.0)


def test_depths_monotone(setup):
    grid, m, H0, iso = setup
    zeroQ = jnp.zeros(grid.shape2)
    smb = jnp.full(grid.shape2, 0.5 / SPY)
    t, H = 0.0, H0
    for step in range(6):
        H2 = H + 0.5 * 60.0
        iso = m.step(iso, t, 60.0 * SPY, zeroQ, zeroQ, H, H2, smb, zeroQ)
        t += 60.0 * SPY
        H = H2
    depths = np.asarray(m.isochrone_depths(iso, H))[2, 2]
    active = np.asarray(iso.layers[2, 2]) > 0
    d = depths[active]
    assert np.all(np.diff(d) <= 1e-9)  # younger layers shallower


def test_isochrone_depth_diagnostic(setup):
    """isochrone_depth (PISM 2.1 diagnostic): depth below the surface of
    each layer's upper boundary — zero for the top active layer, total
    thickness-above for deeper layers, monotone with layer index."""
    from types import SimpleNamespace
    from pism_tpu.model import diagnostics as diag
    from pism_tpu.state import ModelState, new_geometry

    grid, m, H0, iso = setup
    state = ModelState(geometry=new_geometry(H0, jnp.zeros(grid.shape2)),
                       iso_layers=iso.layers, iso_top=iso.top)
    model = SimpleNamespace(grid=grid)
    d = np.asarray(diag.SPATIAL["isochrone_depth"].func(state, model, 0.0))
    assert d.shape == grid.shape2 + (6,)
    layers = np.asarray(iso.layers)
    # depth of layer k's top boundary = sum of layers above it
    np.testing.assert_allclose(d[..., 0], layers[..., 1:].sum(-1), atol=1e-9)
    assert (np.diff(d, axis=-1) <= 1e-9).all()  # deeper layers: larger depth
    assert np.all(d[..., -1] == 0.0)
