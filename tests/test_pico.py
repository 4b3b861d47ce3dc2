"""PICO box-model tests on a synthetic shelf geometry."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.coupler.pico import Pico
from pism_tpu.state import new_geometry

SPY = 3.15569259747e7


@pytest.fixture
def shelf_setup():
    """Grounded ice (x < 30 km), floating shelf (30-70 km), open ocean."""
    grid = Grid(Mx=50, My=11, Lx=50e3, Ly=11e3, periodicity="y")
    x = grid.x
    H = np.zeros(grid.shape2)
    H[:, x < -20e3] = 1500.0                        # grounded (bed -800)
    shelf = (x >= -20e3) & (x < 20e3)
    # shelf thinning from 900 m at the GL to 300 m at the front
    H[:, shelf] = np.interp(x[shelf], [-20e3, 20e3], [900.0, 300.0])[None, :]
    bed = np.full(grid.shape2, -800.0)
    bed[:, x < -20e3] = -700.0
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))
    return grid, geom


def test_box_geometry(shelf_setup):
    grid, geom = shelf_setup
    cfg = Config()
    pico = Pico(temperature_ocean=jnp.full(grid.shape2, 273.15),
                salinity_ocean=jnp.full(grid.shape2, 34.7),
                config=cfg, grid=grid)
    pg = pico.boxes(geom)
    box = np.asarray(pg.box)
    mask = np.asarray(geom.cell_type)
    # boxes only on the shelf
    assert (box[mask != 3] == 0).all()
    assert (box[mask == 3] >= 1).all()
    # box 1 near the grounding line, higher boxes toward the front
    row = box[5]
    shelf_idx = np.where(mask[5] == 3)[0]
    assert row[shelf_idx[0]] == 1
    assert row[shelf_idx[-1]] == cfg.get_int("ocean.pico.number_of_boxes")
    assert np.all(np.diff(row[shelf_idx]) >= 0)


def test_melt_pattern_warm_water(shelf_setup):
    grid, geom = shelf_setup
    cfg = Config()
    pico = Pico(temperature_ocean=jnp.full(grid.shape2, 273.15),  # ~1.9 C above Tf
                salinity_ocean=jnp.full(grid.shape2, 34.7),
                config=cfg, grid=grid)
    out = pico.inputs(geom, 0.0)
    melt = np.asarray(out.shelf_base_melt) * SPY
    mask = np.asarray(geom.cell_type)
    box = np.asarray(pico.boxes(geom).box)
    m1 = melt[(mask == 3) & (box == 1)].mean()
    mN = melt[(mask == 3) & (box == box.max())].mean()
    assert m1 > 0.05            # warm water melts near the GL
    assert m1 < 100.0           # sane magnitude
    assert m1 > mN              # melt strongest in box 1
    assert (melt[mask != 3] == 0).all()


def test_per_basin_averaging(shelf_setup):
    """With a basin mask, ambient properties are averaged per basin: a
    basin fed by warm water melts faster than a cold one."""
    grid, geom = shelf_setup
    cfg = Config()
    basins = np.ones(grid.shape2, np.int32)
    basins[6:, :] = 2                       # split the domain into 2 basins
    T0 = np.full(grid.shape2, 271.35)       # cold everywhere...
    T0[6:, :] = 274.15                      # ...warm ambient in basin 2
    pico = Pico(temperature_ocean=jnp.asarray(T0),
                salinity_ocean=jnp.full(grid.shape2, 34.7),
                config=cfg, grid=grid, basin_mask=jnp.asarray(basins))
    out = pico.inputs(geom, 0.0)
    melt = np.asarray(out.shelf_base_melt) * SPY
    mask = np.asarray(geom.cell_type)
    m_cold = melt[(mask == 3) & (basins == 1)].mean()
    m_warm = melt[(mask == 3) & (basins == 2)].mean()
    assert m_warm > 2.0 * max(m_cold, 1e-6)


def test_cold_water_low_melt(shelf_setup):
    grid, geom = shelf_setup
    cfg = Config()
    pico = Pico(temperature_ocean=jnp.full(grid.shape2, 271.35),  # near freezing
                salinity_ocean=jnp.full(grid.shape2, 34.7),
                config=cfg, grid=grid)
    melt_cold = np.asarray(pico.inputs(geom, 0.0).shelf_base_melt) * SPY
    pico_warm = Pico(temperature_ocean=jnp.full(grid.shape2, 274.15),
                     salinity_ocean=jnp.full(grid.shape2, 34.7),
                     config=cfg, grid=grid)
    melt_warm = np.asarray(pico_warm.inputs(geom, 0.0).shelf_base_melt) * SPY
    mask = np.asarray(geom.cell_type)
    assert melt_warm[mask == 3].mean() > 3 * abs(melt_cold[mask == 3].mean())
