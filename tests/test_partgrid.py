"""Part-grid (Albrecht et al. 2011) sub-grid front advance.

Reference ``src/geometry/GeometryEvolution.cc``: flux into ice-free ocean
cells at the calving front fills the area-specific volume Href; a cell is
promoted to ice-covered at the mean neighbor thickness, and the promotion
excess is redistributed to neighboring part-grid cells
(``residual_redistribution``) — never silently absorbed or lost.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu import state as S
from pism_tpu.model import geometry_evolution as ge
from pism_tpu.ops.stencils import Shifter
from pism_tpu.state import new_geometry


def _shelf(grid, i_front, H0=400.0):
    H = np.zeros(grid.shape2)
    H[:, 2:i_front] = H0
    bed = np.full(grid.shape2, -2000.0)
    return new_geometry(jnp.asarray(H), jnp.asarray(bed))


def _advance(grid, geom, u, dt, nsteps, part_grid=True):
    sh = Shifter(grid)
    u_face = jnp.full(grid.shape2, u)
    v_face = jnp.zeros(grid.shape2)
    vol_flow = 0.0
    for _ in range(nsteps):
        qe, qn = ge.advective_flux(u_face, v_face,
                                   geom.ice_thickness, sh)
        res = ge.flow_step(geom, dt, qe, qn, grid, sh, part_grid=part_grid)
        geom = geom.replace(ice_thickness=res.thickness,
                            ice_area_specific_volume=res.Href)
        geom = S.ensure_consistency(geom, 910.0, 1028.0, 1.0, False)
        vol_flow += float(res.nonneg_flux) * dt
    return geom, vol_flow


def test_front_advance_rate_and_conservation():
    """A uniform shelf advected at constant u: total (H + Href) volume is
    conserved exactly and the front advances at u within one cell."""
    grid = Grid(Mx=64, My=5, Lx=64e3, Ly=5e3, periodicity="y",
                Mz=3, Lz=100.0)
    u = 300.0 / 3.15569259747e7          # 300 m/yr
    dt = 0.25 * grid.dx / u              # CFL 0.25
    i0 = 20
    geom = _shelf(grid, i0)
    vol0 = float(jnp.sum(geom.ice_thickness)) * grid.dx * grid.dy

    nsteps = 40
    geom, _ = _advance(grid, geom, u, dt, nsteps)
    H = np.asarray(geom.ice_thickness)
    href = np.asarray(geom.ice_area_specific_volume)
    vol1 = (H.sum() + href.sum()) * grid.dx * grid.dy
    # closed box, no sources: conservation to roundoff
    assert vol1 == pytest.approx(vol0, rel=1e-12)

    # front position: analytic advance = u * t / dx cells past the start
    # (cells past the front can hold roundoff-scale H from the
    # inflow-vs-divergence cancellation; 1 m threshold)
    adv_cells = u * nsteps * dt / grid.dx          # = 10 cells
    front = np.max(np.nonzero(H[2] > 1.0)[0])
    assert abs(front - ((i0 - 1) + adv_cells)) <= 1.5

    # part-grid keeps the front sharp: thickness at the front stays O(H0)
    assert H[2, front] > 100.0


def test_without_part_grid_front_diffuses():
    """Control: without part-grid the upwind front smears into thin ice."""
    grid = Grid(Mx=64, My=5, Lx=64e3, Ly=5e3, periodicity="y",
                Mz=3, Lz=100.0)
    u = 300.0 / 3.15569259747e7
    dt = 0.25 * grid.dx / u
    geom = _shelf(grid, 20)
    geom, _ = _advance(grid, geom, u, dt, 40, part_grid=False)
    H = np.asarray(geom.ice_thickness)
    front = np.max(np.nonzero(H[2] > 1e-6)[0])
    # leading cells are thin (diffused), unlike the part-grid front
    assert H[2, front] < 100.0


def test_residual_redistribution_conserves_and_propagates():
    """Force a promotion whose Href far exceeds the neighbor-mean threshold
    in one step: the excess must land in the next cell's Href (and total
    volume must be conserved), not vanish into the promoted cell."""
    grid = Grid(Mx=32, My=5, Lx=32e3, Ly=5e3, periodicity="y",
                Mz=3, Lz=100.0)
    sh = Shifter(grid)
    H0 = 400.0
    geom = _shelf(grid, 10, H0=H0)
    # preload the partial cell at i=10 with Href just below threshold, then
    # push a big flux through in one step
    href = np.zeros(grid.shape2)
    href[:, 10] = 0.95 * H0
    geom = geom.replace(ice_area_specific_volume=jnp.asarray(href))

    u = 2000.0 / 3.15569259747e7
    dt = 0.4 * grid.dx / u
    u_face = jnp.full(grid.shape2, u)
    qe, qn = ge.advective_flux(u_face, jnp.zeros(grid.shape2),
                               geom.ice_thickness, sh)
    vol0 = float(jnp.sum(geom.ice_thickness)
                 + jnp.sum(geom.ice_area_specific_volume)) * grid.dx * grid.dy
    res = ge.flow_step(geom, dt, qe, qn, grid, sh, part_grid=True)
    H = np.asarray(res.thickness)
    href1 = np.asarray(res.Href)
    vol1 = (H.sum() + href1.sum()) * grid.dx * grid.dy
    assert vol1 == pytest.approx(vol0, rel=1e-12)

    # the cell promoted AT the neighbor-mean threshold, not above it
    assert H[2, 10] == pytest.approx(H0, rel=1e-12)
    # the excess (0.95 H0 + u dt H0/dx - H0 > 0) moved into the next front
    # cell's Href
    expected_excess = 0.95 * H0 + u * dt * H0 / grid.dx - H0
    assert expected_excess > 0
    assert href1[2, 11] == pytest.approx(expected_excess, rel=1e-9)
