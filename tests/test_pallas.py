"""Pallas kernel equivalence tests (interpreter mode on CPU; the same
kernel compiles via Mosaic on TPU). PISM-analog: none — this is the
TPU-native optimization path, validated bit-for-bit against the XLA
reference implementation (SURVEY.md §7 phase 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Grid
from pism_tpu.ops import sia as sia_ops
from pism_tpu.ops.pallas_kernels import sia_flux_pallas
from pism_tpu.ops.stencils import Shifter
from pism_tpu.physics.rheology import IsothermalGlen
from pism_tpu.state import new_geometry
from pism_tpu.verification import halfar


def test_pallas_sia_matches_xla():
    sol = halfar.test_B()
    grid = Grid(Mx=61, My=61, Lx=900e3, Ly=900e3)
    sh = Shifter(grid)
    H = jnp.asarray(sol.thickness(sol.t0, grid.radius))
    geom = new_geometry(H, jnp.zeros(grid.shape2))
    law = IsothermalGlen(A=halfar.A_SOFTNESS)

    ref = sia_ops.diffusivity(law, geom, None, grid, sh,
                              gradient_method="mahaffy")
    De, Dn, qe, qn, max_D = sia_flux_pallas(
        geom.ice_thickness, geom.ice_surface_elevation,
        A=halfar.A_SOFTNESS, dx=grid.dx, dy=grid.dy)

    np.testing.assert_allclose(np.asarray(De), np.asarray(ref.De), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(Dn), np.asarray(ref.Dn), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(qe), np.asarray(ref.qe), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(qn), np.asarray(ref.qn), rtol=1e-12)
    assert float(max_D) == pytest.approx(float(ref.max_D), rel=1e-12)


def test_pallas_sia_thermo_matches_xla():
    """y-block-tiled thermomechanical (GPBLD z-integral) kernel vs XLA."""
    from pism_tpu import Config
    from pism_tpu.model.energy import bootstrap_enthalpy
    from pism_tpu.ops.pallas_kernels import sia_flux_thermo_pallas
    from pism_tpu.physics.enthalpy_converter import EnthalpyConverter
    from pism_tpu.physics.rheology import GPBLD

    grid = Grid(Mx=50, My=50, Lx=750e3, Ly=750e3, Mz=9, Lz=5000.0)
    sh = Shifter(grid)
    EC = EnthalpyConverter.from_config(Config())
    law = GPBLD(EC=EC)
    H = jnp.asarray(np.maximum(3000.0 * (1 - (np.asarray(grid.radius)
                                              / 700e3) ** 2), 0.0),
                    jnp.float32)
    geom = new_geometry(H, jnp.zeros(grid.shape2, jnp.float32))
    E = bootstrap_enthalpy(grid, EC, H,
                           jnp.full(grid.shape2, 248.15)).astype(jnp.float32)

    ref = sia_ops.diffusivity(law, geom, E, grid, sh,
                              gradient_method="mahaffy")
    De, Dn, qe, qn, max_D = sia_flux_thermo_pallas(
        geom.ice_thickness, geom.ice_surface_elevation, E, grid=grid,
        dx=grid.dx, dy=grid.dy, EC=EC, pb_law=law, block_y=16)
    np.testing.assert_allclose(np.asarray(qe), np.asarray(ref.qe),
                               rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(np.asarray(qn), np.asarray(ref.qn),
                               rtol=1e-4, atol=1e-10)
    np.testing.assert_allclose(np.asarray(De), np.asarray(ref.De),
                               rtol=1e-4, atol=1e-16)

    # the auto-router must decline on CPU (Mosaic path is TPU-only)
    assert not sia_ops._pallas_eligible(law, E, grid, H, "mahaffy",
                                        None, None)


def test_pallas_sia_f32():
    sol = halfar.test_B()
    grid = Grid(Mx=32, My=32, Lx=900e3, Ly=900e3)
    sh = Shifter(grid)
    H32 = jnp.asarray(sol.thickness(sol.t0, grid.radius), jnp.float32)
    geom = new_geometry(H32, jnp.zeros(grid.shape2, jnp.float32))
    law = IsothermalGlen(A=halfar.A_SOFTNESS)
    ref = sia_ops.diffusivity(law, geom, None, grid, sh)
    De, Dn, qe, qn, _ = sia_flux_pallas(
        geom.ice_thickness, geom.ice_surface_elevation,
        A=halfar.A_SOFTNESS, dx=grid.dx, dy=grid.dy)
    assert De.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(qe), np.asarray(ref.qe),
                               rtol=2e-5, atol=1e-12)
