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


def test_ssa_matvec_pallas_matches_xla(rng):
    """Fused SSA matvec (interpret mode) is bit-equivalent to
    ops.ssa.apply_operator with a clamped Shifter, including its custom
    JVP through the nonlinear residual composition."""
    import jax
    import jax.numpy as jnp
    from pism_tpu.ops import ssa as ssa_ops
    from pism_tpu.ops.pallas_kernels import ssa_matvec_pallas
    from pism_tpu.ops.stencils import shift

    class ClampSh:
        def __call__(self, a, jy, ix):
            return shift(a, jy, ix, False, False)

    My, Mx = 24, 40
    sh = ClampSh()
    u = jnp.asarray(rng.normal(size=(My, Mx)))
    v = jnp.asarray(rng.normal(size=(My, Mx)))
    nuHe = jnp.asarray(rng.uniform(1e13, 1e16, size=(My, Mx)))
    nuHn = jnp.asarray(rng.uniform(1e13, 1e16, size=(My, Mx)))
    beta = jnp.asarray(rng.uniform(0, 1e10, size=(My, Mx)))
    dx, dy = 20e3, 25e3

    Au0, Av0 = ssa_ops.apply_operator(u, v, ssa_ops.NuH(nuHe, nuHn), beta,
                                      dx, dy, sh)
    Au1, Av1 = ssa_matvec_pallas(u, v, nuHe, nuHn, beta, dx, dy, True)
    assert float(jnp.max(jnp.abs(Au1 - Au0))) < 1e-12 * float(jnp.max(jnp.abs(Au0)))
    assert float(jnp.max(jnp.abs(Av1 - Av0))) < 1e-12 * float(jnp.max(jnp.abs(Av0)))

    B = jnp.full((My, Mx), 1.9e8)
    H = jnp.full((My, Mx), 500.0)

    def resid(apply_fused):
        def f(uv):
            uu, vv = uv
            nuH = ssa_ops.compute_nuH(uu, vv, B, H, dx, dy, sh)
            if apply_fused:
                return ssa_matvec_pallas(uu, vv, nuH.e, nuH.n, beta,
                                         dx, dy, True)
            return ssa_ops.apply_operator(uu, vv, nuH, beta, dx, dy, sh)
        return f

    tu = jnp.asarray(rng.normal(size=(My, Mx)))
    tv = jnp.asarray(rng.normal(size=(My, Mx)))
    _, jx = jax.jvp(resid(False), ((u, v),), ((tu, tv),))
    _, jp = jax.jvp(resid(True), ((u, v),), ((tu, tv),))
    assert float(jnp.max(jnp.abs(jx[0] - jp[0]))) \
        < 1e-12 * float(jnp.max(jnp.abs(jx[0])))
    assert float(jnp.max(jnp.abs(jx[1] - jp[1]))) \
        < 1e-12 * float(jnp.max(jnp.abs(jx[1])))
