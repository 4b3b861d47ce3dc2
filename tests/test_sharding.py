"""Mesh-shape invariance: the analog of PISM's "same answer under
mpiexec -n 1..4" regression runs (SURVEY.md §4). A jitted SIA step over a
sharded state on a 2x4 CPU device mesh must match the single-device result;
the manual ppermute halo library must match the GSPMD path bit-for-bit."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.model.icemodel import IceModel
from pism_tpu.coupler.surface import Uniform
from pism_tpu.parallel.mesh import make_mesh, shard_state, sharding2d
from pism_tpu.parallel import halo
from pism_tpu.ops import stencils as st
from pism_tpu.verification import halfar

SPY = 3.15569259747e7


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_state():
    """Drop compiled executables accumulated by the ~270 tests that run
    before this module in a full-tier pass.  The XLA CPU compiler has been
    observed to segfault (in backend_compile_and_load, on a trivial
    elementwise op) when these sharded tests compile late in a long
    single-process session; the same tests pass deterministically in a
    fresh process.  Clearing JAX's caches frees the accumulated JIT state
    before the mesh compilations start."""
    jax.clear_caches()
    yield


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return d


def _setup(Mx=64):
    sol = halfar.test_B()
    grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
    cfg = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "energy.model": "none",
    })
    H0 = sol.thickness(sol.t0, grid.radius)
    state = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))
    return sol, grid, state, model


def test_sharded_run_matches_single_device(devices):
    sol, grid, state, model = _setup()

    s1, t1, _ = model.step_once(state, sol.t0, 20 * SPY)

    mesh = make_mesh(devices, shape=(2, 4))
    state_sh = shard_state(state, mesh)
    s8, t8, _ = model.step_once(state_sh, sol.t0, 20 * SPY)

    a = np.asarray(s1.geometry.ice_thickness)
    b = np.asarray(s8.geometry.ice_thickness)
    assert t1 == t8
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-9)


def test_halo_pad_matches_shift(devices, rng):
    """Manual ppermute halo exchange reproduces clamped/periodic shifts."""
    mesh = make_mesh(devices, shape=(2, 4))
    a = jnp.asarray(rng.normal(size=(16, 32)))

    for periodic in [(False, False), (True, True)]:
        def local_id(p):
            return halo.crop(p, 1)

        fn = halo.stencil_shard_map(local_id, mesh, width=1, periodic=periodic)
        np.testing.assert_allclose(np.asarray(fn(a)), np.asarray(a), atol=0)

        # a 4-neighbor stencil through the halo path vs the global path
        def lap_local(p):
            return (p[2:, 1:-1] + p[:-2, 1:-1] + p[1:-1, 2:] + p[1:-1, :-2]
                    - 4.0 * p[1:-1, 1:-1])

        fn = halo.stencil_shard_map(lap_local, mesh, width=1, periodic=periodic)
        got = np.asarray(fn(a))

        py, px = periodic
        ref = (st.shift(a, 1, 0, py, px) + st.shift(a, -1, 0, py, px)
               + st.shift(a, 0, 1, py, px) + st.shift(a, 0, -1, py, px) - 4.0 * a)
        np.testing.assert_allclose(got, np.asarray(ref), atol=1e-12)


def test_mesh_factorization():
    from pism_tpu.parallel.mesh import best_factorization
    assert best_factorization(8) == (2, 4)
    assert best_factorization(16) == (4, 4)
    assert best_factorization(7) == (1, 7)


@pytest.mark.slow
def test_full_hybrid_chain_mesh_invariance(devices):
    """The FULL production chain (SSA+SIA, enthalpy, stateful PDD,
    calving, iceberg removal) gives the same answer on one device and on
    a 2x4 mesh — the reference's mpiexec -n 1 vs -n 4 regression on the
    real model, not just the SIA core. The sharded SSA's psum-ordered
    reductions differ in rounding, so the comparison is tight-but-not-
    bitwise on the float64 state."""
    from pism_tpu.coupler import atmosphere as atm
    from pism_tpu.coupler.pdd import TemperatureIndex

    Mx, My = 40, 48
    Lx, Ly = 400e3, 480e3
    grid = Grid(Mx=Mx, My=My, Lx=Lx, Ly=Ly, Mz=11, Lz=4000.0)
    cfg = Config({
        "stress_balance.model": "ssa+sia",
        "energy.model": "enthalpy",
        "basal_resistance.pseudo_plastic.enabled": True,
        "basal_yield_stress.model": "mohr_coulomb",
        "calving.methods": "thickness_calving",
        "geometry.remove_icebergs": True,
        "geometry.part_grid.enabled": True,
    })
    X, Y = np.meshgrid(grid.x, grid.y)
    r2 = (X / (0.7 * Lx)) ** 2 + (Y / (0.7 * Ly)) ** 2
    bed = 300.0 - 800.0 * r2
    H = 2000.0 * np.maximum(1.0 - r2, 0.0) ** 1.5 * (bed > -500)
    lat = 65.0 + (Y + Ly) / (2 * Ly) * 15.0
    a = atm.SeariseGreenland(
        latitude=jnp.asarray(lat), longitude=jnp.full(grid.shape2, -40.0),
        precipitation=jnp.full(grid.shape2, 0.4 / SPY))
    surface = TemperatureIndex(atmosphere=a, config=cfg)
    model = IceModel(grid=grid, config=cfg, surface=surface)
    state = model.prepare_state(ModelState(geometry=new_geometry(
        jnp.asarray(H), jnp.asarray(bed))))

    cap = 0.05 * SPY     # below the adaptive dt: exactly one step each
    s1, t1, st1 = model.step_once(state, 0.0, cap)

    mesh = make_mesh(devices, shape=(2, 4))
    s8, t8, st8 = model.step_once(shard_state(state, mesh), 0.0, cap)

    assert t1 == t8 and int(st1.nsteps) == int(st8.nsteps) == 1
    for name, a1, a8, tol in (
            ("thk", s1.geometry.ice_thickness, s8.geometry.ice_thickness,
             1e-5),
            ("enthalpy", s1.enthalpy, s8.enthalpy, 1e-5),
            ("u_ssa", s1.u_ssa, s8.u_ssa, 5e-3),
            ("snow", s1.snow_depth, s8.snow_depth, 1e-6)):
        a1, a8 = np.asarray(a1), np.asarray(a8)
        scale = max(np.abs(a1).max(), 1e-30)
        assert np.max(np.abs(a1 - a8)) / scale < tol, name


def test_regional_mode_mesh_invariance(devices):
    """Regional (no_model_mask) runs shard like everything else: the
    strip's stored-frame driving stress and strip-face SIA gradients are
    plain stencils, so a 2x4 mesh must reproduce the single-device step
    (the reference's regional runs under mpiexec -n N contract)."""
    from pism_tpu.physics.basal import GivenYieldStress

    Mx, My = 40, 48
    grid = Grid(Mx=Mx, My=My, Lx=200e3, Ly=240e3)
    X, Y = np.meshgrid(grid.x, grid.y)
    r = np.hypot(X, Y)
    H = 600.0 + 1400.0 * np.exp(-(r / 60e3) ** 2)
    tauc = np.where(r < 80e3, 4.0e4, 1.0e8)
    nmm = np.zeros(grid.shape2, bool)
    nmm[:3, :] = nmm[-3:, :] = nmm[:, :3] = nmm[:, -3:] = True
    cfg = Config({
        "stress_balance.model": "ssa+sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "stress_balance.ssa.flow_law": "isothermal_glen",
        "energy.model": "none",
        "basal_yield_stress.model": "given",
        "regional.enabled": True,
        # invariance is asserted on fully-converged solves: the production
        # velocity-change stop (1e-4) legitimately fires after different
        # sweep counts across mesh shapes (psum-order noise near the
        # threshold), leaving velocity differences up to the stop
        # tolerance — the reference's rank-count contract is likewise
        # tolerance-based (nccmp diffs), not bit-exact, for its
        # iteratively-solved fields
        "stress_balance.ssa.fd.velocity_change_rtol": 0.0,
    })
    model = IceModel(grid=grid, config=cfg,
                     surface=Uniform(smb=0.0),
                     yield_stress=GivenYieldStress(cfg, tau_c=jnp.asarray(tauc)),
                     no_model_mask=jnp.asarray(nmm))
    state = model.prepare_state(ModelState(geometry=new_geometry(
        jnp.asarray(H), jnp.zeros(grid.shape2))))

    cap = 0.2 * SPY
    s1, t1, _ = model.step_once(state, 0.0, cap)
    mesh = make_mesh(devices, shape=(2, 4))
    s8, t8, _ = model.step_once(shard_state(state, mesh), 0.0, cap)

    assert t1 == t8
    a1 = np.asarray(s1.geometry.ice_thickness)
    a8 = np.asarray(s8.geometry.ice_thickness)
    assert np.max(np.abs(a1 - a8)) / max(np.abs(a1).max(), 1e-30) < 1e-6
    # the frozen strip is bit-identical (no dynamics there at all)
    np.testing.assert_array_equal(a1[nmm], a8[nmm])


# ---------------------------------------------------------------------------
# Sharded Pallas kernels (ops.pallas_sharded): bit-compare the shard_map +
# ppermute-halo route (interpret mode on the CPU mesh) against the XLA
# stencil path — the SURVEY §2.5 solver-comm target.
# ---------------------------------------------------------------------------

def _dome(Mx, My, Lx, Ly, rng):
    X, Y = np.meshgrid(np.linspace(-Lx, Lx, Mx), np.linspace(-Ly, Ly, My))
    r2 = (X / (0.8 * Lx)) ** 2 + (Y / (0.8 * Ly)) ** 2
    H = 2500.0 * np.maximum(1.0 - r2, 0.0) ** 1.2
    bed = 200.0 * np.sin(X / 50e3) * np.cos(Y / 70e3)
    return H.astype(np.float32), bed.astype(np.float32)


def test_sia_pallas_sharded_matches_xla(devices, rng):
    """Sharded fused thermo SIA kernel == unsharded XLA path, on an
    uneven (non-mesh-divisible) grid so the pad-and-crop path runs."""
    from pism_tpu.ops import sia as sia_ops
    from pism_tpu.ops.stencils import Shifter
    from pism_tpu.physics.rheology import flow_law_from_config
    from pism_tpu.physics.enthalpy_converter import EnthalpyConverter

    Mx, My, Mz = 37, 45, 9
    grid = Grid(Mx=Mx, My=My, Lx=300e3, Ly=360e3, Mz=Mz, Lz=4000.0)
    cfg = Config({"runtime.float_dtype": "float32"})
    EC = EnthalpyConverter.from_config(cfg)
    law = flow_law_from_config(cfg, "sia", EC)
    H, bed = _dome(Mx, My, grid.Lx, grid.Ly, rng)
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))
    geom = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "dtype")
        and a.dtype == jnp.float64 else a, geom)
    E = jnp.asarray(
        rng.uniform(9.0e4, 1.05e5, size=(My, Mx, Mz)).astype(np.float32))
    sh = Shifter(grid)

    ref = sia_ops.diffusivity(law, geom, E, grid, sh, pallas=False)

    mesh = make_mesh(devices, shape=(2, 4))
    got = sia_ops.diffusivity(law, geom, E, grid, sh, pallas=True, mesh=mesh)

    for name in ("De", "Dn", "qe", "qn"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-5 * scale,
                                   err_msg=name)
    assert np.isfinite(float(got.max_D))


def test_sia_pallas_sharded_isothermal_matches_xla(devices, rng):
    from pism_tpu.ops import sia as sia_ops
    from pism_tpu.ops.stencils import Shifter
    from pism_tpu.physics.rheology import flow_law_from_config
    from pism_tpu.physics.enthalpy_converter import EnthalpyConverter

    Mx, My = 53, 41
    grid = Grid(Mx=Mx, My=My, Lx=300e3, Ly=250e3)
    cfg = Config({"runtime.float_dtype": "float32",
                  "stress_balance.sia.flow_law": "isothermal_glen"})
    EC = EnthalpyConverter.from_config(cfg)
    law = flow_law_from_config(cfg, "sia", EC)
    H, bed = _dome(Mx, My, grid.Lx, grid.Ly, rng)
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))
    geom = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "dtype")
        and a.dtype == jnp.float64 else a, geom)
    sh = Shifter(grid)

    ref = sia_ops.diffusivity(law, geom, None, grid, sh, pallas=False)
    mesh = make_mesh(devices, shape=(2, 4))
    got = sia_ops.diffusivity(law, geom, None, grid, sh, pallas=True,
                              mesh=mesh)
    for name in ("De", "Dn", "qe", "qn"):
        a, b = np.asarray(getattr(ref, name)), np.asarray(getattr(got, name))
        scale = max(np.abs(a).max(), 1e-30)
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-5 * scale,
                                   err_msg=name)


def test_ssa_matvec_sharded_matches_xla(devices, rng):
    """Sharded fused SSA matvec == XLA apply_operator, including the
    physical-boundary clamp-shift semantics, on an uneven grid."""
    from pism_tpu.ops import ssa as ssa_ops
    from pism_tpu.ops.pallas_sharded import ssa_matvec_sharded
    from pism_tpu.ops.stencils import Shifter

    Mx, My = 37, 29
    grid = Grid(Mx=Mx, My=My, Lx=200e3, Ly=160e3)
    sh = Shifter(grid)
    f32 = np.float32
    u = rng.normal(size=(My, Mx)).astype(f32) * 1e-5
    v = rng.normal(size=(My, Mx)).astype(f32) * 1e-5
    nuH_e = rng.uniform(1e13, 1e15, size=(My, Mx)).astype(f32)
    nuH_n = rng.uniform(1e13, 1e15, size=(My, Mx)).astype(f32)
    beta = rng.uniform(1e8, 1e10, size=(My, Mx)).astype(f32)

    ref = ssa_ops.apply_operator(jnp.asarray(u), jnp.asarray(v),
                                 ssa_ops.NuH(jnp.asarray(nuH_e),
                                             jnp.asarray(nuH_n)),
                                 jnp.asarray(beta), grid.dx, grid.dy, sh)

    mesh = make_mesh(devices, shape=(2, 4))
    got = ssa_matvec_sharded(jnp.asarray(u), jnp.asarray(v),
                             jnp.asarray(nuH_e), jnp.asarray(nuH_n),
                             jnp.asarray(beta), mesh, grid.dx, grid.dy, True)
    for a, b, name in ((ref[0], got[0], "Au"), (ref[1], got[1], "Av")):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-5 * scale,
                                   err_msg=name)

    # JVP (the Newton linearization path) agrees too
    du = rng.normal(size=(My, Mx)).astype(f32) * 1e-6
    dv = rng.normal(size=(My, Mx)).astype(f32) * 1e-6

    def f_ref(uu, vv):
        return ssa_ops.apply_operator(
            uu, vv, ssa_ops.NuH(jnp.asarray(nuH_e), jnp.asarray(nuH_n)),
            jnp.asarray(beta), grid.dx, grid.dy, sh)

    def f_got(uu, vv):
        return ssa_matvec_sharded(uu, vv, jnp.asarray(nuH_e),
                                  jnp.asarray(nuH_n), jnp.asarray(beta),
                                  mesh, grid.dx, grid.dy, True)

    _, t_ref = jax.jvp(f_ref, (jnp.asarray(u), jnp.asarray(v)),
                       (jnp.asarray(du), jnp.asarray(dv)))
    _, t_got = jax.jvp(f_got, (jnp.asarray(u), jnp.asarray(v)),
                       (jnp.asarray(du), jnp.asarray(dv)))
    for a, b in zip(t_ref, t_got):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, rtol=0,
                                   atol=1e-5 * max(np.abs(a).max(), 1e-30))


@pytest.mark.slow
def test_hybrid_sharded_pallas_step_matches_xla(devices):
    """One adaptive segment of the FULL hybrid chain with the sharded
    Pallas kernels forced on (pallas_matvec=on + mesh) matches the plain
    GSPMD/XLA sharded run."""
    from pism_tpu.coupler.surface import Uniform as SurfUniform

    Mx, My = 40, 48
    grid = Grid(Mx=Mx, My=My, Lx=400e3, Ly=480e3, Mz=9, Lz=4000.0)

    def build(pallas_on, mesh=None):
        cfg = Config({
            "stress_balance.model": "ssa+sia",
            "energy.model": "enthalpy",
            "basal_resistance.pseudo_plastic.enabled": True,
            "basal_yield_stress.model": "mohr_coulomb",
            "runtime.float_dtype": "float32",
            "stress_balance.ssa.fd.pallas_matvec":
                "on" if pallas_on else "off",
        })
        return IceModel(grid=grid, config=cfg, surface=SurfUniform(smb=0.0),
                        mesh=mesh)

    X, Y = np.meshgrid(grid.x, grid.y)
    r2 = (X / (0.7 * grid.Lx)) ** 2 + (Y / (0.7 * grid.Ly)) ** 2
    bed = (300.0 - 800.0 * r2).astype(np.float32)
    H = (2000.0 * np.maximum(1.0 - r2, 0.0) ** 1.5 * (bed > -500)
         ).astype(np.float32)

    mesh = make_mesh(devices, shape=(2, 4))
    state0 = ModelState(geometry=new_geometry(jnp.asarray(H),
                                              jnp.asarray(bed)))

    m_ref = build(False)
    st_ref = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if hasattr(a, "dtype")
        and a.dtype == jnp.float64 else a, m_ref.prepare_state(state0))
    s1, t1, _ = m_ref.step_once(st_ref, 0.0, 0.5 * SPY)

    m_pal = build(True, mesh=mesh)
    # force the sharded SIA kernel on (CPU -> interpret inside shard_map)
    s8, t8, _ = m_pal.step_once(shard_state(st_ref, mesh), 0.0, 0.5 * SPY)

    assert t1 == t8
    a1 = np.asarray(s1.geometry.ice_thickness)
    a8 = np.asarray(s8.geometry.ice_thickness)
    assert np.max(np.abs(a1 - a8)) / max(np.abs(a1).max(), 1e-30) < 1e-4
