"""I/O tests: NetCDF-4(HDF5) structure, checkpoint round-trips, and
restart-through-file exactness (PISM's most valuable regression pattern;
SURVEY.md §4)."""

import numpy as np
import jax.numpy as jnp
import h5py
import pytest

from pism_tpu import Config, Grid
from pism_tpu.io.nc4 import File
from pism_tpu.io import checkpoint as ckpt
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.model.icemodel import IceModel
from pism_tpu.coupler.surface import Uniform
from pism_tpu.verification import halfar

SPY = 3.15569259747e7


def test_nc4_structure(tmp_path, rng):
    path = str(tmp_path / "out.nc")
    with File(path, "w") as f:
        f.define_dimension("time", None, attrs={"units": "seconds"})
        f.define_dimension("y", 4, np.arange(4.0), attrs={"units": "m"})
        f.define_dimension("x", 5, np.arange(5.0), attrs={"units": "m"})
        n = f.append_time(12.5)
        data = rng.normal(size=(4, 5))
        f.write("thk", data[None], ("time", "y", "x"), {"units": "m"}, time_index=n)
    # NetCDF-4 files are HDF5 with dimension scales
    with h5py.File(path, "r") as h5:
        assert "_NCProperties" in h5.attrs
        assert h5["y"].attrs["CLASS"] == b"DIMENSION_SCALE"
        assert h5["thk"].shape == (1, 4, 5)
        assert h5["thk"].attrs["units"] == "m"
    with File(path, "r") as f:
        np.testing.assert_array_equal(f.read("thk")[0], data)
        assert f.read("time")[-1] == 12.5


def test_checkpoint_roundtrip(tmp_path):
    grid = Grid(Mx=11, My=9, Lx=100e3, Ly=80e3, Mz=5, Lz=3000.0)
    cfg = Config({"grid.Mx": 11})
    H = jnp.asarray(np.linspace(0, 500, 9 * 11).reshape(9, 11))
    state = ModelState(
        geometry=new_geometry(H, jnp.zeros(grid.shape2) - 100.0),
        enthalpy=jnp.ones(grid.shape3) * 1e5,
        tillwat=jnp.full(grid.shape2, 0.5),
        u_ssa=jnp.full(grid.shape2, 1e-6),
        v_ssa=jnp.full(grid.shape2, -1e-6),
    )
    path = str(tmp_path / "state.nc")
    ckpt.save_state(path, state, grid, t=123.0 * SPY, config=cfg)

    grid2 = ckpt.load_grid(path)
    assert grid2 == grid
    cfg2 = ckpt.load_config(path)
    assert cfg2.get_int("grid.Mx") == 11
    state2, t2 = ckpt.load_state(path)
    assert t2 == 123.0 * SPY
    np.testing.assert_array_equal(np.asarray(state2.geometry.ice_thickness),
                                  np.asarray(state.geometry.ice_thickness))
    np.testing.assert_array_equal(np.asarray(state2.enthalpy),
                                  np.asarray(state.enthalpy))
    np.testing.assert_array_equal(np.asarray(state2.u_ssa), np.asarray(state.u_ssa))
    assert state2.age is None  # absent fields stay absent


def test_restart_through_file_bit_stable(tmp_path):
    """Run A: 2 segments on device. Run B: checkpoint to NetCDF between
    segments and restore. Final thickness must be bit-identical."""
    sol = halfar.test_B()
    grid = Grid(Mx=31, My=31, Lx=900e3, Ly=900e3)
    cfg = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "energy.model": "none",
    })
    H0 = sol.thickness(sol.t0, grid.radius)
    state0 = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))

    tA_end = sol.t0 + 100 * SPY
    sA, tA, _ = model.step_once(state0, sol.t0, 50 * SPY)
    sA, tA, _ = model.step_once(sA, tA, tA_end - tA)

    sB, tB, _ = model.step_once(state0, sol.t0, 50 * SPY)
    path = str(tmp_path / "restart.nc")
    ckpt.save_state(path, sB, grid, tB, config=cfg)
    sB2, tB2 = ckpt.load_state(path, config=cfg)
    assert tB2 == tB
    sB3, tB3, _ = model.step_once(sB2, tB2, tA_end - tB2)

    np.testing.assert_array_equal(
        np.asarray(sA.geometry.ice_thickness),
        np.asarray(sB3.geometry.ice_thickness))


def test_restart_bit_stable_full_chain_with_pdd(tmp_path):
    """Restart exactness through a hybrid chain with the *stateful* PDD:
    snow/firn depths, enthalpy, velocities and hydrology all round-trip
    through NetCDF and the continued run is bit-identical."""
    from pism_tpu.coupler import atmosphere as atm
    from pism_tpu.coupler.pdd import TemperatureIndex

    grid = Grid(Mx=20, My=24, Lx=200e3, Ly=240e3, Mz=15, Lz=3000.0)
    cfg = Config({
        "stress_balance.model": "ssa+sia",
        "energy.model": "enthalpy",
        "basal_resistance.pseudo_plastic.enabled": True,
        "basal_yield_stress.model": "mohr_coulomb",
        "hydrology.model": "null",
        "geometry.part_grid.enabled": True,
    })
    X, Y = np.meshgrid(np.asarray(grid.x), np.asarray(grid.y))
    r2 = (X / 150e3) ** 2 + (Y / 190e3) ** 2
    bed = 200.0 - 700.0 * r2
    H = 1500.0 * np.maximum(1.0 - r2, 0.0)
    a = atm.Uniform(temperature=258.15, temperature_july=273.65,
                    precipitation=0.4 / SPY)
    surface = TemperatureIndex(atmosphere=a, config=cfg)
    model = IceModel(grid=grid, config=cfg, surface=surface)
    state0 = model.prepare_state(ModelState(geometry=new_geometry(
        jnp.asarray(H), jnp.asarray(bed))))

    t_end = 6 * SPY
    sA, tA, _ = model.step_once(state0, 0.0, 3 * SPY)
    sA, tA, _ = model.step_once(sA, tA, t_end - tA)

    sB, tB, _ = model.step_once(state0, 0.0, 3 * SPY)
    assert sB.snow_depth is not None and float(sB.snow_depth.max()) > 0
    path = str(tmp_path / "restart_pdd.nc")
    ckpt.save_state(path, sB, grid, tB, config=cfg)
    sB2, tB2 = ckpt.load_state(path, config=cfg)
    np.testing.assert_array_equal(np.asarray(sB.snow_depth),
                                  np.asarray(sB2.snow_depth))
    np.testing.assert_array_equal(np.asarray(sB.firn_depth),
                                  np.asarray(sB2.firn_depth))
    sB3, _, _ = model.step_once(sB2, tB2, t_end - tB2)

    for fld in ("geometry.ice_thickness", "enthalpy", "u_ssa",
                "snow_depth", "tillwat"):
        obj_a, obj_b = sA, sB3
        for part in fld.split("."):
            obj_a = getattr(obj_a, part)
            obj_b = getattr(obj_b, part)
        np.testing.assert_array_equal(np.asarray(obj_a), np.asarray(obj_b),
                                      err_msg=fld)


def test_classic_netcdf_bootstrap(tmp_path):
    """PISM input files commonly ship as classic NetCDF (CDF-1/2); reading
    them must work through the same File interface (scipy backend) and
    feed the bootstrap regridder."""
    from scipy.io import netcdf_file

    import numpy as np
    from pism_tpu import Config, Grid
    from pism_tpu.io.nc4 import File
    from pism_tpu.io.bootstrap import bootstrap

    path = str(tmp_path / "boot_classic.nc")
    ny, nx = 21, 25
    x = np.linspace(-400e3, 400e3, nx)
    y = np.linspace(-300e3, 300e3, ny)
    X, Y = np.meshgrid(x, y)
    thk = np.maximum(1500.0 * (1 - (X / 350e3) ** 2 - (Y / 250e3) ** 2), 0.0)
    topg = 100.0 - 0.0002 * np.abs(X)

    with netcdf_file(path, "w") as f:
        f.createDimension("x", nx)
        f.createDimension("y", ny)
        vx = f.createVariable("x", "d", ("x",)); vx[:] = x
        vx.units = b"m"
        vy = f.createVariable("y", "d", ("y",)); vy[:] = y
        vt = f.createVariable("thk", "d", ("y", "x")); vt[:] = thk
        vt.units = b"m"
        vb = f.createVariable("topg", "d", ("y", "x")); vb[:] = topg
        vb.units = b"m"
        f.history = b"made by test"

    with File(path, "r") as f:
        assert f.has_variable("thk")
        assert "thk" in f.variables() and "x" not in f.variables()
        assert f.read("thk").shape == (ny, nx)
        assert f.read_attrs("thk")["units"] == "m"
        assert f.dimension_length("x") == nx
        assert f.get_global_attr("history") == "made by test"

    grid = Grid(Mx=31, My=23, Lx=400e3, Ly=300e3, Mz=11, Lz=4000.0)
    state = bootstrap(path, grid, Config())
    H = np.asarray(state.geometry.ice_thickness)
    assert H.shape == grid.shape2 and np.isfinite(H).all()
    assert abs(H.max() - thk.max()) < 40.0   # regrid preserves the dome


def test_nccmp_tool(tmp_path):
    """nccmp-role comparison utility (reference test/nccmp.py): identical
    files match, perturbed files report the offending variable, missing
    variables are flagged."""
    import numpy as np
    import jax.numpy as jnp
    from pism_tpu import Config, Grid
    from pism_tpu.io import checkpoint as ckpt
    from pism_tpu.io.nc4 import File
    from pism_tpu.state import ModelState, new_geometry
    from pism_tpu.util import nccmp

    grid = Grid(Mx=11, My=11, Lx=100e3, Ly=100e3)
    cfg = Config({})
    H = jnp.asarray(np.random.default_rng(7).uniform(0, 100, grid.shape2))
    state = ModelState(geometry=new_geometry(H, jnp.zeros(grid.shape2)))
    a, b = str(tmp_path / "a.nc"), str(tmp_path / "b.nc")
    ckpt.save_state(a, state, grid, 0.0, config=cfg)
    ckpt.save_state(b, state, grid, 0.0, config=cfg)
    assert nccmp.compare(a, b) == []

    with File(b, "a") as f:
        thk = f.read("thk")
        thk[0, 5, 5] += 1e-3
        f.write("thk", thk)
    bad = nccmp.compare(a, b)
    assert [m.name for m in bad] == ["thk"]
    assert nccmp.compare(a, b, atol=1e-2) == []
    assert nccmp.compare(a, b, variables=["topg", "nonexistent"])[0].kind \
        == "missing"
    assert nccmp.main([a, b, "-t", "1e-2"]) == 0
    assert nccmp.main([a, b]) == 1


def test_classic_netcdf3_write_roundtrip(tmp_path):
    """-o_format netcdf3: the checkpoint written as classic CDF-2 restores
    bit-exactly through the magic-sniffed scipy reader."""
    import os

    grid = Grid(Mx=9, My=9, Lx=100e3, Ly=100e3, Mz=5, Lz=2000.0)
    cfg = Config()
    H = jnp.asarray(np.linspace(0, 800, 81).reshape(9, 9))
    state = ModelState(
        geometry=new_geometry(H, jnp.zeros(grid.shape2)),
        enthalpy=jnp.asarray(np.random.default_rng(7).normal(
            9e4, 1e3, (9, 9, 5))),
        tillwat=jnp.full(grid.shape2, 0.3))
    path = str(tmp_path / "classic.nc")
    ckpt.save_state(path, state, grid, 123.0 * 3.15569259747e7, config=cfg,
                    format="netcdf3")
    with open(path, "rb") as fh:
        assert fh.read(3) == b"CDF"     # really classic, not HDF5
    s2, t2 = ckpt.load_state(path, config=cfg)
    assert t2 == 123.0 * 3.15569259747e7
    np.testing.assert_array_equal(np.asarray(state.geometry.ice_thickness),
                                  np.asarray(s2.geometry.ice_thickness))
    np.testing.assert_array_equal(np.asarray(state.enthalpy),
                                  np.asarray(s2.enthalpy))
    np.testing.assert_array_equal(np.asarray(state.tillwat),
                                  np.asarray(s2.tillwat))


def test_failure_dump(tmp_path, monkeypatch):
    """A non-finite state at a segment boundary dumps SSAFD_failed.nc and
    aborts (reference SSAFD failure-strategy endpoint)."""
    import pytest

    from pism_tpu import Time
    from pism_tpu.coupler.surface import Uniform
    from pism_tpu.model.icemodel import IceModel

    monkeypatch.chdir(tmp_path)
    grid = Grid(Mx=7, My=7, Lx=100e3, Ly=100e3)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none"})
    H = np.full(grid.shape2, 500.0)
    H[3, 3] = np.nan
    state = ModelState(geometry=new_geometry(jnp.asarray(H),
                                             jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))
    with pytest.raises(RuntimeError, match="SSAFD_failed.nc"):
        model.run(state, Time(0.0, 3.15569259747e7))
    assert (tmp_path / "SSAFD_failed.nc").exists()
    s2, _ = ckpt.load_state(str(tmp_path / "SSAFD_failed.nc"), config=cfg)
    assert bool(np.isnan(np.asarray(s2.geometry.ice_thickness)).any())
