"""Output-channel tests: extra/ts series scheduling, snapshots, diagnostics."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu import Config, Grid, Time
from pism_tpu.io.nc4 import File
from pism_tpu.model.icemodel import IceModel
from pism_tpu.model.output import OutputManager
from pism_tpu.model import diagnostics as diag
from pism_tpu.state import ModelState, new_geometry
from pism_tpu.coupler.surface import Uniform
from pism_tpu.verification import halfar

SPY = 3.15569259747e7


@pytest.fixture
def model_state():
    sol = halfar.test_B()
    grid = Grid(Mx=31, My=31, Lx=900e3, Ly=900e3)
    cfg = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "energy.model": "none",
    })
    H0 = sol.thickness(sol.t0, grid.radius)
    state = ModelState(geometry=new_geometry(jnp.asarray(H0), jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))
    return sol, grid, cfg, model, state


def test_extra_and_ts_series(tmp_path, model_state):
    sol, grid, cfg, model, state = model_state
    t0 = sol.t0
    extra_times = [t0 + k * 50 * SPY for k in range(1, 5)]
    ts_times = [t0 + k * 25 * SPY for k in range(1, 9)]
    out = OutputManager(
        grid=grid, config=cfg,
        extra_times=extra_times, extra_vars=("thk", "usurf", "mask"),
        extra_file=str(tmp_path / "extra.nc"),
        ts_times=ts_times, ts_vars=("ice_volume_glacierized", "max_velocity"),
        ts_file=str(tmp_path / "ts.nc"),
    )
    state, stats = model.run(state, Time(t0, t0 + 200 * SPY), output=out)
    out.close()

    with File(str(tmp_path / "extra.nc"), "r") as f:
        times = f.read("time")
        assert len(times) == 4
        np.testing.assert_allclose(times, extra_times, rtol=0, atol=1.0)
        thk = f.read("thk")
        assert thk.shape == (4, 31, 31)
        assert f.read_attrs("thk")["units"] == "m"

    with File(str(tmp_path / "ts.nc"), "r") as f:
        times = f.read("time")
        assert len(times) == 8
        vol = f.read("ice_volume_glacierized")
        assert vol.shape == (8,)
        # Halfar dome with zero SMB conserves volume (glacierized volume
        # excludes sub-threshold margin cells, so only near-exact)
        assert abs(vol[-1] - vol[0]) / vol[0] < 1e-6


def test_ts_tendencies_close_the_mass_budget(tmp_path, model_state):
    """Interval-averaged tendency_* scalars (PISM TSDiagnostic rates): the
    independently-computed volume tendency must equal the sum of the budget
    terms from the conservation bookkeeping over every reporting window,
    and CF time bounds must bracket each window."""
    sol, grid, cfg, model, state = model_state
    t0 = sol.t0
    ts_times = [t0 + k * 40 * SPY for k in range(1, 5)]
    out = OutputManager(
        grid=grid, config=cfg,
        ts_times=ts_times,
        ts_vars=("ice_volume",
                 "tendency_of_ice_volume",
                 "tendency_of_ice_volume_due_to_surface_mass_flux",
                 "tendency_of_ice_volume_due_to_basal_mass_flux",
                 "tendency_of_ice_volume_due_to_flow",
                 "tendency_of_ice_volume_due_to_discharge",
                 "tendency_of_ice_volume_due_to_conservation_error"),
        ts_file=str(tmp_path / "ts.nc"),
    )
    # nonzero SMB so the budget is not trivially zero
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.1 / SPY))
    state, _ = model.run(state, Time(t0, t0 + 160 * SPY), output=out)
    out.close()

    with File(str(tmp_path / "ts.nc"), "r") as f:
        assert f.read_attrs("time")["bounds"] == "time_bnds"
        bnds = f.read("time_bnds")
        times = f.read("time")
        assert bnds.shape == (4, 2)
        np.testing.assert_allclose(bnds[:, 1], times, rtol=0, atol=1.0)
        np.testing.assert_allclose(bnds[1:, 0], times[:-1], rtol=0, atol=1.0)
        assert abs(bnds[0, 0] - t0) < 1.0  # first window starts at run start
        dV = f.read("tendency_of_ice_volume")
        budget = sum(f.read("tendency_of_ice_volume_due_to_" + part)
                     for part in ("surface_mass_flux", "basal_mass_flux",
                                  "flow", "discharge", "conservation_error"))
        assert f.read_attrs("tendency_of_ice_volume")["cell_methods"] == \
            "time: mean"
        # budget closes to rounding relative to the largest term
        scale = np.abs(dV).max()
        assert scale > 0
        np.testing.assert_allclose(dV, budget, atol=1e-6 * scale)


def test_extra_spatial_budget_fields(tmp_path, model_state):
    """Per-cell tendency_of_ice_amount* fields (PISM's -extra budget
    diagnostics from GeometryEvolution's per-cell accumulators): the total
    must equal the sum of the parts cell by cell."""
    sol, grid, cfg, model, state = model_state
    t0 = sol.t0
    extra_times = [t0 + k * 50 * SPY for k in range(1, 4)]
    out = OutputManager(
        grid=grid, config=cfg,
        extra_times=extra_times,
        extra_vars=("thk", "tendency_of_ice_amount",
                    "tendency_of_ice_amount_due_to_flow",
                    "tendency_of_ice_amount_due_to_surface_mass_flux",
                    "tendency_of_ice_amount_due_to_basal_mass_flux",
                    "tendency_of_ice_amount_due_to_conservation_error",
                    "tendency_of_ice_amount_due_to_discharge"),
        extra_file=str(tmp_path / "extra.nc"),
    )
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.05 / SPY))
    state, _ = model.run(state, Time(t0, t0 + 150 * SPY), output=out)
    out.close()

    with File(str(tmp_path / "extra.nc"), "r") as f:
        total = f.read("tendency_of_ice_amount")
        parts = sum(f.read("tendency_of_ice_amount_due_to_" + p)
                    for p in ("flow", "surface_mass_flux", "basal_mass_flux",
                              "conservation_error", "discharge"))
        assert total.shape == (3, 31, 31)
        assert f.read_attrs("tendency_of_ice_amount")["cell_methods"] == \
            "time: mean"
        scale = np.abs(total).max()
        assert scale > 0  # nonzero SMB drives a nonzero budget
        np.testing.assert_allclose(total, parts, atol=1e-6 * scale)


def test_snapshots(tmp_path, model_state):
    sol, grid, cfg, model, state = model_state
    t0 = sol.t0
    out = OutputManager(
        grid=grid, config=cfg,
        snapshot_times=[t0 + 30 * SPY],
        snapshot_file=str(tmp_path / "snap_{kyr:.4f}.nc"),
    )
    state, _ = model.run(state, Time(t0, t0 + 60 * SPY), output=out)
    import glob
    snaps = glob.glob(str(tmp_path / "snap_*.nc"))
    assert len(snaps) == 1
    from pism_tpu.io import checkpoint as ckpt
    s2, t2 = ckpt.load_state(snaps[0], config=cfg)
    assert abs(t2 - (t0 + 30 * SPY)) < 1.0  # snapshot hit the exact time


def test_diagnostics_registry(model_state):
    sol, grid, cfg, model, state = model_state
    state = model.prepare_state(state)
    vals = diag.compute_spatial(["thk", "usurf", "taud_mag", "velbar_mag"],
                                state, model, sol.t0)
    assert vals["thk"].shape == grid.shape2
    assert float(vals["taud_mag"].max()) > 0
    svals = diag.compute_scalar(["ice_volume", "ice_area_glacierized"],
                                state, model, sol.t0)
    assert float(svals["ice_volume"]) > 0
    assert float(svals["ice_area_glacierized"]) > 0

def test_signal_handling(tmp_path, model_state):
    """SIGUSR1 -> backup written, run continues; SIGTERM -> clean early stop
    (reference IceModel::process_signals)."""
    import os
    import signal

    from pism_tpu.util.signals import SignalMonitor

    sol, grid, cfg, model, state = model_state
    t0 = sol.t0
    out = OutputManager(grid=grid, config=cfg,
                        backup_file=str(tmp_path / "backup.nc"),
                        async_io=False)
    seen = []

    def poke(state_, t, stats):
        seen.append(t)
        if len(seen) == 1:
            os.kill(os.getpid(), signal.SIGUSR1)
        elif len(seen) == 2:
            os.kill(os.getpid(), signal.SIGTERM)

    with SignalMonitor() as sigs:
        state, _ = model.run(state, Time(t0, t0 + 500 * SPY), output=out,
                             callback=poke, signals=sigs,
                             segment_seconds=20 * SPY)
    # stopped after the second segment, well before 500 years
    assert len(seen) == 2
    assert seen[-1] < t0 + 100 * SPY
    from pism_tpu.io import checkpoint as ckpt
    s2, t2 = ckpt.load_state(str(tmp_path / "backup.nc"), config=cfg)
    assert abs(t2 - seen[0]) < 1.0


def test_dbdt_spatial_rate(tmp_path, model_state):
    """dbdt (-extra bedrock uplift rate): with pointwise isostasy under a
    spreading Halfar dome the bed subsides where thickness grows; the
    reported rate equals the exact window-mean d(topg)/dt."""
    sol, grid, cfg, model, state = model_state
    t0 = sol.t0
    cfg.update({"bed_deformation.model": "iso"})
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.1 / SPY))
    extra_times = [t0 + k * 50 * SPY for k in range(1, 3)]
    out = OutputManager(
        grid=grid, config=cfg, extra_times=extra_times,
        extra_vars=("thk", "topg", "dbdt"),
        extra_file=str(tmp_path / "ex_dbdt.nc"),
    )
    state, _ = model.run(state, Time(t0, t0 + 100 * SPY), output=out)
    out.close()
    with File(str(tmp_path / "ex_dbdt.nc"), "r") as f:
        dbdt = f.read("dbdt")
        topg = f.read("topg")
        tb = f.read("time_bnds")
    assert dbdt.shape == (2, 31, 31)
    # uniform positive SMB -> loading -> subsidence under the dome
    assert dbdt[1].min() < 0.0
    # window-exact: dbdt of window 2 = (topg2 - topg1)/dt
    dt = tb[1, 1] - tb[1, 0]
    np.testing.assert_allclose(dbdt[1], (topg[1] - topg[0]) / dt,
                               rtol=1e-10, atol=1e-22)


def test_ts_discharge_split_by_mechanism(tmp_path):
    """The discharge tendency splits exactly into calving + frontal melt +
    forced retreat (PISM ts tendency_of_ice_mass_due_to_{calving,...})."""
    cfg = Config({
        "stress_balance.model": "none",
        "energy.model": "none",
        "calving.methods": "thickness_calving",
        "calving.thickness_calving.threshold": 250.0,
        "geometry.remove_icebergs": False,
    })
    grid = Grid(Mx=21, My=21, Lx=100e3, Ly=100e3)
    y, x = np.meshgrid(np.arange(21), np.arange(21), indexing="ij")
    # floating block with a thin rim -> thickness calving eats the margin
    dist = np.maximum(np.abs(x - 10), np.abs(y - 10))
    H = np.where(dist <= 6, np.where(dist >= 5, 200.0, 400.0), 0.0)
    geom = new_geometry(jnp.asarray(H), jnp.asarray(np.full_like(H, -800.0)))
    state = ModelState(geometry=geom)
    model = IceModel(grid=grid, config=cfg, surface=Uniform(smb=0.0))
    ts_times = [k * 1.0 * SPY for k in range(1, 4)]
    out = OutputManager(
        grid=grid, config=cfg, ts_times=ts_times,
        ts_file=str(tmp_path / "ts.nc"),
        ts_vars=("tendency_of_ice_mass_due_to_discharge",
                 "tendency_of_ice_mass_due_to_calving",
                 "tendency_of_ice_mass_due_to_frontal_melt",
                 "tendency_of_ice_mass_due_to_forced_retreat"))
    state, _ = model.run(state, Time(0.0, 3.0 * SPY), output=out)
    out.close()
    with File(str(tmp_path / "ts.nc"), "r") as f:
        disch = f.read("tendency_of_ice_mass_due_to_discharge")
        calv = f.read("tendency_of_ice_mass_due_to_calving")
        fm = f.read("tendency_of_ice_mass_due_to_frontal_melt")
        forced = f.read("tendency_of_ice_mass_due_to_forced_retreat")
    assert calv[0] < 0.0                      # the rim calved in window 1
    np.testing.assert_allclose(fm, 0.0, atol=1e-12)
    np.testing.assert_allclose(forced, 0.0, atol=1e-12)
    scale = max(abs(disch).max(), 1.0)
    np.testing.assert_allclose(disch, calv + fm + forced,
                               atol=1e-9 * scale)


def test_view_pngs(tmp_path):
    """-view role: PNG map frames refreshed at segment boundaries."""
    import jax.numpy as jnp
    from pism_tpu import Config, Grid
    from pism_tpu.state import ModelState, new_geometry
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.model.output import OutputManager

    SPY = 3.15569259747e7
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none"})
    grid = Grid(Mx=11, My=11, Lx=100e3, Ly=100e3)
    H = jnp.asarray(np.maximum(0.0, 1000.0 * (1 - (grid.radius / 80e3) ** 2)))
    st = ModelState(geometry=new_geometry(H, jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg)
    st = model.prepare_state(st)
    out = OutputManager(grid=grid, config=cfg,
                        view_vars=("thk", "velbar_mag"),
                        view_dir=str(tmp_path))
    out.start(st, 0.0, model)
    out.process(st, 10.0 * SPY, model)
    out.close()
    for name in ("thk", "velbar_mag"):
        p = tmp_path / f"view_{name}.png"
        assert p.exists() and p.stat().st_size > 1000
