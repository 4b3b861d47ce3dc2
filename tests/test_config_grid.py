import numpy as np
import pytest

from pism_tpu import Config, Grid


def test_config_defaults_and_units():
    cfg = Config()
    assert cfg.get_number("constants.ice.density") == 910.0
    assert cfg.get_number("time_stepping.maximum_time_step", "seconds") == pytest.approx(
        60.0 * 3.15569259747e7)
    assert cfg.get_string("stress_balance.model") == "sia"
    assert cfg.get_flag("geometry.update.enabled") is True


def test_config_override_roundtrip():
    cfg = Config({"grid.Mx": 121, "stress_balance.model": "ssa+sia"})
    assert cfg.get_int("grid.Mx") == 121
    s = cfg.to_json()
    cfg2 = Config.from_json(s)
    assert cfg2.get_int("grid.Mx") == 121
    assert cfg2.get_string("stress_balance.model") == "ssa+sia"
    assert "grid.Mx" in cfg.non_default()


def test_config_unknown_raises():
    cfg = Config()
    with pytest.raises(KeyError):
        cfg.get_number("no.such.parameter")
    with pytest.raises(KeyError):
        cfg.update({"no.such.parameter": 1})


def test_grid_coordinates():
    g = Grid(Mx=61, My=61, Lx=750e3, Ly=750e3, Mz=11, Lz=4000.0,
             vertical_spacing="equal")
    assert g.dx == pytest.approx(25e3)
    assert g.x[0] == -750e3 and g.x[-1] == 750e3
    assert g.z[0] == 0.0 and g.z[-1] == 4000.0
    assert np.allclose(np.diff(g.z), 400.0)


def test_grid_quadratic_levels():
    g = Grid(Mx=3, My=3, Lx=1e3, Ly=1e3, Mz=31, Lz=4000.0,
             vertical_spacing="quadratic", lam=4.0)
    dz = np.diff(g.z)
    assert g.z[0] == 0.0 and g.z[-1] == 4000.0
    # finer near the base
    assert dz[0] < dz[-1]
    assert dz[0] == pytest.approx(4000.0 / 30 / 4.0, rel=0.15)
    assert np.all(dz > 0)


def test_grid_hashable_static():
    g1 = Grid(Mx=61, My=61, Lx=750e3, Ly=750e3)
    g2 = Grid(Mx=61, My=61, Lx=750e3, Ly=750e3)
    assert hash(g1) == hash(g2) and g1 == g2


def test_hit_multiples_dt():
    """Reference -timestep_hit_multiples: dt truncated so steps land on
    integer multiples of the period."""
    import jax.numpy as jnp
    from pism_tpu import Config, Grid
    from pism_tpu import state as S
    from pism_tpu.state import ModelState, new_geometry
    from pism_tpu.model.icemodel import IceModel

    SPY = 3.15569259747e7
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none",
                  "time_stepping.maximum_time_step": 60.0,
                  "time_stepping.hit_multiples": 10.0})
    grid = Grid(Mx=11, My=11, Lx=100e3, Ly=100e3)
    # thin flat ice -> huge diffusivity dt -> max_dt-limited
    st = ModelState(geometry=new_geometry(jnp.full(grid.shape2, 10.0),
                                          jnp.zeros(grid.shape2)))
    model = IceModel(grid=grid, config=cfg)
    st = model.prepare_state(st)
    sb = model.stress_balance.update(st)
    t_end = 1e4 * SPY
    # from t = 3 yr the next multiple is 10 yr -> dt = 7 yr
    dt = float(model._compute_dt(sb, 3.0 * SPY, t_end)[0])
    assert dt / SPY == pytest.approx(7.0, rel=1e-9)
    # sitting exactly on a multiple -> full 10 yr to the next one
    dt = float(model._compute_dt(sb, 20.0 * SPY, t_end)[0])
    assert dt / SPY == pytest.approx(10.0, rel=1e-9)
    # without the option the step is max_dt-limited
    cfg2 = Config({"stress_balance.model": "sia",
                   "stress_balance.sia.flow_law": "isothermal_glen",
                   "energy.model": "none",
                   "time_stepping.maximum_time_step": 60.0})
    model2 = IceModel(grid=grid, config=cfg2)
    dt, idx = model2._compute_dt(sb, 3.0 * SPY, t_end)
    from pism_tpu.model.icemodel import DT_LIMITS
    assert DT_LIMITS[int(idx)] == "max_dt"
    dt = float(dt)
    assert dt / SPY > 10.0


def test_parameter_database_breadth():
    # reference src/pism_config.cdl holds ~600 parameters; ours tracks it
    from pism_tpu.config.parameters import PARAMETERS
    assert len(PARAMETERS) >= 550
    # every entry is (value, units, doc) with a non-empty doc string
    for name, (value, units, doc) in PARAMETERS.items():
        assert isinstance(doc, str) and doc, name


def test_parameter_docgen(tmp_path):
    from pism_tpu.config.docgen import write_markdown
    out = tmp_path / "PARAMETERS.md"
    n = write_markdown(str(out))
    text = out.read_text()
    assert n >= 550
    assert "`constants.ice.density`" in text
    assert "## `stress_balance.*`" in text
