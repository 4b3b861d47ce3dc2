"""Verification-run driver: set up an exact-solution test by letter, run
it, and print a pismv-style numerical-error report.

Rebuild of the reference's ``pismv`` executable layer (``src/pismv.cc`` /
``src/verification/iceCompModel.cc``): each letter configures the model
against one exact solution, runs, and evaluates error norms at the final
time.  The letters match upstream: A (steady cap, fixed margin), B/C
(Halfar similarity; handled by the full CLI run path), D (compensatory
oscillation), F (thermo-coupled steady dome; manufactured-solution
analog), G (test F plus a time-periodic wobble), H (moving margin with
pointwise isostasy), I (Schoof plastic stream), K (cold conduction ice +
bedrock column), L (steady cap on a non-flat bed), M (annular shelf),
O (warm-based conduction column, exact basal melt rate), P (routing
hydrology radial steady state), V (van der Veen shelf).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

SPY = 3.15569259747e7

SUPPORTED = "ADEFGHKLOP"


def _report(title, rows):
    """Print a pismv-style error table: rows = [(group, {name: value})]."""
    print(f"NUMERICAL ERRORS in {title} evaluated at final time "
          "(relative to exact solution):")
    for group, vals in rows:
        names = "".join(f"{k:>16s}" for k in vals)
        nums = "".join(f"{v:16.6f}" for v in vals.values())
        print(f"{group:<10s}:{names}\n{'':<10s} {nums}")
    print("NUM ERRORS DONE")


def _geometry_errors(H_num, H_exact, dx, dy):
    from .halfar import error_norms
    e = error_norms(H_num, H_exact)
    return {
        "prcnt_volume": 100.0 * e["rel_volume"],
        "max_H": e["max_H"],
        "avg_H": e["avg_H"],
        "dome_H": e["dome_H"],
    }


def _isothermal_config(extra=None):
    from ..config.config import Config
    from . import halfar
    cfg = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": halfar.A_SOFTNESS,
        "energy.model": "none",
    })
    if extra:
        cfg.update(extra)
    return cfg


def _ocean_kill(grid, cfg, L):
    from ..model.calving import CalvingModel
    cfg.update({"calving.methods": "ocean_kill"})
    return CalvingModel(grid=grid, config=cfg,
                        ocean_kill_mask=jnp.asarray(grid.radius > L))


def _run_sia(grid, cfg, state, surface, t0, years, calving=None):
    from ..model.icemodel import IceModel
    model = IceModel(grid=grid, config=cfg, surface=surface, calving=calving)
    state, tf, stats = model.step_once(state, t0, years * SPY)
    return state, stats


def run_A(Mx=61, years=1000.0, config=None):
    """Steady cap with fixed margin: hold the exact profile."""
    from ..coupler.surface import FunctionSurface
    from ..grid import Grid
    from ..state import ModelState, new_geometry
    from . import exact_steady as es

    cap = es.test_A()
    grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
    cfg = _isothermal_config(config)
    He = cap.thickness(grid.radius)
    M = jnp.asarray(cap.accumulation(grid.radius))
    surface = FunctionSurface(
        lambda g, t: (M, jnp.full(g.ice_thickness.shape, 263.15)))
    state = ModelState(geometry=new_geometry(jnp.asarray(He),
                                             jnp.zeros(grid.shape2)))
    state, stats = _run_sia(grid, cfg, state, surface, 0.0, years,
                            calving=_ocean_kill(grid, cfg, cap.L))
    errs = _geometry_errors(np.asarray(state.geometry.ice_thickness), He,
                            grid.dx, grid.dy)
    _report(f"test A (steady cap, {years:.0f} a, {Mx}x{Mx})",
            [("geometry", errs)])
    return errs


def run_E(Mx=61, years=1000.0, config=None):
    """Test E: the steady test-A cap with prescribed basal sliding in an
    annular sector and compensatory accumulation (Bueler et al. 2005;
    reference ``exactTestsABCDE.c`` / ``pismv -test E``, where the sliding
    velocity is likewise prescribed rather than produced by a sliding
    law)."""
    from ..coupler.surface import FunctionSurface
    from ..grid import Grid
    from ..model.icemodel import IceModel
    from ..state import ModelState, new_geometry
    from . import exact_steady as es

    sc = es.test_E()
    grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
    cfg = _isothermal_config(config)
    cfg.update({"stress_balance.model": "prescribed_sliding+sia"})
    X, Y = np.meshgrid(grid.x, grid.y)
    He = sc.thickness(grid.radius)
    ub, vb = sc.sliding_velocity(X, Y)
    M = jnp.asarray(sc.accumulation(X, Y))
    surface = FunctionSurface(
        lambda g, t: (M, jnp.full(g.ice_thickness.shape, 263.15)))
    calving = _ocean_kill(grid, cfg, sc.cap.L)
    model = IceModel(grid=grid, config=cfg, surface=surface, calving=calving)
    model.stress_balance.prescribed_u = jnp.asarray(ub)
    model.stress_balance.prescribed_v = jnp.asarray(vb)
    state = ModelState(geometry=new_geometry(jnp.asarray(He),
                                             jnp.zeros(grid.shape2)))
    state, tf, stats = model.step_once(state, 0.0, years * SPY)
    errs = _geometry_errors(np.asarray(state.geometry.ice_thickness), He,
                            grid.dx, grid.dy)
    spy = 3.15569259747e7
    base = {"max_ub(m/a)": float(np.abs(ub).max() * spy),
            "max_vb(m/a)": float(np.abs(vb).max() * spy)}
    _report(f"test E (sliding sector cap, {years:.0f} a, {Mx}x{Mx})",
            [("geometry", errs), ("base slide", base)])
    return errs


def run_D(Mx=61, years=2500.0, config=None):
    """Compensatory accumulation oscillation (default: half a period)."""
    from ..coupler.surface import FunctionSurface
    from ..grid import Grid
    from ..state import ModelState, new_geometry
    from . import exact_steady as es

    H_exact, M_comp = es.make_test_D()
    cap = es.SteadyCap()
    grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
    cfg = _isothermal_config(config)
    r = jnp.asarray(grid.radius)
    H0 = H_exact(0.0, grid.radius)
    surface = FunctionSurface(
        lambda g, t: (M_comp(t, r), jnp.full(g.ice_thickness.shape, 263.15)))
    state = ModelState(geometry=new_geometry(jnp.asarray(H0),
                                             jnp.zeros(grid.shape2)))
    state, stats = _run_sia(grid, cfg, state, surface, 0.0, years,
                            calving=_ocean_kill(grid, cfg, cap.L))
    He = H_exact(years * SPY, grid.radius)
    errs = _geometry_errors(np.asarray(state.geometry.ice_thickness), He,
                            grid.dx, grid.dy)
    _report(f"test D (oscillating cap, {years:.0f} a, {Mx}x{Mx})",
            [("geometry", errs)])
    return errs


def run_F(Mx=61, Mz=31, years=200.0, config=None):
    """Thermo-coupled steady dome (manufactured-solution analog of F)."""
    from ..config.config import Config
    from ..grid import Grid
    from ..model.icemodel import IceModel
    from ..util.timecal import Time
    from .manufactured import ManufacturedThermoSIA

    ms = ManufacturedThermoSIA()
    grid = Grid(Mx=Mx, My=Mx, Lx=750e3, Ly=750e3, Mz=Mz, Lz=3500.0)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "pb",
                  "energy.model": "none"})
    if config:
        cfg.update(config)
    state, surface = ms.setup(grid, cfg)
    He = np.asarray(state.geometry.ice_thickness)
    model = IceModel(grid=grid, config=cfg, surface=surface)
    state, stats = model.run(state, Time(0.0, years * SPY))
    errs = _geometry_errors(np.asarray(state.geometry.ice_thickness), He,
                            grid.dx, grid.dy)
    _report(f"test F (thermo-coupled dome, {years:.0f} a, {Mx}x{Mx}x{Mz})",
            [("geometry", errs)])
    return errs


def run_G(Mx=61, Mz=31, years=None, config=None):
    """Test F plus a time-periodic wobble; default run = one full period,
    where the exact solution returns to the initial state."""
    from ..config.config import Config
    from ..grid import Grid
    from ..model.icemodel import IceModel
    from ..util.timecal import Time
    from .manufactured import ManufacturedThermoSIAPeriodic

    ms = ManufacturedThermoSIAPeriodic()
    if years is None:
        years = ms.period / SPY
    grid = Grid(Mx=Mx, My=Mx, Lx=750e3, Ly=750e3, Mz=Mz, Lz=3500.0)
    cfg = Config({"stress_balance.model": "sia",
                  "stress_balance.sia.flow_law": "pb",
                  "energy.model": "none"})
    if config:
        cfg.update(config)
    state, surface = ms.setup(grid, cfg)
    model = IceModel(grid=grid, config=cfg, surface=surface)
    state, stats = model.run(state, Time(0.0, years * SPY))
    r2d = grid.radius
    He = np.asarray(ms.thickness_t(years * SPY, jnp.asarray(r2d)))
    errs = _geometry_errors(np.asarray(state.geometry.ice_thickness), He,
                            grid.dx, grid.dy)
    _report(f"test G (periodic thermo dome, {years:.0f} a, {Mx}x{Mx}x{Mz})",
            [("geometry", errs)])
    return errs


def run_H(Mx=61, years=None, config=None):
    """Moving margin + pointwise isostasy (similarity solution)."""
    from ..coupler.surface import FunctionSurface
    from ..grid import Grid
    from ..state import ModelState, new_geometry
    from . import exact_steady as es
    from . import halfar

    sol = es.test_H()
    flat = sol.flat
    t0 = 0.6 * flat.t0
    t1 = flat.t0 if years is None else t0 + years * SPY
    grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
    cfg = _isothermal_config({
        "bed_deformation.model": "iso",
        "bed_deformation.lithosphere_density": halfar.RHO_ICE / sol.f,
    })
    if config:
        cfg.update(config)
    H0 = sol.thickness(t0, grid.radius)
    b0 = sol.bed(t0, grid.radius)
    lam = sol.lam

    def smb(g, t):
        return lam / t * g.ice_thickness, \
            jnp.full(g.ice_thickness.shape, 263.15)

    state = ModelState(geometry=new_geometry(jnp.asarray(H0),
                                             jnp.asarray(b0)))
    state, stats = _run_sia(grid, cfg, state, FunctionSurface(smb), t0,
                            (t1 - t0) / SPY)
    He = sol.thickness(t1, grid.radius)
    Hn = np.asarray(state.geometry.ice_thickness)
    errs = _geometry_errors(Hn, He, grid.dx, grid.dy)
    bn = np.asarray(state.geometry.bed_elevation)
    icy = Hn > 1.0
    bed_err = float(np.max(np.abs(bn + sol.f * Hn)[icy])) if icy.any() else 0.0
    _report(f"test H (isostasy similarity, {(t1 - t0) / SPY:.0f} a, "
            f"{Mx}x{Mx})",
            [("geometry", errs), ("bed", {"max|b + f H|": bed_err})])
    return errs


def run_K(Mz=41, years=300000.0, config=None):
    """Cold conduction column: steady linear profile with slope G/k_i,
    plus the bedrock thermal layer carrying exactly G."""
    from ..config.config import Config
    from ..grid import Grid
    from ..model.btu import btu_from_config
    from ..model.energy import EnergyModel
    from ..ops.sia3d import SIA3D
    from ..physics.enthalpy_converter import EnthalpyConverter
    from ..state import ModelState, new_geometry

    cfg = Config(config or {})
    k_i = cfg.get_number("constants.ice.thermal_conductivity")
    H0, G, Ts = 1000.0, 0.02, 233.15
    grid = Grid(Mx=3, My=3, Lx=10e3, Ly=10e3, Mz=Mz, Lz=1.15 * H0,
                Mbz=11, Lbz=1000.0)
    EC = EnthalpyConverter.from_config(cfg)
    em = EnergyModel(grid=grid, config=cfg, EC=EC)
    H = jnp.full(grid.shape2, H0)
    geom = new_geometry(H, jnp.zeros(grid.shape2))
    z = jnp.asarray(grid.z)
    p = EC.pressure(jnp.maximum(H[..., None] - z, 0.0))
    E = EC.enthalpy(jnp.full(p.shape, Ts), 0.0, p)
    state = ModelState(geometry=geom, enthalpy=E)
    zeros3 = jnp.zeros(grid.shape2 + (Mz,))
    sia3 = SIA3D(u=zeros3, v=zeros3, w=zeros3, strain_heating=zeros3,
                 max_u=jnp.zeros(()), max_v=jnp.zeros(()))
    T_sfc = jnp.full(grid.shape2, Ts)
    Gf = jnp.full(grid.shape2, G)
    nsteps = 200
    dt = years * SPY / nsteps

    def scan_steps(E0):
        def body(E, _):
            res = em.step(state.replace(enthalpy=E), sia3, T_sfc, dt,
                          geothermal_flux=Gf)
            return res.enthalpy, res.basal_melt_rate
        return jax.lax.scan(body, E0, None, length=nsteps)

    E_fin, melts = jax.jit(scan_steps)(state.enthalpy)
    zn = np.asarray(grid.z)
    in_ice = zn <= H0 - 1.0
    pz = np.asarray(EC.pressure(jnp.maximum(H0 - jnp.asarray(zn), 0.0)))
    T = np.asarray(EC.temperature(E_fin[1, 1], jnp.asarray(pz)))
    T_exact = Ts + G / k_i * (H0 - zn)
    ice_err = float(np.max(np.abs(T - T_exact)[in_ice]))
    # bedrock: steady linear profile carrying exactly G
    btu = btu_from_config(grid, cfg)
    k_b = cfg.get_number("energy.bedrock_thermal.conductivity")
    T_top = jnp.full(grid.shape2, 260.0)
    bed_T = btu.init_temperature(T_top, Gf)
    for _ in range(200):
        bed_T, flux = btu.step(bed_T, T_top, Gf, 2000.0 * SPY)
    flux_err = abs(float(flux[1, 1]) - G)
    dT_err = abs(float(bed_T[1, 1, 0] - bed_T[1, 1, -1]) - G * 1000.0 / k_b)
    errs = {"maxT_ice": ice_err, "bed_flux_err": flux_err,
            "bed_dT_err": dT_err}
    _report(f"test K (cold two-layer column, {years:.0f} a, Mz={Mz})",
            [("temp", errs)])
    return errs


def run_L(Mx=61, years=1000.0, config=None):
    """Steady cap over a non-flat bed (exact profile via the radial ODE)."""
    from ..coupler.surface import FunctionSurface
    from ..grid import Grid
    from ..state import ModelState, new_geometry
    from . import exact_steady as es

    cap = es.test_L()
    grid = Grid(Mx=Mx, My=Mx, Lx=900e3, Ly=900e3)
    cfg = _isothermal_config(config)
    He = cap.solve(grid.radius)
    M = jnp.asarray(np.where(grid.radius < cap.L, cap.M0, 0.0))
    surface = FunctionSurface(
        lambda g, t: (M, jnp.full(g.ice_thickness.shape, 263.15)))
    state = ModelState(geometry=new_geometry(jnp.asarray(He),
                                             jnp.asarray(cap.bed(grid.radius))))
    state, stats = _run_sia(grid, cfg, state, surface, 0.0, years,
                            calving=_ocean_kill(grid, cfg, cap.L))
    errs = _geometry_errors(np.asarray(state.geometry.ice_thickness), He,
                            grid.dx, grid.dy)
    _report(f"test L (cap on non-flat bed, {years:.0f} a, {Mx}x{Mx})",
            [("geometry", errs)])
    return errs


def run_O(Mz=41, years=300000.0, config=None):
    """Warm-based conduction column: steady basal melt = flux imbalance
    over rho_i L."""
    from ..config.config import Config
    from ..grid import Grid
    from ..model.energy import EnergyModel
    from ..ops.sia3d import SIA3D
    from ..physics.enthalpy_converter import EnthalpyConverter
    from ..state import ModelState, new_geometry

    cfg = Config(config or {})
    k_i = cfg.get_number("constants.ice.thermal_conductivity")
    rho_i = cfg.get_number("constants.ice.density")
    Lf = cfg.get_number("constants.fresh_water.latent_heat_of_fusion")
    H0, G = 1000.0, 0.042
    EC = EnthalpyConverter.from_config(cfg)
    Tm_base = float(EC.melting_temperature(EC.pressure(jnp.asarray(H0))))
    Ts = Tm_base - 5.0
    grid = Grid(Mx=3, My=3, Lx=10e3, Ly=10e3, Mz=Mz, Lz=1.15 * H0)
    em = EnergyModel(grid=grid, config=cfg, EC=EC)
    H = jnp.full(grid.shape2, H0)
    geom = new_geometry(H, jnp.zeros(grid.shape2))
    z = jnp.asarray(grid.z)
    p = EC.pressure(jnp.maximum(H[..., None] - z, 0.0))
    E = EC.enthalpy(EC.melting_temperature(p), 0.0, p)   # start temperate
    state = ModelState(geometry=geom, enthalpy=E)
    zeros3 = jnp.zeros(grid.shape2 + (Mz,))
    sia3 = SIA3D(u=zeros3, v=zeros3, w=zeros3, strain_heating=zeros3,
                 max_u=jnp.zeros(()), max_v=jnp.zeros(()))
    T_sfc = jnp.full(grid.shape2, Ts)
    Gf = jnp.full(grid.shape2, G)
    nsteps = 200
    dt = years * SPY / nsteps

    def scan_steps(E0):
        def body(E, _):
            res = em.step(state.replace(enthalpy=E), sia3, T_sfc, dt,
                          geothermal_flux=Gf)
            return res.enthalpy, res.basal_melt_rate
        return jax.lax.scan(body, E0, None, length=nsteps)

    E_fin, melts = jax.jit(scan_steps)(state.enthalpy)
    M_exact = (G - k_i * (Tm_base - Ts) / H0) / (rho_i * Lf)
    M = float(melts[-1][1, 1])
    errs = {"bmelt": M * SPY, "bmelt_exact": M_exact * SPY,
            "prcnt_err": 100.0 * abs(M - M_exact) / M_exact}
    _report(f"test O (steady basal melt, {years:.0f} a, Mz={Mz})",
            [("bmelt", errs)])
    return errs


def run_P(Mx=51, years=2.5, config=None):
    """Routing hydrology vs the exact radial steady state."""
    from ..config.config import Config
    from ..grid import Grid
    from ..physics.hydrology import Routing
    from ..state import ModelState, new_geometry
    from .hydrology_exact import RoutingSteady

    sol = RoutingSteady()
    grid = Grid(Mx=Mx, My=Mx, Lx=30e3, Ly=30e3)
    cfg = Config({
        "hydrology.model": "routing",
        "hydrology.tillwat_decay_rate": 0.0,
        "hydrology.hydraulic_conductivity": sol.k,
        "hydrology.alpha": sol.alpha,
        "hydrology.beta": sol.beta,
    })
    if config:
        cfg.update(config)
    r = grid.radius
    W_max = cfg.get_number("hydrology.tillwat_max")
    state = ModelState(
        geometry=new_geometry(jnp.asarray(sol.thickness(r)),
                              jnp.asarray(sol.bed(r))),
        tillwat=jnp.full(grid.shape2, W_max),
        basal_melt_rate=jnp.asarray(np.where(r < sol.R_i, sol.melt, 0.0)),
        hydro_W=jnp.zeros(grid.shape2))
    hydro = Routing(grid=grid, config=cfg)
    week = 7.0 * 24 * 3600.0
    advance = jax.jit(lambda s: hydro.step(s, week))
    for _ in range(int(years * SPY / week)):
        state = advance(state)
    W = np.asarray(state.hydro_W)
    We = sol.water_thickness(r)
    sel = (r > 0.2 * sol.R_i) & (r < 0.9 * sol.R_i)
    rel = np.abs(W[sel] - We[sel]) / We[sel]
    errs = {"max_W": float(np.abs(W[sel] - We[sel]).max()),
            "avg_W": float(np.abs(W[sel] - We[sel]).mean()),
            "median_rel_prcnt": 100.0 * float(np.median(rel))}
    _report(f"test P (routing steady state, {years:.1f} a, {Mx}x{Mx})",
            [("hydro W", errs)])
    return errs


def run_test(letter, *, Mx=None, My=None, Mz=None, years=None, config=None):
    """Dispatch a verification run by pismv letter.  Returns the error
    dict (also printed as a pismv-style table).  Besides the upstream
    letters, the Blatter manufactured problems run as ``blatter_xz`` and
    ``blatter_xz_cfbc`` (reference src/stressbalance/blatter/verification/,
    which upstream exercises through ctest rather than pismv letters)."""
    if str(letter).lower() in ("blatter_xz", "blatter_xz_cfbc"):
        from .blatter_xz import run_blatter_xz, run_blatter_xz_cfbc
        fn = run_blatter_xz if str(letter).lower() == "blatter_xz" \
            else run_blatter_xz_cfbc
        if Mx is not None:
            return fn(Mx_list=(Mx,), config=config)
        return fn(config=config)
    letter = letter.upper()
    kw = {"config": config}
    if years is not None:
        kw["years"] = years
    if letter in ("K", "O"):
        if Mz is not None:
            kw["Mz"] = Mz
        return {"K": run_K, "O": run_O}[letter](**kw)
    if Mx is not None:
        kw["Mx"] = Mx
    if letter in ("F", "G"):
        if Mz is not None:
            kw["Mz"] = Mz
        return {"F": run_F, "G": run_G}[letter](**kw)
    fn = {"A": run_A, "D": run_D, "E": run_E, "H": run_H, "L": run_L,
          "P": run_P}.get(letter)
    if fn is None:
        raise ValueError(f"unsupported verification test {letter!r}; "
                         f"runner supports {', '.join(SUPPORTED)}")
    return fn(**kw)
