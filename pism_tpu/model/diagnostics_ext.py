"""Diagnostics registry, part 2: reference-parity families.

Continues :mod:`pism_tpu.model.diagnostics` (same registries/decorators)
with the remaining families of the reference's per-component diagnostic
dictionaries (SURVEY.md §2.1 "Diagnostics"; upstream
``src/util/Diagnostic.cc`` + each component's ``diagnostics()`` map):

- grid/coordinate fields (lat, lon, cell_area)
- reference-name aliases where our round-1 name differed (temp_pa, ...)
- stress-balance extras (tauxz/tauyz, hardness, staggered diffusivity/flux,
  basal drag beta, Dirichlet-BC masks)
- hydrology mass-budget fields (subglacial_water_input_rate +
  tendency_of_subglacial_water_mass_due_to_* family)
- per-coupler *effective* input fields (what the ice actually sees after
  the modifier chain; upstream registers these in the Initialization
  wrappers)
- ocean input/melange fields, calving thresholds, bed-deformation parts,
  fracture-density suite
- the ISMIP6 output-variable set (upstream ``src/icemodel/diagnostics.cc``
  registers CMIP-style names: lithk, orog, acabf, xvelsurf, ..., and the
  scalar lim/iareagr/iareafl/tend* series)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import state as S
from ..util.units import SEC_PER_YEAR
from .diagnostics import (
    SPATIAL, SCALAR, RATE, Diagnostic, spatial, scalar, rate,
    _zeros2, _sb, _atmosphere_of, _pdd_of, _debm_model, _surface_budget,
    _find_coupler,
)


def alias(new_name, existing, units=None, long_name=None):
    """Register an existing diagnostic under a second (reference) name."""
    d = SPATIAL[existing]
    SPATIAL[new_name] = Diagnostic(d.func, units or d.units,
                                   long_name or d.long_name, d.standard_name)


def scalar_alias(new_name, existing, units=None, long_name=None):
    d = SCALAR[existing]
    SCALAR[new_name] = Diagnostic(d.func, units or d.units,
                                  long_name or d.long_name, d.standard_name)


def rate_alias(new_name, existing, units=None, long_name=None):
    d = RATE[existing]
    RATE[new_name] = Diagnostic(d.func, units or d.units,
                                long_name or d.long_name, d.standard_name)


# --------------------------------------------------------------------------
# coordinates / grid (reference: lat/lon are mandatory output fields,
# recomputed from the projection; src/util/projection.cc)
# --------------------------------------------------------------------------

def _lonlat(model):
    proj = ""
    if model.config is not None:
        try:
            proj = model.config.get_string("grid.projection")
        except Exception:
            proj = ""
    if not proj:
        return None
    cached = getattr(model, "_diag_lonlat_cache", None)
    if cached is not None:
        return cached
    from ..util.projection import from_proj_string, lonlat_for_grid
    try:
        ps = from_proj_string(proj)
    except Exception:
        return None
    lon, lat = lonlat_for_grid(model.grid, ps)
    model._diag_lonlat_cache = (lon, lat)
    return lon, lat


@spatial("lat", "degree_north", "latitude", "latitude")
def _lat(state, model, t):
    ll = _lonlat(model)
    if ll is None:
        return _zeros2(state)
    return jnp.asarray(ll[1], state.geometry.ice_thickness.dtype)


@spatial("lon", "degree_east", "longitude", "longitude")
def _lon(state, model, t):
    ll = _lonlat(model)
    if ll is None:
        return _zeros2(state)
    return jnp.asarray(ll[0], state.geometry.ice_thickness.dtype)


@spatial("cell_area", "m2", "grid cell area", "cell_area")
def _cell_area(state, model, t):
    return jnp.full(state.geometry.ice_thickness.shape,
                    model.grid.cell_area(),
                    state.geometry.ice_thickness.dtype)


# --------------------------------------------------------------------------
# reference-name aliases (PISM's names where round 1 used a variant)
# --------------------------------------------------------------------------

alias("temp_pa", "temppa")
alias("tempbase", "temp_base")
alias("tempsurf", "temp_surf")
alias("strain_heating", "strainheating")
# PDD budget fields appear in the reference under the short names too
alias("saccum", "surface_accumulation_flux")
alias("smelt", "surface_melt_flux")
alias("srunoff", "surface_runoff_flux")


# --------------------------------------------------------------------------
# stress-balance extras (reference src/stressbalance/StressBalance.cc
# diagnostics map: pressure, tauxz, tauyz; SSA beta; SIAFD staggered fields)
# --------------------------------------------------------------------------

def _overburden3(state, model):
    """Hydrostatic pressure rho g (s - z) on the 3D grid, clipped at 0."""
    g = state.geometry
    z = jnp.asarray(model.grid.z, g.ice_thickness.dtype)
    depth = g.ice_thickness[..., None] - z[None, None, :]
    rho_i = model.rho_i
    gacc = model.config.get_number("constants.standard_gravity") \
        if model.config is not None else 9.81
    return jnp.maximum(rho_i * gacc * depth, 0.0)


@spatial("tauxz", "Pa", "shear stress xz component (SIA hydrostatic "
         "approximation: -rho g (s-z) ds/dx)")
def _tauxz(state, model, t):
    """Reference ``SSB_tauxz`` (src/stressbalance/StressBalance.cc)."""
    g = state.geometry
    sh, dx = model.sh, model.grid.dx
    s = g.ice_surface_elevation
    dsdx = (sh(s, 0, 1) - sh(s, 0, -1)) / (2.0 * dx)
    return -_overburden3(state, model) * dsdx[..., None]


@spatial("tauyz", "Pa", "shear stress yz component (SIA hydrostatic "
         "approximation: -rho g (s-z) ds/dy)")
def _tauyz(state, model, t):
    g = state.geometry
    sh, dy = model.sh, model.grid.dy
    s = g.ice_surface_elevation
    dsdy = (sh(s, 1, 0) - sh(s, -1, 0)) / (2.0 * dy)
    return -_overburden3(state, model) * dsdy[..., None]


@spatial("hardness", "Pa s0.333333", "ice hardness computed using the "
         "SIA flow law")
def _hardness3(state, model, t):
    """Reference ``SSB_hardness``: 3D hardness B(E, p)."""
    g = state.geometry
    law = model.stress_balance.sia_flow_law
    if law is None or state.enthalpy is None:
        return jnp.zeros(g.ice_thickness.shape + (model.grid.Mz,),
                         g.ice_thickness.dtype)
    p = _overburden3(state, model)
    return law.hardness(state.enthalpy, p)


@spatial("diffusivity_staggered_e", "m2 s-1",
         "SIA diffusivity on east cell faces")
def _diff_e(state, model, t):
    """Reference ``SIAFD_diffusivity_staggered`` (x-offset component)."""
    flux = _sia_flux(state, model)
    return flux.De if flux is not None else _zeros2(state)


@spatial("diffusivity_staggered_n", "m2 s-1",
         "SIA diffusivity on north cell faces")
def _diff_n(state, model, t):
    flux = _sia_flux(state, model)
    return flux.Dn if flux is not None else _zeros2(state)


@spatial("flux_staggered_e", "m2 s-1",
         "total (diffusive + advective) ice flux on east cell faces")
def _fluxstag_e(state, model, t):
    """Reference ``GeometryEvolution`` flux_staggered diagnostic."""
    from . import geometry_evolution as ge
    sb = _sb(state, model, t)
    qe_adv, _ = ge.advective_flux(sb.u_face_e, sb.v_face_n,
                                  state.geometry.ice_thickness, model.sh)
    return sb.qe + qe_adv


@spatial("flux_staggered_n", "m2 s-1",
         "total (diffusive + advective) ice flux on north cell faces")
def _fluxstag_n(state, model, t):
    from . import geometry_evolution as ge
    sb = _sb(state, model, t)
    _, qn_adv = ge.advective_flux(sb.u_face_e, sb.v_face_n,
                                  state.geometry.ice_thickness, model.sh)
    return sb.qn + qn_adv


def _sia_flux(state, model):
    """Memoized SIA diffusivity/flux solve for the staggered diagnostics."""
    if not model.stress_balance.has_sia:
        return None
    key = id(state)
    cached = getattr(model, "_diag_siaflux_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    from ..ops import sia as sia_ops
    sbm = model.stress_balance
    flux = sia_ops.diffusivity(
        sbm.sia_flow_law, state.geometry, state.enthalpy, model.grid,
        model.sh, n=sbm.n_sia, enhancement=sbm.e_sia,
        rho=model.rho_i, g=sbm.g, gradient_method=sbm.gradient_method)
    model._diag_siaflux_cache = (key, flux)
    return flux


@spatial("beta", "Pa s m-1", "basal drag coefficient "
         "(tau_b = -beta * u_base)")
def _beta(state, model, t):
    """Reference ``ShallowStressBalance`` basal drag diagnostic: the
    sliding-law linearization beta = tau_c f(|u|) used in the SSA system."""
    H = state.geometry.ice_thickness
    ssa = getattr(model, "ssa", None)
    if ssa is None or state.u_ssa is None:
        return jnp.zeros_like(H)
    u = state.u_ssa
    v = state.v_ssa
    speed = jnp.sqrt(u ** 2 + v ** 2)
    taub = SPATIAL["taub_mag"].func(state, model, t)
    return jnp.where(speed > 1e-12, taub / jnp.maximum(speed, 1e-12), 0.0)


@spatial("vel_bc_mask", "", "Dirichlet boundary-condition mask for the "
         "membrane stress balance (1 = velocity held fixed)")
def _velbcmask(state, model, t):
    ssa = getattr(model, "ssa", None)
    if ssa is None or getattr(ssa, "bc_mask", None) is None:
        return _zeros2(state)
    return jnp.asarray(ssa.bc_mask, state.geometry.ice_thickness.dtype)


@spatial("u_bc", "m s-1", "x-component of the prescribed SSA Dirichlet "
         "boundary velocity")
def _ubc(state, model, t):
    ssa = getattr(model, "ssa", None)
    if ssa is None or getattr(ssa, "bc_u", None) is None:
        return _zeros2(state)
    return jnp.asarray(ssa.bc_u, state.geometry.ice_thickness.dtype)


@spatial("v_bc", "m s-1", "y-component of the prescribed SSA Dirichlet "
         "boundary velocity")
def _vbc(state, model, t):
    ssa = getattr(model, "ssa", None)
    if ssa is None or getattr(ssa, "bc_v", None) is None:
        return _zeros2(state)
    return jnp.asarray(ssa.bc_v, state.geometry.ice_thickness.dtype)


@spatial("no_model_mask", "", "regional-mode mask (1 = geometry and "
         "enthalpy held fixed; reference src/regional/)")
def _nomodelmask(state, model, t):
    if model.no_model_mask is None:
        return _zeros2(state)
    return jnp.asarray(model.no_model_mask,
                       state.geometry.ice_thickness.dtype)


@spatial("thk_bc_mask", "", "mask where ice thickness is held fixed "
         "(regional no-model strip)")
def _thkbcmask(state, model, t):
    return _nomodelmask(state, model, t)


# --------------------------------------------------------------------------
# hydrology mass budget (reference src/hydrology/Hydrology.cc registers
# subglacial_water_input_rate and the tendency_of_subglacial_water_mass_*
# family; the reference accumulates these over the step — here they are
# instantaneous rates from the current state, same physics)
# --------------------------------------------------------------------------

def _hydro_input_rate(state, model):
    """Total water input to the subglacial system [m/s water equivalent]:
    basal melt (ice equivalent * rho_i/rho_w)."""
    H = state.geometry.ice_thickness
    if state.basal_melt_rate is None:
        return jnp.zeros_like(H)
    hyd = model.hydrology
    rho_i = model.rho_i
    rho_w = getattr(hyd, "rho_w", 1000.0) if hyd is not None else 1000.0
    grounded = S.grounded_ice(state.geometry.cell_type)
    return jnp.where(grounded, state.basal_melt_rate * rho_i / rho_w, 0.0)


@spatial("subglacial_water_input_rate", "m s-1",
         "water input rate into the subglacial system (water equivalent)")
def _sgwir(state, model, t):
    return _hydro_input_rate(state, model)


@spatial("tendency_of_subglacial_water_mass_due_to_input", "kg m-2 s-1",
         "subglacial water mass gain due to basal-melt input")
def _tsw_input(state, model, t):
    hyd = model.hydrology
    rho_w = getattr(hyd, "rho_w", 1000.0) if hyd is not None else 1000.0
    return _hydro_input_rate(state, model) * rho_w


def _routing_face_fluxes(state, model):
    """Staggered lateral water fluxes q [m^2/s] of the routing model, or
    None if the active hydrology has no lateral transport."""
    hyd = model.hydrology
    W = state.hydro_W
    if W is None or hyd is None or not hasattr(hyd, "_face_gradients"):
        return None
    H = state.geometry.ice_thickness
    b = state.geometry.bed_elevation
    if state.hydro_P is not None:
        psi = hyd.rho_w * hyd.g * b + state.hydro_P
    else:
        psi = hyd.rho_w * hyd.g * b + hyd.rho_i * hyd.g * H
    dpx, dpy, gpe, gpn = hyd._face_gradients(psi)
    sh = hyd.sh
    We = jnp.where(dpx <= 0.0, W, sh(W, 0, 1))
    Wn = jnp.where(dpy <= 0.0, W, sh(W, 1, 0))
    qe = -hyd.k * We ** hyd.alpha * gpe ** (hyd.beta_exp - 2.0) * dpx
    qn = -hyd.k * Wn ** hyd.alpha * gpn ** (hyd.beta_exp - 2.0) * dpy
    return qe, qn


@spatial("tendency_of_subglacial_water_mass_due_to_flow", "kg m-2 s-1",
         "subglacial water mass change due to lateral flow (-div q)")
def _tsw_flow(state, model, t):
    from ..ops import stencils as st
    q = _routing_face_fluxes(state, model)
    if q is None:
        return _zeros2(state)
    hyd = model.hydrology
    div = st.div_staggered(q[0], q[1], model.grid.dx, model.grid.dy,
                           model.sh)
    return -div * hyd.rho_w


def _water_loss_mask(state, model, which):
    """Water-flux magnitude leaving through masked cell classes [kg/m^2/s]
    (the reference zeroes W outside the grounded domain each step and books
    the removal per boundary class)."""
    q = _routing_face_fluxes(state, model)
    if q is None:
        return _zeros2(state)
    hyd = model.hydrology
    sh = model.sh
    qe, qn = q
    mask = state.geometry.cell_type
    grounded = S.grounded_ice(mask)
    if which == "grounded_margins":
        target = (mask == S.MASK_ICE_FREE_BEDROCK) | (mask == S.MASK_ICE_FREE_OCEAN)
    elif which == "grounding_line":
        target = S.floating_ice(mask)
    else:
        return _zeros2(state)
    # outflow from grounded cells into target-class neighbors
    out_e = jnp.where(grounded & sh(target, 0, 1), jnp.maximum(qe, 0.0), 0.0)
    out_w = jnp.where(grounded & sh(target, 0, -1),
                      jnp.maximum(-sh(qe, 0, -1), 0.0), 0.0)
    out_n = jnp.where(grounded & sh(target, 1, 0), jnp.maximum(qn, 0.0), 0.0)
    out_s = jnp.where(grounded & sh(target, -1, 0),
                      jnp.maximum(-sh(qn, -1, 0), 0.0), 0.0)
    dx, dy = model.grid.dx, model.grid.dy
    return -hyd.rho_w * ((out_e + out_w) / dx + (out_n + out_s) / dy)


@spatial("tendency_of_subglacial_water_mass_at_grounded_margins",
         "kg m-2 s-1",
         "subglacial water mass loss at grounded ice margins")
def _tsw_margins(state, model, t):
    return _water_loss_mask(state, model, "grounded_margins")


@spatial("tendency_of_subglacial_water_mass_at_grounding_line",
         "kg m-2 s-1",
         "subglacial water mass loss across the grounding line")
def _tsw_gl(state, model, t):
    return _water_loss_mask(state, model, "grounding_line")


@spatial("tendency_of_subglacial_water_mass_at_domain_boundary",
         "kg m-2 s-1",
         "subglacial water mass loss at the computational domain boundary")
def _tsw_boundary(state, model, t):
    q = _routing_face_fluxes(state, model)
    if q is None:
        return _zeros2(state)
    hyd = model.hydrology
    qe, qn = q
    out = jnp.zeros_like(qe)
    dx, dy = model.grid.dx, model.grid.dy
    if not model.grid.periodic_x:
        out = out.at[:, -1].add(-jnp.maximum(qe[:, -1], 0.0) / dx)
        out = out.at[:, 0].add(-jnp.maximum(-qe[:, 0], 0.0) / dx)
    if not model.grid.periodic_y:
        out = out.at[-1, :].add(-jnp.maximum(qn[-1, :], 0.0) / dy)
        out = out.at[0, :].add(-jnp.maximum(-qn[0, :], 0.0) / dy)
    return out * hyd.rho_w


@spatial("tendency_of_subglacial_water_mass_due_to_conservation_error",
         "kg m-2 s-1",
         "subglacial water created by the non-negativity projection")
def _tsw_conserr(state, model, t):
    # the rebuild's routing update is conservative by construction (donor
    # limiting keeps W >= 0 without clipping), so this field is exactly 0;
    # registered for output parity with the reference
    return _zeros2(state)


@spatial("steady_state_hydraulic_potential", "Pa",
         "hydraulic potential of the steady-state discharge model")
def _steady_psi(state, model, t):
    g = state.geometry
    H = g.ice_thickness
    hyd = model.hydrology
    if hyd is None:
        return _zeros2(state)
    rho_w = getattr(hyd, "rho_w", 1000.0)
    gacc = getattr(hyd, "g", 9.81)
    return rho_w * gacc * g.bed_elevation + model.rho_i * gacc * H


# --------------------------------------------------------------------------
# effective coupler inputs (reference registers effective_* fields in the
# surface/ocean Initialization wrappers: what the ice actually sees after
# the full modifier chain)
# --------------------------------------------------------------------------

@spatial("effective_air_temp", "K",
         "near-surface air temperature after the full modifier chain")
def _eff_airtemp(state, model, t):
    atm = _atmosphere_of(model)
    if atm is None:
        return _zeros2(state)
    return atm(state.geometry, t).temperature


@spatial("effective_precipitation", "kg m-2 s-1",
         "precipitation after the full modifier chain")
def _eff_precip(state, model, t):
    atm = _atmosphere_of(model)
    if atm is None:
        return _zeros2(state)
    rho_w = 1000.0
    return atm(state.geometry, t).precipitation * rho_w


@spatial("effective_ice_surface_temp", "K",
         "ice surface temperature delivered to the energy model")
def _eff_ist(state, model, t):
    surf = getattr(model, "surface", None)
    if surf is None:
        return _zeros2(state)
    return surf(state.geometry, t).temperature


@spatial("effective_climatic_mass_balance", "kg m-2 s-1",
         "surface mass balance delivered to the mass-continuity step")
def _eff_cmb(state, model, t):
    surf = getattr(model, "surface", None)
    if surf is None:
        return _zeros2(state)
    return surf(state.geometry, t).smb * model.rho_i


@spatial("effective_shelf_base_temperature", "K",
         "shelf-base temperature delivered to the energy model")
def _eff_sbt(state, model, t):
    return SPATIAL["shelfbtemp"].func(state, model, t)


@spatial("effective_shelf_base_mass_flux", "kg m-2 s-1",
         "sub-shelf mass flux delivered to the mass-continuity step")
def _eff_sbmf(state, model, t):
    return SPATIAL["shelfbmassflux"].func(state, model, t)


@spatial("air_temp_mean_july", "K", "mean July (summer) near-surface air "
         "temperature (SeaRISE convention)")
def _airtemp_july(state, model, t):
    atm = _atmosphere_of(model)
    if atm is None:
        return _zeros2(state)
    out = atm(state.geometry, t)
    tj = getattr(out, "temperature_july", None)
    if tj is None:
        return out.temperature
    return tj


@spatial("atmosphere_transmissivity", "1",
         "dEBM-simple atmosphere transmissivity for shortwave radiation")
def _transmissivity(state, model, t):
    surf = _debm_model(model)
    if surf is None:
        return _zeros2(state)
    g = state.geometry
    dtype = g.ice_thickness.dtype
    # tau_a = a + b * z (dEBM-simple, Zeitz et al. 2021)
    a = getattr(surf, "tau_a_intercept", 0.65)
    b = getattr(surf, "tau_a_slope", 3.2e-5)
    return a + b * g.ice_surface_elevation.astype(dtype)


@spatial("surface_layer_thickness", "m",
         "thickness of the surface (snow + firn) layer, ice equivalent")
def _surf_layer_thk(state, model, t):
    snow = state.snow_depth if state.snow_depth is not None else _zeros2(state)
    firn = state.firn_depth if state.firn_depth is not None else _zeros2(state)
    return snow + firn


@spatial("surface_layer_mass", "kg",
         "mass of the surface (snow + firn) layer per cell")
def _surf_layer_mass(state, model, t):
    return _surf_layer_thk(state, model, t) * model.rho_i \
        * model.grid.cell_area()


@spatial("ice_surface_liquid_water_fraction", "1",
         "liquid water fraction at the ice surface")
def _surf_liqfrac(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros_like(H)
    EC = model.EC
    return EC.water_fraction(state.enthalpy[..., -1],
                             jnp.zeros_like(H))


# --------------------------------------------------------------------------
# ocean inputs / melange back pressure
# --------------------------------------------------------------------------

def _given_th(model):
    from ..coupler.ocean import GivenTH
    if model.ocean is None:
        return None
    return _find_coupler(model.ocean, GivenTH)


@spatial("theta_ocean", "K", "ambient ocean potential temperature input")
def _theta_ocean(state, model, t):
    m = _given_th(model)
    if m is not None:
        dtype = state.geometry.ice_thickness.dtype
        return jnp.broadcast_to(m._slice(m.theta_ocean, t, dtype),
                                state.geometry.ice_thickness.shape)
    from ..coupler.pico import Pico
    p = _find_coupler(model.ocean, Pico) if model.ocean is not None else None
    if p is not None:
        return jnp.broadcast_to(
            jnp.asarray(p.temperature_ocean,
                        state.geometry.ice_thickness.dtype),
            state.geometry.ice_thickness.shape)
    return _zeros2(state)


@spatial("salinity_ocean", "g kg-1", "ambient ocean salinity input")
def _salinity_ocean(state, model, t):
    m = _given_th(model)
    if m is not None:
        dtype = state.geometry.ice_thickness.dtype
        return jnp.broadcast_to(m._slice(m.salinity_ocean, t, dtype),
                                state.geometry.ice_thickness.shape)
    from ..coupler.pico import Pico
    p = _find_coupler(model.ocean, Pico) if model.ocean is not None else None
    if p is not None:
        return jnp.broadcast_to(
            jnp.asarray(p.salinity_ocean,
                        state.geometry.ice_thickness.dtype),
            state.geometry.ice_thickness.shape)
    return _zeros2(state)


@spatial("melange_back_pressure_fraction", "1",
         "melange back pressure as a fraction of the hydrostatic "
         "water-column pressure at the calving front")
def _melange_frac(state, model, t):
    if model.ocean is None:
        return _zeros2(state)
    from ..coupler.ocean import hydrostatic_water_column_pressure
    Pw = model.ocean.water_column_pressure(state.geometry, t)
    if Pw is None:
        return _zeros2(state)
    P0 = hydrostatic_water_column_pressure(state.geometry,
                                           rho_i=model.rho_i,
                                           rho_w=model.rho_w)
    return jnp.where(P0 > 0, Pw / jnp.maximum(P0, 1e-30) - 1.0, 0.0)


@spatial("average_water_column_pressure", "Pa",
         "vertically-averaged water-column pressure at the ice base")
def _avg_wcp(state, model, t):
    from ..coupler.ocean import hydrostatic_water_column_pressure
    if model.ocean is not None:
        Pw = model.ocean.water_column_pressure(state.geometry, t)
        if Pw is not None:
            return Pw
    return hydrostatic_water_column_pressure(state.geometry,
                                             rho_i=model.rho_i,
                                             rho_w=model.rho_w)


# --------------------------------------------------------------------------
# calving thresholds / total rate
# --------------------------------------------------------------------------

@spatial("calving_threshold", "m",
         "thickness-calving threshold field")
def _calv_thresh(state, model, t):
    c = getattr(model, "calving", None)
    H = state.geometry.ice_thickness
    if c is None or "thickness_calving" not in getattr(c, "methods", ()):
        return jnp.zeros_like(H)
    return jnp.full_like(H, c.H_threshold)


@spatial("vonmises_calving_threshold", "Pa",
         "von Mises calving stress threshold sigma_max")
def _vm_thresh(state, model, t):
    c = getattr(model, "calving", None)
    H = state.geometry.ice_thickness
    if c is None or "vonmises_calving" not in getattr(c, "methods", ()):
        return jnp.zeros_like(H)
    return jnp.full_like(H, c.vm_sigma_max)


@spatial("calving_rate", "m s-1",
         "total horizontal calving rate (all active laws)")
def _calving_rate_total(state, model, t):
    out = _zeros2(state)
    for name in ("eigen_calving_rate", "vonmises_calving_rate",
                 "hayhurst_calving_rate"):
        out = out + SPATIAL[name].func(state, model, t)
    return out


# --------------------------------------------------------------------------
# bed deformation parts
# --------------------------------------------------------------------------

@spatial("elastic_bed_displacement", "m",
         "elastic (flexural plate) part of the bed displacement")
def _elastic_bed(state, model, t):
    bd = getattr(model, "bed_deformation", None)
    g = state.geometry
    if (bd is None or state.bed_reference is None
            or not getattr(bd, "include_elastic", False)):
        return _zeros2(state)
    total = g.bed_elevation - state.bed_reference
    viscous = state.bed_uplift if state.bed_uplift is not None \
        else jnp.zeros_like(total)
    return total - viscous


@spatial("bed_def_load", "Pa", "load applied to the bed (ice overburden "
         "plus ocean column where floating)")
def _bed_load(state, model, t):
    g = state.geometry
    gacc = model.config.get_number("constants.standard_gravity") \
        if model.config is not None else 9.81
    H_load = g.ice_thickness * g.cell_grounded_fraction \
        if g.cell_grounded_fraction is not None else g.ice_thickness
    depth = jnp.maximum(g.sea_level - g.bed_elevation, 0.0)
    ocean = (~S.grounded_ice(g.cell_type)) & (g.bed_elevation < g.sea_level)
    return jnp.where(ocean, model.rho_w * gacc * depth,
                     model.rho_i * gacc * H_load)


# --------------------------------------------------------------------------
# fracture-density suite (reference src/fracturedensity/FractureDensity.cc
# registers fracture_density, fracture_age, fracture_flow_enhancement,
# fracture_growth_rate, fracture_healing_rate, fracture_toughness)
# --------------------------------------------------------------------------

@spatial("fracture_age", "s", "age of the fractures")
def _frac_age(state, model, t):
    fa = getattr(state, "fracture_age", None)
    if fa is None:
        return _zeros2(state)
    return fa


@spatial("fracture_flow_enhancement", "1",
         "flow enhancement from fracture-induced softening")
def _frac_enh(state, model, t):
    f = getattr(model, "fracture", None)
    if f is None or state.fracture_density is None:
        return jnp.ones_like(state.geometry.ice_thickness)
    return f.flow_enhancement(state.fracture_density)


@spatial("fracture_growth_rate", "s-1",
         "fracture density growth rate at the current strain rate")
def _frac_growth(state, model, t):
    f = getattr(model, "fracture", None)
    H = state.geometry.ice_thickness
    if f is None or state.u_ssa is None:
        return jnp.zeros_like(H)
    eps = f._effective_strain_rate(state.u_ssa, state.v_ssa)
    phi = state.fracture_density if state.fracture_density is not None \
        else jnp.zeros_like(H)
    return f.gamma * (1.0 - phi) * jnp.maximum(eps - f.eps_cr, 0.0)


@spatial("fracture_healing_rate", "s-1",
         "fracture density healing rate at the current strain rate")
def _frac_heal(state, model, t):
    f = getattr(model, "fracture", None)
    H = state.geometry.ice_thickness
    if f is None or state.u_ssa is None:
        return jnp.zeros_like(H)
    eps = f._effective_strain_rate(state.u_ssa, state.v_ssa)
    phi = state.fracture_density if state.fracture_density is not None \
        else jnp.zeros_like(H)
    return f.gamma_h * phi * jnp.maximum(f.eps_h - eps, 0.0)


@spatial("fracture_toughness", "Pa",
         "fracture-softened effective hardness of the vertically-averaged "
         "ice column")
def _frac_tough(state, model, t):
    hardav = SPATIAL["hardav"].func(state, model, t)
    enh = _frac_enh(state, model, t)
    n = 3.0
    return hardav * enh ** (-1.0 / n)


# --------------------------------------------------------------------------
# ISMIP6 output-variable set (reference src/icemodel/diagnostics.cc
# registers these CMIP names when output.ISMIP6 is set)
# --------------------------------------------------------------------------

alias("lithk", "thk", long_name="land ice thickness (ISMIP6)")
alias("orog", "usurf", long_name="surface altitude (ISMIP6)")
alias("dlithkdt", "dHdt", long_name="ice thickness tendency (ISMIP6)")
alias("xvelsurf", "uvelsurf")
alias("yvelsurf", "vvelsurf")
alias("zvelsurf", "wvelsurf")
alias("xvelbase", "uvelbase")
alias("yvelbase", "vvelbase")
alias("zvelbase", "wvelbase")
alias("xvelmean", "ubar")
alias("yvelmean", "vbar")
alias("strbasemag", "taub_mag",
      long_name="magnitude of basal drag (ISMIP6)")
alias("acabf", "climatic_mass_balance",
      long_name="surface mass balance flux (ISMIP6)")
alias("litemptop", "tempsurf",
      long_name="temperature at the top ice surface (ISMIP6)")


@spatial("base", "m", "ice lower surface elevation (ISMIP6)",
         "base_altitude")
def _base_elev(state, model, t):
    g = state.geometry
    return g.ice_surface_elevation - g.ice_thickness


@spatial("hfgeoubed", "W m-2", "upward geothermal heat flux at the bed "
         "(ISMIP6)", "upward_geothermal_heat_flux_at_ground_level")
def _hfgeoubed(state, model, t):
    return SPATIAL["bheatflx"].func(state, model, t)


@spatial("libmassbfgr", "kg m-2 s-1",
         "basal mass balance flux under grounded ice (ISMIP6)")
def _libmassbfgr(state, model, t):
    bmb = SPATIAL["bmelt"].func(state, model, t) * model.rho_i
    return jnp.where(S.grounded_ice(state.geometry.cell_type), -bmb, 0.0)


@spatial("libmassbffl", "kg m-2 s-1",
         "basal mass balance flux under floating ice (ISMIP6)")
def _libmassbffl(state, model, t):
    melt = SPATIAL["shelfbmassflux"].func(state, model, t)
    return jnp.where(S.floating_ice(state.geometry.cell_type), -melt, 0.0)


@spatial("litempbotgr", "K",
         "basal temperature under grounded ice (ISMIP6)")
def _litempbotgr(state, model, t):
    Tb = SPATIAL["tempbase"].func(state, model, t)
    return jnp.where(S.grounded_ice(state.geometry.cell_type), Tb, 0.0)


@spatial("litempbotfl", "K",
         "basal temperature under floating ice (ISMIP6)")
def _litempbotfl(state, model, t):
    Tb = SPATIAL["tempbase"].func(state, model, t)
    return jnp.where(S.floating_ice(state.geometry.cell_type), Tb, 0.0)


@spatial("licalvf", "kg m-2 s-1", "calving flux (ISMIP6)",
         "land_ice_specific_mass_flux_due_to_calving")
def _licalvf(state, model, t):
    H = state.geometry.ice_thickness
    return -_calving_rate_total(state, model, t) * model.rho_i \
        * jnp.where(H > 0, 1.0, 0.0)


@spatial("lifmassbf", "kg m-2 s-1",
         "ice front melt and calving flux (ISMIP6)")
def _lifmassbf(state, model, t):
    fm = SPATIAL["frontal_melt_rate"].func(state, model, t)
    return _licalvf(state, model, t) - fm * model.rho_i


@spatial("ligroundf", "kg m-2 s-1", "grounding line flux (ISMIP6)",
         "land_ice_specific_mass_flux_at_grounding_line")
def _ligroundf(state, model, t):
    return SPATIAL["grounding_line_flux"].func(state, model, t)


# --------------------------------------------------------------------------
# additional scalar time series (reference ts_diagnostics: the full
# ice_mass/volume/area/enthalpy breakdown + ISMIP6 scalar set)
# --------------------------------------------------------------------------

def _icy_mask(state):
    return S.icy(state.geometry.cell_type)


def _cell_area_of(model):
    return model.grid.cell_area()


@scalar("ice_area", "m2", "total area covered by ice")
def _s_ice_area(state, model, t):
    return jnp.sum(_icy_mask(state)) * _cell_area_of(model)


@scalar("ice_area_cold_base", "m2", "area of icy cells with a cold base")
def _s_area_cold(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.sum(_icy_mask(state)) * _cell_area_of(model)
    EC = model.EC
    E_base = state.enthalpy[..., 0]
    p = EC.pressure(H)
    cold = E_base < EC.enthalpy_cts(p)
    return jnp.sum(_icy_mask(state) & cold) * _cell_area_of(model)


@scalar("ice_area_temperate_base", "m2",
        "area of icy cells with a temperate base")
def _s_area_temp(state, model, t):
    total = jnp.sum(_icy_mask(state)) * _cell_area_of(model)
    return total - _s_area_cold(state, model, t)


@scalar("ice_enthalpy_glacierized", "J",
        "total ice enthalpy in glacierized areas (thk > 10 m)")
def _s_enth_glac(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros(())
    z = jnp.asarray(model.grid.z, H.dtype)
    dz = jnp.diff(z)
    Emid = 0.5 * (state.enthalpy[..., 1:] + state.enthalpy[..., :-1])
    inside = (0.5 * (z[1:] + z[:-1]))[None, None, :] < H[..., None]
    glac = (H > 10.0)[..., None]
    vol_per = dz[None, None, :] * _cell_area_of(model)
    return jnp.sum(jnp.where(inside & glac, Emid * vol_per, 0.0)) \
        * model.rho_i


def _volume_where(state, model, which):
    """Glacierized cold/temperate ice volume split."""
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros(())
    EC = model.EC
    z = jnp.asarray(model.grid.z, H.dtype)
    dz = jnp.diff(z)
    zmid = (0.5 * (z[1:] + z[:-1]))[None, None, :]
    inside = zmid < H[..., None]
    glac = (H > 10.0)[..., None]
    gacc = model.config.get_number("constants.standard_gravity") \
        if model.config is not None else 9.81
    p = jnp.maximum(model.rho_i * gacc * (H[..., None] - zmid), 0.0)
    Emid = 0.5 * (state.enthalpy[..., 1:] + state.enthalpy[..., :-1])
    cts = EC.enthalpy_cts(p)
    sel = (Emid < cts) if which == "cold" else (Emid >= cts)
    vol_per = dz[None, None, :] * _cell_area_of(model)
    return jnp.sum(jnp.where(inside & glac & sel, vol_per, 0.0))


@scalar("ice_volume_glacierized_cold", "m3",
        "volume of cold ice in glacierized areas")
def _s_vol_glac_cold(state, model, t):
    return _volume_where(state, model, "cold")


@scalar("ice_volume_glacierized_temperate", "m3",
        "volume of temperate ice in glacierized areas")
def _s_vol_glac_temp(state, model, t):
    return _volume_where(state, model, "temperate")


def _surface_budget_total(state, model, t, which):
    """Area-integrated surface budget component [kg/s]."""
    f = _surface_budget(state, model, t, which)
    return jnp.sum(jnp.where(_icy_mask(state), f, 0.0)) \
        * _cell_area_of(model)


@scalar("surface_accumulation_rate", "kg s-1",
        "total surface accumulation over icy cells")
def _s_accum_rate(state, model, t):
    return _surface_budget_total(state, model, t, "accumulation")


@scalar("surface_melt_rate", "kg s-1",
        "total surface melt over icy cells")
def _s_melt_rate(state, model, t):
    return _surface_budget_total(state, model, t, "melt")


@scalar("surface_runoff_rate", "kg s-1",
        "total surface runoff over icy cells")
def _s_runoff_rate(state, model, t):
    return _surface_budget_total(state, model, t, "runoff")


@scalar("basal_mass_flux", "kg s-1",
        "total basal mass flux (grounded + floating)")
def _s_bmf_total(state, model, t):
    return SCALAR["basal_mass_flux_grounded"].func(state, model, t) \
        + SCALAR["basal_mass_flux_floating"].func(state, model, t)


scalar_alias("lim", "ice_mass", long_name="total land ice mass (ISMIP6)")
scalar_alias("slvol", "sea_level_rise_potential")
scalar_alias("max_horizontal_velocity", "max_hor_vel")


@scalar("iareagr", "m2", "area covered by grounded ice (ISMIP6)",
        "grounded_ice_sheet_area")
def _s_iareagr(state, model, t):
    return SCALAR["ice_area_glacierized_grounded"].func(state, model, t)


@scalar("iareafl", "m2", "area covered by floating ice (ISMIP6)",
        "floating_ice_shelf_area")
def _s_iareafl(state, model, t):
    return SCALAR["ice_area_glacierized_floating"].func(state, model, t)


@scalar("subglacial_water_mass", "kg",
        "total mass of transportable subglacial water")
def _s_sgw_mass(state, model, t):
    W = state.hydro_W
    if W is None:
        return jnp.zeros(())
    hyd = model.hydrology
    rho_w = getattr(hyd, "rho_w", 1000.0) if hyd is not None else 1000.0
    return jnp.sum(W) * _cell_area_of(model) * rho_w


@scalar("till_water_mass", "kg", "total mass of till-stored water")
def _s_till_mass(state, model, t):
    W = state.tillwat
    if W is None:
        return jnp.zeros(())
    hyd = model.hydrology
    rho_w = getattr(hyd, "rho_w", 1000.0) if hyd is not None else 1000.0
    return jnp.sum(W) * _cell_area_of(model) * rho_w


# ISMIP6 scalar tendencies are the existing window rates under CMIP names
rate_alias("tendacabf", "tendency_of_ice_mass_due_to_surface_mass_flux",
           long_name="total surface mass balance flux (ISMIP6)")
rate_alias("tendlibmassbf", "tendency_of_ice_mass_due_to_basal_mass_flux",
           long_name="total basal mass balance flux (ISMIP6)")
rate_alias("tendlicalvf", "tendency_of_ice_mass_due_to_calving",
           long_name="total calving flux (ISMIP6)")
rate_alias("tendlifmassbf", "tendency_of_ice_mass_due_to_discharge",
           long_name="total calving and frontal melt flux (ISMIP6)")


# volume counterparts of the per-mechanism discharge rates (the reference
# registers both the mass and volume form of every tendency)
def _vol_rate_from_mass(name):
    mass = RATE[name]

    def f(window):
        return mass.func(window) / window.rho_i
    return f


for _m, _v in (("tendency_of_ice_mass_due_to_frontal_melt",
                "tendency_of_ice_volume_due_to_frontal_melt"),
               ("tendency_of_ice_mass_due_to_forced_retreat",
                "tendency_of_ice_volume_due_to_forced_retreat")):
    RATE[_v] = Diagnostic(_vol_rate_from_mass(_m), "m3 s-1",
                          RATE[_m].long_name.replace("mass", "volume"))


# --------------------------------------------------------------------------
# remaining parity singles
# --------------------------------------------------------------------------

@spatial("pico_basin_mask", "", "PICO drainage basin index")
def _pico_basin(state, model, t):
    from .diagnostics import _pico
    p = _pico(model)
    if p is None or p.basin_mask is None:
        return _zeros2(state)
    return jnp.asarray(p.basin_mask, state.geometry.ice_thickness.dtype)


@spatial("basal_melt_rate_grounded", "m s-1",
         "basal melt rate under grounded ice (ice equivalent)")
def _bmelt_grounded(state, model, t):
    bmelt = SPATIAL["bmelt"].func(state, model, t)
    return jnp.where(S.grounded_ice(state.geometry.cell_type), bmelt, 0.0)


@spatial("ocean_kill_mask", "",
         "fixed calving mask (all ice calves in these cells)")
def _okill_mask(state, model, t):
    c = getattr(model, "calving", None)
    if c is None or getattr(c, "ocean_kill_mask", None) is None:
        return _zeros2(state)
    return jnp.asarray(c.ocean_kill_mask,
                       state.geometry.ice_thickness.dtype)


@spatial("isochronal_layer_thickness", "m",
         "thickness of each isochronal layer (z axis = layer index)")
def _iso_layers(state, model, t):
    if state.iso_layers is None:
        return _zeros2(state)
    return state.iso_layers


@spatial("thkstore", "m", "regional mode: stored reference ice thickness "
         "in the no-model strip")
def _thkstore(state, model, t):
    ref = getattr(model, "_nmm_ref", None)
    if ref is None:
        return _zeros2(state)
    return ref[0]


@spatial("usurfstore", "m", "regional mode: stored reference surface "
         "elevation in the no-model strip")
def _usurfstore(state, model, t):
    ref = getattr(model, "_nmm_ref", None)
    if ref is None:
        return _zeros2(state)
    return jnp.maximum(ref[0] + state.geometry.bed_elevation,
                       state.geometry.bed_elevation)


# --------------------------------------------------------------------------
# force-to-thickness surface modifier fields (reference
# ``src/coupler/surface/ForceThickness.cc`` diagnostics: ftt_mask,
# ftt_target_thk)
# --------------------------------------------------------------------------

def _ftt_of(model):
    from ..coupler.surface import ForceThickness
    return _find_coupler(getattr(model, "surface", None), ForceThickness)


@spatial("ftt_mask", "", "mask of cells where -surface ...,forcing nudges "
         "the SMB toward the target thickness")
def _ftt_mask(state, model, t):
    f = _ftt_of(model)
    if f is None:
        return _zeros2(state)
    Ht = jnp.asarray(f.target_thickness)
    return (Ht > 1.0).astype(state.geometry.ice_thickness.dtype)


@spatial("ftt_target_thk", "m",
         "target ice thickness of the -surface ...,forcing modifier")
def _ftt_target(state, model, t):
    f = _ftt_of(model)
    if f is None:
        return _zeros2(state)
    return jnp.asarray(f.target_thickness,
                       state.geometry.ice_thickness.dtype)


@spatial("climatic_mass_balance_original", "kg m-2 s-1",
         "surface mass balance before the -surface ...,forcing "
         "(force-to-thickness) adjustment; instantaneous climatology of the "
         "inner chain at time t (stateful PDD/dEBM inner models report their "
         "climatology, not the window-integrated SMB); equals the effective "
         "SMB when -surface ...,forcing is not used")
def _ftt_original_smb(state, model, t):
    # reference ``src/coupler/surface/ForceThickness.cc``: the inner
    # chain's SMB, i.e. what the run would apply without the nudging term
    f = _ftt_of(model)
    if f is None:
        return SPATIAL["effective_climatic_mass_balance"].func(
            state, model, t)
    return f.inner(state.geometry, t).smb * model.rho_i


# --------------------------------------------------------------------------
# remaining plain coupler-output names (reference registers both the
# coupler's own output fields and the effective_* copies saved by the
# Initialization wrappers; in this design both evaluate the modifier chain)
# --------------------------------------------------------------------------

@spatial("ice_surface_temp", "K",
         "temperature of the ice at the ice surface but below firn")
def _plain_ist(state, model, t):
    surf = getattr(model, "surface", None)
    if surf is None:
        return _zeros2(state)
    return surf(state.geometry, t).temperature


alias("air_temp_mean_summer", "air_temp_mean_july",
      long_name="mean summer near-surface air temperature")


@scalar("proc_ice_area", "m2",
        "ice area computed by this process/device (reference: per-rank "
        "ice area used to diagnose load balance)")
def _proc_ice_area(state, model, t):
    icy = S.icy(state.geometry.cell_type)
    return jnp.sum(icy) * model.grid.dx * model.grid.dy
