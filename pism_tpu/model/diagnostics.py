"""Diagnostics registry.

Rebuild of PISM ``src/util/Diagnostic.cc`` + the per-component diagnostic
dictionaries (hundreds of derived quantities; SURVEY.md §2.1): a registry of
pure functions ``(state, model, t) -> array`` with CF metadata, plus scalar
time-series diagnostics (PISM ``TSDiagnostic``: ice volume/area/fluxes).

Spatial diagnostics return (My, Mx) or (My, Mx, Mz) arrays; scalars return
0-d arrays. All are trace-safe jnp expressions, so they can be computed
on-device and fetched at output time.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple

import jax.numpy as jnp
import numpy as np

from .. import state as S
from ..util.units import SEC_PER_YEAR


class Diagnostic(NamedTuple):
    func: Callable            # (state, model, t) -> array
    units: str
    long_name: str
    standard_name: str = ""


SPATIAL: Dict[str, Diagnostic] = {}
SCALAR: Dict[str, Diagnostic] = {}


def spatial(name, units, long_name, standard_name=""):
    def deco(fn):
        SPATIAL[name] = Diagnostic(fn, units, long_name, standard_name)
        return fn
    return deco


def scalar(name, units, long_name, standard_name=""):
    def deco(fn):
        SCALAR[name] = Diagnostic(fn, units, long_name, standard_name)
        return fn
    return deco


# --------------------------------------------------------------------------
# spatial diagnostics (PISM names)
# --------------------------------------------------------------------------

@spatial("thk", "m", "land ice thickness", "land_ice_thickness")
def _thk(state, model, t):
    return state.geometry.ice_thickness


@spatial("usurf", "m", "ice upper surface elevation", "surface_altitude")
def _usurf(state, model, t):
    return state.geometry.ice_surface_elevation


@spatial("topg", "m", "bedrock surface elevation", "bedrock_altitude")
def _topg(state, model, t):
    return state.geometry.bed_elevation


@spatial("mask", "", "ice-type mask (0=ice-free land,2=grounded,3=floating,4=ocean)")
def _mask(state, model, t):
    return state.geometry.cell_type


@spatial("velbar_mag", "m s-1", "magnitude of vertically-integrated horizontal velocity")
def _velbar(state, model, t):
    u = state.u_ssa if state.u_ssa is not None else jnp.zeros_like(
        state.geometry.ice_thickness)
    v = state.v_ssa if state.v_ssa is not None else jnp.zeros_like(u)
    return jnp.sqrt(u ** 2 + v ** 2)


@spatial("velsurf_mag", "m s-1", "magnitude of horizontal surface velocity")
def _velsurf(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return jnp.sqrt(sb.sia3.u[..., -1] ** 2 + sb.sia3.v[..., -1] ** 2)
    return _velbar(state, model, t)


@spatial("bmelt", "m s-1", "basal melt rate (ice equivalent)",
         "land_ice_basal_melt_rate")
def _bmelt(state, model, t):
    H = state.geometry.ice_thickness
    return state.basal_melt_rate if state.basal_melt_rate is not None \
        else jnp.zeros_like(H)


@spatial("tillwat", "m", "effective thickness of subglacial till water")
def _tillwat(state, model, t):
    H = state.geometry.ice_thickness
    return state.tillwat if state.tillwat is not None else jnp.zeros_like(H)


@spatial("temppabase", "K", "pressure-adjusted basal temperature")
def _temppabase(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros_like(H)
    EC = model.EC
    p = EC.pressure(H)
    return EC.pressure_adjusted_temperature(state.enthalpy[..., 0], p)


@spatial("liqfrac_base", "1", "liquid water fraction at the ice base")
def _liqfrac(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros_like(H)
    EC = model.EC
    return EC.water_fraction(state.enthalpy[..., 0], EC.pressure(H))


@spatial("taud_mag", "Pa", "magnitude of the gravitational driving stress")
def _taud(state, model, t):
    from ..ops import stencils as st
    g = state.geometry
    sx, sy = st.centered_grad(g.ice_surface_elevation, model.grid.dx,
                              model.grid.dy, model.sh)
    f = model.rho_i * 9.81 * g.ice_thickness
    return f * jnp.sqrt(sx ** 2 + sy ** 2)


@spatial("diffusivity", "m2 s-1", "SIA diffusivity (staggered max)")
def _diff(state, model, t):
    sb = _sb(state, model, t)
    return jnp.maximum(sb.qe * 0 + sb.max_diffusivity, 0.0)


@spatial("velbase_mag", "m s-1", "magnitude of basal horizontal velocity")
def _velbase(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return jnp.sqrt(sb.sia3.u[..., 0] ** 2 + sb.sia3.v[..., 0] ** 2)
    return _velbar(state, model, t)


@spatial("uvelsurf", "m s-1", "x-component of surface velocity")
def _usurfvel(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return sb.sia3.u[..., -1]
    return sb.u_base


@spatial("vvelsurf", "m s-1", "y-component of surface velocity")
def _vsurfvel(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return sb.sia3.v[..., -1]
    return sb.v_base


@spatial("wvelsurf", "m s-1", "vertical velocity at the ice surface")
def _wsurfvel(state, model, t):
    sb = _sb(state, model, t)
    H = state.geometry.ice_thickness
    return sb.sia3.w[..., -1] if sb.sia3 is not None else jnp.zeros_like(H)


@spatial("tauc", "Pa", "basal yield stress")
def _tauc(state, model, t):
    H = state.geometry.ice_thickness
    if model.yield_stress is None:
        return jnp.zeros_like(H)
    return model.yield_stress.compute(state)


@spatial("taub_mag", "Pa", "magnitude of basal shear stress")
def _taub(state, model, t):
    H = state.geometry.ice_thickness
    if model.yield_stress is None or model.ssa is None:
        return jnp.zeros_like(H)
    tau_c = model.yield_stress.compute(state)
    u = state.u_ssa if state.u_ssa is not None else jnp.zeros_like(H)
    v = state.v_ssa if state.v_ssa is not None else jnp.zeros_like(H)
    beta = model.ssa.sliding_law.beta(tau_c, u, v)
    return beta * jnp.sqrt(u ** 2 + v ** 2)


@spatial("temp_base", "K", "ice temperature at the base")
def _tempbase(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros_like(H)
    EC = model.EC
    return EC.temperature(state.enthalpy[..., 0], EC.pressure(H))


@spatial("temp_surf", "K", "ice temperature at the surface layer")
def _tempsurf(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros_like(H)
    return model.EC.temperature(state.enthalpy[..., -1], model.EC.pressure(0.0))


@spatial("hardav", "Pa s0.333333", "vertical average of ice hardness")
def _hardav(state, model, t):
    H = state.geometry.ice_thickness
    law = model.stress_balance.sia_flow_law
    if law is None or state.enthalpy is None:
        return jnp.zeros_like(H)
    return law.averaged_hardness(H, state.enthalpy,
                                 jnp.asarray(model.grid.z, H.dtype))


@spatial("surface_mass_balance", "m s-1", "surface mass balance (ice equivalent)",
         "land_ice_surface_specific_mass_balance_flux")
def _smb_diag(state, model, t):
    return model.surface(state.geometry, t).smb


@spatial("ice_surface_temp", "K", "ice surface temperature boundary value")
def _stemp_diag(state, model, t):
    return model.surface(state.geometry, t).temperature


@spatial("dHdt", "m s-1", "instantaneous thickness tendency (-div Q + SMB)")
def _dhdt(state, model, t):
    from . import geometry_evolution as ge
    sb = _sb(state, model, t)
    qe_adv, qn_adv = ge.advective_flux(sb.u_face_e, sb.v_face_n,
                                       state.geometry.ice_thickness, model.sh)
    div = (sb.qe + qe_adv - model.sh(sb.qe + qe_adv, 0, -1)) / model.grid.dx \
        + (sb.qn + qn_adv - model.sh(sb.qn + qn_adv, -1, 0)) / model.grid.dy
    return model.surface(state.geometry, t).smb - div


@spatial("cell_grounded_fraction", "1", "sub-grid grounded area fraction")
def _gf(state, model, t):
    return state.geometry.cell_grounded_fraction


@spatial("sea_level", "m", "sea level elevation")
def _sl(state, model, t):
    return state.geometry.sea_level


@spatial("bwat", "m", "transportable subglacial water thickness")
def _bwat(state, model, t):
    H = state.geometry.ice_thickness
    return state.hydro_W if state.hydro_W is not None else jnp.zeros_like(H)


def _zeros2(state):
    return jnp.zeros_like(state.geometry.ice_thickness)



def _sb(state, model, t=None):
    """Memoized composite stress-balance solve for diagnostics: computing a
    full -extra_vars set would otherwise re-run the (expensive) SSA/SIA
    solve once per velocity-derived field. Keyed on the state object
    identity (diagnostics run host-side at output time)."""
    key = id(state)
    cached = getattr(model, "_diag_sb_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    res = model.stress_balance.update(state, t=t)
    model._diag_sb_cache = (key, res)
    return res

def _strain_eigenvalues(state, model):
    """Principal values of the horizontal strain-rate tensor from the SSA
    velocity (PISM ``strain_rates`` diagnostic / eigencalving input)."""
    H = state.geometry.ice_thickness
    u = state.u_ssa if state.u_ssa is not None else jnp.zeros_like(H)
    v = state.v_ssa if state.v_ssa is not None else jnp.zeros_like(H)
    sh, dx, dy = model.sh, model.grid.dx, model.grid.dy
    ux = (sh(u, 0, 1) - sh(u, 0, -1)) / (2 * dx)
    uy = (sh(u, 1, 0) - sh(u, -1, 0)) / (2 * dy)
    vx = (sh(v, 0, 1) - sh(v, 0, -1)) / (2 * dx)
    vy = (sh(v, 1, 0) - sh(v, -1, 0)) / (2 * dy)
    exy = 0.5 * (uy + vx)
    tr = 0.5 * (ux + vy)
    det = jnp.sqrt(jnp.maximum((0.5 * (ux - vy)) ** 2 + exy ** 2, 0.0))
    return tr + det, tr - det


@spatial("ubar", "m s-1", "x-component of vertically-integrated velocity")
def _ubar(state, model, t):
    return state.u_ssa if state.u_ssa is not None else _zeros2(state)


@spatial("vbar", "m s-1", "y-component of vertically-integrated velocity")
def _vbar(state, model, t):
    return state.v_ssa if state.v_ssa is not None else _zeros2(state)


@spatial("uvelbase", "m s-1", "x-component of basal velocity")
def _uvelbase(state, model, t):
    sb = _sb(state, model, t)
    return sb.sia3.u[..., 0] if sb.sia3 is not None else sb.u_base


@spatial("vvelbase", "m s-1", "y-component of basal velocity")
def _vvelbase(state, model, t):
    sb = _sb(state, model, t)
    return sb.sia3.v[..., 0] if sb.sia3 is not None else sb.v_base


@spatial("wvelbase", "m s-1", "vertical velocity at the ice base")
def _wvelbase(state, model, t):
    sb = _sb(state, model, t)
    return sb.sia3.w[..., 0] if sb.sia3 is not None else _zeros2(state)


@spatial("uvel", "m s-1", "x-component of 3D velocity",
         "land_ice_x_velocity")
def _uvel3(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return sb.sia3.u
    return jnp.broadcast_to(sb.u_base[..., None],
                            sb.u_base.shape + (model.grid.Mz,))


@spatial("vvel", "m s-1", "y-component of 3D velocity",
         "land_ice_y_velocity")
def _vvel3(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return sb.sia3.v
    return jnp.broadcast_to(sb.v_base[..., None],
                            sb.v_base.shape + (model.grid.Mz,))


@spatial("wvel_rel", "m s-1", "vertical velocity relative to the base")
def _wvel3(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return sb.sia3.w
    H = state.geometry.ice_thickness
    return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)


@spatial("strainheating", "W m-3", "volumetric strain heating (Sigma)")
def _sigma3(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return sb.sia3.strain_heating
    H = state.geometry.ice_thickness
    return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)


@spatial("temp", "K", "3D ice temperature", "land_ice_temperature")
def _temp3(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    EC = model.EC
    z = jnp.asarray(model.grid.z, H.dtype)
    depth = jnp.maximum(H[..., None] - z, 0.0)
    return EC.temperature(state.enthalpy, EC.pressure(depth))


@spatial("temppa", "K", "3D pressure-adjusted ice temperature")
def _temppa3(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    EC = model.EC
    z = jnp.asarray(model.grid.z, H.dtype)
    depth = jnp.maximum(H[..., None] - z, 0.0)
    return EC.pressure_adjusted_temperature(state.enthalpy,
                                            EC.pressure(depth))


@spatial("ch_temp", "K", "3D cryo-hydrologic system temperature")
def _chtemp3(state, model, t):
    H = state.geometry.ice_thickness
    if state.ch_enthalpy is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    EC = model.EC
    z = jnp.asarray(model.grid.z, H.dtype)
    depth = jnp.maximum(H[..., None] - z, 0.0)
    return EC.temperature(state.ch_enthalpy, EC.pressure(depth))


@spatial("ch_liqfrac", "1", "3D cryo-hydrologic system liquid water fraction")
def _chliqfrac3(state, model, t):
    H = state.geometry.ice_thickness
    if state.ch_enthalpy is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    EC = model.EC
    z = jnp.asarray(model.grid.z, H.dtype)
    depth = jnp.maximum(H[..., None] - z, 0.0)
    return EC.water_fraction(state.ch_enthalpy, EC.pressure(depth))


@spatial("ch_heat_flux", "W m-3",
         "3D cryo-hydrologic warming volumetric heat flux into the ice")
def _chheat3(state, model, t):
    H = state.geometry.ice_thickness
    if state.ch_enthalpy is None or state.enthalpy is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    em = getattr(model, "energy_model", None)
    if em is None or not getattr(em, "ch_enabled", False):
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    EC = model.EC
    z = jnp.asarray(model.grid.z, H.dtype)
    p = EC.pressure(jnp.maximum(H[..., None] - z, 0.0))
    dT = EC.temperature(state.ch_enthalpy, p) - EC.temperature(state.enthalpy, p)
    return em.k_i * jnp.maximum(dT, 0.0) / em.ch_spacing ** 2


@spatial("liqfrac", "1", "3D liquid water fraction")
def _liqfrac3(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    EC = model.EC
    z = jnp.asarray(model.grid.z, H.dtype)
    depth = jnp.maximum(H[..., None] - z, 0.0)
    return EC.water_fraction(state.enthalpy, EC.pressure(depth))


@spatial("enthalpy", "J kg-1", "3D ice enthalpy")
def _enth3(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    return state.enthalpy


@spatial("enthalpybase", "J kg-1", "ice enthalpy at the base")
def _enthbase(state, model, t):
    return state.enthalpy[..., 0] if state.enthalpy is not None \
        else _zeros2(state)


@spatial("enthalpysurf", "J kg-1", "ice enthalpy at the surface layer")
def _enthsurf(state, model, t):
    return state.enthalpy[..., -1] if state.enthalpy is not None \
        else _zeros2(state)


@spatial("age", "s", "age of the ice", "age_of_glacier_ice")
def _age3(state, model, t):
    H = state.geometry.ice_thickness
    if state.age is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    return state.age


def _temperate_mask(state, model):
    """(My,Mx,Mz) bool: temperate ice inside the ice column."""
    H = state.geometry.ice_thickness
    EC = model.EC
    z = jnp.asarray(model.grid.z, H.dtype)
    depth = jnp.maximum(H[..., None] - z, 0.0)
    in_ice = z < jnp.maximum(H[..., None], 1e-9)
    return (state.enthalpy >= EC.enthalpy_cts(EC.pressure(depth))) & in_ice


@spatial("tempicethk", "m", "total thickness of temperate ice in the column")
def _tempicethk(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return _zeros2(state)
    temperate = _temperate_mask(state, model).astype(H.dtype)
    dz = jnp.asarray(model.grid.dz, H.dtype)
    mid = 0.5 * (temperate[..., 1:] + temperate[..., :-1])
    return jnp.sum(mid * dz, axis=-1)


@spatial("tempicethk_basal", "m",
         "thickness of the contiguous basal temperate layer")
def _tempicethk_basal(state, model, t):
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return _zeros2(state)
    temperate = _temperate_mask(state, model)
    # contiguous-from-base flags via cumulative product along z
    contig = jnp.cumprod(temperate.astype(H.dtype), axis=-1)
    dz = jnp.asarray(model.grid.dz, H.dtype)
    mid = 0.5 * (contig[..., 1:] + contig[..., :-1])
    return jnp.sum(mid * dz, axis=-1)


@spatial("bfrict", "W m-2", "basal frictional heating")
def _bfrict(state, model, t):
    sb = _sb(state, model, t)
    return sb.basal_frictional_heating \
        if sb.basal_frictional_heating is not None else _zeros2(state)


def _taud_xy(state, model):
    from ..ops import stencils as st
    g = state.geometry
    sx, sy = st.centered_grad(g.ice_surface_elevation, model.grid.dx,
                              model.grid.dy, model.sh)
    f = model.rho_i * 9.81 * g.ice_thickness
    return -f * sx, -f * sy


@spatial("taud_x", "Pa", "x-component of the driving stress")
def _taud_x(state, model, t):
    return _taud_xy(state, model)[0]


@spatial("taud_y", "Pa", "y-component of the driving stress")
def _taud_y(state, model, t):
    return _taud_xy(state, model)[1]


def _taub_xy(state, model):
    H = state.geometry.ice_thickness
    if model.yield_stress is None or model.ssa is None:
        return jnp.zeros_like(H), jnp.zeros_like(H)
    tau_c = model.yield_stress.compute(state)
    u = state.u_ssa if state.u_ssa is not None else jnp.zeros_like(H)
    v = state.v_ssa if state.v_ssa is not None else jnp.zeros_like(H)
    beta = model.ssa.sliding_law.beta(tau_c, u, v)
    return -beta * u, -beta * v


@spatial("taub_x", "Pa", "x-component of basal shear stress")
def _taub_x(state, model, t):
    return _taub_xy(state, model)[0]


@spatial("taub_y", "Pa", "y-component of basal shear stress")
def _taub_y(state, model, t):
    return _taub_xy(state, model)[1]


@spatial("flux_mag", "m2 s-1",
         "magnitude of vertically-integrated horizontal flux")
def _fluxmag(state, model, t):
    return _velbar(state, model, t) * state.geometry.ice_thickness


@spatial("flux_divergence", "m s-1", "divergence of the ice flux")
def _fluxdiv(state, model, t):
    from . import geometry_evolution as ge
    sb = _sb(state, model, t)
    qe_adv, qn_adv = ge.advective_flux(sb.u_face_e, sb.v_face_n,
                                       state.geometry.ice_thickness, model.sh)
    return (sb.qe + qe_adv - model.sh(sb.qe + qe_adv, 0, -1)) / model.grid.dx \
        + (sb.qn + qn_adv - model.sh(sb.qn + qn_adv, -1, 0)) / model.grid.dy


@spatial("topg_sl_adjusted", "m", "bed elevation relative to sea level")
def _topg_sl(state, model, t):
    return state.geometry.bed_elevation - state.geometry.sea_level


@spatial("ice_area_specific_volume", "m3 m-2",
         "part-grid ice volume per unit area (Href)")
def _href(state, model, t):
    return state.geometry.ice_area_specific_volume


@spatial("climatic_mass_balance", "kg m-2 s-1",
         "surface mass balance (mass flux)",
         "land_ice_surface_specific_mass_balance_flux")
def _cmb(state, model, t):
    return model.surface(state.geometry, t).smb * model.rho_i


@spatial("bwp", "Pa", "subglacial water pressure")
def _bwp(state, model, t):
    return state.hydro_P if state.hydro_P is not None else _zeros2(state)


@spatial("bwprel", "1", "water pressure as a fraction of overburden")
def _bwprel(state, model, t):
    H = state.geometry.ice_thickness
    if state.hydro_P is None:
        return _zeros2(state)
    P0 = model.rho_i * 9.81 * jnp.maximum(H, 1.0)
    return jnp.where(H > 1.0, state.hydro_P / P0, 0.0)


@spatial("effbwp", "Pa", "effective pressure (overburden minus water pressure)")
def _effbwp(state, model, t):
    H = state.geometry.ice_thickness
    if state.hydro_P is None:
        return _zeros2(state)
    return jnp.maximum(model.rho_i * 9.81 * H - state.hydro_P, 0.0)


@spatial("hydraulic_potential", "Pa",
         "subglacial hydraulic potential psi = P + rho_w g (b + W)")
def _hydropot(state, model, t):
    g = state.geometry
    P = state.hydro_P if state.hydro_P is not None else _zeros2(state)
    W = state.hydro_W if state.hydro_W is not None else _zeros2(state)
    return P + 1000.0 * 9.81 * (g.bed_elevation + W)


@spatial("eigen1", "s-1", "first principal horizontal strain rate")
def _eigen1(state, model, t):
    return _strain_eigenvalues(state, model)[0]


@spatial("eigen2", "s-1", "second principal horizontal strain rate")
def _eigen2(state, model, t):
    return _strain_eigenvalues(state, model)[1]


@spatial("snow_depth", "m", "PDD snow cover depth (ice equivalent)")
def _snowdepth(state, model, t):
    return state.snow_depth if state.snow_depth is not None \
        else _zeros2(state)


@spatial("firn_depth", "m", "PDD firn layer depth (ice equivalent)")
def _firndepth(state, model, t):
    return state.firn_depth if state.firn_depth is not None \
        else _zeros2(state)


@spatial("surface_albedo", "1", "dEBM-simple surface albedo")
def _surfalbedo(state, model, t):
    return state.surface_albedo if state.surface_albedo is not None \
        else _zeros2(state)


def _debm_model(model):
    from ..coupler import debm as _debm
    surf = getattr(model, "surface", None)
    while surf is not None and not isinstance(surf, _debm.DEBMSimple):
        surf = getattr(surf, "inner", None)
    return surf


@spatial("insolation", "W m-2",
         "mean top-of-atmosphere insolation during the dEBM melt period")
def _insolation(state, model, t):
    from ..coupler import debm as _debm
    surf = _debm_model(model)
    if surf is None:
        return _zeros2(state)
    dtype = state.geometry.ice_thickness.dtype
    decl, dist = surf._orbit(t)
    lat = jnp.asarray(surf.latitude, dtype) * (jnp.pi / 180.0)
    h = _debm.hour_angle(surf.phi, lat, jnp.asarray(decl, dtype))
    return _debm.insolation(surf.S0, jnp.asarray(dist, dtype), h, lat,
                            jnp.asarray(decl, dtype))


def _debm_melt_parts(state, model, t):
    """Instantaneous dEBM melt components at model time t [m i.e. s-1]."""
    surf = _debm_model(model)
    if surf is None:
        z = _zeros2(state)
        return z, z, z
    geom = state.geometry
    dtype = geom.ice_thickness.dtype
    atm = surf.atmosphere(geom, t)
    Ta = atm.temperature.astype(dtype)
    Tj = atm.temperature_july.astype(dtype)
    frac = t / SEC_PER_YEAR - jnp.floor(t / SEC_PER_YEAR)
    T = Ta + (Tj - Ta) * jnp.asarray(jnp.cos(2.0 * jnp.pi * (frac - 0.5)),
                                     dtype)
    alb = (state.surface_albedo if state.surface_albedo is not None
           else jnp.full(geom.ice_thickness.shape, surf.albedo_max, dtype))
    insol, temp, offset, _ = surf.melt_components(
        t, T, geom.ice_surface_elevation.astype(dtype), alb)
    return insol, temp, offset


@spatial("debm_insolation_driven_melt_flux", "kg m-2 s-1",
         "dEBM-simple insolation-driven melt flux")
def _debm_insol_melt(state, model, t):
    rho_i = 910.0
    return _debm_melt_parts(state, model, t)[0] * rho_i


@spatial("debm_temperature_driven_melt_flux", "kg m-2 s-1",
         "dEBM-simple temperature-driven melt flux")
def _debm_temp_melt(state, model, t):
    rho_i = 910.0
    return _debm_melt_parts(state, model, t)[1] * rho_i


@spatial("debm_offset_melt_flux", "kg m-2 s-1",
         "dEBM-simple background (offset) melt flux")
def _debm_offset_melt(state, model, t):
    rho_i = 910.0
    return _debm_melt_parts(state, model, t)[2] * rho_i


@spatial("climatic_mass_balance", "kg m-2 s-1",
         "surface mass balance seen by the ice (climatology at t)",
         standard_name="land_ice_surface_specific_mass_balance_flux")
def _cmb(state, model, t):
    surf = getattr(model, "surface", None)
    if surf is None:
        return _zeros2(state)
    return surf(state.geometry, t).smb * 910.0


@spatial("ice_surface_temp", "K", "ice surface temperature seen by the ice")
def _ist(state, model, t):
    surf = getattr(model, "surface", None)
    if surf is None:
        return _zeros2(state)
    return surf(state.geometry, t).temperature


@spatial("air_temp", "K", "mean-annual near-surface air temperature")
def _airtemp(state, model, t):
    atm = _atmosphere_of(model)
    if atm is None:
        return _zeros2(state)
    return atm(state.geometry, t).temperature


@spatial("air_temp_snapshot", "K",
         "instantaneous near-surface air temperature (seasonal cycle at t)")
def _airtemp_snap(state, model, t):
    atm = _atmosphere_of(model)
    if atm is None:
        return _zeros2(state)
    a = atm(state.geometry, t)
    frac = t / SEC_PER_YEAR - jnp.floor(t / SEC_PER_YEAR)
    c = jnp.cos(2.0 * jnp.pi * (frac - 0.5))
    return a.temperature + (a.temperature_july - a.temperature) \
        * jnp.asarray(c, a.temperature.dtype)


@spatial("precipitation", "kg m-2 s-1", "precipitation (ice equivalent)")
def _precip(state, model, t):
    atm = _atmosphere_of(model)
    if atm is None:
        return _zeros2(state)
    return atm(state.geometry, t).precipitation * 910.0


def _surface_budget(state, model, t, which):
    surf = getattr(model, "surface", None)
    if surf is None:
        return _zeros2(state)
    out = surf(state.geometry, t)
    val = getattr(out, which, None)
    if val is None:
        return _zeros2(state)
    return val * 910.0


@spatial("surface_melt_flux", "kg m-2 s-1",
         "surface melt (PDD/dEBM climatology at t)",
         standard_name="surface_snow_and_ice_melt_flux")
def _surf_melt(state, model, t):
    return _surface_budget(state, model, t, "melt")


@spatial("surface_runoff_flux", "kg m-2 s-1",
         "surface runoff (melt minus refreeze)",
         standard_name="surface_runoff_flux")
def _surf_runoff(state, model, t):
    return _surface_budget(state, model, t, "runoff")


@spatial("surface_accumulation_flux", "kg m-2 s-1",
         "surface accumulation (snowfall)")
def _surf_accum(state, model, t):
    return _surface_budget(state, model, t, "accumulation")


def _atmosphere_of(model):
    surf = getattr(model, "surface", None)
    while surf is not None:
        atm = getattr(surf, "atmosphere", None)
        if atm is not None:
            return atm
        surf = getattr(surf, "inner", None)
    return None


@spatial("fracture_density", "1", "fracture density phase field")
def _fracdens(state, model, t):
    return state.fracture_density if state.fracture_density is not None \
        else _zeros2(state)


@spatial("fracture_age", "s", "age of the fractures")
def _fracage(state, model, t):
    return state.fracture_age if state.fracture_age is not None \
        else _zeros2(state)


@spatial("fracture_flow_enhancement", "1",
         "fracture-softening flow enhancement factor")
def _fracenh(state, model, t):
    if state.fracture_density is None or model.fracture is None:
        return jnp.ones_like(_zeros2(state))
    return model.fracture.flow_enhancement(state.fracture_density,
                                           model.fracture.n_glen)


@spatial("shelfbmassflux", "kg m-2 s-1", "sub-shelf mass flux (melt positive)")
def _shelfbmf(state, model, t):
    if model.ocean is None:
        return _zeros2(state)
    return model.ocean(state.geometry, t) * model.rho_i


@spatial("dbdt_total", "m", "total bed displacement since initialization")
def _dbdt_total(state, model, t):
    if state.bed_reference is None:
        return _zeros2(state)
    return state.geometry.bed_elevation - state.bed_reference


@spatial("shelfbtemp", "K", "ice temperature at the ice-shelf base")
def _shelfbtemp(state, model, t):
    if model.ocean is None:
        return _zeros2(state)
    return model.ocean.inputs(state.geometry, t).shelf_base_temperature


@spatial("bheatflx", "W m-2", "upward geothermal flux at the bedrock "
         "thermal layer base")
def _bheatflx(state, model, t):
    if state.geothermal_flux is not None:
        return state.geothermal_flux
    return jnp.full_like(state.geometry.ice_thickness,
                         getattr(model, "geothermal", 0.0))


@spatial("uflux", "m2 s-1", "x-component of vertically-integrated "
         "horizontal ice flux")
def _uflux(state, model, t):
    return _ubar(state, model, t) * state.geometry.ice_thickness


@spatial("vflux", "m2 s-1", "y-component of vertically-integrated "
         "horizontal ice flux")
def _vflux(state, model, t):
    return _vbar(state, model, t) * state.geometry.ice_thickness


def _pdd_of(model):
    """The TemperatureIndex instance in the surface chain, or None."""
    m = getattr(model, "surface", None)
    while m is not None:
        if hasattr(m, "effective_sigma"):
            return m
        m = getattr(m, "inner", None)
    return None


@spatial("air_temp_sd", "K", "standard deviation of near-surface air "
         "temperature (PDD daily variability)")
def _air_temp_sd(state, model, t):
    pdd = _pdd_of(model)
    if pdd is None:
        return _zeros2(state)
    atm = _atmosphere_of(model)
    T = atm(state.geometry, t).temperature if atm is not None \
        else jnp.full_like(state.geometry.ice_thickness, 273.15)
    return pdd.effective_sigma(T)


@spatial("nuH", "Pa s m", "effective viscosity times thickness "
         "(SSA regularized vertically-integrated viscosity; cell-centered "
         "average of the staggered field the solver uses)")
def _nuH(state, model, t):
    ssa = getattr(model, "ssa", None)
    if ssa is None or state.u_ssa is None or not hasattr(ssa, "_hardness"):
        return _zeros2(state)
    from ..ops import ssa as ssa_ops
    H = state.geometry.ice_thickness
    B = ssa._hardness(state)
    nuH = ssa_ops.compute_nuH(state.u_ssa, state.v_ssa, B, H,
                              model.grid.dx, model.grid.dy, model.sh,
                              n_glen=ssa.n_glen, eps_reg2=ssa.eps_reg2)
    # staggered e/n faces -> cell centers
    sh = model.sh
    return 0.25 * (nuH.e + sh(nuH.e, 0, -1) + nuH.n + sh(nuH.n, -1, 0))


# --------------------------------------------------------------------------
# scalar time series (PISM ts_ names)
# --------------------------------------------------------------------------

@scalar("ice_volume", "m3", "total ice volume")
def _vol(state, model, t):
    g = model.grid
    return jnp.sum(state.geometry.ice_thickness) * g.dx * g.dy


@scalar("ice_volume_glacierized", "m3", "ice volume in cells above the icy threshold")
def _volg(state, model, t):
    g = model.grid
    H = state.geometry.ice_thickness
    return jnp.sum(jnp.where(S.icy(state.geometry.cell_type), H, 0.0)) * g.dx * g.dy


@scalar("ice_area_glacierized", "m2", "glacierized area")
def _area(state, model, t):
    g = model.grid
    return jnp.sum(S.icy(state.geometry.cell_type).astype(
        state.geometry.ice_thickness.dtype)) * g.dx * g.dy


@scalar("ice_area_glacierized_floating", "m2", "floating ice area")
def _area_fl(state, model, t):
    g = model.grid
    return jnp.sum(S.floating_ice(state.geometry.cell_type).astype(
        state.geometry.ice_thickness.dtype)) * g.dx * g.dy


@scalar("ice_volume_temperate_base_fraction", "1",
        "fraction of glacierized area with temperate base")
def _temp_base(state, model, t):
    if state.enthalpy is None:
        return jnp.zeros(())
    EC = model.EC
    H = state.geometry.ice_thickness
    icy = S.icy(state.geometry.cell_type)
    p = EC.pressure(H)
    temperate = icy & (state.enthalpy[..., 0] >= EC.enthalpy_cts(p))
    n_icy = jnp.maximum(jnp.sum(icy), 1)
    return jnp.sum(temperate) / n_icy


@scalar("max_velocity", "m s-1", "maximum vertically-integrated speed")
def _umax(state, model, t):
    return jnp.max(_velbar(state, model, t))


@scalar("ice_mass", "kg", "total ice mass")
def _mass(state, model, t):
    g = model.grid
    return jnp.sum(state.geometry.ice_thickness) * g.dx * g.dy * model.rho_i


@scalar("ice_volume_cold", "m3", "volume of cold ice")
def _vol_cold(state, model, t):
    if state.enthalpy is None:
        return jnp.zeros(())
    g, EC = model.grid, model.EC
    H = state.geometry.ice_thickness
    depth = jnp.maximum(H[..., None] - jnp.asarray(g.z, H.dtype), 0.0)
    cold = (state.enthalpy < EC.enthalpy_cts(EC.pressure(depth)))
    in_ice = jnp.asarray(g.z, H.dtype) < H[..., None]
    dz = jnp.asarray(g.dz, H.dtype)
    mid = 0.5 * ((cold & in_ice)[..., 1:] + (cold & in_ice)[..., :-1])
    return jnp.sum(mid * dz) * g.dx * g.dy


@scalar("basal_mass_flux_grounded", "m3 s-1", "area-integrated grounded basal melt")
def _bmf(state, model, t):
    g = model.grid
    if state.basal_melt_rate is None:
        return jnp.zeros(())
    m = jnp.where(S.grounded_ice(state.geometry.cell_type),
                  state.basal_melt_rate, 0.0)
    return jnp.sum(m) * g.dx * g.dy


@scalar("surface_ice_flux", "m3 s-1", "area-integrated surface mass balance")
def _sif(state, model, t):
    g = model.grid
    smb = model.surface(state.geometry, t).smb
    return jnp.sum(jnp.where(S.icy(state.geometry.cell_type), smb, 0.0)) \
        * g.dx * g.dy


@scalar("ice_volume_temperate", "m3", "volume of temperate ice")
def _vol_temp(state, model, t):
    if state.enthalpy is None:
        return jnp.zeros(())
    g = model.grid
    H = state.geometry.ice_thickness
    temperate = _temperate_mask(state, model).astype(H.dtype)
    dz = jnp.asarray(g.dz, H.dtype)
    mid = 0.5 * (temperate[..., 1:] + temperate[..., :-1])
    return jnp.sum(mid * dz) * g.dx * g.dy


@scalar("ice_enthalpy", "J", "total ice enthalpy")
def _total_enth(state, model, t):
    if state.enthalpy is None:
        return jnp.zeros(())
    g = model.grid
    H = state.geometry.ice_thickness
    z = jnp.asarray(g.z, H.dtype)
    in_ice = (z < jnp.maximum(H[..., None], 1e-9)).astype(H.dtype)
    dz = jnp.asarray(g.dz, H.dtype)
    E = state.enthalpy * in_ice
    mid = 0.5 * (E[..., 1:] + E[..., :-1])
    return jnp.sum(mid * dz) * g.dx * g.dy * model.rho_i


@scalar("max_diffusivity", "m2 s-1", "maximum SIA diffusivity")
def _maxdiff(state, model, t):
    return _sb(state, model, t).max_diffusivity


@scalar("ice_area_glacierized_grounded", "m2", "grounded glacierized area")
def _area_gr(state, model, t):
    g = model.grid
    return jnp.sum(S.grounded_ice(state.geometry.cell_type).astype(
        state.geometry.ice_thickness.dtype)) * g.dx * g.dy


@scalar("ice_area_glacierized_temperate_base", "m2",
        "glacierized area with temperate base")
def _area_tempbase(state, model, t):
    if state.enthalpy is None:
        return jnp.zeros(())
    g, EC = model.grid, model.EC
    H = state.geometry.ice_thickness
    icy = S.icy(state.geometry.cell_type)
    temperate = icy & (state.enthalpy[..., 0] >=
                       EC.enthalpy_cts(EC.pressure(H)))
    return jnp.sum(temperate.astype(H.dtype)) * g.dx * g.dy


@scalar("ice_area_glacierized_cold_base", "m2",
        "glacierized area with cold base")
def _area_coldbase(state, model, t):
    if state.enthalpy is None:
        return jnp.zeros(())
    g, EC = model.grid, model.EC
    H = state.geometry.ice_thickness
    icy = S.icy(state.geometry.cell_type)
    cold = icy & (state.enthalpy[..., 0] <
                  EC.enthalpy_cts(EC.pressure(H)))
    return jnp.sum(cold.astype(H.dtype)) * g.dx * g.dy


def _volume_above_flotation(state, model):
    """Grounded-ice volume above flotation [m^3 of ice]."""
    g = state.geometry
    grid = model.grid
    rho_ratio = model.rho_w / model.rho_i
    depth = jnp.maximum(g.sea_level - g.bed_elevation, 0.0)
    H_f = rho_ratio * depth    # flotation thickness
    vaf = jnp.where(S.grounded_ice(g.cell_type),
                    jnp.maximum(g.ice_thickness - H_f, 0.0), 0.0)
    return jnp.sum(vaf) * grid.dx * grid.dy


@scalar("limnsw", "kg", "mass of grounded ice above flotation")
def _limnsw(state, model, t):
    return _volume_above_flotation(state, model) * model.rho_i


@scalar("sea_level_rise_potential", "m",
        "global sea-level rise potential of ice above flotation")
def _slr(state, model, t):
    OCEAN_AREA = 3.625e14    # m^2 (CF convention value)
    v = _volume_above_flotation(state, model)
    return v * (model.rho_i / 1000.0) / OCEAN_AREA


@scalar("basal_mass_flux_floating", "m3 s-1",
        "area-integrated sub-shelf melt")
def _bmf_fl(state, model, t):
    g = model.grid
    if model.ocean is None:
        return jnp.zeros(())
    melt = model.ocean(state.geometry, t)
    m = jnp.where(S.floating_ice(state.geometry.cell_type), melt, 0.0)
    return jnp.sum(m) * g.dx * g.dy


@scalar("max_hor_vel", "m s-1", "maximum horizontal 3D velocity component")
def _maxhorvel(state, model, t):
    sb = _sb(state, model, t)
    if sb.sia3 is not None:
        return jnp.maximum(sb.sia3.max_u, sb.sia3.max_v)
    return jnp.max(jnp.abs(jnp.stack([sb.u_base, sb.v_base])))


@spatial("bwatflux", "m2 s-1",
         "steady subglacial discharge per unit width (hydrology.model=steady)")
def _bwatflux(state, model, t):
    if state.hydro_Q is None:
        return jnp.zeros_like(state.geometry.ice_thickness)
    return state.hydro_Q


# -- ISMIP6 standard area fractions (PISM sftgif/sftgrf/sftflf) ------------

@spatial("sftgif", "1", "fraction of grid cell covered with ice",
         "land_ice_area_fraction")
def _sftgif(state, model, t):
    return S.icy(state.geometry.cell_type).astype(
        state.geometry.ice_thickness.dtype)


@spatial("sftgrf", "1", "fraction of grid cell covered with grounded ice",
         "grounded_ice_sheet_area_fraction")
def _sftgrf(state, model, t):
    icy = _sftgif(state, model, t)
    if state.geometry.cell_grounded_fraction is not None:
        return icy * state.geometry.cell_grounded_fraction
    return icy * S.grounded_ice(state.geometry.cell_type).astype(icy.dtype)


@spatial("sftflf", "1", "fraction of grid cell covered with floating ice",
         "floating_ice_shelf_area_fraction")
def _sftflf(state, model, t):
    return _sftgif(state, model, t) - _sftgrf(state, model, t)


# -- bedrock thermal interface (PISM bedtoptemp / heat_flux_from_bedrock) --

@spatial("bedtoptemp", "K", "temperature at the top of the bedrock column")
def _bedtoptemp(state, model, t):
    if state.bedrock_temperature is None:
        return jnp.zeros(state.geometry.ice_thickness.shape)
    return state.bedrock_temperature[..., -1]


@spatial("heat_flux_from_bedrock", "W m-2",
         "conductive upward heat flux at the top of the bedrock",
         "upward_geothermal_heat_flux_at_ground_level")
def _bedrock_flux(state, model, t):
    shape = state.geometry.ice_thickness.shape
    if state.bedrock_temperature is None or model.grid.Mbz < 2:
        G = model.config.get_number("bootstrapping.defaults.geothermal_flux")
        return jnp.full(shape, G)
    k_b = model.config.get_number("energy.bedrock_thermal.conductivity")
    dzb = model.grid.Lbz / (model.grid.Mbz - 1)
    T = state.bedrock_temperature
    return k_b * (T[..., -2] - T[..., -1]) / dzb


# -- calving-law stress diagnostic (PISM vonmises_stress) ------------------

@spatial("vonmises_stress", "Pa",
         "tensile von Mises stress from the SSA strain rates "
         "(Morlighem et al. 2016)")
def _vonmises(state, model, t):
    l1 = _eigen1(state, model, t)
    l2 = _eigen2(state, model, t)
    e1, e2 = jnp.maximum(l1, 0.0), jnp.maximum(l2, 0.0)
    eff = jnp.sqrt(0.5 * (e1 ** 2 + e2 ** 2))
    B = SPATIAL["hardav"].func(state, model, t)
    n = model.config.get_number("stress_balance.ssa.Glen_exponent")
    return jnp.sqrt(3.0) * B * eff ** (1.0 / n)


# -- bed smoother fields (PISM BedSmoother diagnostics) --------------------

def _smoothed_bed(state, model):
    from ..ops import bedsmoother as bsm
    rng = model.stress_balance.bed_smoother_range
    if rng <= 0.0:
        return None
    return bsm.preprocess_bed(state.geometry.bed_elevation, model.grid.dx,
                              model.grid.dy, rng)


@spatial("topgsmooth", "m",
         "smoothed bed elevation (Schoof 2003 bed roughness scheme)")
def _topgsmooth(state, model, t):
    smooth = _smoothed_bed(state, model)
    return state.geometry.bed_elevation if smooth is None else smooth.bed


@spatial("thksmooth", "m",
         "ice thickness relative to the smoothed bed (grounded cells)")
def _thksmooth(state, model, t):
    smooth = _smoothed_bed(state, model)
    g = state.geometry
    if smooth is None:
        return g.ice_thickness
    grounded = S.grounded_ice(g.cell_type)
    H_rel = jnp.maximum(g.ice_surface_elevation - smooth.bed, 0.0)
    return jnp.where(grounded, H_rel, g.ice_thickness)


@spatial("schoofs_theta", "1",
         "multiplier of the SIA diffusivity from bed roughness (in [0,1])")
def _schoofs_theta(state, model, t):
    from ..ops import bedsmoother as bsm
    smooth = _smoothed_bed(state, model)
    g = state.geometry
    if smooth is None:
        return jnp.ones_like(g.ice_thickness)
    grounded = S.grounded_ice(g.cell_type)
    H_rel = jnp.maximum(g.ice_surface_elevation - smooth.bed, 0.0)
    return jnp.where(grounded,
                     bsm.theta(smooth, H_rel, model.stress_balance.n_sia),
                     1.0)


# -- misc fields -----------------------------------------------------------

@spatial("pressure", "Pa", "ice overburden pressure (3D)")
def _pressure(state, model, t):
    H = state.geometry.ice_thickness
    z = jnp.asarray(model.grid.z)
    return model.EC.pressure(jnp.maximum(H[..., None] - z, 0.0))


@spatial("h_x", "1", "x-component of the ice surface gradient")
def _h_x(state, model, t):
    s = state.geometry.ice_surface_elevation
    return (model.sh(s, 0, 1) - model.sh(s, 0, -1)) / (2.0 * model.grid.dx)


@spatial("h_y", "1", "y-component of the ice surface gradient")
def _h_y(state, model, t):
    s = state.geometry.ice_surface_elevation
    return (model.sh(s, 1, 0) - model.sh(s, -1, 0)) / (2.0 * model.grid.dy)


def _sia_staggered_grad(state, model):
    """The SIA's actual staggered surface gradient (reference
    ``SIAFD::compute_surface_gradient``; the ``h_x``/``h_y`` extras are
    staggered two-component fields there, hence the _e/_n variants)."""
    from ..ops import sia as sia_ops
    sb = model.stress_balance
    method = getattr(sb, "gradient_method", "mahaffy") if sb else "mahaffy"
    n = getattr(sb, "n_sia", 3.0) if sb else 3.0
    return sia_ops.surface_gradient(state.geometry, model.grid, model.sh,
                                    method, n)


@spatial("h_x_e", "1", "x-component of the staggered ice surface gradient "
         "(east faces, as used by the SIA flux)")
def _h_x_e(state, model, t):
    return _sia_staggered_grad(state, model).sx_e


@spatial("h_x_n", "1", "x-component of the staggered ice surface gradient "
         "(north faces)")
def _h_x_n(state, model, t):
    return _sia_staggered_grad(state, model).sx_n


@spatial("h_y_e", "1", "y-component of the staggered ice surface gradient "
         "(east faces)")
def _h_y_e(state, model, t):
    return _sia_staggered_grad(state, model).sy_e


@spatial("h_y_n", "1", "y-component of the staggered ice surface gradient "
         "(north faces, as used by the SIA flux)")
def _h_y_n(state, model, t):
    return _sia_staggered_grad(state, model).sy_n


@spatial("isochrone_depth", "m",
         "depth below the ice surface of each tracked isochrone "
         "(last axis = deposition-time layer boundary)")
def _isochrone_depth(state, model, t):
    if state.iso_layers is None:
        return jnp.zeros(state.geometry.ice_thickness.shape + (1,))
    # layer k spans [sum(layers[k+1:]), sum(layers[k:])] measured from the
    # base; the isochrone *above* layer k sits at depth = sum of layers
    # above it (younger ice is higher)
    layers = state.iso_layers
    above = jnp.cumsum(layers[..., ::-1], axis=-1)[..., ::-1] - layers
    return above


# -- additional scalars ----------------------------------------------------

@scalar("grounding_line_flux", "kg s-1",
        "total ice flux across the grounding line (positive = "
        "grounded to floating)")
def _gl_flux(state, model, t):
    from . import geometry_evolution as ge
    g = state.geometry
    sb = _sb(state, model, t)
    qe_adv, qn_adv = ge.advective_flux(sb.u_face_e, sb.v_face_n,
                                       g.ice_thickness, model.sh)
    qe = sb.qe + qe_adv
    qn = sb.qn + qn_adv
    grounded = S.grounded_ice(g.cell_type)
    floating = S.floating_ice(g.cell_type)
    sh = model.sh
    # east face between (i,j) and (i,j+1): q > 0 flows +x
    e_gf = grounded & sh(floating, 0, 1)
    e_fg = floating & sh(grounded, 0, 1)
    n_gf = grounded & sh(floating, 1, 0)
    n_fg = floating & sh(grounded, 1, 0)
    flux = jnp.sum(jnp.where(e_gf, qe, 0.0) - jnp.where(e_fg, qe, 0.0)) \
        * model.grid.dy \
        + jnp.sum(jnp.where(n_gf, qn, 0.0) - jnp.where(n_fg, qn, 0.0)) \
        * model.grid.dx
    return model.rho_i * flux


@scalar("ice_volume_glacierized_grounded", "m3", "volume of grounded ice")
def _volgg(state, model, t):
    g = state.geometry
    H = g.ice_thickness
    sel = S.icy(g.cell_type) & S.grounded_ice(g.cell_type)
    return jnp.sum(jnp.where(sel, H, 0.0)) * model.grid.dx * model.grid.dy


@scalar("ice_volume_glacierized_floating", "m3", "volume of floating ice")
def _volgf(state, model, t):
    g = state.geometry
    H = g.ice_thickness
    sel = S.floating_ice(g.cell_type)
    return jnp.sum(jnp.where(sel, H, 0.0)) * model.grid.dx * model.grid.dy


@scalar("ice_mass_glacierized", "kg", "mass of glacierized ice")
def _massg(state, model, t):
    return model.rho_i * SCALAR["ice_volume_glacierized"].func(state, model, t)


@spatial("tillphi", "degrees", "till friction angle",
         "till_angle_of_internal_friction")
def _tillphi(state, model, t):
    H = state.geometry.ice_thickness
    if state.till_phi is not None:
        return state.till_phi
    if model.yield_stress is not None and \
            hasattr(model.yield_stress, "phi"):
        return jnp.full_like(H, model.yield_stress.phi)
    return jnp.zeros_like(H)


@spatial("wvel", "m s-1",
         "vertical velocity of ice, relative to the geoid (wvel_rel plus "
         "the basal kinematic contribution u_b . grad b; bed-uplift dbdt "
         "not included)")
def _wvel_full(state, model, t):
    sb = _sb(state, model, t)
    H = state.geometry.ice_thickness
    if sb.sia3 is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    b = state.geometry.bed_elevation
    sh, dx, dy = model.sh, model.grid.dx, model.grid.dy
    bx = (sh(b, 0, 1) - sh(b, 0, -1)) / (2 * dx)
    by = (sh(b, 1, 0) - sh(b, -1, 0)) / (2 * dy)
    w_base = sb.u_base * bx + sb.v_base * by
    return sb.sia3.w + w_base[..., None]


def _deviatoric_stresses(state, model):
    """SSA-plane deviatoric stress components sigma_xx/yy/xy (PISM
    ``deviatoric_stresses``): tau_ij = 2 nu e_ij with the effective
    viscosity nu = B/2 gamma^((1-n)/(2n)),
    gamma = ux^2 + vy^2 + ux vy + (uy+vx)^2/4."""
    H = state.geometry.ice_thickness
    u = state.u_ssa if state.u_ssa is not None else jnp.zeros_like(H)
    v = state.v_ssa if state.v_ssa is not None else jnp.zeros_like(H)
    sh, dx, dy = model.sh, model.grid.dx, model.grid.dy
    ux = (sh(u, 0, 1) - sh(u, 0, -1)) / (2 * dx)
    uy = (sh(u, 1, 0) - sh(u, -1, 0)) / (2 * dy)
    vx = (sh(v, 0, 1) - sh(v, 0, -1)) / (2 * dx)
    vy = (sh(v, 1, 0) - sh(v, -1, 0)) / (2 * dy)
    gamma = ux ** 2 + vy ** 2 + ux * vy + 0.25 * (uy + vx) ** 2
    B = SPATIAL["hardav"].func(state, model, None)
    n = model.config.get_number("stress_balance.ssa.Glen_exponent")
    nu = 0.5 * B * jnp.maximum(gamma, 1e-30) ** ((1.0 - n) / (2.0 * n))
    return 2.0 * nu * ux, 2.0 * nu * vy, nu * (uy + vx)


@spatial("sigma_xx", "Pa", "xx-component of the deviatoric stress")
def _sigma_xx(state, model, t):
    return _deviatoric_stresses(state, model)[0]


@spatial("sigma_yy", "Pa", "yy-component of the deviatoric stress")
def _sigma_yy(state, model, t):
    return _deviatoric_stresses(state, model)[1]


@spatial("sigma_xy", "Pa", "xy-component of the deviatoric stress")
def _sigma_xy(state, model, t):
    return _deviatoric_stresses(state, model)[2]


def _bwatvel(state, model):
    """Routing-hydrology water velocity q/W at cell centers (PISM
    ``bwatvel``); zero unless hydrology is the routing family."""
    H = state.geometry.ice_thickness
    hyd = model.hydrology
    W = state.hydro_W
    z = (jnp.zeros_like(H), jnp.zeros_like(H))
    if W is None or hyd is None or not hasattr(hyd, "_face_gradients"):
        return z
    b = state.geometry.bed_elevation
    if state.hydro_P is not None:       # distributed: evolving pressure
        psi = hyd.rho_w * hyd.g * b + state.hydro_P
    else:
        psi = hyd.rho_w * hyd.g * b + hyd.rho_i * hyd.g * H
    dpx, dpy, gpe, gpn = hyd._face_gradients(psi)
    sh = hyd.sh
    We = jnp.where(dpx <= 0.0, W, sh(W, 0, 1))
    Wn = jnp.where(dpy <= 0.0, W, sh(W, 1, 0))
    qe = -hyd.k * We ** hyd.alpha * gpe ** (hyd.beta_exp - 2.0) * dpx
    qn = -hyd.k * Wn ** hyd.alpha * gpn ** (hyd.beta_exp - 2.0) * dpy
    # face fluxes -> cell-centered velocity
    qx = 0.5 * (qe + sh(qe, 0, -1))
    qy = 0.5 * (qn + sh(qn, -1, 0))
    Ws = jnp.maximum(W, 1e-6)
    return qx / Ws, qy / Ws


@spatial("bwatvel_x", "m s-1", "x-velocity of subglacial transportable water")
def _bwatvel_x(state, model, t):
    return _bwatvel(state, model)[0]


@spatial("bwatvel_y", "m s-1", "y-velocity of subglacial transportable water")
def _bwatvel_y(state, model, t):
    return _bwatvel(state, model)[1]


@spatial("rank", "1",
         "index of the device owning each grid cell (the reference writes "
         "the MPI rank; useful to visualize the mesh decomposition)")
def _rank(state, model, t):
    H = state.geometry.ice_thickness
    if hasattr(H, "addressable_shards"):
        try:
            out = np.zeros(H.shape, np.float64)
            for shard in H.addressable_shards:
                out[shard.index] = shard.device.id
            return jnp.asarray(out, H.dtype)
        except Exception:
            pass
    return jnp.zeros_like(H)


@spatial("litho_temp", "K", "lithosphere (bedrock thermal layer) temperature")
def _litho_temp(state, model, t):
    """Reference ``src/energy/BTU_Full.cc`` (the bedrock column temperature
    written/read as model state ``litho_temp``)."""
    if state.bedrock_temperature is not None:
        return state.bedrock_temperature
    H = state.geometry.ice_thickness
    return jnp.zeros(H.shape + (1,), H.dtype)


@spatial("cts", "1",
         "cts = E/E_s(p); cold ice has cts < 1, temperate ice cts >= 1")
def _cts(state, model, t):
    """Reference ``src/energy/EnergyModel.cc`` diagnostic ``cts``."""
    H = state.geometry.ice_thickness
    if state.enthalpy is None:
        return jnp.zeros(H.shape + (model.grid.Mz,), H.dtype)
    z = jnp.asarray(model.grid.z, H.dtype)
    p = model.EC.pressure(jnp.maximum(H[..., None] - z, 0.0))
    return state.enthalpy / jnp.maximum(model.EC.enthalpy_cts(p), 1.0)


@spatial("effective_viscosity", "kPa s", "effective viscosity of ice")
def _effective_viscosity(state, model, t):
    """Reference ``src/stressbalance/StressBalance.cc`` (PSB_viscosity /
    ``effective_viscosity``): nu = B/2 * (gamma + eps)^((1-n)/(2n)) from the
    3D velocity field, with gamma the first-order strain-rate second
    invariant (horizontal normal/shear terms + vertical shear u_z, v_z)."""
    H = state.geometry.ice_thickness
    Mz = model.grid.Mz
    sb = _sb(state, model, t)
    if sb.sia3 is None or state.enthalpy is None:
        return jnp.zeros(H.shape + (Mz,), H.dtype)
    u, v = sb.sia3.u, sb.sia3.v
    sh, dx, dy = model.sh, model.grid.dx, model.grid.dy
    z = jnp.asarray(model.grid.z, H.dtype)
    ux = (sh(u, 0, 1) - sh(u, 0, -1)) / (2 * dx)
    uy = (sh(u, 1, 0) - sh(u, -1, 0)) / (2 * dy)
    vx = (sh(v, 0, 1) - sh(v, 0, -1)) / (2 * dx)
    vy = (sh(v, 1, 0) - sh(v, -1, 0)) / (2 * dy)

    def ddz(f):
        # centered difference on the (unequal) z levels, one-sided at ends
        num = jnp.concatenate(
            [f[..., 1:2] - f[..., 0:1],
             f[..., 2:] - f[..., :-2],
             f[..., -1:] - f[..., -2:-1]], axis=-1)
        den = jnp.concatenate(
            [z[1:2] - z[0:1], z[2:] - z[:-2], z[-1:] - z[-2:-1]])
        return num / den

    uz, vz = ddz(u), ddz(v)
    gamma = (ux ** 2 + vy ** 2 + ux * vy
             + 0.25 * (uy + vx) ** 2 + 0.25 * uz ** 2 + 0.25 * vz ** 2)
    law = model.stress_balance.sia_flow_law
    n = law.n
    p = model.EC.pressure(jnp.maximum(H[..., None] - z, 0.0))
    B = law.hardness(state.enthalpy, p)
    nu = 0.5 * B * (gamma + 1e-30) ** ((1.0 - n) / (2.0 * n))
    icy3 = (jnp.maximum(H[..., None] - z, -1.0) >= 0.0) & (H[..., None] > 1.0)
    return jnp.where(icy3, nu, 0.0) * 1e-3   # Pa s -> kPa s


def _calving_front(state, model):
    from . import calving as _cv
    mask = state.geometry.cell_type
    icy = S.icy(mask)
    ifo = mask == S.MASK_ICE_FREE_OCEAN
    return _cv.front_mask(icy, ifo, model.sh)


def _ssa_uv(state):
    H = state.geometry.ice_thickness
    u = state.u_ssa if state.u_ssa is not None else jnp.zeros_like(H)
    v = state.v_ssa if state.v_ssa is not None else jnp.zeros_like(H)
    return u, v


@spatial("eigen_calving_rate", "m s-1",
         "horizontal calving rate due to eigen-calving")
def _eigen_calving_rate(state, model, t):
    """Reference ``src/frontretreat/calving/EigenCalving.cc`` diagnostic."""
    H = state.geometry.ice_thickness
    cm = model.calving
    if cm is None or "eigen_calving" not in cm.methods:
        return jnp.zeros_like(H)
    u, v = _ssa_uv(state)
    l1, l2 = cm._strain_eigenvalues(u, v)
    rate = cm.eigen_K * jnp.maximum(l1, 0.0) * jnp.maximum(l2, 0.0)
    front = _calving_front(state, model)
    floating = S.floating_ice(state.geometry.cell_type)
    return jnp.where(front & floating, rate, 0.0)


@spatial("vonmises_calving_rate", "m s-1",
         "horizontal calving rate due to von Mises calving")
def _vonmises_calving_rate(state, model, t):
    """Reference ``src/frontretreat/calving/vonMisesCalving.cc``."""
    H = state.geometry.ice_thickness
    cm = model.calving
    ssa = getattr(model, "ssa", None)
    if cm is None or "vonmises_calving" not in cm.methods or ssa is None:
        return jnp.zeros_like(H)
    u, v = _ssa_uv(state)
    B = ssa._hardness(state)
    l1, l2 = cm._strain_eigenvalues(u, v)
    e1, e2 = jnp.maximum(l1, 0.0), jnp.maximum(l2, 0.0)
    eff = jnp.sqrt(0.5 * (e1 ** 2 + e2 ** 2))
    sigma = jnp.sqrt(3.0) * B * eff ** (1.0 / cm.n_glen)
    speed = jnp.sqrt(u ** 2 + v ** 2)
    rate = speed * sigma / cm.vm_sigma_max
    front = _calving_front(state, model)
    floating = S.floating_ice(state.geometry.cell_type)
    return jnp.where(front & floating, rate, 0.0)


@spatial("hayhurst_calving_rate", "m s-1",
         "horizontal calving rate due to Hayhurst-stress calving")
def _hayhurst_calving_rate(state, model, t):
    """Reference ``src/frontretreat/calving/HayhurstCalving.cc``."""
    H = state.geometry.ice_thickness
    cm = model.calving
    if cm is None or "hayhurst_calving" not in cm.methods:
        return jnp.zeros_like(H)
    rate = cm.hayhurst_rate(state.geometry)
    front = _calving_front(state, model)
    marine = state.geometry.sea_level - state.geometry.bed_elevation > 0.0
    return jnp.where(front & marine, rate, 0.0)


@spatial("frontal_melt_rate", "m s-1", "frontal melt rate")
def _frontal_melt_rate(state, model, t):
    """Reference ``src/coupler/frontalmelt/*`` (``frontal_melt_rate``)."""
    H = state.geometry.ice_thickness
    fm = getattr(model, "frontal_melt", None)
    if fm is None:
        return jnp.zeros_like(H)
    return jnp.asarray(fm(state.geometry, t, state=state), H.dtype) \
        * jnp.ones_like(H)


@spatial("frontal_melt_retreat_rate", "m s-1",
         "retreat rate due to frontal melt, applied at marine front cells")
def _frontal_melt_retreat_rate(state, model, t):
    """Reference ``src/frontretreat/FrontRetreat.cc`` driven by frontal
    melt: the melt rate restricted to the front cells it actually erodes."""
    H = state.geometry.ice_thickness
    fm = getattr(model, "frontal_melt", None)
    cm = model.calving
    if fm is None or cm is None:
        return jnp.zeros_like(H)
    rate = jnp.maximum(
        jnp.asarray(fm(state.geometry, t, state=state), H.dtype), 0.0) \
        * jnp.ones_like(H)
    front = _calving_front(state, model)
    marine = state.geometry.sea_level - state.geometry.bed_elevation > 0.0
    where = front & marine
    if not cm.fm_floating:
        where = where & ~S.floating_ice(state.geometry.cell_type)
    return jnp.where(where, rate, 0.0)


@spatial("total_retreat_rate", "m s-1",
         "total horizontal retreat rate (all active calving laws + frontal "
         "melt) at front cells")
def _total_retreat_rate(state, model, t):
    """Reference ``src/frontretreat/FrontRetreat.cc`` (sum of retreat-rate
    contributions the front-retreat machinery applies)."""
    H = state.geometry.ice_thickness
    total = (_eigen_calving_rate(state, model, t)
             + _vonmises_calving_rate(state, model, t)
             + _hayhurst_calving_rate(state, model, t)
             + _frontal_melt_retreat_rate(state, model, t))
    return total


@spatial("wallmelt", "m s-1",
         "melt rate from the dissipation of potential energy of the "
         "lateral subglacial water flow (ice equivalent)")
def _wallmelt(state, model, t):
    """Reference ``src/hydrology/Routing.cc`` (``wallmelt`` diagnostic):
    dissipation q . (-grad psi) per unit area converted to an ice-equivalent
    melt rate by rho_i L."""
    H = state.geometry.ice_thickness
    hyd = model.hydrology
    W = state.hydro_W
    if W is None or hyd is None or not hasattr(hyd, "_face_gradients"):
        return jnp.zeros_like(H)
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
    # dissipation = q . (-grad psi) per face, averaged to cell centers
    diss = 0.5 * (jnp.maximum(-qe * dpx, 0.0)
                  + jnp.maximum(-sh(qe, 0, -1) * sh(dpx, 0, -1), 0.0)) \
        + 0.5 * (jnp.maximum(-qn * dpy, 0.0)
                 + jnp.maximum(-sh(qn, -1, 0) * sh(dpy, -1, 0), 0.0))
    L = model.EC.L0
    rho_i = model.EC.rho_i
    return diss / (rho_i * L)


def compute_spatial(names, state, model, t):
    return {n: SPATIAL[n].func(state, model, t) for n in names}


def compute_scalar(names, state, model, t):
    return {n: SCALAR[n].func(state, model, t) for n in names}


# --------------------------------------------------------------------------
# interval-averaged rate diagnostics (PISM ``TSDiagnostic`` rate quantities)
# --------------------------------------------------------------------------
# PISM reports mass-budget time series not as instantaneous samples but as
# exact averages over the reporting window [t_prev, t], computed from the
# conservation bookkeeping accumulated by ``GeometryEvolution``
# (reference ``src/icemodel/diagnostics.cc``: tendency_of_ice_volume,
# tendency_of_ice_mass_due_to_* family, with CF ``cell_methods =
# "time: mean"`` and a ``time_bnds`` variable).  Here the window deltas come
# from ``StepStats`` (time-integrated volumes, m^3); each rate function maps
# a ``Window`` to a scalar.

class Window(NamedTuple):
    """Reporting-window deltas for rate diagnostics (all volumes in m^3)."""
    dt: float            # window length [s]
    d_volume: float      # change of total ice volume
    d_smb: float         # time-integrated applied surface mass balance
    d_bmb: float         # time-integrated applied basal mass balance
    d_flow: float        # time-integrated flux-divergence volume
    d_nonneg: float      # time-integrated non-negativity (projection) volume
    d_discharge: float   # volume change by calving/front retreat (<= 0 loss)
    rho_i: float         # ice density [kg m-3]
    d_nsteps: float = 0.0  # adaptive time steps taken in the window
    # discharge split (reference src/icemodel/diagnostics.cc ts variables
    # tendency_of_ice_mass_due_to_{calving,frontal_melt,forced_retreat})
    d_calving: float = 0.0
    d_frontal_melt: float = 0.0
    d_forced_retreat: float = 0.0
    # glacierized (H > thickness_threshold) volume change over the window
    # (reference ts variables tendency_of_ice_{volume,mass}_glacierized)
    d_volume_glacierized: float = 0.0


RATE: Dict[str, Diagnostic] = {}


def rate(name, units, long_name, standard_name=""):
    def deco(fn):
        RATE[name] = Diagnostic(fn, units, long_name, standard_name)
        return fn
    return deco


@rate("tendency_of_ice_volume", "m3 s-1",
      "rate of change of ice volume over the reporting interval")
def _dvol(w):
    return w.d_volume / w.dt


@rate("tendency_of_ice_mass", "kg s-1",
      "rate of change of ice mass over the reporting interval")
def _dmass(w):
    return w.rho_i * w.d_volume / w.dt


@rate("tendency_of_ice_volume_glacierized", "m3 s-1",
      "rate of change of the volume of ice thicker than the glacierized "
      "threshold over the reporting interval")
def _dvol_gl(w):
    return w.d_volume_glacierized / w.dt


@rate("tendency_of_ice_mass_glacierized", "kg s-1",
      "rate of change of the mass of ice thicker than the glacierized "
      "threshold over the reporting interval")
def _dmass_gl(w):
    return w.rho_i * w.d_volume_glacierized / w.dt


@rate("dt", "s",
      "mean length of the adaptive time steps in the reporting interval")
def _dt_rate(w):
    """Reference ``src/icemodel/diagnostics.cc`` scalar ts ``dt``."""
    return w.dt / max(float(w.d_nsteps), 1.0)


@rate("tendency_of_ice_volume_due_to_surface_mass_flux", "m3 s-1",
      "average surface mass balance volume rate")
def _dvol_smb(w):
    return w.d_smb / w.dt


@rate("tendency_of_ice_mass_due_to_surface_mass_flux", "kg s-1",
      "average surface mass balance mass rate",
      "tendency_of_land_ice_mass_due_to_surface_mass_balance")
def _dmass_smb(w):
    return w.rho_i * w.d_smb / w.dt


@rate("tendency_of_ice_volume_due_to_basal_mass_flux", "m3 s-1",
      "average basal mass balance volume rate (negative = melt)")
def _dvol_bmb(w):
    # StepStats.sum_bmb is positive for melt (ice removed)
    return -w.d_bmb / w.dt


@rate("tendency_of_ice_mass_due_to_basal_mass_flux", "kg s-1",
      "average basal mass balance mass rate (negative = melt)",
      "tendency_of_land_ice_mass_due_to_basal_mass_balance")
def _dmass_bmb(w):
    return -w.rho_i * w.d_bmb / w.dt


@rate("tendency_of_ice_volume_due_to_flow", "m3 s-1",
      "average volume rate of change due to flow (negative flux divergence)")
def _dvol_flow(w):
    return -w.d_flow / w.dt


@rate("tendency_of_ice_mass_due_to_flow", "kg s-1",
      "average mass rate of change due to flow (negative flux divergence)")
def _dmass_flow(w):
    return -w.rho_i * w.d_flow / w.dt


@rate("tendency_of_ice_volume_due_to_discharge", "m3 s-1",
      "average volume rate of change by calving and front retreat")
def _dvol_disch(w):
    return w.d_discharge / w.dt


@rate("tendency_of_ice_mass_due_to_discharge", "kg s-1",
      "average mass rate of change by calving and front retreat",
      "tendency_of_land_ice_mass_due_to_calving_and_ice_front_melting")
def _dmass_disch(w):
    return w.rho_i * w.d_discharge / w.dt


@rate("tendency_of_ice_mass_due_to_calving", "kg s-1",
      "average mass rate of change by calving (incl. iceberg removal)",
      "tendency_of_land_ice_mass_due_to_calving")
def _dmass_calving(w):
    return w.rho_i * w.d_calving / w.dt


@rate("tendency_of_ice_volume_due_to_calving", "m3 s-1",
      "average volume rate of change by calving (incl. iceberg removal)")
def _dvol_calving(w):
    return w.d_calving / w.dt


@rate("tendency_of_ice_mass_due_to_frontal_melt", "kg s-1",
      "average mass rate of change by frontal-melt-driven retreat")
def _dmass_fm(w):
    return w.rho_i * w.d_frontal_melt / w.dt


@rate("tendency_of_ice_mass_due_to_forced_retreat", "kg s-1",
      "average mass rate of change by prescribed front retreat")
def _dmass_forced(w):
    return w.rho_i * w.d_forced_retreat / w.dt


@rate("tendency_of_ice_volume_due_to_conservation_error", "m3 s-1",
      "average volume rate of the non-negativity projection")
def _dvol_err(w):
    return w.d_nonneg / w.dt


@rate("tendency_of_ice_mass_due_to_conservation_error", "kg s-1",
      "average mass rate of the non-negativity projection")
def _dmass_err(w):
    return w.rho_i * w.d_nonneg / w.dt


def compute_rates(names, window: Window):
    return {n: RATE[n].func(window) for n in names}


# --------------------------------------------------------------------------
# interval-averaged spatial rate diagnostics (2D mass-budget fields)
# --------------------------------------------------------------------------
# PISM's -extra_vars budget fields (``tendency_of_ice_amount_due_to_*``,
# kg m-2 s-1, cell_methods "time: mean") come from per-cell conservation
# accumulators in GeometryEvolution; here they are carried in
# ``StepStats.cell`` (time-integrated thickness change per cell, m) and
# averaged over the reporting window.

class Window2D(NamedTuple):
    """Per-cell reporting-window deltas (thickness changes in m)."""
    dt: float
    d_thickness: object     # H(t) - H(t_prev)
    d_flow: object
    d_smb: object
    d_bmb: object
    d_nonneg: object
    d_discharge: object
    rho_i: float
    d_calving: object = None        # discharge split per mechanism
    d_frontal_melt: object = None
    d_forced_retreat: object = None
    d_topg: object = None   # topg(t) - topg(t_prev), for dbdt
    d_water: object = None  # (bwat+tillwat)(t) - previous, m, for
    #                         tendency_of_subglacial_water_mass
    cell_area: float = 1.0  # m2, for the per-cell kg s-1 "mass" variants


SPATIAL_RATE: Dict[str, Diagnostic] = {}


def spatial_rate(name, units, long_name, standard_name=""):
    def deco(fn):
        SPATIAL_RATE[name] = Diagnostic(fn, units, long_name, standard_name)
        return fn
    return deco


@spatial_rate("tendency_of_ice_amount", "kg m-2 s-1",
              "rate of change of ice amount over the reporting interval")
def _damount(w):
    return w.rho_i * w.d_thickness / w.dt


@spatial_rate("tendency_of_ice_amount_due_to_flow", "kg m-2 s-1",
              "average ice-amount rate of change due to flow")
def _damount_flow(w):
    return w.rho_i * w.d_flow / w.dt


@spatial_rate("tendency_of_ice_amount_due_to_surface_mass_flux", "kg m-2 s-1",
              "average effective surface mass flux",
              "land_ice_surface_specific_mass_balance_flux")
def _damount_smb(w):
    return w.rho_i * w.d_smb / w.dt


@spatial_rate("tendency_of_ice_amount_due_to_basal_mass_flux", "kg m-2 s-1",
              "average effective basal mass flux (negative = melt)",
              "land_ice_basal_specific_mass_balance_flux")
def _damount_bmb(w):
    return w.rho_i * w.d_bmb / w.dt


@spatial_rate("tendency_of_ice_amount_due_to_conservation_error",
              "kg m-2 s-1", "average non-negativity projection rate")
def _damount_err(w):
    return w.rho_i * w.d_nonneg / w.dt


@spatial_rate("tendency_of_ice_amount_due_to_discharge", "kg m-2 s-1",
              "average ice-amount rate of change by calving and front retreat",
              "land_ice_specific_mass_flux_due_to_calving_and_ice_front_melting")
def _damount_disch(w):
    return w.rho_i * w.d_discharge / w.dt


@spatial_rate("tendency_of_ice_amount_due_to_calving", "kg m-2 s-1",
              "average ice-amount rate of change by calving",
              "land_ice_specific_mass_flux_due_to_calving")
def _damount_calving(w):
    return w.rho_i * w.d_calving / w.dt


@spatial_rate("tendency_of_ice_amount_due_to_frontal_melt", "kg m-2 s-1",
              "average ice-amount rate of change by frontal-melt retreat")
def _damount_fm(w):
    return w.rho_i * w.d_frontal_melt / w.dt


@spatial_rate("tendency_of_ice_amount_due_to_forced_retreat", "kg m-2 s-1",
              "average ice-amount rate of change by prescribed front retreat")
def _damount_forced(w):
    return w.rho_i * w.d_forced_retreat / w.dt


# per-cell "mass" variants (kg s-1): the reference registers BOTH the
# specific (kg m-2 s-1, "amount") and the per-cell (kg s-1, "mass")
# versions of every budget field (src/geometry/GeometryEvolution.cc +
# src/icemodel/diagnostics.cc mass-flux groups)

def _mass_rate_variant(amount_name, long_name, standard_name=""):
    base = SPATIAL_RATE[amount_name].func
    name = amount_name.replace("ice_amount", "ice_mass")
    SPATIAL_RATE[name] = Diagnostic(
        lambda w, base=base: base(w) * w.cell_area,
        "kg s-1", long_name, standard_name)


for _amount, _ln in [
    ("tendency_of_ice_amount",
     "rate of change of ice mass per cell over the reporting interval"),
    ("tendency_of_ice_amount_due_to_flow",
     "average per-cell ice-mass rate of change due to flow"),
    ("tendency_of_ice_amount_due_to_surface_mass_flux",
     "average per-cell effective surface mass flux"),
    ("tendency_of_ice_amount_due_to_basal_mass_flux",
     "average per-cell effective basal mass flux (negative = melt)"),
    ("tendency_of_ice_amount_due_to_conservation_error",
     "average per-cell non-negativity projection mass rate"),
    ("tendency_of_ice_amount_due_to_discharge",
     "average per-cell mass rate of change by calving and front retreat"),
    ("tendency_of_ice_amount_due_to_calving",
     "average per-cell mass rate of change by calving"),
    ("tendency_of_ice_amount_due_to_frontal_melt",
     "average per-cell mass rate of change by frontal-melt retreat"),
    ("tendency_of_ice_amount_due_to_forced_retreat",
     "average per-cell mass rate of change by prescribed front retreat"),
]:
    _mass_rate_variant(_amount, _ln)


@spatial_rate("dbdt", "m s-1", "bedrock uplift rate",
              "tendency_of_bedrock_altitude")
def _dbdt(w):
    """Reference ``src/earth/BedDef.cc`` diagnostic ``dbdt`` (here the exact
    mean rate over the reporting window rather than an instantaneous
    sample)."""
    if w.d_topg is None:
        return jnp.zeros_like(jnp.asarray(w.d_thickness))
    return w.d_topg / w.dt


@spatial_rate("tendency_of_subglacial_water_mass", "kg m-2 s-1",
              "rate of change of the total subglacial water amount "
              "(transportable + till) over the reporting interval")
def _dwater(w):
    """Reference ``src/hydrology/Hydrology.cc`` mass-accounting diagnostic
    (there split into due_to_* terms from per-step accumulators; here the
    exact net window rate from water-amount snapshots)."""
    if w.d_water is None:
        return jnp.zeros_like(jnp.asarray(w.d_thickness))
    return 1000.0 * w.d_water / w.dt


def compute_spatial_rates(names, window: Window2D):
    return {n: SPATIAL_RATE[n].func(window) for n in names}


# --------------------------------------------------------------------------
# PICO diagnostics (reference ``src/coupler/ocean/Pico.cc`` ``diagnostics()``)
# and further geometry/bed-deformation parity fields
# --------------------------------------------------------------------------

def _find_coupler(chain, cls):
    """Walk a coupler modifier chain (``.inner`` links) for an instance of
    ``cls`` (reference: diagnostics attach to the concrete model even when
    it is wrapped in delta_T/anomaly/cache modifiers)."""
    m = chain
    while m is not None:
        if isinstance(m, cls):
            return m
        m = getattr(m, "inner", None)
    return None


def _pico(model):
    from ..coupler.pico import Pico
    return _find_coupler(model.ocean, Pico) if model.ocean is not None else None


def _pico_solve(p, state, t):
    """Run (or reuse) the PICO box-model solve for this (state, t).

    Writing the full pico_* diagnostic set would otherwise re-run the whole
    solve once per field; cache the last result keyed on the geometry object
    identity and the evaluation time (diagnostics are computed host-side, so
    ``t`` is concrete here)."""
    key = (id(state.geometry), float(t))
    cached = getattr(p, "_diag_solve_cache", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    fields = p.solve(state.geometry, t)
    p._diag_solve_cache = (key, fields)
    return fields


@spatial("pico_box_mask", "", "PICO ocean box index (0 outside ice shelves)")
def _pico_box(state, model, t):
    p = _pico(model)
    if p is None:
        return _zeros2(state)
    return _pico_solve(p, state, t).box


@spatial("pico_temperature_box", "K", "PICO ocean box water temperature")
def _pico_T(state, model, t):
    p = _pico(model)
    if p is None:
        return _zeros2(state)
    return _pico_solve(p, state, t).temperature


@spatial("pico_salinity_box", "g kg-1", "PICO ocean box water salinity")
def _pico_S(state, model, t):
    p = _pico(model)
    if p is None:
        return _zeros2(state)
    return _pico_solve(p, state, t).salinity


@spatial("pico_overturning", "m3 s-1", "PICO basin overturning flux")
def _pico_q(state, model, t):
    p = _pico(model)
    if p is None:
        return _zeros2(state)
    return _pico_solve(p, state, t).overturning


@spatial("pico_contshelf_mask", "",
         "PICO continental-shelf averaging domain mask")
def _pico_cont(state, model, t):
    p = _pico(model)
    if p is None:
        return _zeros2(state)
    return _pico_solve(p, state, t).contshelf.astype(
        state.geometry.ice_thickness.dtype)


@spatial("pico_basal_melt_rate", "m s-1",
         "PICO sub-shelf melt rate (ice equivalent)")
def _pico_melt(state, model, t):
    p = _pico(model)
    if p is None:
        return _zeros2(state)
    return _pico_solve(p, state, t).melt


@spatial("pico_basal_temperature", "K", "PICO shelf-base temperature")
def _pico_Tb(state, model, t):
    p = _pico(model)
    if p is None:
        return _zeros2(state)
    return _pico_solve(p, state, t).T_basal


@spatial("pico_shelf_mask", "",
         "ice-shelf numbering (connected floating components)")
def _pico_shelf_mask(state, model, t):
    """Label connected floating-shelf components by min-label flood fill
    (reference gathers the mask and labels serially; SURVEY.md §2.5)."""
    import jax
    g = state.geometry
    shelf = S.floating_ice(g.cell_type)
    My, Mx = shelf.shape
    idx = jnp.arange(1, My * Mx + 1, dtype=jnp.float32).reshape(My, Mx)
    big = jnp.float32(4.0e9)
    lab0 = jnp.where(shelf, idx, big)
    sh = model.sh

    def body(carry):
        lab, _ = carry
        nbr = jnp.minimum(jnp.minimum(sh(lab, 0, 1), sh(lab, 0, -1)),
                          jnp.minimum(sh(lab, 1, 0), sh(lab, -1, 0)))
        new = jnp.where(shelf, jnp.minimum(lab, nbr), lab)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda c: c[1], lambda c: body(c),
                                (lab0, jnp.asarray(True)))
    # compress raw min-indices to 1..n_shelves for readability. Pad the
    # fixed-size unique array with the `big` sentinel (not 0): zeros padded
    # at the END would leave the array unsorted and break searchsorted,
    # collapsing every shelf to label 1 when there is more than one.
    flat = jnp.where(shelf, lab, big).ravel()
    uniq = jnp.unique(flat, size=flat.shape[0], fill_value=big)
    rank_of = jnp.searchsorted(uniq, flat)
    out = (rank_of + 1).reshape(My, Mx)
    return jnp.where(shelf, out, 0).astype(g.ice_thickness.dtype)


@spatial("height_above_flotation", "m",
         "ice thickness in excess of the maximum floating thickness")
def _haf(state, model, t):
    """Reference ``src/icemodel/diagnostics.cc`` ``height_above_flotation``:
    H - (sea_level - bed) rho_ocean/rho_ice at marine grounded cells;
    negative for floating ice, H where the bed is above sea level."""
    g = state.geometry
    rho_o = model.config.get_number("constants.sea_water.density") \
        if model.config is not None else 1028.0
    depth = jnp.maximum(g.sea_level - g.bed_elevation, 0.0)
    H_float = depth * (rho_o / model.rho_i)
    return jnp.where(S.icy(g.cell_type),
                     g.ice_thickness - H_float, 0.0)


@spatial("ice_mass", "kg", "ice mass per cell")
def _ice_mass_2d(state, model, t):
    g = state.geometry
    return model.rho_i * g.ice_thickness * model.grid.dx * model.grid.dy


@spatial("ice_margin_pressure_difference", "Pa",
         "vertically-averaged pressure difference at the ice margin "
         "(ice overburden minus water column)")
def _margin_dp(state, model, t):
    """Reference ``src/icemodel/diagnostics.cc``: the net force imbalance
    entering the calving-front boundary condition, P_ice - P_water averaged
    over the ice column at margin cells."""
    from ..model.calving import front_mask
    g = state.geometry
    H = g.ice_thickness
    rho_o = model.config.get_number("constants.sea_water.density") \
        if model.config is not None else 1028.0
    gacc = model.config.get_number("constants.standard_gravity") \
        if model.config is not None else 9.81
    icy = S.icy(g.cell_type)
    open_water = (g.cell_type == S.MASK_ICE_FREE_OCEAN)
    margin = front_mask(icy, open_water, model.sh)
    depth = jnp.maximum(g.sea_level - g.bed_elevation, 0.0)
    hw = jnp.minimum(depth, H * model.rho_i / rho_o)   # submerged thickness
    P_ice = 0.5 * model.rho_i * gacc * H
    P_water = 0.5 * rho_o * gacc * hw ** 2 / jnp.maximum(H, 1e-3)
    return jnp.where(margin & (H > 0), P_ice - P_water, 0.0)


@spatial("viscous_bed_displacement", "m",
         "Lingle-Clark viscous half-space bed displacement (model state)")
def _viscous_bed(state, model, t):
    if state.bed_uplift is None:
        return _zeros2(state)
    return state.bed_uplift


@spatial("grounding_line_flux", "kg m-2 s-1",
         "per-cell ice flux across the grounding line (instantaneous; "
         "positive = grounded to floating)")
def _gl_flux_2d(state, model, t):
    """Reference ``src/geometry/grounding_line_flux.cc``: the reference
    accumulates the transport-step flux over the reporting window; here the
    instantaneous flux through grounded/floating faces scattered to cells."""
    from . import geometry_evolution as ge
    g = state.geometry
    sb = _sb(state, model, t)
    qe_adv, qn_adv = ge.advective_flux(sb.u_face_e, sb.v_face_n,
                                       g.ice_thickness, model.sh)
    qe = sb.qe + qe_adv
    qn = sb.qn + qn_adv
    grounded = S.grounded_ice(g.cell_type)
    floating = S.floating_ice(g.cell_type)
    sh = model.sh
    e_gf = grounded & sh(floating, 0, 1)
    e_fg = floating & sh(grounded, 0, 1)
    n_gf = grounded & sh(floating, 1, 0)
    n_fg = floating & sh(grounded, 1, 0)
    area = model.grid.dx * model.grid.dy
    per_cell = (jnp.where(e_gf, qe, 0.0) - jnp.where(e_fg, qe, 0.0)) \
        * model.grid.dy + \
        (jnp.where(n_gf, qn, 0.0) - jnp.where(n_fg, qn, 0.0)) * model.grid.dx
    return model.rho_i * per_cell / area


# --------------------------------------------------------------------------
# Vector diagnostics (reference: a single registered diagnostic that writes
# several component variables — e.g. ``velbar`` writes ``ubar`` and ``vbar``;
# ``src/stressbalance/StressBalance.cc`` diagnostics map). Requesting the
# combined name in ``-extra_vars`` expands to the component names.
# --------------------------------------------------------------------------

VECTOR: Dict[str, tuple] = {
    "velbar": ("ubar", "vbar"),
    "velsurf": ("uvelsurf", "vvelsurf"),
    "velbase": ("uvelbase", "vvelbase"),
    "vel_bc_values": ("u_bc", "v_bc"),
    "flux": ("uflux", "vflux"),
    "bwatvel": ("bwatvel_x", "bwatvel_y"),
    "taud": ("taud_x", "taud_y"),
    "taub": ("taub_x", "taub_y"),
    "strain_rates": ("eigen1", "eigen2"),
    "deviatoric_stresses": ("sigma_xx", "sigma_yy", "sigma_xy"),
    "flux_staggered": ("flux_staggered_e", "flux_staggered_n"),
    "diffusivity_staggered": ("diffusivity_staggered_e",
                              "diffusivity_staggered_n"),
    "surface_gradient": ("h_x", "h_y"),
    "vel3": ("uvel", "vvel", "wvel_rel"),
}


def expand_names(names):
    """Expand vector diagnostic names to their component variables,
    preserving order and de-duplicating (reference behavior: asking for
    ``velbar`` produces the ``ubar``/``vbar`` variables in the file)."""
    seen, out = set(), []
    for n in names:
        for c in VECTOR.get(n, (n,)):
            if c not in seen:
                seen.add(c)
                out.append(c)
    return tuple(out)


# parity families, part 2 (same registries)
from . import diagnostics_ext  # noqa: E402,F401
