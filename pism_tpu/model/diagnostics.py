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
    sb = model.stress_balance.update(state)
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
    sb = model.stress_balance.update(state)
    return jnp.maximum(sb.qe * 0 + sb.max_diffusivity, 0.0)


@spatial("velbase_mag", "m s-1", "magnitude of basal horizontal velocity")
def _velbase(state, model, t):
    sb = model.stress_balance.update(state)
    if sb.sia3 is not None:
        return jnp.sqrt(sb.sia3.u[..., 0] ** 2 + sb.sia3.v[..., 0] ** 2)
    return _velbar(state, model, t)


@spatial("uvelsurf", "m s-1", "x-component of surface velocity")
def _usurfvel(state, model, t):
    sb = model.stress_balance.update(state)
    if sb.sia3 is not None:
        return sb.sia3.u[..., -1]
    return sb.u_base


@spatial("vvelsurf", "m s-1", "y-component of surface velocity")
def _vsurfvel(state, model, t):
    sb = model.stress_balance.update(state)
    if sb.sia3 is not None:
        return sb.sia3.v[..., -1]
    return sb.v_base


@spatial("wvelsurf", "m s-1", "vertical velocity at the ice surface")
def _wsurfvel(state, model, t):
    sb = model.stress_balance.update(state)
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
    sb = model.stress_balance.update(state)
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


def compute_spatial(names, state, model, t):
    return {n: SPATIAL[n].func(state, model, t) for n in names}


def compute_scalar(names, state, model, t):
    return {n: SCALAR[n].func(state, model, t) for n in names}
