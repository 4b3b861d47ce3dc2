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


def compute_spatial(names, state, model, t):
    return {n: SPATIAL[n].func(state, model, t) for n in names}


def compute_scalar(names, state, model, t):
    return {n: SCALAR[n].func(state, model, t) for n in names}
