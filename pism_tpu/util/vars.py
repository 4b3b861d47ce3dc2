"""Named-variable dictionary (PISM ``Vars`` + ``VariableMetadata``).

Rebuild of ``src/util/Vars.cc`` / ``src/util/VariableMetadata.cc``: a global
name -> field dictionary with CF metadata, used by diagnostics, couplers and
writers to look fields up by their standard (PISM/CF) names instead of
reaching into component internals. Here the model state is an immutable
pytree, so ``Vars`` is a *view*: it resolves a name to an accessor on
``ModelState`` (or to a registered diagnostic) at lookup time — no aliasing
or lifetime management needed.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional


@dataclass(frozen=True)
class VariableMetadata:
    """CF attributes of one model variable (PISM ``SpatialVariableMetadata``)."""
    name: str
    units: str
    long_name: str
    standard_name: str = ""
    ndim: int = 2          # spatial rank (2 = map-plane, 3 = column)


#: state accessors keyed by PISM variable name
_STATE_ACCESSORS: Dict[str, Callable] = {}
_METADATA: Dict[str, VariableMetadata] = {}


def register(name, units, long_name, standard_name="", ndim=2):
    """Register an accessor ``fn(state) -> array`` under a PISM name."""
    def deco(fn):
        _STATE_ACCESSORS[name] = fn
        _METADATA[name] = VariableMetadata(name, units, long_name,
                                           standard_name, ndim)
        return fn
    return deco


@register("thk", "m", "land ice thickness", "land_ice_thickness")
def _thk(state):
    return state.geometry.ice_thickness


@register("topg", "m", "bedrock surface elevation", "bedrock_altitude")
def _topg(state):
    return state.geometry.bed_elevation


@register("usurf", "m", "ice upper surface elevation", "surface_altitude")
def _usurf(state):
    return state.geometry.ice_surface_elevation


@register("mask", "", "ice-type (ice-free/grounded/floating/ocean) mask")
def _mask(state):
    return state.geometry.cell_type


@register("sea_level", "m", "sea level elevation",
          "sea_surface_height_above_reference_ellipsoid")
def _sea_level(state):
    return state.geometry.sea_level

@register("sftgrf", "1", "grounded ice sheet area fraction",
          "grounded_ice_sheet_area_fraction")
def _sftgrf(state):
    return state.geometry.cell_grounded_fraction


@register("Href", "m", "partially-filled cell reference thickness")
def _href(state):
    return state.geometry.ice_area_specific_volume


@register("enthalpy", "J kg-1", "ice enthalpy", ndim=3)
def _enthalpy(state):
    return state.enthalpy


@register("age", "s", "age of the ice", "age_of_ice", ndim=3)
def _age(state):
    return state.age


@register("u_ssa", "m s-1", "SSA x-velocity")
def _u_ssa(state):
    return state.u_ssa


@register("v_ssa", "m s-1", "SSA y-velocity")
def _v_ssa(state):
    return state.v_ssa


@register("bmelt", "m s-1", "basal melt rate (ice equivalent)",
          "land_ice_basal_melt_rate")
def _bmelt(state):
    return state.basal_melt_rate


@register("tillwat", "m", "effective till water layer thickness")
def _tillwat(state):
    return state.tillwat


@register("bwat", "m", "transportable subglacial water thickness")
def _bwat(state):
    return state.hydro_W


@register("bwp", "Pa", "subglacial water pressure")
def _bwp(state):
    return state.hydro_P


@register("till_phi", "degrees", "till friction angle")
def _till_phi(state):
    return state.till_phi


@register("fracture_density", "1", "ice fracture density")
def _fracture(state):
    return state.fracture_density


class Vars:
    """Name -> field view over a model state + the diagnostics registry
    (PISM ``Vars``). ``get`` raises KeyError with the available names; use
    ``model``/``t`` for diagnostics that need them."""

    def __init__(self, state, model=None, t=0.0):
        self.state = state
        self.model = model
        self.t = t

    @staticmethod
    def available():
        from ..model import diagnostics as diag
        return sorted(set(_STATE_ACCESSORS) | set(diag.SPATIAL))

    @staticmethod
    def metadata(name) -> VariableMetadata:
        if name in _METADATA:
            return _METADATA[name]
        from ..model import diagnostics as diag
        if name in diag.SPATIAL:
            d = diag.SPATIAL[name]
            return VariableMetadata(name, d.units, d.long_name,
                                    d.standard_name)
        raise KeyError(name)

    def is_available(self, name) -> bool:
        try:
            return self.get(name) is not None
        except KeyError:
            return False

    def get(self, name):
        if name in _STATE_ACCESSORS:
            return _STATE_ACCESSORS[name](self.state)
        from ..model import diagnostics as diag
        if name in diag.SPATIAL:
            if self.model is None:
                raise KeyError(f"{name!r} is a diagnostic; Vars needs a "
                               "model to compute it")
            return diag.SPATIAL[name].func(self.state, self.model, self.t)
        raise KeyError(f"unknown variable {name!r}; available: "
                       + ", ".join(self.available()))
