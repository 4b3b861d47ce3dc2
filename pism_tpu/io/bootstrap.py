"""Bootstrapping: build a model state from heuristics + an input file on a
different grid.

Rebuild of PISM's ``-bootstrap`` path (``src/icemodel/initialization.cc``
``bootstrap_2d/3d`` + ``src/util/io/io_helpers.cc`` regridding): 2D input
fields (thickness, bed topography, climate fields) are read from a CF
NetCDF file on its own grid and bilinearly regridded onto the model grid
(native C++ regridder with numpy fallback); the 3D enthalpy is initialized
from the surface-temperature/geothermal-flux heuristic profile.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .. import native
from ..grid import Grid
from ..model.energy import bootstrap_enthalpy
from ..physics.enthalpy_converter import EnthalpyConverter
from ..state import ModelState, new_geometry
from .nc4 import File

#: PISM standard variable names consulted at bootstrap
DEFAULT_VARS = {
    "thk": "thk",
    "topg": "topg",
    "tillwat": "tillwat",
    "bwat": "bwat",
    "bmelt": "bmelt",
    "fracture_density": "fracture_density",
    "ice_surface_temp": "ice_surface_temp",
    "bheatflx": "bheatflx",
}


def read_and_regrid(path: str, grid: Grid, variables=None,
                    fill=np.nan,
                    allow_extrapolation: bool = False) -> Dict[str, np.ndarray]:
    """Read 2D (y, x) or (time, y, x) variables and regrid onto ``grid``.

    ``allow_extrapolation`` (reference grid.allow_extrapolation): model-grid
    points outside the file's extent take the nearest edge value instead of
    the fill value."""
    variables = variables or list(DEFAULT_VARS.values())
    gx, gy = grid.x, grid.y
    out = {}
    with File(path, "r") as f:
        xs = np.asarray(f.read("x"), float)
        ys = np.asarray(f.read("y"), float)
        if allow_extrapolation:
            gx = np.clip(grid.x, xs.min(), xs.max())
            gy = np.clip(grid.y, ys.min(), ys.max())
        for name in variables:
            if not f.has_variable(name):
                continue
            data = np.asarray(f.read(name), float)
            if data.ndim == 3:
                data = data[-1]
            out[name] = native.regrid_bilinear(data, xs, ys, gx, gy,
                                               fill=fill)
    return out


def latitude_from_projection(path: str, grid: Grid):
    """Latitude field [degrees N] computed from the file's projection
    metadata (reference ``grid.recompute_longitude_and_latitude`` role):
    a ``proj`` global attribute (PROJ string) or a CF grid-mapping
    variable. Returns None when the file carries neither."""
    from ..util import projection as prj

    ps = None
    with File(path, "r") as f:
        p = f.get_global_attr("proj") or f.get_global_attr("proj4")
        if p is not None:
            if isinstance(p, bytes):
                p = p.decode()
            try:
                ps = prj.from_proj_string(p)
            except ValueError:
                ps = None
        if ps is None:
            for name in list(f.variables()):
                attrs = dict(f.read_attrs(name))
                if "grid_mapping_name" in attrs \
                        or name == "polar_stereographic":
                    try:
                        ps = prj.from_cf_mapping(attrs)
                        break
                    except ValueError:
                        continue
    if ps is None:
        return None
    _, lat = prj.lonlat_for_grid(grid, ps)
    return lat


def lonlat_from_projection(path: str, grid: Grid):
    """(lon, lat) fields [degrees] from the file's projection metadata, or
    (None, None) — the two-field variant of :func:`latitude_from_projection`
    (SeaRISE-Greenland atmosphere needs both)."""
    from ..util import projection as prj

    ps = None
    with File(path, "r") as f:
        p = f.get_global_attr("proj") or f.get_global_attr("proj4")
        if p is not None:
            if isinstance(p, bytes):
                p = p.decode()
            try:
                ps = prj.from_proj_string(p)
            except ValueError:
                ps = None
        if ps is None:
            for name in list(f.variables()):
                attrs = dict(f.read_attrs(name))
                if "grid_mapping_name" in attrs \
                        or name == "polar_stereographic":
                    try:
                        ps = prj.from_cf_mapping(attrs)
                        break
                    except ValueError:
                        continue
    if ps is None:
        return None, None
    return prj.lonlat_for_grid(grid, ps)


#: internal target units per forcing variable (PISM I/O conventions:
#: temperatures in K, mass fluxes in m/s ice equivalent, salinity g/kg)
_FORCING_UNITS = {
    "air_temp": "K",
    "ice_surface_temp": "K",
    "shelf_base_temperature": "K",
    "theta_ocean": "K",
    "precipitation": "flux",
    "climatic_mass_balance": "flux",
    "shelf_base_mass_flux": "flux",
}


def _convert_forcing(data, units, kind, rho_i):
    """Convert a raw forcing field to internal units; mass fluxes given as
    kg m-2 *-1 are divided by the ice density (as PISM's I/O layer does)."""
    from ..util import units as U
    units = (units or "").strip()
    if kind == "K":
        if not units or units == "K" or units.lower() == "kelvin":
            return data
        return U.convert(data, units, "K")
    if kind == "flux":
        if not units:
            return data                       # assume m s-1 ice equivalent
        u = U.Unit.parse(units)
        if u.is_convertible(U.Unit.parse("kg m-2 s-1")):
            return U.convert(data, units, "kg m-2 s-1") / rho_i
        return U.convert(data, units, "m s-1")
    return data


def read_forcing_fields(path: str, grid: Grid, variables,
                        time_name: str = "time", rho_i: float = 910.0,
                        calendar: str = "365_day",
                        reference_date: str = "1-1-1"):
    """Read forcing fields for the coupler factories: each variable is a
    single ``(y, x)`` slice or a ``(time, y, x)`` stack, regridded onto the
    model grid slice by slice and converted to internal units (reference
    role: ``io_helpers.cc`` regridding inside the ``Given`` couplers).

    Returns ``(fields, times)`` with ``times`` in model seconds (or None
    when the file has no time axis). Dated CF time axes ("days since
    1980-1-1") are aligned to model time under the run calendar and
    ``time.reference_date`` (reference Time.cc + calcalcs role)."""
    from ..util.timecal import parse_time_units
    out = {}
    times = None
    with File(path, "r") as f:
        xs = np.asarray(f.read("x"), float)
        ys = np.asarray(f.read("y"), float)
        if f.has_variable(time_name):
            times = np.asarray(f.read(time_name), float)
            t_units = dict(f.read_attrs(time_name)).get("units", b"seconds")
            if isinstance(t_units, bytes):
                t_units = t_units.decode()
            scale, offset = parse_time_units(str(t_units), calendar,
                                             reference_date)
            times = times * scale + offset
        for name in variables:
            if not f.has_variable(name):
                continue
            data = np.asarray(f.read(name), float)
            units = dict(f.read_attrs(name)).get("units", "")
            if isinstance(units, bytes):
                units = units.decode()
            data = _convert_forcing(data, units, _FORCING_UNITS.get(name),
                                    rho_i)
            if data.ndim == 3:
                data = np.stack([
                    native.regrid_bilinear(d, xs, ys, grid.x, grid.y,
                                           fill=np.nan) for d in data])
            else:
                data = native.regrid_bilinear(data, xs, ys, grid.x, grid.y,
                                              fill=np.nan)
            out[name] = data
    return out, times


def bootstrap(path: str, grid: Grid, config) -> ModelState:
    """PISM ``-i file.nc -bootstrap``: regrid 2D inputs, apply heuristics
    for everything else."""
    fields = read_and_regrid(
        path, grid,
        allow_extrapolation=config.get_flag("grid.allow_extrapolation"))
    # missing-variable fallbacks (reference bootstrapping.defaults.*)
    d_thk = config.get_number("bootstrapping.defaults.ice_thickness")
    d_bed = config.get_number("bootstrapping.defaults.bed")
    if "thk" not in fields:
        fields["thk"] = np.full(grid.shape2, d_thk)
    H = np.nan_to_num(fields["thk"], nan=d_thk)
    bed = np.nan_to_num(fields.get("topg", np.full_like(H, d_bed)),
                        nan=d_bed)

    geom = new_geometry(
        jnp.asarray(np.maximum(H, 0.0)), jnp.asarray(bed),
        ice_density=config.get_number("constants.ice.density"),
        ocean_density=config.get_number("constants.sea_water.density"),
        ice_free_thickness=config.get_number("geometry.ice_free_thickness_standard"))

    kw = {}
    d_tillwat = config.get_number("bootstrapping.defaults.tillwat")
    if "tillwat" in fields:
        kw["tillwat"] = jnp.asarray(
            np.nan_to_num(fields["tillwat"], nan=d_tillwat))
    elif d_tillwat > 0.0:
        kw["tillwat"] = jnp.full(grid.shape2, d_tillwat)
    d_bwat = config.get_number("bootstrapping.defaults.bwat")
    if "bwat" in fields:
        kw["hydro_W"] = jnp.asarray(
            np.nan_to_num(fields["bwat"], nan=d_bwat))
    elif d_bwat > 0.0:
        kw["hydro_W"] = jnp.full(grid.shape2, d_bwat)
    if "fracture_density" in fields:
        kw["fracture_density"] = jnp.asarray(np.nan_to_num(
            fields["fracture_density"],
            nan=config.get_number("bootstrapping.defaults.fracture_density")))
    d_bmelt = config.get_number("bootstrapping.defaults.bmelt")
    if "bmelt" in fields:
        kw["basal_melt_rate"] = jnp.asarray(
            np.nan_to_num(fields["bmelt"], nan=d_bmelt))
    G_default = config.get_number("bootstrapping.defaults.geothermal_flux")
    if "bheatflx" in fields:
        # 2D geothermal flux map (PISM reads ``bheatflx`` at bootstrap and
        # carries it as model state)
        kw["geothermal_flux"] = jnp.asarray(
            np.nan_to_num(fields["bheatflx"], nan=G_default))

    if config.get_string("energy.model") in ("enthalpy", "cold") and grid.Mz > 1:
        T_sfc = fields.get(
            "ice_surface_temp",
            np.full(grid.shape2,
                    config.get_number("bootstrapping.defaults.ice_surface_temp")))
        T_sfc = np.nan_to_num(
            T_sfc, nan=config.get_number("bootstrapping.defaults.ice_surface_temp"))
        if not config.get_flag("energy.allow_temperature_above_melting"):
            # the reference rejects above-pressure-melting ice temperatures
            # unless energy.allow_temperature_above_melting; the 2D surface
            # Dirichlet value is capped at the melting point (above-melting
            # margins are common in real forcing files and carry no meaning
            # for ice enthalpy)
            T_sfc = np.minimum(T_sfc, 273.15)
        EC = EnthalpyConverter.from_config(config)
        heuristic = config.get_string("bootstrapping.temperature_heuristic")
        smb = None
        if heuristic == "smb":
            # the SMB-aware Robin profile wants an accumulation field; use
            # climatic_mass_balance from the bootstrap file when present
            try:
                fsmb, _ = read_forcing_fields(path, grid,
                                              ["climatic_mass_balance"])
                if "climatic_mass_balance" in fsmb:
                    a = np.asarray(fsmb["climatic_mass_balance"])
                    smb = jnp.asarray(np.nan_to_num(
                        a[-1] if a.ndim == 3 else a))
            except Exception:
                smb = None
        kw["enthalpy"] = bootstrap_enthalpy(
            grid, EC, geom.ice_thickness, jnp.asarray(T_sfc), smb=smb,
            geothermal=kw.get("geothermal_flux", G_default),
            k_i=config.get_number("constants.ice.thermal_conductivity"),
            heuristic=heuristic,
            rho=config.get_number("constants.ice.density"),
            c_i=config.get_number("constants.ice.specific_heat_capacity"))
        kw.setdefault("basal_melt_rate", jnp.zeros(grid.shape2))

    return ModelState(geometry=geom, **kw)
