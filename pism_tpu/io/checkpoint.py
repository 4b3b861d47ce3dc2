"""Model-state checkpointing to CF/NetCDF-4 files.

Mirrors the reference's design: PISM's output NetCDF *is* the checkpoint —
every component declares its model state, ``-i file.nc`` restores exactly,
and regression tests assert restart == uninterrupted run (SURVEY.md §5.4).
Here the full ``ModelState`` pytree is written with PISM's variable names
and CF metadata; ``load_state`` reconstructs it bit-exactly (arrays are
stored in their native dtype). The full config is stored as a JSON global
attribute (PISM stores its config in output attrs).

Layout: 2D fields (time, y, x); 3D fields (time, y, x, z) with z = height
above the ice base (PISM convention).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import state as S
from ..config.config import Config
from ..grid import Grid
from .nc4 import File

#: ModelState field -> (variable name, CF attrs, rank)
_STATE_VARS = {
    "enthalpy": ("enthalpy", {"units": "J kg-1", "long_name": "ice enthalpy"}, 3),
    "bedrock_temperature": ("litho_temp", {"units": "K"}, 3),
    "basal_melt_rate": ("bmelt", {"units": "m s-1",
                                  "standard_name": "land_ice_basal_melt_rate"}, 2),
    "u_ssa": ("u_ssa", {"units": "m s-1"}, 2),
    "v_ssa": ("v_ssa", {"units": "m s-1"}, 2),
    "tillwat": ("tillwat", {"units": "m"}, 2),
    "till_phi": ("tillphi", {"units": "degrees"}, 2),
    "hydro_W": ("bwat", {"units": "m"}, 2),
    "hydro_P": ("bwp", {"units": "Pa"}, 2),
    "hydro_Q": ("bwatflux", {"units": "m2 s-1"}, 2),
    "age": ("age", {"units": "s"}, 3),
    "ch_enthalpy": ("ch_enthalpy", {"units": "J kg-1", "long_name":
                                    "cryo-hydrologic system enthalpy"}, 3),
    "bed_uplift": ("viscous_bed_displacement", {"units": "m"}, 2),
    "bed_load_reference": ("bed_def_load_reference", {"units": "m"}, 2),
    "bed_reference": ("bed_def_reference", {"units": "m"}, 2),
    "fracture_density": ("fracture_density", {"units": "1"}, 2),
    "fracture_age": ("fracture_age", {"units": "s", "long_name":
                                      "age of the fractures"}, 2),
    "geothermal_flux": ("bheatflx", {"units": "W m-2", "long_name":
                                     "upward geothermal flux at the bedrock "
                                     "thermal layer base"}, 2),
    "snow_depth": ("snow_depth", {"units": "m", "long_name":
                                  "PDD snow depth (melt bookkeeping)"}, 2),
    "firn_depth": ("firn_depth", {"units": "m", "long_name":
                                  "PDD firn depth (melt bookkeeping)"}, 2),
    "surface_albedo": ("albedo", {"units": "1", "long_name":
                                  "dEBM-simple surface albedo"}, 2),
}


def _setup_dims(f: File, grid: Grid, config: Optional[Config] = None):
    # time axis attrs follow the run calendar (reference Time.cc: the time
    # axis carries time.calendar / time.reference_date)
    units, cal = "seconds since 1-1-1", "365_day"
    if config is not None:
        cal = config.get_string("time.calendar")
        units = "seconds since " + config.get_string("time.reference_date")
    f.define_dimension("time", None, attrs={
        "units": units, "calendar": cal, "axis": "T"})
    f.define_dimension("y", grid.My, grid.y, attrs={
        "units": "m", "axis": "Y", "standard_name": "projection_y_coordinate"})
    f.define_dimension("x", grid.Mx, grid.x, attrs={
        "units": "m", "axis": "X", "standard_name": "projection_x_coordinate"})
    if grid.Mz > 1:
        f.define_dimension("z", grid.Mz, grid.z, attrs={
            "units": "m", "axis": "Z", "positive": "up",
            "long_name": "height above ice base"})
    if grid.Mbz > 1:
        f.define_dimension("zb", grid.Mbz, grid.zb, attrs={
            "units": "m", "axis": "Z", "positive": "up"})


def save_state(path: str, state: S.ModelState, grid: Grid, t: float,
               config: Optional[Config] = None, format: str = "netcdf4",
               extra_2d: Optional[dict] = None):
    """``format="netcdf3"`` writes classic CDF-2 (PISM ``-o_format``).

    extra_2d: extra time-independent 2D fields ``{name: (array, attrs)}``
    (regional no_model_mask/usurfstore/thkstore, PISM behavior)."""
    with File(path, "w", format=format) as f:
        _setup_dims(f, grid, config)
        n = f.append_time(t)
        g = state.geometry
        f.write("thk", np.asarray(g.ice_thickness)[None], ("time", "y", "x"),
                {"units": "m", "standard_name": "land_ice_thickness"}, time_index=n)
        f.write("topg", np.asarray(g.bed_elevation)[None], ("time", "y", "x"),
                {"units": "m", "standard_name": "bedrock_altitude"}, time_index=n)
        f.write("sea_level", np.asarray(g.sea_level)[None], ("time", "y", "x"),
                {"units": "m"}, time_index=n)
        f.write("Href", np.asarray(g.ice_area_specific_volume)[None],
                ("time", "y", "x"), {"units": "m"}, time_index=n)
        f.write("usurf", np.asarray(g.ice_surface_elevation)[None],
                ("time", "y", "x"),
                {"units": "m", "standard_name": "surface_altitude"}, time_index=n)
        f.write("mask", np.asarray(g.cell_type)[None], ("time", "y", "x"),
                {"long_name": "ice-type (ice-free/grounded/floating/ocean)"},
                time_index=n)
        for field, (var, attrs, rank) in _STATE_VARS.items():
            val = getattr(state, field)
            if val is None:
                continue
            dims = ("time", "y", "x") if rank == 2 else ("time", "y", "x", "z")
            if field == "bedrock_temperature":
                dims = ("time", "y", "x", "zb")
            f.write(var, np.asarray(val)[None], dims, attrs, time_index=n)
        if extra_2d:
            for name, (arr, attrs) in extra_2d.items():
                f.write(name, np.asarray(arr, np.float64), ("y", "x"),
                        attrs or {})
        if state.iso_layers is not None:
            f.define_dimension("nl", int(state.iso_layers.shape[-1]))
            f.write("isochronal_layer_thickness", np.asarray(state.iso_layers)[None],
                    ("time", "y", "x", "nl"), {"units": "m"}, time_index=n)
            f.set_global_attr("iso_top", int(state.iso_top))
        if config is not None:
            f.set_global_attr("pism_config", config.to_json())
            proj = config.get_string("grid.projection")
            if proj:
                # PISM stores the mapping and mandatory lat/lon in every
                # output file; recompute them from the PROJ string
                from ..util import projection as prj
                try:
                    ps = prj.from_proj_string(proj)
                except ValueError:
                    ps = None
                f.set_global_attr("proj", proj)
                if ps is not None:
                    lon, lat = prj.lonlat_for_grid(grid, ps)
                    f.write("lat", lat, ("y", "x"),
                            {"units": "degrees_north",
                             "standard_name": "latitude",
                             "bounds": "lat_bnds"})
                    f.write("lon", lon, ("y", "x"),
                            {"units": "degrees_east",
                             "standard_name": "longitude",
                             "bounds": "lon_bnds"})
                    # CF cell bounds (reference projection.cc
                    # compute_cell_bounds role)
                    lon_b, lat_b = prj.lonlat_bounds_for_grid(grid, ps)
                    if "nv4" not in f.h5:
                        f.define_dimension("nv4", 4)
                    f.write("lat_bnds", lat_b, ("y", "x", "nv4"),
                            {"units": "degrees_north"})
                    f.write("lon_bnds", lon_b, ("y", "x", "nv4"),
                            {"units": "degrees_east"})
        f.set_global_attr("source", "pism_tpu")
        f.set_global_attr("grid_json", _grid_json(grid))
        if config is not None:
            # reference run_info.*: provenance attributes in every output
            for key, attr in (("run_info.title", "title"),
                              ("run_info.institution", "institution"),
                              ("run_info.command", "command")):
                val = config.get_string(key)
                if val:
                    f.set_global_attr(attr, val)


def _grid_json(grid: Grid) -> str:
    import json
    return json.dumps({
        "Mx": grid.Mx, "My": grid.My, "Mz": grid.Mz, "Mbz": grid.Mbz,
        "Lx": grid.Lx, "Ly": grid.Ly, "Lz": grid.Lz, "Lbz": grid.Lbz,
        "x0": grid.x0, "y0": grid.y0,
        "vertical_spacing": grid.vertical_spacing, "lam": grid.lam,
        "periodicity": grid.periodicity,
    })


def load_grid(path: str) -> Grid:
    import json
    with File(path, "r") as f:
        return Grid(**json.loads(f.get_global_attr("grid_json")))


def load_config(path: str) -> Config:
    with File(path, "r") as f:
        s = f.get_global_attr("pism_config")
    return Config.from_json(s) if s else Config()


def load_state(path: str, config: Optional[Config] = None):
    """Returns (state, t). Bit-exact restore of everything saved.

    Fields are cast to the configured ``runtime.float_dtype``: an f32 run's
    state is stored in f64 NetCDF variables, so the cast back is
    value-exact; NOT casting would silently promote a restarted f32 run
    (and its jitted while_loop carries) to f64."""
    cfg = config or load_config(path)
    fdt = jnp.float32 \
        if cfg.get_string("runtime.float_dtype") == "float32" \
        else jnp.float64
    with File(path, "r") as f:
        t = float(f.read("time")[-1])
        H = jnp.asarray(f.read("thk")[-1], fdt)
        bed = jnp.asarray(f.read("topg")[-1], fdt)
        sl = jnp.asarray(f.read("sea_level")[-1], fdt)
        Href = jnp.asarray(f.read("Href")[-1], fdt)
        geom = S.new_geometry(
            H, bed, sea_level=sl, Href=Href,
            ice_density=cfg.get_number("constants.ice.density"),
            ocean_density=cfg.get_number("constants.sea_water.density"),
            ice_free_thickness=cfg.get_number("geometry.ice_free_thickness_standard"),
            subgl=cfg.get_flag("geometry.grounded_cell_fraction"))
        kw = {}
        for field, (var, _, _) in _STATE_VARS.items():
            if f.has_variable(var):
                kw[field] = jnp.asarray(f.read(var)[-1], fdt)
        if f.has_variable("isochronal_layer_thickness"):
            kw["iso_layers"] = jnp.asarray(
                f.read("isochronal_layer_thickness")[-1], fdt)
            kw["iso_top"] = jnp.asarray(int(f.get_global_attr("iso_top")),
                                        jnp.int32)
        return S.ModelState(geometry=geom, **kw), t


# -- output-size presets (PISM -o_size; reference output.sizes lists) -------

O_SIZE_MEDIUM = (
    "velsurf_mag", "velbase_mag", "velbar_mag", "taud_mag", "tauc",
    "bmelt", "tillwat", "temppabase", "diffusivity",
    "climatic_mass_balance", "ice_surface_temp", "sftgif", "sftgrf",
    "sftflf", "flux_mag")
O_SIZE_BIG = O_SIZE_MEDIUM + (
    "temp", "temppa", "liqfrac", "uvel", "vvel", "wvel_rel",
    "strainheating")


def append_diagnostics(path: str, names, state, model, t: float):
    """Append spatial diagnostics to an existing state file (the -o_size
    medium/big variable sets; PISM writes these into the output file on top
    of the model state). Diagnostics whose inputs are absent from this run
    (e.g. 3D temperature with energy.model=none) are skipped."""
    from ..model import diagnostics as dg

    values = {}
    for name in names:
        if name not in dg.SPATIAL:
            continue
        try:
            v = np.asarray(dg.SPATIAL[name].func(state, model, t))
        except (TypeError, AttributeError):
            continue    # needs a field this configuration doesn't carry
        if v.size and np.isnan(v).all():
            continue    # undefined for this configuration
        values[name] = v
    with File(path, "a") as f:
        for name, v in values.items():
            d = dg.SPATIAL[name]
            dims = ("time", "y", "x") if v.ndim == 2 else ("time", "y", "x", "z")
            if v.ndim == 3 and "z" not in f.h5:
                f.define_dimension("z", model.grid.Mz, model.grid.z, attrs={
                    "units": "m", "axis": "Z", "positive": "up"})
            f.write(name, v[None], dims,
                    {"units": d.units, "long_name": d.long_name},
                    time_index=0)
