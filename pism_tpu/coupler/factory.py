"""Coupler factories: build atmosphere/surface/ocean/sea-level model chains
from config strings.

Rebuild of PISM ``src/coupler/util/PCFactory.hh``: the reference selects
boundary models with ``-atmosphere given,delta_T -surface pdd -ocean
pico,cache`` style comma chains — the first entry is the base model, the
rest are modifiers applied left to right. The reference reads the models'
input fields from NetCDF files named in other options; here file I/O is a
separate concern (``io/bootstrap.py``), so factories take an ``inputs``
dict of already-loaded device arrays / forcing callables keyed by the
PISM-ish names documented per model below. Models whose required inputs
are missing raise with the key name, mirroring PISM's "option requires
..." errors.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

from ..config.parameters import PARAMETERS
from . import atmosphere as _atm
from . import frontalmelt as _fm
from . import ocean as _ocn
from . import sealevel as _sl
from . import surface as _srf


def _cf_cal(config):
    return config.get_string("time.calendar")


def _cf_ref(config):
    return config.get_string("time.reference_date")


def _split(chain: str):
    parts = [p.strip() for p in chain.split(",") if p.strip()]
    if not parts:
        raise ValueError("empty coupler model chain")
    return parts[0], parts[1:]


def _need(inputs: Mapping, key: str, model: str):
    if key not in inputs:
        raise ValueError(f"coupler model {model!r} requires input {key!r}")
    return inputs[key]


# ---------------------------------------------------------------- atmosphere
def atmosphere_from_config(config, inputs: Optional[Mapping] = None,
                           grid=None):
    """Build the atmosphere chain from ``atmosphere.models``.

    Bases: ``uniform`` | ``given`` (air_temp, precipitation) |
    ``searise_greenland`` (latitude, longitude, precipitation) |
    ``pik`` (latitude, precipitation; Martin et al. 2011 Antarctic
    parameterization) |
    ``yearly_cycle`` (air_temp_mean_annual, air_temp_mean_summer,
    precipitation [, scaling]) | ``one_station`` (air_temp(t), precipitation(t)).
    Modifiers: ``elevation_change`` (reference_surface), ``delta_T``
    (delta_T forcing), ``frac_P`` (frac_P forcing), ``precip_scaling``
    (delta_T forcing), ``anomaly`` (air_temp_anomaly / precipitation_anomaly),
    ``orographic_precipitation`` (Smith-Barstad LTOP over the evolving
    surface; needs ``grid``).
    """
    inputs = inputs or {}
    chain = config.get_string("atmosphere.models")
    base, mods = _split(chain)

    if base == "uniform":
        # precipitation is configured as a mass flux [kg m-2 year-1];
        # internal precipitation is ice-equivalent [m s-1] (divide by the
        # ice density, as PISM's I/O layer does)
        rho_i = config.get_number("constants.ice.density")
        model = _atm.Uniform(
            temperature=config.get_number("atmosphere.uniform.temperature"),
            precipitation=config.get_number(
                "atmosphere.uniform.precipitation", "kg m-2 s-1") / rho_i)
    elif base == "given":
        model = _atm.Given(
            temperature=_need(inputs, "air_temp", base),
            precipitation=_need(inputs, "precipitation", base),
            temperature_july=inputs.get("air_temp_summer"),
            times=inputs.get("times"),
            period=stack_period(config, "atmosphere.given",
                                inputs.get("times")))
    elif base == "searise_greenland":
        model = _atm.SeariseGreenland(
            latitude=_need(inputs, "latitude", base),
            longitude=_need(inputs, "longitude", base),
            precipitation=_need(inputs, "precipitation", base),
            config=config)
    elif base == "yearly_cycle":
        model = _atm.CosineYearlyCycle(
            temperature_mean_annual=_need(inputs, "air_temp_mean_annual", base),
            temperature_mean_summer=_need(inputs, "air_temp_mean_summer", base),
            precipitation=_need(inputs, "precipitation", base),
            scaling=inputs.get("scaling"))
    elif base == "pik":
        model = _atm.PIK(
            latitude=_need(inputs, "latitude", base),
            precipitation=_need(inputs, "precipitation", base),
            parameterization=config.get_string(
                "atmosphere.pik.parameterization"))
    elif base == "one_station":
        model = _atm.WeatherStation(
            temperature=_need(inputs, "air_temp", base),
            precipitation=_need(inputs, "precipitation", base))
    else:
        raise ValueError(f"unknown atmosphere model {base!r}")
    # summer peak day of the cosine annual cycle (reference
    # atmosphere.fausto_air_temp.summer_peak_day)
    model.summer_peak_day = config.get_number(
        "atmosphere.fausto_air_temp.summer_peak_day")

    for mod in mods:
        if mod == "elevation_change":
            method = config.get_string(
                "atmosphere.elevation_change.precipitation.method")
            model = _atm.ElevationChange(
                inner=model,
                reference_surface=_need(inputs, "reference_surface", mod),
                lapse_rate=config.get_number(
                    "atmosphere.elevation_change.temperature_lapse_rate"),
                precip_scale_factor=config.get_number(
                    "atmosphere.precip_exponential_factor_for_temperature")
                if method == "scale" else 0.0,
                precip_lapse_rate=config.get_number(
                    "atmosphere.elevation_change.precipitation.lapse_rate")
                if method == "shift" else 0.0)
        elif mod == "delta_T":
            model = _atm.DeltaT(inner=model,
                                offset=_need(inputs, "delta_T", mod))
        elif mod == "delta_P":
            model = _atm.DeltaP(inner=model,
                                offset=_need(inputs, "delta_P", mod))
        elif mod == "frac_P":
            model = _atm.FracP(inner=model,
                               fraction=_need(inputs, "frac_P", mod))
        elif mod == "precip_scaling":
            model = _atm.PrecipitationScaling(
                inner=model, delta_T=_need(inputs, "delta_T", mod),
                exp_factor=config.get_number(
                    "atmosphere.precip_exponential_factor_for_temperature"))
        elif mod == "anomaly":
            model = _atm.Anomaly(
                inner=model,
                temp_anomaly=inputs.get("air_temp_anomaly"),
                precip_anomaly=inputs.get("precipitation_anomaly"),
                times=inputs.get("anomaly_times"),
                period=stack_period(config, "atmosphere.anomaly",
                                    inputs.get("anomaly_times")))
        elif mod == "orographic_precipitation":
            from .orographic import OrographicModifier, orographic_from_config
            if grid is None:
                raise ValueError(
                    "atmosphere modifier 'orographic_precipitation' needs "
                    "the grid (FFT wavenumbers)")
            model = OrographicModifier(
                inner=model, ltop=orographic_from_config(grid, config))
        else:
            raise ValueError(f"unknown atmosphere modifier {mod!r}")
    return model


# ---------------------------------------------------------------- surface
def surface_from_config(config, inputs: Optional[Mapping] = None,
                        atmosphere=None):
    """Build the surface chain from ``surface.models``.

    Bases: ``simple`` | ``uniform`` | ``given`` (climatic_mass_balance,
    ice_surface_temp) | ``elevation`` | ``pdd`` | ``debm_simple``
    (latitude [, albedo, paleo_times + eccentricity/obliquity/
    perihelion_longitude series]) | ``pik`` (latitude) |
    ``ismip6`` (passed pre-built via inputs["ismip6_model"]).
    Modifiers: ``anomaly``, ``delta_T``, ``cache``, ``force_to_thickness``
    (target_thickness).
    """
    inputs = inputs or {}
    chain = config.get_string("surface.models")
    base, mods = _split(chain)

    def need_atm(name):
        if atmosphere is None:
            raise ValueError(f"surface model {name!r} needs an atmosphere model")
        return atmosphere

    if base == "simple":
        model = _srf.Simple(atmosphere=need_atm(base))
    elif base == "uniform":
        model = _srf.Uniform()
    elif base == "given":
        model = _srf.Given(
            smb_field=_need(inputs, "climatic_mass_balance", base),
            temperature_field=_need(inputs, "ice_surface_temp", base),
            times=inputs.get("times"),
            period=stack_period(config, "surface.given",
                                inputs.get("times")))
    elif base == "elevation":
        model = _srf.ElevationDependent(
            z_min=config.get_number("surface.elevation_dependent.z_min"),
            z_ela=config.get_number("surface.elevation_dependent.z_ela"),
            z_max=config.get_number("surface.elevation_dependent.z_max"),
            m_min=config.get_number("surface.elevation_dependent.m_min", "m s-1"),
            m_max=config.get_number("surface.elevation_dependent.m_max", "m s-1"))
    elif base == "pdd":
        from .pdd import TemperatureIndex
        model = TemperatureIndex(atmosphere=need_atm(base), config=config,
                                 sigma_field=inputs.get("air_temp_sd"),
                                 latitude=inputs.get("latitude"))
    elif base == "debm_simple":
        import numpy as _np

        from .debm import DEBMSimple
        paleo = None
        if "paleo_times" in inputs:
            deg = _np.pi / 180.0
            paleo = (inputs["paleo_times"],
                     inputs.get("eccentricity"),
                     _np.asarray(inputs.get("obliquity")) * deg,
                     _np.asarray(inputs.get("perihelion_longitude")) * deg)
        model = DEBMSimple(atmosphere=need_atm(base),
                           latitude=_need(inputs, "latitude", base),
                           config=config,
                           albedo_field=inputs.get("albedo"),
                           paleo_series=paleo)
    elif base == "pik":
        model = _srf.PIK(atmosphere=need_atm(base),
                         latitude=_need(inputs, "latitude", base))
    elif base == "ismip6":
        if "ismip6_model" in inputs:
            model = inputs["ismip6_model"]
        else:
            # build from the protocol files (reference surface.ismip6.*):
            # reference climate + anomaly/elevation-gradient stacks
            import jax.numpy as jnp
            import numpy as _np

            from ..io.bootstrap import read_forcing_fields as _rff
            ref_path = config.get_string("surface.ismip6.reference_file")
            frc_path = config.get_string("surface.ismip6.file")
            grid_ = inputs.get("_grid")
            if not ref_path or not frc_path or grid_ is None:
                raise ValueError(
                    "surface model 'ismip6' needs surface.ismip6.file and "
                    "surface.ismip6.reference_file (CLI) or a prebuilt "
                    "inputs['ismip6_model']")
            ref, _ = _rff(ref_path, grid_,
                          ["climatic_mass_balance", "ice_surface_temp",
                           "usurf", "surface_altitude"])
            frc, a_times = _rff(frc_path, grid_,
                                ["climatic_mass_balance_anomaly",
                                 "ice_surface_temp_anomaly",
                                 "climatic_mass_balance_gradient",
                                 "ice_surface_temp_gradient"],
                                calendar=_cf_cal(config),
                                reference_date=_cf_ref(config))

            def _j(d, *names):
                for n in names:
                    if n in d:
                        return jnp.asarray(_np.nan_to_num(d[n]))
                return None

            model = _srf.ISMIP6(
                smb_ref=_j(ref, "climatic_mass_balance"),
                temperature_ref=_j(ref, "ice_surface_temp"),
                surface_ref=_j(ref, "usurf", "surface_altitude"),
                anomaly_times=None if a_times is None
                else jnp.asarray(a_times),
                a_smb=_j(frc, "climatic_mass_balance_anomaly"),
                a_temp=_j(frc, "ice_surface_temp_anomaly"),
                dsmb_dz=_j(frc, "climatic_mass_balance_gradient"),
                dtemp_dz=_j(frc, "ice_surface_temp_gradient"))
    else:
        raise ValueError(f"unknown surface model {base!r}")

    for mod in mods:
        if mod == "anomaly":
            model = _srf.Anomaly(
                inner=model,
                smb_anomaly=inputs.get("climatic_mass_balance_anomaly"),
                temp_anomaly=inputs.get("ice_surface_temp_anomaly"),
                times=inputs.get("anomaly_times"),
                period=stack_period(config, "surface.anomaly",
                                    inputs.get("anomaly_times")))
        elif mod == "delta_T":
            model = _srf.DeltaT(inner=model,
                                offset=_need(inputs, "delta_T", mod))
        elif mod == "cache":
            model = _srf.Cache(inner=model, update_interval=config.get_number(
                "surface.cache.update_interval", "seconds"))
        elif mod == "elevation_change":
            method = config.get_string("surface.elevation_change.smb.method")
            model = _srf.ElevationChange(
                inner=model,
                reference_surface=_need(inputs, "reference_surface", mod),
                temp_lapse_rate=config.get_number(
                    "surface.elevation_change.temperature_lapse_rate"),
                smb_lapse_rate=config.get_number(
                    "surface.elevation_change.smb.lapse_rate")
                if method == "shift" else 0.0,
                smb_exp_factor=config.get_number(
                    "surface.elevation_change.smb.exp_factor")
                if method == "scale" else 0.0)
        elif mod == "force_to_thickness":
            model = _srf.ForceThickness(
                inner=model,
                target_thickness=_need(inputs, "target_thickness", mod),
                alpha=config.get_number("surface.force_to_thickness.alpha",
                                        "s-1"),
                ice_free_alpha_factor=config.get_number(
                    "surface.force_to_thickness.ice_free_alpha_factor"),
                start_time=config.get_number(
                    "surface.force_to_thickness.start_time", "seconds"))
        else:
            raise ValueError(f"unknown surface modifier {mod!r}")
    return model


# ---------------------------------------------------------------- ocean
def ocean_from_config(config, inputs: Optional[Mapping] = None, grid=None):
    """Build the ocean chain from ``ocean.models``.

    Bases: ``constant`` | ``pik`` | ``th`` (theta_ocean, salinity_ocean) |
    ``given`` (shelf_base_mass_flux [, shelf_base_temperature, times]) |
    ``pico`` (theta_ocean, salinity_ocean [, basins]; needs grid).
    Modifiers: ``anomaly``, ``delta_T``, ``delta_SMB``, ``frac_SMB``,
    ``runoff_SMB``, ``frac_MBP``/``delta_MBP`` (melange back pressure,
    callables t -> fraction / Pa), ``cache``.
    """
    inputs = inputs or {}
    chain = config.get_string("ocean.models")
    base, mods = _split(chain)

    if base == "constant":
        model = _ocn.Constant(config=config)
    elif base == "pik":
        model = _ocn.PIK(config=config)
    elif base == "th":
        model = _ocn.GivenTH(
            theta_ocean=_need(inputs, "theta_ocean", base),
            salinity_ocean=_need(inputs, "salinity_ocean", base),
            config=config, times=inputs.get("times"),
            period=stack_period(config, "ocean.th", inputs.get("times")))
    elif base == "given":
        model = _ocn.Given(
            melt_rate=_need(inputs, "shelf_base_mass_flux", base),
            temperature=inputs.get("shelf_base_temperature"),
            times=inputs.get("times"),
            period=stack_period(config, "ocean.given",
                                inputs.get("times")))
    elif base == "pico":
        from .pico import Pico
        if grid is None:
            raise ValueError("ocean model 'pico' needs the grid")
        model = Pico(
            temperature_ocean=_need(inputs, "theta_ocean", base),
            salinity_ocean=_need(inputs, "salinity_ocean", base),
            config=config, basin_mask=inputs.get("basins"), grid=grid,
            times=inputs.get("times"),
            period=stack_period(config, "ocean.pico",
                                inputs.get("times")))
    else:
        raise ValueError(f"unknown ocean model {base!r}")

    for mod in mods:
        if mod == "anomaly":
            model = _ocn.Anomaly(
                inner=model,
                anomaly=_need(inputs, "melt_anomaly", mod),
                times=inputs.get("anomaly_times"),
                period=stack_period(config, "ocean.anomaly",
                                    inputs.get("anomaly_times")))
        elif mod == "delta_T":
            model = _ocn.DeltaT(inner=model,
                                offset=_need(inputs, "delta_T", mod))
        elif mod == "delta_SMB":
            model = _ocn.DeltaSMB(inner=model,
                                  offset=_need(inputs, "delta_SMB", mod))
        elif mod == "frac_SMB":
            model = _ocn.FracSMB(inner=model,
                                 fraction=_need(inputs, "frac_SMB", mod))
        elif mod == "runoff_SMB":
            model = _ocn.RunoffSMB(
                inner=model,
                delta_T=_need(inputs, "delta_T", mod),
                temp_to_runoff_a=config.get_number(
                    "ocean.runoff_to_ocean_melt.temp_to_runoff_a"),
                melt_factor_B=config.get_number(
                    "ocean.runoff_to_ocean_melt_factor"),
                alpha=config.get_number(
                    "ocean.runoff_to_ocean_melt_power_alpha"),
                beta=config.get_number(
                    "ocean.runoff_to_ocean_melt_power_beta"))
        elif mod == "frac_MBP":
            model = _ocn.FracMBP(inner=model,
                                 fraction=_need(inputs, "frac_MBP", mod))
        elif mod == "delta_MBP":
            model = _ocn.DeltaMBP(inner=model,
                                  offset=_need(inputs, "delta_MBP", mod))
        elif mod == "cache":
            model = _ocn.Cache(inner=model, update_interval=config.get_number(
                "ocean.cache.update_interval", "seconds"))
        else:
            raise ValueError(f"unknown ocean modifier {mod!r}")

    # reference -melange_back_pressure_fraction: a constant melange back
    # pressure applied only when no melange-back-pressure modifier
    # (frac_MBP or delta_MBP) is already in the chain — otherwise the two
    # effects would stack
    mbp = config.get_number("ocean.melange_back_pressure_fraction")
    if mbp > 0.0 and "frac_MBP" not in mods and "delta_MBP" not in mods:
        model = _ocn.FracMBP(inner=model, fraction=lambda t, _f=mbp: _f)
    return model


# ---------------------------------------------------------------- sea level
def sea_level_from_config(config, inputs: Optional[Mapping] = None):
    """Build the sea-level chain from ``sea_level.models``.
    Bases: ``constant``. Modifiers: ``delta_sl`` (delta_SL forcing),
    ``delta_sl_2d`` (delta_SL_2D field)."""
    inputs = inputs or {}
    chain = config.get_string("sea_level.models")
    base, mods = _split(chain)
    if base == "constant":
        # reference sea_level.constant.delta_SL: additional constant offset
        model = _sl.Constant(
            value=config.get_number("sea_level.constant.value")
            + config.get_number("sea_level.constant.delta_SL"))
    else:
        raise ValueError(f"unknown sea level model {base!r}")
    for mod in mods:
        if mod == "delta_sl":
            model = _sl.DeltaSL(inner=model,
                                offset=_need(inputs, "delta_SL", mod))
        elif mod == "delta_sl_2d":
            model = _sl.DeltaSL2D(
                inner=model,
                offset_field=_need(inputs, "delta_SL_2D", mod),
                times=inputs.get("delta_SL_2D_times"),
                period=stack_period(config, "sea_level.delta_sl_2d",
                                    inputs.get("delta_SL_2D_times")))
        else:
            raise ValueError(f"unknown sea level modifier {mod!r}")
    return model


# ---------------------------------------------------------------- files
def inputs_from_files(config, grid, group: str) -> dict:
    """Build the ``inputs`` mapping for a coupler group from the forcing
    files named in the config (reference role: every PISM coupler reads
    its own ``...file`` parameter). Spatial stacks are regridded onto the
    model grid and converted to internal units
    (``io.bootstrap.read_forcing_fields``); scalar series become
    :class:`~pism_tpu.util.forcing.ScalarForcing` callables.

    Used by the CLI so e.g. ``-surface given -config
    surface.given.file=smb.nc`` works end to end; Python API users can
    call it directly and override entries."""
    import jax.numpy as jnp

    from ..io.bootstrap import read_forcing_fields
    from ..util.forcing import ScalarForcing

    inputs = {}
    # forcing fields must match the model dtype or they promote the jitted
    # while_loop carry (f32 state + f64 forcing -> carry dtype mismatch)
    fdt = jnp.float32 \
        if config.get_string("runtime.float_dtype") == "float32" \
        else jnp.float64
    # dated forcing time axes align to model time under the run calendar
    _cal = config.get_string("time.calendar")
    _ref = config.get_string("time.reference_date")

    def spatial(file_key, variables):
        path = config.get_string(file_key)
        if not path:
            return
        fields, times = read_forcing_fields(path, grid, variables,
                                            calendar=_cal,
                                            reference_date=_ref)
        for k, v in fields.items():
            import numpy as _np
            if _np.isnan(v).any():
                # PISM errors when a forcing file does not cover the model
                # domain; silently NaN-filled forcing would poison the run
                raise ValueError(
                    f"forcing variable {k!r} from {path!r} does not cover "
                    "the model grid (regrid produced NaNs)")
            inputs[k] = jnp.asarray(v, fdt)
        if times is not None:
            inputs["times"] = jnp.asarray(times)

    def scalar(file_key, input_key, variable=None):
        path = config.get_string(file_key)
        if path:
            # every scalar forcing has a sibling ".periodic" flag (reference
            # -..._periodic: repeat the series with period = its time extent)
            pkey = file_key[:-len(".file")] + ".periodic"
            periodic = pkey in PARAMETERS and config.get_flag(pkey)
            inputs[input_key] = ScalarForcing.from_file(
                path, variable or input_key, periodic=periodic,
                calendar=_cal, reference_date=_ref)

    if group == "surface":
        # reference surface.given.smb_max: error on implausible SMB input
        # magnitudes (catches unit mistakes in forcing files)
        smb_cap = (config.get_number("surface.given.smb_max", "kg m-2 s-1")
                   / config.get_number("constants.ice.density"))

    if group == "atmosphere":
        spatial("atmosphere.given.file",
                ["air_temp", "precipitation", "air_temp_summer"])
        # SeaRISE-Greenland parameterization inputs (lat/lon/precip); PISM
        # reads them from the input/bootstrap file — the CLI passes that
        # file here (and falls back to -i, see cli.py)
        spatial("atmosphere.searise_greenland.file",
                ["latitude", "longitude", "precipitation", "lat", "lon"])
        for short, full in (("lat", "latitude"), ("lon", "longitude")):
            if short in inputs:
                inputs.setdefault(full, inputs.pop(short))
        # cosine yearly cycle fields (+ optional scalar amplitude scaling)
        spatial("atmosphere.yearly_cycle.file",
                ["air_temp_mean_annual", "air_temp_mean_summer",
                 "air_temp_mean_july", "precipitation"])
        if "air_temp_mean_july" in inputs:
            inputs.setdefault("air_temp_mean_summer",
                              inputs.pop("air_temp_mean_july"))
        scalar("atmosphere.yearly_cycle.scaling.file", "scaling",
               "amplitude_scaling")
        # anomaly stacks keep their own time axis
        path = config.get_string("atmosphere.anomaly.file")
        if path:
            fields, a_times = read_forcing_fields(
                path, grid, ["air_temp_anomaly", "precipitation_anomaly"],
                calendar=_cal, reference_date=_ref)
            for k, v in fields.items():
                inputs[k] = jnp.asarray(v, fdt)
            if a_times is not None:
                inputs["anomaly_times"] = jnp.asarray(a_times)
        # lapse-rate modifier reference surface
        path = config.get_string("atmosphere.elevation_change.file")
        if path:
            fields, _ = read_forcing_fields(
                path, grid, ["usurf", "surface_altitude", "surface"])
            for k in ("usurf", "surface_altitude", "surface"):
                if k in fields:
                    a = fields[k]
                    inputs.setdefault("reference_surface", jnp.asarray(
                        a[-1] if a.ndim == 3 else a, fdt))
                    break
        # one_station: scalar air_temp + precipitation series
        path = config.get_string("atmosphere.one_station.file")
        if path:
            inputs.setdefault("air_temp",
                              ScalarForcing.from_file(path, "air_temp"))
            inputs.setdefault("precipitation",
                              ScalarForcing.from_file(path, "precipitation"))
        scalar("atmosphere.delta_T.file", "delta_T")
        scalar("atmosphere.delta_P.file", "delta_P")
        scalar("atmosphere.frac_P.file", "frac_P")
        scalar("atmosphere.precip_scaling.file", "scaling_delta_T", "delta_T")
    elif group == "surface":
        spatial("surface.given.file",
                ["climatic_mass_balance", "ice_surface_temp"])
        if "climatic_mass_balance" in inputs:
            import numpy as _np
            m = float(_np.abs(_np.asarray(
                inputs["climatic_mass_balance"])).max())
            if m > smb_cap:
                raise ValueError(
                    f"surface.given.file SMB magnitude {m:.3e} m/s exceeds "
                    f"surface.given.smb_max ({smb_cap:.3e} m/s) - check the "
                    "input units")
        scalar("surface.delta_T.file", "delta_T")
        # anomaly stacks keep their own time axis
        path = config.get_string("surface.anomaly.file")
        if path:
            fields, a_times = read_forcing_fields(
                path, grid, ["climatic_mass_balance_anomaly",
                             "ice_surface_temp_anomaly"],
                calendar=_cal, reference_date=_ref)
            for k, v in fields.items():
                inputs[k] = jnp.asarray(v, fdt)
            if a_times is not None:
                inputs["anomaly_times"] = jnp.asarray(a_times)
        sd_path = config.get_string("surface.pdd.std_dev.file")
        if sd_path:
            fields, _ = read_forcing_fields(sd_path, grid, ["air_temp_sd"])
            if "air_temp_sd" in fields:
                a = fields["air_temp_sd"]
                inputs["air_temp_sd"] = jnp.asarray(
                    a[-1] if a.ndim == 3 else a, fdt)
        # lapse-rate modifier reference surface (surface.elevation_change)
        ec_path = config.get_string("surface.elevation_change.file")
        if ec_path:
            ff, _ = read_forcing_fields(
                ec_path, grid, ["usurf", "surface_altitude", "surface"],
                calendar=_cal, reference_date=_ref)
            for k in ("usurf", "surface_altitude", "surface"):
                if k in ff:
                    a = ff[k]
                    inputs.setdefault("reference_surface", jnp.asarray(
                        a[-1] if a.ndim == 3 else a, fdt))
                    break
        ftt_path = config.get_string("surface.force_to_thickness.file")
        if ftt_path:
            ff, _ = read_forcing_fields(ftt_path, grid,
                                        ["thk", "land_ice_thickness"],
                                        calendar=_cal, reference_date=_ref)
            tt = ff.get("thk", ff.get("land_ice_thickness"))
            if tt is not None:
                import numpy as _np
                tt = _np.asarray(tt)
                inputs.setdefault("target_thickness", jnp.asarray(
                    _np.nan_to_num(tt[-1] if tt.ndim == 3 else tt), fdt))
        paleo_path = config.get_string("surface.debm_simple.paleo.file")
        if paleo_path:
            import numpy as _np

            from ..io.nc4 import File as _File
            from ..util.units import SEC_PER_YEAR as _SPY
            with _File(paleo_path, "r") as f:
                tt = _np.asarray(f.read("time"), float)
                tu = dict(f.read_attrs("time")).get("units", b"years")
                if isinstance(tu, bytes):
                    tu = tu.decode()
                if "year" in str(tu):
                    tt = tt * _SPY
                inputs["paleo_times"] = tt
                for v in ("eccentricity", "obliquity",
                          "perihelion_longitude"):
                    inputs[v] = _np.asarray(f.read(v), float)
        alb_path = config.get_string("surface.debm_simple.albedo_input.file")
        if alb_path:
            fields, _ = read_forcing_fields(alb_path, grid, ["albedo"])
            if "albedo" in fields:
                a = fields["albedo"]
                inputs["albedo"] = jnp.asarray(
                    a[-1] if a.ndim == 3 else a, fdt)
    elif group == "ocean":
        spatial("ocean.given.file",
                ["shelf_base_mass_flux", "shelf_base_temperature"])
        spatial("ocean.th.file", ["theta_ocean", "salinity_ocean"])
        spatial("ocean.pico.file",
                ["theta_ocean", "salinity_ocean", "basins"])
        # drainage basins may come from their own file (reference
        # ocean.pico.basins_file)
        spatial("ocean.pico.basins_file", ["basins"])
        if "basins" in inputs and getattr(inputs["basins"], "ndim", 2) == 3:
            inputs["basins"] = inputs["basins"][-1]
        scalar("ocean.delta_T.file", "delta_T")
        scalar("ocean.frac_MBP.file", "frac_MBP")
        scalar("ocean.delta_MBP.file", "delta_MBP")
        scalar("ocean.frac_SMB.file", "frac_SMB")
        # anomaly stacks keep their own time axis
        path = config.get_string("ocean.anomaly.file")
        if path:
            fields, a_times = read_forcing_fields(
                path, grid, ["shelf_base_mass_flux_anomaly",
                             "shelf_base_mass_flux"],
                calendar=_cal, reference_date=_ref)
            for k in ("shelf_base_mass_flux_anomaly", "shelf_base_mass_flux"):
                if k in fields:
                    inputs["melt_anomaly"] = jnp.asarray(fields[k], fdt)
                    break
            if a_times is not None:
                inputs["anomaly_times"] = jnp.asarray(a_times)
    elif group == "sea_level":
        scalar("sea_level.delta_sl.file", "delta_SL")
        # legacy alias: the reference's -ocean ...,delta_SL file option
        if "delta_SL" not in inputs:
            scalar("ocean.delta_SL.file", "delta_SL")
        path = config.get_string("ocean.delta_sl_2d.file")
        if path:
            fields, sl_times = read_forcing_fields(
                path, grid, ["delta_SL", "delta_SL_2D", "sea_level_change"],
                calendar=_cal, reference_date=_ref)
            for k in ("delta_SL_2D", "delta_SL", "sea_level_change"):
                if k in fields:
                    inputs["delta_SL_2D"] = jnp.asarray(fields[k], fdt)
                    break
            if sl_times is not None:
                inputs["delta_SL_2D_times"] = jnp.asarray(sl_times)
    elif group == "frontal_melt":
        spatial("frontal_melt.given.file", ["frontal_melt_rate"])
        spatial("frontal_melt.routing.file", ["theta_ocean"])
        spatial("frontal_melt.discharge_given.file",
                ["theta_ocean", "subglacial_discharge"])
        # frontal-melt couplers consume single 2D fields; a time stack
        # supplies its last slice
        for k in ("frontal_melt_rate", "theta_ocean",
                  "subglacial_discharge"):
            if k in inputs and getattr(inputs[k], "ndim", 2) == 3:
                inputs[k] = inputs[k][-1]
    return inputs


def stack_period(config, prefix, times):
    """Forcing period [s] for a time-stack coupler: an explicit
    ``<prefix>.period`` wins; ``<prefix>.periodic`` derives the period from
    the series extent (span + one mean spacing, so a 12-entry monthly
    climatology cycles yearly — the reference derives it from the file's
    time bounds)."""
    period = 0.0
    pkey = prefix + ".period"
    if pkey in PARAMETERS:
        period = config.get_number(pkey, "seconds")
    fkey = prefix + ".periodic"
    if period == 0.0 and fkey in PARAMETERS and config.get_flag(fkey) \
            and times is not None and len(times) > 1:
        import numpy as np
        t = np.asarray(times, float)
        period = float((t[-1] - t[0]) * len(t) / (len(t) - 1))
    return period
