"""Parameter database.

The reference (PISM) generates a NetCDF config database from
``src/pism_config.cdl`` (~600 typed, unit-tagged, documented parameters; every
one doubles as a CLI flag; read via ``src/util/ConfigInterface.cc``). We keep
PISM's parameter names and defaults so reference run scripts translate 1:1,
storing the database as a plain dict: ``name -> (value, units, doc)``.

``units=None`` marks strings/flags/integers. The set below covers the
parameters the implemented components read; extend alongside new components.
"""

# name: (default value, units, documentation)
PARAMETERS = {
    # --- physical constants -------------------------------------------------
    "constants.ice.density": (910.0, "kg m-3", "ice density"),
    "constants.ice.specific_heat_capacity": (2009.0, "J kg-1 K-1", "specific heat of ice"),
    "constants.ice.thermal_conductivity": (2.10, "W m-1 K-1", "thermal conductivity of cold ice"),
    "constants.ice.beta_Clausius_Clapeyron": (7.9e-8, "K Pa-1", "Clausius-Clapeyron constant"),
    "constants.fresh_water.density": (1000.0, "kg m-3", "fresh water density"),
    "constants.fresh_water.specific_heat_capacity": (4170.0, "J kg-1 K-1", "specific heat of water"),
    "constants.fresh_water.latent_heat_of_fusion": (3.34e5, "J kg-1", "latent heat of fusion"),
    "constants.fresh_water.melting_point_temperature": (273.15, "K", "melting point at 1 atm"),
    "constants.sea_water.density": (1028.0, "kg m-3", "sea water density"),
    "constants.sea_water.specific_heat_capacity": (3985.0, "J kg-1 K-1", "specific heat of sea water"),
    "constants.standard_gravity": (9.81, "m s-2", "acceleration due to gravity"),
    "constants.ideal_gas_constant": (8.31441, "J mol-1 K-1", "ideal gas constant"),

    # --- grid ---------------------------------------------------------------
    "grid.Mx": (61, None, "grid points in x"),
    "grid.My": (61, None, "grid points in y"),
    "grid.Mz": (31, None, "grid points in z (ice)"),
    "grid.Mbz": (1, None, "grid points in bedrock thermal layer"),
    "grid.Lx": (1500e3, "m", "half-width of domain in x"),
    "grid.Ly": (1500e3, "m", "half-width of domain in y"),
    "grid.Lz": (4000.0, "m", "height of computational domain"),
    "grid.Lbz": (0.0, "m", "thickness of bedrock thermal layer"),
    "grid.ice_vertical_spacing": ("quadratic", None, "equal | quadratic"),
    "grid.lambda": (4.0, None, "quadratic spacing refinement parameter"),
    "grid.periodicity": ("none", None, "none | x | y | xy"),
    "grid.registration": ("center", None, "center | corner"),

    # --- time stepping ------------------------------------------------------
    "time_stepping.adaptive_ratio": (0.12, None, "SIA diffusivity stability multiplier"),
    "time_stepping.maximum_time_step": (60.0, "years", "maximum allowed dt"),
    "time_stepping.minimum_time_step": (1.0e-3, "seconds", "minimum allowed dt"),
    "time_stepping.cfl_factor": (1.0, None, "2D CFL multiplier for mass transport"),
    "time_stepping.skip.enabled": (False, None, "subcycle mass transport between energy steps"),
    "time_stepping.skip.max": (10, None, "max mass-transport substeps per energy step"),
    "time.calendar": ("365_day", None, "CF calendar"),

    # --- flow laws ----------------------------------------------------------
    "stress_balance.model": ("sia", None, "none|prescribed_sliding|sia|ssa|weertman_sliding|ssa+sia"),
    "stress_balance.sia.flow_law": ("gpbld", None, "flow law for SIA"),
    "stress_balance.sia.Glen_exponent": (3.0, None, "Glen exponent n (SIA)"),
    "stress_balance.sia.enhancement_factor": (1.0, None, "SIA enhancement factor"),
    "stress_balance.sia.surface_gradient_method": ("haseloff", None, "eta | haseloff | mahaffy"),
    "stress_balance.sia.bed_smoother.range": (5.0e3, "m", "Schoof bed smoother half-width (0 disables)"),
    "stress_balance.sia.limit_diffusivity": (False, None, "cap SIA diffusivity"),
    "stress_balance.sia.max_diffusivity": (100.0, "m2 s-1", "SIA diffusivity cap / sanity limit"),
    "stress_balance.ssa.flow_law": ("gpbld", None, "flow law for SSA"),
    "stress_balance.ssa.Glen_exponent": (3.0, None, "Glen exponent n (SSA)"),
    "stress_balance.ssa.enhancement_factor": (1.0, None, "SSA enhancement factor"),
    "stress_balance.ssa.epsilon": (1.0e13, "Pa s m", "nuH regularization added everywhere"),
    "stress_balance.ssa.strength_extension.constant_nu": (9.8687e14, "Pa s", "viscosity of strength extension"),
    "stress_balance.ssa.strength_extension.min_thickness": (50.0, "m", "thickness below which extension applies"),
    "stress_balance.ssa.method": ("fd", None, "fd (staggered FD + CFBC) | fem (Q1 Galerkin)"),
    "stress_balance.ssa.fd.relative_convergence": (1.0e-4, None, "Picard rtol on nuH change"),
    "stress_balance.ssa.fd.max_iterations": (300, None, "max Picard iterations"),
    "stress_balance.ssa.fd.ksp_rtol": (1.0e-5, None, "inner Krylov relative tolerance"),
    "stress_balance.ssa.fd.ksp_max_it": (300, None, "inner Krylov max iterations"),
    "stress_balance.ssa.fd.nuH_iter_failure_underrelaxation": (0.8, None, "under-relaxation on retry"),
    "stress_balance.ssa.fd.beta_floor": (10.0, "Pa s m-1", "tiny drag on all icy cells; regularizes isolated floating cells"),
    "stress_balance.ssa.fd.newton_rtol": (1.0e-7, None, "Newton convergence: |F| <= rtol |b|"),
    "stress_balance.ssa.fd.solve_dtype": ("float64", None, "float64 (solve island; default) | mixed (iterative refinement: f64 iterate + outer residual, f32 Krylov; velocities match float64 to ~1e-6, ~1.4x faster on TPU at production grids)"),
    "stress_balance.ssa.fd.newton_max_iterations": (100, None, "max Newton iterations"),
    "stress_balance.ssa.fd.picard_warmup": (5, None, "Picard iterations before Newton"),
    "stress_balance.ssa.fd.max_speed": (50.0e3, "m year-1", "hard clamp on SSA speeds (guards CFL dt collapse)"),
    "time_stepping.max_steps_per_segment": (2000000, None, "while_loop runaway guard"),
    "stress_balance.ssa.Schoof_regularizing_velocity": (1.0, "m year-1", "SSA strain-rate regularization velocity"),
    "stress_balance.ssa.Schoof_regularizing_length": (1000.0, "km", "SSA strain-rate regularization length"),
    "stress_balance.calving_front_stress_bc": (True, None, "apply calving-front pressure BC"),
    "stress_balance.vertical_velocity_approximation": ("centered", None, "centered | upstream"),
    "stress_balance.weertman_sliding.k": (1.0e-11, "m s-1 Pa-1", "Weertman sliding coefficient (u = k tau^m / N^(m-1))"),
    "stress_balance.weertman_sliding.exponent": (3.0, None, "Weertman sliding exponent m"),
    "stress_balance.weertman_sliding.melt_only": (False, None, "slide only where the ice base is temperate (EISMINT II exp H)"),

    "flow_law.isothermal_Glen.ice_softness": (3.1689e-24, "Pa-3 s-1", "softness A for isothermal Glen"),
    "flow_law.Paterson_Budd.A_cold": (3.610e-13, "Pa-3 s-1", "Paterson-Budd cold prefactor"),
    "flow_law.Paterson_Budd.A_warm": (1.730e3, "Pa-3 s-1", "Paterson-Budd warm prefactor"),
    "flow_law.Paterson_Budd.Q_cold": (6.0e4, "J mol-1", "cold activation energy"),
    "flow_law.Paterson_Budd.Q_warm": (13.9e4, "J mol-1", "warm activation energy"),
    "flow_law.Paterson_Budd.T_critical": (263.15, "K", "cold/warm transition temperature"),
    "flow_law.gpbld.water_frac_coeff": (181.25, None, "GPBLD liquid-fraction softness coefficient"),
    "flow_law.gpbld.water_frac_observed_limit": (0.01, None, "cap on omega in GPBLD softness"),

    # --- basal resistance / yield stress ------------------------------------
    "basal_resistance.pseudo_plastic.enabled": (False, None, "pseudo-plastic sliding law"),
    "basal_resistance.pseudo_plastic.q": (0.25, None, "pseudo-plastic exponent"),
    "basal_resistance.pseudo_plastic.u_threshold": (100.0, "m year-1", "threshold velocity"),
    "basal_resistance.plastic.regularization": (0.01, "m year-1", "plastic-law velocity regularization"),
    "basal_yield_stress.model": ("mohr_coulomb", None, "constant | mohr_coulomb"),
    "basal_yield_stress.constant.value": (2.0e5, "Pa", "constant till yield stress"),
    "basal_yield_stress.ice_free_bedrock": (1.0e6, "Pa", "yield stress on ice-free bedrock"),
    "basal_yield_stress.mohr_coulomb.till_phi_default": (30.0, "degrees", "default till friction angle"),
    "basal_yield_stress.mohr_coulomb.till_cohesion": (0.0, "Pa", "till cohesion"),
    "basal_yield_stress.mohr_coulomb.till_reference_effective_pressure": (1.0e5, "Pa", "N_0"),
    "basal_yield_stress.mohr_coulomb.till_reference_void_ratio": (0.69, None, "e_0"),
    "basal_yield_stress.mohr_coulomb.till_compressibility_coefficient": (0.12, None, "C_c"),
    "basal_yield_stress.mohr_coulomb.till_effective_fraction_overburden": (0.02, None, "delta"),
    "basal_yield_stress.mohr_coulomb.delta_fraction": (0.02, None, "alias of delta"),

    # --- energy -------------------------------------------------------------
    "energy.model": ("enthalpy", None, "none | cold | enthalpy"),
    "energy.enthalpy.reference_temperature": (223.15, "K", "T_ref in E = c_i (T - T_ref)"),
    "energy.enthalpy.temperate_ice_thermal_conductivity_ratio": (0.1, None, "K_temperate/K_cold"),
    "energy.drainage_maximum_rate": (0.05, "year-1", "max temperate-ice drainage rate"),
    "energy.drainage_target_water_fraction": (0.01, None, "drain liquid fraction above this"),
    "energy.minimum_allowed_temperature": (200.0, "K", "sanity floor for ice temperature"),
    "energy.margin_ice_thickness_limit": (100.0, "m", "margin-column treatment threshold"),
    "energy.bedrock_thermal.density": (3300.0, "kg m-3", "bedrock density"),
    "energy.bedrock_thermal.conductivity": (3.0, "W m-1 K-1", "bedrock thermal conductivity"),
    "energy.bedrock_thermal.specific_heat_capacity": (1000.0, "J kg-1 K-1", "bedrock specific heat"),
    "energy.basal_melt.use_grounded_cell_fraction": (True, None, "scale basal melt by grounded fraction"),

    # --- age ------------------------------------------------------------------
    "age.enabled": (False, None, "transport 3D ice age"),
    "age.initial_value": (0.0, "years", "initial age"),
    "age.isochrones.enabled": (False, None, "trace isochrone deposition layers"),
    "age.isochrones.n_layers": (16, None, "static layer-array size"),
    "age.isochrones.deposition_times": ("", None, "years: 'a:step:b' or comma list"),

    # --- geometry / mass transport ------------------------------------------
    "geometry.ice_free_thickness_standard": (0.01, "m", "H below this means ice-free"),
    "geometry.update.enabled": (True, None, "evolve ice geometry"),
    "geometry.part_grid.enabled": (False, None, "Albrecht part-grid front advance"),
    "geometry.grounded_cell_fraction": (False, None, "sub-grid grounding line interpolation"),
    "masstransport.scheme": ("upwind1", None, "first-order upwind advective flux"),

    # --- hydrology ----------------------------------------------------------
    "hydrology.model": ("null", None, "null | routing | distributed | steady"),
    "hydrology.tillwat_max": (2.0, "m", "maximum till water thickness"),
    "hydrology.tillwat_decay_rate": (1.0, "m year-1", "till water decay rate C"),
    "hydrology.hydraulic_conductivity": (1.0e-2, None, "routing conductivity k"),
    "hydrology.alpha": (1.25, None, "routing flux exponent on W"),
    "hydrology.beta": (1.5, None, "routing flux exponent on |grad psi|"),
    "hydrology.thickness_power_in_flux": (1.25, None, "alias alpha"),
    "hydrology.gradient_power_in_flux": (1.5, None, "alias beta"),
    "hydrology.regularizing_porosity": (0.01, None, "distributed-model regularizing porosity"),
    "hydrology.roughness_scale": (0.1, "m", "distributed-model bed roughness W_r"),
    "hydrology.cavitation_opening_coefficient": (0.5, "m-1", "c_1"),
    "hydrology.creep_closure_coefficient": (0.04, None, "c_2"),
    "hydrology.maximum_time_step": (1.0, "years", "hydrology dt cap"),

    # --- calving / front retreat --------------------------------------------
    "calving.methods": ("", None, "comma list: eigen_calving,thickness_calving,vonmises_calving,float_kill"),
    "calving.eigen_calving.K": (0.0, "m s", "eigencalving proportionality constant"),
    "calving.vonmises_calving.sigma_max": (1.0e6, "Pa", "von Mises yield stress"),
    "calving.vonmises_calving.K": (1.0, None, "von Mises rate factor"),
    "calving.hayhurst_calving.B_tilde": (65.0, None, "Hayhurst rate factor [MPa^-r year-1] (Mercenier et al. 2018)"),
    "calving.hayhurst_calving.exponent_r": (0.43, None, "Hayhurst stress exponent"),
    "calving.hayhurst_calving.sigma_threshold": (1.7e5, "Pa", "Hayhurst tensile stress threshold"),
    "calving.thickness_calving.threshold": (50.0, "m", "calve ice thinner than this"),
    "calving.float_kill.enabled": (False, None, "remove all floating ice"),
    "calving.front_retreat.use_cfl": (False, None, "restrict dt by retreat-rate CFL"),
    "frontal_melt.models": ("", None, "frontal melt model: constant | given | routing"),
    "frontal_melt.constant.melt_rate": (0.0, "m year-1", "constant frontal melt rate"),
    "frontal_melt.include_floating_ice": (False, None, "apply frontal melt to floating fronts too"),
    "geometry.remove_icebergs": (False, None, "drop shelves not connected to grounded ice"),

    # --- fracture density ------------------------------------------------------
    "fracture_density.enabled": (False, None, "evolve the fracture phase field"),
    "fracture_density.gamma": (1.0, None, "fracture growth rate factor"),
    "fracture_density.initiation_threshold": (7.0e-10, "s-1", "strain rate above which fractures form"),
    "fracture_density.gamma_h": (0.0, None, "fracture healing rate factor"),
    "fracture_density.healing_threshold": (2.0e-10, "s-1", "strain rate below which fractures heal"),
    "fracture_density.softening_lower_limit": (1.0, None, "1 = no rheology softening feedback"),

    # --- regional mode ----------------------------------------------------------
    "regional.enabled": (False, None, "outlet-glacier subdomain mode (no_model_mask)"),

    # --- bed deformation -----------------------------------------------------
    "bed_deformation.model": ("none", None, "none | iso | lc | given"),
    "bed_deformation.update_interval": (10.0, "years", "how often to update the bed"),
    "bed_deformation.lc.grid_size_factor": (2, None, "FFT grid extension factor"),
    "bed_deformation.lc.elastic_model": (False, None, "include elastic plate response"),
    "bed_deformation.lithosphere_flexural_rigidity": (5.0e24, "N m", "flexural rigidity D"),
    "bed_deformation.mantle_viscosity": (1.0e21, "Pa s", "half-space mantle viscosity"),
    "bed_deformation.mantle_density": (3300.0, "kg m-3", "mantle density"),
    "bed_deformation.lithosphere_density": (3300.0, "kg m-3", "lithosphere density (pointwise isostasy)"),

    # --- couplers -----------------------------------------------------------
    "atmosphere.models": ("uniform", None, "comma-separated atmosphere model chain"),
    "atmosphere.uniform.temperature": (263.15, "K", "uniform air temperature"),
    "atmosphere.uniform.precipitation": (0.0, "kg m-2 year-1", "uniform precipitation"),
    "surface.models": ("simple", None, "comma-separated surface model chain"),
    "surface.pdd.factor_snow": (3.04e-3, "m K-1 day-1", "PDD melt factor for snow (ice equivalent)"),
    "surface.pdd.factor_ice": (8.79e-3, "m K-1 day-1", "PDD melt factor for ice"),
    "surface.pdd.refreeze": (0.6, None, "refreeze fraction"),
    "surface.pdd.std_dev.value": (5.0, "K", "std dev of daily temperature variability"),
    "surface.pdd.positive_threshold_temp": (273.15, "K", "temperature above which melt occurs"),
    "surface.pdd.air_temp_all_precip_as_snow": (272.15, "K", "below: all precip is snow"),
    "surface.pdd.air_temp_all_precip_as_rain": (274.15, "K", "above: all precip is rain"),
    "ocean.models": ("constant", None, "comma-separated ocean model chain"),
    "ocean.constant.melt_rate": (0.0, "m year-1", "constant sub-shelf melt rate (ice equivalent)"),
    "ocean.sub_shelf_heat_flux_into_ice": (0.5, "W m-2", "heat flux into shelf base"),
    "ocean.pik_melt_factor": (5.0e-3, None, "PIK depth-dependent melt factor"),
    "ocean.th.gamma_T": (1.00e-4, "m s-1", "GivenTH turbulent heat exchange coefficient"),
    "ocean.th.gamma_S": (5.05e-7, "m s-1", "GivenTH turbulent salt exchange coefficient"),
    "ocean.th.ice_temperature": (265.15, "K", "GivenTH shelf-ice interior temperature for the heat-conduction term"),
    "ocean.th.two_equation": (False, None, "GivenTH: drop the salt equation (fixed S_b = S_o) instead of the full 3-equation solve"),
    "ocean.pico.number_of_boxes": (5, None, "PICO box count"),
    "ocean.pico.heat_exchange_coefficent": (1.0e-5, "m s-1", "PICO gamma_T*"),
    "ocean.pico.overturning_coefficent": (1.0e6, "m6 s-1 kg-1", "PICO overturning C"),
    "ocean.pico.continental_shelf_depth": (-800.0, "m", "PICO continental shelf depth"),
    "sea_level.models": ("constant", None, "sea level model chain"),
    "sea_level.constant.value": (0.0, "m", "constant sea level"),

    # --- bootstrapping -------------------------------------------------------
    "bootstrapping.defaults.geothermal_flux": (0.042, "W m-2", "default geothermal flux"),
    "bootstrapping.defaults.ice_surface_temp": (263.15, "K", "default surface temperature"),

    # --- output / runtime ----------------------------------------------------
    "runtime.float_dtype": ("float64", None, "float32 | float64: dtype of model fields"),
    "runtime.segment_years": (50.0, "years", "max model-years per jitted while_loop segment"),
    "runtime.device_loop": (True, None, "run segments as on-device while_loops; False = host-dispatched steps (workaround for TPU runtimes that mishandle long nested while_loops)"),
    "output.ice_free_thickness_standard": (0.01, "m", "reporting ice-free threshold"),
    "run_info.institution": ("", None, "institution attribute for output files"),
    "run_info.title": ("", None, "title attribute for output files"),
}
