"""Basal strength: till yield stress and the sliding-law drag coefficient.

Rebuild of PISM ``src/basalstrength/`` (``MohrCoulombYieldStress``,
``ConstantYieldStress``) and the sliding-law part of
``src/basalstrength/basal_resistance.cc``:

- yield stress tau_c from till friction angle phi and effective pressure
  N_till (Bueler & van Pelt 2015 exponential till model driven by the till
  water layer), or a constant;
- drag coefficient beta(u) for the regularized plastic / pseudo-plastic
  sliding law: tau_b = -beta(|u|) u with
      beta = tau_c * |u|^(q-1) / u_threshold^q      (pseudo-plastic)
      beta = tau_c / sqrt(|u|^2 + u_reg^2)          (plastic, q=0)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

from .. import state as S


@dataclass
class MohrCoulombYieldStress:
    """tau_c = c0 + tan(phi) * N_till (PISM ``MohrCoulombYieldStress``)."""

    config: object

    def __post_init__(self):
        cfg = self.config
        self.c0 = cfg.get_number("basal_yield_stress.mohr_coulomb.till_cohesion")
        self.phi_default = cfg.get_number(
            "basal_yield_stress.mohr_coulomb.till_phi_default")
        self.N0 = cfg.get_number(
            "basal_yield_stress.mohr_coulomb.till_reference_effective_pressure")
        self.e0 = cfg.get_number(
            "basal_yield_stress.mohr_coulomb.till_reference_void_ratio")
        self.Cc = cfg.get_number(
            "basal_yield_stress.mohr_coulomb.till_compressibility_coefficient")
        self.delta = cfg.get_number(
            "basal_yield_stress.mohr_coulomb.till_effective_fraction_overburden")
        self.W_max = cfg.get_number("hydrology.tillwat_max")
        self.rho_i = cfg.get_number("constants.ice.density")
        self.g = cfg.get_number("constants.standard_gravity")
        self.tau_c_ice_free = cfg.get_number("basal_yield_stress.ice_free_bedrock")
        self.t2p_enabled = cfg.get_flag(
            "basal_yield_stress.mohr_coulomb.topg_to_phi.enabled")
        self.t2p = tuple(cfg.get_number(
            "basal_yield_stress.mohr_coulomb.topg_to_phi." + k)
            for k in ("phi_min", "phi_max", "topg_min", "topg_max"))
        self.opt_enabled = cfg.get_flag(
            "basal_yield_stress.mohr_coulomb.tillphi_opt.enabled")
        self.opt = {k: cfg.get_number(
            "basal_yield_stress.mohr_coulomb.tillphi_opt." + k)
            for k in ("dphi_scale", "dphi_max", "phi_min", "phi_max",
                      "dh_min")}
        self.opt_dt = cfg.get_number(
            "basal_yield_stress.mohr_coulomb.tillphi_opt.dt", "seconds")
        self.add_transportable = cfg.get_flag(
            "basal_yield_stress.add_transportable_water")
        self.tlftw = cfg.get_number(
            "basal_yield_stress.mohr_coulomb.till_log_factor_transportable_water")
        self.slippery_gl = cfg.get_flag(
            "basal_yield_stress.slippery_grounding_lines")
        self.delta_forcing = None
        _dpath = cfg.get_string("basal_yield_stress.mohr_coulomb.delta.file")
        if _dpath:
            from ..util.forcing import ScalarForcing
            self.delta_forcing = ScalarForcing.from_file(_dpath, "delta")

    def topg_to_phi(self, bed):
        """Heuristic till friction angle from bed elevation (reference
        ``-topg_to_phi`` / ``MohrCoulombYieldStress::till_friction_angle``):
        phi_min below topg_min, linear ramp to phi_max at topg_max —
        low-lying (marine) beds get weak till."""
        phi_min, phi_max, b_min, b_max = self.t2p
        w = jnp.clip((bed - b_min) / jnp.maximum(b_max - b_min, 1e-30),
                     0.0, 1.0)
        return phi_min + (phi_max - phi_min) * w

    def optimize_tillphi(self, state: S.ModelState, target_usurf):
        """One iterative till-friction-angle optimization update (the
        reference's ``-yield_stress mohr_coulomb`` +
        ``basal_yield_stress.mohr_coulomb.tillphi_opt``,
        ``MohrCoulombYieldStress`` tillphi optimization; Albrecht,
        Winkelmann & Levermann 2022, The Cryosphere).

        Where the modeled grounded surface sits ABOVE the target the till is
        too strong (the ice slides too little and thickens), so phi is
        lowered proportionally to the misfit; below the target it is raised.
        The per-update change is bounded by ``dphi_max``, misfits inside the
        ``dh_min`` dead band leave phi unchanged, and the result is clipped
        to [phi_min, phi_max]. Only grounded icy cells are adjusted."""
        o = self.opt
        usurf = state.geometry.ice_surface_elevation
        H = state.geometry.ice_thickness
        phi = state.till_phi
        if phi is None:
            phi = jnp.full_like(H, self.phi_default)
        dh = usurf - jnp.asarray(target_usurf, usurf.dtype)
        dphi = jnp.clip(o["dphi_scale"] * dh, -o["dphi_max"], o["dphi_max"])
        dphi = jnp.where(jnp.abs(dh) < o["dh_min"], 0.0, dphi)
        new_phi = jnp.clip(phi - dphi, o["phi_min"], o["phi_max"])
        adjust = S.grounded_ice(state.geometry.cell_type)
        return state.replace(till_phi=jnp.where(adjust, new_phi, phi))

    def effective_pressure(self, tillwat, P_overburden, delta=None):
        """Bueler & van Pelt (2015) eq. 23: N_till from till water amount."""
        s = jnp.clip(tillwat / self.W_max, 0.0, 1.0)
        d = self.delta if delta is None else delta
        N = self.N0 * (d * P_overburden / self.N0) ** s \
            * 10.0 ** ((self.e0 / self.Cc) * (1.0 - s))
        return jnp.minimum(P_overburden, N)

    def compute(self, state: S.ModelState, t=None):
        H = state.geometry.ice_thickness
        mask = state.geometry.cell_type
        P_ov = self.rho_i * self.g * H
        tillwat = state.tillwat if state.tillwat is not None else jnp.zeros_like(H)
        if self.add_transportable and state.hydro_W is not None:
            # reference basal_yield_stress.add_transportable_water: the
            # routed transportable layer weakens the till on top of the till
            # water, with a log-saturating contribution scaled by
            # till_log_factor_transportable_water
            tillwat = jnp.clip(
                tillwat + self.tlftw * jnp.log1p(state.hydro_W / 0.1),
                0.0, self.W_max)
        delta = None
        if self.delta_forcing is not None and t is not None:
            # reference basal_yield_stress.mohr_coulomb.delta.file: a scalar
            # time series replacing the constant fraction-of-overburden
            delta = self.delta_forcing(t)
        N = self.effective_pressure(tillwat, jnp.maximum(P_ov, 1.0), delta)
        phi = state.till_phi if state.till_phi is not None else self.phi_default
        tau_c = self.c0 + jnp.tan(jnp.deg2rad(phi)) * N
        # ice-free bedrock is strong; floating ice and ocean have no till drag
        tau_c = jnp.where(mask == S.MASK_ICE_FREE_BEDROCK, self.tau_c_ice_free, tau_c)
        tau_c = jnp.where(S.ocean(mask), 0.0, tau_c)
        if self.slippery_gl:
            # reference basal_yield_stress.slippery_grounding_lines: grounded
            # marine cells touching the ocean slide freely (no till drag)
            def nbr(m):
                return (jnp.roll(m, 1, 0) | jnp.roll(m, -1, 0)
                        | jnp.roll(m, 1, 1) | jnp.roll(m, -1, 1))
            gl = S.grounded_ice(mask) \
                & (state.geometry.bed_elevation
                   < state.geometry.sea_level) & nbr(S.ocean(mask))
            tau_c = jnp.where(gl, 0.0, tau_c)
        return tau_c


@dataclass
class ConstantYieldStress:
    config: object

    def __post_init__(self):
        self.value = self.config.get_number("basal_yield_stress.constant.value")

    def compute(self, state: S.ModelState, t=None):
        H = state.geometry.ice_thickness
        tau_c = jnp.full(H.shape, self.value, H.dtype)
        return jnp.where(S.ocean(state.geometry.cell_type), 0.0, tau_c)


@dataclass
class GivenYieldStress:
    """Prescribed till yield stress field (the reference reads ``tauc``
    directly as model state for regional runs and inversion replays; also
    the mechanism behind the MISMIP3d basal-friction perturbation
    experiments). ``tau_c``: (My, Mx) array [Pa], or read from
    ``basal_yield_stress.given.file`` (variable ``tauc``)."""

    config: object
    tau_c: object = None
    grid: object = None

    def __post_init__(self):
        if self.tau_c is None:
            path = self.config.get_string("basal_yield_stress.given.file")
            if not path or self.grid is None:
                raise ValueError(
                    "-yield_stress given needs a tau_c array or "
                    "basal_yield_stress.given.file (and a grid)")
            from ..io.bootstrap import read_and_regrid
            import numpy as _np
            self.tau_c = jnp.asarray(_np.nan_to_num(
                read_and_regrid(path, self.grid, ["tauc"])["tauc"]))

    def compute(self, state: S.ModelState, t=None):
        H = state.geometry.ice_thickness
        tau_c = jnp.asarray(self.tau_c, H.dtype)
        return jnp.where(S.ocean(state.geometry.cell_type), 0.0, tau_c)


def yield_stress_from_config(config, grid=None):
    name = config.get_string("basal_yield_stress.model")
    if name == "constant":
        return ConstantYieldStress(config)
    if name == "mohr_coulomb":
        return MohrCoulombYieldStress(config)
    if name == "given":
        return GivenYieldStress(config, grid=grid)
    raise ValueError(f"unknown basal yield stress model {name!r}")


@dataclass(frozen=True)
class SlidingLaw:
    """beta(|u|) for tau_b = -beta u (PISM ``IceBasalResistancePlasticLaw``
    and ``IceBasalResistancePseudoPlasticLaw``)."""

    pseudo_plastic: bool = False
    regularized_coulomb: bool = False
    q: float = 0.25
    u_threshold: float = 100.0 / 3.15569259747e7   # m/s
    plastic_reg: float = 0.01 / 3.15569259747e7    # m/s
    #: reference basal_resistance.pseudo_plastic.sliding_scale_factor: scale
    #: pseudo-plastic sliding speeds by this factor (SeaRISE experiments);
    #: < 0 = off. Implemented as tau_c -> tau_c / factor^q, which multiplies
    #: the sliding speed at fixed basal shear stress by the factor.
    sliding_scale: float = -1.0

    @staticmethod
    def from_config(config) -> "SlidingLaw":
        reg_coulomb = config.get_flag(
            "basal_resistance.regularized_coulomb.enabled")
        if reg_coulomb:
            # reference IceBasalResistanceRegularizedLaw (Zoet-Iverson 2020)
            return SlidingLaw(
                regularized_coulomb=True,
                q=config.get_number("basal_resistance.regularized_coulomb.q"),
                u_threshold=config.get_number(
                    "basal_resistance.regularized_coulomb.u_threshold",
                    "m s-1"),
                plastic_reg=config.get_number(
                    "basal_resistance.plastic.regularization", "m s-1"),
            )
        return SlidingLaw(
            pseudo_plastic=config.get_flag("basal_resistance.pseudo_plastic.enabled"),
            q=config.get_number("basal_resistance.pseudo_plastic.q"),
            u_threshold=config.get_number(
                "basal_resistance.pseudo_plastic.u_threshold", "m s-1"),
            plastic_reg=config.get_number(
                "basal_resistance.plastic.regularization", "m s-1"),
            sliding_scale=config.get_number(
                "basal_resistance.pseudo_plastic.sliding_scale_factor"),
        )

    def beta(self, tau_c, u, v, reg=None):
        """Drag coefficient; ``reg`` overrides the regularization velocity
        (the nonlinear solver's continuation warmup starts with a large reg
        — nearly linear drag — and tightens toward the configured value)."""
        r = self.plastic_reg if reg is None else reg
        speed2 = u ** 2 + v ** 2
        if self.regularized_coulomb:
            # tau_b = tau_c |u|^q / (|u| + u_threshold)^q: Coulomb-plastic at
            # speed >> u_threshold, power-law below (Zoet & Iverson 2020;
            # reference IceBasalResistanceRegularizedLaw::drag)
            sp = jnp.sqrt(speed2 + r ** 2)
            return tau_c * sp ** (self.q - 1.0) \
                / (sp + self.u_threshold) ** self.q
        if self.pseudo_plastic:
            if self.sliding_scale > 0.0:
                tau_c = tau_c / self.sliding_scale ** self.q
            sp = jnp.sqrt(speed2 + r ** 2)
            return tau_c * sp ** (self.q - 1.0) / self.u_threshold ** self.q
        return tau_c / jnp.sqrt(speed2 + r ** 2)
