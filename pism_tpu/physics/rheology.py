"""Flow laws (ice rheology).

Rebuild of PISM ``src/rheology/``: Glen-type constitutive laws giving ice
softness A (and hardness B = A^{-1/n}) as a function of enthalpy and
pressure. All laws are elementwise jnp expressions over whole fields -- the
SIA vertical integral and SSA viscosity consume them in fused form.

Laws: IsothermalGlen, PatersonBudd (+Cold/Warm), Hooke, GPBLD (polythermal
default, Glen-Paterson-Budd-Lliboutry-Duval).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp

from .enthalpy_converter import EnthalpyConverter


@dataclass(frozen=True)
class FlowLaw:
    """Base Glen-type law: F(sigma, E, p) = A(E, p) * sigma^(n-1)."""

    n: float = 3.0
    EC: EnthalpyConverter = field(default_factory=EnthalpyConverter)

    def softness(self, E, p):
        raise NotImplementedError

    def hardness(self, E, p):
        return self.softness(E, p) ** (-1.0 / self.n)

    def flow(self, stress, E, p):
        """Strain rate factor: eps_dot = flow(sigma) * sigma (PISM
        ``FlowLaw::flow``)."""
        return self.softness(E, p) * stress ** (self.n - 1.0)

    def averaged_hardness(self, thickness, E_column, z):
        """Vertical average of hardness over the ice column (SSA uses this).

        E_column: (..., Mz); z: (Mz,) levels. Trapezoid rule restricted to
        z <= H (levels above the surface take the surface value; their
        weight is masked out).
        """
        H = thickness[..., None]
        depth = jnp.maximum(H - z, 0.0)
        p = self.EC.pressure(depth)
        B = self.hardness(E_column, p)
        # trapezoid weights on the irregular grid, clipped to the ice column
        z_c = jnp.minimum(z, H)
        w = jnp.diff(z_c, axis=-1)
        B_mid = 0.5 * (B[..., 1:] + B[..., :-1])
        integral = jnp.sum(B_mid * w, axis=-1)
        return jnp.where(thickness > 0.0, integral / jnp.maximum(thickness, 1e-9),
                         B[..., 0])


@dataclass(frozen=True)
class IsothermalGlen(FlowLaw):
    """Constant softness (PISM ``rheology::IsothermalGlen``)."""

    A: float = 3.1689e-24  # Pa^-3 s^-1

    def softness(self, E, p):
        return jnp.full_like(jnp.asarray(E, jnp.result_type(E, 1.0)), self.A)

    def hardness(self, E, p):
        return jnp.full_like(jnp.asarray(E, jnp.result_type(E, 1.0)),
                             self.A ** (-1.0 / self.n))


@dataclass(frozen=True)
class PatersonBudd(FlowLaw):
    """Temperature-dependent Arrhenius law (Paterson & Budd 1982)."""

    A_cold: float = 3.610e-13  # Pa^-3 s^-1
    A_warm: float = 1.730e3
    Q_cold: float = 6.0e4      # J/mol
    Q_warm: float = 13.9e4
    T_critical: float = 263.15
    R: float = 8.31441

    def softness_from_temp_pa(self, T_pa):
        A = jnp.where(T_pa < self.T_critical, self.A_cold, self.A_warm)
        Q = jnp.where(T_pa < self.T_critical, self.Q_cold, self.Q_warm)
        return A * jnp.exp(-Q / (self.R * T_pa))

    def softness(self, E, p):
        return self.softness_from_temp_pa(self.EC.pressure_adjusted_temperature(E, p))


@dataclass(frozen=True)
class PatersonBuddCold(PatersonBudd):
    """Only the cold branch (PISM ``pb_cold``; verification tests F/G)."""

    def softness_from_temp_pa(self, T_pa):
        return self.A_cold * jnp.exp(-self.Q_cold / (self.R * T_pa))

    def tempFromSoftness(self, A):
        return -self.Q_cold / (self.R * jnp.log(A / self.A_cold))


@dataclass(frozen=True)
class PatersonBuddWarm(PatersonBudd):
    def softness_from_temp_pa(self, T_pa):
        return self.A_warm * jnp.exp(-self.Q_warm / (self.R * T_pa))


@dataclass(frozen=True)
class Hooke(PatersonBudd):
    """Hooke (1981) law (PISM ``rheology::Hooke``; constants from-memory,
    flagged [unverified: reference mount empty])."""

    A_Hooke: float = 4.42e-10  # Pa^-3 s^-1
    Q_Hooke: float = 7.88e4
    C_Hooke: float = 0.16612
    K_Hooke: float = 1.17
    Tr_Hooke: float = 273.39

    def softness_from_temp_pa(self, T_pa):
        return self.A_Hooke * jnp.exp(
            -self.Q_Hooke / (self.R * T_pa)
            + 3.0 * self.C_Hooke / jnp.maximum(self.Tr_Hooke - T_pa, 1e-3) ** self.K_Hooke
        )


@dataclass(frozen=True)
class GPBLD(PatersonBudd):
    """Glen-Paterson-Budd-Lliboutry-Duval polythermal law (PISM default,
    ``rheology::GPBLD``): Paterson-Budd softness for cold ice, multiplied by
    (1 + C * omega) for temperate ice (Lliboutry & Duval 1985)."""

    water_frac_coeff: float = 181.25
    water_frac_observed_limit: float = 0.01

    def softness(self, E, p):
        # For temperate ice T_pa == T_melting, so the Paterson-Budd factor
        # below already equals A(T_m); the omega term is 1 for cold ice.
        base = self.softness_from_temp_pa(self.EC.pressure_adjusted_temperature(E, p))
        omega = jnp.minimum(self.EC.water_fraction(E, p), self.water_frac_observed_limit)
        return base * (1.0 + self.water_frac_coeff * omega)


@dataclass(frozen=True)
class GoldsbyKohlstedt(FlowLaw):
    """Goldsby & Kohlstedt (2001) composite creep law (reference
    ``src/rheology/GoldsbyKohlstedt.cc``): diffusional flow + dislocation
    creep + the harmonic combination of basal slip and grain-boundary
    sliding, all grain-size dependent. Constants re-derived from the
    publication (MPa-based, converted to Pa here)
    [unverified: reference mount empty].

    Only ``flow`` is well-defined; a single Glen-type softness/hardness
    does not exist (the reference raises the same way), so the SIA consumes
    this law through the generalized stress-dependent diffusivity integral
    (``ops/sia.py``), and the factory refuses it for the SSA.
    """

    generalized = True          # route ops/sia.py to the flow() integral

    grain_size: float = 1.0e-3  # m
    V_act_vol: float = -13.0e-6  # m^3/mol activation volume
    R: float = 8.31441

    # dislocation creep
    disl_crit_temp: float = 258.0
    disl_A_cold: float = 4.0e5    # MPa^-4 s^-1
    disl_A_warm: float = 6.0e28
    disl_n: float = 4.0
    disl_Q_cold: float = 60.0e3   # J/mol
    disl_Q_warm: float = 180.0e3
    # easy slip (basal)
    basal_A: float = 5.5e7        # MPa^-2.4 s^-1
    basal_n: float = 2.4
    basal_Q: float = 60.0e3
    # grain boundary sliding
    gbs_crit_temp: float = 255.0
    gbs_A_cold: float = 3.9e-3    # MPa^-1.8 m^1.4 s^-1
    gbs_A_warm: float = 3.0e26
    gbs_n: float = 1.8
    gbs_Q_cold: float = 49.0e3
    gbs_Q_warm: float = 192.0e3
    p_grain_sz_exp: float = 1.4
    # diffusional flow
    diff_crit_temp: float = 258.0
    diff_V_m: float = 1.97e-5     # molar volume m^3/mol
    diff_D_0v: float = 9.10e-4    # m^2/s volume diffusion pre-exponential
    diff_Q_v: float = 59.4e3
    diff_D_0b: float = 5.8e-4     # m^2/s grain-boundary diffusion
    diff_Q_b: float = 49.0e3
    diff_delta: float = 9.04e-10  # m, grain-boundary width

    def softness(self, E, p):
        raise RuntimeError(
            "Goldsby-Kohlstedt does not define a Glen softness; "
            "use flow() (same restriction as the reference)")

    def hardness(self, E, p):
        raise RuntimeError(
            "Goldsby-Kohlstedt does not define a Glen hardness")

    def averaged_hardness(self, thickness, E_column, z):
        raise RuntimeError(
            "Goldsby-Kohlstedt cannot be used in the SSA (no hardness)")

    def flow(self, stress, E, p):
        """Strain-rate factor F with eps = F * sigma, from the absolute
        temperature; stress in Pa."""
        T = self.EC.temperature(E, p)
        gs = self.grain_size
        pV = p * self.V_act_vol
        RT = self.R * jnp.maximum(T, 1.0)
        MPa = 1.0e-6  # Pa -> MPa conversion folded into the prefactors

        # diffusional flow (linear in stress -> constant factor)
        D_v = self.diff_D_0v * jnp.exp(-self.diff_Q_v / RT)
        D_b = self.diff_D_0b * jnp.exp(-self.diff_Q_b / RT)
        D_b = jnp.where(T > self.diff_crit_temp, D_b * 1000.0, D_b)
        eps_diff = 42.0 * self.diff_V_m \
            * (D_v + jnp.pi * self.diff_delta * D_b / gs) / (RT * gs ** 2)

        sig = jnp.maximum(stress, 1e-10)
        # dislocation creep
        A_d = jnp.where(T > self.disl_crit_temp,
                        self.disl_A_warm, self.disl_A_cold) \
            * MPa ** self.disl_n
        Q_d = jnp.where(T > self.disl_crit_temp,
                        self.disl_Q_warm, self.disl_Q_cold)
        eps_disl = A_d * sig ** (self.disl_n - 1.0) \
            * jnp.exp(-(Q_d + pV) / RT)
        # basal slip
        eps_basal = self.basal_A * MPa ** self.basal_n \
            * sig ** (self.basal_n - 1.0) \
            * jnp.exp(-(self.basal_Q + pV) / RT)
        # grain boundary sliding
        A_g = jnp.where(T > self.gbs_crit_temp,
                        self.gbs_A_warm, self.gbs_A_cold) \
            * MPa ** self.gbs_n
        Q_g = jnp.where(T > self.gbs_crit_temp,
                        self.gbs_Q_warm, self.gbs_Q_cold)
        eps_gbs = A_g * sig ** (self.gbs_n - 1.0) \
            / gs ** self.p_grain_sz_exp * jnp.exp(-(Q_g + pV) / RT)

        return eps_diff + eps_disl \
            + eps_basal * eps_gbs / jnp.maximum(eps_basal + eps_gbs, 1e-300)


def flow_law_from_config(config, which: str = "sia",
                         EC: EnthalpyConverter = None) -> FlowLaw:
    """Factory (PISM ``rheology::FlowLawFactory``)."""
    if EC is None:
        EC = EnthalpyConverter.from_config(config)
    name = config.get_string(f"stress_balance.{which}.flow_law")
    if which == "sia" and config.get_flag("flow_law.grain_aware_GK"):
        # reference flow_law.grain_aware_GK: force the grain-size-aware
        # Goldsby-Kohlstedt composite law for the SIA
        name = "gk"
    n = config.get_number(f"stress_balance.{which}.Glen_exponent")
    pb_kw = dict(
        n=n, EC=EC,
        A_cold=config.get_number("flow_law.Paterson_Budd.A_cold"),
        A_warm=config.get_number("flow_law.Paterson_Budd.A_warm"),
        Q_cold=config.get_number("flow_law.Paterson_Budd.Q_cold"),
        Q_warm=config.get_number("flow_law.Paterson_Budd.Q_warm"),
        T_critical=config.get_number("flow_law.Paterson_Budd.T_critical"),
        R=config.get_number("constants.ideal_gas_constant"),
    )
    if name == "isothermal_glen":
        return IsothermalGlen(
            n=n, EC=EC,
            A=config.get_number("flow_law.isothermal_Glen.ice_softness"))
    if name == "pb":
        return PatersonBudd(**pb_kw)
    if name == "pb_cold":
        return PatersonBuddCold(**pb_kw)
    if name == "pb_warm":
        return PatersonBuddWarm(**pb_kw)
    if name == "hooke":
        return Hooke(
            **pb_kw,
            # flow_law.Hooke.A is stored in s-1 MPa-3 (reference units)
            A_Hooke=config.get_number("flow_law.Hooke.A") * 1e-18,
            Q_Hooke=config.get_number("flow_law.Hooke.Q"),
            C_Hooke=config.get_number("flow_law.Hooke.C"),
            K_Hooke=config.get_number("flow_law.Hooke.k"),
            Tr_Hooke=config.get_number("flow_law.Hooke.Tr"))
    if name == "gk":
        if which != "sia":
            raise ValueError(
                "Goldsby-Kohlstedt is SIA-only (no Glen hardness; the "
                "reference FlowLawFactory applies the same restriction)")
        gs = config.get_number("flow_law.gk.grain_size") \
            if config.is_set("flow_law.gk.grain_size") \
            else config.get_number("constants.ice.grain_size", "m")
        return GoldsbyKohlstedt(
            n=n, EC=EC, grain_size=gs,
            R=config.get_number("constants.ideal_gas_constant"))
    if name == "gpbld":
        return GPBLD(
            **pb_kw,
            water_frac_coeff=config.get_number("flow_law.gpbld.water_frac_coeff"),
            water_frac_observed_limit=config.get_number(
                "flow_law.gpbld.water_frac_observed_limit"),
        )
    raise ValueError(f"unknown flow law {name!r}")
