"""Enthalpy <-> (temperature, liquid water fraction) conversions.

Rebuild of PISM's ``EnthalpyConverter`` (``src/util/EnthalpyConverter.cc``):
the polythermal state variable is specific enthalpy E [J/kg]; cold ice has
E < E_s(p) with T = T_ref + E/c_i, temperate ice has omega = (E - E_s)/L.
All methods are elementwise jnp expressions, usable on whole 3D fields.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class EnthalpyConverter:
    T_melting: float = 273.15       # melting point at 1 atm [K]
    T_ref: float = 223.15           # reference temperature [K]
    c_i: float = 2009.0             # specific heat of ice [J/(kg K)]
    c_w: float = 4170.0             # specific heat of water
    L0: float = 3.34e5              # latent heat of fusion [J/kg]
    beta: float = 7.9e-8            # Clausius-Clapeyron [K/Pa]
    rho_i: float = 910.0
    g: float = 9.81
    p_air: float = 101325.0

    @classmethod
    def from_config(cls, config) -> "EnthalpyConverter":
        return cls(
            T_melting=config.get_number("constants.fresh_water.melting_point_temperature"),
            T_ref=config.get_number("energy.enthalpy.reference_temperature"),
            c_i=config.get_number("constants.ice.specific_heat_capacity"),
            c_w=config.get_number("constants.fresh_water.specific_heat_capacity"),
            L0=config.get_number("constants.fresh_water.latent_heat_of_fusion"),
            beta=config.get_number("constants.ice.beta_Clausius_Clapeyron"),
            rho_i=config.get_number("constants.ice.density"),
            g=config.get_number("constants.standard_gravity"),
        )

    # -- pressure ------------------------------------------------------------
    def pressure(self, depth):
        """Hydrostatic ice pressure at given depth below the surface."""
        return self.p_air + self.rho_i * self.g * jnp.maximum(depth, 0.0)

    def melting_temperature(self, p):
        return self.T_melting - self.beta * p

    # -- characteristic enthalpies -------------------------------------------
    def enthalpy_cts(self, p):
        """E_s(p): enthalpy at the cold-temperate transition surface."""
        return self.c_i * (self.melting_temperature(p) - self.T_ref)

    def L(self, T_pm):
        """Latent heat of fusion; constant (PISM default)."""
        return self.L0

    def enthalpy_liquid(self, p):
        return self.enthalpy_cts(p) + self.L0

    # -- conversions ---------------------------------------------------------
    def temperature(self, E, p):
        Es = self.enthalpy_cts(p)
        T_cold = self.T_ref + E / self.c_i
        return jnp.where(E < Es, T_cold, self.melting_temperature(p))

    def pressure_adjusted_temperature(self, E, p):
        """T_pa = T - T_m(p) + T_melting: homologous temperature shifted to
        1 atm; what temperature-dependent flow laws consume."""
        return self.temperature(E, p) - self.melting_temperature(p) + self.T_melting

    def water_fraction(self, E, p):
        Es = self.enthalpy_cts(p)
        return jnp.clip((E - Es) / self.L0, 0.0, 1.0)

    def enthalpy(self, T, omega, p):
        """E(T, omega, p) for cold (omega=0) or temperate ice."""
        Es = self.enthalpy_cts(p)
        E_cold = self.c_i * (T - self.T_ref)
        return jnp.where(
            T < self.melting_temperature(p), E_cold, Es + omega * self.L0
        )

    def enthalpy_permissive(self, T, omega, p):
        """Like :meth:`enthalpy` but clamps T above pressure melting into
        temperate state (PISM ``enthalpy_permissive``)."""
        Tm = self.melting_temperature(p)
        return jnp.where(
            T >= Tm,
            self.enthalpy_cts(p) + jnp.clip(omega, 0.0, 1.0) * self.L0,
            self.c_i * (T - self.T_ref),
        )

    def is_temperate(self, E, p):
        return E >= self.enthalpy_cts(p)


@dataclass(frozen=True)
class ColdEnthalpyConverter(EnthalpyConverter):
    """Pretends all ice is cold (PISM ``ColdEnthalpyConverter``): melting
    temperature is +inf for conversion purposes, so E <-> T is linear."""

    def enthalpy_cts(self, p):
        return jnp.inf if jnp.isscalar(p) else jnp.full_like(jnp.asarray(p, jnp.float64) * 0.0 + 1.0, jnp.inf)

    def temperature(self, E, p):
        return self.T_ref + E / self.c_i

    def water_fraction(self, E, p):
        return jnp.zeros_like(E)

    def enthalpy(self, T, omega, p):
        return self.c_i * (T - self.T_ref)
