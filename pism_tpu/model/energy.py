"""Polythermal enthalpy conservation (energy model).

Rebuild of PISM ``src/energy/`` (``EnthalpyModel``, ``enthSystem.cc``): per
column, an implicit advection-conduction solve for specific enthalpy E with
temperate-ice drainage and a basal melt-rate budget. In the reference this is
one small tridiagonal solve per (i, j) column inside a C++ loop; here ALL
columns are solved simultaneously by the batched Thomas solver
(``util.tridiag.solve_batched`` — two lax.scans over z with (My, Mx)-plane
carries), and the per-column boundary-condition logic becomes masked row
selection.

Equation (z = height above base, within ice 0 <= z <= H):
    dE/dt + u E_x + v E_y + w E_z = (kappa(E) E_z)_z + Phi / rho
with kappa = k_i/(rho c_i) for cold ice, kappa_t = ratio * kappa for
temperate ice. Horizontal advection is explicit first-order upwind (PISM
does the same); vertical advection and conduction are implicit.

Basal boundary (grounded): cold base -> Neumann with geothermal + friction
heating; temperate base -> Dirichlet at E_s(p_b) with melt rate from the
flux imbalance. Floating base -> Dirichlet at E_s(p_b).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .. import state as S
from ..ops import stencils as st
from ..ops.sia3d import SIA3D
from ..ops.stencils import Shifter
from ..physics.enthalpy_converter import EnthalpyConverter
from ..util.tridiag import solve_batched


class EnergyStepResult(NamedTuple):
    enthalpy: jnp.ndarray
    basal_melt_rate: jnp.ndarray
    ch_enthalpy: Optional[jnp.ndarray] = None  # cryo-hydrologic system


@dataclass
class EnergyModel:
    """Enthalpy-based energy conservation component."""

    grid: object
    config: object
    EC: EnthalpyConverter

    def __post_init__(self):
        cfg = self.config
        self.rho = cfg.get_number("constants.ice.density")
        self.c_i = cfg.get_number("constants.ice.specific_heat_capacity")
        self.k_i = cfg.get_number("constants.ice.thermal_conductivity")
        self.L = cfg.get_number("constants.fresh_water.latent_heat_of_fusion")
        self.kappa_cold = self.k_i / (self.rho * self.c_i)   # m^2/s
        self.temperate_ratio = cfg.get_number(
            "energy.enthalpy.temperate_ice_thermal_conductivity_ratio")
        self.drain_rate = cfg.get_number("energy.drainage_maximum_rate", "s-1")
        self.bulge_max = cfg.get_number("energy.enthalpy.cold_bulge_max")
        self.drain_target = cfg.get_number("energy.drainage_target_water_fraction")
        self.geothermal_default = cfg.get_number("bootstrapping.defaults.geothermal_flux")
        self.ch_enabled = cfg.get_flag("energy.ch_warming.enabled")
        self.ch_spacing = cfg.get_number(
            "energy.ch_warming.average_channel_spacing")
        self.k_of_T = cfg.get_flag("energy.temperature_dependent_conductivity")
        self.basal_melt_max = cfg.get_number("energy.basal_melt.max", "m s-1")
        self.ch_omega = cfg.get_number(
            "energy.ch_warming.residual_water_fraction")
        self.sh = Shifter(self.grid)
        z = np.asarray(self.grid.z)
        self.dz = jnp.asarray(np.diff(z))                     # (Mz-1,)
        self.z = jnp.asarray(z)

    def max_timestep(self):
        return None  # restricted via the 3D CFL computed by the stress balance

    # ------------------------------------------------------------------
    def step(self, state: S.ModelState, sia3: SIA3D, surface_T,
             dt, geothermal_flux=None, frictional_heating=None,
             tillwat=None, ch_enthalpy=None,
             surface_melt=None) -> EnergyStepResult:
        """Advance enthalpy by dt.

        surface_T: (My, Mx) ice surface temperature [K]
        geothermal_flux: (My, Mx) or None -> config default [W/m^2]
        frictional_heating: basal tau_b . u_b [W/m^2] (sliding), optional
        ch_enthalpy / surface_melt: cryo-hydrologic warming (reference
        ``energy.ch_warming``, src/energy/CHSystem.cc; Phillips et al.
        2010): a parallel water-filled-crack enthalpy column. Where the
        surface is melting the CH columns reset to water-saturated at the
        pressure-melting point; elsewhere they cool by conduction. The ice
        columns receive the volumetric heating
        k_i (T_ch - T_ice) / R^2 (R = average crack spacing), >= 0.
        """
        EC, grid = self.EC, self.grid
        E = state.enthalpy
        H = state.geometry.ice_thickness
        mask = state.geometry.cell_type
        z = self.z.astype(E.dtype)
        dz = self.dz.astype(E.dtype)
        Hc = H[..., None]

        if geothermal_flux is None:
            geothermal_flux = jnp.full(H.shape, self.geothermal_default, H.dtype)
        G = geothermal_flux
        if frictional_heating is not None:
            G = G + frictional_heating

        # -- boundary values ------------------------------------------------
        T_sfc = jnp.minimum(surface_T, EC.T_melting)
        E_sfc = EC.enthalpy(T_sfc, 0.0, EC.pressure(0.0))     # (My, Mx)
        p_base = EC.pressure(H)
        # enthalpy at the basal pressure-melting point (finite also for the
        # cold converter, whose E_s(p) is +inf)
        Es_base = EC.enthalpy(EC.melting_temperature(p_base), 0.0, p_base)

        floating = S.floating_ice(mask)
        icy = S.icy(mask)
        base_temperate = (E[..., 0] >= Es_base) | floating

        # -- explicit horizontal advection (first-order upwind) -------------
        sh = self.sh
        u, v = sia3.u, sia3.v
        dEdx_up = jnp.where(
            u >= 0.0, (E - sh(E, 0, -1)) / grid.dx, (sh(E, 0, 1) - E) / grid.dx)
        dEdy_up = jnp.where(
            v >= 0.0, (E - sh(E, -1, 0)) / grid.dy, (sh(E, 1, 0) - E) / grid.dy)
        rhs_adv = -(u * dEdx_up + v * dEdy_up)

        # -- conduction coefficients (lagged diffusivity) --------------------
        depth = jnp.maximum(Hc - z, 0.0)
        p3 = EC.pressure(depth)
        temperate3 = E >= EC.enthalpy_cts(p3)
        kappa_cold3 = self.kappa_cold
        if self.k_of_T:
            # reference energy.temperature_dependent_conductivity:
            # k(T) = 9.828 exp(-0.0057 T) [W/m/K] for cold ice (lagged on
            # the previous step's enthalpy)
            T3 = EC.temperature(E, p3)
            kappa_cold3 = 9.828 * jnp.exp(-0.0057 * T3) / (self.rho * self.c_i)
        kappa = jnp.where(temperate3, self.kappa_cold * self.temperate_ratio,
                          kappa_cold3)
        kap_m = 0.5 * (kappa[..., 1:] + kappa[..., :-1])      # at interfaces

        dz_l = jnp.concatenate([dz[:1], dz])                  # dz below level k
        dz_u = jnp.concatenate([dz, dz[-1:]])                 # dz above level k
        # partial top layer: at the highest in-ice level the Dirichlet surface
        # value sits at the true surface z = H, not at the next grid level
        z_next = jnp.concatenate([z[1:], z[-1:] + dz[-1]])
        is_sfc_layer = (z <= Hc) & (z_next > Hc)
        dz_u3 = jnp.where(is_sfc_layer,
                          jnp.maximum(Hc - z, 0.05 * dz_u), dz_u)
        dz_l3 = jnp.broadcast_to(dz_l, dz_u3.shape)
        dz_c = 0.5 * (dz_l3 + dz_u3)

        kap_below = jnp.concatenate([kap_m[..., :1], kap_m], axis=-1)
        kap_above = jnp.concatenate([kap_m, kap_m[..., -1:]], axis=-1)

        w = sia3.w
        w_pos = jnp.maximum(w, 0.0)
        w_neg = jnp.minimum(w, 0.0)

        a = dt * (-kap_below / (dz_l3 * dz_c) - w_pos / dz_l3)
        c = dt * (-kap_above / (dz_u3 * dz_c) + w_neg / dz_u3)
        b = 1.0 - a - c
        d = E + dt * (sia3.strain_heating / self.rho + rhs_adv)

        # -- cryo-hydrologic warming source (explicit in the CH state) ------
        ch_new = None
        if self.ch_enabled and ch_enthalpy is not None:
            T_ch = EC.temperature(ch_enthalpy, p3)
            T_ice = EC.temperature(E, p3)
            Q_ch = self.k_i * jnp.maximum(T_ch - T_ice, 0.0) \
                / self.ch_spacing ** 2                       # W/m^3
            in_ice = (z <= Hc) & icy[..., None]
            d = d + jnp.where(in_ice, dt * Q_ch / self.rho, 0.0)

        # -- air rows (levels above the ice surface): E = E_sfc --------------
        is_air = z > Hc
        a = jnp.where(is_air, 0.0, a)
        c = jnp.where(is_air, 0.0, c)
        b = jnp.where(is_air, 1.0, b)
        d = jnp.where(is_air, E_sfc[..., None], d)

        # -- basal row -------------------------------------------------------
        # Neumann (cold grounded): E0 - E1 = G dz0 c_i / k_i
        neumann_d = G * dz[0] * self.c_i / self.k_i
        dirichlet = base_temperate
        a0 = jnp.zeros_like(H)
        b0 = jnp.ones_like(H)
        c0 = jnp.where(dirichlet, 0.0, -jnp.ones_like(H))
        d0 = jnp.where(dirichlet, Es_base, neumann_d)
        a = a.at[..., 0].set(a0)
        b = b.at[..., 0].set(b0)
        c = c.at[..., 0].set(c0)
        d = d.at[..., 0].set(d0)

        E_new = solve_batched(a, b, c, d)

        # -- cold-bulge limiter (reference enthSystem bulge limiter): the
        # downward advection of cold surface ice must not cool a column more
        # than cold_bulge_max below its surface enthalpy
        E_new = jnp.maximum(E_new, E_sfc[..., None] - self.bulge_max)

        # -- thin/ice-free columns: surface-value column ---------------------
        thin = H < jnp.maximum(z[1], 1.0)
        E_col_sfc = jnp.broadcast_to(E_sfc[..., None], E_new.shape)
        E_new = jnp.where((thin | ~icy)[..., None], E_col_sfc, E_new)

        # -- drainage of excess liquid water --------------------------------
        omega = EC.water_fraction(E_new, p3)
        excess = jnp.maximum(omega - self.drain_target, 0.0)
        drained = jnp.minimum(excess, self.drain_rate * dt)
        E_new = E_new - drained * self.L
        # column-integrated drained water -> basal melt contribution [m/s ice]
        mid_drain = 0.5 * (drained[..., 1:] + drained[..., :-1])
        in_ice_mid = 0.5 * ((z[:-1] < Hc) + (z[1:] < Hc))
        drain_flux = jnp.sum(mid_drain * in_ice_mid * dz, axis=-1) / jnp.maximum(dt, 1e-30)

        # -- cryo-hydrologic column evolution --------------------------------
        if self.ch_enabled and ch_enthalpy is not None:
            # conduction-only implicit column solve (no advection, no
            # strain heating) with the same surface/basal rows
            a_ch = dt * (-kap_below / (dz_l3 * dz_c))
            c_ch = dt * (-kap_above / (dz_u3 * dz_c))
            b_ch = 1.0 - a_ch - c_ch
            d_ch = ch_enthalpy
            a_ch = jnp.where(is_air, 0.0, a_ch)
            c_ch = jnp.where(is_air, 0.0, c_ch)
            b_ch = jnp.where(is_air, 1.0, b_ch)
            d_ch = jnp.where(is_air, E_sfc[..., None], d_ch)
            a_ch = a_ch.at[..., 0].set(a0)
            b_ch = b_ch.at[..., 0].set(b0)
            c_ch = c_ch.at[..., 0].set(c0)
            d_ch = d_ch.at[..., 0].set(d0)
            ch_cooled = solve_batched(a_ch, b_ch, c_ch, d_ch)
            # melt season: columns flush with water at the pressure-melting
            # point (+ residual water fraction)
            E_sat = EC.enthalpy_cts(p3) + self.ch_omega * self.L
            melting = surface_T >= (EC.T_melting - 1e-3) if surface_melt is None \
                else surface_melt > 0.0
            ch_new = jnp.where((melting & icy)[..., None]
                               & (z <= Hc), E_sat, ch_cooled)
            ch_new = jnp.where((thin | ~icy)[..., None], E_col_sfc, ch_new)

        # -- basal melt budget (grounded) ------------------------------------
        # upward conductive flux in the ice just above the base
        kap0 = kap_m[..., 0]
        q_ice = -(kap0 * self.rho) * (E_new[..., 1] - E_new[..., 0]) / dz[0]
        # if the lowest layer is temperate, conduction there is negligible
        M_b = jnp.where(base_temperate & ~floating,
                        (G - q_ice) / (self.rho * self.L), 0.0)
        if tillwat is None:
            M_b = jnp.maximum(M_b, 0.0)
        else:
            M_b = jnp.where(tillwat > 0.0, M_b, jnp.maximum(M_b, 0.0))
        M_b = jnp.where(icy & ~floating, M_b + drain_flux, 0.0)
        # reference energy.basal_melt.max: sanity cap (|M_b| bounded)
        if self.basal_melt_max > 0.0:
            M_b = jnp.clip(M_b, -self.basal_melt_max, self.basal_melt_max)

        return EnergyStepResult(enthalpy=E_new, basal_melt_rate=M_b,
                                ch_enthalpy=ch_new)


def bootstrap_enthalpy(grid, EC: EnthalpyConverter, thickness, surface_T,
                       smb=None, geothermal=0.042, k_i=2.10,
                       heuristic: str = "smb", rho=910.0, c_i=2009.0):
    """Initial 3D enthalpy guess (PISM ``src/energy/utilities.cc``
    bootstrap profiles, selected by ``bootstrapping.temperature_heuristic``):

    - ``"smb"`` with an SMB field: the Robin (1955) advective-conductive
      steady profile T(z) = T_s + (G/k)(sqrt(pi)/2) q [erf(H/q) - erf(z/q)]
      with q = sqrt(2 kappa H / a) and a the accumulation rate — downward
      advection of cold surface ice thins the basal thermal boundary layer.
    - ``"quartic_guess"`` (or no SMB): the conduction-only profile
      T(z) = T_s + (G/k)(H - z).

    Both are capped at the pressure-melting point."""
    H = jnp.asarray(thickness)
    z = jnp.asarray(grid.z)
    Hc = H[..., None]
    depth = jnp.maximum(Hc - z, 0.0)
    G = jnp.asarray(geothermal)
    if G.ndim == 2:          # 2D bheatflx map
        G = G[..., None]
    Ts = jnp.asarray(surface_T)[..., None]
    if heuristic == "smb" and smb is not None:
        import jax.scipy.special as jss
        kappa = k_i / (rho * c_i)
        a = jnp.maximum(jnp.asarray(smb)[..., None], 1e-12)   # m/s
        q = jnp.sqrt(2.0 * kappa * jnp.maximum(Hc, 1.0) / a)
        zz = jnp.maximum(Hc - depth, 0.0)    # height above base
        T = Ts + (G / k_i) * (jnp.sqrt(jnp.pi) / 2.0) * q \
            * (jss.erf(Hc / q) - jss.erf(zz / q))
    else:
        T = Ts + G / k_i * depth
    p = EC.pressure(depth)
    Tm = EC.melting_temperature(p)
    T = jnp.minimum(T, Tm)
    return EC.enthalpy(T, 0.0, p)
