"""3D SIA velocity reconstruction, vertical velocity, strain heating.

Rebuild of the 3D parts of PISM's stress balance
(``src/stressbalance/SIAFD.cc`` horizontal 3D velocity,
``StressBalance::compute_vertical_velocity`` from incompressibility, and the
volumetric strain heating ``Sigma``): everything is a cumulative trapezoid
integral over the trailing z axis, fused over all columns.

SIA shear velocity (z = height above base):
    u(z) = u_b - 2 e (rho g)^n |grad s|^(n-1) s_x * I(z),
    I(z) = int_0^z A(E, p) (H - z')^n dz'
Vertical velocity: w(z) = w_b - int_0^z (u_x + v_y) dz'.
Strain heating:    Phi(z) = 2 e A(E, p) tau(z)^(n+1),  tau = rho g (H-z)|grad s|.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from . import stencils as st
from .stencils import Shifter


class SIA3D(NamedTuple):
    u: jnp.ndarray               # (My, Mx, Mz) m/s
    v: jnp.ndarray
    w: jnp.ndarray
    strain_heating: jnp.ndarray  # (My, Mx, Mz) W/m^3
    max_u: jnp.ndarray           # scalars for 3D CFL
    max_v: jnp.ndarray


def _cumtrapz_z(f, z):
    """Cumulative trapezoid along the trailing axis; result[..., 0] = 0."""
    dz = jnp.diff(jnp.asarray(z))
    mid = 0.5 * (f[..., 1:] + f[..., :-1]) * dz
    out = jnp.cumsum(mid, axis=-1)
    return jnp.concatenate([jnp.zeros_like(f[..., :1]), out], axis=-1)


def sia_3d(flow_law, geometry, enthalpy: Optional[jnp.ndarray], grid,
           sh: Shifter, *, n: float = 3.0, enhancement: float = 1.0,
           rho: float = 910.0, g: float = 9.81,
           u_base: Optional[jnp.ndarray] = None,
           v_base: Optional[jnp.ndarray] = None,
           basal_melt_rate: Optional[jnp.ndarray] = None,
           max_diffusivity: Optional[float] = None,
           w_approximation: str = "centered",
           icy_threshold: float = 0.0) -> SIA3D:
    """Cell-centered 3D velocities and strain heating.

    ``max_diffusivity``: when the SIA diffusivity is capped
    (``stress_balance.sia.limit_diffusivity``), the 3D shear velocities
    are scaled per column so the column flux integral int phi dz matches
    the same cap — otherwise uncapped cliff velocities (1e8 m/a observed
    at flickering 5-10 km margins) keep collapsing the 3D CFL dt even
    though the mass transport they would imply is already capped."""
    H = geometry.ice_thickness
    s = geometry.ice_surface_elevation
    b = geometry.bed_elevation
    z = jnp.asarray(grid.z, H.dtype)

    s_x, s_y = st.centered_grad(s, grid.dx, grid.dy, sh)
    slope2 = s_x ** 2 + s_y ** 2
    slope = jnp.sqrt(slope2)

    Hc = H[..., None]
    depth = jnp.maximum(Hc - z, 0.0)
    tau = rho * g * depth * slope[..., None]
    if getattr(flow_law, "generalized", False):
        # stress-dependent law (Goldsby-Kohlstedt): du/dz = 2 F(tau) tau
        if enthalpy is None:
            raise ValueError("generalized flow law needs enthalpy")
        p = flow_law.EC.pressure(depth)
        F3 = flow_law.flow(tau, enthalpy, p)
        # enhancement may be (My, Mx, Mz) (age-coupled): fold it into the
        # z integrand — identical to the scalar post-multiply when 0-d
        e3 = jnp.asarray(enhancement, H.dtype)
        phi = 2.0 * rho * g * _cumtrapz_z(e3 * F3 * depth, z)
        A3 = None
    else:
        if enthalpy is None:
            A = flow_law.softness(jnp.zeros((), H.dtype),
                                  jnp.zeros((), H.dtype))
            A3 = jnp.broadcast_to(A, depth.shape)
        else:
            p = flow_law.EC.pressure(depth)
            A3 = flow_law.softness(enthalpy, p)

        e3 = jnp.asarray(enhancement, H.dtype)
        C = 2.0 * (rho * g) ** n
        integrand = e3 * A3 * depth ** n
        I = _cumtrapz_z(integrand, z)                       # (My, Mx, Mz)
        phi = C * slope[..., None] ** (n - 1.0) * I

    if max_diffusivity is not None:
        # column diffusivity D = int_0^H phi dz (q = -D grad s); scale the
        # shear profile so it respects the same cap as the 2D flux
        z_c = jnp.minimum(z, Hc)
        wgt = jnp.diff(z_c, axis=-1)
        D_col = jnp.sum(0.5 * (phi[..., 1:] + phi[..., :-1]) * wgt, axis=-1)
        scale = jnp.minimum(1.0, max_diffusivity
                            / jnp.maximum(D_col, 1e-30))
        phi = phi * scale[..., None]

    ub = u_base if u_base is not None else jnp.zeros_like(H)
    vb = v_base if v_base is not None else jnp.zeros_like(H)
    in_ice = (z <= Hc) | (jnp.arange(z.shape[0]) == 0)
    u = jnp.where(in_ice, ub[..., None] - phi * s_x[..., None], 0.0)
    v = jnp.where(in_ice, vb[..., None] - phi * s_y[..., None], 0.0)

    # vertical velocity from incompressibility; the horizontal divergence
    # is centered by default, or upstream-biased by the sliding-velocity
    # direction (reference stress_balance.vertical_velocity_approximation:
    # "centered" | "upstream", StressBalance::compute_vertical_velocity)
    if w_approximation == "upstream":
        up_x = (ub >= 0.0)[..., None]
        up_y = (vb >= 0.0)[..., None]
        u_x = jnp.where(up_x, (u - sh(u, 0, -1)) / grid.dx,
                        (sh(u, 0, 1) - u) / grid.dx)
        v_y = jnp.where(up_y, (v - sh(v, -1, 0)) / grid.dy,
                        (sh(v, 1, 0) - v) / grid.dy)
    else:
        u_x = (sh(u, 0, 1) - sh(u, 0, -1)) / (2.0 * grid.dx)
        v_y = (sh(v, 1, 0) - sh(v, -1, 0)) / (2.0 * grid.dy)
    div_uv = u_x + v_y
    b_x, b_y = st.centered_grad(b, grid.dx, grid.dy, sh)
    w_base = ub * b_x + vb * b_y
    if basal_melt_rate is not None:
        w_base = w_base - basal_melt_rate
    w = w_base[..., None] - _cumtrapz_z(div_uv, z)
    w = jnp.where(in_ice, w, 0.0)

    # volumetric strain heating (SIA shear dissipation)
    if A3 is None:
        Phi = 2.0 * e3 * F3 * tau ** 2
    else:
        Phi = 2.0 * e3 * A3 * tau ** (n + 1.0)
    Phi = jnp.where(z < Hc, Phi, 0.0)

    # 3D CFL maxima over ICY cells only (reference max_timestep_cfl_3d
    # loops over thk > 0): level 0 of u/v carries the margin-extension
    # sliding velocity even at H = 0 cells (needed for transport), which
    # must not restrict the energy-advection dt — there is no enthalpy
    # to advect there
    icy3 = Hc > icy_threshold
    return SIA3D(
        u=u, v=v, w=w, strain_heating=Phi,
        max_u=jnp.max(jnp.abs(jnp.where(icy3, u, 0.0))),
        max_v=jnp.max(jnp.abs(jnp.where(icy3, v, 0.0))),
    )


def max_timestep_cfl_3d(max_u, max_v, dx: float, dy: float):
    """3D CFL for the explicit horizontal enthalpy/age advection (PISM
    ``max_timestep_cfl_3d``)."""
    rate = max_u / dx + max_v / dy
    return 1.0 / jnp.maximum(rate, 1e-30)
