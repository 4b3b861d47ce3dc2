"""Mass-continuity (geometry evolution) step.

Rebuild of PISM ``src/geometry/GeometryEvolution.cc``: the explicit
finite-volume update of ice thickness

    dH/dt = -div(Q_total) + SMB - BMB,
    Q_total = Q_diffusive(SIA) + v_ssa * H_upwind,

with first-order upwind advective flux, donor-cell flux limiting
("projection step") that keeps H >= 0 exactly, application of surface and
basal mass balance with non-negativity clipping, and conservation
bookkeeping. Everything is a fused masked whole-array expression.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ..ops import stencils as st
from ..ops.stencils import Shifter
from .. import state as S


class FluxLimited(NamedTuple):
    Qe: jnp.ndarray
    Qn: jnp.ndarray


class MassTransportResult(NamedTuple):
    thickness: jnp.ndarray
    flux_divergence: jnp.ndarray       # m/s
    # conservation bookkeeping (area-integrated rates, kg/s equivalents in m^3/s)
    nonneg_flux: jnp.ndarray            # ice created by the H>=0 clip (m^3/s)
    smb_flux: jnp.ndarray               # applied surface mass balance (m^3/s)
    bmb_flux: jnp.ndarray               # applied basal mass balance (m^3/s)
    Href: Optional[jnp.ndarray] = None  # part-grid area-specific volume [m]
    Qe: Optional[jnp.ndarray] = None    # limited staggered flux (isochrones)
    Qn: Optional[jnp.ndarray] = None
    # per-cell budget fields (m/s of thickness change) for the spatial
    # tendency_of_ice_amount_due_to_* diagnostics
    flow_field: Optional[jnp.ndarray] = None
    nonneg_field: Optional[jnp.ndarray] = None


def advective_flux(u_face_e, v_face_n, H, sh: Shifter):
    """Q_adv on faces: face-normal SSA velocity times upwind thickness."""
    qe = st.upwind_flux_east(u_face_e, H, sh)
    qn = st.upwind_flux_north(v_face_n, H, sh)
    return qe, qn


def face_velocities(u, v, sh: Shifter):
    """Average cell-centered sliding velocity onto faces."""
    return st.avg_to_east(u, sh), st.avg_to_north(v, sh)


def limit_flux(Qe, Qn, H, dt, dx: float, dy: float, sh: Shifter) -> FluxLimited:
    """Donor-cell flux limiting: scale each cell's total *outflow* so it
    cannot export more ice than it holds (PISM's projection step ensuring
    nonnegative thickness)."""
    out_e = jnp.maximum(Qe, 0.0)                   # leaving through my east face
    out_w = jnp.maximum(-st.shift(Qe, 0, -1, sh.py, sh.px), 0.0)
    out_n = jnp.maximum(Qn, 0.0)
    out_s = jnp.maximum(-st.shift(Qn, -1, 0, sh.py, sh.px), 0.0)

    # total volume leaving per unit time [m^3/s]
    outflow = (out_e + out_w) * dy + (out_n + out_s) * dx
    available = H * dx * dy / jnp.maximum(dt, 1e-30)
    alpha = jnp.where(outflow > 0.0,
                      jnp.minimum(1.0, available / jnp.maximum(outflow, 1e-30)),
                      1.0)

    alpha_e_nbr = sh(alpha, 0, 1)   # donor for westward flow through my east face
    alpha_n_nbr = sh(alpha, 1, 0)

    Qe_lim = Qe * jnp.where(Qe >= 0.0, alpha, alpha_e_nbr)
    Qn_lim = Qn * jnp.where(Qn >= 0.0, alpha, alpha_n_nbr)
    return FluxLimited(Qe_lim, Qn_lim)


def flow_step(geometry: S.Geometry, dt, Qe, Qn, grid, sh: Shifter,
              interior_mask: Optional[jnp.ndarray] = None,
              part_grid: bool = False) -> MassTransportResult:
    """Apply -div(Q) dt with flux limiting. ``interior_mask`` (optional)
    zeroes fluxes on faces touching masked-out cells (regional mode).

    With ``part_grid`` (PISM ``geometry.part_grid.enabled``; Albrecht et al.
    2011): flux entering ice-free ocean cells adjacent to the front fills
    the area-specific volume Href instead of creating thin ice; the cell
    becomes ice-covered once Href reaches the mean thickness of its icy
    neighbors (sub-grid calving-front advance)."""
    H = geometry.ice_thickness
    dx, dy = grid.dx, grid.dy

    if interior_mask is not None:
        keep_e = interior_mask * sh(interior_mask, 0, 1)
        keep_n = interior_mask * sh(interior_mask, 1, 0)
        Qe, Qn = Qe * keep_e, Qn * keep_n

    Qe, Qn = limit_flux(Qe, Qn, H, dt, dx, dy, sh)
    div = st.div_staggered(Qe, Qn, dx, dy, sh)
    dH = -dt * div
    Href = geometry.ice_area_specific_volume

    if part_grid:
        mask = geometry.cell_type
        icy = S.icy(mask)
        ocean_free = mask == S.MASK_ICE_FREE_OCEAN
        nbr_icy = (sh(icy, 0, 1) | sh(icy, 0, -1)
                   | sh(icy, 1, 0) | sh(icy, -1, 0))
        partial = ocean_free & nbr_icy          # candidate part-grid cells
        # inflow into partial cells accumulates in Href
        Href = jnp.where(partial, Href + jnp.maximum(dH, 0.0), Href)
        H_new = jnp.where(partial, H, H + dH)
        # promotion threshold: mean thickness of icy neighbors
        icy_f = icy.astype(H.dtype)
        nsum = (sh(H * icy_f, 0, 1) + sh(H * icy_f, 0, -1)
                + sh(H * icy_f, 1, 0) + sh(H * icy_f, -1, 0))
        ncnt = (sh(icy_f, 0, 1) + sh(icy_f, 0, -1)
                + sh(icy_f, 1, 0) + sh(icy_f, -1, 0))
        H_thresh = nsum / jnp.maximum(ncnt, 1.0)
        promote = partial & (Href >= jnp.maximum(H_thresh, 1.0))
        H_new = jnp.where(promote, Href, H_new)
        Href = jnp.where(promote, 0.0, Href)
        # Href in cells no longer adjacent to ice melts away implicitly
        Href = jnp.where(partial | icy, Href, 0.0)
    else:
        H_new = H + dH

    # The limiter guarantees H_new >= -eps; clamp roundoff and account for it.
    clipped = jnp.maximum(H_new, 0.0)
    nonneg_field = (clipped - H_new) / jnp.maximum(dt, 1e-30)
    nonneg = jnp.sum(nonneg_field) * dx * dy
    return MassTransportResult(
        thickness=clipped,
        flux_divergence=div,
        nonneg_flux=nonneg,
        smb_flux=jnp.zeros(()),
        bmb_flux=jnp.zeros(()),
        Href=Href,
        Qe=Qe, Qn=Qn,
        flow_field=(H_new - H) / jnp.maximum(dt, 1e-30),
        nonneg_field=nonneg_field,
    )


def source_term_step(H, dt, smb, bmb, dx: float, dy: float):
    """Apply surface mass balance and basal melt with H >= 0 clipping,
    tracking the *effective* (applied) amounts (PISM
    ``GeometryEvolution::source_term_step``).

    smb: surface mass balance [m/s ice equivalent] (+ = accumulation)
    bmb: basal melt rate [m/s] (+ = melt, removes ice)
    """
    dH = dt * (smb - bmb)
    H_new = jnp.maximum(H + dH, 0.0)
    effective = (H_new - H) / jnp.maximum(dt, 1e-30)
    # split the effective change proportionally for bookkeeping
    total = smb - bmb
    frac_smb = jnp.where(jnp.abs(total) > 0, smb / jnp.where(total == 0, 1.0, total), 0.0)
    area = dx * dy
    smb_field = effective * frac_smb             # m/s, dH convention
    bmb_field = effective * (1.0 - frac_smb)     # m/s, dH convention (<0 melt)
    smb_applied = jnp.sum(smb_field) * area
    bmb_applied = jnp.sum(bmb_field) * area * -1.0
    return H_new, smb_applied, bmb_applied, smb_field, bmb_field


def max_timestep_cfl_2d(u_face_e, v_face_n, dx: float, dy: float):
    """2D CFL limit from face-normal advective velocities (PISM
    ``max_timestep_cfl_2d``)."""
    rate = jnp.max(jnp.abs(u_face_e)) / dx + jnp.max(jnp.abs(v_face_n)) / dy
    return 1.0 / jnp.maximum(rate, 1e-30)
