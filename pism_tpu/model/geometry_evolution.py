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
              part_grid: bool = False,
              part_grid_iterations: int = 2) -> MassTransportResult:
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

        def nbr_any(b):
            return (sh(b, 0, 1) | sh(b, 0, -1) | sh(b, 1, 0) | sh(b, -1, 0))

        def nbr_sum(f):
            return (sh(f, 0, 1) + sh(f, 0, -1) + sh(f, 1, 0) + sh(f, -1, 0))

        partial = ocean_free & nbr_any(icy)     # candidate part-grid cells
        # Face-resolved inflow into partial cells accumulates in Href
        # (reference ``GeometryEvolution::flow_step`` adds the actual
        # limited face fluxes into each part-grid cell, not the net
        # divergence change; with outflow limited to zero at H=0 cells the
        # two agree, but the face-resolved form is the faithful one).
        inflow_rate = (
            (jnp.maximum(-Qe, 0.0)
             + jnp.maximum(st.shift(Qe, 0, -1, sh.py, sh.px), 0.0)) * dy
            + (jnp.maximum(-Qn, 0.0)
               + jnp.maximum(st.shift(Qn, -1, 0, sh.py, sh.px), 0.0)) * dx
        ) / (dx * dy)
        Href = jnp.where(partial, Href + dt * inflow_rate, Href)
        # The rest of dH (the limited outflow) still applies to H: a cell
        # classified ice-free ocean can carry sub-threshold residual
        # thickness that keeps draining through upwind fluxes — freezing H
        # here would create the exported ice out of nothing.
        H_new = jnp.where(partial, H + dH - dt * inflow_rate, H + dH)

        # Promotion + residual redistribution (reference
        # ``GeometryEvolution::residual_redistribution``): a part-grid cell
        # whose Href reaches the mean thickness of its icy neighbors becomes
        # ice-covered AT that threshold thickness; the excess Href is pushed
        # to neighboring still-eligible part-grid cells in equal shares
        # (absorbed into the promoted cell only when no neighbor can take
        # it, which conserves mass either way). geometry.part_grid.max_
        # iterations unrolled sweeps bound the cascade per step; leftover
        # Href simply persists as state.
        icy_dyn = icy
        ocean_dyn = ocean_free
        for _ in range(max(int(part_grid_iterations), 1)):
            partial_dyn = ocean_dyn & nbr_any(icy_dyn)
            icy_f = icy_dyn.astype(H.dtype)
            nsum = nbr_sum(H_new * icy_f)
            ncnt = nbr_sum(icy_f)
            H_thresh = jnp.maximum(nsum / jnp.maximum(ncnt, 1.0), 1.0)
            promote = partial_dyn & (Href >= H_thresh)
            residual = jnp.where(promote, Href - H_thresh, 0.0)
            H_new = jnp.where(promote, H_thresh, H_new)
            Href = jnp.where(promote, 0.0, Href)
            icy_dyn = icy_dyn | promote
            ocean_dyn = ocean_dyn & ~promote
            # eligible receivers after this promotion wave
            eligible = ocean_dyn & nbr_any(icy_dyn)
            n_elig = nbr_sum(eligible.astype(H.dtype))
            share = jnp.where(promote & (n_elig > 0),
                              residual / jnp.maximum(n_elig, 1.0), 0.0)
            received = nbr_sum(share)
            Href = Href + jnp.where(eligible, received, 0.0)
            H_new = H_new + jnp.where(promote & (n_elig == 0), residual, 0.0)
        # Orphaned Href (cells no longer adjacent to ice) becomes thin ice
        # subject to normal dynamics instead of vanishing — zeroing it here
        # would destroy mass
        orphan = (Href > 0.0) & ~((ocean_dyn & nbr_any(icy_dyn)) | icy_dyn)
        H_new = H_new + jnp.where(orphan, Href, 0.0)
        Href = jnp.where(orphan, 0.0, Href)
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
    # Apply the fluxes sequentially with per-stage clipping (the reference
    # applies effective_SMB then effective_BMB); a proportional split blows
    # up the bookkeeping when smb and bmb nearly cancel with opposite signs.
    dt_safe = jnp.maximum(dt, 1e-30)
    H1 = jnp.maximum(H + dt * smb, 0.0)
    smb_field = (H1 - H) / dt_safe               # m/s, dH convention
    H_new = jnp.maximum(H1 - dt * bmb, 0.0)
    bmb_field = (H_new - H1) / dt_safe           # m/s, dH convention (<0 melt)
    area = dx * dy
    smb_applied = jnp.sum(smb_field) * area
    bmb_applied = jnp.sum(bmb_field) * area * -1.0
    return H_new, smb_applied, bmb_applied, smb_field, bmb_field


def max_timestep_cfl_2d(u_face_e, v_face_n, dx: float, dy: float):
    """2D CFL limit from face-normal advective velocities (PISM
    ``max_timestep_cfl_2d``)."""
    rate = jnp.max(jnp.abs(u_face_e)) / dx + jnp.max(jnp.abs(v_face_n)) / dy
    return 1.0 / jnp.maximum(rate, 1e-30)
