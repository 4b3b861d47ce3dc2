"""Model state pytrees.

The reference keeps state in DMDA-ghosted ``IceModelVec``s owned by
``IceModel`` and a ``Geometry`` struct (``src/geometry/Geometry.hh``:
thickness, bed, sea level, surface, cell type, grounded fraction, part-grid
area-specific volume). Here the entire model state is one pytree of dense
``jnp`` arrays — the natural JAX seam: pure step functions map state -> state
and the whole tree checkpoints/restores losslessly (bit-stable restarts).

Cell-type mask values match PISM's ``MASK_*`` constants so diagnostics and
tests can compare directly.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

# PISM mask values (src/util/Mask.hh)
MASK_UNKNOWN = -1
MASK_ICE_FREE_BEDROCK = 0
MASK_GROUNDED = 2
MASK_FLOATING = 3
MASK_ICE_FREE_OCEAN = 4


def _register(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_register
@dataclass(frozen=True)
class Geometry:
    """Ice geometry; primary fields + derived fields kept consistent by
    :func:`ensure_consistency` (PISM ``Geometry::ensure_consistency``)."""

    ice_thickness: jnp.ndarray            # H >= 0, (My, Mx)
    bed_elevation: jnp.ndarray            # b, (My, Mx)
    sea_level: jnp.ndarray                # z_sl, (My, Mx)
    ice_area_specific_volume: jnp.ndarray  # part-grid Href [m]
    # derived:
    ice_surface_elevation: jnp.ndarray    # s
    cell_type: jnp.ndarray                # int32 MASK_*
    cell_grounded_fraction: jnp.ndarray   # in [0, 1]

    def replace(self, **kw) -> "Geometry":
        return dataclasses.replace(self, **kw)


def new_geometry(thickness, bed, sea_level=None, Href=None,
                 ice_density=910.0, ocean_density=1028.0,
                 ice_free_thickness=0.01,
                 subgl: bool = False) -> Geometry:
    thickness = jnp.asarray(thickness)
    bed = jnp.asarray(bed)
    if sea_level is None:
        sea_level = jnp.zeros_like(thickness)
    if Href is None:
        Href = jnp.zeros_like(thickness)
    g = Geometry(
        ice_thickness=thickness,
        bed_elevation=bed,
        sea_level=jnp.asarray(sea_level),
        ice_area_specific_volume=Href,
        ice_surface_elevation=jnp.zeros_like(thickness),
        cell_type=jnp.zeros(thickness.shape, jnp.int32),
        cell_grounded_fraction=jnp.zeros_like(thickness),
    )
    return ensure_consistency(g, ice_density, ocean_density,
                              ice_free_thickness,
                              compute_grounded_fraction=subgl)


def grounded_fraction(H, b, sl, mu):
    """Sub-grid grounded area fraction by linear interpolation of the
    flotation excess F = mu H - (sl - b) between neighboring cell centers
    (PISM ``grounded_cell_fraction()``; Gladstone/Feldmann-style sub-grid
    grounding line). Edge-clamped ghosts."""
    from .ops.stencils import shift

    F = mu * H - jnp.maximum(sl - b, 0.0)

    def lam(Fa, Fb):
        """Fraction of the segment from a to b with F > 0."""
        both_pos = (Fa >= 0) & (Fb >= 0)
        both_neg = (Fa < 0) & (Fb < 0)
        cross = Fa / jnp.where(Fa - Fb == 0, 1e-30, Fa - Fb)
        frac_a_pos = jnp.clip(cross, 0.0, 1.0)         # F>0 near a
        frac = jnp.where(Fa >= 0, frac_a_pos, 1.0 - jnp.clip(cross, 0.0, 1.0))
        return jnp.where(both_pos, 1.0, jnp.where(both_neg, 0.0, frac))

    halves = []
    for jy, ix in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        F_mid = 0.5 * (F + shift(F, jy, ix))   # value at the face
        halves.append(lam(F, F_mid))
    gf = sum(halves) / 4.0
    return jnp.clip(gf, 0.0, 1.0).astype(H.dtype)


def ensure_consistency(g: Geometry, ice_density: float, ocean_density: float,
                       ice_free_thickness: float = 0.01,
                       compute_grounded_fraction: bool = False) -> Geometry:
    """Recompute surface elevation, cell type, grounded fraction from
    (H, bed, sea_level) via the flotation criterion."""
    H, b, sl = g.ice_thickness, g.bed_elevation, g.sea_level
    mu = ice_density / ocean_density  # rho_i / rho_w
    water_depth = jnp.maximum(sl - b, 0.0)
    # grounded iff ice weight exceeds water displaced: H >= water_depth / mu
    is_floating = (H * mu) < water_depth
    has_ice = H > ice_free_thickness

    surface = jnp.where(is_floating, sl + H * (1.0 - mu), b + H)

    mask = jnp.where(
        has_ice,
        jnp.where(is_floating, MASK_FLOATING, MASK_GROUNDED),
        jnp.where(b < sl, MASK_ICE_FREE_OCEAN, MASK_ICE_FREE_BEDROCK),
    ).astype(jnp.int32)

    if compute_grounded_fraction:
        gf = grounded_fraction(H, b, sl, mu)
        gf = jnp.where(has_ice, gf, jnp.where(b < sl, 0.0, 1.0)).astype(H.dtype)
    else:
        gf = jnp.where(is_floating & has_ice, H.dtype.type(0.0),
                       H.dtype.type(1.0))

    return g.replace(
        ice_surface_elevation=surface,
        cell_type=mask,
        cell_grounded_fraction=gf,
    )


def icy(cell_type):
    return (cell_type == MASK_GROUNDED) | (cell_type == MASK_FLOATING)


def grounded(cell_type):
    return (cell_type == MASK_GROUNDED) | (cell_type == MASK_ICE_FREE_BEDROCK)


def ocean(cell_type):
    return (cell_type == MASK_FLOATING) | (cell_type == MASK_ICE_FREE_OCEAN)


def grounded_ice(cell_type):
    return cell_type == MASK_GROUNDED


def floating_ice(cell_type):
    return cell_type == MASK_FLOATING


def ice_free(cell_type):
    return (cell_type == MASK_ICE_FREE_BEDROCK) | (cell_type == MASK_ICE_FREE_OCEAN)


@_register
@dataclass(frozen=True)
class ModelState:
    """Full prognostic state of the coupled model (one pytree).

    Optional subsystem fields are ``None`` until the corresponding component
    is enabled — None leaves vanish from the pytree, so jit signatures stay
    minimal.
    """

    geometry: Geometry
    enthalpy: Optional[jnp.ndarray] = None           # (My, Mx, Mz) J/kg
    bedrock_temperature: Optional[jnp.ndarray] = None  # (My, Mx, Mbz) K
    basal_melt_rate: Optional[jnp.ndarray] = None    # m/s ice equivalent
    u_ssa: Optional[jnp.ndarray] = None              # (My, Mx) m/s
    v_ssa: Optional[jnp.ndarray] = None
    # previous-step SSA velocity + dt for the time-extrapolated Newton warm
    # start (stress_balance.ssa.fd.extrapolate_initial_guess); pure warm-
    # start hints, not checkpointed
    u_ssa_prev: Optional[jnp.ndarray] = None
    v_ssa_prev: Optional[jnp.ndarray] = None
    dt_prev: Optional[jnp.ndarray] = None
    tillwat: Optional[jnp.ndarray] = None            # till water thickness m
    till_phi: Optional[jnp.ndarray] = None           # till friction angle deg
    hydro_W: Optional[jnp.ndarray] = None            # transportable water m
    hydro_P: Optional[jnp.ndarray] = None            # water pressure Pa
    hydro_Q: Optional[jnp.ndarray] = None            # steady discharge m^2/s
    age: Optional[jnp.ndarray] = None                # (My, Mx, Mz) s
    bed_uplift: Optional[jnp.ndarray] = None         # viscous bed displacement state
    bed_load_reference: Optional[jnp.ndarray] = None
    bed_reference: Optional[jnp.ndarray] = None      # undeformed bed + initial load
    fracture_density: Optional[jnp.ndarray] = None
    fracture_age: Optional[jnp.ndarray] = None       # (My, Mx) s
    ch_enthalpy: Optional[jnp.ndarray] = None        # cryo-hydrologic system 3D
    iso_layers: Optional[jnp.ndarray] = None         # (My, Mx, NL) isochrone layers
    iso_top: Optional[jnp.ndarray] = None            # int32 active top layer
    geothermal_flux: Optional[jnp.ndarray] = None    # 2D bheatflx map W/m^2
    snow_depth: Optional[jnp.ndarray] = None         # PDD snow bookkeeping m i.e.
    firn_depth: Optional[jnp.ndarray] = None         # PDD firn bookkeeping m i.e.
    surface_albedo: Optional[jnp.ndarray] = None     # dEBM-simple albedo [1]

    def replace(self, **kw) -> "ModelState":
        return dataclasses.replace(self, **kw)
