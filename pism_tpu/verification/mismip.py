"""MISMIP marine ice-sheet intercomparison setups.

Rebuild of the MISMIP experiment configuration PISM ships as example run
scripts (``examples/mismip/``, ``examples/mismip3d/``): a flowline-style
marine ice sheet on a linear downward-sloping bed (MISMIP experiment 1) with
a Weertman power-law sliding relation tau_b = C |u|^(1/3), SSA(+SIA)
dynamics, constant accumulation, evolving to a steady grounding line whose
flux obeys the Schoof (2007) boundary-layer relation (used as the
quantitative check in tests).

Sliding: PISM expresses Weertman sliding via the pseudo-plastic law with
q = 1/3 and tau_c = C * u_threshold^q, which reproduces
tau_b = C |u|^q exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config.config import Config
from ..coupler.surface import FunctionSurface
from ..grid import Grid
from ..state import ModelState, new_geometry

SEC_PER_YEAR = 3.15569259747e7

# MISMIP (Pattyn et al. 2012) experiment 1 constants
RHO_I = 900.0      # MISMIP uses 900, not PISM's 910
RHO_W = 1000.0
A_MISMIP = 4.6416e-24          # Pa^-3 s^-1 (step 1 softness)
C_SCHOOF = 7.624e6             # Pa m^-1/3 s^1/3
ACCUMULATION = 0.3 / SEC_PER_YEAR  # m/s
N_GLEN = 3.0


def bed_elevation_linear(x):
    """MISMIP experiment 1 bed: 720 m at the divide, sloping down."""
    return 720.0 - 778.5 * np.abs(np.asarray(x)) / 750.0e3


def schoof_gl_flux(H_g, A=A_MISMIP, C=C_SCHOOF, m=1.0 / 3.0,
                   rho=RHO_I, rho_w=RHO_W, g=9.81, n=N_GLEN):
    """Schoof (2007) boundary-layer grounding-line flux q(H_g) [m^2/s]."""
    theta = 1.0 - rho / rho_w
    return (A * (rho * g) ** (n + 1.0) * theta ** n / (4.0 ** n * C)) \
        ** (1.0 / (m + 1.0)) * H_g ** ((m + n + 3.0) / (m + 1.0))


@dataclass
class MISMIPSetup:
    grid: Grid
    config: Config
    state: ModelState
    surface: FunctionSurface
    calving: object = None   # CalvingModel with the ocean_kill edge mask


def initial_profile(x, H_divide: float = 2800.0, margin: float = 950.0e3):
    """Near-steady Vialov-type initial thickness (the MISMIP protocol
    initializes from a semi-analytic profile, not a thin slab: the
    uniform-slab spin-up transient is O(50 kyr) because kinematic waves
    from the divide/GL cross the flank at ~H^4)."""
    xi = np.minimum(np.abs(np.asarray(x)) / margin, 1.0)
    return H_divide * np.maximum(1.0 - xi ** (4.0 / 3.0), 0.0) ** (3.0 / 8.0)


def setup(Mx: int = 151, My: int = 7, Lx: float = 1500.0e3,
          H_init: float = None) -> MISMIPSetup:
    """Half-domain flowline setup: divide at x = 0 handled by symmetry of
    the full domain [-Lx, Lx]; narrow periodic y. H_init: constant slab
    thickness (None = near-steady analytic profile)."""
    wy = (My - 1) / 2.0 * (2 * Lx / (Mx - 1))
    grid = Grid(Mx=Mx, My=My, Lx=Lx, Ly=wy, periodicity="y")

    u_th = 100.0 / SEC_PER_YEAR
    tau_c = C_SCHOOF * u_th ** (1.0 / 3.0)

    config = Config({
        "stress_balance.model": "ssa+sia",
        "stress_balance.sia.flow_law": "isothermal_glen",
        "stress_balance.ssa.flow_law": "isothermal_glen",
        "flow_law.isothermal_Glen.ice_softness": A_MISMIP,
        "constants.ice.density": RHO_I,
        "constants.sea_water.density": RHO_W,
        "basal_resistance.pseudo_plastic.enabled": True,
        "basal_resistance.pseudo_plastic.q": 1.0 / 3.0,
        "basal_resistance.pseudo_plastic.u_threshold": 100.0,  # m/a
        "basal_yield_stress.model": "constant",
        "basal_yield_stress.constant.value": tau_c,
        "energy.model": "none",
        "geometry.ice_free_thickness_standard": 0.01,
        # calve thin shelf ice: keeps the (dynamically irrelevant) far shelf
        # from spreading at extreme speeds, as PISM's MISMIP scripts do
        "calving.methods": "thickness_calving",
        "calving.thickness_calving.threshold": 30.0,
        "geometry.remove_icebergs": True,
        # sub-grid front advance: inflow to ice-free ocean accumulates in
        # Href instead of creating near-zero-thickness cells whose SSA
        # speeds would dominate the CFL
        "geometry.part_grid.enabled": True,
        # NOTE: coarse grids need the sub-grid friction scaling
        # (geometry.grounded_cell_fraction) for a quantitative GL position
        # — see examples/mismip_study.py and docs/VALIDATION.md.
        # The far shelf legitimately reaches ~80 km/a near the kill front
        # (strain ~0.2/a over hundreds of km); a tight speed cap would
        # distort it and jitter the grounding line
        "stress_balance.ssa.fd.max_speed": 150.0e3,  # m/a
        "time_stepping.maximum_time_step": 10.0,  # years
    })

    bed = np.tile(bed_elevation_linear(grid.x)[None, :], (My, 1))
    if H_init is None:
        H0 = initial_profile(grid.x)
    else:
        H0 = np.where(np.abs(grid.x) < 700e3, H_init, 0.0)
    H0 = np.tile(H0[None, :], (My, 1))
    geometry = new_geometry(jnp.asarray(H0), jnp.asarray(bed),
                            ice_density=RHO_I, ocean_density=RHO_W)
    state = ModelState(geometry=geometry)

    def climate(geometry_, t):
        shp = geometry_.ice_thickness.shape
        dt_ = geometry_.ice_thickness.dtype
        return (jnp.full(shp, ACCUMULATION, dt_), jnp.full(shp, 253.15, dt_))

    # fixed calving front near the domain edge (PISM's MISMIP run scripts
    # use ``-calving ocean_kill``): without it the shelf eventually reaches
    # the boundary, piles up against the clamped-stencil wall and grounds
    from ..model.calving import CalvingModel
    config.update({"calving.methods": "thickness_calving,ocean_kill"})
    dx = 2 * Lx / (Mx - 1)
    kill = np.abs(np.tile(grid.x[None, :], (My, 1))) > Lx - 2.5 * dx
    calving = CalvingModel(grid=grid, config=config,
                           ocean_kill_mask=jnp.asarray(kill))

    return MISMIPSetup(grid=grid, config=config, state=state,
                       surface=FunctionSurface(climate), calving=calving)


def grounding_line_position(geometry, grid) -> float:
    """x of the last grounded cell along the centerline (x > 0 side)."""
    mask = np.asarray(geometry.cell_type)
    c = mask.shape[0] // 2
    x = np.asarray(grid.x)
    grounded = (mask[c] == 2) & (x >= 0)
    if not grounded.any():
        return 0.0
    return float(x[np.where(grounded)[0].max()])
