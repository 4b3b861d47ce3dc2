"""EISMINT II simplified-geometry experiments.

Rebuild of PISM's EISMINT II mode (``src/icemodel/`` + the historical
``pisms`` executable; experiment definitions from Payne et al. 2000,
J. Glaciol. 46(153)): radially symmetric SMB and surface temperature on a
1500x1500 km flat-bed domain, thermomechanically coupled SIA, runs to steady
state over ~200 kyr.

Experiment parameters (Payne et al. 2000, Table 2):
  A: M_max=0.5 m/a, R_el=450 km, T_min=238.15 K  (from zero ice)
  B: as A but T_min=243.15 K                      (restart from A)
  C: as A but M_max=0.25 m/a, R_el=425 km         (restart from A)
  D: as A but R_el=425 km                         (restart from A)
  F: as A but T_min=223.15 K                      (from zero ice)
  G: as A with basal sliding                       (from zero ice)
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..config.config import Config
from ..coupler.surface import FunctionSurface
from ..grid import Grid
from ..model.energy import bootstrap_enthalpy
from ..physics.enthalpy_converter import EnthalpyConverter
from ..state import ModelState, new_geometry

SEC_PER_YEAR = 3.15569259747e7

#: shared constants (Payne et al. 2000 Table 1)
T_MIN_DEFAULT = 238.15      # K
S_T = 1.67e-2 / 1e3         # K/m
M_MAX_DEFAULT = 0.5 / SEC_PER_YEAR   # m/s
S_B = 1.0e-2 / 1e3 / SEC_PER_YEAR    # 1/s  (m/a per km -> 1/s)
R_EL_DEFAULT = 450.0e3      # m
GEOTHERMAL = 0.042          # W/m^2

EXPERIMENTS = {
    "A": dict(),
    "B": dict(T_min=243.15),
    "C": dict(M_max=0.25 / SEC_PER_YEAR, R_el=425.0e3),
    "D": dict(R_el=425.0e3),
    # E: experiment A plus a localized sliding patch ("ice stream"): a
    # linear sliding law u_b = -mu tau_d with a spatially varying
    # coefficient confined to an annular sector about the summit
    # (200 km < r < 700 km, azimuth 10-40 deg from the +x axis), mu
    # rising as a quadratic bump in both r and theta to MU_MAX at the
    # sector center (reference IceEISModel sliding map for -eisII E;
    # constants re-derived from the published EISMINT II description —
    # the reference mount was empty at survey time). Restart from A's
    # steady state like B/C/D.
    "E": dict(sliding_sector=True),
    "F": dict(T_min=223.15),
    "G": dict(sliding=True),
    "H": dict(sliding=True, melt_only=True),
    # I-L: non-flat bed topography experiments; I/J = "trough",
    # K/L = "mound" beds from Tony Payne's original EISMINT II code as
    # carried in the reference's IceEISModel; J/L add the experiment-G
    # sliding law. [topography formulas re-derived from the published
    # description; the reference mount was empty at survey time]
    "I": dict(bed="trough"),
    "J": dict(bed="trough", sliding=True),
    "K": dict(bed="mound"),
    "L": dict(bed="mound", sliding=True),
}


def trough_topography(grid):
    """EISMINT II "trough" bed: a 1000 m plateau with a channel (width
    w = 200 km, centered on y = 0) descending linearly eastward from the
    domain center to sea level at the east edge."""
    import numpy as np
    X, Y = np.meshgrid(grid.x, grid.y)
    b0, w = 1000.0, 200.0e3
    slope = b0 / grid.Lx
    in_channel = (X >= 0.0) & (np.abs(Y) <= w / 2.0)
    depression = slope * X * np.cos(np.pi * Y / w)
    return np.where(in_channel, b0 - np.maximum(depression, 0.0), b0)


def mound_topography(grid):
    """EISMINT II "mound" bed: |a sin(pi x / w) + a cos(pi y / w)|,
    a = 250 m, w = 150 km."""
    import numpy as np
    X, Y = np.meshgrid(grid.x, grid.y)
    a, w = 250.0, 150.0e3
    # shift to corner-based coordinates (Payne's code measures from the
    # domain corner; with w = 150 km the pattern phase matters)
    ewd, nsd = X + grid.Lx, Y + grid.Ly
    return np.abs(a * np.sin(np.pi * ewd / w) + a * np.cos(np.pi * nsd / w))

#: EISMINT II linear sliding coefficient (Payne et al. 2000 eq. 4):
#: u_b = -B tau_b with B = 1e-3 m a^-1 Pa^-1.
SLIDING_B = 1.0e-3 / SEC_PER_YEAR  # m s^-1 Pa^-1

#: experiment E sliding-patch peak coefficient [m s^-1 Pa^-1]
MU_MAX_E = 2.5e-11


def sliding_mu_map_E(grid):
    """Experiment E spatially-varying sliding coefficient: an annular
    sector about the summit, 200 km < r < 700 km and 10 deg < theta <
    40 deg (theta from the +x axis), with mu = MU_MAX_E times quadratic
    bumps in r and theta (zero on the sector edges, peak at its center)."""
    X, Y = np.meshgrid(grid.x, grid.y)
    r = np.sqrt(X ** 2 + Y ** 2)
    theta = np.arctan2(Y, X)
    r1, r2 = 200.0e3, 700.0e3
    t1, t2 = np.deg2rad(10.0), np.deg2rad(40.0)
    inside = (r > r1) & (r < r2) & (theta > t1) & (theta < t2)
    mu = MU_MAX_E * (4.0 * (r - r1) * (r2 - r) / (r2 - r1) ** 2) \
                  * (4.0 * (theta - t1) * (t2 - theta) / (t2 - t1) ** 2)
    return np.where(inside, mu, 0.0)


@dataclass
class EISMINT2Setup:
    grid: Grid
    config: Config
    state: ModelState
    surface: FunctionSurface
    geothermal: float = GEOTHERMAL
    sliding_mu: object = None    # experiment E per-cell sliding coefficient


def setup(experiment: str = "A", Mx: int = 61, Mz: int = 61,
          Lz: float = 5000.0, dtype=None) -> EISMINT2Setup:
    params = EXPERIMENTS[experiment.upper()]
    T_min = params.get("T_min", T_MIN_DEFAULT)
    M_max = params.get("M_max", M_MAX_DEFAULT)
    R_el = params.get("R_el", R_EL_DEFAULT)

    grid = Grid(Mx=Mx, My=Mx, Lx=750.0e3, Ly=750.0e3, Mz=Mz, Lz=Lz,
                vertical_spacing="quadratic", lam=4.0)
    config = Config({
        "stress_balance.model": "sia",
        "stress_balance.sia.flow_law": "pb",   # EISMINT II two-branch Arrhenius
        "stress_balance.sia.surface_gradient_method": "mahaffy",
        "energy.model": "enthalpy",
        "grid.Mx": Mx, "grid.My": Mx, "grid.Mz": Mz,
        "grid.Lx": 750.0e3, "grid.Ly": 750.0e3, "grid.Lz": Lz,
        "bootstrapping.defaults.geothermal_flux": GEOTHERMAL,
    })
    if params.get("sliding"):
        # experiments G/H: linear hard-bed sliding u_b = -B tau_b
        config.update({
            "stress_balance.model": "weertman_sliding+sia",
            "stress_balance.weertman_sliding.k": SLIDING_B,
            "stress_balance.weertman_sliding.exponent": 1.0,
            "stress_balance.weertman_sliding.melt_only":
                bool(params.get("melt_only", False)),
        })
    sliding_mu = None
    if params.get("sliding_sector"):
        # experiment E: sliding confined to the sector patch
        config.update({
            "stress_balance.model": "weertman_sliding+sia",
            "stress_balance.weertman_sliding.exponent": 1.0,
        })
        sliding_mu = jnp.asarray(sliding_mu_map_E(grid))

    d = jnp.asarray(grid.radius)  # distance from the center

    def climate(geometry, t):
        shp = geometry.ice_thickness.shape
        dt_ = geometry.ice_thickness.dtype
        dd = d.astype(dt_)
        smb = jnp.minimum(jnp.asarray(M_max, dt_), (S_B * (R_el - dd)).astype(dt_))
        T = (T_min + S_T * dd).astype(dt_)
        return jnp.broadcast_to(smb, shp), jnp.broadcast_to(T, shp)

    surface = FunctionSurface(climate)

    H0 = jnp.zeros(grid.shape2)
    bed_kind = params.get("bed")
    if bed_kind == "trough":
        bed = jnp.asarray(trough_topography(grid))
    elif bed_kind == "mound":
        bed = jnp.asarray(mound_topography(grid))
    else:
        bed = jnp.zeros(grid.shape2)
    geometry = new_geometry(H0, bed)
    EC = EnthalpyConverter.from_config(config)
    T_sfc0 = T_min + S_T * d
    E0 = bootstrap_enthalpy(grid, EC, H0, T_sfc0, geothermal=GEOTHERMAL)
    state = ModelState(geometry=geometry, enthalpy=E0,
                       basal_melt_rate=jnp.zeros(grid.shape2))
    return EISMINT2Setup(grid=grid, config=config, state=state,
                         surface=surface, sliding_mu=sliding_mu)


#: Published steady-state benchmarks for experiment A (Payne et al. 2000,
#: mean of participating models) used as sanity targets, not exact parity:
EXPECTED_A = {
    "volume_km3": 2.128e6,
    "area_km2": 1.034e6,
    "divide_thickness_m": 3688.3,
    "divide_basal_temp_K": 255.605,
}
