"""Calving, front retreat, and iceberg removal.

Rebuild of PISM ``src/frontretreat/`` (``calving::CalvingAtThickness``,
``EigenCalving``, ``vonMisesCalving``, ``HayhurstCalving``, ``FloatKill``,
``PrescribedRetreat``, ``FrontRetreat``) and ``IcebergRemover``
(``src/util/label_components.cc``). Calving laws compute either an
instantaneous mask change or a retreat rate; retreat rates (plus the
frontal-melt rate from ``coupler/frontalmelt.py``) are converted to
thickness loss in calving-front cells. Where the reference gathers the mask
to rank 0 to label connected components, icebergs are removed here by an
all-device flood fill: iterative mask dilation from grounded ice inside a
``lax.while_loop`` (SURVEY.md §2.5 "gather-to-one" -> label-propagation
fixed point).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from .. import state as S
from ..ops import stencils as st
from ..ops.stencils import Shifter
from ..util.units import SEC_PER_YEAR


def front_mask(icy, ice_free_ocean, sh: Shifter):
    """Cells at the calving front: icy with an ice-free-ocean neighbor."""
    nbr_ocean = (sh(ice_free_ocean, 0, 1) | sh(ice_free_ocean, 0, -1)
                 | sh(ice_free_ocean, 1, 0) | sh(ice_free_ocean, -1, 0))
    return icy & nbr_ocean


def remove_icebergs(geometry, sh: Shifter, max_iters: Optional[int] = None):
    """Drop floating cells not connected (4-neighborhood) to grounded ice.

    Required for SSA well-posedness (free-floating fragments have no
    constraint). Flood fill from grounded ice over the icy mask.
    """
    mask = geometry.cell_type
    icy = S.icy(mask)
    seed = S.grounded_ice(mask)
    if max_iters is None:
        max_iters = mask.shape[0] + mask.shape[1]

    def body(carry):
        reached, changed, it = carry
        grown = reached | (icy & (
            sh(reached, 0, 1) | sh(reached, 0, -1)
            | sh(reached, 1, 0) | sh(reached, -1, 0)))
        return grown, jnp.any(grown != reached), it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_iters)

    reached, _, _ = jax.lax.while_loop(
        cond, body, (seed, jnp.asarray(True), jnp.asarray(0)))
    berg = icy & ~reached
    H = jnp.where(berg, 0.0, geometry.ice_thickness)
    Href = jnp.where(berg, 0.0, geometry.ice_area_specific_volume)
    return geometry.replace(ice_thickness=H, ice_area_specific_volume=Href)


@dataclass
class PrescribedRetreat:
    """PISM ``-front_retreat prescribed`` (``frontretreat/PrescribedRetreat.cc``,
    the ISMIP6 ``retreat_file`` protocol): a time series of "ice extent
    fraction" masks in [0, 1]; thickness is scaled by the fraction, so
    fraction 0 removes the ice and fractions in (0, 1) thin front cells
    (sub-grid retreat). Slices are pre-loaded device arrays indexed by
    piecewise-constant time lookup (trace-safe, clamped at the ends)."""

    times: jnp.ndarray        # (Nt,) [s], sorted
    fraction: jnp.ndarray     # (Nt, My, Mx) in [0, 1]

    def __call__(self, H, t):
        times = jnp.asarray(self.times)
        k = jnp.clip(jnp.searchsorted(times, t, side="right") - 1,
                     0, times.shape[0] - 1)
        frac = jnp.clip(jnp.asarray(self.fraction, H.dtype)[k], 0.0, 1.0)
        return H * frac


@dataclass
class CalvingModel:
    """Composite calving component (PISM ``calving.methods`` comma list)."""

    grid: object
    config: object
    methods: tuple = ()
    prescribed_retreat: Optional[PrescribedRetreat] = None
    # "ocean_kill": calve all ice in these cells (PISM ``calving
    # ocean_kill`` with the kill mask from ``-ocean_kill_file``). If the
    # method is active and no mask is supplied, the driver derives it from
    # the initial ice-free-ocean cells (the file-default analog).
    ocean_kill_mask: Optional[jnp.ndarray] = None

    def __post_init__(self):
        cfg = self.config
        self.sh = Shifter(self.grid)
        if not self.methods:
            m = cfg.get_string("calving.methods")
            self.methods = tuple(s.strip() for s in m.split(",") if s.strip())
        self.H_threshold = cfg.get_number("calving.thickness_calving.threshold")
        self.eigen_K = cfg.get_number("calving.eigen_calving.K")
        self.vm_sigma_max = cfg.get_number("calving.vonmises_calving.sigma_max")
        self.n_glen = cfg.get_number("stress_balance.ssa.Glen_exponent")
        self.hh_B_tilde = cfg.get_number("calving.hayhurst_calving.B_tilde")
        self.hh_r = cfg.get_number("calving.hayhurst_calving.exponent_r")
        self.hh_sigma_th = cfg.get_number("calving.hayhurst_calving.sigma_threshold")
        self.rho_i = cfg.get_number("constants.ice.density")
        self.rho_w = cfg.get_number("constants.sea_water.density")
        self.g = cfg.get_number("constants.standard_gravity")
        self.fm_floating = cfg.get_flag("frontal_melt.include_floating_ice")
        self.remove_bergs = cfg.get_flag("geometry.remove_icebergs")
        self.float_kill = cfg.get_flag("calving.float_kill.enabled") or \
            "float_kill" in self.methods
        # option tails (reference src/frontretreat/calving/*.cc)
        self.fk_margin_only = cfg.get_flag("calving.float_kill.margin_only")
        self.fk_near_gl = cfg.get_flag(
            "calving.float_kill.calve_near_grounding_line")
        self.eigen_margin_floating = cfg.get_flag(
            "calving.eigen_calving.make_margin_floating")
        self.hh_modifier = cfg.get_number("calving.hayhurst_calving.modifier")
        self.rate_scaling = None
        _rs = cfg.get_string("calving.rate_scaling.file")
        if _rs:
            from ..util.forcing import ScalarForcing
            self.rate_scaling = ScalarForcing.from_file(
                _rs, "frac_calving_rate",
                calendar=cfg.get_string("time.calendar"),
                reference_date=cfg.get_string("time.reference_date"))
        # 2D threshold fields override the scalar thresholds where given
        self.H_threshold_field = self._read_2d(
            cfg.get_string("calving.thickness_calving.file"),
            ["calving_threshold", "thickness_calving_threshold"])
        self.vm_sigma_max_field = self._read_2d(
            cfg.get_string("calving.vonmises_calving.sigma_max_file"),
            ["vonmises_calving_threshold", "sigma_max"])
        # with part-grid active, rate-based retreat is applied linearly by
        # converting front cells into partially-filled (Href) cells, the
        # reference FrontRetreat::update_geometry scheme; without part-grid
        # the legacy thickness-scaling clip is used
        self.part_grid = cfg.get_flag("geometry.part_grid.enabled")
        if self.prescribed_retreat is None \
                and "prescribed_retreat" in self.methods:
            # reference -front_retreat_file (ISMIP6 retreat masks):
            # geometry.front_retreat.prescribed.file
            path = cfg.get_string("geometry.front_retreat.prescribed.file")
            if not path:
                raise ValueError(
                    "calving method 'prescribed_retreat' needs "
                    "geometry.front_retreat.prescribed.file")
            from ..io.bootstrap import read_forcing_fields
            import numpy as np
            fields, times = read_forcing_fields(
                path, self.grid, ["land_ice_area_fraction_retreat"],
                calendar=cfg.get_string("time.calendar"),
                reference_date=cfg.get_string("time.reference_date"))
            fr = fields.get("land_ice_area_fraction_retreat")
            if fr is None:
                raise ValueError(
                    f"{path!r} has no land_ice_area_fraction_retreat")
            fr = np.asarray(fr)
            if fr.ndim == 2:
                fr = fr[None]
                times = np.zeros(1)
            self.prescribed_retreat = PrescribedRetreat(
                times=jnp.asarray(np.asarray(times, float)),
                fraction=jnp.asarray(np.nan_to_num(fr, nan=1.0)))

    def _read_2d(self, path, names):
        if not path:
            return None
        from ..io.bootstrap import read_forcing_fields
        import numpy as np
        fields, _ = read_forcing_fields(path, self.grid, names)
        for n in names:
            if n in fields:
                a = np.asarray(fields[n])
                return jnp.asarray(a[-1] if a.ndim == 3 else a)
        raise ValueError(f"{path!r}: none of {names} found")

    # -- strain-rate eigenvalues from the SSA velocity ---------------------
    def _strain_eigenvalues(self, u, v):
        sh = self.sh
        dx, dy = self.grid.dx, self.grid.dy
        ux = (sh(u, 0, 1) - sh(u, 0, -1)) / (2 * dx)
        uy = (sh(u, 1, 0) - sh(u, -1, 0)) / (2 * dy)
        vx = (sh(v, 0, 1) - sh(v, 0, -1)) / (2 * dx)
        vy = (sh(v, 1, 0) - sh(v, -1, 0)) / (2 * dy)
        exy = 0.5 * (uy + vx)
        tr = 0.5 * (ux + vy)
        det = jnp.sqrt(jnp.maximum((0.5 * (ux - vy)) ** 2 + exy ** 2, 0.0))
        return tr + det, tr - det  # eigen1 >= eigen2

    def hayhurst_rate(self, geometry):
        """Hayhurst-stress calving rate (PISM ``HayhurstCalving.cc``;
        Mercenier et al. 2018): rate = B_tilde (1-w)^(-r) <sigma_0 -
        sigma_th>^r with w the water-depth-to-thickness ratio at the front
        and sigma_0 the maximum near-front tensile deviatoric stress from
        Mercenier's stress-field fit. B_tilde in [MPa^-r / year],
        sigma in MPa."""
        H = geometry.ice_thickness
        sl = geometry.sea_level
        b = geometry.bed_elevation
        Hsafe = jnp.maximum(H, 1.0)
        water_depth = jnp.clip(sl - b, 0.0, None)
        w = jnp.clip(water_depth / Hsafe, 0.0, self.rho_i / self.rho_w)
        sigma_0 = (0.4 - 0.45 * (w - 0.065) ** 2) * self.rho_i * self.g * H \
            * (1.0 - self.rho_w / self.rho_i * w ** 2)   # Pa
        sigma_0_mpa = jnp.maximum(sigma_0, 0.0) * 1e-6
        sigma_th_mpa = self.hh_sigma_th * 1e-6
        excess = jnp.maximum(sigma_0_mpa - sigma_th_mpa, 0.0)
        rate_per_year = self.hh_B_tilde * (1.0 - w) ** (-self.hh_r) \
            * excess ** self.hh_r
        # reference calving.hayhurst_calving.modifier: rate multiplier
        return self.hh_modifier * rate_per_year / SEC_PER_YEAR

    def retreat_rate(self, geometry, u_ssa, v_ssa, hardness_B=None):
        """Total horizontal retreat rate [m/s] from rate-based laws."""
        rate = jnp.zeros_like(geometry.ice_thickness)
        if "eigen_calving" in self.methods and self.eigen_K > 0:
            l1, l2 = self._strain_eigenvalues(u_ssa, v_ssa)
            rate = rate + self.eigen_K * jnp.maximum(l1, 0.0) * jnp.maximum(l2, 0.0)
        if "vonmises_calving" in self.methods and hardness_B is not None:
            # von Mises tensile stress (Morlighem et al. 2016)
            l1, l2 = self._strain_eigenvalues(u_ssa, v_ssa)
            e1, e2 = jnp.maximum(l1, 0.0), jnp.maximum(l2, 0.0)
            eff = jnp.sqrt(0.5 * (e1 ** 2 + e2 ** 2))
            sigma = jnp.sqrt(3.0) * hardness_B * eff ** (1.0 / self.n_glen)
            speed = jnp.sqrt(u_ssa ** 2 + v_ssa ** 2)
            sig_max = self.vm_sigma_max if self.vm_sigma_max_field is None \
                else jnp.asarray(self.vm_sigma_max_field, sigma.dtype)
            rate = rate + speed * sigma / sig_max
        if "hayhurst_calving" in self.methods:
            rate = rate + self.hayhurst_rate(geometry)
        return rate

    def applicable_rate(self, geometry, sb, hardness_B=None,
                        frontal_melt_rate=None):
        """Per-cell total horizontal retreat rate [m/s] that ``step`` would
        apply: calving-law rates on their front cells plus the frontal-melt
        rate on its front cells. Used by the dt CFL limit."""
        mask = geometry.cell_type
        icy = S.icy(mask)
        floating = S.floating_ice(mask)
        ifo = mask == S.MASK_ICE_FREE_OCEAN
        front = front_mask(icy, ifo, self.sh)
        marine = geometry.sea_level - geometry.bed_elevation > 0.0
        H = geometry.ice_thickness
        total = jnp.zeros_like(H)
        rate_methods = {"eigen_calving", "vonmises_calving",
                        "hayhurst_calving"} & set(self.methods)
        if rate_methods and (sb is not None
                             or rate_methods == {"hayhurst_calving"}):
            u = sb.u_ssa if sb is not None else jnp.zeros_like(H)
            v = sb.v_ssa if sb is not None else jnp.zeros_like(H)
            rate = self.retreat_rate(geometry, u, v, hardness_B=hardness_B)
            where = front & floating
            if "hayhurst_calving" in self.methods:
                where = front & (floating | marine)
            total = total + jnp.where(where, rate, 0.0)
        if frontal_melt_rate is not None:
            where = front & marine
            if not self.fm_floating:
                where = where & ~floating
            total = total + jnp.where(
                where, jnp.maximum(frontal_melt_rate, 0.0), 0.0)
        return total

    def max_timestep(self, geometry, sb, hardness_B=None,
                     frontal_melt_rate=None):
        """dt so that the fastest front cell retreats at most ~one grid cell
        per step (reference ``FrontRetreat::max_timestep``,
        src/frontretreat/FrontRetreat.cc, gated by
        ``geometry.front_retreat.use_cfl``). Without this limit the per-step
        clip in ``step`` silently drops retreat mass beyond one cell."""
        rate = self.applicable_rate(geometry, sb, hardness_B=hardness_B,
                                    frontal_melt_rate=frontal_melt_rate)
        r_max = jnp.max(rate)
        # ignore sub-1-m/year rates (the reference's threshold): they would
        # otherwise impose millennia-scale-irrelevant dt restrictions
        threshold = 1.0 / SEC_PER_YEAR
        return jnp.where(r_max > threshold,
                         jnp.asarray(self.grid.dx, jnp.float64) / r_max,
                         jnp.asarray(jnp.inf, jnp.float64))

    def _retreat_partgrid(self, H, Href, rate, dt, icy, ifo):
        """Linear, part-grid-aware application of a horizontal retreat rate
        (reference ``FrontRetreat::update_geometry``): partially-filled cells
        seaward of the ice absorb the retreat first (their Href shrinks at
        the icy-neighbor mean reference thickness), and full front cells
        whose ocean edge is exposed (an ice-free-ocean neighbor holding no
        Href buffer) convert into partial cells with
        ``Href = H (1 - rate dt / dx)``.  Linear in dt — halving dt and
        doubling the step count retreats the same distance, which is what
        makes the front-retreat dt CFL limit meaningful; the thickness-
        scaling fallback compounds multiplicatively and stalls under
        refinement.  No within-step cascade: the dt CFL bounds retreat to
        ~one cell per step.  Returns ``(H, Href, removed_content)``."""
        sh = self.sh
        dx = self.grid.dx

        def nb_sum(a):
            return sh(a, 0, 1) + sh(a, 0, -1) + sh(a, 1, 0) + sh(a, -1, 0)

        def nb_max(a):
            return jnp.maximum(jnp.maximum(sh(a, 0, 1), sh(a, 0, -1)),
                               jnp.maximum(sh(a, 1, 0), sh(a, -1, 0)))

        Href0 = Href
        icy_f = icy.astype(H.dtype)
        n_icy = nb_sum(icy_f)
        H_ref = nb_sum(jnp.where(icy, H, 0.0)) / jnp.maximum(n_icy, 1.0)
        # 1. partial cells seaward of the front retreat at their fastest icy
        # neighbor's rate
        partial = ifo & (Href0 > 0.0) & (n_icy > 0)
        rate_p = nb_max(jnp.where(icy, rate, 0.0))
        dfrac_p = jnp.clip(rate_p * dt / dx, 0.0, 1.0)
        dHref = jnp.where(partial, jnp.minimum(H_ref * dfrac_p, Href0), 0.0)
        Href = Href0 - dHref
        # 2. full front cells with an exposed ocean edge convert to partial
        exposed = nb_sum((ifo & (Href0 <= 0.0)).astype(H.dtype)) > 0
        dfrac = jnp.clip(rate * dt / dx, 0.0, 1.0)
        convert = icy & exposed & (dfrac > 0.0)
        removed_full = jnp.where(convert, H * dfrac, 0.0)
        Href = jnp.where(convert, Href + H - removed_full, Href)
        H = jnp.where(convert, 0.0, H)
        return H, Href, removed_full + dHref

    def step(self, geometry, sb, dt, t=0.0, hardness_B=None,
             frontal_melt_rate=None, with_parts=False):
        """Apply all active calving/front-retreat mechanisms to the geometry.

        ``hardness_B``: vertically averaged ice hardness for the von Mises
        law (supplied by the driver from the SSA flow law).
        ``frontal_melt_rate``: horizontal melt rate [m/s] from a frontal-melt
        coupler, applied at marine front faces like a calving retreat rate
        (PISM ``FrontalMelt`` + ``FrontRetreat``).

        With ``with_parts=True`` returns ``(geometry, parts)`` where
        ``parts`` is a dict of per-mechanism 2D thickness changes [m]
        (all <= 0): ``calving`` (calving laws incl. float_kill/ocean_kill/
        thickness threshold + iceberg removal), ``frontal_melt``
        (melt-driven horizontal retreat) and ``forced_retreat``
        (prescribed/ISMIP6 retreat) — the split behind the reference's
        ``tendency_of_ice_mass_due_to_{calving,frontal_melt,forced_retreat}``
        diagnostics (src/icemodel/diagnostics.cc).
        """
        sh = self.sh
        mask = geometry.cell_type
        icy = S.icy(mask)
        floating = S.floating_ice(mask)
        ifo = mask == S.MASK_ICE_FREE_OCEAN
        front = front_mask(icy, ifo, sh)
        marine = geometry.sea_level - geometry.bed_elevation > 0.0
        H = geometry.ice_thickness
        Href = geometry.ice_area_specific_volume
        H_in, Href_in = H, Href

        if self.float_kill:
            kill = floating
            if self.fk_margin_only:
                # reference float_kill.margin_only: only the marginal ring
                kill = kill & front
            if not self.fk_near_gl:
                # reference float_kill.calve_near_grounding_line = false:
                # keep floating cells attached to grounded ice
                grounded = S.grounded_ice(mask)
                near_gl = (sh(grounded, 0, 1) | sh(grounded, 0, -1)
                           | sh(grounded, 1, 0) | sh(grounded, -1, 0))
                kill = kill & ~near_gl
            H = jnp.where(kill, 0.0, H)

        if "ocean_kill" in self.methods and self.ocean_kill_mask is not None:
            H = jnp.where(jnp.asarray(self.ocean_kill_mask, bool), 0.0, H)

        if "thickness_calving" in self.methods and self.H_threshold > 0:
            # a 2D threshold field (calving.thickness_calving.file)
            # overrides the scalar threshold
            H_thr = self.H_threshold if self.H_threshold_field is None \
                else jnp.asarray(self.H_threshold_field, H.dtype)
            calve = front & floating & (H < H_thr)
            H = jnp.where(calve, 0.0, H)
        C_inst = H + Href   # ice content after the instantaneous laws

        # -- rate-based retreat: calving-law rates + frontal melt are summed
        # into ONE total horizontal retreat rate and applied together, as the
        # reference does (FrontRetreat::update_geometry consumes the sum of
        # the calving and frontal-melt rates); the per-mechanism bookkeeping
        # splits the removed mass by rate share.
        rate_c = jnp.zeros_like(H)
        rate_methods = {"eigen_calving", "vonmises_calving",
                        "hayhurst_calving"} & set(self.methods)
        have_law_rates = rate_methods and (
            sb is not None or rate_methods == {"hayhurst_calving"})
        if have_law_rates:
            u = sb.u_ssa if sb is not None else jnp.zeros_like(H)
            v = sb.v_ssa if sb is not None else jnp.zeros_like(H)
            r = self.retreat_rate(geometry, u, v, hardness_B=hardness_B)
            if self.rate_scaling is not None:
                # reference -calving_rate_scaling_file: a scalar series
                # multiplies every calving-law rate
                r = r * self.rate_scaling(t).astype(r.dtype)
            where = front & floating
            if "hayhurst_calving" in self.methods \
                    or self.eigen_margin_floating:
                # Hayhurst targets marine-terminating (incl. grounded)
                # fronts; eigen_calving.make_margin_floating treats grounded
                # marine margin cells as floating for the rate laws
                where = front & (floating | marine)
            rate_c = jnp.where(where, jnp.maximum(r, 0.0), 0.0)
        rate_f = jnp.zeros_like(H)
        if frontal_melt_rate is not None:
            # frontal melt retreats marine fronts; grounded termini always,
            # floating only if configured (PISM front_retreat + frontal_melt)
            where = front & marine
            if not self.fm_floating:
                where = where & ~floating
            rate_f = jnp.where(where, jnp.maximum(frontal_melt_rate, 0.0), 0.0)

        share_c = jnp.ones_like(H)
        if have_law_rates or frontal_melt_rate is not None:
            rate_t = rate_c + rate_f
            share_c = jnp.where(rate_t > 0.0,
                                rate_c / jnp.where(rate_t > 0.0, rate_t, 1.0),
                                1.0)
            if self.part_grid:
                H, Href, _removed = self._retreat_partgrid(
                    H, Href, rate_t, dt, icy, ifo)
            else:
                # legacy thickness-scaling fallback (no Href state to hold a
                # sub-grid front): the front face sweeps rate*dt into the
                # cell of size dx
                loss_frac = jnp.clip(rate_t * dt / self.grid.dx, 0.0, 1.0)
                H = H - H * loss_frac
        C_rate = H + Href

        if self.prescribed_retreat is not None:
            H = self.prescribed_retreat(H, t)
        C_forced = H + Href

        geometry = geometry.replace(ice_thickness=H,
                                    ice_area_specific_volume=Href)
        if "ocean_kill" in self.methods and self.ocean_kill_mask is not None:
            km = jnp.asarray(self.ocean_kill_mask, bool)
            geometry = geometry.replace(
                ice_area_specific_volume=jnp.where(
                    km, 0.0, geometry.ice_area_specific_volume))
        if self.remove_bergs:
            geometry = remove_icebergs(geometry, sh)
        if not with_parts:
            return geometry
        # per-mechanism ice-content deltas [m] (all <= 0; content = H + Href
        # so that full-to-partial cell conversions are not counted as mass
        # loss); iceberg removal is folded into the calving part (the bergs
        # exist because the calving laws disconnected them)
        C_out = geometry.ice_thickness + geometry.ice_area_specific_volume
        berg_d = C_out - C_forced
        rate_d = C_rate - C_inst            # removed by the combined rates
        parts = {
            "calving": (C_inst - (H_in + Href_in)) + rate_d * share_c + berg_d,
            "frontal_melt": rate_d * (1.0 - share_c),
            "forced_retreat": C_forced - C_rate,
        }
        return geometry, parts


def calving_from_config(grid, config):
    methods = config.get_string("calving.methods")
    fk = config.get_flag("calving.float_kill.enabled")
    rb = config.get_flag("geometry.remove_icebergs")
    if not methods and not fk and not rb:
        return None
    return CalvingModel(grid=grid, config=config)
