"""Every config-DB parameter must be LIVE (VERDICT r4 #2; reference: every
entry of src/pism_config.cdl is consumed somewhere). A parameter counts as
wired when

- its full name appears quoted in the package source (outside the DB), or
- it is consumed through a declared dynamic-access pattern (prefix
  concatenation / f-strings), with the pattern's proof fragment present in
  the source, or
- its doc string carries an explicit honesty marker: ``[unimplemented]``
  or ``[n/a ...]`` (surfaced by -list_params / docs/PARAMETERS.md).

This test is the mechanical gate that keeps the DB from accumulating
decorative entries again."""

import os

import pytest

from pism_tpu.config.parameters import PARAMETERS

pytestmark = pytest.mark.smoke

PKG = os.path.join(os.path.dirname(__file__), "..", "pism_tpu")


def _source_blob():
    parts = []
    for root, dirs, files in os.walk(PKG):
        if "__pycache__" in root:
            continue
        for f in files:
            if f.endswith((".py", ".cpp")) and f != "parameters.py":
                with open(os.path.join(root, f)) as fh:
                    parts.append(fh.read())
    return "\n".join(parts)


#: parameters consumed through computed names. Maps a proof fragment that
#: must appear in the source to the parameters it covers (name predicates).
DYNAMIC_ACCESS = {
    # rheology factory: f"stress_balance.{which}.flow_law" / Glen_exponent
    'f"stress_balance.{which}.': lambda n: n in (
        "stress_balance.blatter.flow_law",
        "stress_balance.blatter.Glen_exponent"),
    # Fausto air-temperature coefficients (SeariseGreenland)
    '"atmosphere.fausto_air_temp." + k': lambda n: n.startswith(
        "atmosphere.fausto_air_temp.") and n.rsplit(".", 1)[1] in (
        "c_ma", "c_mj", "d_ma", "d_mj", "gamma_ma", "gamma_mj",
        "kappa_ma", "kappa_mj"),
    # orographic LTOP prefix reads
    'p = "atmosphere.orographic_precipitation."': lambda n: n.startswith(
        "atmosphere.orographic_precipitation.") and n.rsplit(".", 1)[1] in (
        "wind_speed", "wind_direction", "conversion_time", "fallout_time",
        "water_vapor_scale_height", "moist_stability_frequency",
        "uplift_sensitivity", "background_precip_rate", "coriolis_latitude",
        "reference_density", "moist_adiabatic_lapse_rate", "lapse_rate",
        "scale_factor", "truncate", "grid_size_factor"),
    # Mohr-Coulomb prefix reads
    '"basal_yield_stress.mohr_coulomb.tillphi_opt." + k': lambda n:
        n.startswith("basal_yield_stress.mohr_coulomb.tillphi_opt.")
        and n.rsplit(".", 1)[1] in ("dphi_scale", "dphi_max", "phi_min",
                                    "phi_max", "dh_min"),
    '"basal_yield_stress.mohr_coulomb.topg_to_phi." + k': lambda n:
        n.startswith("basal_yield_stress.mohr_coulomb.topg_to_phi.")
        and n.rsplit(".", 1)[1] in ("phi_min", "phi_max", "topg_min",
                                    "topg_max"),
    # inverse regularization weights
    'f"inverse.design.{k}"': lambda n: n in (
        "inverse.design.cH1", "inverse.design.cL2", "inverse.design.cTV"),
    # scalar forcings derive "<x>.periodic" from "<x>.file"
    '+ ".periodic"': lambda n: n.endswith(".periodic")
        and n[:-len("periodic")] + "file" in PARAMETERS,
    # time-stack couplers: stack_period(config, "<prefix>") reads
    # "<prefix>.period" / "<prefix>.periodic"
    "def stack_period": lambda n: (
        n.endswith(".period") or n.endswith(".periodic")),
}


def test_every_parameter_is_live():
    blob = _source_blob()
    # the dynamic patterns must actually exist in the source: a deleted
    # consumer must not keep its parameters alive
    live_dynamic = []
    for fragment, pred in DYNAMIC_ACCESS.items():
        assert fragment in blob, f"dynamic pattern gone: {fragment!r}"
        live_dynamic.append(pred)
    # stack_period prefixes: the period/periodic param's prefix must itself
    # appear quoted (stack_period(config, "<prefix>", ...))
    def stack_prefix_used(n):
        stem = n.rsplit(".", 1)[0]
        return f'"{stem}"' in blob

    dead = []
    for name, (default, units, doc) in PARAMETERS.items():
        if doc.startswith("[unimplemented]") or doc.startswith("[n/a"):
            continue
        if f'"{name}"' in blob or f"'{name}'" in blob:
            continue
        matched = False
        for pred in live_dynamic:
            if pred(name):
                if name.endswith((".period", ".periodic")) \
                        and not (name[:-len("periodic")] + "file"
                                 in PARAMETERS and "+ \".periodic\"" in blob
                                 and name.endswith(".periodic")):
                    # stack family: require the quoted prefix
                    matched = stack_prefix_used(name)
                else:
                    matched = True
                break
        if not matched:
            dead.append(name)
    assert not dead, (
        f"{len(dead)} config parameters are neither consumed nor marked "
        f"[unimplemented]/[n/a]: {dead}")


def test_no_stale_markers():
    """A marked parameter must NOT also be consumed — a wired parameter
    keeping its [unimplemented] tag misleads -list_params."""
    blob = _source_blob()
    stale = [n for n, (d, u, doc) in PARAMETERS.items()
             if doc.startswith("[unimplemented]")
             and (f'"{n}"' in blob or f"'{n}'" in blob)]
    assert not stale, f"marked [unimplemented] but consumed: {stale}"
