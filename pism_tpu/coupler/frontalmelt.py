"""Frontal melt models.

Rebuild of PISM ``src/coupler/frontalmelt/`` (``Constant``, ``Given``,
``DischargeRouting``): supply a frontal (vertical calving-face) melt rate
[m/s] that the front-retreat machinery applies at marine ice fronts.
``DischargeRouting`` uses the Rignot/Xu et al. (2013) plume
parameterization fed by subglacial discharge from the routing hydrology.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

import jax.numpy as jnp

from ..util.units import SEC_PER_YEAR


class FrontalMeltModel:
    def __call__(self, geometry, t, state=None):
        raise NotImplementedError


@dataclass
class Constant(FrontalMeltModel):
    rate: float = 0.0   # m/s

    def __call__(self, geometry, t, state=None):
        H = geometry.ice_thickness
        return jnp.full(H.shape, self.rate, H.dtype)


@dataclass
class Given(FrontalMeltModel):
    rate_field: jnp.ndarray

    def __call__(self, geometry, t, state=None):
        return jnp.asarray(self.rate_field)


@dataclass
class DischargeRouting(FrontalMeltModel):
    """Rignot et al. (2016)/Xu et al. (2013) plume parameterization:
    melt = (A h q_sg^alpha + B) theta^beta, with q_sg the subglacial
    discharge per unit width [m/day], h the water depth [m], theta the
    thermal forcing [K]."""

    theta: jnp.ndarray           # thermal forcing field [K]
    A: float = 3e-4
    B: float = 0.15
    alpha: float = 0.39
    beta: float = 1.18

    def __call__(self, geometry, t, state=None):
        h = jnp.maximum(geometry.sea_level - geometry.bed_elevation, 0.0)
        if state is not None and state.hydro_Q is not None:
            # steady hydrology: per-unit-width discharge [m^2/s] spread over
            # the submerged face height -> water flux speed, per day
            q_sg = state.hydro_Q / jnp.maximum(h, 1.0) * 86400.0
        elif state is not None and state.hydro_W is not None:
            # crude discharge proxy: transportable water layer drained per day
            q_sg = state.hydro_W  # [m]
        else:
            q_sg = jnp.zeros_like(h)
        theta = jnp.asarray(self.theta)
        melt_m_per_day = (self.A * h * q_sg ** self.alpha + self.B) \
            * jnp.maximum(theta, 0.0) ** self.beta
        return melt_m_per_day / 86400.0


@dataclass
class DischargeGiven(FrontalMeltModel):
    """PISM ``-frontal_melt discharge_given``: the same Rignot/Xu plume
    parameterization as :class:`DischargeRouting`, but with the subglacial
    discharge prescribed as an input field instead of taken from the
    routing hydrology."""

    theta: jnp.ndarray           # thermal forcing field [K]
    discharge: jnp.ndarray       # subglacial discharge q_sg [m/day]
    A: float = 3e-4
    B: float = 0.15
    alpha: float = 0.39
    beta: float = 1.18

    def __call__(self, geometry, t, state=None):
        h = jnp.maximum(geometry.sea_level - geometry.bed_elevation, 0.0)
        q_sg = jnp.asarray(self.discharge, h.dtype)
        theta = jnp.asarray(self.theta, h.dtype)
        melt_m_per_day = (self.A * h * q_sg ** self.alpha + self.B) \
            * jnp.maximum(theta, 0.0) ** self.beta
        return melt_m_per_day / 86400.0


def _plume_constants(config):
    """Rignot/Xu plume constants from the config (reference
    ``frontal_melt.routing.*``, src/coupler/frontalmelt/DischargeRouting.cc)."""
    return dict(
        A=config.get_number("frontal_melt.routing.parameter_a"),
        B=config.get_number("frontal_melt.routing.parameter_b"),
        alpha=config.get_number("frontal_melt.routing.power_alpha"),
        beta=config.get_number("frontal_melt.routing.power_beta"))


def frontal_melt_from_config(config, grid=None, inputs=None):
    """Factory (PISM ``PCFactory`` seam). ``constant`` needs no inputs;
    ``given`` / ``routing`` / ``discharge_given`` read their fields from the
    ``inputs`` mapping (pre-built, e.g. by
    :func:`~pism_tpu.coupler.factory.inputs_from_files` with the
    ``frontal_melt.*.file`` parameters) — pass a prepared model object to
    ``IceModel(frontal_melt=...)`` to bypass the files."""
    name = config.get_string("frontal_melt.models")
    if not name or name == "none":
        return None
    if name == "constant":
        return Constant(rate=config.get_number(
            "frontal_melt.constant.melt_rate", "m s-1"))
    inputs = inputs or {}

    def need(key):
        if key not in inputs:
            raise ValueError(
                f"frontal_melt.models = {name!r} needs input field {key!r} "
                f"(set frontal_melt.{name}.file)")
        return inputs[key]

    if name == "given":
        return Given(rate_field=need("frontal_melt_rate"))
    if name == "routing":
        return DischargeRouting(theta=need("theta_ocean"),
                                **_plume_constants(config))
    if name == "discharge_given":
        return DischargeGiven(theta=need("theta_ocean"),
                              discharge=need("subglacial_discharge"),
                              **_plume_constants(config))
    raise ValueError(f"unknown frontal_melt model {name!r}")
