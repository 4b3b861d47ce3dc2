"""Design-variable parameterizations.

Rebuild of the reference's ``IPDesignVariableParameterization`` family
(``src/inverse/IPDesignVariableParameterization.cc``): the optimizer works
on a dimensionless design variable ``zeta`` and the physical variable
(tau_c or hardness B) is ``value = F(zeta)``; the parameterization choice
(config ``inverse.design.param``) trades positivity enforcement against
conditioning:

- ``ident``:  value = scale * zeta                      (unconstrained)
- ``square``: value = scale * zeta^2                    (nonnegative)
- ``exp``:    value = scale * exp(zeta)                 (positive,
  log-preconditioned — equalizes relative steps across magnitudes)
- ``trunc``:  value = scale * (zeta + sqrt(zeta^2 + 4 eps^2)) / 2
  (smooth positive truncation of ident: linear for zeta >> eps,
  -> scale * eps^2 / |zeta| for zeta << -eps)

All maps are JAX-differentiable, so the derivative bookkeeping the
reference carries by hand (``toDesignVariable``/``derivative``) collapses
into autodiff through :func:`Parameterization.value`.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class Parameterization:
    kind: str = "exp"       # ident | square | exp | trunc
    scale: float = 1.0      # typical magnitude of the physical variable
    eps: float = 1.0e-2     # trunc smoothing width (dimensionless)

    def value(self, zeta):
        """Physical variable from the design variable (F)."""
        if self.kind == "ident":
            return self.scale * zeta
        if self.kind == "square":
            return self.scale * zeta ** 2
        if self.kind == "exp":
            return self.scale * jnp.exp(zeta)
        if self.kind == "trunc":
            return self.scale * 0.5 * (zeta +
                                       jnp.sqrt(zeta ** 2 + 4 * self.eps ** 2))
        raise ValueError(f"unknown parameterization {self.kind!r} "
                         "(ident | square | exp | trunc)")

    def design(self, value):
        """Design variable from the physical variable (F^-1); used to seed
        the optimization from an initial tau_c/B guess."""
        v = jnp.asarray(value) / self.scale
        if self.kind == "ident":
            return v
        if self.kind == "square":
            return jnp.sqrt(jnp.maximum(v, 0.0))
        if self.kind == "exp":
            return jnp.log(jnp.maximum(v, 1e-30))
        if self.kind == "trunc":
            # invert v = (z + sqrt(z^2 + 4 eps^2))/2  =>  z = v - eps^2 / v
            v = jnp.maximum(v, 1e-12)
            return v - self.eps ** 2 / v
        raise ValueError(f"unknown parameterization {self.kind!r}")


def from_config(config, design_variable: str = "tauc") -> Parameterization:
    """Build from the reference's config names: ``inverse.design.param``
    and the tauc/hardav scales (``inverse.ssa.tauc_min/max`` midpoint
    sets the scale, matching the reference's use of a typical value)."""
    kind = config.get_string("inverse.design.param")
    if design_variable == "tauc":
        scale = jnp.sqrt(config.get_number("inverse.ssa.tauc_min") *
                         config.get_number("inverse.ssa.tauc_max"))
    else:
        scale = jnp.sqrt(config.get_number("inverse.ssa.hardav_min") *
                         config.get_number("inverse.ssa.hardav_max"))
    return Parameterization(kind=kind, scale=float(scale))
