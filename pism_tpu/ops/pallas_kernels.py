"""Pallas TPU kernels for the hot stencils.

The SIA staggered diffusivity + flux (SURVEY.md: "the hot stencil -> target
fused Pallas kernel") as a single fused VMEM-resident kernel: surface
gradients on both face sets, D = Gamma H^(n+2) |grad s|^(n-1), q = -D grad s
— one pass, no HBM round-trips between the ~10 intermediate fields XLA
would otherwise materialize at larger grid sizes.

The kernel consumes ghost-padded inputs (one clamped ghost ring, prepared by
the caller) and writes the four face fields. Grids up to ~700x700 (f32) fit
a single VMEM block; larger grids fall back to the XLA path (tiling with
halo-overlapping BlockSpecs is a later optimization). On non-TPU backends
the kernel runs in interpreter mode (used by the CPU equivalence tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sia_kernel(n: float, gamma: float, dx: float, dy: float,
                Hp_ref, sp_ref, qe_ref, qn_ref, De_ref, Dn_ref):
    """Fused isothermal SIA diffusivity + flux.

    Hp, sp: (My+2, Mx+2) ghost-padded thickness and surface.
    Outputs: (My, Mx) east/north face diffusivities and fluxes.
    """
    Hp = Hp_ref[:]
    sp = sp_ref[:]
    c = (slice(1, -1), slice(1, -1))          # center
    e = (slice(1, -1), slice(2, None))        # east neighbor
    nn = (slice(2, None), slice(1, -1))       # north neighbor
    ne = (slice(2, None), slice(2, None))
    s_ = (slice(0, -2), slice(1, -1))         # south
    se = (slice(0, -2), slice(2, None))
    w = (slice(1, -1), slice(0, -2))
    nw = (slice(2, None), slice(0, -2))

    H_e = 0.5 * (Hp[c] + Hp[e])
    H_n = 0.5 * (Hp[c] + Hp[nn])

    # east-face gradient (Mahaffy)
    sx_e = (sp[e] - sp[c]) / dx
    sy_e = (sp[nn] + sp[ne] - sp[s_] - sp[se]) / (4.0 * dy)
    # north-face gradient
    sy_n = (sp[nn] - sp[c]) / dy
    sx_n = (sp[e] + sp[ne] - sp[w] - sp[nw]) / (4.0 * dx)

    slope2_e = sx_e * sx_e + sy_e * sy_e
    slope2_n = sx_n * sx_n + sy_n * sy_n

    De = gamma * H_e ** (n + 2.0) * slope2_e ** ((n - 1.0) / 2.0)
    Dn = gamma * H_n ** (n + 2.0) * slope2_n ** ((n - 1.0) / 2.0)

    De_ref[:] = De
    Dn_ref[:] = Dn
    qe_ref[:] = -De * sx_e
    qn_ref[:] = -Dn * sy_n


def sia_flux_pallas(H, s, *, A: float, n: float = 3.0, enhancement: float = 1.0,
                    rho: float = 910.0, g: float = 9.81,
                    dx: float, dy: float, interpret: bool = None):
    """Fused isothermal SIA (De, Dn, qe, qn) via Pallas.

    Equivalent to ``ops.sia.diffusivity`` with ``enthalpy=None`` and the
    Mahaffy gradient on a non-periodic grid (clamped ghosts).
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    gamma = 2.0 * enhancement * A * (rho * g) ** n / (n + 2.0)

    Hp = jnp.pad(H, 1, mode="edge")
    sp = jnp.pad(s, 1, mode="edge")
    shape = jax.ShapeDtypeStruct(H.shape, H.dtype)

    kernel = functools.partial(_sia_kernel, float(n), float(gamma),
                               float(dx), float(dy))
    qe, qn, De, Dn = pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM)] * 2,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.ANY if interpret else pltpu.VMEM)] * 4),
        interpret=interpret,
    )(Hp, sp)
    max_D = jnp.maximum(jnp.max(De), jnp.max(Dn))
    return De, Dn, qe, qn, max_D
