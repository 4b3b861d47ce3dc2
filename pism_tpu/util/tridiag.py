"""Batched tridiagonal (Thomas) solver.

The reference solves one small tridiagonal system per (i, j) column per step
inside a C++ loop (PISM ``src/util/ColumnSystem.cc``,
``TridiagonalSystem::solve``). On TPU the natural layout is the transpose:
one ``lax.scan`` over the z axis whose carry is a whole (My, Mx) plane, so
every scan step is an elementwise VPU op over all columns at once (the
"vmapped Thomas solve" of SURVEY.md §2.2). Unconditionally stable for the
diagonally-dominant systems produced by the energy/age columns.

System per column: a[k] x[k-1] + b[k] x[k] + c[k] x[k+1] = d[k], k = 0..n-1
(a[0] and c[n-1] ignored). Batch axes lead: coefficients are (..., n).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_batched(a, b, c, d):
    """Solve batched tridiagonal systems; all inputs (..., n), z-axis last.

    Returns x of shape (..., n). Forward sweep + back substitution as two
    ``lax.scan``s over the z axis with (...)-shaped carries.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    c = jnp.asarray(c)
    d = jnp.asarray(d)
    # enforce the ignored corners so callers need not zero them
    a = a.at[..., 0].set(0.0)
    c = c.at[..., -1].set(0.0)

    # move z to the front for scan: (n, ...)
    am = jnp.moveaxis(a, -1, 0)
    bm = jnp.moveaxis(b, -1, 0)
    cm = jnp.moveaxis(c, -1, 0)
    dm = jnp.moveaxis(d, -1, 0)

    def fwd(carry, inputs):
        cp_prev, dp_prev = carry
        ak, bk, ck, dk = inputs
        denom = bk - ak * cp_prev
        cp = ck / denom
        dp = (dk - ak * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros = jnp.zeros_like(bm[0])
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (zeros, zeros), (am, bm, cm, dm))

    def back(carry, inputs):
        x_next = carry
        cp, dp = inputs
        x = dp - cp * x_next
        return x, x

    _, xs = jax.lax.scan(back, zeros, (cps, dps), reverse=True)
    return jnp.moveaxis(xs, 0, -1)
