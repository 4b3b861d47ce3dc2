"""Fused Pallas stencils under spatial sharding.

The SURVEY §2.5 solver-comm target: "operator application = Pallas 5/9-point
stencil inside ``shard_map`` with halo ppermute". Each device runs the fused
kernel on its halo-padded local block; halos ride ICI via
``parallel.halo.halo_pad`` (ppermute strip exchange, edge-replicated ghosts
at physical boundaries — identical semantics to the single-device
``jnp.pad(mode="edge")`` the kernels assume). Reference role: the PETSc
DMDA ghost refresh inside every SSAFD MatMult / SIAFD stencil apply
(``src/stressbalance/ssa/SSAFD.cc``, ``sia/SIAFD.cc``; upstream paths —
the reference mount is empty, see SURVEY.md).

``shard_map`` needs global dims divisible by the mesh; grids here are
typically odd (Mx = 2L/dx + 1), so inputs are edge-padded up to the next
multiple on the high (north/east) ends and outputs cropped back. The
replicated pad rows reproduce the clamped-ghost boundary semantics exactly,
so results bit-match the unsharded kernel (asserted in
tests/test_sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from ..parallel import halo
from . import pallas_kernels as pk


def _mesh_yx(mesh):
    return mesh.shape["y"], mesh.shape["x"]


def _pad_amounts(shape, mesh):
    ny, nx = _mesh_yx(mesh)
    return (-shape[0]) % ny, (-shape[1]) % nx


# ---------------------------------------------------------------------------
# SIA diffusivity + flux
# ---------------------------------------------------------------------------

def sia_flux_thermo_sharded(H, s, E, mesh, *, grid, n, enhancement, rho, g,
                            dx, dy, EC, pb_law, interpret=None, d_cap=None):
    """Sharded fused thermomechanical SIA: per-shard Pallas kernel on
    ppermute-haloed local blocks. E: (My, Mx, Mz). Returns
    (De, Dn, qe, qn, max_D) like ``pk.sia_flux_thermo_pallas``."""
    My, Mx = H.shape
    py, px = _pad_amounts(H.shape, mesh)
    if py or px:
        H = jnp.pad(H, ((0, py), (0, px)), mode="edge")
        s = jnp.pad(s, ((0, py), (0, px)), mode="edge")
        E = jnp.pad(E, ((0, py), (0, px), (0, 0)), mode="edge")

    def local(Hl, sl, El):
        Hp = halo.halo_pad(Hl, 1)
        sp = halo.halo_pad(sl, 1)
        Ep = jnp.moveaxis(halo.halo_pad(El, 1), -1, 0)  # (Mz, my+2, mx+2)
        return pk.sia_flux_thermo_pallas_padded(
            Hp, sp, Ep, grid=grid, n=n, enhancement=enhancement, rho=rho,
            g=g, dx=dx, dy=dy, EC=EC, pb_law=pb_law, interpret=interpret,
            d_cap=d_cap)

    qe, qn, De, Dn = jax.shard_map(
        local, mesh=mesh, in_specs=(P("y", "x"), P("y", "x"),
                                    P("y", "x", None)),
        out_specs=(P("y", "x"),) * 4, check_vma=False)(H, s, E)
    qe, qn, De, Dn = (a[:My, :Mx] for a in (qe, qn, De, Dn))
    max_D = jnp.maximum(jnp.max(De), jnp.max(Dn))
    return De, Dn, qe, qn, max_D


def sia_flux_sharded(H, s, mesh, *, A, n, enhancement, rho, g, dx, dy,
                     interpret=None, d_cap=None):
    """Sharded fused isothermal SIA kernel."""
    My, Mx = H.shape
    py, px = _pad_amounts(H.shape, mesh)
    if py or px:
        H = jnp.pad(H, ((0, py), (0, px)), mode="edge")
        s = jnp.pad(s, ((0, py), (0, px)), mode="edge")
    gamma = 2.0 * enhancement * A * (rho * g) ** n / (n + 2.0)

    def local(Hl, sl):
        return pk.sia_flux_pallas_padded(
            halo.halo_pad(Hl, 1), halo.halo_pad(sl, 1),
            gamma=gamma, n=n, dx=dx, dy=dy, interpret=interpret,
            d_cap=d_cap)

    qe, qn, De, Dn = jax.shard_map(
        local, mesh=mesh, in_specs=(P("y", "x"),) * 2,
        out_specs=(P("y", "x"),) * 4, check_vma=False)(H, s)
    qe, qn, De, Dn = (a[:My, :Mx] for a in (qe, qn, De, Dn))
    max_D = jnp.maximum(jnp.max(De), jnp.max(Dn))
    return De, Dn, qe, qn, max_D


# ---------------------------------------------------------------------------
# SSA membrane-operator matvec
# ---------------------------------------------------------------------------

def _ssa_matvec_sharded_kernel(dx: float, dy: float,
                               flags_ref, up_ref, vp_ref, nuHe_ref, nuHn_ref,
                               beta_ref, Au_ref, Av_ref):
    """Per-shard fused A(u,v) with a one-face overlap ring.

    up, vp: (my+4, mx+4) two-ghost velocities; nuHe, nuHn: (my+2, mx+2)
    one-ghost staggered viscosities; beta: (my, mx); flags: (1, 2) int32 in
    SMEM = [owns global west edge, owns global south edge].

    Face stresses are computed on the extended cell range (-1..my-1,
    -1..mx-1) so the divergence's west/south neighbors are real neighbor
    faces at shard boundaries; at the *physical* west/south edges the
    clamp-shift semantics of the unsharded kernel (T_w := T_e) are restored
    by masking on the global-edge flags."""
    up = up_ref[:]
    vp = vp_ref[:]
    my, mx = Au_ref.shape

    # extended region: cell (i, j), i = -1..my-1 <-> padded row i+2
    c = (slice(1, my + 2), slice(1, mx + 2))
    e = (slice(1, my + 2), slice(2, mx + 3))
    nn = (slice(2, my + 3), slice(1, mx + 2))
    ne = (slice(2, my + 3), slice(2, mx + 3))
    s_ = (slice(0, my + 1), slice(1, mx + 2))
    se = (slice(0, my + 1), slice(2, mx + 3))
    w = (slice(1, my + 2), slice(0, mx + 1))
    nw = (slice(2, my + 3), slice(0, mx + 1))

    ux_e = (up[e] - up[c]) / dx
    vx_e = (vp[e] - vp[c]) / dx
    uy_e = (up[nn] + up[ne] - up[s_] - up[se]) / (4.0 * dy)
    vy_e = (vp[nn] + vp[ne] - vp[s_] - vp[se]) / (4.0 * dy)
    uy_n = (up[nn] - up[c]) / dy
    vy_n = (vp[nn] - vp[c]) / dy
    ux_n = (up[e] + up[ne] - up[w] - up[nw]) / (4.0 * dx)
    vx_n = (vp[e] + vp[ne] - vp[w] - vp[nw]) / (4.0 * dx)

    nuHe = nuHe_ref[:][0:my + 1, 0:mx + 1]
    nuHn = nuHn_ref[:][0:my + 1, 0:mx + 1]

    Txx_e = 2.0 * nuHe * (2.0 * ux_e + vy_e)
    Txy_e = nuHe * (uy_e + vx_e)
    Txy_n = nuHn * (uy_n + vx_n)
    Tyy_n = 2.0 * nuHn * (2.0 * vy_n + ux_n)

    cTxx, wTxx = Txx_e[1:, 1:], Txx_e[1:, :-1]
    cTxy_e, wTxy_e = Txy_e[1:, 1:], Txy_e[1:, :-1]
    cTxy_n, sTxy_n = Txy_n[1:, 1:], Txy_n[:-1, 1:]
    cTyy, sTyy = Tyy_n[1:, 1:], Tyy_n[:-1, 1:]

    col = lax.broadcasted_iota(jnp.int32, (my, mx), 1)
    row = lax.broadcasted_iota(jnp.int32, (my, mx), 0)
    wclamp = (flags_ref[0, 0] != 0) & (col == 0)
    sclamp = (flags_ref[0, 1] != 0) & (row == 0)
    wTxx = jnp.where(wclamp, cTxx, wTxx)
    wTxy_e = jnp.where(wclamp, cTxy_e, wTxy_e)
    sTxy_n = jnp.where(sclamp, cTxy_n, sTxy_n)
    sTyy = jnp.where(sclamp, cTyy, sTyy)

    div_x = (cTxx - wTxx) / dx + (cTxy_n - sTxy_n) / dy
    div_y = (cTxy_e - wTxy_e) / dx + (cTyy - sTyy) / dy

    beta = beta_ref[:]
    Au_ref[:] = -div_x + beta * up[2:my + 2, 2:mx + 2]
    Av_ref[:] = -div_y + beta * vp[2:my + 2, 2:mx + 2]


def _ssa_matvec_sharded_raw(u, v, nuH_e, nuH_n, beta, mesh, dx, dy,
                            interpret):
    My, Mx = u.shape
    py, px = _pad_amounts(u.shape, mesh)
    if py or px:
        pad = lambda a: jnp.pad(a, ((0, py), (0, px)), mode="edge")
        u, v, nuH_e, nuH_n, beta = map(pad, (u, v, nuH_e, nuH_n, beta))

    kernel = functools.partial(_ssa_matvec_sharded_kernel, float(dx),
                               float(dy))
    ms = pl.ANY if interpret else pltpu.VMEM
    sms = pltpu.SMEM if not interpret else pl.ANY

    def local(ul, vl, nel, nnl, bl):
        uh = halo.halo_pad(ul, 2)
        vh = halo.halo_pad(vl, 2)
        neh = halo.halo_pad(nel, 1)
        nnh = halo.halo_pad(nnl, 1)
        flags = jnp.concatenate([
            (lax.axis_index("x") == 0).astype(jnp.int32).reshape(1, 1),
            (lax.axis_index("y") == 0).astype(jnp.int32).reshape(1, 1),
        ], axis=1)
        shape = jax.ShapeDtypeStruct(bl.shape, bl.dtype)
        return pl.pallas_call(
            kernel,
            out_shape=(shape, shape),
            in_specs=[pl.BlockSpec(memory_space=sms)]
            + [pl.BlockSpec(memory_space=ms)] * 5,
            out_specs=(pl.BlockSpec(memory_space=ms),) * 2,
            interpret=interpret,
        )(flags, uh, vh, neh, nnh, bl)

    Au, Av = jax.shard_map(
        local, mesh=mesh, in_specs=(P("y", "x"),) * 5,
        out_specs=(P("y", "x"),) * 2,
        check_vma=False)(u, v, nuH_e, nuH_n, beta)
    return Au[:My, :Mx], Av[:My, :Mx]


@functools.partial(jax.custom_jvp, nondiff_argnums=(5, 6, 7, 8))
def ssa_matvec_sharded(u, v, nuH_e, nuH_n, beta, mesh, dx, dy,
                       interpret=False):
    """Sharded fused SSA operator application (non-periodic grids).

    Same operator as ``pk.ssa_matvec_pallas``; bilinear in
    ((u, v), (nuH, beta)), so the JVP is two fused applications."""
    return _ssa_matvec_sharded_raw(u, v, nuH_e, nuH_n, beta, mesh, dx, dy,
                                   interpret)


@ssa_matvec_sharded.defjvp
def _ssa_matvec_sharded_jvp(mesh, dx, dy, interpret, primals, tangents):
    u, v, nuH_e, nuH_n, beta = primals
    du, dv, dnuH_e, dnuH_n, dbeta = tangents
    out = _ssa_matvec_sharded_raw(u, v, nuH_e, nuH_n, beta, mesh, dx, dy,
                                  interpret)
    zeros = jnp.zeros_like(u)
    du_ = du if not pk._is_zero(du) else zeros
    dv_ = dv if not pk._is_zero(dv) else zeros
    t1 = _ssa_matvec_sharded_raw(du_, dv_, nuH_e, nuH_n, beta, mesh, dx, dy,
                                 interpret)
    if not (pk._is_zero(dnuH_e) and pk._is_zero(dnuH_n)
            and pk._is_zero(dbeta)):
        de = dnuH_e if not pk._is_zero(dnuH_e) else jnp.zeros_like(nuH_e)
        dn = dnuH_n if not pk._is_zero(dnuH_n) else jnp.zeros_like(nuH_n)
        db = dbeta if not pk._is_zero(dbeta) else jnp.zeros_like(beta)
        t2 = _ssa_matvec_sharded_raw(u, v, de, dn, db, mesh, dx, dy,
                                     interpret)
        tang = (t1[0] + t2[0], t1[1] + t2[1])
    else:
        tang = t1
    return out, tang
