"""Pallas TPU kernels for the hot stencils.

The SIA staggered diffusivity + flux (SURVEY.md: "the hot stencil -> target
fused Pallas kernel") as a single fused VMEM-resident kernel: surface
gradients on both face sets, D = Gamma H^(n+2) |grad s|^(n-1), q = -D grad s
— one pass, no HBM round-trips between the ~10 intermediate fields XLA
would otherwise materialize at larger grid sizes.

Kernels consume ghost-padded inputs (one clamped ghost ring, prepared by the
caller) and write the four face fields. The isothermal kernel is a single
VMEM block (grids to ~700x700 f32); the thermomechanical kernel is tiled
over y-blocks with one-row halo overlap (pre-materialized windows, adaptive
block height to fit VMEM) and is auto-routed from ``ops.sia.diffusivity``
on TPU. On non-TPU backends kernels run in interpreter mode (used by the
CPU equivalence tests).

Gotcha (axon/Mosaic): under ``jax_enable_x64`` any python-int literal in a
BlockSpec ``index_map`` traces as int64 and Mosaic fails to legalize the
index-map's ``func.return`` ("failed to legalize operation 'func.return'");
index maps must return np.int32 values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# runtime.pallas.interpret: force interpreter mode for every kernel
# (debugging knob; set from the config by IceModel)
FORCE_INTERPRET = False
from jax.experimental.pallas import tpu as pltpu


def _sia_kernel(n: float, gamma: float, dx: float, dy: float, d_cap: float,
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
    De = jnp.minimum(De, jnp.asarray(d_cap, De.dtype))
    Dn = jnp.minimum(Dn, jnp.asarray(d_cap, Dn.dtype))

    De_ref[:] = De
    Dn_ref[:] = Dn
    qe_ref[:] = -De * sx_e
    qn_ref[:] = -Dn * sy_n


def _sia_thermo_body(n: float, C: float, dx: float, dy: float, ty: int,
                     zspec: tuple, EC_consts: tuple, pb_consts: tuple,
                     d_cap: float,
                     Hp, sp, Ep, qe_ref, qn_ref, De_ref, Dn_ref):
    """Fused thermomechanical SIA: Mahaffy gradients + GPBLD softness
    z-integral + diffusivity + flux, one VMEM pass per y-block.

    Hp, sp: (TY+2, Mx+2) ghost-padded values; Ep: (Mz, TY+2, Mx+2)
    enthalpy (z leading so the reduction runs over the leading axis).
    """
    T_melting, T_ref, c_i, L0, beta_cc, rho_i, g = EC_consts
    A_cold, A_warm, Q_cold, Q_warm, T_crit, R, wfc, wfl = pb_consts
    # closed-form vertical levels, as python floats unrolled per level
    # (pallas kernels cannot capture constant arrays)
    kind, Lz, lam, Mz = zspec

    def z_level(k: int) -> float:
        zeta = k / max(Mz - 1, 1)
        if kind == "quadratic":
            return Lz * (zeta / lam) * (1.0 + (lam - 1.0) * zeta)
        return Lz * zeta

    # explicit row slices: the VMEM window may carry extra alignment rows
    # below the halo (window height ty+8; only rows 0..ty+2 are meaningful)
    rc, rn, rs = slice(1, ty + 1), slice(2, ty + 2), slice(0, ty)
    c = (rc, slice(1, -1))
    e = (rc, slice(2, None))
    nn = (rn, slice(1, -1))
    ne = (rn, slice(2, None))
    s_ = (rs, slice(1, -1))
    se = (rs, slice(2, None))
    w = (rc, slice(0, -2))
    nw = (rn, slice(0, -2))

    H_e = 0.5 * (Hp[c] + Hp[e])
    H_n = 0.5 * (Hp[c] + Hp[nn])
    E_e = 0.5 * (Ep[(slice(None),) + c] + Ep[(slice(None),) + e])
    E_n = 0.5 * (Ep[(slice(None),) + c] + Ep[(slice(None),) + nn])

    sx_e = (sp[e] - sp[c]) / dx
    sy_e = (sp[nn] + sp[ne] - sp[s_] - sp[se]) / (4.0 * dy)
    sy_n = (sp[nn] - sp[c]) / dy
    sx_n = (sp[e] + sp[ne] - sp[w] - sp[nw]) / (4.0 * dx)

    def K_integral(E3, Hf):
        """K = int_0^H A(E, p) (H - z)^(n+1) dz, trapezoid on clipped z.

        Unrolled per level as pure 2D VPU work (Mosaic-friendly; Mz is
        small and static)."""
        dt_ = Hf.dtype

        def f_level(k):
            zk = z_level(k)
            depth = jnp.maximum(Hf - zk, 0.0)
            p = 101325.0 + rho_i * g * depth
            Tm = T_melting - beta_cc * p
            Es = c_i * (Tm - T_ref)
            Ek = E3[k]
            T = jnp.where(Ek < Es, T_ref + Ek / c_i, Tm)
            T_pa = T - Tm + T_melting
            cold = T_pa < T_crit
            # scalar-scalar jnp.where defaults to f64 under x64
            Aarr = jnp.where(cold, jnp.asarray(A_cold, dt_),
                             jnp.asarray(A_warm, dt_))
            Q = jnp.where(cold, jnp.asarray(Q_cold, dt_),
                          jnp.asarray(Q_warm, dt_))
            soft = Aarr * jnp.exp(-Q / (R * T_pa))
            omega = jnp.minimum(jnp.clip((Ek - Es) / L0, 0.0, 1.0), wfl)
            return soft * (1.0 + wfc * omega) * depth ** (n + 1.0)

        K = jnp.zeros_like(Hf)
        f_lo = f_level(0)
        for k in range(Mz - 1):
            f_hi = f_level(k + 1)
            z_lo = jnp.minimum(jnp.asarray(z_level(k), dt_), Hf)
            z_hi = jnp.minimum(jnp.asarray(z_level(k + 1), dt_), Hf)
            K = K + 0.5 * (f_lo + f_hi) * (z_hi - z_lo)
            f_lo = f_hi
        return K

    Ke = K_integral(E_e, H_e)
    Kn = K_integral(E_n, H_n)

    slope2_e = sx_e * sx_e + sy_e * sy_e
    slope2_n = sx_n * sx_n + sy_n * sy_n
    De = C * slope2_e ** ((n - 1.0) / 2.0) * Ke
    Dn = C * slope2_n ** ((n - 1.0) / 2.0) * Kn
    De = jnp.minimum(De, jnp.asarray(d_cap, De.dtype))
    Dn = jnp.minimum(Dn, jnp.asarray(d_cap, Dn.dtype))

    De_ref[:] = De
    Dn_ref[:] = Dn
    qe_ref[:] = -De * sx_e
    qn_ref[:] = -Dn * sy_n


def sia_flux_thermo_pallas(H, s, E, *, grid, n: float = 3.0,
                           enhancement: float = 1.0, rho: float = 910.0,
                           g: float = 9.81, dx: float, dy: float,
                           EC, pb_law, block_y: int = 32,  # must be a multiple of 8
                           interpret: bool = None, d_cap=None):
    """Fused thermomechanical (GPBLD) SIA diffusivity + flux via Pallas,
    tiled over y-blocks with one-row halo overlap. E: (My, Mx, Mz)."""
    Hp = jnp.pad(H, 1, mode="edge")
    sp = jnp.pad(s, 1, mode="edge")
    Ep = jnp.moveaxis(jnp.pad(E, ((1, 1), (1, 1), (0, 0)), mode="edge"),
                      -1, 0)  # (Mz, My+2, Mx+2)
    qe, qn, De, Dn = sia_flux_thermo_pallas_padded(
        Hp, sp, Ep, grid=grid, n=n, enhancement=enhancement, rho=rho, g=g,
        dx=dx, dy=dy, EC=EC, pb_law=pb_law, block_y=block_y,
        interpret=interpret, d_cap=d_cap)
    max_D = jnp.maximum(jnp.max(De), jnp.max(Dn))
    return De, Dn, qe, qn, max_D


def sia_flux_thermo_pallas_padded(Hp, sp, Ep, *, grid, n: float = 3.0,
                                  enhancement: float = 1.0, rho: float = 910.0,
                                  g: float = 9.81, dx: float, dy: float,
                                  EC, pb_law, block_y: int = 32,
                                  interpret: bool = None, d_cap=None):
    """Core of :func:`sia_flux_thermo_pallas` on pre-ghost-padded inputs.

    Hp, sp: (My+2, Mx+2); Ep: (Mz, My+2, Mx+2). The caller supplies the
    one-cell ghost ring — ``jnp.pad(mode="edge")`` for the single-device
    path, or ppermute-exchanged halos for the sharded path
    (``ops.pallas_sharded``). Returns (qe, qn, De, Dn) of shape (My, Mx)."""
    if interpret is None:
        interpret = FORCE_INTERPRET or jax.devices()[0].platform != "tpu"
    My, Mx = Hp.shape[0] - 2, Hp.shape[1] - 2
    C = 2.0 * (rho * g) ** n

    # shrink the y-block so the (Mz, TY+8, Mx+2) enthalpy window fits VMEM:
    # the pipeline double-buffers every window, so budget ~4 MB per copy
    Mz_ = Ep.shape[0]
    bpe = jnp.dtype(Hp.dtype).itemsize
    while block_y > 8 and (Mz_ + 2) * (block_y + 8) * (Mx + 2) * bpe > 4 * 2 ** 20:
        block_y //= 2

    Mz = Ep.shape[0]

    ny = -(-My // block_y)
    pad_rows = ny * block_y - My
    if pad_rows:
        Hp = jnp.pad(Hp, ((0, pad_rows), (0, 0)), mode="edge")
        sp = jnp.pad(sp, ((0, pad_rows), (0, 0)), mode="edge")
        Ep = jnp.pad(Ep, ((0, 0), (0, pad_rows), (0, 0)), mode="edge")
    Mxp = Mx + 2
    TY = block_y

    EC_consts = (EC.T_melting, EC.T_ref, EC.c_i, EC.L0, EC.beta, rho, g)
    pb = pb_law
    pb_consts = (pb.A_cold * enhancement, pb.A_warm * enhancement,
                 pb.Q_cold, pb.Q_warm, pb.T_critical, pb.R,
                 getattr(pb, "water_frac_coeff", 0.0),
                 getattr(pb, "water_frac_observed_limit", 0.0))

    zspec = (grid.vertical_spacing, float(grid.Lz), float(grid.lam),
             int(grid.Mz))
    body = functools.partial(
        _sia_thermo_body, float(n), float(C), float(dx), float(dy), TY,
        zspec, EC_consts, pb_consts,
        float("inf") if d_cap is None else float(d_cap))

    # Pre-materialize the haloed y-windows, concatenated along rows so the
    # pallas blocks are plain non-overlapping 2D/3D tiles. Window height is
    # TY+8 (TPU blocks need 8-divisible sublanes); only rows 0..TY+2 carry
    # halo+data, the rest is alignment padding.
    W = TY + 8
    Hp = jnp.pad(Hp, ((0, 8), (0, 0)), mode="edge")
    sp = jnp.pad(sp, ((0, 8), (0, 0)), mode="edge")
    Ep = jnp.pad(Ep, ((0, 0), (0, 8), (0, 0)), mode="edge")
    Hw = jnp.concatenate([Hp[i * TY:i * TY + W] for i in range(ny)], 0)
    sw = jnp.concatenate([sp[i * TY:i * TY + W] for i in range(ny)], 0)
    Ew = jnp.concatenate([Ep[:, i * TY:i * TY + W, :] for i in range(ny)], 1)

    def kernel(Hb, sb, Eb, qe_ref, qn_ref, De_ref, Dn_ref):
        body(Hb[:], sb[:], Eb[:], qe_ref, qn_ref, De_ref, Dn_ref)

    shape = jax.ShapeDtypeStruct((ny * TY, Mx), Hp.dtype)
    ms = pl.ANY if interpret else pltpu.VMEM
    # index maps use np.int32 literals: under jax_enable_x64 a python-int 0
    # traces as int64 and Mosaic fails to legalize the index-map func.return
    z0 = np.int32(0)
    qe, qn, De, Dn = pl.pallas_call(
        kernel,
        grid=(ny,),
        in_specs=[
            pl.BlockSpec((W, Mxp), lambda i: (i, z0), memory_space=ms),
            pl.BlockSpec((W, Mxp), lambda i: (i, z0), memory_space=ms),
            pl.BlockSpec((Mz, W, Mxp), lambda i: (z0, i, z0),
                         memory_space=ms),
        ],
        out_specs=tuple(
            pl.BlockSpec((TY, Mx), lambda i: (i, z0), memory_space=ms)
            for _ in range(4)),
        out_shape=(shape, shape, shape, shape),
        interpret=interpret,
    )(Hw, sw, Ew)
    return tuple(a[:My] for a in (qe, qn, De, Dn))


def sia_flux_pallas(H, s, *, A: float, n: float = 3.0, enhancement: float = 1.0,
                    rho: float = 910.0, g: float = 9.81,
                    dx: float, dy: float, interpret: bool = None,
                    d_cap=None):
    """Fused isothermal SIA (De, Dn, qe, qn) via Pallas.

    Equivalent to ``ops.sia.diffusivity`` with ``enthalpy=None`` and the
    Mahaffy gradient on a non-periodic grid (clamped ghosts).
    """
    gamma = 2.0 * enhancement * A * (rho * g) ** n / (n + 2.0)
    Hp = jnp.pad(H, 1, mode="edge")
    sp = jnp.pad(s, 1, mode="edge")
    qe, qn, De, Dn = sia_flux_pallas_padded(Hp, sp, gamma=gamma, n=n,
                                            dx=dx, dy=dy, interpret=interpret,
                                            d_cap=d_cap)
    max_D = jnp.maximum(jnp.max(De), jnp.max(Dn))
    return De, Dn, qe, qn, max_D


def sia_flux_pallas_padded(Hp, sp, *, gamma: float, n: float = 3.0,
                           dx: float, dy: float, interpret: bool = None,
                           d_cap=None):
    """Core of :func:`sia_flux_pallas` on pre-ghost-padded (My+2, Mx+2)
    inputs; returns (qe, qn, De, Dn) of shape (My, Mx)."""
    if interpret is None:
        interpret = FORCE_INTERPRET or jax.devices()[0].platform != "tpu"
    shape = jax.ShapeDtypeStruct((Hp.shape[0] - 2, Hp.shape[1] - 2), Hp.dtype)

    kernel = functools.partial(_sia_kernel, float(n), float(gamma),
                               float(dx), float(dy),
                               float("inf") if d_cap is None else float(d_cap))
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape, shape),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)] * 2,
        out_specs=tuple([pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)] * 4),
        interpret=interpret,
    )(Hp, sp)


# ---------------------------------------------------------------------------
# SSA membrane-operator matvec (the Krylov hot kernel)
# ---------------------------------------------------------------------------

def _ssa_matvec_kernel(dx: float, dy: float,
                       up_ref, vp_ref, nuHe_ref, nuHn_ref, beta_ref,
                       Au_ref, Av_ref):
    """Fused A(u,v) = -div(T) + beta*(u,v) in one VMEM pass.

    up, vp: (My+2, Mx+2) ghost-padded velocities (edge clamp, matching the
    non-periodic Shifter); nuH_e/nuH_n/beta: (My, Mx). Face stresses are
    clamp-shifted (west/south) exactly like the XLA path's
    ``div_staggered`` on edge-padded face arrays.
    """
    up = up_ref[:]
    vp = vp_ref[:]
    nuHe = nuHe_ref[:]
    nuHn = nuHn_ref[:]
    beta = beta_ref[:]

    c = (slice(1, -1), slice(1, -1))
    e = (slice(1, -1), slice(2, None))
    nn = (slice(2, None), slice(1, -1))
    ne = (slice(2, None), slice(2, None))
    s_ = (slice(0, -2), slice(1, -1))
    se = (slice(0, -2), slice(2, None))
    w = (slice(1, -1), slice(0, -2))
    nw = (slice(2, None), slice(0, -2))

    # east-face gradients
    ux_e = (up[e] - up[c]) / dx
    vx_e = (vp[e] - vp[c]) / dx
    uy_e = (up[nn] + up[ne] - up[s_] - up[se]) / (4.0 * dy)
    vy_e = (vp[nn] + vp[ne] - vp[s_] - vp[se]) / (4.0 * dy)
    # north-face gradients
    uy_n = (up[nn] - up[c]) / dy
    vy_n = (vp[nn] - vp[c]) / dy
    ux_n = (up[e] + up[ne] - up[w] - up[nw]) / (4.0 * dx)
    vx_n = (vp[e] + vp[ne] - vp[w] - vp[nw]) / (4.0 * dx)

    Txx_e = 2.0 * nuHe * (2.0 * ux_e + vy_e)
    Txy_n = nuHn * (uy_n + vx_n)
    Tyy_n = 2.0 * nuHn * (2.0 * vy_n + ux_n)
    Txy_e = nuHe * (uy_e + vx_e)

    def shift_w(T):   # clamp-shift one column west
        return jnp.concatenate([T[:, :1], T[:, :-1]], axis=1)

    def shift_s(T):   # clamp-shift one row south
        return jnp.concatenate([T[:1, :], T[:-1, :]], axis=0)

    div_x = (Txx_e - shift_w(Txx_e)) / dx + (Txy_n - shift_s(Txy_n)) / dy
    div_y = (Txy_e - shift_w(Txy_e)) / dx + (Tyy_n - shift_s(Tyy_n)) / dy

    Au_ref[:] = -div_x + beta * up[c]
    Av_ref[:] = -div_y + beta * vp[c]


def _ssa_matvec_raw(u, v, nuH_e, nuH_n, beta, dx, dy, interpret):
    up = jnp.pad(u, 1, mode="edge")
    vp = jnp.pad(v, 1, mode="edge")
    shape = jax.ShapeDtypeStruct(u.shape, u.dtype)
    kernel = functools.partial(_ssa_matvec_kernel, float(dx), float(dy))
    ms = pl.ANY if interpret else pltpu.VMEM
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape),
        in_specs=[pl.BlockSpec(memory_space=ms)] * 5,
        out_specs=(pl.BlockSpec(memory_space=ms),) * 2,
        interpret=interpret,
    )(up, vp, nuH_e, nuH_n, beta)


@functools.partial(jax.custom_jvp, nondiff_argnums=(5, 6, 7))
def ssa_matvec_pallas(u, v, nuH_e, nuH_n, beta, dx, dy, interpret=False):
    """Fused SSA operator application (non-periodic grids).

    Equivalent to ``ops.ssa.apply_operator`` with a clamped Shifter. The
    operator is bilinear in ((u, v), (nuH, beta)), so its JVP is two fused
    applications — Newton's ``jax.jvp`` through the residual works without
    differentiating the kernel itself. (Reverse-mode callers — the inverse
    toolkit — use the XLA operator; see ``model.ssa.SSAFD.build_problem``.)
    """
    return _ssa_matvec_raw(u, v, nuH_e, nuH_n, beta, dx, dy, interpret)


@ssa_matvec_pallas.defjvp
def _ssa_matvec_jvp(dx, dy, interpret, primals, tangents):
    u, v, nuH_e, nuH_n, beta = primals
    du, dv, dnuH_e, dnuH_n, dbeta = tangents
    out = _ssa_matvec_raw(u, v, nuH_e, nuH_n, beta, dx, dy, interpret)
    # d/du part: A(du, dv; nuH, beta)
    zeros = jnp.zeros_like(u)
    du_ = du if not _is_zero(du) else zeros
    dv_ = dv if not _is_zero(dv) else zeros
    t1 = _ssa_matvec_raw(du_, dv_, nuH_e, nuH_n, beta, dx, dy, interpret)
    # d/dnuH part: A(u, v; dnuH, 0) (+ dbeta * (u, v))
    if not (_is_zero(dnuH_e) and _is_zero(dnuH_n) and _is_zero(dbeta)):
        de = dnuH_e if not _is_zero(dnuH_e) else jnp.zeros_like(nuH_e)
        dn = dnuH_n if not _is_zero(dnuH_n) else jnp.zeros_like(nuH_n)
        db = dbeta if not _is_zero(dbeta) else jnp.zeros_like(beta)
        t2 = _ssa_matvec_raw(u, v, de, dn, db, dx, dy, interpret)
        tang = (t1[0] + t2[0], t1[1] + t2[1])
    else:
        tang = t1
    return out, tang


def _is_zero(t):
    from jax.interpreters.ad import Zero
    return isinstance(t, Zero) or t is None


# ------------------------------------------------------------------ PCR
def _pcr_kernel(rounds: int, n: int, a_ref, b_ref, c_ref, d_ref, x_ref):
    """Fused parallel cyclic reduction along the LAST (lane) axis: all
    log2(n) elimination rounds stay in VMEM — ONE HBM round trip per
    solve, vs one per round per array in the XLA fallback. Bitwise the
    same float operations in the same order as
    ``util.tridiag.solve_batched_pcr``.

    The SSA line preconditioner's PCR applications dominate the 5 km
    production Krylov iteration cost (~0.26 of 0.285 ms/iter is PCR HBM
    traffic; examples/component_timing.py round 5) — this kernel is that
    fix. Lane padding is safe: rolls wrap over the padded width, and every
    lane whose source crosses the logical edge is masked to the fill
    value before use."""
    a = a_ref[:]
    b = b_ref[:]
    c = c_ref[:]
    d = d_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 1)
    # edge rows of the tridiagonal have no outside neighbors
    a = jnp.where(lane == 0, 0.0, a)
    c = jnp.where(lane == n - 1, 0.0, c)

    def sh(arr, s, fill):
        """arr[k + s] with fill outside the logical [0, n) lane range
        (pltpu.roll is circular over the logical lane count and only takes
        non-negative shifts; wrapped-in lanes are masked to fill)."""
        # np.int32: under jax_enable_x64 a python-int shift traces as an
        # i64 tpu.dynamic_rotate operand, which Mosaic fails to legalize
        rolled = pltpu.roll(arr, np.int32((-s) % n), axis=arr.ndim - 1)
        if s >= 0:
            return jnp.where(lane >= n - s, fill, rolled)
        return jnp.where(lane < -s, fill, rolled)

    s = 1
    for _ in range(rounds):
        b_m = sh(b, -s, 1.0)
        b_p = sh(b, +s, 1.0)
        alpha = -a / b_m
        gamma = -c / b_p
        b = b + alpha * sh(c, -s, 0.0) + gamma * sh(a, +s, 0.0)
        d = d + alpha * sh(d, -s, 0.0) + gamma * sh(d, +s, 0.0)
        a = alpha * sh(a, -s, 0.0)
        c = gamma * sh(c, +s, 0.0)
        s *= 2
    x_ref[:] = d / b


def pcr_fused(a, b, c, d, *, interpret: bool = None, block_rows: int = 256):
    """Batched tridiagonal PCR solve along the last axis as one fused
    Pallas kernel (same contract as ``util.tridiag.solve_batched_pcr``).
    2D inputs only (batch, n); the caller flattens higher batch dims."""
    import math as _math

    if interpret is None:
        interpret = FORCE_INTERPRET or jax.devices()[0].platform != "tpu"
    batch, n = a.shape[-2], a.shape[-1]
    rounds = _math.ceil(_math.log2(n)) if n > 1 else 0
    grid = (max(1, -(-batch // block_rows)),)
    bs = pl.BlockSpec((min(block_rows, batch), n),
                      lambda i: (i, np.int32(0)))
    kern = functools.partial(_pcr_kernel, rounds, n)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[bs, bs, bs, bs],
        out_specs=bs,
        interpret=interpret,
    )(a, b, c, d)


def _pcr_kernel_sub(rounds: int, n: int, a_ref, b_ref, c_ref, d_ref, x_ref):
    """PCR along the SUBLANE (second-to-last) axis: sublane rotates are
    register shuffles, far cheaper than the cross-lane permutes the
    lane-axis variant lowers to (measured: the lane variant LOST 46% at
    the 5 km shape)."""
    a = a_ref[:]
    b = b_ref[:]
    c = c_ref[:]
    d = d_ref[:]
    row = jax.lax.broadcasted_iota(jnp.int32, a.shape, a.ndim - 2)
    a = jnp.where(row == 0, 0.0, a)
    c = jnp.where(row == n - 1, 0.0, c)

    def sh(arr, s, fill):
        rolled = pltpu.roll(arr, np.int32((-s) % n), axis=arr.ndim - 2)
        if s >= 0:
            return jnp.where(row >= n - s, fill, rolled)
        return jnp.where(row < -s, fill, rolled)

    s = 1
    for _ in range(rounds):
        b_m = sh(b, -s, 1.0)
        b_p = sh(b, +s, 1.0)
        alpha = -a / b_m
        gamma = -c / b_p
        b = b + alpha * sh(c, -s, 0.0) + gamma * sh(a, +s, 0.0)
        d = d + alpha * sh(d, -s, 0.0) + gamma * sh(d, +s, 0.0)
        a = alpha * sh(a, -s, 0.0)
        c = gamma * sh(c, +s, 0.0)
        s *= 2
    x_ref[:] = d / b


def pcr_fused_sub(a, b, c, d, *, interpret: bool = None,
                  block_lanes: int = 512):
    """Batched tridiagonal PCR along axis -2 (the system axis on sublanes,
    batch on lanes) as one fused VMEM kernel; see _pcr_kernel_sub."""
    import math as _math

    if interpret is None:
        interpret = FORCE_INTERPRET or jax.devices()[0].platform != "tpu"
    n, batch = a.shape[-2], a.shape[-1]
    rounds = _math.ceil(_math.log2(n)) if n > 1 else 0
    grid = (max(1, -(-batch // block_lanes)),)
    bs = pl.BlockSpec((n, min(block_lanes, batch)),
                      lambda i: (np.int32(0), i))
    kern = functools.partial(_pcr_kernel_sub, rounds, n)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[bs, bs, bs, bs],
        out_specs=bs,
        interpret=interpret,
    )(a, b, c, d)
