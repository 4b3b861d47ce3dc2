"""Solver-schedule study for the warm-started SSA solve (5 km default).

Spins the synthetic-Greenland hybrid chain up ONCE, then measures the
warm-started SSA solve under several inner-tolerance schedules and drag
Jacobian options on the SAME state.  This is the experiment behind the
round-3 solver defaults: the per-sweep convergence trace
(examples/ssa_solver_trace.py) showed the warm solve spending ~18 sweeps
at eta_max-loose inner tolerance, with the per-sweep FIXED cost
(linearize + high-precision residual + preconditioner build) dominating
the Krylov work - so an endgame that requests one tight inner solve when
the target is in reach should beat many loose sweeps.

Usage: python examples/ssa_eta_study.py [--km 5] [--spin-years 10]
"""

import argparse
import time


VARIANTS = [
    ("baseline (eta_max 0.3, frozen beta)", {}),
    ("eta_max 0.05", {"stress_balance.ssa.fd.ksp_rtol_max": 0.05}),
    ("endgame range 100", {"stress_balance.ssa.fd.eta_endgame_range": 100.0}),
    ("endgame range 1e3", {"stress_balance.ssa.fd.eta_endgame_range": 1e3}),
    ("endgame range 1e6", {"stress_balance.ssa.fd.eta_endgame_range": 1e6}),
    ("exact drag J", {"stress_balance.ssa.fd.drag_jacobian": "exact"}),
    ("exact + endgame 1e3", {"stress_balance.ssa.fd.drag_jacobian": "exact",
                             "stress_balance.ssa.fd.eta_endgame_range": 1e3}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--km", type=float, default=5.0)
    ap.add_argument("--spin-years", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pism_tpu import Config, Grid
    from pism_tpu.coupler import atmosphere as atm
    from pism_tpu.coupler.ocean import Constant as OceanConstant
    from pism_tpu.coupler.pdd import TemperatureIndex
    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.state import ModelState, new_geometry

    SPY = 3.15569259747e7
    Lx, Ly = 750e3, 1400e3
    dx = args.km * 1e3
    Mx, My = int(2 * Lx / dx) + 1, int(2 * Ly / dx) + 1
    grid = Grid(Mx=Mx, My=My, Lx=Lx, Ly=Ly, Mz=41, Lz=4000.0)

    def make_cfg(extra):
        cfg = Config({
            "stress_balance.model": "ssa+sia",
            "energy.model": "enthalpy",
            "basal_resistance.pseudo_plastic.enabled": True,
            "basal_resistance.pseudo_plastic.q": 0.25,
            "basal_yield_stress.model": "mohr_coulomb",
            "calving.methods": "thickness_calving",
            "calving.thickness_calving.threshold": 50.0,
            "geometry.remove_icebergs": True,
            "geometry.part_grid.enabled": True,
            "runtime.float_dtype": "float32",
            "runtime.device_loop": False,
        })
        cfg.update(extra)
        return cfg

    X, Y = np.meshgrid(grid.x, grid.y)
    r2 = (X / (0.55 * Lx)) ** 2 + (Y / (0.8 * Ly)) ** 2
    bed = 400.0 - 900.0 * r2 + 150.0 * np.sin(X / 120e3) * np.cos(Y / 160e3)
    H = 2800.0 * np.maximum(1.0 - r2, 0.0) ** 1.5 * (bed > -600)
    lat = 60.0 + (Y + Ly) / (2 * Ly) * 23.0
    lon = -42.0 + X / Lx * 10.0
    precip = np.clip(0.6 - 0.25 * (lat - 60.0) / 23.0, 0.05, None) / SPY

    def make_model(cfg):
        a = atm.SeariseGreenland(latitude=jnp.asarray(lat),
                                 longitude=jnp.asarray(lon),
                                 precipitation=jnp.asarray(precip))
        return IceModel(grid=grid, config=cfg,
                        surface=TemperatureIndex(atmosphere=a, config=cfg),
                        ocean=OceanConstant(config=cfg))

    base = make_model(make_cfg({}))
    state = base.prepare_state(
        ModelState(geometry=new_geometry(jnp.asarray(H), jnp.asarray(bed))))
    state = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.float32)
        if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, state)
    tic = time.time()
    state, t, _ = base.step_once(state, 0.0, args.spin_years * SPY)
    jax.block_until_ready(state.geometry.ice_thickness)
    print(f"grid {Mx}x{My}x41 @ {args.km} km; spin-up+compile "
          f"{time.time() - tic:.0f} s", flush=True)
    tau_c = base.yield_stress.compute(state)

    print(f"{'variant':34s} {'ms':>7s} {'newton':>6s} {'krylov':>6s} "
          f"{'F2/b2':>9s}")
    for name, extra in VARIANTS:
        model = make_model(make_cfg(extra))
        f = jax.jit(lambda s, m=model: m.ssa.solve(s, tau_c,
                                                   diagnostics=True))
        u, v, info = f(state)           # compile
        jax.block_until_ready(u)
        tic = time.time()
        for _ in range(args.reps):
            u, v, info = f(state)
        jax.block_until_ready(u)
        ms = (time.time() - tic) / args.reps * 1e3
        print(f"{name:34s} {ms:7.1f} {int(info['newton_iters']):6d} "
              f"{int(info['krylov_iters']):6d} "
              f"{float(info['F2_final'] / info['b_norm2']):9.2e}",
              flush=True)


if __name__ == "__main__":
    main()
