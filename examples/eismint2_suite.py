"""EISMINT II experiment suite (PISM ``pisms -eisII``; examples/ analog).

Runs experiment A from zero ice to (near) steady state, then the restart
experiments B (warming), C (drier), D (smaller ablation zone) from the A
state, reporting the standard EISMINT II table quantities (volume, area,
divide thickness, divide basal temperature).

Usage:
  python examples/eismint2_suite.py [--years 200000] [--mx 61] [--platform tpu]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--years", type=float, default=200000.0)
    ap.add_argument("--mx", type=int, default=61)
    ap.add_argument("--mz", type=int, default=61)
    ap.add_argument("--experiments", default="A,B,C,D")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--float32", action="store_true")
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.physics.enthalpy_converter import EnthalpyConverter
    from pism_tpu.verification import eismint2

    SPY = 3.15569259747e7

    def report(name, es, state):
        H = np.asarray(state.geometry.ice_thickness)
        g = es.grid
        EC = EnthalpyConverter.from_config(es.config)
        c = g.My // 2
        Tb = float(EC.temperature(state.enthalpy[c, c + 0, 0],
                                  EC.pressure(state.geometry.ice_thickness[c, c])))
        icy = H > 0.01
        out = {
            "experiment": name,
            "volume_1e6_km3": float(H.sum() * g.dx * g.dy / 1e9 / 1e6),
            "area_1e6_km2": float(icy.sum() * g.dx * g.dy / 1e6 / 1e6),
            "divide_thickness_m": float(H[c, c]),
            "divide_basal_temp_K": Tb,
        }
        print(json.dumps(out), flush=True)
        return out

    results = {}
    exps = args.experiments.split(",")

    # experiment A from zero ice
    es = eismint2.setup("A", Mx=args.mx, Mz=args.mz)
    if args.float32:
        es.config.update({"runtime.float_dtype": "float32"})
    model = IceModel(grid=es.grid, config=es.config, surface=es.surface)
    state = es.state
    if args.float32:
        state = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, state)
    t = 0.0
    tic = time.time()
    seg = 10000.0
    while t < args.years:
        state, t, stats = model.step_once(state, t, seg * SPY)
        print(f"A: t={t / SPY:9.0f} a  steps={int(stats.nsteps):7d} "
              f"wall={time.time() - tic:7.0f} s", flush=True)
    results["A"] = report("A", es, state)
    state_A, t_A = state, t

    for exp in [e for e in exps if e in ("B", "C", "D", "F")]:
        es2 = eismint2.setup(exp, Mx=args.mx, Mz=args.mz)
        if args.float32:
            es2.config.update({"runtime.float_dtype": "float32"})
        model2 = IceModel(grid=es2.grid, config=es2.config, surface=es2.surface)
        st, t2 = state_A, 0.0
        while t2 < args.years:
            st, t2, _ = model2.step_once(st, t2, seg * SPY)
        results[exp] = report(exp, es2, st)

    print(json.dumps({"expected_A": eismint2.EXPECTED_A, "results": results},
                     indent=2))


if __name__ == "__main__":
    main()
