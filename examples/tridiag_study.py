"""Thomas-vs-PCR crossover measurement (VERDICT r4 #10 / advisor r3):
times both batched tridiagonal kernels over n (system length) x batch
width and prints the winner table that calibrates THOMAS_MAX_N /
THOMAS_MIN_BATCH in util/tridiag.py.

Usage: python examples/tridiag_study.py [--platform cpu]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import jax as _j
_j.config.update("jax_compilation_cache_dir", _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        ".jax_cache")))
_j.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reps", type=int, default=30)
    args = ap.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from pism_tpu.util.tridiag import solve_batched_pcr, solve_batched_thomas

    def timeit(fn, a, b, c, d, reps):
        f = jax.jit(fn)
        out = f(a, b, c, d)
        jax.block_until_ready(out)
        tic = time.time()
        for _ in range(reps):
            out = f(a, b, c, d)
        jax.block_until_ready(out)
        return (time.time() - tic) / reps * 1e3

    key = jax.random.PRNGKey(0)
    rows = []
    # n spans the energy/age columns (41-129) and the SSA line-precond
    # lines (301, 561); batch spans narrow (lines) to full-grid (columns)
    for n in (41, 65, 97, 129, 301, 561):
        for batch in (64, 512, 4096, 32768, 169 * 1024):
            if n * batch > 3e7:   # HBM guard
                continue
            shape = (batch, n)
            ks = jax.random.split(key, 4)
            b = 4.0 + jax.random.uniform(ks[0], shape, jnp.float32)
            a = -jax.random.uniform(ks[1], shape, jnp.float32)
            c = -jax.random.uniform(ks[2], shape, jnp.float32)
            d = jax.random.normal(ks[3], shape, jnp.float32)
            t_th = timeit(solve_batched_thomas, a, b, c, d, args.reps)
            t_pcr = timeit(solve_batched_pcr, a, b, c, d, args.reps)
            rows.append({"n": n, "batch": batch,
                         "thomas_ms": round(t_th, 3),
                         "pcr_ms": round(t_pcr, 3),
                         "winner": "thomas" if t_th <= t_pcr else "pcr"})
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"study": "tridiag_crossover",
                      "platform": jax.devices()[0].platform,
                      "rows": rows}))


if __name__ == "__main__":
    main()
