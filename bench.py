"""Benchmark harness (run by the driver on real TPU hardware).

Measures throughput of the flagship configuration — EISMINT II experiment A,
thermomechanically coupled SIA on a 61x61x61 grid (the CPU-runnable reference
config from BASELINE.md) — as model-years per wall-hour, fully on-device
(adaptive-dt lax.while_loop segments; zero host sync inside a segment).

Baseline provenance: the reference mount is empty and BASELINE.json.published
is {}; BASELINE.md records (from-memory, unverified) that reference PISM runs
EISMINT II exp A (200 kyr) in ~minutes on one CPU core. We take 10 minutes
for 200 kyr => 1.2e6 model-years/wall-hour as the indicative baseline;
vs_baseline is measured/baseline with that caveat.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

BASELINE_MODEL_YEARS_PER_HOUR = 1.2e6  # from-memory PISM estimate (see above)
SPY = 3.15569259747e7


def main():
    import jax
    import jax.numpy as jnp

    from pism_tpu.model.icemodel import IceModel
    from pism_tpu.verification import eismint2

    dtype = "float32" if any(d.platform != "cpu" for d in jax.devices()) else "float64"

    es = eismint2.setup("A", Mx=61, Mz=61, Lz=5000.0)
    es.config.update({"runtime.float_dtype": dtype})
    model = IceModel(grid=es.grid, config=es.config, surface=es.surface)
    state = es.state
    if dtype == "float32":
        state = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and x.dtype == jnp.float64 else x, state)

    # Warm up: compile + spin ice up so the adaptive dt is in its
    # steady (diffusivity-limited) regime, the honest throughput regime.
    t = 0.0
    state, t, _ = model.step_once(state, t, 5000.0 * SPY)
    jax.block_until_ready(state.geometry.ice_thickness)

    # Timed segment (same jitted computation, no recompile).
    bench_years = 2000.0
    tic = time.time()
    state, t, stats = model.step_once(state, t, bench_years * SPY)
    jax.block_until_ready(state.geometry.ice_thickness)
    wall = time.time() - tic

    nsteps = int(stats.nsteps)
    my_per_hour = bench_years / wall * 3600.0
    cells = es.grid.Mx * es.grid.My * es.grid.Mz
    cell_updates_per_s = nsteps * cells / wall

    result = {
        "metric": "EISMINT2-A 61x61x61 thermo-coupled SIA model-years/wall-hour",
        "value": round(my_per_hour, 1),
        "unit": "model_years/hour",
        "vs_baseline": round(my_per_hour / BASELINE_MODEL_YEARS_PER_HOUR, 3),
        "detail": {
            "steps": nsteps,
            "wall_s": round(wall, 3),
            "cell_updates_per_s": round(cell_updates_per_s, 0),
            "dtype": dtype,
            "platform": jax.devices()[0].platform,
            "baseline_note": "1.2e6 model-years/hour from-memory PISM 1-core estimate (reference mount empty)",
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
