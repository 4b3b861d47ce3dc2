"""End-to-end CLI workflow regression: the std-greenland tutorial analog
(bootstrap -> no-mass thermal -> hybrid spinup through restart files).

Covers the CLI restart chain at float32 (checkpoint load casts to the
configured dtype), the searise_greenland atmosphere's lat/lon/precipitation
plumbing from the bootstrap file, and the forcing-dtype cast in
``inputs_from_files`` (f64 forcing used to promote the f32 while_loop
carry)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_std_greenland_workflow_quick(tmp_path):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples",
                                      "std_greenland_workflow.py"),
         "--km", "60", "--quick", "--platform", "cpu",
         "--workdir", str(tmp_path)],
        capture_output=True, text=True, env=env, timeout=900)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["ok"] is True
    v1, v2, v3 = res["volumes_km3"]
    assert abs(v2 - v1) < 0.02 * v1      # no-mass stage conserves geometry
