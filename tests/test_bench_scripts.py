"""CI rehearsal of the hardware measurement scripts' full logic on tiny
shapes (--smoke): compile, donation, state threading, JSON record shape.
The real runs need the TPU relay; these pin that a relay-day regression in
the scripts themselves (not the hardware) can't silently lose a
measurement window.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, cwd, timeout=560):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/dualvar_tpu_jax_cache"
    out = subprocess.run([sys.executable, *argv], capture_output=True,
                         text=True, timeout=timeout, env=env, cwd=cwd)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    return out.stdout


def test_moco_soak_smoke(tmp_path):
    stdout = _run([os.path.join(REPO, "scripts", "moco_soak.py"), "--smoke"],
                  cwd=str(tmp_path))
    rec = json.loads([l for l in stdout.splitlines()
                      if l.startswith("{")][-1])
    # the soak's own invariants: exact ring-pointer arithmetic, unit-norm
    # queue rows, finite EMA tree, bitwise resume replay
    assert rec["ptr_ok"] and rec["ema_finite"]
    assert rec["queue_norm_max_dev"] < 1e-3
    assert rec["resume_deterministic"] in (None, True)
    assert rec["queue_wraps"] >= 1, "smoke must exercise a ring wrap"


def test_objective_bench_smoke(tmp_path):
    stdout = _run([os.path.join(REPO, "scripts", "objective_bench.py"),
                   "--smoke", "moco_naked_r3d"], cwd=str(tmp_path))
    doc = json.load(open(tmp_path / "BENCH_OBJECTIVES.json"))
    names = [r["name"] for r in doc["results"]]
    assert "moco_naked_r3d" in names
    rec = [r for r in doc["results"] if r["name"] == "moco_naked_r3d"][0]
    assert "error" not in rec and rec["ms_per_step"] > 0
