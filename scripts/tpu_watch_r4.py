"""Session watcher: poll the TPU relay, and on recovery serialize the
pending round-4 hardware jobs:

  1. python bench.py           -> refresh BENCH_LAST_GOOD.json (headline
                                  reconfirm through the new in-parent
                                  preflight)
  2. scripts/moco_soak.py      -> SOAK_MOCO_r04.json (MoCo production-step
                                  soak: queue wraps, EMA health, bitwise
                                  MoCoState resume)

Same wedge-immune bounded-subprocess pattern as scripts/tpu_watch_sweeps.py
(file stdio + own session + killpg). Logs to /tmp/tpu_watch_r4.log.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_DEADLINE_S = 150.0
PROBE_INTERVAL_S = 240.0
MAX_ATTEMPTS = 4
TOTAL_BUDGET_S = float(os.environ.get("TPU_WATCH_BUDGET_S", 8 * 3600))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def bounded(argv, deadline_s, logfile=None):
    import tempfile

    out_ctx = open(logfile, "ab") if logfile else tempfile.TemporaryFile()
    with out_ctx as out:
        p = subprocess.Popen(argv, stdout=out, stderr=subprocess.STDOUT,
                             start_new_session=True, cwd=REPO)
        try:
            rc = p.wait(timeout=deadline_s)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(p.pid, signal.SIGKILL)
            except OSError:
                p.kill()
            p.wait()
            return None
    return rc


def probe() -> bool:
    code = ("import jax; jax.devices(); import jax.numpy as jnp; "
            "x = jnp.ones((128, 128)); (x @ x).sum().item(); print('ok')")
    return bounded([sys.executable, "-c", code], PROBE_DEADLINE_S) == 0


def _fresh(path: str, started_at: float) -> bool:
    p = os.path.join(REPO, path)
    if not os.path.exists(p) or os.path.getmtime(p) < started_at:
        return False
    try:
        with open(p) as f:
            doc = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    return doc.get("value") is not None and "error" not in doc


def main():
    t_start = time.time()
    t_end = t_start + TOTAL_BUDGET_S
    jobs = [
        ("bench", [sys.executable, "bench.py"], 1500.0,
         "BENCH_LAST_GOOD.json", "/tmp/bench_r4.log"),
        ("moco_soak",
         [sys.executable, "scripts/moco_soak.py", "--minutes", "6"], 1200.0,
         "SOAK_MOCO_r04.json", "/tmp/moco_soak.log"),
    ]
    attempts = {name: 0 for name, *_ in jobs}
    while time.time() < t_end:
        pending = [j for j in jobs
                   if not _fresh(j[3], t_start) and attempts[j[0]] < MAX_ATTEMPTS]
        if not pending:
            break
        if not probe():
            log(f"relay dead/slow; retry in {PROBE_INTERVAL_S:.0f}s "
                f"({[j[0] for j in pending]} pending)")
            time.sleep(PROBE_INTERVAL_S)
            continue
        log(f"relay ALIVE; running {[j[0] for j in pending]}")
        for name, argv, deadline, artifact, logfile in pending:
            attempts[name] += 1
            log(f"{name} (attempt {attempts[name]}) -> {logfile}")
            rc = bounded(argv, deadline, logfile)
            ok = _fresh(artifact, t_start)
            log(f"{name}: rc={rc} recorded={'yes' if ok else 'NO'}")
            if not ok:
                break  # relay likely re-wedged; back to probing
    pending = [j[0] for j in jobs if not _fresh(j[3], t_start)]
    log("done" if not pending else f"exiting with pending: {pending}")
    return 0 if not pending else 1


if __name__ == "__main__":
    sys.exit(main())
