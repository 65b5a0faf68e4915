"""Watch the TPU relay and run the pending hardware sweeps on recovery.

The relay wedges for hours at a time (PARITY.md round-3/4 records); this
watcher polls it with the same wedge-immune bounded-subprocess pattern as
bench.py (file-redirected stdio + own session + killpg on deadline — see
bench.py:_bounded_run for why subprocess.run(capture_output=True) is not
safe here), and the moment a probe passes it serializes the remaining
hardware sweeps:

  1. scripts/backbone_bench.py  -> BENCH_BACKBONES.json (all 7 families)
  2. scripts/eval_bench.py      -> BENCH_EVAL.json
  3. scripts/objective_bench.py -> BENCH_OBJECTIVES.json (per-SSL-family
     production train step, incl. both MoCo configs)

Each sweep is itself deadline-bounded so a mid-run wedge cannot hold the
watcher forever. Logs to /tmp/tpu_watch.log; exits 0 when both sweeps have
produced their JSON, 1 if the overall budget expires first.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_DEADLINE_S = 120.0
PROBE_INTERVAL_S = 180.0
SWEEP_DEADLINE_S = 1500.0  # one net: <=~450s relay compile + ~60s run
TOTAL_BUDGET_S = float(os.environ.get("TPU_WATCH_BUDGET_S", 6 * 3600))


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def bounded(argv, deadline_s, logfile=None):
    """bench.py:_bounded_run, with optional append-to-logfile stdio."""
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
    rc = bounded([sys.executable, "-c", code], PROBE_DEADLINE_S)
    return rc == 0


NETS = ("r3d", "r21d", "c3d", "s3d", "s3dg", "r2d3d18", "r50")


def _done(artifact: str, net: str) -> bool:
    path = os.path.join(REPO, artifact)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            doc = json.load(f)
    except (json.JSONDecodeError, OSError):
        return False
    return any(r.get("net") == net and "error" not in r
               for r in doc.get("results", []))


def main():
    t_end = time.time() + TOTAL_BUDGET_S
    # one bounded invocation per (script, net) so a relay death mid-sweep
    # costs one net, not the whole sweep; both scripts merge incrementally
    units = [(script, net, artifact, logfile)
             for script, artifact, logfile in (
                 ("scripts/backbone_bench.py", "BENCH_BACKBONES.json",
                  "/tmp/backbone_bench.log"),
                 ("scripts/eval_bench.py", "BENCH_EVAL.json",
                  "/tmp/eval_bench.log"))
             for net in NETS]
    units += [("scripts/objective_bench.py", unit, "BENCH_OBJECTIVES.json",
               "/tmp/objective_bench.log")
              for unit in ("simclr_tsv4_r21d", "moco_tsv4_r21d",
                           "simclr_tsv4_r3d", "moco_naked_r3d")]
    attempts = {}  # (script, net) -> tries; a unit that fails 3 times with
    MAX_ATTEMPTS = 3  # a live relay is pathological — skip, don't starve
    while time.time() < t_end:
        pending = [u for u in units
                   if not _done(u[2], u[1])
                   and attempts.get(u[:2], 0) < MAX_ATTEMPTS]
        if not pending:
            break
        if not probe():
            log(f"relay dead; retry in {PROBE_INTERVAL_S:.0f}s "
                f"({len(pending)} units pending)")
            time.sleep(PROBE_INTERVAL_S)
            continue
        log(f"relay ALIVE; {len(pending)} units pending")
        for script, net, artifact, logfile in pending:
            log(f"{script} {net} -> {logfile}")
            attempts[(script, net)] = attempts.get((script, net), 0) + 1
            rc = bounded([sys.executable, script, net],
                         SWEEP_DEADLINE_S, logfile)
            ok = _done(artifact, net)
            log(f"{script} {net}: rc={rc} recorded={'yes' if ok else 'NO'} "
                f"(attempt {attempts[(script, net)]})")
            if not ok:
                break  # relay likely re-wedged; go back to probing
    pending = [f"{u[0]}:{u[1]}" for u in units if not _done(u[2], u[1])]
    if not pending:
        log("all sweeps done")
        return 0
    log("exiting with units unrecorded (budget or attempt cap):", pending)
    return 1


if __name__ == "__main__":
    sys.exit(main())
