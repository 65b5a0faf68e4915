"""Regression tests for bench.py's fail-fast subprocess plumbing.

BENCH_r03 (rc 124, no JSON) established that a wedged TPU relay must never
be able to hang the bench past its deadlines. The round-4 session then
observed a second wedge mode live: ``subprocess.run(capture_output=True,
timeout=...)`` kills the direct child on timeout but blocks in
``communicate()`` because axon PJRT helper processes inherit the stdout/
stderr pipes and keep them open. ``_bounded_run`` fixes that by writing to
temp files and SIGKILLing the child's whole session; these tests pin the
property with a simulated wedge (a grandchild holding stdio open).
"""

import os
import signal
import sys
import time

from bench import _bounded_run

PY = sys.executable


def test_normal_completion_returns_rc_and_streams():
    rc, out, err = _bounded_run(
        [PY, "-c", "import sys; print('ok'); print('warn', file=sys.stderr)"],
        deadline_s=30.0, tag="smoke")
    assert rc == 0
    assert out.strip() == "ok"
    assert err.strip() == "warn"


def test_nonzero_exit_is_reported_not_raised():
    rc, out, err = _bounded_run(
        [PY, "-c", "import sys; print('partial'); sys.exit(3)"],
        deadline_s=30.0, tag="smoke")
    assert rc == 3
    assert out.strip() == "partial"


def test_deadline_holds_against_stdio_holding_grandchild():
    # The simulated wedge: the child spawns a grandchild that inherits its
    # stdio and sleeps, then sleeps itself. With pipes this blocks the
    # parent's read long after the child is killed; with temp files +
    # killpg the call must return at the deadline.
    code = (
        "import subprocess, sys, time\n"
        "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(120)'])\n"
        "time.sleep(120)\n"
    )
    t0 = time.monotonic()
    rc, out, err = _bounded_run([PY, "-c", code], deadline_s=2.0, tag="wedge")
    elapsed = time.monotonic() - t0
    assert rc is None
    assert "timed out" in err
    # generous bound: the deadline plus process-kill overhead, nowhere near
    # the 120s the wedged processes would hold pipes open for
    assert elapsed < 15.0


def test_deadline_kill_takes_down_the_whole_process_group(tmp_path):
    # If only the direct child died, the orphaned grandchild would outlive
    # the call and write its marker file; killpg must reach it first.
    marker = tmp_path / "grandchild_survived"
    inner = f'import time, pathlib; time.sleep(4); pathlib.Path("{marker}").touch()'
    code = (
        "import subprocess, sys, time\n"
        f"subprocess.Popen([sys.executable, '-c', {inner!r}])\n"
        "time.sleep(120)\n"
    )
    rc, _, err = _bounded_run([PY, "-c", code], deadline_s=1.0, tag="wedge")
    assert rc is None
    time.sleep(5.0)
    assert not marker.exists(), "grandchild escaped the process-group kill"


def test_error_record_carries_last_known_good(monkeypatch, tmp_path):
    # A relay wedge at driver-bench time must still surface the most recent
    # on-hardware measurement: _error_record attaches BENCH_LAST_GOOD.json
    # (written by every successful non-cpu headline run) when present.
    import json

    import bench

    lg = tmp_path / "BENCH_LAST_GOOD.json"
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(lg))

    rec = bench._error_record("backend init timed out")
    assert rec["value"] is None and "last_known_good" not in rec

    lg.write_text(json.dumps({"value": 832.3, "measured_at": "2026-08-19"}))
    rec = bench._error_record("backend init timed out")
    assert rec["last_known_good"]["value"] == 832.3
    assert rec["error"] == "backend init timed out"

    lg.write_text("{corrupt")  # unreadable file must not break the record
    rec = bench._error_record("backend init timed out")
    assert "last_known_good" not in rec and rec["value"] is None


def test_save_last_good_roundtrip_and_timestamp(monkeypatch, tmp_path):
    import bench

    lg = tmp_path / "BENCH_LAST_GOOD.json"
    monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(lg))
    bench._save_last_good({"value": 900.0, "unit": "clips/s/chip"})
    got = bench._load_last_good()
    assert got["value"] == 900.0
    assert "measured_at" in got and got["measured_at"].startswith("20")
