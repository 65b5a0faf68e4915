"""Real 2-process jax.distributed smoke via scripts/multihost_smoke.py
(the multi-node-without-a-cluster validation, SURVEY.md §4)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_smoke():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=570, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "multihost smoke PASSED" in out.stdout


def test_init_distributed_ignores_sentinel_env(monkeypatch):
    """A relay exporting TPU_WORKER_HOSTNAMES set to a warning string must
    not trigger jax.distributed.initialize (regression: every real-TPU
    driver run crashed with 'coordinator_address should be defined')."""
    from dualvar_tpu.core import mesh

    monkeypatch.setenv(
        "TPU_WORKER_HOSTNAMES",
        "WARNING: could not determine TPU worker hostnames or IP addresses")
    mesh.init_distributed()  # must be a no-op, not raise
