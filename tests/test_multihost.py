"""Real 2-process jax.distributed smoke via scripts/multihost_smoke.py
(the multi-node-without-a-cluster validation, SURVEY.md §4)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_smoke():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        # 1200s: the smoke takes ~500s ALONE on this rig's single core and
        # runs two python subprocesses — under a concurrently running suite
        # it overruns 570s (observed twice). The multicrop/tenclip phases
        # were split into test_two_process_eval_protocol_equivalence to
        # keep this inside its envelope. The script itself retries the
        # 2-process launch once on a fresh port (scripts/_mh_launch.py) —
        # 2 x 560s attempts fit under this timeout.
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "multihost smoke PASSED" in out.stdout


@pytest.mark.slow
def test_two_process_eval_protocol_equivalence():
    """10-crop and temporal-10-clip under 2 jax.distributed processes must
    produce bit-identical accuracies to a single-process run (the
    record-dedupe / idempotent-overwrite logic in train/classifier.py
    :455-523; round-3 VERDICT #7)."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "multihost_eval_check.py")],
        # oracle (<=1200s) + two 900s worker attempts (_mh_launch retry)
        capture_output=True, text=True, timeout=3200, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "multihost eval check PASSED" in out.stdout


@pytest.mark.slow
def test_two_process_checkpoint_save_restore():
    """CheckpointStore.save on ALL processes under 2 jax.distributed
    processes (the claimed-but-untested orbax multi-host sync,
    train/pretrain.py:369-373; round-4 VERDICT #5): save (async) ->
    restore bitwise -> resumed step losses bitwise-equal to the
    single-process oracle."""
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    out = subprocess.run(
        [sys.executable,
         os.path.join(REPO, "scripts", "multihost_ckpt_check.py")],
        # oracle (<=900s) + two 560s worker attempts (_mh_launch retry)
        capture_output=True, text=True, timeout=2200, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "multihost ckpt check PASSED" in out.stdout


def test_init_distributed_ignores_sentinel_env(monkeypatch):
    """A relay exporting TPU_WORKER_HOSTNAMES set to a warning string must
    not trigger jax.distributed.initialize (regression: every real-TPU
    driver run crashed with 'coordinator_address should be defined')."""
    from dualvar_tpu.core import mesh

    monkeypatch.setenv(
        "TPU_WORKER_HOSTNAMES",
        "WARNING: could not determine TPU worker hostnames or IP addresses")
    mesh.init_distributed()  # must be a no-op, not raise


def test_init_distributed_single_entry_hostlist_is_noop(monkeypatch):
    """The real-rig failure mode (round-2 VERDICT weak #1): the TPU relay
    exports TPU_WORKER_HOSTNAMES=localhost. A single-entry host list is a
    single-host launch — init_distributed must not attempt a rendezvous
    (which, with jax already live in-process as under pytest, raised
    RuntimeError('...must be called before any JAX calls...'))."""
    import jax

    from dualvar_tpu.core import mesh

    jax.devices()  # ensure the backend is live, matching the crash setup
    for v in ("localhost", "127.0.0.1", "some-tpu-worker-0"):
        monkeypatch.setenv("TPU_WORKER_HOSTNAMES", v)
        mesh.init_distributed()  # must be a no-op, not raise
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("SLURM_STEP_NODELIST", "compute-node-7")
    mesh.init_distributed()  # single SLURM node: also a no-op


def test_init_distributed_multi_hostlist_with_live_backend_warns(monkeypatch):
    """A genuine >1-host auto-detect hint, but the XLA backend is already
    initialized in-process (pytest / library use): continue single-host
    with a logged warning rather than crashing (no explicit coordinator
    was requested)."""
    import jax

    from dualvar_tpu.core import mesh

    jax.devices()
    for k in mesh._EXPLICIT_COORD_VARS:
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "worker-0,worker-1")
    mesh.init_distributed()  # must not raise


def test_hostlist_classifier():
    from dualvar_tpu.core.mesh import _names_multiple_hosts

    assert not _names_multiple_hosts("")
    assert not _names_multiple_hosts("localhost")
    assert not _names_multiple_hosts("WARNING: could not determine hosts")
    assert not _names_multiple_hosts("host-a")
    assert _names_multiple_hosts("host-a,host-b")
    assert _names_multiple_hosts("node[01-04]")
