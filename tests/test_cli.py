"""CLI surface smoke: the `python -m dualvar_tpu.train.*` entry points with
reference-style flags (the exact invocation shape of the paper scripts,
scripts/paper/*.sh). Runs in a subprocess with the CPU platform so the
argparse -> dataclass-override -> driver wiring is pinned end to end."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tmp_path, module, args):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/dualvar_tpu_jax_cache"
    out = subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True, text=True, timeout=540, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    return out


def test_pretrain_cli(tmp_path):
    out = _run(tmp_path, "dualvar_tpu.train.pretrain", [
        "--preset", "smoke",
        "--net", "r3d", "--seq_len", "4", "--img_dim", "32",
        "--batch_size", "4", "--epochs", "1", "--max_steps", "2",
        "--print_freq", "1", "--lr", "0.003",
    ])
    log = out.stdout + out.stderr
    assert "total_loss" in log or "loss" in log.lower()
    # checkpoint tree landed under cwd/log (RunConfig.log_root default)
    assert (tmp_path / "log").exists()


def test_classifier_cli(tmp_path):
    out = _run(tmp_path, "dualvar_tpu.train.classifier", [
        "--preset", "smoke",
        "--net", "r3d", "--train_what", "ft", "--seq_len", "4",
        "--img_dim", "32", "--batch_size", "4", "--epochs", "1",
        "--max_steps", "2", "--print_freq", "1", "--eval_freq", "1",
    ])
    log = out.stdout + out.stderr
    assert "Acc@1" in log or "val" in log.lower()
    assert (tmp_path / "log").exists()
