"""End-to-end CLI chain rehearsal: pretrain -> finetune -> temporal-10-clip
test -> retrieval, each stage consuming the previous stage's artifacts
through the real argv surface.

This is the reference's run-mode chain (paper_scripts/*/run/*.sh:8-21:
pretrain.py -> classifier.py --pretrain <ckpt> -> --test with the produced
checkpoint -> test_retrieval) on synthetic data at tiny shapes. Each stage
is a fresh subprocess so the argparse -> preset-override -> driver ->
checkpoint-store wiring is exercised exactly as a user would drive it.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TINY = ["--seq_len", "4", "--img_dim", "32", "--batch_size", "4",
        "--epochs", "1", "--max_steps", "2", "--print_freq", "1"]


def _run(tmp_path, module, args):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/dualvar_tpu_jax_cache"
    out = subprocess.run(
        [sys.executable, "-m", module, *args],
        capture_output=True, text=True, timeout=560, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, (module, out.stdout[-3000:] + out.stderr[-3000:])
    return out.stdout + out.stderr


def test_full_chain_through_cli(tmp_path):
    # stage 1: DualVar pretrain (SimCLR TimeSeriesV4, synthetic data)
    log = _run(tmp_path, "dualvar_tpu.train.pretrain",
               ["--preset", "smoke_dualvar"] + TINY)
    assert "saved checkpoint" in log
    pre_ckpt = tmp_path / "log" / "smoke_dualvar" / "pretrain" / "exp" / "model"
    assert pre_ckpt.is_dir(), log[-2000:]

    # stage 2: finetune consuming the pretrain checkpoint via --pretrain
    log = _run(tmp_path, "dualvar_tpu.train.classifier",
               ["--preset", "smoke", "--train_what", "ft",
                "--eval_freq", "1", "--pretrain", str(pre_ckpt)] + TINY)
    assert "loaded pretrained checkpoint" in log, log[-2000:]
    assert "Acc@1" in log
    clf_ckpt = tmp_path / "log" / "smoke" / "ft" / "exp" / "ucf" / "model"
    assert clf_ckpt.is_dir(), log[-2000:]

    # stage 3: temporal-10-clip protocol from the finetuned checkpoint
    log = _run(tmp_path, "dualvar_tpu.train.classifier",
               ["--preset", "smoke", "--test", "temporal_ten_clip",
                "--seq_len", "4", "--img_dim", "32", "--batch_size", "4",
                "--resume", str(clf_ckpt)])
    assert "loaded test checkpoint" in log, log[-2000:]
    assert "random init" not in log

    # stage 4: k-NN retrieval directly from the pretrain checkpoint
    # (reference classifier.py:303-305 retrieval from args.pretrain)
    log = _run(tmp_path, "dualvar_tpu.train.classifier",
               ["--preset", "smoke", "--test", "retrieval",
                "--seq_len", "4", "--img_dim", "32", "--batch_size", "4",
                "--pretrain", str(pre_ckpt)])
    assert "random init" not in log
    assert "R@1" in log or "r@1" in log.lower(), log[-2000:]
