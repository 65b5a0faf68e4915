"""Two-process eval-protocol equivalence check (round-3 VERDICT #7).

The record-level dedupe / idempotent-overwrite accumulation in
train/classifier.py (test_multicrop :455-523, test_temporal_tenclip
:526-570) is the most intricate multi-host code in the repo: (video,
window) records are sharded by process with wraparound padding that can
land a duplicate record on a *different* host, and the cross-host combine
must divide by how many hosts saw each record (reference protocol:
classifier.py:545-738, which the reference only ever ran single-GPU for
tests).

This script runs BOTH protocols — 10-crop (center ⊂ five ⊂ ten with the
flip passes) and temporal-10-clip — single-process first, then under 2
jax.distributed processes, and asserts the outputs are IDENTICAL
(atol 1e-9 on every accuracy; classwise dicts equal).

Ordering note: the single-process oracle runs FIRST so the persistent
compile cache is warm with the 11 forward programs before the 2-process
phase — on a 1-core rig, cold per-process compiles skew the workers by
minutes and the first cross-process collective then dies in gloo's 30s
context-init rendezvous. Explicit sync barriers between phases bound the
remaining skew.

Usage: python scripts/multihost_eval_check.py            # spawns everything
       python scripts/multihost_eval_check.py worker <i>  # internal
       python scripts/multihost_eval_check.py oracle      # internal
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = 12611
RESULT_MULTI = "/tmp/mh_eval_check_multi.json"
RESULT_SINGLE = "/tmp/mh_eval_check_single.json"

SEQ, IMG, H0, W0 = 4, 32, 40, 36


def _env_setup():
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def _tiny_cfg(prefix: str):
    import dataclasses as _dc
    import tempfile

    from dualvar_tpu.core.config import CLASSIFIER_PRESETS, ModelConfig

    cfg = CLASSIFIER_PRESETS["smoke"]
    return _dc.replace(
        cfg,
        num_class=2,
        data=_dc.replace(cfg.data, seq_len=SEQ, img_dim=IMG,
                         scale_hw=(H0, W0), synthetic_videos=8,
                         synthetic_classes=2, workers=2),
        model=ModelConfig(net="r3d", dtype="float32"),
        optim=_dc.replace(cfg.optim, batch_size=4, epochs=1),
        run=_dc.replace(cfg.run,
                        log_root=tempfile.mkdtemp(prefix=prefix)),
    )


def worker(pid: int, port: int = PORT):
    jax = _env_setup()
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC

    import numpy as np
    from jax.experimental import multihost_utils

    from dualvar_tpu.train.classifier import (
        test_multicrop,
        test_temporal_tenclip,
    )

    # establish the gloo context while the processes are still aligned
    multihost_utils.sync_global_devices("mh_eval_start")
    cfg = _tiny_cfg(f"mh_eval_p{pid}_")
    mc = test_multicrop(cfg, "ten")
    multihost_utils.sync_global_devices("mh_eval_mid")
    tt = test_temporal_tenclip(cfg)

    agree = multihost_utils.process_allgather(np.asarray(
        [mc["center_top1"], mc["five_top1"], mc["ten_top1"],
         mc["ten_top5"], tt["top1"], tt["top5"]], np.float64))
    assert np.allclose(agree, agree[0]), agree
    if pid == 0:
        with open(RESULT_MULTI, "w") as f:
            json.dump({"multicrop": mc, "tenclip": tt}, f)
    print(f"[proc {pid}] eval protocols ok: multicrop ten_top1 "
          f"{mc['ten_top1']:.4f}, tenclip top1 {tt['top1']:.4f}", flush=True)
    multihost_utils.sync_global_devices("mh_eval_done")


def oracle():
    _env_setup()
    from dualvar_tpu.train.classifier import (
        test_multicrop,
        test_temporal_tenclip,
    )

    cfg = _tiny_cfg("mh_eval_single_")
    mc = test_multicrop(cfg, "ten")
    tt = test_temporal_tenclip(cfg)
    with open(RESULT_SINGLE, "w") as f:
        json.dump({"multicrop": mc, "tenclip": tt}, f)
    print(f"[oracle] multicrop {mc['ten_top1']:.4f}/{mc['ten_top5']:.4f}, "
          f"tenclip {tt['top1']:.4f}/{tt['top5']:.4f}", flush=True)


def _compare():
    import numpy as np

    with open(RESULT_SINGLE) as f:
        single = json.load(f)
    with open(RESULT_MULTI) as f:
        multi = json.load(f)
    for k in ("center_top1", "center_top5", "five_top1", "five_top5",
              "ten_top1", "ten_top5", "top1", "top5"):
        assert np.isclose(single["multicrop"][k], multi["multicrop"][k],
                          atol=1e-9), (
            "multicrop", k, single["multicrop"], multi["multicrop"])
    for k in ("top1", "top5"):
        assert np.isclose(single["tenclip"][k], multi["tenclip"][k],
                          atol=1e-9), (
            "tenclip", k, single["tenclip"], multi["tenclip"])
    s_cw = {int(k): v for k, v in single["tenclip"]["classwise"].items()}
    m_cw = {int(k): v for k, v in multi["tenclip"]["classwise"].items()}
    assert s_cw == m_cw, (s_cw, m_cw)
    print("eval protocols: 2-process == single-process "
          f"(multicrop ten {multi['multicrop']['ten_top1']:.4f}, "
          f"tenclip {multi['tenclip']['top1']:.4f})", flush=True)


def main():
    from _mh_launch import run_workers

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # skip the axon relay for CPU workers

    def _clear_results():
        for f in (RESULT_MULTI,):
            if os.path.exists(f):
                os.remove(f)

    if os.path.exists(RESULT_SINGLE):
        os.remove(RESULT_SINGLE)
    # oracle FIRST: warms the shared compile cache (see module docstring)
    out = subprocess.run(
        [sys.executable, "-u", __file__, "oracle"], env=env, timeout=1200)
    assert out.returncode == 0
    run_workers(__file__, N_PROC, PORT, per_attempt_timeout=900, env=env,
                pre_attempt=_clear_results)
    _compare()
    print("multihost eval check PASSED")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]),
               int(sys.argv[3]) if len(sys.argv) > 3 else PORT)
    elif len(sys.argv) > 1 and sys.argv[1] == "oracle":
        oracle()
    else:
        main()
