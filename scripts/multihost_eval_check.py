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
flip passes) and temporal-10-clip — under 2 jax.distributed processes and
again single-process, and asserts the outputs are IDENTICAL (atol 1e-9 on
every accuracy; classwise dicts equal). Split out of multihost_smoke.py so
each script stays inside its timeout envelope on a 1-core rig.

Usage: python scripts/multihost_eval_check.py            # spawns everything
       python scripts/multihost_eval_check.py worker <i>  # internal
       python scripts/multihost_eval_check.py oracle      # internal
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = 12611
RESULT = "/tmp/mh_eval_check.json"

SEQ, IMG, H0, W0 = 4, 32, 40, 36


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


def _run_protocols(tag: str):
    from dualvar_tpu.train.classifier import (
        test_multicrop,
        test_temporal_tenclip,
    )

    cfg = _tiny_cfg(f"mh_eval_{tag}_")
    mc = test_multicrop(cfg, "ten")
    tt = test_temporal_tenclip(cfg)
    return mc, tt


def worker(pid: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC

    import json

    import numpy as np
    from jax.experimental import multihost_utils

    mc, tt = _run_protocols(f"p{pid}")

    # every process must report the same numbers (the gathers agree)
    agree = multihost_utils.process_allgather(np.asarray(
        [mc["center_top1"], mc["five_top1"], mc["ten_top1"],
         mc["ten_top5"], tt["top1"], tt["top5"]], np.float64))
    assert np.allclose(agree, agree[0]), agree
    if pid == 0:
        with open(RESULT, "w") as f:
            json.dump({"multicrop": mc, "tenclip": tt}, f)
    print(f"[proc {pid}] eval protocols ok: multicrop ten_top1 "
          f"{mc['ten_top1']:.4f}, tenclip top1 {tt['top1']:.4f}", flush=True)


def oracle():
    """Single-process run of the identical protocols; must match the
    2-process result exactly."""
    import json

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
    import numpy as np

    mc, tt = _run_protocols("single")
    with open(RESULT) as f:
        multi = json.load(f)

    for k in ("center_top1", "center_top5", "five_top1", "five_top5",
              "ten_top1", "ten_top5", "top1", "top5"):
        assert np.isclose(mc[k], multi["multicrop"][k], atol=1e-9), (
            "multicrop", k, mc, multi["multicrop"])
    for k in ("top1", "top5"):
        assert np.isclose(tt[k], multi["tenclip"][k], atol=1e-9), (
            "tenclip", k, tt, multi["tenclip"])
    single_cw = {int(k): v for k, v in tt["classwise"].items()}
    multi_cw = {int(k): v for k, v in multi["tenclip"]["classwise"].items()}
    assert single_cw == multi_cw, (single_cw, multi_cw)
    print(f"eval protocols multi-host == single-host: "
          f"multicrop {mc['ten_top1']:.4f}/{mc['ten_top5']:.4f}, "
          f"tenclip {tt['top1']:.4f}/{tt['top5']:.4f}", flush=True)


def main():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # skip the axon relay for CPU workers
    if os.path.exists(RESULT):
        os.remove(RESULT)
    procs = [
        subprocess.Popen([sys.executable, __file__, "worker", str(i)], env=env)
        for i in range(N_PROC)
    ]
    codes = [p.wait(timeout=1500) for p in procs]
    assert codes == [0] * N_PROC, codes
    out = subprocess.run(
        [sys.executable, __file__, "oracle"], env=env, timeout=900)
    assert out.returncode == 0
    print("multihost eval check PASSED")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]))
    elif len(sys.argv) > 1 and sys.argv[1] == "oracle":
        oracle()
    else:
        main()
