"""Two-process jax.distributed smoke: the real multi-host path.

Each process owns 4 virtual CPU devices (8 global), loads its own HostLoader
shard (`shard_for_process`), and runs the jitted DualVar train step over the
global 8-way data mesh with `multihost_utils.host_local_array_to_global_array`
assembling the global batch. Verifies the global loss is identical on both
processes (the collectives agree) and that per-host shards differ.

This is the TPU-native equivalent of launching torch.distributed on two
nodes (reference pretrain.py:205-218), runnable without a cluster.

Usage: python scripts/multihost_smoke.py            # spawns both processes
       python scripts/multihost_smoke.py worker <i>  # internal
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
DEV_PER_PROC = 4
PORT = 12597


def worker(pid: int, port: int = PORT):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={DEV_PER_PROC}"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * DEV_PER_PROC

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dualvar_tpu.aug.pipeline import AugConfig
    from dualvar_tpu.core.config import PRETRAIN_PRESETS
    from dualvar_tpu.core.mesh import make_mesh, replicated
    from dualvar_tpu.data.loader import (
        HostLoader,
        PretrainDataset,
        SyntheticFrameSource,
        synthetic_entries,
    )
    from dualvar_tpu.train.pretrain import TrainState, make_optimizer, make_train_step
    from dualvar_tpu.train.tasks import make_task

    SEQ, IMG, H0, W0 = 4, 32, 40, 36
    per_host_batch = 8
    global_batch = per_host_batch * N_PROC

    cfg = PRETRAIN_PRESETS["smoke_dualvar"]
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, seq_len=SEQ, img_dim=IMG,
                                 scale_hw=(H0, W0)),
        optim=dataclasses.replace(cfg.optim, batch_size=global_batch),
    )
    mesh = make_mesh()
    aug_cfg = AugConfig(img_dim=IMG, seq_len=SEQ)
    task = make_task(cfg.model)
    tx, _ = make_optimizer(cfg, steps_per_epoch=10)

    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((global_batch, 3, SEQ, IMG, IMG, 3), jnp.float32)
    t = task.init(rng, example)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=t.params,
                       batch_stats=t.batch_stats, moco=t.moco,
                       opt_state=tx.init(t.params))
    state = jax.device_put(state, replicated(mesh))

    # per-host data shard -> global array over the mesh
    entries, ci = synthetic_entries(64, 4)
    ds = PretrainDataset(entries=entries, class_index=ci,
                         source=SyntheticFrameSource((H0, W0)),
                         num_frames=SEQ, ds=2)
    loader = HostLoader(ds, per_host_batch, shuffle=True, seed=0,
                        num_workers=2, process_index=pid,
                        process_count=N_PROC)
    batch = next(iter(loader.epoch(0)))
    local_shard_sum = int(batch["frames"].astype(np.int64).sum())
    global_frames = multihost_utils.host_local_array_to_global_array(
        batch["frames"], mesh, P("data"))

    step = jax.jit(make_train_step(task, tx, aug_cfg),
                   out_shardings=(replicated(mesh), replicated(mesh)))
    state, metrics = step(state, global_frames, rng)
    losses = {k: float(v) for k, v in metrics.items() if k.endswith("loss")}
    assert all(np.isfinite(v) for v in losses.values()), losses

    # all processes must agree on the global loss; shards must differ
    agree = multihost_utils.process_allgather(
        np.asarray([losses["total_loss"]], np.float64))
    shard_sums = multihost_utils.process_allgather(
        np.asarray([local_shard_sum], np.int64))
    assert np.allclose(agree, agree[0]), agree
    assert len(set(shard_sums.flatten().tolist())) == N_PROC, shard_sums
    print(f"[proc {pid}] ok: total_loss {losses['total_loss']:.4f}, "
          f"shard sums {shard_sums.flatten().tolist()}", flush=True)

    # -- phase 2: multi-host eval protocol (k-NN retrieval) -------------
    # test_retrieval shards its loaders by process and gathers features
    # with process_allgather + vid dedupe (classifier.py _gather_concat /
    # _dedupe_by_vid) — the TPU-native replacement for the reference's
    # DistributedSampler eval sharding (classifier.py:159-236). Each
    # process sees half the videos; the gathered result must equal the
    # single-process answer (synthetic features: every video retrieves
    # itself, R@1 == 1.0) and agree across processes.
    import dataclasses as _dc
    import tempfile

    from dualvar_tpu.core.config import CLASSIFIER_PRESETS, ModelConfig
    from dualvar_tpu.train.classifier import test_retrieval

    cfg2 = CLASSIFIER_PRESETS["smoke"]
    cfg2 = _dc.replace(
        cfg2,
        num_class=2,
        data=_dc.replace(cfg2.data, seq_len=SEQ, img_dim=IMG,
                         scale_hw=(H0, W0), synthetic_videos=8,
                         synthetic_classes=2, workers=2),
        model=ModelConfig(net="r3d", dtype="float32"),
        optim=_dc.replace(cfg2.optim, batch_size=4, epochs=1),
        run=_dc.replace(cfg2.run,
                        log_root=tempfile.mkdtemp(prefix=f"mh_eval_p{pid}_")),
    )
    ret = test_retrieval(cfg2)
    assert ret["R@1"] == 1.0, ret
    agree_r = multihost_utils.process_allgather(
        np.asarray([ret["R@1"], ret["R@5"], ret["R@50"]], np.float64))
    assert np.allclose(agree_r, agree_r[0]), agree_r
    print(f"[proc {pid}] retrieval ok: {ret}", flush=True)
    # NOTE: the multicrop / temporal-10-clip multi-host-vs-single-host
    # equivalence lives in scripts/multihost_eval_check.py (split out so
    # each 2-process script stays inside its timeout envelope).


def main():
    from _mh_launch import run_workers

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # skip the axon relay for CPU workers
    # two attempts x 560s fit inside the pytest wrapper's 1200s envelope
    run_workers(__file__, N_PROC, PORT, per_attempt_timeout=560, env=env)
    print("multihost smoke PASSED")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]),
               int(sys.argv[3]) if len(sys.argv) > 3 else PORT)
    else:
        main()
