"""MoCo production-step soak: sustained MoCo_TimeSeriesV4 pretraining on the
real chip, proving the stateful machinery a long MoCo run depends on.

The SimCLR soak (scripts/soak.py, SOAK_r04.json) pins throughput stability
and resume determinism for the stateless objective. MoCo adds the three
mutations the reference threads through training (model/moco.py:103-126):
the EMA key encoder, the K=16384 ring-buffer queue, and the queue pointer.
This soak runs the PRODUCTION ``make_train_step`` (the exact program
``python -m dualvar_tpu.train.pretrain --preset paper_table2_moco_r21d``
runs) long enough for the queue to wrap several times and checks:

  * every chain's loss is finite over the whole run;
  * the queue pointer lands exactly where step-count arithmetic says it
    must (ptr = steps*B mod K) — the ring update is deterministic;
  * queue rows stay unit-norm (enqueued keys are l2-normalised,
    moco.py:120) and the EMA tree stays finite;
  * a mid-run orbax checkpoint of the FULL TrainState (params, BN stats,
    MoCoState, opt state) restores to a bitwise-identical 3-step replay,
    twice — resume cannot fork a MoCo trajectory.

Prints one JSON line; merges into SOAK_MOCO_r04.json when run at the repo
root. Usage: python scripts/moco_soak.py [--minutes 6] [--b 32] [--chain 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dualvar_tpu.aug.pipeline import AugConfig
from dualvar_tpu.core.checkpoint import CheckpointStore
from dualvar_tpu.core.config import PRETRAIN_PRESETS
from dualvar_tpu.train.pretrain import TrainState, make_optimizer, make_train_step
from dualvar_tpu.train.tasks import make_task


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=6.0)
    p.add_argument("--b", type=int, default=32)
    p.add_argument("--chain", type=int, default=10)
    p.add_argument("--smoke", action="store_true",
                   help="tiny shapes/queue on any backend (CI rehearsal)")
    args = p.parse_args()

    cfg = PRETRAIN_PRESETS["paper_table2_moco_r21d"]
    model_cfg = cfg.model
    if args.smoke:
        import dataclasses

        model_cfg = dataclasses.replace(model_cfg, net="r3d", moco_k=16,
                                        dtype="float32")
        args.b, args.minutes, args.chain = 4, 0.2, 2
        T, H0, W0, IMG = 4, 40, 36, 32
    else:
        T, H0, W0, IMG = 16, 171, 128, 112
    B, K = args.b, model_cfg.moco_k
    assert K % B == 0, "ring update needs K % B == 0 (moco.py:119)"

    task = make_task(model_cfg)
    aug_cfg = AugConfig(img_dim=IMG, seq_len=T, fused="auto",
                        jitter_order="sample")
    tx, _ = make_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(0)

    step = jax.jit(make_train_step(task, tx, aug_cfg), donate_argnums=(0,))
    step_keep = jax.jit(make_train_step(task, tx, aug_cfg))  # for replays

    example = jnp.zeros((1, task.n_views, T, IMG, IMG, 3), jnp.float32)
    tstate = task.init(rng, example)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=tstate.params,
                       batch_stats=tstate.batch_stats, moco=tstate.moco,
                       opt_state=tx.init(tstate.params))
    ptr0 = int(state.moco.ptr)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, task.n_views * T, H0, W0, 3), dtype=np.uint8))

    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, metrics = step(state, frames, jax.random.fold_in(key, 0))
    first_loss = float(metrics["total_loss"])
    print(f"[moco-soak] compiled in {time.perf_counter() - t0:.1f}s; "
          f"warmup loss {first_loss:.4f}", flush=True)

    ckpt_dir = os.environ.get("SOAK_CKPT_DIR", "/tmp/dualvar_moco_soak_ckpt")
    shutil.rmtree(ckpt_dir, ignore_errors=True)
    store = CheckpointStore(ckpt_dir, async_save=True)
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)

    t_start = time.perf_counter()
    halfway = t_start + args.minutes * 30.0
    deadline = t_start + args.minutes * 60.0
    chain_rates, chain_losses = [], []
    gstep = 1
    saved_at = saved_tag = None
    while time.perf_counter() < deadline:
        tc = time.perf_counter()
        for _ in range(args.chain):
            state, metrics = step(state, frames, jax.random.fold_in(key, gstep))
            gstep += 1
        chain_loss = float(metrics["total_loss"])  # host barrier
        dt = time.perf_counter() - tc
        chain_rates.append(B * task.n_views * args.chain / dt)
        chain_losses.append(chain_loss)
        if not np.isfinite(chain_loss):
            print(json.dumps({"error": f"non-finite loss at step {gstep}"}))
            return 1
        if saved_at is None and time.perf_counter() > halfway:
            ts = time.perf_counter()
            store.save(0, state)
            saved_at = gstep
            saved_tag = time.perf_counter() - ts
            print(f"[moco-soak] full-TrainState checkpoint at step {gstep} "
                  f"({saved_tag:.1f}s enqueue)", flush=True)
        print(f"[moco-soak] step {gstep}: {chain_rates[-1]:.1f} clips/s, "
              f"loss {chain_loss:.4f}", flush=True)

    # ring-buffer arithmetic: the pointer's position is fully determined by
    # the step count (reference moco.py:119-126)
    steps_done = gstep  # includes warmup step
    ptr = int(state.moco.ptr)
    ptr_expected = (ptr0 + steps_done * B) % K
    wraps = (ptr0 + steps_done * B) // K
    queue_norms = np.linalg.norm(np.asarray(state.moco.queue), axis=1)
    ema_finite = bool(jax.tree_util.tree_all(jax.tree.map(
        lambda x: bool(jnp.isfinite(x).all()), state.moco.params_k)))

    # resume determinism with the FULL MoCo state: two independent restores
    # must replay an identical 3-step trajectory bitwise
    resume_ok = None
    if saved_at is not None:
        replays = []
        for _ in range(2):
            st = store.restore(0, template=template)
            ls, ptrs = [], []
            for i in range(3):
                st, m = step_keep(st, frames, jax.random.fold_in(key, saved_at + i))
                ls.append(float(m["total_loss"]))
                ptrs.append(int(st.moco.ptr))
            replays.append((ls, ptrs))
        resume_ok = replays[0] == replays[1]
        print(f"[moco-soak] replay losses+ptrs: {replays[0]} vs {replays[1]}",
              flush=True)

    rates = np.array(chain_rates) if chain_rates else np.array([0.0])
    record = {
        "metric": "MoCo TimeSeriesV4 soak (production train step, r21d, "
                  f"K={K})",
        "unit": "clips/s/chip",
        "value": round(float(rates.mean()), 1),
        "minutes": args.minutes,
        "batch_size": B,
        "steps": steps_done,
        "queue_wraps": wraps,
        "ptr_expected": ptr_expected,
        "ptr_actual": ptr,
        "ptr_ok": ptr == ptr_expected,
        "queue_norm_max_dev": round(float(np.abs(queue_norms - 1.0).max()), 6),
        "ema_finite": ema_finite,
        "best_chain": round(float(rates.max()), 1),
        "worst_chain": round(float(rates.min()), 1),
        "first_loss": round(first_loss, 4),
        "last_loss": round(chain_losses[-1], 4) if chain_losses else None,
        "ckpt_save_enqueue_s": round(saved_tag, 3) if saved_tag else None,
        "resume_deterministic": resume_ok,
        "backend": jax.default_backend(),
    }
    print(json.dumps(record), flush=True)
    if os.path.isdir("scripts") and not args.smoke:
        with open("SOAK_MOCO_r04.json", "w") as f:
            json.dump(record, f, indent=1)
    ok = record["ptr_ok"] and ema_finite and (resume_ok in (None, True))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
