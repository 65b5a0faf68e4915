"""Per-objective v5e throughput: the full PRODUCTION train step per SSL family.

BENCH_BACKBONES.json covers every backbone under the plain 2-view SimCLR
objective; the flagship record covers SimCLR TimeSeriesV4 on r21d via a
hand-rolled step (scripts/round4_measure.sh). This script completes the
hardware record across the OBJECTIVES — including both MoCo families, which
had no on-device number at all — and does it through the production
``make_train_step`` (dualvar_tpu/train/pretrain.py:134), so the measured
program is exactly what ``python -m dualvar_tpu.train.pretrain`` runs:
uint8 batch -> fused on-device aug -> task forward (all views, EMA key
encoder, queue enqueue, SR re-encode, TC series losses as configured) ->
backward -> SGD.

Units (reference configs):
  simclr_tsv4_r21d  paper_table1_k400   (simclr.py:130, 3 views + SR re-encode)
  moco_tsv4_r21d    paper_table2_moco_r21d, K=16384 (moco.py:242)
  simclr_tsv4_r3d   DualVar objective on the bench backbone
  moco_naked_r3d    MoCo-v2-style baseline (moco.py:28), K=16384

Timing methodology as everywhere in this repo (scripts/_timing.py): chained
donated steps, one float() barrier, best-of-3 chains, median-of-3 RTT
subtracted. clips/s counts encoded views (B * n_views / step) to stay
comparable with the flagship rows. MFU from XLA's cost analysis against the
v5e bf16 peak. Writes/merges BENCH_OBJECTIVES.json incrementally per unit.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# _sweep_merge lives next to this file; the repo-root insert above does not
# cover it when these modules are imported from elsewhere (ADVICE r4)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dualvar_tpu.aug.pipeline import AugConfig
from dualvar_tpu.core.config import ModelConfig, PRETRAIN_PRESETS
from dualvar_tpu.train.pretrain import TrainState, make_optimizer, make_train_step
from dualvar_tpu.train.tasks import make_task

V5E_BF16_PEAK = 197e12
# --smoke: tiny shapes + tiny queue on whatever backend is present, to
# rehearse the full script logic (compile, donation, cost analysis, merge)
# without a TPU — used by tests/test_bench_scripts.py
SMOKE = "--smoke" in sys.argv
if SMOKE:
    sys.argv.remove("--smoke")
    T, H0, W0, IMG = 4, 40, 36, 32
else:
    T, H0, W0, IMG = 16, 171, 128, 112

# unit -> (ModelConfig, batch candidates largest-first)
UNITS: dict[str, tuple[ModelConfig, tuple[int, ...]]] = {
    "simclr_tsv4_r21d": (
        PRETRAIN_PRESETS["paper_table1_k400"].model, (32, 16)),
    "moco_tsv4_r21d": (
        PRETRAIN_PRESETS["paper_table2_moco_r21d"].model, (32, 16)),
    "simclr_tsv4_r3d": (
        dataclasses.replace(PRETRAIN_PRESETS["paper_table1_k400"].model,
                            net="r3d"), (64, 32)),
    "moco_naked_r3d": (
        ModelConfig(net="r3d", model="moco_naked", moco_k=16384), (128, 64)),
    # packed_encode=True variants (round-4 VERDICT #4): SR pass merged into
    # the main encode batch — the perf-mode configuration (documented BN
    # divergence, core/config.py ModelConfig.packed_encode)
    "simclr_tsv4_r21d_packed": (
        dataclasses.replace(PRETRAIN_PRESETS["paper_table1_k400"].model,
                            packed_encode=True), (32, 16)),
    "moco_tsv4_r21d_packed": (
        dataclasses.replace(PRETRAIN_PRESETS["paper_table2_moco_r21d"].model,
                            packed_encode=True), (32, 16)),
    # full perf mode: packed SR encode + the tile-aligned r21d variant
    # (both documented non-parity levers) — the fastest honest flagship
    # configuration
    "simclr_tsv4_r21d_tiled_packed": (
        dataclasses.replace(PRETRAIN_PRESETS["paper_table1_k400"].model,
                            net="r21d_tiled", packed_encode=True), (32, 16)),
    "moco_tsv4_r21d_tiled_packed": (
        dataclasses.replace(PRETRAIN_PRESETS["paper_table2_moco_r21d"].model,
                            net="r21d_tiled", packed_encode=True), (32, 16)),
}
if SMOKE:
    UNITS = {name: (dataclasses.replace(cfg, moco_k=8, dtype="float32"), (2,))
             for name, (cfg, _) in UNITS.items()}


def bench_unit(name: str, n_steps: int = 20, chains: int = 3):
    model_cfg, candidates = UNITS[name]
    aug_cfg = AugConfig(img_dim=IMG, seq_len=T, fused="auto",
                        jitter_order="sample")
    task = make_task(model_cfg)
    cfg = PRETRAIN_PRESETS["paper_table1_k400"]  # optim recipe is shared
    tx, _ = make_optimizer(cfg, steps_per_epoch=100)
    rng = jax.random.PRNGKey(0)

    step = jax.jit(make_train_step(task, tx, aug_cfg), donate_argnums=(0,))

    state = None
    B = None
    for cand in candidates:
        is_moco = model_cfg.model.startswith("moco")
        if is_moco and model_cfg.moco_k % cand:
            print(f"  {name}: skip B={cand} (K={model_cfg.moco_k} not "
                  "divisible)", flush=True)
            continue
        example = jnp.zeros((1, task.n_views, T, IMG, IMG, 3), jnp.float32)
        tstate = task.init(rng, example)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=tstate.params,
            batch_stats=tstate.batch_stats, moco=tstate.moco,
            opt_state=tx.init(tstate.params),
        )
        frames = jax.device_put(np.random.default_rng(0).integers(
            0, 255, (cand, task.n_views * T, H0, W0, 3), dtype=np.uint8))
        try:
            t0 = time.perf_counter()
            state, metrics = step(state, frames, jax.random.PRNGKey(1))
            warm = float(metrics["total_loss"])
            print(f"  {name}: compiled B={cand} in "
                  f"{time.perf_counter() - t0:.0f}s (warmup loss {warm:.3f})",
                  flush=True)
            B = cand
            break
        except Exception as e:
            print(f"  {name}: B={cand} failed "
                  f"({type(e).__name__}: {str(e)[:160]}); falling back",
                  flush=True)
    if B is None:
        return {"name": name, "error": "all batch candidates failed"}

    try:
        abstract = lambda tree: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)
        cost = step.lower(
            abstract(state),
            jax.ShapeDtypeStruct((B, task.n_views * T, H0, W0, 3), jnp.uint8),
            jax.random.PRNGKey(3)).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception as e:
        print(f"  {name}: cost_analysis failed: {e}", flush=True)
        step_flops = 0.0

    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, i].astype(jnp.float32)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    key = jax.random.PRNGKey(2)
    dts = []
    for c in range(chains):
        t0 = time.perf_counter()
        for i in range(n_steps):
            state, metrics = step(state, frames,
                                  jax.random.fold_in(key, c * 100 + i))
        final = float(metrics["total_loss"])
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    per = min(dts) / n_steps
    clips = B * task.n_views / per
    mfu = step_flops / per / V5E_BF16_PEAK if step_flops else None
    rec = {
        "name": name, "net": name, "model": model_cfg.model,
        "backbone": model_cfg.net, "n_views": task.n_views,
        "moco_k": (model_cfg.moco_k
                   if model_cfg.model.startswith("moco") else None),
        "batch": B, "ms_per_step": round(per * 1e3, 1),
        "clips_per_sec": round(clips, 1),
        "samples_per_sec": round(B / per, 1),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "mfu_pct": round(mfu * 100, 1) if mfu is not None else None,
        "chains_ms": [round(d / n_steps * 1e3, 1) for d in dts],
        "final_loss": round(final, 3),
    }
    print(f"{name}: B={B} {per * 1e3:.1f} ms/step, {clips:.0f} clips/s "
          f"({B / per:.0f} samples/s), MFU {rec['mfu_pct']}% "
          f"(chains {rec['chains_ms']}, rtt {rtt * 1e3:.0f} ms)", flush=True)
    return rec


def _merge_result(path: str, rec: dict):
    """Land-as-measured, best-row merge (scripts/_sweep_merge.py)."""
    from _sweep_merge import merge_result
    merge_result(path, rec,
                 {"shape": f"16x{IMG}^2, fused aug, bf16, "
                           "production train step",
                  "device": jax.devices()[0].device_kind, "results": []},
                 list(UNITS), key="name")


def main():
    units = sys.argv[1:] or list(UNITS)
    # --smoke rehearsals write to the cwd so they can never clobber the
    # repo-root hardware record
    path = (os.path.abspath("BENCH_OBJECTIVES.json") if SMOKE
            else os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_OBJECTIVES.json"))
    out = []
    for name in units:
        try:
            rec = bench_unit(name)
        except Exception as e:
            rec = {"name": name,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{name}: FAILED {e}", flush=True)
        out.append(rec)
        _merge_result(path, rec)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
