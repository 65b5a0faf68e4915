"""Round-3 VERDICT #8: one bounded attempt at the mega-fusion drag.

Hypothesis: chunking the encoder pass over the (2B, T, H, W, C) view-batch
into c sequential microbatches shrinks the 1.6 GB layer1 feature maps by c
and may change the residual-block mega-fusion forms XLA picks (PARITY.md
round-2: in-model layer1 convs run 94-135 TF/s vs 171-190 isolated; every
compiler-option lever measured to a dead end in round 3).

Measures the full R3D SimCLR train step (bench.py shape: B=128, 2 views,
16x112^2, bf16, fused aug) with the encode chunked c in {1, 2, 4}:

  * c == 1 is the bench baseline (one fused graph).
  * c > 1 loops the encoder in Python (c sequential subgraphs under one
    jit); the NT-Xent still sees the full 2B embedding set, so gradients
    flow through all chunks and FLOPs are unchanged. BN batch statistics
    are computed per chunk (ghost-BN) — a numerics change, acceptable for
    a bounded perf probe; if a chunked form wins >5%, a stats-exact
    variant (two-pass or cross-chunk pmean) is the follow-up.

Per VERDICT #8: timebox, record the numbers in PARITY.md, and if <5%
lands, declare the ~810-830 clips/s bound final.

Usage (TPU): python scripts/microbatch_encode.py [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--B", type=int, default=128)
    ap.add_argument("--chunks", type=int, nargs="*", default=[1, 2, 4])
    # small-shape CPU smoke: --B 4 --T 4 --img 32 --steps 2
    ap.add_argument("--T", type=int, default=16)
    ap.add_argument("--img", type=int, default=112)
    args = ap.parse_args()

    from dualvar_tpu.aug.pipeline import AugConfig
    from dualvar_tpu.models.ssl.losses import nt_xent_loss
    from dualvar_tpu.models.ssl.simclr import SimCLRNaked
    import dualvar_tpu.aug.pipeline as P

    B, T, img = args.B, args.T, args.img
    H0, W0 = (171, 128) if img == 112 else (img + 8, img + 4)
    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    aug_cfg = AugConfig(img_dim=img, seq_len=T, fused="auto",
                        jitter_order="sample")

    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((B, 2, T, img, img, 3), jnp.float32)
    variables = model.init({"params": rng}, example, train=True)
    params0 = variables["params"]
    bs0 = variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))

    frames = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (B, 2 * T, H0, W0, 3),
                                          dtype=np.uint8))

    def make_step(c: int):
        def train_step(params, batch_stats, opt_state, frames_u8, key):
            block = P.pretrain_batch(key, frames_u8, aug_cfg)

            def loss_fn(p):
                if c == 1:
                    ret, upd = model.apply(
                        {"params": p, "batch_stats": batch_stats}, block,
                        train=True, mutable=["batch_stats"])
                    return ret["clip_contrast_loss"], upd["batch_stats"]
                x = block.reshape(B * 2, *block.shape[2:])
                n = (B * 2) // c
                embs, new_bs = [], batch_stats
                for i in range(c):
                    emb, upd = model.apply(
                        {"params": p, "batch_stats": new_bs},
                        x[i * n:(i + 1) * n], True,
                        method=SimCLRNaked.encode, mutable=["batch_stats"])
                    embs.append(emb)
                    new_bs = upd["batch_stats"]
                emb = jnp.concatenate(embs, 0).reshape(B, 2, -1)
                ret = nt_xent_loss(emb, model.temperature, "clip_")
                return ret["clip_contrast_loss"], new_bs

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            updates, new_opt = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_bs, new_opt, loss

        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    # one RTT measure for the relay barrier correction (bench.py pattern)
    _ = float(jnp.sum(frames[:1, 0, 0, 0].astype(jnp.float32)))
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, 1].astype(jnp.float32)) + i)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    key = jax.random.PRNGKey(1)
    results = {}
    for c in args.chunks:
        step = make_step(c)
        params, bs = jax.tree.map(jnp.copy, params0), jax.tree.map(
            jnp.copy, bs0)
        opt_state = tx.init(params)
        params, bs, opt_state, loss = step(params, bs, opt_state, frames, key)
        log(f"c={c}: compiled, warmup loss {float(loss):.4f}")
        dts = []
        for chain in range(3):
            t0 = time.perf_counter()
            for i in range(args.steps):
                params, bs, opt_state, loss = step(
                    params, bs, opt_state, frames,
                    jax.random.fold_in(key, 100 + chain * args.steps + i))
            _ = float(loss)
            dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
        ms = min(dts) / args.steps * 1e3
        results[c] = ms
        log(f"c={c}: {ms:.1f} ms/step "
            f"({B * 2 * 1e3 / ms:.0f} clips/s), all chains "
            f"{[f'{d / args.steps * 1e3:.1f}' for d in dts]}")

    base = results.get(1)
    for c, ms in results.items():
        rel = f" ({(base - ms) / base:+.1%} vs c=1)" if base and c != 1 else ""
        print(f"chunks={c}: {ms:.1f} ms/step{rel}")


if __name__ == "__main__":
    main()
