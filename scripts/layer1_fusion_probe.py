"""Layer1 fusion-ceiling attempt #2 (round-4 VERDICT #2): A/B the opaque
Pallas BN-stat boundary (ops/bn_stats.py) against the fused-XLA stat path
on the EXACT flagship program — R3D-18 SimCLR full train step, B=128,
16x112^2 bf16 (bench.py's metric).

Hypothesis being tested: the in-model convs run at 94-135 TF/s inside
XLA's conv+stat mega-fusions vs 171-190 isolated (PARITY.md round-2
ceiling analysis); making the stat reductions opaque custom calls denies
XLA that fusion and lets the convs schedule as if isolated, at the cost of
one extra HBM read of each conv output.

Also verifies the kernel's numerics on hardware (stats vs XLA oracle on
the layer1 tensor shape) before timing. Prints one JSON line; does NOT
write any repo artifact (record the outcome in PARITY.md by hand).

Usage: python scripts/layer1_fusion_probe.py [--batch N]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dualvar_tpu.aug.pipeline import AugConfig
import dualvar_tpu.aug.pipeline as P
from dualvar_tpu.models.ssl.simclr import SimCLRNaked
from dualvar_tpu.train.tasks import total_loss

T, H0, W0, IMG = 16, 171, 128, 112


def kernel_check() -> dict:
    """Exactness of channel_sums vs the XLA reduction on the layer1 tensor
    shape, on the real backend."""
    from dualvar_tpu.ops.bn_stats import channel_sums

    y = jax.random.normal(jax.random.PRNGKey(0), (8, 16, 56, 56, 64),
                          jnp.bfloat16)
    s1, s2 = jax.jit(lambda a: channel_sums(a, a))(y)
    o1 = jnp.sum(y, axis=(0, 1, 2, 3), dtype=jnp.float32)
    o2 = jnp.sum(jax.lax.square(y.astype(jnp.float32)), axis=(0, 1, 2, 3))
    e1 = float(jnp.max(jnp.abs(s1 - o1) / (jnp.abs(o1) + 1.0)))
    e2 = float(jnp.max(jnp.abs(s2 - o2) / (jnp.abs(o2) + 1.0)))
    return {"rel_err_s1": e1, "rel_err_s2": e2, "ok": e1 < 1e-3 and e2 < 1e-3}


def measure_step(B: int, mode: str, n_steps=20, chains=3) -> dict:
    """Full production-style train step with DUALVAR_BN_STATS=mode."""
    os.environ["DUALVAR_BN_STATS"] = mode
    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    aug_cfg = AugConfig(img_dim=IMG, seq_len=T, fused="auto",
                        jitter_order="sample")
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((1, 2, T, IMG, IMG, 3), jnp.float32)
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

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, 2 * T, H0, W0, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, frames, key)
    warm = float(loss)
    compile_s = time.perf_counter() - t0

    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, i].astype(jnp.float32)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    dts = []
    for c in range(chains):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, frames,
                jax.random.fold_in(key, 100 + c * n_steps + i))
        final = float(loss)
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    per = min(dts) / n_steps
    return {"mode": mode, "ms_per_step": round(per * 1e3, 1),
            "clips_per_sec": round(B * 2 / per, 1),
            "chains_ms": [round(d / n_steps * 1e3, 1) for d in dts],
            "final_loss": round(final, 3),
            "compile_s": round(compile_s, 1), "warmup_loss": round(warm, 3)}


def main():
    B = 128
    if "--batch" in sys.argv:
        B = int(sys.argv[sys.argv.index("--batch") + 1])
    out = {"batch": B, "backend": jax.default_backend()}
    out["kernel_check"] = kernel_check()
    print("kernel check:", out["kernel_check"], file=sys.stderr, flush=True)
    if not out["kernel_check"]["ok"]:
        print(json.dumps(out))
        return
    for mode in ("xla", "pallas"):
        out[mode] = measure_step(B, mode)
        print(mode, out[mode], file=sys.stderr, flush=True)
    sp = out["pallas"]["ms_per_step"] / out["xla"]["ms_per_step"]
    out["pallas_vs_xla"] = round(sp, 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
