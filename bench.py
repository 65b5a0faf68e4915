"""Throughput benchmark: R3D-18 SimCLR pretrain clips/sec/chip.

Matches the driver metric (BASELINE.json): clips/sec/chip for the R3D
16x112^2 contrastive pretrain step. One full jitted train step is measured —
uint8 host batch -> on-device augmentation -> 2-view forward -> NT-Xent with
global negatives -> backward -> SGD update — i.e. everything between
dataloader and optimizer in the reference hot loop (pretrain.py:394-451).

"Clips" counts encoded 16-frame clips (2 per sample, matching the
reference's 2-view SimCLR compute). ``vs_baseline`` is measured throughput /
an analytic A100 estimate for the PyTorch reference: the reference trains
fp32/TF32 cuDNN without AMP; assuming a generous 45% MXU-equivalent
utilisation of A100 TF32 (156 TFLOP/s) on these conv shapes and 3x forward
FLOPs per train step, est_A100 = 0.45 * 156e12 / (3 * F_fwd) clips/s, with
F_fwd taken from XLA's own cost analysis of the forward. The north-star
target is vs_baseline >= 3.

Prints exactly one JSON line to stdout.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    from dualvar_tpu.aug.pipeline import AugConfig
    from dualvar_tpu.models.ssl.simclr import SimCLRNaked
    from dualvar_tpu.train.tasks import total_loss
    import dualvar_tpu.aug.pipeline as P

    B, T, H0, W0 = 128, 16, 171, 128
    img = 112
    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    aug_cfg = AugConfig(img_dim=img, seq_len=T)  # f32 aug measured faster than bf16 on v5e

    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((B, 2, T, img, img, 3), jnp.float32)
    variables = model.init({"params": rng}, example, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))
    opt_state = tx.init(params)

    frames = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (B, 2 * T, H0, W0, 3),
                                          dtype=np.uint8))

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

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    # forward-FLOP estimate from XLA for the baseline model
    def fwd_only(p, bs, block):
        ret, _ = model.apply({"params": p, "batch_stats": bs}, block,
                             train=True, mutable=["batch_stats"])
        return total_loss(ret)

    try:
        block_shape = jax.ShapeDtypeStruct((B, 2, T, img, img, 3), jnp.float32)
        cost = jax.jit(fwd_only).lower(params, batch_stats, block_shape) \
            .compile().cost_analysis()
        f_fwd_total = float(cost.get("flops", 0.0))
    except Exception as e:  # cost analysis is best-effort
        log("cost_analysis failed:", e)
        f_fwd_total = 0.0

    # warmup (compile) then timed steps. NOTE on timing: under the axon relay
    # block_until_ready is unreliable; a host transfer (float()) is the only
    # hard barrier and costs one tunnel round trip. Time a chain of donated
    # steps (each consumes the previous outputs, so the final loss transitively
    # waits on all of them) with a single final float(), minus a measured RTT.
    key = jax.random.PRNGKey(1)
    params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state,
                                                frames, key)
    log("compiled; warmup loss", float(loss))

    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, 0].astype(jnp.float32)) + i)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    n_steps = 20
    t0 = time.perf_counter()
    for i in range(n_steps):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, frames,
            jax.random.fold_in(key, 100 + i))
    final = float(loss)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9)

    clips_per_sec = B * 2 * n_steps / dt
    log(f"step {dt / n_steps * 1e3:.1f} ms (rtt {rtt * 1e3:.0f} ms), "
        f"{clips_per_sec:.1f} clips/s, final loss {final:.3f}")

    if f_fwd_total > 0:
        f_fwd_per_clip = f_fwd_total / (B * 2)
        a100_est = 0.45 * 156e12 / (3.0 * f_fwd_per_clip)
        log(f"fwd {f_fwd_per_clip / 1e9:.1f} GFLOP/clip, "
            f"A100 reference estimate {a100_est:.1f} clips/s")
    else:
        a100_est = float("nan")

    print(json.dumps({
        "metric": "clips/sec/chip pretrain (R3D-18 SimCLR, 16x112^2, bf16, "
                  "full train step incl. on-device aug)",
        "value": round(clips_per_sec, 2),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / a100_est, 3)
        if a100_est == a100_est else None,
    }))


if __name__ == "__main__":
    main()
