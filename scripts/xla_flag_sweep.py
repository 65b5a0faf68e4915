"""Sweep XLA:TPU fusion/scheduling flags over the full R3D bench step.

Round-3 perf lever (VERDICT next #3b): in-context layer1 convs run at
94-135 TF/s vs 171-190 TF/s isolated because of the multi-consumer
mega-fusions XLA builds across the residual block (PARITY.md round-2
analysis). This sweeps the compiler controls that change fusion decisions —
each config in a fresh subprocess (XLA_FLAGS must precede backend init) —
and reports ms/step for the identical train step.

Usage:
  python scripts/xla_flag_sweep.py            # run the built-in sweep
  python scripts/xla_flag_sweep.py --child    # (internal) one measurement
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SWEEP: list[tuple[str, str]] = [
    ("baseline", ""),
    ("rwb_fusion_off", "--xla_tpu_rwb_fusion=false"),
    ("conv_in_fusion_off", "--xla_jf_conv_input_fusion=false"),
    ("conv_out_fusion_off", "--xla_jf_conv_output_fusion=false"),
    ("conv_io_fusion_off",
     "--xla_jf_conv_input_fusion=false --xla_jf_conv_output_fusion=false"),
    ("nested_loop_fusion_off",
     "--xla_tpu_enable_multi_level_nested_loop_fusion=false"),
    ("no_dot_dot", "--xla_tpu_dot_dot_fusion=false"),
    ("aggressive_fusion_off",
     "--xla_tpu_enable_aggressive_instruction_fusion=false"),
]


def child() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dualvar_tpu.aug.pipeline import AugConfig
    import dualvar_tpu.aug.pipeline as P
    from dualvar_tpu.models.ssl.simclr import SimCLRNaked
    from dualvar_tpu.train.tasks import total_loss

    B, T, H0, W0, img = 128, 16, 171, 128, 112
    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    aug_cfg = AugConfig(img_dim=img, seq_len=T)
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((B, 2, T, img, img, 3), jnp.float32)
    variables = model.init({"params": rng}, example, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))
    opt_state = tx.init(params)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, 2 * T, H0, W0, 3), dtype=np.uint8))

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
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, frames, key)
    compile_s = time.perf_counter() - t0
    _ = float(loss)

    # RTT correction as in bench.py (relay barrier = host transfer)
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, 0].astype(jnp.float32)) + i)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    n_steps, chains = 15, 3
    dts = []
    for c in range(chains):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, frames,
                jax.random.fold_in(key, 100 + c * n_steps + i))
        _ = float(loss)
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    ms = min(dts) / n_steps * 1e3
    print(f"RESULT ms_per_step={ms:.1f} compile_s={compile_s:.0f} "
          f"all={[round(d / n_steps * 1e3, 1) for d in dts]}")


def main() -> None:
    if "--child" in sys.argv:
        child()
        return
    names = sys.argv[1:] or [n for n, _ in SWEEP]
    results = {}
    for name, flags in SWEEP:
        if name not in names:
            continue
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        env["PYTHONPATH"] = REPO
        t0 = time.perf_counter()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child"],
            capture_output=True, text=True, timeout=1200, env=env)
        line = [ln for ln in out.stdout.splitlines() if "RESULT" in ln]
        wall = time.perf_counter() - t0
        if out.returncode or not line:
            tail = (out.stdout + out.stderr)[-600:]
            print(f"{name:28s} FAILED ({wall:.0f}s): {tail}", flush=True)
            results[name] = None
            continue
        print(f"{name:28s} {line[0].split('RESULT ')[1]} wall={wall:.0f}s",
              flush=True)
        results[name] = line[0]
    print(results)


if __name__ == "__main__":
    main()
