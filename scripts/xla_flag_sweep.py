"""Sweep XLA:TPU fusion/scheduling controls over the full R3D bench step.

Round-3 perf lever (VERDICT next #3b): in-context layer1 convs run at
94-135 TF/s vs 171-190 TF/s isolated because of the multi-consumer
mega-fusions XLA builds across the residual block (PARITY.md round-2
analysis). XLA_FLAGS cannot carry libtpu-only flags through this rig's
relay (the client-side parser aborts on unknown flags), so each config is
compiled in-process with per-compile ``compiler_options`` — those travel
through PJRT to the server compiler, and unknown keys raise catchable
errors instead of aborting.

Usage: python scripts/xla_flag_sweep.py [config-name ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SWEEP: list[tuple[str, dict[str, str]]] = [
    ("baseline", {}),
    ("rwb_fusion_off", {"xla_tpu_rwb_fusion": "false"}),
    ("conv_in_fusion_off", {"xla_jf_conv_input_fusion": "false"}),
    ("conv_out_fusion_off", {"xla_jf_conv_output_fusion": "false"}),
    ("nested_loop_fusion_off",
     {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}),
    ("dot_dot_fusion_off", {"xla_tpu_dot_dot_fusion": "false"}),
    ("aggressive_fusion_off",
     {"xla_tpu_enable_aggressive_instruction_fusion": "false"}),
    ("vmem_32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
    ("vmem_64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("vmem_8m", {"xla_tpu_scoped_vmem_limit_kib": "8192"}),
    ("licm_inflation", {"xla_tpu_licm_size_inflation_ratio": "2"}),
    ("no_experimental_fusion",
     {"xla_tpu_use_experimental_fusion_decisions": "false"}),
    ("latency_hiding_sched",
     {"xla_tpu_enable_latency_hiding_scheduler": "true"}),
    ("dot_strength_reduction_off",
     {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("experimental_fusion_cost",
     {"xla_tpu_use_experimental_fusion_cost_model": "true"}),
]


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from dualvar_tpu.aug.pipeline import AugConfig
    import dualvar_tpu.aug.pipeline as P
    from dualvar_tpu.models.ssl.simclr import SimCLRNaked
    from dualvar_tpu.train.tasks import total_loss

    names = sys.argv[1:] or [n for n, _ in SWEEP]

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
    opt_state0 = tx.init(params)
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

    lowered = jax.jit(train_step, donate_argnums=(0, 1, 2)).lower(
        params, batch_stats, opt_state0, frames, rng)

    # relay barrier = host transfer; block_until_ready is unreliable here
    def rtt_measure():
        vals = []
        for i in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(frames[:1, 0, 0, 0].astype(jnp.float32)) + i)
            vals.append(time.perf_counter() - t0)
        return sorted(vals)[1]

    results = {}
    for name, opts in SWEEP:
        if name not in names:
            continue
        t0 = time.perf_counter()
        try:
            step = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # unknown option, compile failure
            msg = str(e).replace("\n", " ")[:200]
            print(f"{name:28s} COMPILE-FAIL: {msg}", flush=True)
            results[name] = None
            continue
        compile_s = time.perf_counter() - t0

        # fresh copies: donate_argnums invalidates the originals otherwise
        p, bs, st = jax.tree.map(jnp.copy, (params, batch_stats, opt_state0))
        key = jax.random.PRNGKey(1)
        p, bs, st, loss = step(p, bs, st, frames, key)
        _ = float(loss)
        rtt = rtt_measure()
        n_steps, chains = 15, 3
        dts = []
        for c in range(chains):
            t0 = time.perf_counter()
            for i in range(n_steps):
                p, bs, st, loss = step(
                    p, bs, st, frames,
                    jax.random.fold_in(key, 100 + c * n_steps + i))
            _ = float(loss)
            dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
        del p, bs, st
        ms = min(dts) / n_steps * 1e3
        print(f"{name:28s} ms_per_step={ms:.1f} compile_s={compile_s:.0f} "
              f"all={[round(d / n_steps * 1e3, 1) for d in dts]}",
              flush=True)
        results[name] = ms
    print(results)


if __name__ == "__main__":
    main()
