"""Round-2 perf sweep: step-time for conv-path variants.

Profile (scripts/profile_step.py, r2): convs = 70% of the 404ms step;
conv1 fwd 25ms HBM-bound + conv1 wgrad 20ms at 34 TF/s (Cin=3 waste),
layer1 wgrads 60ms at 88 TF/s. Variants here target those.

Run one variant per process (XLA flags are process-global):
    python scripts/perf_sweep2.py baseline|s2d|b256|b64|vmem|bf16p
"""

from __future__ import annotations

import os
import sys
import time

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "baseline"
if VARIANT == "vmem":
    os.environ["LIBTPU_INIT_ARGS"] = (
        os.environ.get("LIBTPU_INIT_ARGS", "")
        + " --xla_tpu_scoped_vmem_limit_kib=65536")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main():
    from dualvar_tpu.aug.pipeline import AugConfig
    from dualvar_tpu.models.backbones.r3d import R3DNet
    from dualvar_tpu.models.ssl import simclr as S
    from dualvar_tpu.train.tasks import total_loss
    import dualvar_tpu.aug.pipeline as P
    import dualvar_tpu.models.backbones as BB

    B, T, H0, W0, img = 128, 16, 171, 128, 112
    if VARIANT == "b256":
        B = 256
    if VARIANT == "b64":
        B = 64
    if VARIANT == "b256bf16":
        B = 256
    if VARIANT == "b192":
        B = 192
    if VARIANT == "b160":
        B = 160
    dtype = jnp.bfloat16
    param_dtype = jnp.bfloat16 if VARIANT == "bf16p" else jnp.float32

    if VARIANT == "s2d":
        orig = BB.select_backbone

        def patched(name, dtype=jnp.float32):
            net, param = orig(name, dtype)
            if name == "r3d":
                net = R3DNet(dtype=dtype, s2d_stem=True)
            return net, param

        S.select_backbone = patched

    model = S.SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                          dtype=dtype)
    aug_cfg = AugConfig(img_dim=img, seq_len=T,
                        out_dtype="bfloat16" if VARIANT == "b256bf16" else "float32")
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((B, 2, T, img, img, 3), jnp.float32)
    variables = model.init({"params": rng}, example, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if param_dtype == jnp.bfloat16:
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
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
    key = jax.random.PRNGKey(1)
    params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state,
                                                frames, key)
    print(f"[{VARIANT}] compiled; warmup loss {float(loss):.4f}", flush=True)

    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, 0].astype(jnp.float32)) + i)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, frames, jax.random.fold_in(key, i))
    _ = float(loss)
    dt = max(time.perf_counter() - t0 - rtt, 1e-9) / n
    print(f"[{VARIANT}] B={B} step {dt*1e3:.1f} ms  "
          f"{B*2/dt:.0f} clips/s  loss {float(loss):.3f}", flush=True)


if __name__ == "__main__":
    main()
