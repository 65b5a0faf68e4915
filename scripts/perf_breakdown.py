"""Where does the step time go? aug-only vs forward-only vs full train step,
plus batch scaling and a bf16 augmentation variant."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dualvar_tpu.aug.pipeline as P
from dualvar_tpu.aug.pipeline import AugConfig
from dualvar_tpu.models.ssl.simclr import SimCLRNaked
from dualvar_tpu.train.tasks import total_loss


def timed_chain(fn, init_args, n=10, chain_idx=None):
    """Time n chained invocations; one float() barrier at the end."""
    args = fn(*init_args)  # warmup/compile; fn returns next args tuple
    t0 = time.perf_counter()
    _ = float(jnp.sum(args[-1]))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        args = fn(*args)
    _ = float(jnp.sum(args[-1]))
    dt = time.perf_counter() - t0 - rtt
    return dt / n


def main():
    B, T, H0, W0, img = 128, 16, 171, 128, 112
    aug_cfg = AugConfig(img_dim=img, seq_len=T)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, 2 * T, H0, W0, 3), dtype=np.uint8))
    key0 = jax.random.PRNGKey(0)

    # 1. aug-only (frames passed as an arg — closing over them would embed
    # a 300MB constant in the HLO and blow the remote-compile request limit)
    @jax.jit
    def aug_step(fr, key, acc):
        block = P.pretrain_batch(key, fr, aug_cfg)
        return fr, jax.random.fold_in(key, 1), \
            acc + jnp.sum(block[:, :2]).astype(jnp.float32)

    t = timed_chain(lambda f, k, a: aug_step(f, k, a),
                    (frames, key0, jnp.float32(0)))
    print(f"aug-only: {t * 1e3:.1f} ms", flush=True)

    # 2. forward-only + 3. full step
    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    small = jnp.zeros((1, 2, T, 32, 32, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, small, train=True)
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))
    opt = tx.init(params)

    @jax.jit
    def fwd_step(params, bs, fr, key, acc):
        block = P.pretrain_batch(key, fr, aug_cfg)
        ret, upd = model.apply({"params": params, "batch_stats": bs},
                               block[:, :2], train=True,
                               mutable=["batch_stats"])
        return params, upd["batch_stats"], fr, jax.random.fold_in(key, 1), \
            acc + total_loss(ret)

    t = timed_chain(lambda p, b, f, k, a: fwd_step(p, b, f, k, a),
                    (params, bs, frames, key0, jnp.float32(0)))
    print(f"aug+forward: {t * 1e3:.1f} ms", flush=True)

    def full_step(params, bs, opt, fr, key, acc):
        block = P.pretrain_batch(key, fr, aug_cfg)

        def loss_fn(p):
            ret, upd = model.apply({"params": p, "batch_stats": bs},
                                   block[:, :2], train=True,
                                   mutable=["batch_stats"])
            return total_loss(ret), upd["batch_stats"]

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, nopt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), nbs, nopt, fr, \
            jax.random.fold_in(key, 1), acc + loss

    step = jax.jit(full_step, donate_argnums=(0, 1, 2))
    t = timed_chain(lambda *a: step(*a),
                    (params, bs, opt, frames, key0, jnp.float32(0)))
    print(f"full step B={B}: {t * 1e3:.1f} ms -> {B * 2 / t:.0f} clips/s",
          flush=True)

    # 4. B=256
    B2 = 256
    frames2 = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B2, 2 * T, H0, W0, 3), dtype=np.uint8))

    def full_step2(params, bs, opt, fr, key, acc):
        block = P.pretrain_batch(key, fr, aug_cfg)

        def loss_fn(p):
            ret, upd = model.apply({"params": p, "batch_stats": bs},
                                   block[:, :2], train=True,
                                   mutable=["batch_stats"])
            return total_loss(ret), upd["batch_stats"]

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, nopt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), nbs, nopt, fr, \
            jax.random.fold_in(key, 1), acc + loss

    try:
        step2 = jax.jit(full_step2, donate_argnums=(0, 1, 2))
        t = timed_chain(lambda *a: step2(*a),
                        (params, bs, opt, frames2, key0, jnp.float32(0)))
        print(f"full step B={B2}: {t * 1e3:.1f} ms -> {B2 * 2 / t:.0f} clips/s",
              flush=True)
    except Exception as e:
        print(f"B={B2} failed: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
