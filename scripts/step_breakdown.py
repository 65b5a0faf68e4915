"""Per-segment timing of the pretrain step with a robust methodology:
chain donated calls, block_until_ready barrier, no rtt games (n large).

Segments:
  aug        pretrain_batch only (uint8 -> two augmented f32 views)
  fwd        model fwd (train=True, batch_stats mutable) from a resident block
  fwdloss    fwd + NT-Xent total_loss
  step       full train step (aug + fwd + loss + bwd + SGD)
  step_fz1   full step with conv1 kernel held constant (no conv1 wgrad)
  step_fzbn  full step with all BN scale/bias frozen (no BN param grads)

Usage: python scripts/step_breakdown.py [seg ...]
"""

from __future__ import annotations

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

B, T, H0, W0, img = 128, 16, 171, 128, 112
N = 20


def timeit(f, key, *args):
    """f(carry, key, *args) -> carry'. Calls are chained through the scalar
    carry (the execution relay is lazy + caches identical dispatches, so
    independent same-args calls time at ~0); one float() barrier at the end,
    RTT measured separately and subtracted once."""
    carry = f(jnp.float32(0), key, *args)
    _ = float(carry)
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.float32(i) + 1)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    t0 = time.perf_counter()
    for i in range(N):
        carry = f(carry, jax.random.fold_in(key, i), *args)
    _ = float(carry)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / N


def main():
    sel = sys.argv[1:] or ["aug", "fwd", "fwdloss", "step", "step_fz1",
                           "step_fzbn"]
    aug_cfg = AugConfig(img_dim=img, seq_len=T)
    rng = jax.random.PRNGKey(0)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, 2 * T, H0, W0, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(1)

    model = SimCLRNaked(network="r3d", dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    example = jnp.zeros((B, 2, T, img, img, 3), jnp.float32)
    variables = model.init({"params": rng}, example, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))

    if "aug" in sel:
        def fa(c, k, fr):
            blk = P.pretrain_batch(jax.random.fold_in(k, c.astype(jnp.int32)),
                                   fr, aug_cfg)
            return jnp.sum(blk[:, :, 0, 0, 0, 0]).astype(jnp.float32) * 0 + c + 1
        f = jax.jit(fa)
        dt = timeit(f, key, frames)
        print(f"aug        {dt*1e3:7.1f} ms", flush=True)

    block = jax.jit(lambda k, fr: P.pretrain_batch(k, fr, aug_cfg))(key, frames)
    block = jax.block_until_ready(block)

    if "fwd" in sel:
        def ff(c, k, p, bs, b):
            ret, _ = model.apply(
                {"params": p, "batch_stats": bs}, b * (1 + c * 1e-12),
                train=True, mutable=["batch_stats"])
            first = jax.tree_util.tree_leaves(ret)[0]
            return jnp.sum(first).astype(jnp.float32) * 0 + c + 1
        f = jax.jit(ff)
        dt = timeit(f, key, params, batch_stats, block)
        print(f"fwd        {dt*1e3:7.1f} ms", flush=True)

    if "fwdloss" in sel:
        def fl(c, k, p, bs, b):
            ret, _ = model.apply(
                {"params": p, "batch_stats": bs}, b * (1 + c * 1e-12),
                train=True, mutable=["batch_stats"])
            return total_loss(ret).astype(jnp.float32) * 0 + c + 1
        f = jax.jit(fl)
        dt = timeit(f, key, params, batch_stats, block)
        print(f"fwdloss    {dt*1e3:7.1f} ms", flush=True)

    def make_step(freeze_conv1=False, freeze_bn=False):
        def is_frozen(path):
            joined = "/".join(str(getattr(p, "key", p)) for p in path)
            if freeze_conv1 and joined.startswith("backbone/conv1"):
                return True
            if freeze_bn and ("/bn/" in joined or joined.endswith("/bn")):
                return True
            return False

        def split(p):
            flat = jax.tree_util.tree_flatten_with_path(p)[0]
            frozen = {jax.tree_util.keystr(k) for k, _ in flat if is_frozen(k)}
            return frozen

        frozen_keys = split(params)

        def step(p, bs, os_, fr, k):
            blk = P.pretrain_batch(k, fr, aug_cfg)

            def loss_fn(pp):
                merged = jax.tree_util.tree_map_with_path(
                    lambda path, a, b_: jax.lax.stop_gradient(a)
                    if jax.tree_util.keystr(path) in frozen_keys else a,
                    pp, pp)
                ret, upd = model.apply(
                    {"params": merged, "batch_stats": bs}, blk,
                    train=True, mutable=["batch_stats"])
                return total_loss(ret), upd["batch_stats"]

            (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
            updates, nos = tx.update(grads, os_, p)
            return optax.apply_updates(p, updates), nbs, nos, loss

        return step

    for name, kw in [("step", {}), ("step_fz1", {"freeze_conv1": True}),
                     ("step_fzbn", {"freeze_bn": True})]:
        if name not in sel:
            continue
        step = jax.jit(make_step(**kw), donate_argnums=(0, 1, 2))
        p = jax.tree.map(jnp.copy, params)
        bs = jax.tree.map(jnp.copy, batch_stats)
        os_ = tx.init(p)
        p, bs, os_, loss = step(p, bs, os_, frames, key)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for i in range(N):
            p, bs, os_, loss = step(p, bs, os_, frames,
                                    jax.random.fold_in(key, i))
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / N
        print(f"{name:10s} {dt*1e3:7.1f} ms  {2*B/dt:6.0f} clips/s  "
              f"loss {float(loss):.3f}", flush=True)


if __name__ == "__main__":
    main()
