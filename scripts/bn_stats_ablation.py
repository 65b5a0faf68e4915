"""Does fusing BN batch-stat sums into the conv outputs pessimize conv
layouts? Time the full train step with:

  batch    normal training BN (batch moments, the real thing)
  frozen   BN uses running stats only (no stat sums anywhere); scale/bias
           still trained so the elementwise chain + its backward remain

The frozen variant is not semantically valid training — it isolates how
much step time the stat-sum fusions (and any layout choices they force)
cost. Run one variant per process.

Usage: python scripts/bn_stats_ablation.py batch|frozen
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

VARIANT = sys.argv[1] if len(sys.argv) > 1 else "batch"

import dualvar_tpu.models.layers as L

if VARIANT == "frozen":
    _orig = L._FastBN.__call__

    def _frozen_call(self, x, use_running_average):
        return _orig(self, x, True)

    L._FastBN.__call__ = _frozen_call

import dualvar_tpu.aug.pipeline as P
from dualvar_tpu.aug.pipeline import AugConfig
from dualvar_tpu.models.ssl.simclr import SimCLRNaked
from dualvar_tpu.train.tasks import total_loss


def main():
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
    frames = jax.device_put(
        np.random.default_rng(0).integers(0, 255, (B, 2 * T, H0, W0, 3),
                                          dtype=np.uint8))

    def train_step(params, batch_stats, opt_state, frames_u8, key):
        block = P.pretrain_batch(key, frames_u8, aug_cfg)

        def loss_fn(p):
            ret, upd = model.apply(
                {"params": p, "batch_stats": batch_stats}, block,
                train=True, mutable=["batch_stats"])
            return total_loss(ret), upd.get("batch_stats", batch_stats)

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    key = jax.random.PRNGKey(1)
    params, batch_stats, opt_state, loss = step(params, batch_stats, opt_state,
                                                frames, key)
    print(f"[{VARIANT}] compiled; warmup loss {float(loss):.4f}", flush=True)
    n = 20
    t0 = time.perf_counter()
    for i in range(n):
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, frames, jax.random.fold_in(key, i))
    _ = float(loss)
    dt = (time.perf_counter() - t0) / n
    print(f"[{VARIANT}] B={B} step {dt*1e3:.1f} ms  {2*B/dt:.0f} clips/s",
          flush=True)


if __name__ == "__main__":
    main()
