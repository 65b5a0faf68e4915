"""S3D/S3D-G bandwidth accounting (round-4 VERDICT #3 "prove the bound").

The branch-packed SepInception (models/backbones/s3dg.py, measured
2026-08-20: s3dg_packed 96.9 ms vs s3dg 93.0 ms at B=64) did NOT lift the
17% MFU — evidence that S3D is not MXU-tile-padding-bound. This script
makes the alternative explanation quantitative: pull XLA's own cost
analysis (flops + bytes accessed) for the full s3dg pretrain train step
and compare achieved FLOP/s and achieved HBM bytes/s against the v5e
peaks. If bytes/s sits near the ~819 GB/s HBM roof while FLOP/s sits at
17% of the 197 TF/s bf16 MXU roof, the backbone is proven
bandwidth-bound: its separable 3D convs (1xkxk + kx1x1) have intrinsically
low arithmetic intensity at S3D's small channel widths, and no conv
packing can fix that — only layout/dtype changes to move fewer bytes.

Prints one JSON line. Does not write repo artifacts (record in PARITY.md).
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
V5E_BF16_PEAK = 197e12
V5E_HBM_GBPS = 819e9


def build_step(net: str):
    model = SimCLRNaked(network=net, dim=128, temperature=0.07,
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

    return (jax.jit(train_step, donate_argnums=(0, 1, 2)),
            params, batch_stats, opt_state)


def probe(net: str, B: int) -> dict:
    os.environ.setdefault("DUALVAR_BN_STATS", "xla")
    step, params, batch_stats, opt_state = build_step(net)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, 2 * T, H0, W0, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(1)

    abstract = lambda tree: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)
    compiled = step.lower(abstract(params), abstract(batch_stats),
                          abstract(opt_state),
                          jax.ShapeDtypeStruct(frames.shape, frames.dtype),
                          key).compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0))
    byac = float(cost.get("bytes accessed", 0.0))

    params, batch_stats, opt_state, loss = step(
        params, batch_stats, opt_state, frames, key)
    _ = float(loss)
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, i].astype(jnp.float32)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    n_steps, dts = 20, []
    for c in range(3):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, frames,
                jax.random.fold_in(key, c * 100 + i))
        _ = float(loss)
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    per = min(dts) / n_steps
    return {
        "net": net, "batch": B, "ms_per_step": round(per * 1e3, 1),
        "clips_per_sec": round(B * 2 / per, 1),
        "step_tflops": round(flops / 1e12, 2),
        "xla_bytes_accessed_GB": round(byac / 1e9, 2),
        "achieved_tflops_per_s": round(flops / per / 1e12, 1),
        "mfu_pct": round(flops / per / V5E_BF16_PEAK * 100, 1),
        "achieved_GBps": round(byac / per / 1e9, 1),
        "hbm_util_pct_of_819GBps": round(byac / per / V5E_HBM_GBPS * 100, 1),
        "arith_intensity_flop_per_byte": round(flops / max(byac, 1), 1),
        "roofline_knee_flop_per_byte": round(V5E_BF16_PEAK / V5E_HBM_GBPS, 1),
    }


def main():
    out = {"backend": jax.default_backend(),
           "note": "bytes accessed is XLA's cost model (HBM traffic upper "
                   "bound incl. reuse it can't prove); hbm_util near/over "
                   "100% => bandwidth-bound"}
    for net, B in (("s3dg", 64), ("r3d", 128)):
        out[net] = probe(net, B)
        print(net, out[net], file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
