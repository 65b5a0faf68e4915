"""Per-backbone v5e throughput table: full SimCLR pretrain step per family.

The headline bench (bench.py) measures R3D-18 only, and the flagship
measurements cover r21d; this script completes the hardware record across
every backbone the registry exposes (reference select_backbone.py:7-32), so
a migrating user can see what each family trains at on a v5e chip.

Per backbone: the SAME full train step as bench.py (uint8 batch -> fused
on-device aug -> 2-view encode -> NT-Xent -> backward -> SGD), bf16 compute,
16x112^2 clips, chained donated steps with a single host barrier minus
median-of-3 RTT (see scripts/_timing.py for why block_until_ready is not
usable through the relay). Batch candidates fall back on OOM. MFU is
XLA's own cost analysis of the compiled step against the v5e bf16 peak
(197 TF/s).

Writes BENCH_BACKBONES.json and prints one summary line per net.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# _sweep_merge lives next to this file; the repo-root insert above does not
# cover it when these modules are imported from elsewhere (ADVICE r4)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

V5E_BF16_PEAK = 197e12
T, H0, W0, IMG = 16, 171, 128, 112

# batch candidates per family, largest first (OOM falls back). Round-4
# sweep 1 sized these from the R3D/r21d residency ANALYTICALLY and capped
# the FLOP-light families at 64 untested; the bandwidth-bound nets
# (s3d/s3dg at 17% MFU) plausibly gain from larger GEMMs, so the caps are
# raised to let the OOM fallback find the real wall. r3d stays at 128:
# B=192 was measured sublinear per clip (PARITY.md round-4).
CANDIDATES = {
    "r3d": (128, 64, 32),
    "r21d": (128, 64, 32, 16),
    "c3d": (256, 128, 64, 32),
    "s3d": (256, 128, 64, 32, 16),
    "s3dg": (256, 128, 64, 32, 16),
    # branch-packed variants (round-4 VERDICT #3): exact same math, merged
    # 1x1 + block-diagonal separable convs (models/backbones/s3dg.py)
    "s3d_packed": (256, 128, 64, 32, 16),
    "s3dg_packed": (256, 128, 64, 32, 16),
    "r2d3d18": (256, 128, 64, 32),
    "r50": (128, 64, 32, 16),
}


def bench_net(net: str, n_steps: int = 20, chains: int = 3,
              batches=None):
    aug_cfg = AugConfig(img_dim=IMG, seq_len=T, fused="auto",
                        jitter_order="sample")
    model = SimCLRNaked(network=net, dim=128, temperature=0.07,
                        dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 2, T, IMG, IMG, 3), jnp.float32)
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))

    def fresh_state():
        variables = model.init({"params": rng}, small, train=True)
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        return params, bs, tx.init(params)

    def train_step(params, bs, opt, frames_u8, key):
        block = P.pretrain_batch(key, frames_u8, aug_cfg)

        def loss_fn(p):
            ret, upd = model.apply({"params": p, "batch_stats": bs}, block,
                                   train=True, mutable=["batch_stats"])
            return total_loss(ret), upd["batch_stats"]

        (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, nopt = tx.update(grads, opt, params)
        return optax.apply_updates(params, u), nbs, nopt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))

    params = bs = opt = None
    B = None
    for cand in (batches or CANDIDATES[net]):
        params, bs, opt = fresh_state()
        frames = jax.device_put(np.random.default_rng(0).integers(
            0, 255, (cand, 2 * T, H0, W0, 3), dtype=np.uint8))
        try:
            t0 = time.perf_counter()
            params, bs, opt, loss = step(params, bs, opt, frames,
                                         jax.random.PRNGKey(1))
            warm = float(loss)
            print(f"  {net}: compiled B={cand} in "
                  f"{time.perf_counter() - t0:.0f}s (warmup loss {warm:.3f})",
                  flush=True)
            B = cand
            break
        except Exception as e:
            print(f"  {net}: B={cand} failed "
                  f"({type(e).__name__}: {str(e)[:160]}); falling back",
                  flush=True)
    if B is None:
        return {"net": net, "error": "all batch candidates failed"}

    # step FLOPs from XLA's cost analysis of the compiled full step; lower
    # the SAME donated jit at the same shapes so the persistent compile
    # cache serves the binary instead of paying a second full compile
    try:
        abstract = lambda tree: jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)
        cost = step.lower(
            abstract(params), abstract(bs), abstract(opt),
            jax.ShapeDtypeStruct((B, 2 * T, H0, W0, 3), jnp.uint8),
            jax.random.PRNGKey(3)).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
    except Exception as e:
        print(f"  {net}: cost_analysis failed: {e}", flush=True)
        step_flops = 0.0

    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, i].astype(jnp.float32)))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]

    key = jax.random.PRNGKey(2)
    dts = []
    for c in range(chains):
        t0 = time.perf_counter()
        for i in range(n_steps):
            params, bs, opt, loss = step(params, bs, opt, frames,
                                         jax.random.fold_in(key, c * 100 + i))
        final = float(loss)
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    per = min(dts) / n_steps
    clips = B * 2 / per
    mfu = step_flops / per / V5E_BF16_PEAK if step_flops else None
    rec = {
        "net": net, "batch": B, "ms_per_step": round(per * 1e3, 1),
        "clips_per_sec": round(clips, 1),
        "step_tflops": round(step_flops / 1e12, 2) if step_flops else None,
        "mfu_pct": round(mfu * 100, 1) if mfu is not None else None,
        "chains_ms": [round(d / n_steps * 1e3, 1) for d in dts],
        "final_loss": round(final, 3),
    }
    print(f"{net}: B={B} {per * 1e3:.1f} ms/step, {clips:.0f} clips/s, "
          f"MFU {rec['mfu_pct']}% (chains {rec['chains_ms']}, "
          f"rtt {rtt * 1e3:.0f} ms)", flush=True)
    return rec


def _merge_result(path: str, rec: dict):
    """Land-as-measured, best-row merge (scripts/_sweep_merge.py)."""
    from _sweep_merge import merge_result
    merge_result(path, rec,
                 {"shape": f"16x{IMG}^2, 2 views, fused aug, bf16",
                  "device": jax.devices()[0].device_kind, "results": []},
                 list(CANDIDATES))


def main():
    # args: net names, or net:batch for a targeted single-batch probe
    # (the candidate loop stops at the LARGEST fitting batch, so
    # intermediate batches need an explicit ask)
    nets = sys.argv[1:] or list(CANDIDATES)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BACKBONES.json")
    out = []
    for net in nets:
        try:
            if ":" in net:
                net, b = net.split(":", 1)
                from _sweep_merge import parse_batches
                rec = bench_net(net, batches=parse_batches(b))
            else:
                rec = bench_net(net)
        except Exception as e:
            rec = {"net": net,
                   "error": f"{type(e).__name__}: {str(e)[:300]}"}
            print(f"{net}: FAILED {e}", flush=True)
        out.append(rec)
        _merge_result(path, rec)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
