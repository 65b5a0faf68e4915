"""Inference-protocol throughput on v5e: the eval/test hot loop.

The downstream protocols (validation, temporal-10-clip, multi-crop,
retrieval — reference classifier.py:501-542,657-738) all share one hot
shape: a forward-only pass over a batch of center-cropped clips. This
measures that step (uint8 host batch -> eval preprocessing (resize-shape
center crop + normalize) -> backbone -> logits) per backbone, bf16, so the
hardware record covers inference as well as training.

Writes BENCH_EVAL.json; one summary line per net. Timing methodology as in
scripts/_timing.py (chained dispatches, one barrier, median-of-3 RTT).
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

jax.config.update("jax_compilation_cache_dir", "/tmp/dualvar_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from dualvar_tpu.aug.pipeline import AugConfig, eval_batch
from dualvar_tpu.models.backbones import select_backbone
from dualvar_tpu.models.heads import LinearClassifier

T, H0, W0, IMG = 16, 171, 128, 112

# largest first; OOM falls back. Round-4 sweep 1 capped the FLOP-light
# families analytically — caps raised so the fallback finds the real wall.
CANDIDATES = {
    "r3d": (512, 256, 128),
    "r21d": (512, 256, 128, 64),
    "c3d": (512, 256, 128),
    "s3d": (512, 256, 128, 64),
    "s3dg": (512, 256, 128, 64),
    "r2d3d18": (1024, 512, 256, 128),
    "r50": (512, 256, 128, 64),
}


def bench_net(net: str, n_steps: int = 20, chains: int = 3,
              batches=None):
    aug_cfg = AugConfig(img_dim=IMG, seq_len=T)
    backbone, info = select_backbone(net, dtype=jnp.bfloat16)
    model = LinearClassifier(backbone=backbone,
                             feature_size=info["feature_size"],
                             num_class=101, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, T, IMG, IMG, 3), jnp.float32)
    variables = model.init(rng, small, False)
    params, bs = variables["params"], variables.get("batch_stats", {})

    @jax.jit
    def eval_step(params, bs, frames_u8):
        clips = eval_batch(frames_u8, aug_cfg)
        logit, _ = model.apply({"params": params, "batch_stats": bs}, clips,
                               False)
        # the protocols consume softmax probabilities (classifier.py:715)
        return jax.nn.softmax(logit.astype(jnp.float32), axis=-1)

    B = None
    for cand in (batches or CANDIDATES[net]):
        frames = jax.device_put(np.random.default_rng(0).integers(
            0, 255, (cand, T, H0, W0, 3), dtype=np.uint8))
        try:
            t0 = time.perf_counter()
            prob = eval_step(params, bs, frames)
            _ = float(prob[0, 0])
            print(f"  {net}: compiled B={cand} in "
                  f"{time.perf_counter() - t0:.0f}s", flush=True)
            B = cand
            break
        except Exception as e:
            print(f"  {net}: B={cand} failed "
                  f"({type(e).__name__}: {str(e)[:160]}); falling back",
                  flush=True)
    if B is None:
        return {"net": net, "error": "all batch candidates failed"}

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
            # the device executes programs in dispatch order, so the final
            # barrier transitively waits on all of them (scripts/_timing.py)
            prob = eval_step(params, bs, frames)
        _ = float(prob[0, 0])
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    per = min(dts) / n_steps
    clips = B / per
    rec = {
        "net": net, "batch": B, "ms_per_step": round(per * 1e3, 1),
        "clips_per_sec": round(clips, 1),
        "videos_per_sec_10clip": round(clips / 10, 1),
        "chains_ms": [round(d / n_steps * 1e3, 1) for d in dts],
    }
    print(f"{net}: B={B} {per * 1e3:.1f} ms/batch, {clips:.0f} clips/s "
          f"= {clips / 10:.0f} videos/s at 10 clips/video "
          f"(chains {rec['chains_ms']}, rtt {rtt * 1e3:.0f} ms)", flush=True)
    return rec


def _merge_result(path: str, rec: dict):
    """Land-as-measured, best-row merge (scripts/_sweep_merge.py)."""
    from _sweep_merge import merge_result
    merge_result(path, rec,
                 {"shape": f"16x{IMG}^2 center-crop eval, bf16",
                  "device": jax.devices()[0].device_kind, "results": []},
                 list(CANDIDATES))


def main():
    # args: net names, or net:batch for a targeted single-batch probe
    nets = sys.argv[1:] or list(CANDIDATES)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_EVAL.json")
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
