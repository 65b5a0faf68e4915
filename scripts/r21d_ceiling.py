"""FLOP / memory / MFU accounting for the flagship r21d paper config.

VERDICT round-2 next #4: the paper recipe (r21d, 3-view DualVar,
16x112x112, B=32 -> 272 ms measured in round 2) never got the R3D-style
ceiling treatment, and B=64 OOMed. This script:

  * ``--analytic`` (runs anywhere): per-stage conv FLOPs via jax.eval_shape
    -free arithmetic, bf16-tiling-padded activation sizes, and the implied
    MFU of a measured step time;
  * ``--measure`` (TPU): times the full 3-view DualVar train step at B=32
    and B=64 (with and without --remat) and prints MFU against the
    analytic FLOPs.

Paper recipe reference: paper_scripts/paper_table1_k400/pretrain/*.sh
(r21d, seq_len 16, img 112, 3 views).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dualvar_tpu.models.backbones.r21d import intermed_channels


def _pad(c: int, dtype_lanes: int = 128) -> int:
    return -(-c // dtype_lanes) * dtype_lanes


def conv_flops(n, t, h, w, cin, cout, kt, kh, kw, st=1, sh=1, sw=1):
    """MACs*2 for one conv over (n, t, h, w, cin) -> strided output."""
    to, ho, wo = -(-t // st), -(-h // sh), -(-w // sw)
    return 2 * n * to * ho * wo * cout * cin * kt * kh * kw, (to, ho, wo)


def r21d_stage_table(n_clips: int, T: int = 16, S: int = 112,
                     mid_mode: str = "formula"):
    """Per-stage (name, fwd_flops, act_elems, padded_act_elems) for r21d
    with layer_sizes (1,1,1,1) — two SpatioTemporalConvs per block plus the
    stride-2 downsample convs, mirroring backbone/r21d.py."""
    rows = []
    shapes = dict(t=T, h=S, w=S)

    def st_conv(name, cin, cout, ks, stride):
        kt, kh, kw = ks
        stt, sth, stw = stride
        mid = intermed_channels(cin, cout, ks, mid_mode)
        # spatial (1,kh,kw) at spatial stride, then temporal (kt,1,1)
        f1, (t1, h1, w1) = conv_flops(
            n_clips, shapes["t"], shapes["h"], shapes["w"], cin, mid,
            1, kh, kw, 1, sth, stw)
        f2, (t2, h2, w2) = conv_flops(
            n_clips, t1, h1, w1, mid, cout, kt, 1, 1, stt, 1, 1)
        act = n_clips * (t1 * h1 * w1 * mid + t2 * h2 * w2 * cout)
        act_pad = n_clips * (t1 * h1 * w1 * _pad(mid)
                             + t2 * h2 * w2 * _pad(cout))
        shapes.update(t=t2, h=h2, w=w2)
        rows.append((name, f1 + f2, act, act_pad, mid))

    # stem: (3,7,7) s=(1,2,2) mid=45 (backbone/r21d.py:84-90)
    st_conv("stem", 3, 64, (3, 7, 7), (1, 2, 2))
    # 4 layers x 1 block x 2 convs (layer_sizes 1,1,1,1)
    for i, (cin, cout, stride) in enumerate(
            [(64, 64, (1, 1, 1)), (64, 128, (2, 2, 2)),
             (128, 256, (2, 2, 2)), (256, 512, (2, 2, 2))]):
        st_conv(f"layer{i+1}.conv1", cin, cout, (3, 3, 3), stride)
        st_conv(f"layer{i+1}.conv2", cout, cout, (3, 3, 3), (1, 1, 1))
        if stride != (1, 1, 1):
            f, _ = conv_flops(n_clips, shapes["t"] * 2, shapes["h"] * 2,
                              shapes["w"] * 2, cin, cout, 1, 1, 1, 2, 2, 2)
            rows.append((f"layer{i+1}.down", f,
                         n_clips * shapes["t"] * shapes["h"] * shapes["w"]
                         * cout,
                         n_clips * shapes["t"] * shapes["h"] * shapes["w"]
                         * _pad(cout), cout))
    return rows


def analytic(B: int, mid_mode: str = "formula"):
    n_clips = B * 3  # 3 views
    rows = r21d_stage_table(n_clips, mid_mode=mid_mode)
    fwd = sum(r[1] for r in rows)
    act = sum(r[2] for r in rows)
    act_pad = sum(r[3] for r in rows)
    # train step ~ fwd + 2x fwd (dgrad+wgrad); SR pass adds a 4th encode of
    # the shuffled view set (1/3 of clips) fwd-only? No: the shuffled pass
    # runs under the same grad graph -> count 4/3 of everything.
    step_flops = 3 * fwd * (4 / 3)
    print(f"B={B} (3 views + shuffled-SR pass => {n_clips} + {B} clips)")
    print(f"  fwd FLOPs (3 views):        {fwd/1e12:.2f} TF")
    print(f"  train-step FLOPs (+SR):     {step_flops/1e12:.2f} TF")
    print(f"  activations (bf16, exact):  {act*2/1e9:.2f} GB")
    print(f"  activations (bf16, padded): {act_pad*2/1e9:.2f} GB "
          f"({act_pad/act:.2f}x tiling inflation)")
    print("  per-stage mid-channels:",
          {r[0]: r[4] for r in rows if "conv1" in r[0] or r[0] == "stem"})
    for ms in (272.0, 200.0):
        print(f"  MFU at {ms:.0f} ms/step: "
              f"{step_flops / (ms/1e3) / 197e12 * 100:.1f}% of v5e bf16 peak")
    return step_flops


def measure(B: int, remat: bool, net: str = "r21d"):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    import dualvar_tpu.aug.pipeline as P
    from dualvar_tpu.aug.pipeline import AugConfig
    from dualvar_tpu.train.tasks import make_task, total_loss
    from dualvar_tpu.core.config import ModelConfig

    T, H0, W0, img = 16, 171, 128, 112
    cfg = ModelConfig(net=net, model="simclr_timeseriesv4",
                      dtype="bfloat16", remat=remat)
    task = make_task(cfg)
    aug_cfg = AugConfig(img_dim=img, seq_len=T, fused="auto")
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros((B, 3, T, img, img, 3), jnp.float32)
    tstate = task.init(rng, example)
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.sgd(0.003, momentum=0.9))
    opt_state = tx.init(tstate.params)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, 3 * T, H0, W0, 3), dtype=np.uint8))

    def train_step(params, batch_stats, opt_state, frames_u8, key):
        k_aug, k_model = jax.random.split(key)
        block = P.pretrain_batch(k_aug, frames_u8, aug_cfg)

        def loss_fn(p):
            from dualvar_tpu.train.tasks import TaskState
            ret, new_bs, _ = task.forward(
                p, TaskState(params=p, batch_stats=batch_stats, moco=None),
                block, k_model, train=True)
            return total_loss(ret), new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    step = jax.jit(train_step, donate_argnums=(0, 1, 2))
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, bs, st, loss = step(tstate.params, tstate.batch_stats,
                                opt_state, frames, key)
    print(f"compiled in {time.perf_counter()-t0:.0f}s; loss {float(loss):.3f}")
    try:
        stats = jax.devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0)
        lim = stats.get("bytes_limit", 0)
        print(f"device memory: peak {peak/1e9:.2f} GB / limit {lim/1e9:.2f} GB")
    except Exception as e:
        print("memory_stats unavailable:", repr(e))

    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.sum(frames[:1, 0, 0, 0].astype(jnp.float32)) + i)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    n, chains, dts = 10, 3, []
    for c in range(chains):
        t0 = time.perf_counter()
        for i in range(n):
            params, bs, st, loss = step(params, bs, st, frames,
                                        jax.random.fold_in(key, c * n + i))
        _ = float(loss)
        dts.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    ms = min(dts) / n * 1e3
    step_flops = analytic(
        B, "tile128" if net == "r21d_tiled" else "formula")  # pad128: useful-FLOP MFU
    mfu = step_flops / (ms / 1e3) / 197e12 * 100
    print(f"B={B} net={net} remat={remat}: {ms:.1f} ms/step, "
          f"{B * 3 / (ms / 1e3):.1f} clips/s, MFU {mfu:.1f}%")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("-B", type=int, default=32)
    ap.add_argument("--mid_mode", default="formula",
                    choices=["formula", "tile128", "pad128"])
    ap.add_argument("--net", default="r21d",
                    choices=["r21d", "r21d_tiled", "r21d_pad128"])
    args = ap.parse_args()
    if args.measure:
        measure(args.B, args.remat, args.net)
    else:
        analytic(args.B, args.mid_mode)
