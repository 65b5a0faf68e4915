"""Micro-benchmark of the on-device augmentation pipeline at bench shapes.

Round-3 perf lever (VERDICT next #3a): the ~30 ms of aug inside the 314 ms
R3D step. On a single-core TPU separate XLA programs serialize, so "overlap"
must come from making the aug itself cheaper — this script measures where
the 30 ms goes, stage by stage, and what the bandwidth floor is.

Usage: python scripts/aug_micro.py [B]
"""

from __future__ import annotations

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from _timing import timeit  # shared RTT-corrected timing
from dualvar_tpu.aug import functional as F
from dualvar_tpu.aug.pipeline import AugConfig, pretrain_batch


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    T, H0, W0, img = 16, 171, 128, 112
    cfg = AugConfig(img_dim=img, seq_len=T)
    key = jax.random.PRNGKey(0)
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (B, 2 * T, H0, W0, 3), dtype=np.uint8))

    in_mb = frames.nbytes / 1e6
    out_mb = B * 2 * T * img * img * 3 * 4 / 1e6
    log(f"B={B}: input {in_mb:.0f} MB u8, output {out_mb:.0f} MB f32; "
        f"1-pass floor at 819 GB/s ≈ {(in_mb + out_mb) / 819:.1f} ms")

    dt = timeit(lambda: pretrain_batch(key, frames, cfg))
    log(f"full pretrain_batch: {dt * 1e3:.1f} ms")

    from dualvar_tpu.aug.pipeline import pretrain_batch_fused
    cfg_fused = AugConfig(img_dim=img, seq_len=T, fused="on")
    ref = pretrain_batch(key, frames, cfg)
    got = pretrain_batch_fused(key, frames, cfg_fused)
    err = float(jnp.max(jnp.abs(got - ref)))
    dt_f = timeit(lambda: pretrain_batch_fused(key, frames, cfg_fused))
    log(f"fused kernel:        {dt_f * 1e3:.1f} ms (max |err| vs unfused "
        f"{err:.2e})")
    cfg_fb = AugConfig(img_dim=img, seq_len=T, fused="on",
                       out_dtype="bfloat16")
    dt_fb = timeit(lambda: pretrain_batch_fused(key, frames, cfg_fb))
    log(f"fused kernel bf16:   {dt_fb * 1e3:.1f} ms")

    # stage-by-stage: each stage jitted standalone at the same shapes
    def batched(fn):
        @jax.jit
        def run(key, frames):
            keys = jax.random.split(key, frames.shape[0])

            def sample(k, f):
                clips = f.reshape(2, T, H0, W0, 3)
                return jax.vmap(lambda c, kk: fn(kk, c))(
                    clips, jax.random.split(k, 2))

            return jax.vmap(sample)(keys, frames)
        return run

    crop = batched(lambda k, c: F.to_float(F.random_crop(k, c, img)))
    dt_crop = timeit(lambda: crop(key, frames))
    log(f"crop+to_float:       {dt_crop * 1e3:.1f} ms")

    jit_fn = batched(lambda k, c: F.color_jitter(
        k, F.to_float(F.random_crop(k, c, img)), 0.8, 0.8, 0.8, 0.2,
        p=0.8, mode="consistent", gate=jnp.bool_(True)))
    dt_jit = timeit(lambda: jit_fn(key, frames))
    log(f"+color_jitter:       {dt_jit * 1e3:.1f} ms (jitter ~{(dt_jit - dt_crop) * 1e3:.1f})")

    blur_fn = batched(lambda k, c: F.gaussian_blur(
        F.to_float(F.random_crop(k, c, img)),
        jax.random.uniform(k, minval=0.1, maxval=2.0), on=jnp.bool_(True)))
    dt_blur = timeit(lambda: blur_fn(key, frames))
    log(f"+gaussian_blur:      {dt_blur * 1e3:.1f} ms (blur ~{(dt_blur - dt_crop) * 1e3:.1f})")

    norm_fn = batched(lambda k, c: F.normalize(
        F.to_float(F.random_crop(k, c, img))))
    dt_norm = timeit(lambda: norm_fn(key, frames))
    log(f"+normalize:          {dt_norm * 1e3:.1f} ms (norm ~{(dt_norm - dt_crop) * 1e3:.1f})")

    # color_jitter inner pieces at the cropped shape
    clip = jnp.zeros((B * 2, T, img, img, 3), jnp.float32)

    @jax.jit
    def hsv_roundtrip(c):
        return jax.vmap(lambda x: F.hsv_to_rgb(F.rgb_to_hsv(x)))(c)

    dt_hsv = timeit(lambda: hsv_roundtrip(clip))
    log(f"hsv roundtrip alone: {dt_hsv * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
