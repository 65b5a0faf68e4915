"""Measure the fused aug kernel's in-kernel compute dtype on hardware
(round-3 VERDICT #5): f32 vs bf16 compute, f32 vs bf16 output, at the
bench shape (B=128, 2 views, 16x112^2 from 171x128 sources).

The round-3 hypothesis: the kernel is VMEM-bandwidth-bound on the ~70
elementwise jitter passes, so bf16 in-kernel compute should roughly halve
the per-clip cost (24.6 ms f32 at this shape). The f32-hue restructure
(sector selects in f32 on a downcast-late path) landed in round 3
unmeasured because the relay was down.

Uses the relay-safe barrier from scripts/_timing.py — jax.block_until_ready
is NOT a sync point through the relay (an inline probe using it reported a
physically impossible 0.7 ms for this shape).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import numpy as np

from _timing import timeit
from dualvar_tpu.aug.pipeline import AugConfig, pretrain_batch_fused


def main() -> None:
    print(f"devices: {jax.devices()}")
    frames = jax.device_put(np.random.default_rng(0).integers(
        0, 255, (128, 32, 171, 128, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(0)
    for compute in ("float32", "bfloat16"):
        for out_dtype in ("float32", "bfloat16"):
            cfg = AugConfig(img_dim=112, seq_len=16, fused="on",
                            fused_compute=compute, out_dtype=out_dtype,
                            jitter_order="sample")
            try:
                sec = timeit(pretrain_batch_fused, key, frames, cfg, n=10)
                print(f"compute={compute:9s} out={out_dtype:9s}: "
                      f"{sec * 1e3:6.1f} ms")
            except Exception as e:  # Mosaic lowering gaps surface here
                print(f"compute={compute:9s} out={out_dtype:9s}: "
                      f"FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
