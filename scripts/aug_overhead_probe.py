"""Per-program overhead probe for the fused aug kernel's grid.

The fused kernel (ops/aug_fused.py) measured ~82 us/clip-program for a
~36 M-op jitter chain — ~11% of VPU peak — suggesting either VMEM-pass
bandwidth or per-program overhead dominates. This times a passthrough
kernel (load u8 block -> f32 scale -> store) over the same block shapes at
several grid sizes: the N-scaling separates fixed per-program cost from
bandwidth, deciding whether multi-clip blocking would pay.

Usage: python scripts/aug_overhead_probe.py
"""

from __future__ import annotations

import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from _timing import timeit  # shared RTT-corrected timing


def passthrough(clips_u8, block):
    N, C, T, H, W = clips_u8.shape

    def kern(frames, out):
        for b in range(block):
            for c in range(3):
                raw = (frames[b, c].astype(jnp.int32) & 0xFF).astype(
                    jnp.float32)
                out[b, c] = raw * (1.0 / 255.0)

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((N, C, T, H, W), jnp.float32),
        grid=(N // block,),
        in_specs=[pl.BlockSpec((block, C, T, H, W),
                               lambda i: (i, 0, 0, 0, 0))],
        out_specs=pl.BlockSpec((block, C, T, H, W),
                               lambda i: (i, 0, 0, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(clips_u8)


def main():
    N, C, T, S = 256, 3, 16, 112
    clips = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (N, C, T, S, S), dtype=np.uint8))
    mb = clips.nbytes / 1e6 + N * C * T * S * S * 4 / 1e6
    for block in (1, 2, 4, 8):
        # jit once per block size: an unjitted pallas_call would re-trace
        # on every timed call, measuring host tracing instead of the device
        fn = jax.jit(lambda c, b=block: passthrough(c, b))
        dt = timeit(fn, clips, n=20)
        print(f"block={block}: {dt*1e3:6.2f} ms for {N} clips "
              f"({dt/ (N // block) * 1e6:5.1f} us/program, "
              f"{mb / 1e3 / dt:6.1f} GB/s effective)", flush=True)


if __name__ == "__main__":
    main()
