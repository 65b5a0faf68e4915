"""Microbenchmark: 3D-conv lowering strategies for the R3D hot layers.

XLA:TPU lowers `conv_general_dilated` with 3 spatial dims; whether that
path hits MXU speed-of-light is an empirical question. Candidate
alternatives, timed fwd and fwd+bwd on representative R3D-18 shapes:

  native   lax conv_general_dilated NTHWC/THWIO (what Conv3d does today)
  taps     sum over the temporal kernel taps of 2D convs: fold T into the
           batch, one (kh,kw) conv2d per temporal tap on a T-shifted view,
           accumulate. 3x3x3 -> 3 conv2d on (B*T) batch.
  merge2d  1x3x3-only control: fold T into batch, single conv2d (shows the
           ceiling of the 2D path; not numerically the 3D conv)

Usage: python scripts/conv_micro.py [case ...]
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# (name, B, T, H, W, Cin, Cout, (kt,kh,kw), (st,sh,sw))
CASES = {
    "conv1": (256, 16, 112, 112, 3, 64, (3, 7, 7), (1, 2, 2)),
    "layer1": (256, 16, 56, 56, 64, 64, (3, 3, 3), (1, 1, 1)),
    "layer2": (256, 16, 28, 28, 128, 128, (3, 3, 3), (1, 1, 1)),
    "layer3": (256, 8, 14, 14, 256, 256, (3, 3, 3), (1, 1, 1)),
}


def conv_native(x, w, stride):
    kt, kh, kw = w.shape[:3]
    return jax.lax.conv_general_dilated(
        x, w, window_strides=stride,
        padding=[(kt // 2,) * 2, (kh // 2,) * 2, (kw // 2,) * 2],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


def conv_taps(x, w, stride):
    """Temporal-tap decomposition: y[t] = sum_k conv2d(x[t*st + k - pad], w[k])."""
    B, T, H, W, C = x.shape
    kt, kh, kw = w.shape[:3]
    st, sh, sw = stride
    pad_t = kt // 2
    To = (T + 2 * pad_t - kt) // st + 1
    xp = jnp.pad(x, ((0, 0), (pad_t, pad_t), (0, 0), (0, 0), (0, 0)))
    y = None
    for k in range(kt):
        # frames contributing tap k: xp[:, k : k + To*st : st]
        xs = jax.lax.slice_in_dim(xp, k, k + (To - 1) * st + 1, st, axis=1)
        xs2 = xs.reshape(B * To, H, W, C)
        yk = jax.lax.conv_general_dilated(
            xs2, w[k], window_strides=(sh, sw),
            padding=[(kh // 2,) * 2, (kw // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = yk if y is None else y + yk
    Ho, Wo = y.shape[1], y.shape[2]
    return y.reshape(B, To, Ho, Wo, -1)


def conv_merge2d(x, w, stride):
    B, T, H, W, C = x.shape
    kt, kh, kw = w.shape[:3]
    st, sh, sw = stride
    x2 = x.reshape(B * T, H, W, C)
    y = jax.lax.conv_general_dilated(
        x2, w[kt // 2], window_strides=(sh, sw),
        padding=[(kh // 2,) * 2, (kw // 2,) * 2],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y.reshape(B, T, y.shape[1], y.shape[2], -1)


def bench(fn, *args, n=10):
    f = jax.jit(fn)
    out = f(*args)
    jax.block_until_ready(out)
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.float32(i))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return max((time.perf_counter() - t0 - rtt), 1e-9) / n


def main():
    sel = sys.argv[1:] or list(CASES)
    rng = np.random.default_rng(0)
    for name in sel:
        B, T, H, W, Cin, Cout, k, s = CASES[name]
        x = jnp.asarray(rng.standard_normal((B, T, H, W, Cin)), jnp.bfloat16)
        w = jnp.asarray(0.05 * rng.standard_normal((*k, Cin, Cout)), jnp.bfloat16)
        To, Ho, Wo = T // s[0], H // s[1], W // s[2]
        flops = 2 * B * To * Ho * Wo * Cout * k[0] * k[1] * k[2] * Cin
        print(f"-- {name}: x{x.shape} w{w.shape} s{s} "
              f"fwd {flops/1e9:.1f} GFLOP", flush=True)
        for label, fn in [("native", conv_native), ("taps", conv_taps),
                          ("merge2d", conv_merge2d)]:
            fl = flops if label != "merge2d" else flops // k[0]
            fwd = functools.partial(fn, stride=s)
            dt = bench(fwd, x, w)
            g = jax.grad(lambda xx, ww: jnp.sum(fwd(xx, ww).astype(jnp.float32)),
                         argnums=(0, 1))
            dtb = bench(g, x, w)
            print(f"   {label:8s} fwd {dt*1e3:7.2f} ms {fl/dt/1e12:6.1f} TF/s"
                  f"   fwd+bwd {dtb*1e3:7.2f} ms {3*fl/dtb/1e12:6.1f} TF/s",
                  flush=True)


if __name__ == "__main__":
    main()
