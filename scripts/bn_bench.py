"""Microbenchmark BatchNorm strategies on the conv1-sized feature map.

Measures train-mode BN forward+backward on a (256,16,56,56,64) bf16 map
(the R3D conv1 output at bench batch 128 x 2 views) under several
implementations, to locate the ~120ms/step of BN-stat convert_reduce
fusions seen in the round-1 profile (PARITY.md).

TPU relay timing rules: chain steps, one float() barrier at the end.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPE = (256, 16, 56, 56, 64)
NBYTES = int(np.prod(SHAPE)) * 2


def timed(fn, x, s, b, iters=10):
    f = jax.jit(fn)
    out = f(x, s, b)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        acc = f(x, s, b)
    barrier = float(jax.tree.leaves(acc)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / iters
    return dt, barrier


def flax_bn(x, scale, bias):
    """What flax.linen.BatchNorm does in train mode (stats in f32)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=(0, 1, 2, 3))
    var = (xf * xf).mean(axis=(0, 1, 2, 3)) - mu * mu
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    return ((xf - mu) * inv + bias).astype(x.dtype)


def onepass_bn(x, scale, bias):
    """sum/sumsq with f32 accumulation directly off bf16, normalize in bf16."""
    n = np.prod(SHAPE[:-1])
    s1 = jnp.sum(x, axis=(0, 1, 2, 3), dtype=jnp.float32)
    s2 = jnp.sum(jnp.square(x.astype(jnp.float32)), axis=(0, 1, 2, 3))
    mu = s1 / n
    var = s2 / n - mu * mu
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    a = inv.astype(x.dtype)
    b = (bias - mu * inv).astype(x.dtype)
    return x * a + b


def grad_wrap(bn):
    def loss(x, scale, bias):
        return jnp.sum(jax.nn.relu(bn(x, scale, bias)).astype(jnp.float32))

    def step(x, scale, bias):
        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(x, scale, bias)
        return l, g[1]

    return step


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(SHAPE, dtype=np.float32).astype(np.float32)).astype(jnp.bfloat16)
    scale = jnp.ones((SHAPE[-1],), jnp.float32)
    bias = jnp.zeros((SHAPE[-1],), jnp.float32)
    sol_read = NBYTES / 819e9 * 1e3

    print(f"map: {SHAPE} = {NBYTES/1e9:.2f} GB bf16; one read at 819GB/s = {sol_read:.2f} ms")
    for name, fn in [("flax-style fwd", flax_bn), ("onepass fwd", onepass_bn)]:
        dt, _ = timed(fn, x, scale, bias)
        print(f"{name:24s} {dt*1e3:8.2f} ms  ({dt*1e3/sol_read:.1f}x one-read SOL)")
    for name, fn in [("flax-style fwd+bwd", grad_wrap(flax_bn)),
                     ("onepass fwd+bwd", grad_wrap(onepass_bn))]:
        dt, _ = timed(fn, x, scale, bias)
        print(f"{name:24s} {dt*1e3:8.2f} ms  ({dt*1e3/sol_read:.1f}x one-read SOL)")

    # stats only
    def stats_only(x, scale, bias):
        xf = x.astype(jnp.float32)
        return xf.mean((0, 1, 2, 3)), jnp.mean(xf * xf, (0, 1, 2, 3))

    dt, _ = timed(stats_only, x, scale, bias)
    print(f"{'stats only f32':24s} {dt*1e3:8.2f} ms")

    def stats_sum(x, scale, bias):
        return (jnp.sum(x, (0, 1, 2, 3), dtype=jnp.float32),
                jnp.sum(jnp.square(x).astype(jnp.float32), (0, 1, 2, 3)))

    dt, _ = timed(stats_sum, x, scale, bias)
    print(f"{'stats sum bf16->f32':24s} {dt*1e3:8.2f} ms")

    def relu_only(x, scale, bias):
        return jax.nn.relu(x)

    dt, _ = timed(relu_only, x, scale, bias)
    print(f"{'relu only (rw bound)':24s} {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
