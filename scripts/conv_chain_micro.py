"""Why do layer1 convs run at ~100 TF/s in the model but 163-174 TF/s
isolated? Replicate the in-model context incrementally on the layer1 shape
(256,16,56,56,64) bf16:

  plain    x -> conv -> conv -> sum                    (isolated baseline)
  bnfrozen conv -> scale*x+b -> relu -> conv           (BN, no batch stats)
  bnstats  conv -> batch-stat BN -> relu -> conv       (the real thing)
  resblock full ResBlock3d from the model (2 convs, 2 BNs, residual)

fwd and fwd+bwd(w only). Usage: python scripts/conv_chain_micro.py [case ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

B, T, H, W, C = 256, 16, 56, 56, 64
FL1 = 2 * B * T * H * W * C * 27 * C  # one 3^3 conv fwd


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


def timeit(f, *args, n=10):
    f = jax.jit(f)
    out = f(jnp.float32(0), *args)
    _ = float(out)
    rtts = []
    for i in range(3):
        t0 = time.perf_counter()
        _ = float(jnp.float32(i) + 1)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    t0 = time.perf_counter()
    for i in range(n):
        out = f(out, *args)
    _ = float(out)
    return max(time.perf_counter() - t0 - rtt, 1e-9) / n


def batch_bn(x, scale, bias):
    axes = (0, 1, 2, 3)
    n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
    s1 = jnp.sum(x, axis=axes, dtype=jnp.float32)
    s2 = jnp.sum(jax.lax.square(x.astype(jnp.float32)), axis=axes)
    mu = s1 / n
    var = jnp.maximum(s2 / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + 1e-5) * scale
    a = inv.astype(x.dtype)
    b = (bias - mu * inv).astype(x.dtype)
    return x * a + b


def main():
    sel = sys.argv[1:] or ["plain", "bnfrozen", "bnstats", "resblock"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)) * 0.1, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((3, 3, 3, C, C)) * 0.05, jnp.bfloat16)
    sc = jnp.ones((C,), jnp.float32)
    bi = jnp.zeros((C,), jnp.float32)

    def run(name, fwd2):
        """fwd2(x, w1, w2) -> scalar-reducible output; 2 convs inside."""
        def f(c, x, w1, w2):
            y = fwd2(x * (1 + c * 1e-9).astype(x.dtype), w1, w2)
            return jnp.sum(y).astype(jnp.float32) * 0 + c + 1
        dt = timeit(f, x, w1, w2)

        def g(c, x, w1, w2):
            def loss(ws):
                return jnp.sum(
                    fwd2(x * (1 + c * 1e-9).astype(x.dtype), *ws)
                    .astype(jnp.float32))
            gr = jax.grad(loss)((w1, w2))
            return (jnp.sum(gr[0]) + jnp.sum(gr[1])).astype(jnp.float32) * 0 + c + 1
        dtb = timeit(g, x, w1, w2)
        print(f"{name:9s} fwd {dt*1e3:7.2f} ms {2*FL1/dt/1e12:6.1f} TF/s"
              f"   fwd+bwd {dtb*1e3:7.2f} ms {6*FL1/dtb/1e12:6.1f} TF/s",
              flush=True)

    if "plain" in sel:
        run("plain", lambda x, w1, w2: conv(conv(x, w1), w2))
    if "bnfrozen" in sel:
        run("bnfrozen", lambda x, w1, w2: conv(
            jax.nn.relu(conv(x, w1) * sc.astype(x.dtype) + bi.astype(x.dtype)),
            w2))
    if "bnstats" in sel:
        run("bnstats", lambda x, w1, w2: conv(
            jax.nn.relu(batch_bn(conv(x, w1), sc, bi)), w2))
    if "resblock" in sel:
        def block(x, w1, w2):
            y = jax.nn.relu(batch_bn(conv(x, w1), sc, bi))
            y = batch_bn(conv(y, w2), sc, bi)
            return jax.nn.relu(y + x)
        run("resblock", block)

    if "resbar" in sel:
        def bn_bar(x, scale, bias):
            xb = jax.lax.optimization_barrier(x)
            axes = (0, 1, 2, 3)
            n = x.shape[0] * x.shape[1] * x.shape[2] * x.shape[3]
            s1 = jnp.sum(xb, axis=axes, dtype=jnp.float32)
            s2 = jnp.sum(jax.lax.square(xb.astype(jnp.float32)), axis=axes)
            mu = s1 / n
            var = jnp.maximum(s2 / n - mu * mu, 0.0)
            inv = jax.lax.rsqrt(var + 1e-5) * scale
            a = inv.astype(x.dtype)
            b = (bias - mu * inv).astype(x.dtype)
            return x * a + b

        def blockb(x, w1, w2):
            y = jax.nn.relu(bn_bar(conv(x, w1), sc, bi))
            y = bn_bar(conv(y, w2), sc, bi)
            return jax.nn.relu(y + x)
        run("resbar", blockb)

    if "resopt" in sel:
        # full training context: resblock + momentum-SGD weight update
        # (mimics the multiply_add wgrad fusions) + running-stat EMA
        m1 = jnp.zeros((3, 3, 3, C, C), jnp.float32)
        m2 = jnp.zeros((3, 3, 3, C, C), jnp.float32)
        ra = jnp.zeros((C,), jnp.float32)

        def f(c, x, w1, w2):
            def loss(ws):
                y = jax.nn.relu(batch_bn(conv(x * (1 + c * 1e-9).astype(x.dtype), ws[0]), sc, bi))
                y = batch_bn(conv(y, ws[1]), sc, bi)
                return jnp.sum(jax.nn.relu(y + x).astype(jnp.float32))
            g1, g2 = jax.grad(loss)((w1, w2))
            nm1 = 0.9 * m1 + g1.astype(jnp.float32)
            nm2 = 0.9 * m2 + g2.astype(jnp.float32)
            nw1 = w1 - (0.003 * nm1).astype(w1.dtype)
            nw2 = w2 - (0.003 * nm2).astype(w2.dtype)
            return (jnp.sum(nw1) + jnp.sum(nw2)).astype(jnp.float32) * 0 + c + 1

        dtb = timeit(f, x, w1, w2)
        print(f"resopt    fwd+bwd+sgd {dtb*1e3:7.2f} ms {6*FL1/dtb/1e12:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
