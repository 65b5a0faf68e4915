"""Pallas fused 3x3x3 stride-1 conv + BN-statistic epilogue (TPU).

STATUS: EXPERIMENTAL — measured SLOWER than XLA and not wired into any
model. On the layer1 shape (256,16,56,56,64) bf16 on v5e:

    XLA conv+stats (isolated)          16.6 ms   171.7 TF/s
    this kernel (lane-concat taps)     88.5 ms    32.1 TF/s
    this kernel (9 dots, K=C)         149.6 ms    19.0 TF/s

plus the grid-accumulated s1/s2 outputs are wrong on hardware (correct
in interpret mode) — revisited-block accumulation across a 2D grid needs
a different structure. Conclusions recorded in PARITY.md: XLA:TPU's own
conv + fused stat epilogue is already near speed-of-light in isolation;
the in-model slowdown (94-135 TF/s) is a whole-program fusion/layout
phenomenon that a drop-in kernel cannot address, and Mosaic relayouts
(lane concat, 192-lane column slices) dominate any tap-matmul
formulation of the conv itself. Kept as the measured record of the
"fused conv+BN Pallas block" north-star investigation.

Motivation (PARITY.md round-2 ceiling analysis): in the BN-training
context XLA runs the layer1 convs of the R3D/R(2+1)D backbones at
94-135 TF/s although the identical conv in isolation reaches 176-190
TF/s on v5e — the conv+stat-epilogue mega-fusions it forms are the
bottleneck of the whole pretrain step (layer1 = 57%). This kernel
computes

    y  = conv3d(x, w, k=(3,3,3), stride 1, SAME)      (bf16, MXU)
    s1 = sum(y)   per channel (f32)
    s2 = sum(y*y) per channel (f32)

in one pass, structured for the MXU:

  * grid over (batch, t); the padded input arrives as three t-shifted
    halo views (same HBM array, three BlockSpecs) and the temporal taps
    are lane-concatenated
  * per dh in {0,1,2}: one matmul (3248, 3C) @ (3C, 3*Cout) accumulated
    into a f32 scratch; the (dh-shifted) rows all align on the output
    row index, so three matmuls cover all 27 taps
  * the dw taps sit in the output columns; three shifted VPU adds
    combine them into the (56, 56, Cout) tile
  * channel sums accumulate across the sequential grid into f32 outputs

The backward is the standard XLA lowering (custom_vjp): fold the s1/s2
cotangents into dy (dy_total = g_y + g_s1 + 2*y*g_s2) and take the
conv's own vjp.

Reference counterpart: the cuDNN fused conv+BN blocks the torch model
gets implicitly (reference backbone/r3d.py:15-45 + SyncBN wrapping,
pretrain.py:244).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x0_ref, x1_ref, x2_ref, w3_ref, y_ref, s1_ref, s2_ref):
    n = pl.program_id(0)
    t = pl.program_id(1)
    H = y_ref.shape[2]          # 56
    Hp = H + 2                  # 58
    C = x0_ref.shape[-1]        # input channels
    Co = y_ref.shape[-1]

    @pl.when((n == 0) & (t == 0))
    def _():
        s1_ref[:] = jnp.zeros_like(s1_ref)
        s2_ref[:] = jnp.zeros_like(s2_ref)

    # lhs rows (h*Hp + w) with lanes (dt, ci): lane-concat the three
    # temporal taps (delivered as t-shifted views of the padded input)
    flat = jnp.concatenate(
        [r[0, 0].reshape(Hp * Hp, C) for r in (x0_ref, x1_ref, x2_ref)],
        axis=-1)
    z = jnp.zeros((H * Hp, 3 * Co), jnp.float32)
    for dh in range(3):
        z = z + jnp.dot(flat[dh * Hp:dh * Hp + H * Hp, :], w3_ref[dh],
                        preferred_element_type=jnp.float32)
    # combine the dw taps: column block dw, rows viewed (H, Hp), shifted
    # by dw along the padded-row axis (lane dim stays Co throughout —
    # Mosaic cannot shape-cast across lanes)
    y = None
    for dw in range(3):
        zw = z[:, dw * Co:(dw + 1) * Co].reshape(H, Hp, Co)
        part = zw[:, dw:dw + H, :]
        y = part if y is None else y + part
    yb = y.astype(y_ref.dtype)
    y_ref[0, 0] = yb
    yf = yb.astype(jnp.float32)
    s1_ref[0] += jnp.sum(yf, axis=(0, 1))
    s2_ref[0] += jnp.sum(yf * yf, axis=(0, 1))


def _fused_fwd(x: Array, w: Array, interpret: bool = False):
    """x: (N, T, H, W, C) bf16; w: (3, 3, 3, C, Co). Returns (y, s1, s2)."""
    N, T, H, W, C = x.shape
    assert H == W, (H, W)
    Co = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    # w3[dh]: rows (dt, cin) -> cols (dw, cout)
    w3 = jnp.transpose(w, (1, 0, 3, 2, 4)).reshape(3, 3 * C, 3 * Co)
    w3 = w3.astype(x.dtype)

    grid = (N, T)
    hal = lambda i: pl.BlockSpec((1, 1, H + 2, W + 2, C),
                                 (lambda n, t, i=i: (n, t + i, 0, 0, 0)),
                                 memory_space=pltpu.VMEM)
    y, s1, s2 = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            hal(0), hal(1), hal(2),                     # t-shifted halo views
            pl.BlockSpec((3, 3 * C, 3 * Co), lambda n, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, H, W, Co), lambda n, t: (n, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Co), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, T, H, W, Co), x.dtype),
            jax.ShapeDtypeStruct((1, Co), jnp.float32),
            jax.ShapeDtypeStruct((1, Co), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * T * H * W * 27 * C * Co,
            bytes_accessed=x.size * 2 + N * T * H * W * Co * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, xp, xp, w3)
    return y, s1[0], s2[0]


def _conv_ref(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


@jax.custom_vjp
def conv3d_bn_stats(x: Array, w: Array):
    """(y, s1, s2) = (conv3d_same(x, w), sum_c y, sum_c y^2).

    Guarded: raises on the TPU backend (see module STATUS — the grid-
    accumulated s1/s2 are WRONG on hardware, and the kernel measured
    5-9x slower than XLA's fused form anyway). Use conv3d_bn_stats_xla,
    which IS the fast path on TPU. The interpret-mode kernel stays
    reachable for tests via _fused_fwd(interpret=True).
    """
    if jax.default_backend() == "tpu":
        raise NotImplementedError(
            "conv3d_bn_stats: the Pallas kernel's s1/s2 grid accumulation "
            "is known-wrong on TPU hardware and the kernel is slower than "
            "XLA's own conv+stats fusion (module STATUS / PARITY.md). Use "
            "conv3d_bn_stats_xla.")
    return _fused_fwd(x, w)


def _fwd(x, w):
    if jax.default_backend() == "tpu":  # same guard as the primal: grad
        raise NotImplementedError(     # calls route through this rule
            "conv3d_bn_stats: known-wrong on TPU hardware; use "
            "conv3d_bn_stats_xla (module STATUS / PARITY.md).")
    y, s1, s2 = _fused_fwd(x, w)
    return (y, s1, s2), (x, w, y)


def _bwd(res, cots):
    x, w, y = res
    gy, gs1, gs2 = cots
    dy = (gy.astype(jnp.float32) + gs1 + 2.0 * y.astype(jnp.float32) * gs2)
    dy = dy.astype(x.dtype)
    _, vjp = jax.vjp(lambda xx, ww: _conv_ref(xx, ww), x, w)
    dx, dw = vjp(dy)
    return dx, dw


conv3d_bn_stats.defvjp(_fwd, _bwd)


def conv3d_bn_stats_xla(x: Array, w: Array):
    """XLA reference of the same contract, for tests and benchmarks."""
    y = _conv_ref(x, w)
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2, 3)), jnp.sum(yf * yf, axis=(0, 1, 2, 3))
