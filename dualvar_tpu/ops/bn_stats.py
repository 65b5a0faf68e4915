"""Pallas per-channel reduction kernels — opaque BN-stat boundaries.

Round-4 VERDICT #2 attempt #2 at the layer1 fusion ceiling, structured the
OPPOSITE way from ops/conv_fused.py: instead of trying to beat XLA's conv
(recorded dead end — Mosaic relayouts cap tap-matmul formulations at
19-32 TF/s vs XLA's 171), these kernels make the cheap bandwidth-bound
pieces AROUND the conv opaque custom calls, so XLA's fusion pass cannot
pull them into the conv's mega-fusion. The working hypothesis (PARITY.md
round-2 ceiling analysis): the identical conv+stats hits 171.7 TF/s in
isolation but 94-135 TF/s in-model, i.e. the loss comes from the
whole-program fusion context, not the conv itself.

Kernels (both trivially speed-of-light: one HBM pass, f32 accumulation):

  * ``channel_sums(a, b)`` -> (sum a, sum a*b) per channel — the BN
    forward stats (b=a gives sum/sumsq) and the BN backward sums
    (a=g, b=x), models/layers.py _bn_train_fwd_impl/_bn_train_vjp_bwd.

Structure per the round-4 suggestion: 1D row-major sequential grid,
partials accumulated in f32 VMEM scratch per program, written out once by
the final program (no revisited-output accumulation across a
multidimensional grid — the recorded failure mode of conv_fused.py).

OUTCOME (2026-08-20, v5e, scripts/layer1_fusion_probe.py): the hypothesis
is REFUTED — with the opaque boundary the R3D B=128 train step runs
489.8 ms vs 307.8 ms fused-XLA (1.59x slower), kernel numerics exact
(rel err <2e-6 on hardware). The conv+stat mega-fusion is the
bandwidth-OPTIMAL schedule: stats ride the conv's output stream for free,
while the opaque form pays a full extra HBM pass per tensor in both
directions. Together with ops/conv_fused.py (attempt #1: Pallas conv
19-32 TF/s, relayout-bound), this upgrades the round-2 "needs compiler
work" claim to a demonstrated bound — the in-model conv rate IS the
roofline position, not a fusion pathology (see also
scripts/s3d_bw_accounting.py and PARITY.md round-5).

Integration: models/layers.py routes its BN stat reductions here only
when DUALVAR_BN_STATS=pallas (default off per the measurement above).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def use_pallas_stats() -> bool:
    """Trace-time switch. DEFAULT OFF — measured 2026-08-20 on v5e
    (scripts/layer1_fusion_probe.py, R3D B=128 full train step): the
    opaque boundary runs 489.8 ms vs 307.8 ms fused-XLA (1.59x SLOWER).
    The extra HBM passes (re-reading each conv output for stats; re-reading
    g and x in the backward) cost far more than any conv-schedule recovery:
    XLA's conv+stat mega-fusion is the bandwidth-optimal schedule, and the
    in-model "94-135 TF/s" conv rate is the roofline, not a pathology.
    DUALVAR_BN_STATS=pallas opts in (the probe / future re-tests)."""
    return os.environ.get("DUALVAR_BN_STATS", "xla") == "pallas"


def _sums_kernel(a_ref, b_ref, s1_ref, s2_ref, acc_ref, *, nblocks):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    a = a_ref[...].astype(jnp.float32)
    b = b_ref[...].astype(jnp.float32)
    # partial sums over this block's rows; keep an 8-sublane accumulator so
    # the add stays a native (8, C) vector op
    r = a.shape[0]
    a8 = a.reshape(r // 8, 8, -1)
    ab8 = (a * b).reshape(r // 8, 8, -1)
    acc_ref[0] += jnp.sum(a8, axis=0)
    acc_ref[1] += jnp.sum(ab8, axis=0)

    @pl.when(i == nblocks - 1)
    def _done():
        s1_ref[...] = jnp.sum(acc_ref[0], axis=0, keepdims=True)
        s2_ref[...] = jnp.sum(acc_ref[1], axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _channel_sums_2d(a2, b2, interpret=False):
    """(R, C) x (R, C) -> ((C,), (C,)) f32: sum(a), sum(a*b). R % 8 == 0."""
    R, C = a2.shape
    ebytes = a2.dtype.itemsize + b2.dtype.itemsize
    # block rows: ~2 MB of operands per step, multiple of 8 sublanes
    br = max(8, min(R, (2 << 20) // max(1, ebytes * C)) // 8 * 8)
    while R % br:
        br -= 8
    nblocks = R // br
    s1, s2 = pl.pallas_call(
        functools.partial(_sums_kernel, nblocks=nblocks),
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((br, C), lambda i: (i, 0)),
            pl.BlockSpec((br, C), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C), lambda i: (0, 0)),
            pl.BlockSpec((1, C), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((2, 8, C), jnp.float32)],
        interpret=interpret,
    )(a2, b2)
    return s1[0], s2[0]


def channel_sums(a: jax.Array, b: jax.Array, interpret: bool = False):
    """Per-channel f32 (sum a, sum a*b) over all leading axes of
    channels-last arrays. Shapes must match; any R (non-multiple-of-8
    tails are summed in XLA and added — tiny)."""
    C = a.shape[-1]
    a2 = a.reshape(-1, C)
    b2 = b.reshape(-1, C)
    R = a2.shape[0]
    r0 = (R // 8) * 8
    if r0 == 0:
        s1 = jnp.sum(a2, axis=0, dtype=jnp.float32)
        s2 = jnp.sum(a2.astype(jnp.float32) * b2.astype(jnp.float32), axis=0)
        return s1, s2
    s1, s2 = _channel_sums_2d(a2[:r0], b2[:r0], interpret=interpret)
    if r0 != R:
        ta = a2[r0:].astype(jnp.float32)
        tb = b2[r0:].astype(jnp.float32)
        s1 = s1 + jnp.sum(ta, axis=0)
        s2 = s2 + jnp.sum(ta * tb, axis=0)
    return s1, s2
