"""Fused on-device augmentation kernel.

One Pallas program per clip runs the post-crop augmentation chain in a
single VMEM residency: uint8 -> float, the four color jitter ops in a
random order, gated separable Gaussian blur, and channel normalisation,
writing the model-input dtype. (The random crop itself stays an XLA
dynamic_slice on uint8 OUTSIDE the kernel — see _aug_kernel.) The unfused jnp pipeline
(`aug/functional.py` + `aug/pipeline.py`) materializes each stage to HBM
(~8-10 full-tensor passes, measured ~34 ms at B=128x2 views on v5e against
a ~1 ms bandwidth floor); here the chain reads the uint8 frames once and
writes the output once.

Layout: channels are planar, (N, 3, T, size, size), so each (T, H, W) plane
puts W on the lane axis — channel mixes (grayscale, HSV) are plain
elementwise ops across three resident planes instead of stride-3 lane
gathers. The blur is two banded (W_out x W_out) matmuls on the MXU with
edge-replication folded into the band matrix (the clamp-accumulate form of
`aug/functional.py:gaussian_blur`); it runs under `lax.cond` so unblurred
clips skip the FLOPs entirely.

A scalar per-program jitter op order also removes the unfused path's
batch-shared-order compromise (`AugConfig.jitter_order`): per-sample order
(reference augmentation.py:510 semantics) costs nothing here because the
`lax.switch` index is a kernel scalar, not a vmapped vector.

All randomness is drawn OUTSIDE the kernel with jax.random (tiny tensors)
and passed in as factor/index arrays, so given the same key the fused and
unfused pipelines make identical random decisions — the equivalence tests
exploit this (tests/test_aug_fused.py).

Reference behavior covered: augmentation.py:429-652 (ColorJitter incl.
consistent/frame/grad factor modes), :706-721 (GaussianBlur), :149-175
(clip-consistent RandomCrop), transforms.py:57 (Normalize).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..aug.functional import _GRAY_W, IMAGENET_MEAN, IMAGENET_STD

Array = jax.Array

_TAPS = 13  # matches aug/functional.py:gaussian_blur default


def _clip01(x):
    return jnp.clip(x, 0.0, 1.0)


def _gray(r, g, b):
    return _GRAY_W[0] * r + _GRAY_W[1] * g + _GRAY_W[2] * b


def _blend(x, other, f):
    return _clip01(x * f + other * (1.0 - f))


def _jitter_ops(f):
    """The four torchvision-semantics adjustments over planar channels.

    ``f``: (4,) f32 clip-consistent factors [brightness, contrast,
    saturation, hue], already identity-folded for no-apply clips.
    Clip-consistent factors (= the reference's default mode) keep the
    kernel free of lane->batch relayouts, which Mosaic cannot lower;
    per-frame factor modes take the unfused path. In bf16 compute mode the
    f32 factor scalar is splatted then cast per op (Mosaic can neither
    scalarize bf16 nor broadcast from a packed bf16 slice), which costs one
    splat+cast pass per op instead of promoting every plane op to f32.
    """

    def fac(idx, like):
        return jnp.broadcast_to(f[idx], like.shape).astype(like.dtype)

    def brightness(rgb):
        fb = fac(0, rgb[0])
        return tuple(_blend(x, jnp.zeros_like(x), fb) for x in rgb)

    def contrast(rgb):
        fc = fac(1, rgb[0])
        g = _gray(*rgb)
        # per-frame image mean (torchvision semantics); sequential
        # keepdims reduces stay in-layout for Mosaic. Accumulate in f32 —
        # a bf16 sum over 12.5k pixels loses ~2 decimal digits.
        m = (jnp.sum(jnp.sum(g.astype(jnp.float32), axis=2, keepdims=True),
                     axis=1, keepdims=True)
             * (1.0 / (g.shape[1] * g.shape[2]))).astype(g.dtype)
        return tuple(_blend(x, m, fc) for x in rgb)

    def saturation(rgb):
        fs = fac(2, rgb[0])
        gray = _gray(*rgb)
        return tuple(_blend(x, gray, fs) for x in rgb)

    def hue(rgb):
        # hue runs in f32 even in bf16 compute mode: Mosaic cannot lower
        # packed-bf16 vector compares (the sector selects below), and the
        # sector boundaries are exactly where bf16 rounding flips pixels
        out_dt = rgb[0].dtype
        rgb = tuple(x.astype(jnp.float32) for x in rgb)
        fh = fac(3, rgb[0])
        r, g, b = rgb
        maxc = jnp.maximum(jnp.maximum(r, g), b)
        minc = jnp.minimum(jnp.minimum(r, g), b)
        eqc = maxc == minc
        cr = maxc - minc
        ones = jnp.ones_like(maxc)
        s = cr / jnp.where(eqc, ones, maxc)
        cr_div = jnp.where(eqc, ones, cr)
        rc = (maxc - r) / cr_div
        gc = (maxc - g) / cr_div
        bc = (maxc - b) / cr_div
        hr = jnp.where(maxc == r, bc - gc, 0.0)
        hg = jnp.where((maxc == g) & (maxc != r), 2.0 + rc - bc, 0.0)
        hb = jnp.where((maxc != g) & (maxc != r), 4.0 + gc - rc, 0.0)
        h = jnp.mod((hr + hg + hb) / 6.0 + 1.0, 1.0)
        h = jnp.mod(h + fh, 1.0)
        h6 = h * 6.0
        vs = maxc * s

        def chan(n):
            k = jnp.mod(n + h6, 6.0)
            return (maxc - vs * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)
                    ).astype(out_dt)

        return chan(5.0), chan(3.0), chan(1.0)

    return [brightness, contrast, saturation, hue]


def _band_matrix(sigma, n):
    """(n, n) separable-blur band with edge replication folded in:
    M[u, w] = sum_j k[j] * [clamp(w - r + j, 0, n-1) == u]."""
    r = _TAPS // 2
    t = jax.lax.broadcasted_iota(jnp.int32, (_TAPS, 1), 0).astype(
        jnp.float32) - r
    k = jnp.exp(-0.5 * (t / jnp.maximum(sigma, 1e-6)) ** 2)
    k = k / jnp.sum(k)
    iu = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    iw = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    m = jnp.zeros((n, n), jnp.float32)
    for j in range(_TAPS):
        m = m + k[j, 0] * (iu == jnp.clip(iw - r + j, 0, n - 1)).astype(
            jnp.float32)
    return m


def _aug_kernel(orders, frames, factors, blurp, out, *, out_compute,
                normalize):
    """One program = one clip. See module docstring for the layout.

    The random crop happens OUTSIDE the kernel (an XLA dynamic_slice on the
    uint8 frames, fused with the planar transpose): Mosaic rejects unaligned
    dynamic slices on the tiled (H, W) axes, and the in-kernel alternative —
    0/1 selection matmuls — runs the MXU with bf16-rounded operands
    (preferred_element_type only sets the accumulator), which corrupted the
    u8 values by ~0.5%.
    """
    i = pl.program_id(0)
    dt = out_compute
    # factors/blurp are full-array f32 VMEM refs; factors stay f32 (see
    # _jitter_ops.fac for how they meet the bf16 planes)
    f = factors[i]
    sigma, blur_on = blurp[i, 0], blurp[i, 1] > 0.0
    T, size = frames.shape[2], frames.shape[3]

    def plane(c):
        # no direct u8->f32 cast in Mosaic; widen to i32 — the widening
        # SIGN-extends (255 -> -1), so mask back to unsigned
        raw = (frames[0, c].astype(jnp.int32) & 0xFF).astype(jnp.float32)
        return (raw * (1.0 / 255.0)).astype(dt)

    rgb = (plane(0), plane(1), plane(2))

    # the four jitter ops in the random per-clip order; the switch index is
    # a kernel scalar so exactly one branch runs per slot
    ops = _jitter_ops(f)
    for slot in range(4):
        rgb = jax.lax.switch(orders[i, slot], ops, rgb)

    def blurred(rgb):
        m = _band_matrix(sigma, size)

        # HIGHEST: default MXU precision rounds operands to bf16; in f32
        # compute mode the XLA-oracle tests pin f32 blur values
        hi = jax.lax.Precision.HIGHEST

        def blur1(x):  # (T, size, size)
            xr = jnp.dot(x.astype(jnp.float32).reshape(T * size, size), m,
                         precision=hi, preferred_element_type=jnp.float32)
            xr = xr.reshape(T, size, size)
            cols = [jnp.dot(m.T, xr[t], precision=hi,
                            preferred_element_type=jnp.float32)
                    for t in range(T)]
            return jnp.stack(cols).astype(x.dtype)

        return tuple(blur1(x) for x in rgb)

    rgb = jax.lax.cond(blur_on, blurred, lambda rgb: rgb, rgb)

    for c in range(3):
        if normalize:
            scale = 1.0 / IMAGENET_STD[c]
            bias = -IMAGENET_MEAN[c] / IMAGENET_STD[c]
            out[0, c] = (rgb[c] * scale + bias).astype(out.dtype)
        else:
            out[0, c] = rgb[c].astype(out.dtype)


@partial(jax.jit,
         static_argnames=("out_dtype", "compute_dtype", "normalize",
                          "interpret"))
def aug_fused(clips_u8: Array, orders: Array, factors: Array,
              blur: Array, *, out_dtype=jnp.float32,
              compute_dtype=jnp.float32, normalize: bool = True,
              interpret: bool | None = None) -> Array:
    """Run the fused augmentation chain on pre-cropped clips.

    clips_u8: (N, 3, T, size, size) uint8 planar clips (already cropped)
    orders:   (N, 4) int32 jitter op-order permutations
    factors:  (N, 4) float32 [brightness, contrast, saturation, hue]
              clip-consistent scalars, identity-folded for no-apply clips
    blur:     (N, 2) float32 (sigma, on>0)
    compute_dtype: in-kernel plane dtype. The jitter chain is VMEM-
              bandwidth-bound (~70 elementwise passes); bfloat16 halves
              the blend-op cost. Hue, contrast means and blur matmuls
              compute in f32 in both modes (Mosaic cannot lower
              packed-bf16 vector compares, and hue's sector selects are
              also where bf16 rounding flips pixels). float32 (default)
              matches the unfused pipeline to ~1e-5 (the exactness tests
              pin this); bfloat16 is experimental pending hardware
              re-measurement.
    Returns (N, 3, T, size, size) ``out_dtype``, normalised.
    """
    N, C, T, size, size2 = clips_u8.shape
    assert C == 3 and size == size2, clips_u8.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 3, T, size, size),
                         lambda i, *_: (i, 0, 0, 0, 0)),
            # small parameter arrays ride along unblocked in VMEM (Mosaic
            # requires sub-(8,128) blocks to equal the full array)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 3, T, size, size),
                               lambda i, *_: (i, 0, 0, 0, 0)),
    )
    return pl.pallas_call(
        partial(_aug_kernel, out_compute=jnp.dtype(compute_dtype),
                normalize=normalize),
        out_shape=jax.ShapeDtypeStruct((N, 3, T, size, size), out_dtype),
        grid_spec=grid_spec,
        # the resident set (u8 in + f32 out blocks, both double-buffered,
        # plus 3 f32 planes and the hue temporaries) peaks over the
        # default 16M scoped-vmem limit
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=40 * 1024 * 1024),
        interpret=interpret,
    )(orders, clips_u8, factors, blur)
