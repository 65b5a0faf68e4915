"""Shared building blocks for 3D-CNN video backbones.

All tensors are channels-last ``(B, T, H, W, C)`` — the layout XLA tiles best
onto the TPU MXU for `lax.conv_general_dilated`. The reference operates in
torch's ``(B, C, T, H, W)``; the public drivers transpose once at the device
boundary.

BatchNorm note: the reference wraps every model in SyncBatchNorm under DDP
(reference: pretrain.py:244, classifier.py:221) so batch statistics are
global-batch statistics. Here the whole train step runs with global semantics
under ``jax.jit`` over a sharded batch, so a plain mean over the batch axis
*is* the global mean — XLA inserts the cross-replica reduction. SyncBN
therefore needs no special code; we use flax.linen.BatchNorm directly with
torch-parity hyperparameters (momentum 0.9 flax == 0.1 torch, eps 1e-5).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Triple = tuple[int, int, int]


def _triple(x) -> Triple:
    if isinstance(x, (tuple, list)):
        assert len(x) == 3
        return tuple(x)
    return (x, x, x)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Conv3d default: kaiming_uniform(a=sqrt(5)) over fan_in.

    flax kernel shape is (kt, kh, kw, in_ch, out_ch); fan_in = kt*kh*kw*in_ch.
    With a=sqrt(5): gain = sqrt(2/(1+5)) = 1/sqrt(3); bound = sqrt(3)*gain/sqrt(fan_in)
    = 1/sqrt(fan_in).
    """
    fan_in = shape[0] * shape[1] * shape[2] * shape[3]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def kaiming_normal_fanout_init(key, shape, dtype=jnp.float32):
    """torch kaiming_normal_(mode='fan_out') for conv kernels (resnet_2d3d.py:224)."""
    fan_out = shape[0] * shape[1] * shape[2] * shape[4]
    std = math.sqrt(2.0 / fan_out)
    return std * jax.random.normal(key, shape, dtype)


def normal_init(std: float = 0.01):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class Conv3d(nn.Module):
    """3D convolution on (B, T, H, W, C), mirroring torch.nn.Conv3d semantics.

    kernel/stride/padding are torch-style ints or (t, h, w) triples; padding is
    symmetric zero padding. Compute runs in ``dtype`` (bf16 on TPU for speed),
    parameters are stored in ``param_dtype``.
    """

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    use_bias: bool = True
    kernel_init: Callable | None = None  # default: torch conv init
    # gate for the stem space-to-depth rewrite below; backbones thread their
    # s2d_stem flag here so s2d_stem=False really disables the rewrite (the
    # escape hatch for numeric debugging)
    s2d_stem: bool = True
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ks = _triple(self.kernel_size)
        st = _triple(self.stride)
        pd = _triple(self.padding)
        in_ch = x.shape[-1]
        kshape = (*ks, in_ch, self.features)
        kinit = self.kernel_init or torch_conv_kernel_init
        kernel = self.param("kernel", kinit, kshape, self.param_dtype)
        x = x.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        # stem-shaped convs (kt,7,7)/s(1,2,2)/p(.,3,3) on <=8 input channels
        # route through the space-to-depth rewrite (see stem_conv_s2d): the
        # narrow-channel stem wastes MXU lanes; identical math, same params
        if (self.s2d_stem
                and (ks[1], ks[2]) == (7, 7) and st == (1, 2, 2)
                and pd == (ks[0] // 2, 3, 3) and in_ch <= 8
                and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0):
            y = stem_conv_s2d(x, kernel)
            if self.use_bias:
                fan_in = ks[0] * ks[1] * ks[2] * in_ch
                bias = self.param(
                    "bias", torch_conv_bias_init(fan_in),
                    (self.features,), self.param_dtype)
                y = y + bias.astype(self.dtype)
            return y
        s2_ok = any(s == 2 for s in st) and all(
            s == 1 or (s == 2 and k == 3 and p == 1
                       and x.shape[1 + i] % 2 == 0)
            for i, (s, k, p) in enumerate(zip(st, ks, pd)))
        if s2_ok:
            y = conv3d_s2(x, kernel, st, pd)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=st,
                padding=[(pd[0], pd[0]), (pd[1], pd[1]), (pd[2], pd[2])],
                dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
            )
        if self.use_bias:
            fan_in = ks[0] * ks[1] * ks[2] * in_ch
            bias = self.param(
                "bias", torch_conv_bias_init(fan_in), (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


def _conv3d(x, kernel, stride, padding):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=stride,
        padding=[(p, p) for p in padding],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"))


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3d_s2(x: Array, kernel: Array, stride: Triple, padding: Triple):
    """3D conv with a phase-decomposed data gradient for stride-2 axes.

    XLA lowers the dgrad of a strided conv as a zero-inserted (dilated)
    transposed conv; on v5e the layer2-entry dgrad ran HBM-bound at
    ~280 GiB/s (24.5 ms/step in the r2 profile). Decomposing by output
    phase turns it into dense stride-1 convs over ``dy`` with the
    even/odd kernel taps (no inserted zeros, same FLOPs) followed by an
    interleave. Forward and wgrad are the standard lowering.

    Only k=3, s=2, p=1 axes are decomposed (the shapes the backbones
    use); other axes pass through stride-1 inside the phase convs.
    """
    return _conv3d(x, kernel, stride, padding)


def _conv3d_s2_fwd(x, kernel, stride, padding):
    return _conv3d(x, kernel, stride, padding), (x, kernel)


def _phase_dgrad(dy, kernel, x_shape, stride, padding):
    """dx for y = conv(x, w, stride, pad) where every stride-2 axis has
    k=3, p=1 and an even input extent; stride-1 axes have symmetric pad.

    Per stride-2 axis (k=3, s=2, p=1, X even, Y=X/2):
      dx[2t]   = w[1] . dy[t]                       (odd padded phase)
      dx[2t+1] = w[2] . dy[t] + w[0] . dy[t+1]      (dy zero-padded right)
    so each of the 2^(#strided axes) phase combos is one dense conv of dy
    with a tap-subset of w, then phases interleave.
    """
    spatial = x_shape[1:4]
    Cin = x_shape[4]
    s2_axes = [i for i in range(3) if stride[i] == 2]
    for i in s2_axes:
        assert kernel.shape[i] == 3 and padding[i] == 1 and spatial[i] % 2 == 0, (
            kernel.shape, stride, padding, x_shape)

    # kernel for dgrad: correlation of dy with spatially flipped, in/out
    # transposed taps. Build per-phase tap subsets.
    # phase bit 0 -> dx even positions (single tap m=1)
    # phase bit 1 -> dx odd positions (taps m=2 at dy[t], m=0 at dy[t+1])
    def axis_taps(axis, bit):
        if stride[axis] == 1:
            return None  # keep all taps, normal conv on this axis
        return (1,) if bit == 0 else (2, 0)

    phases = []
    n_bits = len(s2_axes)
    for combo in range(2 ** n_bits):
        bits = {ax: (combo >> bi) & 1 for bi, ax in enumerate(s2_axes)}
        # slice kernel taps per axis; tap order along the axis must match
        # increasing dy offset: for bit 1 the taps are (w2 at offset 0,
        # w0 at offset 1)
        k = kernel
        pads = []
        dy_p = dy
        for ax in range(3):
            if stride[ax] == 1:
                # full taps, flipped (standard dgrad on unstrided axis)
                k = jnp.flip(k, axis=ax)
                kk = k.shape[ax]
                pads.append((kk - 1 - padding[ax], kk - 1 - padding[ax]))
                continue
            taps = axis_taps(ax, bits[ax])
            k = jnp.take(k, jnp.asarray(taps), axis=ax)
            if bits[ax] == 0:
                pads.append((0, 0))
            else:
                # 2-tap over dy padded (0, 1) on this axis
                pad_width = [(0, 0)] * 5
                pad_width[1 + ax] = (0, 1)
                dy_p = jnp.pad(dy_p, pad_width)
                pads.append((0, 0))
        # transpose in/out channels
        kt = jnp.swapaxes(k, 3, 4)
        dxp = jax.lax.conv_general_dilated(
            dy_p, kt, (1, 1, 1), pads,
            dimension_numbers=("NTHWC", "THWIO", "NTHWC"))
        phases.append((bits, dxp))

    # interleave phases back: for each strided axis, even positions come
    # from the bit-0 conv, odd from bit-1. Stack phase results (sorted by
    # per-axis bit tuple = row-major over the bit dims), reshape the stack
    # dim into one 2-wide dim per strided axis, and move each next to (and
    # minor of) its spatial dim so the final reshape interleaves.
    half = [spatial[i] // 2 if stride[i] == 2 else spatial[i] for i in range(3)]
    slots = {tuple(bits.get(ax, 0) for ax in range(3)): dxp
             for bits, dxp in phases}
    arr = jnp.stack([slots[c] for c in sorted(slots)], axis=1)
    arr = arr.reshape((x_shape[0],) + (2,) * n_bits + tuple(half) + (Cin,))
    perm, bitdim, spdim = [0], 1, 1 + n_bits
    for ax in range(3):
        perm.append(spdim)
        spdim += 1
        if stride[ax] == 2:
            perm.append(bitdim)
            bitdim += 1
    perm.append(1 + n_bits + 3)
    return arr.transpose(perm).reshape(x_shape)


def _conv3d_s2_bwd(stride, padding, res, g):
    x, kernel = res
    dx = _phase_dgrad(g, kernel, x.shape, stride, padding)
    # wgrad: standard lowering via the conv transpose rule
    _, wvjp = jax.vjp(lambda w: _conv3d(x, w, stride, padding), kernel)
    (dw,) = wvjp(g)
    return dx, dw


conv3d_s2.defvjp(_conv3d_s2_fwd, _conv3d_s2_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bn_train_fused(x: Array, scale: Array, bias: Array, eps: float):
    """Train-mode BN core with a hand-written VJP -> (y, mu, var).

    Forward: one-pass sum/sumsq stats (f32 accumulation directly off the
    bf16 map) and a two-coefficient normalize ``x*a + b``. mu/var are
    returned for the running-average update.

    Why custom_vjp: autodiff through the sum(x^2) stats path emits extra
    full-map product terms (d(sum x^2) -> 2x*g) that XLA materializes as
    separate HBM passes (profiled: the layer1 BN-backward fusion ran
    HBM-bound at ~280 GiB/s for ~24.6 ms/step). The canonical BN backward
    is two channel-sums plus one affine map ``dx = A*g + C*x + B`` — a
    form XLA fuses into the adjacent conv dgrad/wgrad passes.
    """
    y, mu, var, _ = _bn_train_fwd_impl(x, scale, bias, eps)
    return y, mu, var


def _use_pallas_stats(x) -> bool:
    """Opt-in (DUALVAR_BN_STATS=pallas): route BN stat reductions through
    the opaque Pallas kernel (ops/bn_stats.py). Measured 1.59x SLOWER than
    the fused-XLA path on the flagship step — kept as the recorded
    fusion-ceiling attempt #2 (see ops/bn_stats.py OUTCOME)."""
    if x.dtype == jnp.float64:  # f64 exactness tests use the XLA path
        return False
    from ..ops.bn_stats import use_pallas_stats

    return use_pallas_stats()


def _bn_train_fwd_impl(x, scale, bias, eps):
    # f32 accumulation off bf16/f32 maps (the TPU fast path); f64 inputs
    # keep f64 stats — an f32 one-pass var under f64 compute picks up
    # layout-dependent rounding (~1e-7), which breaks the f64 exactness
    # that equivalence tests (e.g. packed S3D) rely on
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    axes = tuple(range(x.ndim - 1))
    n = 1
    for d in axes:
        n *= x.shape[d]
    if _use_pallas_stats(x):
        from ..ops.bn_stats import channel_sums

        s1, s2 = channel_sums(x, x)
    else:
        s1 = jnp.sum(x, axis=axes, dtype=acc)
        s2 = jnp.sum(jax.lax.square(x.astype(acc)), axis=axes)
    mu = s1 / n
    var = jnp.maximum(s2 / n - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + eps)
    sc = scale.astype(acc)
    a = (inv * sc).astype(x.dtype)
    b = (bias.astype(acc) - mu * inv * sc).astype(x.dtype)
    return x * a + b, mu, var, inv


def _bn_train_vjp_fwd(x, scale, bias, eps):
    y, mu, var, inv = _bn_train_fwd_impl(x, scale, bias, eps)
    return (y, mu, var), (x, scale, mu, inv)


def _bn_train_vjp_bwd(eps, res, cotangents):
    g, gmu, gvar = cotangents  # gmu/gvar are zero under the EMA stop_gradient
    x, scale, mu, inv = res
    axes = tuple(range(x.ndim - 1))
    n = 1
    for d in axes:
        n *= x.shape[d]
    # channel sums off the bf16 maps, f32 accumulation, one fused pass;
    # f64 inputs keep f64 sums for the same layout-independence reason as
    # the forward stats (the packed-S3D f64 gradient-exactness tests rely
    # on it)
    acc = jnp.float64 if x.dtype == jnp.float64 else jnp.float32
    if _use_pallas_stats(x):
        from ..ops.bn_stats import channel_sums

        s_g, s_gx = channel_sums(g, x)
    else:
        s_g = jnp.sum(g, axis=axes, dtype=acc)
        s_gx = jnp.sum((g * x), axis=axes, dtype=acc)
    s_gc = s_gx - mu * s_g  # sum g*(x-mu)
    sc = scale.astype(acc)
    dscale = (s_gc * inv).astype(scale.dtype)
    dbias = s_g.astype(scale.dtype)
    A = inv * sc
    C = -A * inv * inv * s_gc / n + 2.0 * gvar / n
    B = -A * s_g / n - C * mu + gmu / n
    dx = g * A.astype(g.dtype) + x * C.astype(x.dtype) + B.astype(x.dtype)
    return dx, dscale, dbias


_bn_train_fused.defvjp(_bn_train_vjp_fwd, _bn_train_vjp_bwd)


class _FastBN(nn.Module):
    """One-pass BatchNorm core tuned for TPU memory bandwidth.

    flax's nn.BatchNorm casts the activation map to f32 before reducing,
    which materializes an f32 copy of every feature map in HBM — measured
    ~10x slower than bandwidth speed-of-light on the R3D conv1 map
    (scripts/bn_bench.py; the ~30%-of-step convert_reduce fusions in the
    round-1 profile). Here the sum and sum-of-squares reduce directly off
    the bf16 map with f32 accumulation (one fused pass, no f32 copy), and
    normalization is a two-coefficient ``x * a + b`` in the compute dtype,
    so XLA fuses it into the producing conv's epilogue.

    Variable tree matches nn.BatchNorm exactly (params scale/bias,
    batch_stats mean/var) — checkpoints interchange.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool) -> Array:
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (C,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32))

        if use_running_average:
            mu, var = ra_mean.value, ra_var.value
            inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
            a = inv.astype(self.dtype)
            b = (bias.astype(jnp.float32) - mu * inv).astype(self.dtype)
            return x.astype(self.dtype) * a + b

        y, mu, var = _bn_train_fused(
            x.astype(self.dtype), scale, bias, self.epsilon)
        if not self.is_initializing() and self.is_mutable_collection(
                "batch_stats"):
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * jax.lax.stop_gradient(mu)
            ra_var.value = m * ra_var.value + (1 - m) * jax.lax.stop_gradient(var)
        return y


class BatchNorm(nn.Module):
    """torch-parity BatchNorm over (B, T, H, W) with running stats.

    Under jit with a batch sharded on the 'data' mesh axis this computes
    *global*-batch moments (SyncBN semantics, reference pretrain.py:244).
    """

    momentum: float = 0.9  # flax convention == torch momentum 0.1
    epsilon: float = 1e-5
    use_running_average: bool | None = None
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool | None = None) -> Array:
        ura = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        norm = _FastBN(
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
            name="bn",
        )
        return norm(x, ura)


def max_pool3d(x: Array, kernel_size, stride=None, padding=0) -> Array:
    """torch.nn.MaxPool3d on (B, T, H, W, C)."""
    ks = _triple(kernel_size)
    st = _triple(stride if stride is not None else kernel_size)
    pd = _triple(padding)
    return nn.max_pool(
        x,
        window_shape=ks,
        strides=st,
        padding=[(pd[0], pd[0]), (pd[1], pd[1]), (pd[2], pd[2])],
    )


def avg_pool3d(x: Array, kernel_size, stride=None, padding=0) -> Array:
    ks = _triple(kernel_size)
    st = _triple(stride if stride is not None else kernel_size)
    pd = _triple(padding)
    return nn.avg_pool(
        x,
        window_shape=ks,
        strides=st,
        padding=[(pd[0], pd[0]), (pd[1], pd[1]), (pd[2], pd[2])],
    )


def global_avg_pool3d(x: Array) -> Array:
    """AdaptiveAvgPool3d((1,1,1)): (B, T, H, W, C) -> (B, C)."""
    return jnp.mean(x, axis=(1, 2, 3))


def l2_normalize(x: Array, axis: int = -1, eps: float = 1e-12) -> Array:
    """torch F.normalize parity: x / max(||x||, eps)."""
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(norm, eps)


class StemConv7x7(nn.Module):
    """Drop-in for ``Conv3d(features, (kt,7,7), stride (1,2,2), pad (kt//2,3,3),
    no bias)`` evaluated via space-to-depth (see stem_conv_s2d). Identical
    parameter tree ({'kernel'}) and init, so checkpoints interchange with the
    plain stem."""

    features: int
    kt: int = 3
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kshape = (self.kt, 7, 7, x.shape[-1], self.features)
        kernel = self.param("kernel", torch_conv_kernel_init, kshape,
                            self.param_dtype)
        return stem_conv_s2d(x.astype(self.dtype), kernel.astype(self.dtype))


def stem_conv_s2d(x: Array, kernel: Array) -> Array:
    """Space-to-depth evaluation of the stem conv: mathematically identical to
    a (kt,7,7) conv with stride (1,2,2) and padding (1,3,3), but executed as a
    (kt,4,4) stride-1 conv on 2x2-space-to-depth input with 4x the channels.

    Why: the stem sees C=3 channels, which occupies 3/128 of an MXU tile; the
    s2d form feeds 12 channels over a quarter the spatial positions — the
    standard TPU ResNet-stem rewrite. Parameters keep the original (kt,7,7,C,O)
    layout (checkpoint-compatible); the kernel is re-laid-out inside the
    traced graph, which XLA folds into a constant per compilation.

    Derivation: with xp = pad(x, 3) and w8 = pad(w, 7->8 taps on the right),
    y[p] = sum_k w8[k] xp[2p+k]; writing k = 2m+phi gives a 4-tap VALID conv
    over the s2d cells q with channel index (phi_h, phi_w, c).
    """
    B, T, H, W, C = x.shape
    kt, kh, kw, Cin, O = kernel.shape
    assert (kh, kw) == (7, 7) and Cin == C and H % 2 == 0 and W % 2 == 0
    xp = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (3, 3), (0, 0)))
    Hq, Wq = (H + 6) // 2, (W + 6) // 2
    xs = xp.reshape(B, T, Hq, 2, Wq, 2, C)
    xs = xs.transpose(0, 1, 2, 4, 3, 5, 6).reshape(B, T, Hq, Wq, 4 * C)
    w8 = jnp.pad(kernel, ((0, 0), (0, 1), (0, 1), (0, 0), (0, 0)))
    ws = w8.reshape(kt, 4, 2, 4, 2, C, O)
    ws = ws.transpose(0, 1, 3, 2, 4, 5, 6).reshape(kt, 4, 4, 4 * C, O)
    tp = kt // 2
    return jax.lax.conv_general_dilated(
        xs, ws.astype(xs.dtype), (1, 1, 1),
        [(tp, tp), (0, 0), (0, 0)],
        dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
    )
