"""R(2+1)D — factored spatial+temporal ResNet video backbone.

Capability parity with reference backbone/r21d.py: every 3D convolution is
factored into a (1,kh,kw) spatial conv -> BN -> ReLU -> (kt,1,1) temporal
conv, with the intermediate channel count M chosen so the factored pair has
approximately the parameter budget of the dense 3D conv (paper sec. 3.5;
reference backbone/r21d.py:47-49). Output for (B, 16, 112, 112, 3) is
(B, 2, 7, 7, 512); 14,365,303 parameters at layer_sizes (1,1,1,1).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

import jax
from ..layers import BatchNorm, Conv3d, _triple, torch_conv_kernel_init


def _bounded_uniform_init(fan_in: int):
    """torch conv kaiming-uniform with an explicit fan-in (for pad128: the
    temporal conv's bound must come from the LOGICAL mid width, not the
    physically padded kernel shape)."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _zero_padded_init(base, n_logical: int, axis: int):
    """Run ``base`` then zero every slice at index >= n_logical on ``axis``
    — the structurally-zero pad block of mid_mode='pad128'."""

    def init(key, shape, dtype=jnp.float32):
        w = base(key, shape, dtype)
        idx = jnp.arange(shape[axis])
        mask = jnp.expand_dims(
            idx < n_logical,
            [a for a in range(len(shape)) if a != (axis % len(shape))])
        return jnp.where(mask, w, 0)

    return init


def intermed_channels(in_ch: int, out_ch: int, ks,
                      mid_mode: str = "formula") -> int:
    kt, kh, kw = _triple(ks)
    mid = int(
        math.floor(
            (kt * kh * kw * in_ch * out_ch) / (kh * kw * in_ch + kt * out_ch)
        )
    )
    if mid_mode == "tile128":
        # TPU-native variant (NOT reference parity): the paper formula
        # yields widths (83/144/230/460/921) that pad 1.1-1.8x under the
        # 128-lane MXU/VMEM tiling; snapping to the nearest non-zero
        # multiple of 128 trades a ~±10% parameter change for tile-exact
        # matmuls and activations.
        return max(128, round(mid / 128) * 128)
    if mid_mode == "pad128":
        # TPU-native variant WITH exact reference parity: keep the formula
        # width logically, pad the physical mid up to the next 128 multiple
        # with structurally-zero weights (see SpatioTemporalConv). The
        # padded channels are exactly zero forward AND stay zero through
        # training (their pre-BN activations are 0, BN maps 0->beta=0,
        # ReLU(0)=0, the downstream rows are 0 so every gradient into the
        # pad block is exactly 0, and SGD/momentum/weight-decay of an exact
        # 0 is 0) — so the computed function and its training trajectory
        # are those of mid_mode='formula', at tile-aligned layouts. Exact
        # in exact arithmetic, and the pad blocks stay bitwise zero through
        # training; the one float-level caveat is that XLA tiles the wider
        # reductions differently, regrouping the NONZERO partial sums —
        # outputs agree with 'formula' to reduction-order rounding (~1e-6
        # relative per layer in f32; tests/test_r21d_pad128.py), far below
        # bf16 training noise, vs tile128's O(1) function change.
        return -(-mid // 128) * 128
    assert mid_mode == "formula", mid_mode
    return mid


class SpatioTemporalConv(nn.Module):
    """(1,kh,kw) conv -> BN -> ReLU -> (kt,1,1) conv.

    Parity: reference backbone/r21d.py:11-70.
    """

    features: int
    kernel_size: Any
    stride: Any = 1
    padding: Any = 0
    use_bias: bool = False
    dtype: Any = jnp.float32
    mid_mode: str = "formula"  # see intermed_channels

    @nn.compact
    def __call__(self, x, train: bool):
        kt, kh, kw = _triple(self.kernel_size)
        st, sh, sw = _triple(self.stride)
        pt, ph, pw = _triple(self.padding)
        mid = intermed_channels(x.shape[-1], self.features, self.kernel_size,
                                self.mid_mode)
        sp_init = tmp_init = None
        if self.mid_mode == "pad128":
            logical = intermed_channels(x.shape[-1], self.features,
                                        self.kernel_size, "formula")
            # the logical block gets the torch init (the temporal conv's
            # kaiming bound uses the LOGICAL fan-in, as the formula model
            # would); the pad block is exactly zero — and stays zero, see
            # intermed_channels
            sp_init = _zero_padded_init(torch_conv_kernel_init,
                                        n_logical=logical, axis=-1)
            tmp_init = _zero_padded_init(
                _bounded_uniform_init(kt * logical),
                n_logical=logical, axis=-2)
        x = Conv3d(mid, (1, kh, kw), stride=(1, sh, sw), padding=(0, ph, pw),
                   use_bias=self.use_bias, dtype=self.dtype,
                   kernel_init=sp_init, name="spatial_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, not train)
        x = nn.relu(x)
        x = Conv3d(self.features, (kt, 1, 1), stride=(st, 1, 1), padding=(pt, 0, 0),
                   use_bias=self.use_bias, dtype=self.dtype,
                   kernel_init=tmp_init, name="temporal_conv")(x)
        return x


class ResBlock21d(nn.Module):
    """Residual block of two SpatioTemporalConvs (reference r21d.py:73-122).

    ``spatial_only_downsample`` reproduces SpatialDownTemporalResBlock
    (reference r21d.py:125-173): stride (1,2,2) instead of 2.
    """

    features: int
    downsample: bool = False
    spatial_only_downsample: bool = False
    dtype: Any = jnp.float32
    mid_mode: str = "formula"

    @nn.compact
    def __call__(self, x, train: bool):
        stride = 1
        if self.downsample:
            stride = (1, 2, 2) if self.spatial_only_downsample else 2
        res = SpatioTemporalConv(self.features, 3, stride=stride, padding=1,
                                 dtype=self.dtype, mid_mode=self.mid_mode,
                                 name="conv1")(x, train)
        res = BatchNorm(dtype=self.dtype, name="bn1")(res, not train)
        res = nn.relu(res)
        res = SpatioTemporalConv(self.features, 3, stride=1, padding=1,
                                 dtype=self.dtype, mid_mode=self.mid_mode,
                                 name="conv2")(res, train)
        res = BatchNorm(dtype=self.dtype, name="bn2")(res, not train)
        if self.downsample:
            x = SpatioTemporalConv(self.features, 1, stride=stride,
                                   dtype=self.dtype, mid_mode=self.mid_mode,
                                   name="downsample_conv")(x, train)
            x = BatchNorm(dtype=self.dtype, name="downsample_bn")(x, not train)
        return nn.relu(x + res)


class R2Plus1DNet(nn.Module):
    """Reference backbone/r21d.py:214-266 (R2Plus1DNet).

    ``multi_level`` returns the per-stage feature maps as well (reference
    forward's ret_frame_feature/multi_level path, r21d.py:239-266).
    """

    layer_sizes: Sequence[int] = (1, 1, 1, 1)
    dtype: Any = jnp.float32
    mid_mode: str = "formula"  # 'tile128' = TPU-tile-aligned mid widths

    @nn.compact
    def __call__(self, x, train: bool = False, multi_level: bool = False):
        x = SpatioTemporalConv(64, (3, 7, 7), stride=(1, 2, 2), padding=(1, 3, 3),
                               dtype=self.dtype, mid_mode=self.mid_mode,
                               name="conv1")(x, train)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, not train)
        x = nn.relu(x)
        feats = []
        widths = (64, 128, 256, 512)
        for li, (width, n_blocks) in enumerate(zip(widths, self.layer_sizes)):
            for bi in range(n_blocks):
                down = li > 0 and bi == 0
                x = ResBlock21d(width, downsample=down, dtype=self.dtype,
                                mid_mode=self.mid_mode,
                                name=f"layer{li + 1}_block{bi}")(x, train)
            feats.append(x)
        if multi_level:
            return x, feats
        return x


def embed_formula_tree(src, dst_template):
    """Embed a mid_mode='formula' r21d variable tree (params OR batch_stats)
    into the matching mid_mode='pad128' structure: leaves whose shapes agree
    pass through; mid-width-mismatched leaves are padded on the mismatched
    axes — zeros for weights/bias/mean, ones for BN ``scale`` and ``var``
    (the pad128 init values; any pad value is function-exact since the pad
    activations are identically zero). Use for loading trained 'r21d'
    checkpoints (ours or converted reference ones) into 'r21d_pad128'."""
    from jax.tree_util import tree_flatten_with_path, tree_unflatten, keystr

    src_leaves, src_def = tree_flatten_with_path(src)
    dst_leaves, dst_def = tree_flatten_with_path(dst_template)
    dst_map = {keystr(p): v for p, v in dst_leaves}
    out = {}
    for path, leaf in src_leaves:
        k = keystr(path)
        if k not in dst_map:
            raise KeyError(f"{k} not in pad128 template")
        want = dst_map[k].shape
        leaf = jnp.asarray(leaf)
        if tuple(leaf.shape) == tuple(want):
            out[k] = leaf.astype(dst_map[k].dtype)
            continue
        fill = 1.0 if k.rsplit("'", 2)[-2] in ("scale", "var") else 0.0
        pad = [(0, w - s) for s, w in zip(leaf.shape, want)]
        if any(p[1] < 0 for p in pad):
            raise ValueError(f"{k}: src {leaf.shape} larger than dst {want}")
        out[k] = jnp.pad(leaf, pad, constant_values=fill).astype(
            dst_map[k].dtype)
    missing = [k for k in dst_map if k not in out]
    if missing:
        raise KeyError(f"template leaves absent from src: {missing[:5]}")
    return tree_unflatten(dst_def, [out[keystr(p)] for p, _ in dst_leaves])
