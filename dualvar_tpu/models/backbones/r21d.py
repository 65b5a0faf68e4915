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

from ..layers import BatchNorm, Conv3d, _triple


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
        x = Conv3d(mid, (1, kh, kw), stride=(1, sh, sw), padding=(0, ph, pw),
                   use_bias=self.use_bias, dtype=self.dtype, name="spatial_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, not train)
        x = nn.relu(x)
        x = Conv3d(self.features, (kt, 1, 1), stride=(st, 1, 1), padding=(pt, 0, 0),
                   use_bias=self.use_bias, dtype=self.dtype, name="temporal_conv")(x)
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
