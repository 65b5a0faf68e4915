"""R3D — full-3D ResNet video backbone.

Capability parity with reference backbone/r3d.py (R3DNet, layer_sizes
(1,1,1,1)): conv1 3x7x7 stride (1,2,2), four residual stages with 3x3x3
convolutions, stages 2-4 downsampling time and space by 2. Output for a
(B, 16, 112, 112, 3) clip is (B, 2, 7, 7, 512); 14,361,792 parameters.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import BatchNorm, Conv3d, StemConv7x7


class ResBlock3d(nn.Module):
    """conv-bn-relu-conv-bn + identity/downsample, final relu.

    Parity: reference backbone/r3d.py:41-89 (SpatioTemporalResBlock).
    When ``downsample`` the first conv and the shortcut use stride 2 on all
    three axes.
    """

    features: int
    downsample: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        stride = 2 if self.downsample else 1
        res = Conv3d(self.features, 3, stride=stride, padding=1, use_bias=False,
                     dtype=self.dtype, name="conv1")(x)
        res = BatchNorm(dtype=self.dtype, name="bn1")(res, not train)
        res = nn.relu(res)
        res = Conv3d(self.features, 3, stride=1, padding=1, use_bias=False,
                     dtype=self.dtype, name="conv2")(res)
        res = BatchNorm(dtype=self.dtype, name="bn2")(res, not train)
        if self.downsample:
            x = Conv3d(self.features, 1, stride=2, padding=0, use_bias=False,
                       dtype=self.dtype, name="downsample_conv")(x)
            x = BatchNorm(dtype=self.dtype, name="downsample_bn")(x, not train)
        return nn.relu(x + res)


class R3DNet(nn.Module):
    """Reference backbone/r3d.py:126-157 (R3DNet)."""

    layer_sizes: Sequence[int] = (1, 1, 1, 1)
    s2d_stem: bool = True  # space-to-depth stem (numerically identical,
    # ~2% step win on v5e: the C=3 stem wastes 125/128 MXU lanes; s2d feeds
    # 12 channels at quarter spatial positions. Falls back for odd H/W.)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.s2d_stem and x.shape[2] % 2 == 0 and x.shape[3] % 2 == 0:
            x = StemConv7x7(64, kt=3, dtype=self.dtype, name="conv1")(x)
        else:
            x = Conv3d(64, (3, 7, 7), stride=(1, 2, 2), padding=(1, 3, 3),
                       use_bias=False, s2d_stem=self.s2d_stem,
                       dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, not train)
        x = nn.relu(x)
        widths = (64, 128, 256, 512)
        for li, (width, n_blocks) in enumerate(zip(widths, self.layer_sizes)):
            for bi in range(n_blocks):
                down = li > 0 and bi == 0
                x = ResBlock3d(width, downsample=down, dtype=self.dtype,
                               name=f"layer{li + 1}_block{bi}")(x, train)
        return x
