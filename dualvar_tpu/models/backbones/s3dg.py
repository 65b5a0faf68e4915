"""S3D / S3D-G — separable-Inception video network with optional self-gating.

Capability parity with reference backbone/s3dg.py: STConv3d separable
convolutions, SepInception blocks, per-branch SelfGating when ``gating``.
Output for (B, 16, 112, 112, 3) is (B, 2, 3, 3, 1024); 7,910,048 parameters
(S3D) / 9,098,000 (S3D-G).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import BatchNorm, Conv3d, max_pool3d, normal_init


class BasicConv3d(nn.Module):
    """conv(bias=False) -> BN -> ReLU; conv init normal(0, 0.01).

    Parity: reference backbone/s3dg.py:8-28.
    """

    features: int
    kernel_size: Any = 1
    stride: Any = 1
    padding: Any = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = Conv3d(self.features, self.kernel_size, stride=self.stride,
                   padding=self.padding, use_bias=False,
                   kernel_init=normal_init(0.01), dtype=self.dtype, name="conv")(x)
        x = BatchNorm(dtype=self.dtype, name="bn")(x, not train)
        return nn.relu(x)


class STConv3d(nn.Module):
    """Separable (1,k,k)+(k,1,1) conv pair, each with BN+ReLU.

    Parity: reference backbone/s3dg.py:30-65. An int stride applies to both
    factors' own axes; a tuple stride (t, s, s) puts t on the temporal factor.
    """

    features: int
    kernel_size: int
    stride: Any = 1
    padding: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        if isinstance(self.stride, (tuple, list)):
            t_stride, stride = self.stride[0], self.stride[-1]
        else:
            t_stride = stride = self.stride
        k, p = self.kernel_size, self.padding
        x = Conv3d(self.features, (1, k, k), stride=(1, stride, stride),
                   padding=(0, p, p), use_bias=False,
                   kernel_init=normal_init(0.01), dtype=self.dtype, name="conv1")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, not train)
        x = nn.relu(x)
        x = Conv3d(self.features, (k, 1, 1), stride=(t_stride, 1, 1),
                   padding=(p, 0, 0), use_bias=False,
                   kernel_init=normal_init(0.01), dtype=self.dtype, name="conv2")(x)
        x = BatchNorm(dtype=self.dtype, name="bn2")(x, not train)
        return nn.relu(x)


class SelfGating(nn.Module):
    """S3D-G feature gating: sigmoid(fc(spatiotemporal mean)) * x.

    Parity: reference backbone/s3dg.py:68-78.
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        avg = jnp.mean(x, axis=(1, 2, 3))  # (B, C)
        w = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc")(avg)
        w = nn.sigmoid(w)
        return w[:, None, None, None, :] * x


class SepInception(nn.Module):
    """4-branch separable Inception block (reference s3dg.py:81-132)."""

    out_planes: Sequence[int]  # [b0, b1a, b1b, b2a, b2b, b3b]
    gating: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        b0, b1a, b1b, b2a, b2b, b3b = self.out_planes
        x0 = BasicConv3d(b0, 1, dtype=self.dtype, name="branch0")(x, train)
        x1 = BasicConv3d(b1a, 1, dtype=self.dtype, name="branch1_0")(x, train)
        x1 = STConv3d(b1b, 3, padding=1, dtype=self.dtype, name="branch1_1")(x1, train)
        x2 = BasicConv3d(b2a, 1, dtype=self.dtype, name="branch2_0")(x, train)
        x2 = STConv3d(b2b, 3, padding=1, dtype=self.dtype, name="branch2_1")(x2, train)
        x3 = max_pool3d(x, 3, 1, 1)
        x3 = BasicConv3d(b3b, 1, dtype=self.dtype, name="branch3_1")(x3, train)
        if self.gating:
            x0 = SelfGating(dtype=self.dtype, name="gating_b0")(x0)
            x1 = SelfGating(dtype=self.dtype, name="gating_b1")(x1)
            x2 = SelfGating(dtype=self.dtype, name="gating_b2")(x2)
            x3 = SelfGating(dtype=self.dtype, name="gating_b3")(x3)
        return jnp.concatenate([x0, x1, x2, x3], axis=-1)


class S3D(nn.Module):
    """Reference backbone/s3dg.py:135-217 (S3D / S3D-G)."""

    gating: bool = False
    slow: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        g, dt = self.gating, self.dtype
        stride1 = (1, 2, 2) if self.slow else 2
        x = STConv3d(64, 7, stride=stride1, padding=3, dtype=dt, name="Conv_1a")(x, train)
        # block2
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = BasicConv3d(64, 1, dtype=dt, name="Conv_2b")(x, train)
        x = STConv3d(192, 3, padding=1, dtype=dt, name="Conv_2c")(x, train)
        # block3
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = SepInception([64, 96, 128, 16, 32, 32], g, dt, name="Mixed_3b")(x, train)
        x = SepInception([128, 128, 192, 32, 96, 64], g, dt, name="Mixed_3c")(x, train)
        # block4
        x = max_pool3d(x, 3, 2, 1)
        x = SepInception([192, 96, 208, 16, 48, 64], g, dt, name="Mixed_4b")(x, train)
        x = SepInception([160, 112, 224, 24, 64, 64], g, dt, name="Mixed_4c")(x, train)
        x = SepInception([128, 128, 256, 24, 64, 64], g, dt, name="Mixed_4d")(x, train)
        x = SepInception([112, 144, 288, 32, 64, 64], g, dt, name="Mixed_4e")(x, train)
        x = SepInception([256, 160, 320, 32, 128, 128], g, dt, name="Mixed_4f")(x, train)
        # block5
        x = max_pool3d(x, 2, 2, 0)
        x = SepInception([256, 160, 320, 32, 128, 128], g, dt, name="Mixed_5b")(x, train)
        x = SepInception([384, 192, 384, 48, 128, 128], g, dt, name="Mixed_5c")(x, train)
        return x
