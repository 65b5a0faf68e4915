"""C3D — plain 5-stage 3D CNN with batch norm.

Capability parity with reference backbone/c3d.py: five conv stages with BN and
max pooling (pool1 spatial-only). Output for (B, 16, 112, 112, 3) is
(B, 2, 7, 7, 512); 27,661,440 parameters.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..layers import BatchNorm, Conv3d, max_pool3d


class C3D(nn.Module):
    """Reference backbone/c3d.py:9-83."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        def cbr(x, ch, name):
            x = Conv3d(ch, 3, padding=1, use_bias=True, dtype=self.dtype,
                       name=f"conv{name}")(x)
            x = BatchNorm(dtype=self.dtype, name=f"bn{name}")(x, not train)
            return nn.relu(x)

        x = cbr(x, 64, "1")
        x = max_pool3d(x, (1, 2, 2), (1, 2, 2))
        x = cbr(x, 128, "2")
        x = max_pool3d(x, 2, 2)
        x = cbr(x, 256, "3a")
        x = cbr(x, 256, "3b")
        x = max_pool3d(x, 2, 2)
        x = cbr(x, 512, "4a")
        x = cbr(x, 512, "4b")
        x = max_pool3d(x, 2, 2)
        x = cbr(x, 512, "5a")
        x = cbr(x, 512, "5b")
        return x
