"""Projection heads and the linear/finetune classifier head.

The reference implements projection heads as 1x1x1 Conv3d stacks applied to
the (B, C, 1, 1, 1) pooled feature (model/simclr.py:164-180); on pooled
features a 1x1x1 conv is exactly a Dense layer, which is how we write it
(torch Conv default init kept for weight-distribution parity).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import global_avg_pool3d, l2_normalize


def _torch_dense_kernel_init(key, shape, dtype=jnp.float32):
    # torch Conv3d(k=1) / Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _torch_dense_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class MLPHead(nn.Module):
    """Dense(feat) -> ReLU -> Dense(out): the nonlinear projection head.

    Parity: model/simclr.py:167-172 (clip head) and :176-180 (series head).
    """

    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        x = nn.Dense(feat, kernel_init=_torch_dense_kernel_init,
                     bias_init=_torch_dense_bias_init(feat),
                     dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, kernel_init=_torch_dense_kernel_init,
                     bias_init=_torch_dense_bias_init(feat),
                     dtype=self.dtype, name="fc2")(x)
        return x


class LinearClassifier(nn.Module):
    """Backbone + global avgpool + (l2norm|final BN|dropout) + FC logits.

    Parity: model/classifier.py:10-63. Returns (logits, pooled_features);
    the pooled feature is what retrieval consumes (classifier.py:888-890).
    """

    backbone: nn.Module
    feature_size: int
    num_class: int = 101
    dropout_rate: float = 0.5
    use_dropout: bool = True
    use_l2_norm: bool = False
    use_final_bn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # positional call: nn.remat's static_argnums are positional indices
        feat3d = self.backbone(x, train)
        feat = global_avg_pool3d(feat3d).astype(jnp.float32)  # (B, C)
        if self.use_l2_norm:
            feat = l2_normalize(feat, axis=1)
        h = feat
        if self.use_final_bn:
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                name="final_bn",
            )(h)
        if self.use_dropout:
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        # final_fc init: normal(0, 0.01) weights, zero bias (classifier.py:65-70)
        logit = nn.Dense(
            self.num_class,
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.zeros,
            name="final_fc",
        )(h)
        return logit, feat
