"""Small shared utilities (reference utils/utils.py odds and ends)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..aug.functional import IMAGENET_MEAN, IMAGENET_STD


def calc_mask_accuracy(output: jnp.ndarray, target_mask: jnp.ndarray,
                       ks=(1,)) -> tuple[jnp.ndarray, ...]:
    """Top-k accuracy against a multi-hot target mask (reference
    utils/utils.py:95-109): a hit when any of the top-k predictions is a
    positive in the mask."""
    maxk = min(max(ks), output.shape[-1])
    _, pred = jax.lax.top_k(output, maxk)  # (B, maxk)
    hits = jnp.take_along_axis(target_mask, pred, axis=1) > 0  # (B, maxk)
    return tuple(
        jnp.mean(jnp.any(hits[:, : min(k, maxk)], axis=1).astype(jnp.float32))
        for k in ks
    )


def batch_denorm(x: jnp.ndarray, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> jnp.ndarray:
    """Invert channel normalisation for visualisation, channels-last
    (reference utils/utils.py:65-72 operates on the torch channel axis)."""
    mean = jnp.asarray(mean, x.dtype)
    std = jnp.asarray(std, x.dtype)
    return x * std + mean
