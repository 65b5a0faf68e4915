"""Backbone registry.

Parity with reference backbone/select_backbone.py:7-32: name ->
(flax module, {'feature_size': int}). All backbones consume channels-last
(B, T, H, W, C) clips and return post-ReLU 5-D feature maps (except
resnet_2d3d whose final block intentionally omits the last ReLU, reference
resnet_2d3d.py:247-251 — same as the reference).

r50 note: the reference registry claims feature_size 2048 but its r2d3d50
actually emits 1024 channels (and its construction crashes; see
resnet_2d3d.py module docstring). We register the true width.
"""

from __future__ import annotations

import jax.numpy as jnp

from .c3d import C3D
from .r3d import R3DNet
from .r21d import R2Plus1DNet
from .resnet_2d3d import ResNet2d3d, r2d3d18, r2d3d50
from .s3dg import S3D

__all__ = [
    "select_backbone",
    "C3D",
    "R3DNet",
    "R2Plus1DNet",
    "ResNet2d3d",
    "S3D",
    "r2d3d18",
    "r2d3d50",
]


def select_backbone(network: str, dtype=jnp.float32):
    """name -> (module, {'feature_size': int}). Reference select_backbone.py:7."""
    if network == "s3d":
        return S3D(dtype=dtype), {"feature_size": 1024}
    if network == "s3dg":
        return S3D(gating=True, dtype=dtype), {"feature_size": 1024}
    if network == "c3d":
        return C3D(dtype=dtype), {"feature_size": 512}
    if network == "r3d":
        return R3DNet(dtype=dtype), {"feature_size": 512}
    if network == "r21d":
        return R2Plus1DNet(dtype=dtype), {"feature_size": 512}
    if network == "r2d3d18":
        return r2d3d18(dtype=dtype), {"feature_size": 256}
    if network == "r50":
        return r2d3d50(dtype=dtype), {"feature_size": 1024}
    raise NotImplementedError(f"unknown backbone {network!r}")
