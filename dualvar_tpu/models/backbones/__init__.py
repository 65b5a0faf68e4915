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

import flax.linen as nn
import jax.numpy as jnp

from .c3d import C3D
from .r3d import R3DNet
from .r21d import R2Plus1DNet
from .resnet_2d3d import (R2D3D18_SPEC, R2D3D50_SPEC, ResNet2d3d,
                          r2d3d18, r2d3d50)
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


def select_backbone(network: str, dtype=jnp.float32, remat: bool = False):
    """name -> (module, {'feature_size': int}). Reference select_backbone.py:7.

    ``remat``: wrap the backbone in ``nn.remat`` (rematerialize its
    activations in the backward pass instead of keeping them live). Numerics
    are unchanged — BN batch statistics still see the full (B * n_views)
    batch — at ~1/3 more FLOPs; this is the parity-safe lever that lets the
    r21d paper config fit B=64 on one v5e (channel-padded (2+1)D mid widths
    inflate its activations 1.3-2x under bf16 tiling).
    """

    def cls(c, *static):
        if remat:
            # static_argnums counts self: (self, x, train). Call rematted
            # backbones with exactly (x, train) positionally — jax.remat
            # validates indices against the actual arg count, so r21d's
            # optional multi_level arg must not be passed (get_features,
            # the only multi_level user, is a no-remat visualization path).
            return nn.remat(c, static_argnums=static or (2,))
        return c

    if network == "s3d":
        return cls(S3D)(dtype=dtype), {"feature_size": 1024}
    if network == "s3dg":
        return cls(S3D)(gating=True, dtype=dtype), {"feature_size": 1024}
    if network == "s3d_packed":
        # TPU-native variant with EXACT math parity: branch-packed
        # SepInception (one merged 1x1 matmul + block-diagonal separable
        # convs) — same function, different param layout; convert
        # checkpoints with s3dg.pack_s3d_params/unpack_s3d_params.
        # Measured SLOWER than the standard form on v5e (94.3 vs 91.9 ms
        # at B=64; s3dg 96.9 vs 93.0): S3D is bandwidth-bound (arith
        # intensity 69.6 FLOP/byte vs the 240.5 roofline knee,
        # scripts/s3d_bw_accounting.py), so merging convs adds block-diag
        # FLOPs/bytes without relieving the actual bottleneck — kept as
        # the recorded round-5 attempt (like r21d_pad128)
        return cls(S3D)(packed=True, dtype=dtype), {"feature_size": 1024}
    if network == "s3dg_packed":
        return cls(S3D)(gating=True, packed=True, dtype=dtype), {
            "feature_size": 1024}
    if network == "c3d":
        return cls(C3D)(dtype=dtype), {"feature_size": 512}
    if network == "r3d":
        return cls(R3DNet)(dtype=dtype), {"feature_size": 512}
    if network == "r21d":
        return cls(R2Plus1DNet)(dtype=dtype), {"feature_size": 512}
    if network == "r21d_tiled":
        # TPU-native variant (NOT reference parity): (2+1)D mid widths
        # snapped to 128-lane tiles; see r21d.intermed_channels
        return cls(R2Plus1DNet)(dtype=dtype, mid_mode="tile128"), {
            "feature_size": 512}
    if network == "r21d_pad128":
        # TPU-native variant WITH exact parity: formula mid widths padded
        # to 128-lane tiles by structurally-zero channels that provably
        # stay zero through training — same function and trajectory as
        # 'r21d'; see r21d.intermed_channels. Measured SLOWER than 'r21d'
        # on v5e (284.1 vs 267.4 ms/step, B=32 flagship): the pad FLOPs
        # are real while XLA handles ragged widths cheaply — a recorded
        # dead end as a perf lever (PARITY.md round-4 continuation), kept
        # for parity-exact tile-alignment experiments
        return cls(R2Plus1DNet)(dtype=dtype, mid_mode="pad128"), {
            "feature_size": 512}
    if network == "r2d3d18":
        return cls(ResNet2d3d)(**R2D3D18_SPEC, dtype=dtype), {
            "feature_size": 256}
    if network == "r50":
        return cls(ResNet2d3d)(**R2D3D50_SPEC, dtype=dtype), {
            "feature_size": 1024}
    raise NotImplementedError(f"unknown backbone {network!r}")
