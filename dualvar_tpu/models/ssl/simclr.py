"""SimCLR models: naked NT-Xent and the DualVar TimeSeriesV4 variant.

Parity: reference model/simclr.py. Forward contracts:

* ``SimCLRNaked``: ``block`` (B, 2, T, H, W, C) -> dict of
  clip_{logits,labels,contrast_loss}. Reference model/simclr.py:19-121.
* ``SimCLRTimeSeriesV4``: ``block`` (B, 3, T, H, W, C) — views [clip1-aug-a,
  clip2, clip1-aug-b] as assembled by the stage-prototype dataset
  (dataset/local_dataset.py:291-292) — -> dict with clip NT-Xent, TC
  contrastive, and the two shuffle-rank margin losses. Reference
  model/simclr.py:130-400.

The per-sample segment permutation for shuffle-rank is drawn from the
``shuffle`` rng collection unless an explicit ``perm`` (B, n_series) is given
(tests pass one for determinism). The reference draws it with numpy on the
host (model/simclr.py:379-381).

Distribution note: the reference all-gathers features for global negatives
(GatherLayer). Here the loss functions see the global batch under jit; see
models/ssl/losses.py.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..backbones import select_backbone
from ..heads import MLPHead
from ..layers import global_avg_pool3d, l2_normalize
from .losses import nt_xent_loss, shuffle_rank_loss, tc_contrast_loss_global


def random_segment_perms(rng: jax.Array, batch: int, n_series: int) -> jax.Array:
    """Per-sample permutations of the n_series segments, (B, n_series) int32."""
    keys = jax.random.split(rng, batch)
    return jax.vmap(lambda k: jax.random.permutation(k, n_series))(keys).astype(
        jnp.int32
    )


def apply_segment_perm(clip: jax.Array, perm: jax.Array, n_series: int) -> jax.Array:
    """Temporally shuffle a clip's segments: (B, T, H, W, C) x (B, s) -> same.

    Segment s of the output is segment perm[s] of the input (gather — reference
    model/simclr.py:378-383 torch.gather).
    """
    B, T, H, W, C = clip.shape
    seg = clip.reshape(B, n_series, T // n_series, H, W, C)
    shuffled = jnp.take_along_axis(seg, perm[:, :, None, None, None, None], axis=1)
    return shuffled.reshape(B, T, H, W, C)


def calibrate_shuffled(series_feats: jax.Array, perm: jax.Array) -> jax.Array:
    """Scatter per-segment embeddings of a shuffled clip back into original order.

    calibrated[b, perm[b, s]] = series_feats[b, s] (reference torch.scatter
    self-calibration, model/simclr.py:389-392), i.e. a gather with the inverse
    permutation.
    """
    inv = jnp.argsort(perm, axis=1)
    return jnp.take_along_axis(series_feats, inv[:, :, None], axis=1)


class SimCLRNaked(nn.Module):
    """Reference model/simclr.py:19-121 (SimCLR_Naked)."""

    network: str = "s3d"
    dim: int = 128
    temperature: float = 0.07
    nonlinear: bool = True
    dtype: Any = jnp.float32
    # rematerialize backbone activations in the backward pass (numerics
    # unchanged, ~1/3 more FLOPs, large activation-memory saving)
    remat: bool = False

    def setup(self):
        backbone, param = select_backbone(self.network, self.dtype,
                                          remat=self.remat)
        self.backbone = backbone
        self.feature_size = param["feature_size"]
        if self.nonlinear:
            self.clip_head = MLPHead(self.dim, name="clip_head")

    def encode(self, x, train: bool):
        # positional call: nn.remat's static_argnums are positional indices
        pooled = global_avg_pool3d(self.backbone(x, train)).astype(jnp.float32)
        emb = self.clip_head(pooled) if self.nonlinear else pooled
        return l2_normalize(emb, axis=1)

    def __call__(self, block, train: bool = True):
        B, n_views = block.shape[:2]
        assert n_views == 2, block.shape
        x = block.reshape(B * n_views, *block.shape[2:])
        emb = self.encode(x, train).reshape(B, n_views, -1)
        return nt_xent_loss(emb, self.temperature, "clip_")

    def get_features(self, x, train: bool = False):
        """Per-stage channel-mean attention maps for visualization
        (reference model/simclr.py:123-127 get_features; requires a backbone
        with a multi_level forward, i.e. r21d)."""
        if self.remat:
            raise ValueError(
                "get_features needs the backbone's multi_level arg, which "
                "the rematted wrapper does not expose; construct the model "
                "with remat=False for visualization")
        _, feats = self.backbone(x, train=train, multi_level=True)
        return [jnp.mean(f, axis=-1) for f in feats]


class SimCLRTimeSeriesV4(nn.Module):
    """Reference model/simclr.py:130-400 (SimCLR_TimeSeriesV4)."""

    network: str = "r21d"
    dim: int = 128
    temperature: float = 0.07
    n_series: int = 2
    series_dim: int = 64
    series_T: float = 0.07  # kept for config parity; unused, as in the reference
    aligned_T: float = 0.07
    mode: str = "clip-sr-tc"
    shufflerank_theta: float = 0.05
    dtw_gamma: float = 0.1
    nonlinear: bool = True
    dtype: Any = jnp.float32
    remat: bool = False  # see SimCLRNaked.remat
    # pack the SR shuffled pass into the main encode: one (4B) backbone
    # batch instead of (3B) + (B) (round-4 VERDICT #4). Train-mode BN sees
    # the merged batch — a documented divergence from the reference's
    # separate passes (model/simclr.py:374-398); eval-mode is bitwise
    # identical. See core/config.py ModelConfig.packed_encode.
    packed_encode: bool = False

    @property
    def with_clip(self):
        return "clip" in self.mode

    @property
    def with_sr(self):
        return "sr" in self.mode

    @property
    def with_tc(self):
        # 'clip-sr-tc' (paper default, mean similarity) or 'clip-sr-dtw'
        # (soft-DTW-aligned TC, the reference's ablation as a first-class mode)
        return "tc" in self.mode or "dtw" in self.mode

    @property
    def tc_align(self):
        return "dtw" if "dtw" in self.mode else "mean"

    def setup(self):
        backbone, param = select_backbone(self.network, self.dtype,
                                          remat=self.remat)
        self.backbone = backbone
        self.feature_size = param["feature_size"]
        if self.nonlinear and self.with_clip:
            self.clip_head = MLPHead(self.dim, name="clip_head")
        self.series_head = MLPHead(self.series_dim * self.n_series, name="series_head")

    def pool_backbone(self, x, train: bool):
        # positional call: nn.remat's static_argnums are positional indices
        return global_avg_pool3d(self.backbone(x, train)).astype(jnp.float32)

    def __call__(self, block, perm=None, train: bool = True):
        B, n_views = block.shape[:2]
        assert n_views == 3, block.shape
        x = block.reshape(B * 3, *block.shape[2:])

        packed_sr = self.with_sr and self.packed_encode
        sh_pooled = None
        if packed_sr:
            # one (4B) backbone batch [v0, v1, v2, shuffled] instead of
            # (3B) + (B) — fewer conv chains, better MXU occupancy; BN
            # train stats merge across the views (documented divergence,
            # see class docstring on packed_encode)
            if perm is None:
                perm = random_segment_perms(
                    self.make_rng("shuffle"), B, self.n_series)
            shuffled = apply_segment_perm(block[:, 2], perm, self.n_series)
            pooled_all = self.pool_backbone(
                jnp.concatenate([x, shuffled], axis=0), train)  # (4B, feat)
            pooled, sh_pooled = pooled_all[:3 * B], pooled_all[3 * B:]
        else:
            pooled = self.pool_backbone(x, train)  # (3B, feat)

        ret: dict[str, jax.Array] = {}
        if self.with_clip:
            # nonlinear=False uses the pooled feature directly, as in
            # SimCLRNaked.encode (reference model/simclr.py:167-170)
            clip_emb = self.clip_head(pooled) if self.nonlinear else pooled
            clip_emb = l2_normalize(clip_emb, axis=1)
            clip_emb = clip_emb.reshape(B, 3, clip_emb.shape[-1])[:, :2]
            ret.update(nt_xent_loss(clip_emb, self.temperature, "clip_"))

        series = self.series_head(pooled).reshape(
            B, 3, self.n_series, self.series_dim
        )
        series = l2_normalize(series, axis=-1)
        if self.with_tc:
            ret.update(tc_contrast_loss_global(
                series[:, :2], self.aligned_T, "tc_",
                align=self.tc_align, dtw_gamma=self.dtw_gamma))

        if self.with_sr:
            if not packed_sr:
                if perm is None:
                    perm = random_segment_perms(
                        self.make_rng("shuffle"), B, self.n_series
                    )
                extra = block[:, 2]
                shuffled = apply_segment_perm(extra, perm, self.n_series)
                sh_pooled = self.pool_backbone(shuffled, train)
            sh_series = l2_normalize(
                self.series_head(sh_pooled).reshape(B, self.n_series, self.series_dim),
                axis=-1,
            )
            calibrated = calibrate_shuffled(sh_series, perm)
            # views 0 (first aug of clip1) and 2 (second aug of clip1) each pair
            # with the calibrated shuffled embedding (reference simclr.py:395-398)
            pair_v0 = jnp.stack([series[:, 0], calibrated], axis=2)
            pair_v2 = jnp.stack([series[:, 2], calibrated], axis=2)
            ret.update(
                shuffle_rank_loss(
                    pair_v0, self.shufflerank_theta, 0.5, "aug_ranking_", clip_max=5.0
                )
            )
            ret.update(
                shuffle_rank_loss(
                    pair_v2, self.shufflerank_theta, 0.5, "unaug_ranking_", clip_max=5.0
                )
            )
        return ret

    def get_features(self, x, train: bool = False):
        """Per-stage channel-mean attention maps for visualization — the
        TSV4 counterpart of SimCLRNaked.get_features (the reference defines
        it only on the SimCLR base, model/simclr.py:123-127; round-4 VERDICT
        asked for it on every pretrain model). Requires a multi_level
        backbone (r21d) and remat=False."""
        if self.remat:
            raise ValueError(
                "get_features needs the backbone's multi_level arg, which "
                "the rematted wrapper does not expose; construct the model "
                "with remat=False for visualization")
        _, feats = self.backbone(x, train=train, multi_level=True)
        return [jnp.mean(f, axis=-1) for f in feats]
