"""MoCo models: momentum key encoder + ring-buffer negative queue.

Parity: reference model/moco.py. The torch reference mutates module buffers
(queue, queue_ptr) and the key encoder's parameters in-place under no_grad;
here all of that is explicit state — ``MoCoState`` — threaded through the
jitted train step:

* ``params_k`` / ``batch_stats_k``: the EMA key encoder (reference
  moco.py:103-107 _momentum_update_key_encoder). The key encoder's BN running
  stats evolve from its own forward passes, exactly like torch BN in train
  mode under no_grad.
* ``queue`` (K, dim) and ``series_queue`` (K, n_series*series_dim): row-major
  ring buffers (the reference stores them column-major, moco.py:319-323) with
  a single shared ``ptr``, updated by ``dequeue_and_enqueue`` via
  ``lax.dynamic_update_slice`` (reference moco.py:109-126; the K % batch == 0
  requirement carries over).
* MoCo's BN batch-shuffle (moco.py:128-173) exists to defeat per-GPU BN
  statistics leakage. This build computes *global*-batch BN under jit
  (SyncBN semantics), which removes the leak the shuffle worked around, so no
  shuffle is performed — a documented, benign divergence (SURVEY.md §7).

``MoCoEncoder`` is the shared encoder architecture (backbone + pool + clip
head + series head); query and key are two parameter trees over the same
module. ``moco_*_forward`` are pure functions used by the training task.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..backbones import select_backbone
from ..heads import MLPHead
from ..layers import global_avg_pool3d, l2_normalize
from .losses import moco_contrast_loss, moco_tc_contrast_loss, shuffle_rank_loss
from .simclr import apply_segment_perm, calibrate_shuffled, random_segment_perms


class MoCoEncoder(nn.Module):
    """backbone + global pool + clip MLP head + series MLP head.

    Reference moco.py:279-292 (encoder_q + series_proj_head_q); the key
    encoder is the same architecture with its own parameters.
    """

    network: str = "s3d"
    dim: int = 128
    n_series: int = 2
    series_dim: int = 64
    nonlinear: bool = True
    with_series: bool = True
    dtype: Any = jnp.float32
    remat: bool = False  # see SimCLRNaked.remat

    def setup(self):
        backbone, param = select_backbone(self.network, self.dtype,
                                          remat=self.remat)
        self.backbone = backbone
        self.feature_size = param["feature_size"]
        if self.nonlinear:
            self.clip_head = MLPHead(self.dim, name="clip_head")
        if self.with_series:
            self.series_head = MLPHead(
                self.series_dim * self.n_series, name="series_head"
            )

    def pooled(self, x, train: bool = True):
        # positional call: nn.remat's static_argnums are positional indices
        return global_avg_pool3d(self.backbone(x, train)).astype(jnp.float32)

    def __call__(self, x, train: bool = True):
        """Returns (clip_emb (B,dim) normalised, series (B,s,d) normalised)."""
        p = self.pooled(x, train)
        clip_emb = self.clip_head(p) if self.nonlinear else p
        clip_emb = l2_normalize(clip_emb, axis=1)
        series = None
        if self.with_series:
            series = l2_normalize(
                self.series_head(p).reshape(-1, self.n_series, self.series_dim),
                axis=-1,
            )
        return clip_emb, series

    def series_embed(self, x, train: bool = True):
        """backbone + pool + series head only (the SR dual pass, moco.py:551-557)."""
        p = self.pooled(x, train)
        return l2_normalize(
            self.series_head(p).reshape(-1, self.n_series, self.series_dim), axis=-1
        )

    def get_features(self, x, train: bool = False):
        """Per-stage channel-mean attention maps (query encoder) for
        visualization — the MoCo counterpart of SimCLRNaked.get_features
        (reference model/simclr.py:123-127; round-4 VERDICT #8 asked for it
        on the MoCo models too). Apply against the query variables:
        ``encoder.apply(vars_q, x, method=MoCoEncoder.get_features)``.
        Requires a multi_level backbone (r21d) and remat=False."""
        if self.remat:
            raise ValueError(
                "get_features needs the backbone's multi_level arg, which "
                "the rematted wrapper does not expose; construct the encoder "
                "with remat=False for visualization")
        _, feats = self.backbone(x, train=train, multi_level=True)
        return [jnp.mean(f, axis=-1) for f in feats]


class MoCoState(struct.PyTreeNode):
    params_k: Any
    batch_stats_k: Any
    queue: jax.Array  # (K, dim)
    series_queue: jax.Array | None  # (K, n_series*series_dim) or None
    ptr: jax.Array  # () int32


def init_moco_state(
    rng: jax.Array,
    params_q,
    batch_stats_q,
    K: int,
    dim: int,
    n_series: int = 0,
    series_dim: int = 0,
) -> MoCoState:
    """Key encoder starts as a copy of the query encoder (moco.py:310-315);
    queues start as normalised gaussian noise (moco.py:317-323)."""
    k1, k2 = jax.random.split(rng)
    queue = l2_normalize(jax.random.normal(k1, (K, dim)), axis=1)
    series_queue = None
    if n_series:
        sq = jax.random.normal(k2, (K, n_series, series_dim))
        series_queue = l2_normalize(sq, axis=-1).reshape(K, n_series * series_dim)
    return MoCoState(
        params_k=jax.tree.map(jnp.copy, params_q),
        batch_stats_k=jax.tree.map(jnp.copy, batch_stats_q),
        queue=queue,
        series_queue=series_queue,
        ptr=jnp.zeros((), jnp.int32),
    )


def momentum_update(params_q, params_k, m: float):
    """k <- m*k + (1-m)*q (reference moco.py:103-107, 328-334)."""
    return jax.tree.map(lambda k, q: m * k + (1.0 - m) * q, params_k, params_q)


def dequeue_and_enqueue(queue: jax.Array, ptr: jax.Array, keys: jax.Array):
    """Ring-buffer insert of the (global) key batch at ptr.

    Reference moco.py:109-126. ``keys``: (Bg, dim) — under jit this is already
    the global batch (no concat_all_gather needed). Requires K % Bg == 0.
    """
    K, B = queue.shape[0], keys.shape[0]
    assert K % B == 0, f"queue size {K} must be divisible by global batch {B}"
    new_queue = jax.lax.dynamic_update_slice(
        queue, jax.lax.stop_gradient(keys), (ptr, jnp.int32(0))
    )
    new_ptr = (ptr + B) % K
    return new_queue, new_ptr


def shuffled_key_encode(
    encoder: MoCoEncoder,
    vars_k,
    x2: jax.Array,
    rng: jax.Array,
    groups: int,
):
    """BN batch-shuffle parity mode (reference moco.py:128-173).

    The reference shuffles the key batch across GPUs so each GPU's *local*
    BN statistics are computed on a random subset, then unshuffles. The
    default TPU build uses global-batch BN (the leak the shuffle defeats
    cannot occur), but for fidelity ablations this reproduces the per-device
    stream exactly: permute the global batch, split into ``groups``
    device-sized groups, run the key encoder vmapped over groups (BN reduces
    within each group only — per-GPU BN semantics), invert the permutation.
    Running stats take the group mean (the reference leaves per-GPU copies
    unsynced; a replicated state needs one value).
    """
    B = x2.shape[0]
    assert B % groups == 0, (B, groups)
    perm = jax.random.permutation(rng, B)
    inv = jnp.argsort(perm)
    xs = x2[perm].reshape(groups, B // groups, *x2.shape[1:])

    def enc(xg):
        (k, s), upd = encoder.apply(vars_k, xg, True, mutable=["batch_stats"])
        return k, s, upd["batch_stats"]

    k, series, bs = jax.vmap(enc)(xs)
    k = k.reshape(B, *k.shape[2:])[inv]
    if series is not None:
        series = series.reshape(B, *series.shape[2:])[inv]
    new_bs = jax.tree.map(lambda a: a.mean(axis=0), bs)
    return k, series, {"batch_stats": new_bs}


def moco_naked_forward(
    encoder: MoCoEncoder,
    variables_q,
    state: MoCoState,
    block: jax.Array,
    m: float,
    temperature: float,
    train: bool = True,
    rng: jax.Array | None = None,
    shuffle_bn_groups: int = 0,
):
    """Reference moco.py:175-239 (MoCo_Naked.forward).

    ``block``: (B, 2, T, H, W, C). Returns (ret dict, mutated q variables,
    new MoCoState). ``shuffle_bn_groups`` > 0 enables the BN batch-shuffle
    parity mode for the key pass (reference moco.py:128-173).
    """
    B = block.shape[0]
    x1, x2 = block[:, 0], block[:, 1]

    (q, _), updated_q = encoder.apply(
        variables_q, x1, train, mutable=["batch_stats"] if train else []
    )

    params_k = momentum_update(variables_q["params"], state.params_k, m) if train else state.params_k
    vars_k = {"params": params_k, "batch_stats": state.batch_stats_k}
    if train and shuffle_bn_groups:
        k, _, updated_k = shuffled_key_encode(
            encoder, vars_k, x2, rng, shuffle_bn_groups)
    else:
        (k, _), updated_k = encoder.apply(
            vars_k, x2, train, mutable=["batch_stats"] if train else []
        )
    k = jax.lax.stop_gradient(k)

    ret = moco_contrast_loss(q, k, state.queue, temperature, "clip_")

    if train:
        queue, ptr = dequeue_and_enqueue(state.queue, state.ptr, k)
        state = state.replace(
            params_k=params_k,
            batch_stats_k=updated_k["batch_stats"],
            queue=queue,
            ptr=ptr,
        )
    return ret, updated_q if train else {}, state


def moco_timeseries_forward(
    encoder: MoCoEncoder,
    variables_q,
    state: MoCoState,
    block: jax.Array,
    m: float,
    temperature: float,
    aligned_T: float,
    mode: str = "clip-sr-tc",
    dtw_gamma: float = 0.1,
    perm: jax.Array | None = None,
    rng: jax.Array | None = None,
    train: bool = True,
    shuffle_bn_groups: int = 0,
    packed_encode: bool = False,
):
    """Reference moco.py:482-573 (MoCo_TimeSeriesV4.forward).

    ``block``: (B, 3, T, H, W, C) with views [clip1-aug-a, clip2, clip1-aug-b].
    Returns (ret dict, mutated q variables, new MoCoState).
    ``shuffle_bn_groups`` > 0 enables the BN batch-shuffle parity mode for
    the key pass (reference moco.py:128-173).
    ``packed_encode`` merges the SR dual pass into the query pass — one
    (3B) batch [x1, aug_x1, shuffled] instead of (B) + (2B) (round-4
    VERDICT #4). Train-mode BN sees the merged batch: a documented
    divergence from the reference's separate passes (moco.py:551-557);
    eval-mode is bitwise identical (tests/test_packed_encode.py).
    """
    B = block.shape[0]
    n_series = encoder.n_series
    x1, x2, aug_x1 = block[:, 0], block[:, 1], block[:, 2]
    mut = ["batch_stats"] if train else []

    packed_sr = packed_encode and "sr" in mode
    if packed_sr:
        if perm is None:
            perm = random_segment_perms(rng, B, n_series)
        shuffled = apply_segment_perm(aug_x1, perm, n_series)
        packed = jnp.concatenate([x1, aug_x1, shuffled], axis=0)
        (clip_all, series_all), updated_q = encoder.apply(
            variables_q, packed, train, mutable=mut)
        q, series_q = clip_all[:B], series_all[:B]
        aug_series_p = series_all[B:2 * B]
        sh_series_p = series_all[2 * B:]
    else:
        # query pass
        (q, series_q), updated_q = encoder.apply(variables_q, x1, train,
                                                 mutable=mut)

    # momentum update then key pass (reference order, moco.py:508)
    params_k = momentum_update(variables_q["params"], state.params_k, m) if train else state.params_k
    vars_k = {"params": params_k, "batch_stats": state.batch_stats_k}
    if train and shuffle_bn_groups:
        # fold_in (not split) so the SR perm below sees the same rng stream
        # as the global-BN path
        k, series_k, updated_k = shuffled_key_encode(
            encoder, vars_k, x2, jax.random.fold_in(rng, 7), shuffle_bn_groups)
    else:
        (k, series_k), updated_k = encoder.apply(vars_k, x2, train, mutable=mut)
    k = jax.lax.stop_gradient(k)
    series_k = jax.lax.stop_gradient(series_k)

    ret: dict[str, jax.Array] = {}
    ret.update(moco_contrast_loss(q, k, state.queue, temperature, "clip_"))
    if "tc" in mode or "dtw" in mode:
        ret.update(
            moco_tc_contrast_loss(
                series_q, series_k, state.series_queue, aligned_T, "tc_",
                align="dtw" if "dtw" in mode else "mean", dtw_gamma=dtw_gamma,
            )
        )

    if train:
        queue, ptr = dequeue_and_enqueue(state.queue, state.ptr, k)
        series_queue, _ = dequeue_and_enqueue(
            state.series_queue,
            state.ptr,
            series_k.reshape(B, -1),
        )
        state = state.replace(
            params_k=params_k,
            batch_stats_k=updated_k["batch_stats"],
            queue=queue,
            series_queue=series_queue,
            ptr=ptr,
        )

    if "sr" in mode:
        if packed_sr:
            aug_series, sh_raw = aug_series_p, sh_series_p
        else:
            if perm is None:
                perm = random_segment_perms(rng, B, n_series)
            shuffled = apply_segment_perm(aug_x1, perm, n_series)
            # one 2B batched pass over [aug_x1, shuffled] (reference
            # moco.py:551-557)
            dual = jnp.concatenate([aug_x1, shuffled], axis=0)
            if train:
                # continue from the BN stats the query pass just updated
                vq = {"params": variables_q["params"],
                      "batch_stats": updated_q["batch_stats"]}
            else:
                vq = variables_q
            dual_series, updated_q2 = encoder.apply(
                vq, dual, train, method=MoCoEncoder.series_embed, mutable=mut
            )
            if train:
                updated_q = updated_q2
            aug_series, sh_raw = dual_series[:B], dual_series[B:]
        calibrated = calibrate_shuffled(sh_raw, perm)
        pair_unaug = jnp.stack([series_q, calibrated], axis=2)
        pair_aug = jnp.stack([aug_series, calibrated], axis=2)
        # MoCo variant: fixed theta 0.05, no exponent clipping (moco.py:469)
        ret.update(
            shuffle_rank_loss(pair_unaug, 0.05, 0.5, "unaug_ranking_", clip_max=None)
        )
        ret.update(
            shuffle_rank_loss(pair_aug, 0.05, 0.5, "aug_ranking_", clip_max=None)
        )

    return ret, updated_q if train else {}, state
