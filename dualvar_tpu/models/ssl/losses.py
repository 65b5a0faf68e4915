"""Contrastive / ranking losses of the DualVar objective, as pure functions.

Semantics parity (cited per-function) with reference model/simclr.py and
model/moco.py, re-derived for static shapes and SPMD:

* The reference materialises logits as ``[positives | negatives]`` by boolean
  gathers that drop the diagonal (model/simclr.py:204-216) — dynamic-shape
  hostility. Here every loss builds a fixed-width logit matrix
  ``[positive | full similarity row]`` with the positive / diagonal columns of
  the row masked to ``NEG_INF``; cross-entropy with target 0 and top-k
  accuracies are bit-identical to the reference's gathered layout because the
  masked columns can never win.
* The reference all-gathers features across GPUs for global negatives
  (GatherLayer, utils/utils.py:321). Under ``jax.jit`` over a data-sharded
  batch these functions simply see the global batch; XLA inserts the
  all-gather and flows gradients through it. The rank-local-rows memory trick
  (model/simclr.py:290-315) is likewise XLA's problem, not ours.
* The TC similarity "mean of the pairwise segment-similarity matrix"
  (model/simclr.py:297-304, model/moco.py:413-414) equals the inner product of
  the *series-mean* embeddings: mean_{s,s'} <f_s, g_s'> == <mean_s f_s,
  mean_s' g_s'>. We compute it that way — one (B,d) matmul on the MXU instead
  of a (B,B,s,s) intermediate in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

NEG_INF = -1.0e9


def cross_entropy_from_logits(logits: Array, labels: Array) -> Array:
    """torch.nn.CrossEntropyLoss parity: mean over batch of -log softmax[target]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return -jnp.mean(picked)


def topk_accuracy(logits: Array, labels: Array, ks=(1, 5)) -> tuple[Array, ...]:
    """Reference utils/utils.py:75-92 calc_topk_accuracy."""
    maxk = min(max(ks), logits.shape[-1])
    _, pred = jax.lax.top_k(logits, maxk)  # (B, maxk)
    correct = pred == labels[:, None]
    return tuple(
        jnp.mean(jnp.any(correct[:, : min(k, maxk)], axis=1).astype(jnp.float32))
        for k in ks
    )


def _loss_dict(prefix: str, logits: Array, loss: Array) -> dict[str, Array]:
    labels = jnp.zeros((logits.shape[0],), dtype=jnp.int32)
    return {
        f"{prefix}logits": logits,
        f"{prefix}labels": labels,
        f"{prefix}contrast_loss": loss,
    }


def nt_xent_loss(
    features: Array, temperature: float, prefix: str = "clip_"
) -> dict[str, Array]:
    """SimCLR NT-Xent over two views with every other clip as negative.

    Parity: model/simclr.py:183-229 (calc_clip_contrast_loss). ``features``:
    (N, 2, dim), already L2-normalised; N is the *global* batch.

    Returns ``{prefix}logits`` of width 1 + 2N: column 0 is the positive
    (other view of the same clip), the rest is the full similarity row with
    its own diagonal and positive entries masked to NEG_INF.
    """
    N, n_views, dim = features.shape
    assert n_views == 2, features.shape
    # view-major layout (2N, dim): index v*N + i — reference simclr.py:193.
    f = jnp.transpose(features, (1, 0, 2)).reshape(2 * N, dim)
    sim = f @ f.T  # (2N, 2N)
    idx = jnp.arange(2 * N)
    clip_id = idx % N
    same_clip = clip_id[:, None] == clip_id[None, :]
    diag = idx[:, None] == idx[None, :]
    pos_mask = same_clip & ~diag  # exactly one True per row for 2 views
    pos = jnp.sum(jnp.where(pos_mask, sim, 0.0), axis=1, keepdims=True)
    rest = jnp.where(same_clip, NEG_INF, sim)  # mask diagonal AND positive
    logits = jnp.concatenate([pos, rest], axis=1) / temperature
    loss = cross_entropy_from_logits(
        logits, jnp.zeros((2 * N,), dtype=jnp.int32)
    )
    return _loss_dict(prefix, logits, loss)


def dtw_alignment_similarity(
    a: Array, b: Array, gamma: float = 0.1, impl: str = "auto"
) -> Array:
    """Soft-DTW alignment similarity between batches of segment sequences.

    ``a``: (..., n, d), ``b``: (..., m, d) broadcastable on leading axes.
    Returns the negated soft-DTW of the *negated* inner-product cost,
    normalised by max(n, m): a differentiable soft-max over monotone alignment
    paths of the total segment similarity. This is the first-class form of the
    reference's DTW-aligned TC ablation (SoftDTW with the similarity dist
    func, utils/soft_dtw_cuda.py:321-331; ablation mode names
    model/moco.py:272-273), scaled to be comparable with the mean-similarity
    score.
    """
    from ...ops.soft_dtw import soft_dtw

    D = jnp.einsum("...nd,...md->...nm", a, b)
    lead = D.shape[:-2]
    n, m = D.shape[-2], D.shape[-1]
    flat = D.reshape(-1, n, m)
    vals = -soft_dtw(-flat, gamma, 0.0, impl)
    return vals.reshape(lead) / max(n, m)


def tc_contrast_loss_global(
    series_features: Array,
    temperature: float,
    prefix: str = "tc_",
    align: str = "mean",
    dtw_gamma: float = 0.1,
) -> dict[str, Array]:
    """Temporal-coherent contrastive loss, SimCLR (global-matrix) form.

    Parity: model/simclr.py:280-337 (calc_tc_contrast_loss). ``series_features``:
    (N, 2, n_series, dim), per-segment L2-normalised.

    align='mean' (paper default): video-to-video similarity is the mean
    pairwise segment similarity == inner product of segment means.
    align='dtw': soft-DTW alignment similarity over the segment sequences
    (the reference's DTW ablation, Pallas kernel on TPU).
    """
    N, n_views, n_series, dim = series_features.shape
    assert n_views == 2, series_features.shape
    if align == "mean":
        means = jnp.mean(series_features, axis=2)  # (N, 2, dim)
        return nt_xent_loss(means, temperature, prefix)
    # view-major sequence batch (2N, s, d), pairwise DTW similarity matrix
    f = jnp.transpose(series_features, (1, 0, 2, 3)).reshape(
        2 * N, n_series, dim
    )
    sim = dtw_alignment_similarity(
        f[:, None], f[None, :], gamma=dtw_gamma
    )  # (2N, 2N)
    idx = jnp.arange(2 * N)
    clip_id = idx % N
    same_clip = clip_id[:, None] == clip_id[None, :]
    diag = idx[:, None] == idx[None, :]
    pos_mask = same_clip & ~diag
    pos = jnp.sum(jnp.where(pos_mask, sim, 0.0), axis=1, keepdims=True)
    rest = jnp.where(same_clip, NEG_INF, sim)
    logits = jnp.concatenate([pos, rest], axis=1) / temperature
    loss = cross_entropy_from_logits(logits, jnp.zeros((2 * N,), jnp.int32))
    return _loss_dict(prefix, logits, loss)


def shuffle_rank_loss(
    pair_features: Array,
    theta: float,
    weight: float = 1.0,
    prefix: str = "ranking_",
    clip_max: float | None = 5.0,
) -> dict[str, Array]:
    """Shuffle-rank margin loss over per-segment embeddings.

    Parity: model/simclr.py:231-278 / model/moco.py:440-480 (calc_ranking_loss).
    ``pair_features``: (B, n_series, 2, dim), L2-normalised — axis 2 pairs a
    reference embedding with its shuffle-calibrated counterpart.

    Each of the 2*n_series embeddings must match its same-segment other-view
    partner ("highest") above every non-partner, non-self embedding, with a
    softplus margin: mean log(1 + exp((other - partner)/theta)), the SimCLR
    variant clipping the exponent argument at ``clip_max`` (simclr.py:260);
    the MoCo variant passes clip_max=None (moco.py:469).

    ``{prefix}margin_logits``: (B*2s, 1 + 2s) — col 0 the partner similarity,
    the rest the row with self+partner masked to NEG_INF (for top-1 accuracy).
    """
    B, n_series, n_views, dim = pair_features.shape
    assert n_views == 2, pair_features.shape
    s2 = 2 * n_series
    # (B, 2s, dim), view-major: [view0 s0..s_{n-1}, view1 s0..] — simclr.py:246.
    f = jnp.transpose(pair_features, (0, 2, 1, 3)).reshape(B, s2, dim)
    sim = jnp.einsum("bij,bkj->bik", f, f)  # (B, 2s, 2s)

    idx = jnp.arange(s2)
    seg = idx % n_series
    view = idx // n_series
    diag = idx[:, None] == idx[None, :]
    corr = (seg[:, None] == seg[None, :]) & (view[:, None] != view[None, :])
    left = ~(diag | corr)  # (2s, 2s), 2s-2 True per row

    highest = jnp.sum(jnp.where(corr[None], sim, 0.0), axis=2, keepdims=True)
    diff = (sim - highest) / theta
    if clip_max is not None:
        diff = jnp.minimum(diff, clip_max)
    per_entry = jnp.log1p(jnp.exp(diff))
    n_left = s2 - 2
    margin_loss = weight * jnp.sum(
        jnp.where(left[None], per_entry, 0.0)
    ) / (B * s2 * n_left)

    rest = jnp.where(left[None], sim, NEG_INF)
    margin_logits = jnp.concatenate([highest, rest], axis=2).reshape(B * s2, 1 + s2)
    labels = jnp.zeros((B * s2,), dtype=jnp.int32)
    return {
        f"{prefix}margin_logits": margin_logits,
        f"{prefix}margin_labels": labels,
        f"{prefix}margin_contrast_loss": margin_loss,
    }


def moco_contrast_loss(
    q: Array, k: Array, queue: Array, temperature: float, prefix: str = "clip_"
) -> dict[str, Array]:
    """MoCo InfoNCE vs the negative queue.

    Parity: model/moco.py:426-438 (calc_clip_contrast_loss). ``q``/``k``:
    (B, dim) normalised; ``queue``: (K, dim) rows (the reference stores it
    column-major (dim, K), moco.py:319 — row-major is the natural layout
    for an MXU ``q @ queue.T``). Gradients are stopped through k and queue.
    """
    k = jax.lax.stop_gradient(k)
    queue = jax.lax.stop_gradient(queue)
    pos = jnp.sum(q * k, axis=1, keepdims=True)
    neg = q @ queue.T  # (B, K)
    logits = jnp.concatenate([pos, neg], axis=1) / temperature
    loss = cross_entropy_from_logits(logits, jnp.zeros((q.shape[0],), jnp.int32))
    return _loss_dict(prefix, logits, loss)


def moco_tc_contrast_loss(
    q_series: Array,
    k_series: Array,
    series_queue: Array,
    temperature: float,
    prefix: str = "tc_",
    align: str = "mean",
    dtw_gamma: float = 0.1,
) -> dict[str, Array]:
    """Temporal-coherent loss, MoCo (queue) form.

    Parity: model/moco.py:404-424 (calc_tc_contrast_loss). ``q_series`` /
    ``k_series``: (B, n_series, dim); ``series_queue``: (K, n_series*dim) with
    per-segment layout matching ``reshape(K, n_series, dim)``.

    align='mean' (paper default): mean pairwise segment similarity == inner
    product of segment means. align='dtw': soft-DTW alignment similarity
    (the reference's DTW ablation).
    """
    B, n_series, dim = q_series.shape
    k_series = jax.lax.stop_gradient(k_series)
    series_queue = jax.lax.stop_gradient(series_queue)
    queue_seq = series_queue.reshape(-1, n_series, dim)
    if align == "mean":
        qm = jnp.mean(q_series, axis=1)  # (B, dim)
        km = jnp.mean(k_series, axis=1)
        nm = jnp.mean(queue_seq, axis=1)  # (K, dim)
        pos = jnp.sum(qm * km, axis=1, keepdims=True)
        neg = qm @ nm.T
    else:
        pos = dtw_alignment_similarity(q_series, k_series,
                                       gamma=dtw_gamma)[:, None]
        neg = dtw_alignment_similarity(
            q_series[:, None], queue_seq[None, :], gamma=dtw_gamma
        )  # (B, K)
    logits = jnp.concatenate([pos, neg], axis=1) / temperature
    loss = cross_entropy_from_logits(logits, jnp.zeros((B,), jnp.int32))
    return _loss_dict(prefix, logits, loss)
