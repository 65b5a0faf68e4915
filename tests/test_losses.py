"""Loss parity against the torch reference.

Golden inputs (tests/goldens/g_*.npy) and expected values were produced by
running the reference loss methods on CPU with float64 inputs:
SimCLR_TimeSeriesV4.calc_clip_contrast_loss / calc_tc_contrast_loss /
calc_ranking_loss (model/simclr.py:183-337) and
MoCo_TimeSeriesV4.calc_clip_contrast_loss / calc_tc_contrast_loss /
calc_ranking_loss (model/moco.py:404-480), with T=0.07, aligned_T=0.11,
theta=0.05, n_series=3, series_dim=5. Float64 comparison pins semantics to
1e-8; float32 runs are also checked at a rounding tolerance.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualvar_tpu.models.ssl import losses as L

G = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    return np.load(os.path.join(G, name))


@pytest.fixture
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def test_nt_xent_golden_f64(x64):
    f = jnp.array(_load("g_ntxent_in.npy"), jnp.float64)
    r = L.nt_xent_loss(f, 0.07)
    assert abs(float(r["clip_contrast_loss"]) - 2.5256540821) < 1e-8
    # logits: col 0 positive, 8 rows (2 views x global batch 4)
    assert r["clip_logits"].shape == (8, 9)
    assert r["clip_labels"].shape == (8,)


def test_nt_xent_f32_close():
    f = jnp.array(_load("g_ntxent_in.npy"), jnp.float32)
    r = L.nt_xent_loss(f, 0.07)
    assert abs(float(r["clip_contrast_loss"]) - 2.52565) < 5e-3


def test_tc_global_golden_f64(x64):
    sf = jnp.array(_load("g_tc_in.npy"), jnp.float64)
    r = L.tc_contrast_loss_global(sf, 0.11)
    assert abs(float(r["tc_contrast_loss"]) - 3.4785968469) < 1e-8


def test_shuffle_rank_golden_f64(x64):
    pf = jnp.array(_load("g_rank_in.npy"), jnp.float64)
    # SimCLR variant: exponent clipped at 5.0 (model/simclr.py:260)
    r = L.shuffle_rank_loss(pf, 0.05, 0.5, "r_", clip_max=5.0)
    assert abs(float(r["r_margin_contrast_loss"]) - 1.1121192997) < 1e-8
    # MoCo variant: no clipping (model/moco.py:469)
    r = L.shuffle_rank_loss(pf, 0.05, 0.5, "r_", clip_max=None)
    assert abs(float(r["r_margin_contrast_loss"]) - 2.6231011374) < 1e-6
    # margin logits: (B*2s, 1+2s) = (24, 7); reference width is 2s-1=5 but
    # columns beyond the valid ones are NEG_INF-masked and can't alter top-k.
    assert r["r_margin_logits"].shape == (24, 7)


def test_moco_clip_golden_f64(x64):
    q = jnp.array(_load("g_moco_q.npy"), jnp.float64)
    k = jnp.array(_load("g_moco_k.npy"), jnp.float64)
    queue = jnp.array(_load("g_moco_queue.npy"), jnp.float64).T  # ours row-major
    r = L.moco_contrast_loss(q, k, queue, 0.07)
    assert abs(float(r["clip_contrast_loss"]) - 3.6123032569885254) < 1e-6
    assert r["clip_logits"].shape == (4, 17)  # 1 + K


def test_moco_tc_golden_f64(x64):
    qs = jnp.array(_load("g_moco_qs.npy"), jnp.float64)
    ks = jnp.array(_load("g_moco_ks.npy"), jnp.float64)
    sq = jnp.array(_load("g_moco_sq.npy"), jnp.float64).T
    r = L.moco_tc_contrast_loss(qs, ks, sq, 0.11)
    assert abs(float(r["tc_contrast_loss"]) - 3.657632827758789) < 1e-6


def test_topk_accuracy():
    logits = jnp.array([[0.9, 0.1, 0.0], [0.1, 0.9, 0.0], [0.0, 0.1, 0.9]])
    labels = jnp.array([0, 0, 2])
    top1, top2 = L.topk_accuracy(logits, labels, (1, 2))
    assert float(top1) == pytest.approx(2 / 3)
    assert float(top2) == pytest.approx(1.0)


def test_nt_xent_gradients_flow():
    f = jnp.array(_load("g_ntxent_in.npy"), jnp.float32)

    def loss(f):
        return L.nt_xent_loss(f, 0.07)["clip_contrast_loss"]

    g = jax.grad(loss)(f)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_shuffle_rank_masked_columns_never_win():
    pf = jnp.array(_load("g_rank_in.npy"), jnp.float32)
    r = L.shuffle_rank_loss(pf, 0.05, 0.5, "r_", clip_max=5.0)
    top1 = L.topk_accuracy(r["r_margin_logits"], r["r_margin_labels"], (1,))[0]
    assert 0.0 <= float(top1) <= 1.0


def test_tc_dtw_mode_runs_and_grads_flow():
    """soft-DTW-aligned TC (reference DTW ablation as first-class mode)."""
    sf = jnp.array(_load("g_tc_in.npy"), jnp.float32)  # (4, 2, 3, 5)
    r = L.tc_contrast_loss_global(sf, 0.11, align="dtw", dtw_gamma=0.1)
    assert np.isfinite(float(r["tc_contrast_loss"]))
    g = jax.grad(lambda f: L.tc_contrast_loss_global(
        f, 0.11, align="dtw")["tc_contrast_loss"])(sf)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_moco_tc_dtw_mode():
    qs = jnp.array(_load("g_moco_qs.npy"), jnp.float32)
    ks = jnp.array(_load("g_moco_ks.npy"), jnp.float32)
    sq = jnp.array(_load("g_moco_sq.npy"), jnp.float32).T
    r = L.moco_tc_contrast_loss(qs, ks, sq, 0.11, align="dtw")
    assert r["tc_logits"].shape == (4, 17)
    assert np.isfinite(float(r["tc_contrast_loss"]))


def test_dtw_similarity_reduces_to_matching_for_sharp_gamma():
    """With n_series=1 the DTW alignment similarity equals the plain inner
    product (single-cell path)."""
    a = jnp.array(np.random.RandomState(0).rand(6, 1, 8).astype(np.float32))
    b = jnp.array(np.random.RandomState(1).rand(6, 1, 8).astype(np.float32))
    sim = L.dtw_alignment_similarity(a, b, gamma=0.01)
    want = np.einsum("bid,bjd->b", np.array(a), np.array(b))
    np.testing.assert_allclose(np.array(sim), want, rtol=1e-4)


def test_calc_mask_accuracy():
    from dualvar_tpu.core.utils import calc_mask_accuracy

    logits = jnp.array([[0.9, 0.5, 0.1], [0.1, 0.9, 0.5]])
    mask = jnp.array([[1, 0, 0], [0, 0, 1]])
    top1, top2 = calc_mask_accuracy(logits, mask, (1, 2))
    assert float(top1) == pytest.approx(0.5)  # row0 top1 hits, row1 misses
    assert float(top2) == pytest.approx(1.0)  # row1's positive in top-2


def test_mask_accuracy_matches_reference_semantics():
    """calc_mask_accuracy (reference utils/utils.py:95-109): correct at k
    iff any top-k index is a positive of the multi-hot mask — numpy oracle
    on random data on top of the hand-case test above."""
    import numpy as np

    from dualvar_tpu.core.utils import calc_mask_accuracy as mask_accuracy

    logits = jnp.asarray([[9.0, 5.0, 1.0, 0.0],
                          [0.0, 1.0, 5.0, 9.0],
                          [9.0, 8.0, 7.0, 0.0]])
    mask = jnp.asarray([[0, 1, 0, 0],
                        [0, 0, 1, 0],
                        [0, 0, 0, 1]], jnp.int32)
    a1, a2, a3 = mask_accuracy(logits, mask, ks=(1, 2, 3))
    # top-1: none of the argmaxes is a positive
    assert float(a1) == 0.0
    # top-2: rows 0 (idx 1) and 1 (idx 2) hit
    assert np.isclose(float(a2), 2 / 3)
    assert np.isclose(float(a3), 2 / 3)
    # numpy oracle on random data
    rng = np.random.RandomState(0)
    lg = rng.randn(32, 10).astype(np.float32)
    mk = (rng.rand(32, 10) < 0.3).astype(np.int32)
    for k, acc in zip((1, 3, 5), mask_accuracy(jnp.asarray(lg),
                                               jnp.asarray(mk), ks=(1, 3, 5))):
        top = np.argsort(-lg, axis=1)[:, :k]
        want = np.mean([mk[i, top[i]].any() for i in range(32)])
        assert np.isclose(float(acc), want), k
