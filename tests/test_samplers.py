"""Sampler determinism, bounds, and structural parity
(reference behaviors: dataset/local_dataset.py:107-350)."""

import numpy as np
import pytest

from dualvar_tpu.data import samplers as S


def rng(seed=0):
    return np.random.default_rng(seed)


def test_frame_sampler_train_window():
    idx = S.frame_sampler_train(rng(), total=300, num_frames=16, ds=4)
    assert idx.shape == (16,)
    assert (np.diff(idx) == 4).all()
    assert idx.min() >= 0 and idx.max() < 300


def test_frame_sampler_train_short_video_pads():
    for seed in range(10):
        idx = S.frame_sampler_train(rng(seed), total=20, num_frames=16, ds=4)
        assert idx.shape == (16,)
        assert idx.min() >= 0 and idx.max() < 20


def test_frame_sampler_deterministic():
    a = S.frame_sampler_train(rng(7), 300, 16, 4)
    b = S.frame_sampler_train(rng(7), 300, 16, 4)
    np.testing.assert_array_equal(a, b)


def test_frame_sampler_test_covers_video():
    idx = S.frame_sampler_test(rng(), total=300, num_frames=16, ds=2)
    assert idx.min() >= 0 and idx.max() < 300
    assert len(idx) % 16 == 0 and len(idx) >= 16


def test_prototype_sampler_centered_and_clipped():
    for seed in range(20):
        idx = S.prototype_sampler(rng(seed), total=50, num_frames=16, ds=4)
        assert idx.shape == (16,)
        assert idx.min() >= 0 and idx.max() < 50
        assert (np.diff(idx) >= 0).all()  # clipping keeps monotonicity


def test_stage_prototype_views_structure():
    # views = [c1, c2, c1] with aug_series (local_dataset.py:291-292)
    idx = S.stage_prototype_views(rng(3), total=200, num_frames=16, ds=4,
                                  rand_flip=False, aug_series=True)
    assert idx.shape == (48,)
    np.testing.assert_array_equal(idx[:16], idx[32:])


def test_stage_prototype_views_temporal_flip():
    # with rand_flip, one coin decides whether BOTH clips are reversed
    flipped = False
    for seed in range(20):
        idx = S.stage_prototype_views(rng(seed), total=200, num_frames=16,
                                      ds=1, rand_flip=True)
        c1, c2 = idx[:16], idx[16:32]
        d1 = np.diff(c1)
        if (d1 <= 0).all() and (d1 < 0).any():
            flipped = True
            d2 = np.diff(c2)
            assert (d2 <= 0).all()  # both reversed together
    assert flipped  # the flip path was exercised


def test_tenclip_sampler():
    idx = S.tenclip_sampler(total=300, num_frames=16, ds=2)
    assert idx.shape == (160,)
    assert idx.min() >= 0 and idx.max() < 300
    # first clip starts at 0 for long-enough video
    assert idx[0] == 0


def test_tenclip_sampler_short_video():
    idx = S.tenclip_sampler(total=10, num_frames=16, ds=2)
    assert idx.shape == (160,)
    assert idx.max() == 9  # clamped to last frame


def test_test_windows_reconstruct_full_sampler():
    # n_test_windows x test_window == frame_sampler_test's flattened windows
    # (reference local_dataset.py:107-123)
    for total in (300, 97, 33, 20):  # long, medium, barely-one, short
        full = S.frame_sampler_test(rng(0), total, 16, 2)
        n = S.n_test_windows(total, 16, 2)
        assert n * 16 == len(full)
        got = np.concatenate(
            [S.test_window(rng(0), total, 16, 2, w) for w in range(n)])
        np.testing.assert_array_equal(got, full)


def test_test_windows_short_video_single():
    assert S.n_test_windows(10, 16, 2) == 1
    idx = S.test_window(rng(5), 10, 16, 2, 0)
    assert idx.shape == (16,)
    assert idx.min() >= 0 and idx.max() < 10
