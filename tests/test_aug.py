"""Augmentation ops vs independent numpy oracles + pipeline contracts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualvar_tpu.aug import functional as F
from dualvar_tpu.aug.pipeline import (
    AugConfig,
    classifier_train_batch,
    eval_batch,
    pretrain_batch,
    tenclip_batch,
    tencrop_batch,
)


@pytest.fixture
def clip():
    return jnp.array(
        np.random.RandomState(0).rand(4, 24, 20, 3).astype(np.float32)
    )


def test_brightness_oracle(clip):
    out = np.array(F.adjust_brightness(clip, 1.3))
    want = np.clip(np.array(clip) * 1.3, 0, 1)
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_saturation_oracle(clip):
    c = np.array(clip)
    gray = (0.2989 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2])[..., None]
    want = np.clip(c * 0.5 + gray * 0.5, 0, 1)
    out = np.array(F.adjust_saturation(clip, 0.5))
    np.testing.assert_allclose(out, want, atol=1e-6)


def test_contrast_oracle(clip):
    c = np.array(clip)
    gray = 0.2989 * c[..., 0] + 0.587 * c[..., 1] + 0.114 * c[..., 2]
    mean = gray.mean(axis=(1, 2)).reshape(-1, 1, 1, 1)
    want = np.clip(c * 0.7 + mean * 0.3, 0, 1)
    out = np.array(F.adjust_contrast(clip, 0.7))
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_hsv_roundtrip(clip):
    back = F.hsv_to_rgb(F.rgb_to_hsv(clip))
    np.testing.assert_allclose(np.array(back), np.array(clip), atol=1e-5)


def test_hue_shift_full_cycle_is_identity(clip):
    out = F.adjust_hue(clip, 0.0)
    np.testing.assert_allclose(np.array(out), np.array(clip), atol=1e-5)


def test_random_crop_shape_and_content(clip):
    out = F.random_crop(jax.random.PRNGKey(0), clip, 16)
    assert out.shape == (4, 16, 16, 3)
    # crop must be a contiguous window of the source
    c, o = np.array(clip), np.array(out)
    found = any(
        np.allclose(c[:, y : y + 16, x : x + 16], o)
        for y in range(24 - 16 + 1)
        for x in range(20 - 16 + 1)
    )
    assert found


def test_random_crop_identity_when_exact(clip):
    small = clip[:, :16, :16, :]
    out = F.random_crop(jax.random.PRNGKey(0), small, 16)
    np.testing.assert_array_equal(np.array(out), np.array(small))


def test_center_crop(clip):
    out = F.center_crop(clip, 16)
    y0, x0 = int(round((24 - 16) / 2)), int(round((20 - 16) / 2))
    np.testing.assert_array_equal(
        np.array(out), np.array(clip)[:, y0 : y0 + 16, x0 : x0 + 16]
    )


def test_five_crop_corners(clip):
    c = np.array(clip)
    np.testing.assert_array_equal(
        np.array(F.five_crop(clip, 8, 1)), c[:, :8, :8])
    np.testing.assert_array_equal(
        np.array(F.five_crop(clip, 8, 4)), c[:, -8:, -8:])


def test_color_jitter_consistent_same_factors_per_frame():
    # identical frames must stay identical after a consistent jitter
    frame = np.random.RandomState(1).rand(10, 12, 3).astype(np.float32)
    clip = jnp.array(np.stack([frame] * 5))
    out = np.array(F.color_jitter(jax.random.PRNGKey(2), clip, p=1.0,
                                  mode="consistent"))
    for t in range(1, 5):
        np.testing.assert_allclose(out[t], out[0], atol=1e-6)


def test_color_jitter_frame_mode_varies():
    frame = np.random.RandomState(1).rand(10, 12, 3).astype(np.float32)
    clip = jnp.array(np.stack([frame] * 5))
    out = np.array(F.color_jitter(jax.random.PRNGKey(2), clip, p=1.0,
                                  mode="frame"))
    assert np.abs(out[1] - out[0]).max() > 1e-4


def test_gaussian_blur_smooths(clip):
    out = F.gaussian_blur(clip, jnp.float32(2.0))
    assert out.shape == clip.shape
    # blurring reduces total variation
    tv = lambda x: float(jnp.abs(jnp.diff(x, axis=1)).mean())
    assert tv(out) < tv(clip)
    # mean approximately preserved away from borders
    assert abs(float(out.mean() - clip.mean())) < 0.05


def test_normalize_inverts():
    clip = jnp.full((2, 4, 4, 3), 0.5)
    out = F.normalize(clip)
    want = (0.5 - np.array(F.IMAGENET_MEAN)) / np.array(F.IMAGENET_STD)
    np.testing.assert_allclose(np.array(out)[0, 0, 0], want, rtol=1e-5)


def test_pretrain_batch_contract():
    cfg = AugConfig(img_dim=16, seq_len=4)
    frames = jnp.array(np.random.RandomState(0).randint(
        0, 255, (2, 12, 24, 20, 3), dtype=np.uint8))
    out = pretrain_batch(jax.random.PRNGKey(0), frames, cfg)
    assert out.shape == (2, 3, 4, 16, 16, 3)
    assert bool(jnp.isfinite(out).all())
    # deterministic given the key
    out2 = pretrain_batch(jax.random.PRNGKey(0), frames, cfg)
    np.testing.assert_array_equal(np.array(out), np.array(out2))


def test_classifier_and_eval_batches():
    cfg = AugConfig(img_dim=16, seq_len=4, rand_flip=True)
    frames = jnp.array(np.random.RandomState(0).randint(
        0, 255, (2, 4, 24, 20, 3), dtype=np.uint8))
    out = classifier_train_batch(jax.random.PRNGKey(0), frames, cfg)
    assert out.shape == (2, 4, 16, 16, 3)
    out = eval_batch(frames, cfg)
    assert out.shape == (2, 4, 16, 16, 3)


def test_tencrop_and_tenclip_batches():
    cfg = AugConfig(img_dim=16, seq_len=4)
    frames = jnp.array(np.random.RandomState(0).randint(
        0, 255, (2, 4, 24, 20, 3), dtype=np.uint8))
    out = tencrop_batch(frames, cfg, 1, True)
    assert out.shape == (2, 4, 16, 16, 3)
    frames10 = jnp.array(np.random.RandomState(0).randint(
        0, 255, (2, 40, 24, 20, 3), dtype=np.uint8))
    out = tenclip_batch(frames10, cfg)
    assert out.shape == (2, 10, 4, 16, 16, 3)
