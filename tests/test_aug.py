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


def test_random_crop_blockwise(clip):
    """n_seqblock variant (augmentation.py:167-175): one crop origin per run
    of n_seqblock consecutive frames; frames inside a block share it."""
    out = F.random_crop(jax.random.PRNGKey(3), clip, 16, n_seqblock=2)
    assert out.shape == (4, 16, 16, 3)
    c, o = np.array(clip), np.array(out)

    def origin_of(t):
        for y in range(24 - 16 + 1):
            for x in range(20 - 16 + 1):
                if np.allclose(c[t, y : y + 16, x : x + 16], o[t]):
                    return (y, x)
        raise AssertionError(f"frame {t} is not a window of the source")

    origins = [origin_of(t) for t in range(4)]
    assert origins[0] == origins[1] and origins[2] == origins[3]
    # different blocks draw independently: with key 3 they differ
    assert origins[0] != origins[2]


def test_random_hflip_per_seqblock():
    """seq_len variant (augmentation.py:332-341): one flip draw per run of
    seq_len frames; frames inside a block share the decision."""
    clip = jnp.array(
        np.random.RandomState(4).rand(8, 6, 6, 3).astype(np.float32))
    c = np.array(clip)
    for seed in range(6):
        out = np.array(F.random_hflip(jax.random.PRNGKey(seed), clip,
                                      p=0.5, seq_len=2))
        flipped = []
        for t in range(8):
            if np.array_equal(out[t], c[t]):
                flipped.append(False)
            else:
                np.testing.assert_array_equal(out[t], c[t, :, ::-1])
                flipped.append(True)
        assert all(flipped[2 * b] == flipped[2 * b + 1] for b in range(4))
    # across seeds at p=0.5 some block must flip and some must not
    outs = [np.array(F.random_hflip(jax.random.PRNGKey(s), clip, 0.5,
                                    seq_len=2)) for s in range(6)]
    assert any(not np.array_equal(o, c) for o in outs)
    assert any(not np.array_equal(o, c[:, :, ::-1]) for o in outs)


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


def test_blockwise_color_jitter_blocks_differ():
    frame = np.random.RandomState(3).rand(16, 16, 3).astype(np.float32)
    clip = jnp.array(np.stack([frame] * 2))
    out = np.array(F.color_jitter(jax.random.PRNGKey(0), clip, p=1.0,
                                  mode="consistent", block=2))
    assert out.shape == clip.shape
    # the four 8x8 blocks got different factor draws
    tl, tr = out[0, :8, :8], out[0, :8, 8:]
    assert np.abs(tl - tr).max() > 1e-3 or not np.allclose(
        np.array(clip)[0, :8, :8] - tl, np.array(clip)[0, :8, 8:] - tr)


def test_blockwise_gray_and_channel_mask():
    clip = jnp.array(np.random.RandomState(4).rand(2, 16, 16, 3)
                     .astype(np.float32))
    g = F.random_gray_channel_split(jax.random.PRNGKey(1), clip, p=1.0,
                                    block=2)
    assert g.shape == clip.shape
    m = F.channel_mask(jax.random.PRNGKey(2), clip, p=1.0, block=2)
    assert m.shape == clip.shape


def test_random_sized_crop_shapes_and_fallback():
    clip = jnp.array(np.random.RandomState(5).rand(3, 40, 36, 3)
                     .astype(np.float32))
    out = F.random_sized_crop(jax.random.PRNGKey(0), clip, 24, p=1.0)
    assert out.shape == (3, 24, 24, 3)
    assert bool(jnp.isfinite(out).all())
    # p=0: deterministic center-crop+resize path
    a = F.random_sized_crop(jax.random.PRNGKey(1), clip, 24, p=0.0)
    b = F.random_sized_crop(jax.random.PRNGKey(2), clip, 24, p=0.0)
    np.testing.assert_allclose(np.array(a), np.array(b), atol=1e-6)


def test_random_rotation_identity_at_p0():
    clip = jnp.array(np.random.RandomState(6).rand(2, 20, 20, 3)
                     .astype(np.float32))
    out = F.random_rotation(jax.random.PRNGKey(0), clip, degree=15, p=0.0)
    np.testing.assert_allclose(np.array(out), np.array(clip), atol=1e-5)
    rot = F.random_rotation(jax.random.PRNGKey(0), clip, degree=30, p=1.0)
    assert np.abs(np.array(rot) - np.array(clip)).max() > 0.05


def test_pad_frames():
    clip = jnp.ones((2, 4, 4, 3))
    out = F.pad_frames(clip, 2)
    assert out.shape == (2, 8, 8, 3)
    assert float(out[0, 0, 0, 0]) == 0.0


def test_composers():
    from dualvar_tpu.aug.pipeline import (
        one_clip_transform,
        randomized_transform,
        transform_controller,
        two_clip_transform,
        two_crops_transform,
    )

    clip = jnp.array(np.random.RandomState(7).rand(4, 8, 8, 3)
                     .astype(np.float32))
    ident = lambda k, c: c
    bright = lambda k, c: jnp.clip(c * 1.5, 0, 1)

    out = transform_controller(jax.random.PRNGKey(0), clip,
                               [ident, bright], [0.0, 1.0])
    np.testing.assert_allclose(np.array(out), np.clip(np.array(clip) * 1.5, 0, 1),
                               atol=1e-6)

    frames = jnp.concatenate([clip, clip], axis=0)  # two clips of 4
    out = two_clip_transform(jax.random.PRNGKey(1), frames, bright, ident, 4,
                             p=1.0)
    assert out.shape == frames.shape
    out = randomized_transform(jax.random.PRNGKey(2), frames,
                               [ident, bright], [[1.0, 0.0], [0.0, 1.0]], 4)
    np.testing.assert_allclose(np.array(out[:4]), np.array(clip), atol=1e-6)

    out = one_clip_transform(jax.random.PRNGKey(3), frames, bright, ident, 4)
    assert out.shape == frames.shape

    out = two_crops_transform(jax.random.PRNGKey(4), clip, bright)
    assert out.shape == (2, 4, 8, 8, 3)


def test_multiple_clip_transform():
    from dualvar_tpu.aug.pipeline import multiple_clip_transform

    clip = jnp.array(np.random.RandomState(9).rand(4, 8, 8, 3)
                     .astype(np.float32))
    frames = jnp.concatenate([clip, clip], axis=0)
    ident = lambda k, c: c
    bright = lambda k, c: jnp.clip(c * 1.5, 0, 1)
    out = multiple_clip_transform(jax.random.PRNGKey(0), frames,
                                  [ident, bright], 4)
    np.testing.assert_allclose(np.array(out[:4]), np.array(clip), atol=1e-6)
    np.testing.assert_allclose(np.array(out[4:]),
                               np.clip(np.array(clip) * 1.5, 0, 1), atol=1e-6)


def test_color_ops_match_reference_numpy_goldens():
    """Goldens generated by RUNNING the reference's numpy color ops
    (augmentation.py adjust_*_np — uint8-domain: rint + clip 255) on a
    uint8 image — the same oracle methodology as the loss goldens. Our
    ops use the torchvision float-tensor semantics the reference's
    training path delegates to, so agreement is to uint8 quantization
    (hue is exact: both sides do the float HSV roundtrip)."""
    import os

    gdir = os.path.join(os.path.dirname(__file__), "goldens")
    img_u8 = np.load(os.path.join(gdir, "g_aug_img.npy"))
    gold = np.load(os.path.join(gdir, "g_aug_color_ops.npz"))
    clip = F.to_float(jnp.asarray(img_u8))[None]  # (1, H, W, C) in [0,1]
    # the oracle quantizes twice (its grayscale truncates to uint8, the
    # blend rints): agreement bound is one uint8 step
    q = 1.05 / 255

    for f in (0.4, 1.0, 1.6):
        for op, fn in (("brightness", F.adjust_brightness),
                       ("contrast", F.adjust_contrast),
                       ("saturation", F.adjust_saturation)):
            ours = np.asarray(fn(clip, f))[0]
            np.testing.assert_allclose(
                ours, gold[f"{op}_{f}"].astype(np.float32) / 255.0,
                atol=q, err_msg=f"{op} {f}")
    for h in (-0.3, 0.0, 0.25):
        ours = np.asarray(F.adjust_hue(clip, h))[0]
        np.testing.assert_allclose(
            ours, gold[f"hue_{h}"].astype(np.float32) / 255.0,
            atol=q, err_msg=f"hue {h}")


def test_gaussian_blur_off_is_bit_exact(clip):
    """The blur-off path must return the clip unchanged (regression: a
    delta-kernel matmul at MXU default precision perturbed it)."""
    out = F.gaussian_blur(clip, jnp.float32(1.3), on=jnp.bool_(False))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(clip))
