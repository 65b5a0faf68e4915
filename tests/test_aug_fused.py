"""Fused Pallas aug kernel (ops/aug_fused.py) vs the unfused jnp pipeline.

The fused path draws its randomness with the exact key-splitting discipline
of the unfused path (`aug/pipeline.py:_draw_clip_params`), so with the same
key both pipelines make identical random decisions and the outputs must
match to float tolerance (the kernel reassociates the blur matmuls and the
contrast mean, hence not bitwise).

Reference semantics covered: augmentation.py:429-652 (ColorJitter),
:706-721 (GaussianBlur), :149-175 (RandomCrop), transforms.py:57
(Normalize); pipeline composition pretrain.py:491-532.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dualvar_tpu.aug.pipeline import (AugConfig, _pretrain_batch_unfused,
                                      pretrain_batch, pretrain_batch_fused)

B, V, T, H0, W0, SIZE = 3, 2, 4, 40, 36, 32


def _frames(seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        rng.integers(0, 255, (B, V * T, H0, W0, 3), dtype=np.uint8))


@pytest.mark.parametrize("jitter_order", ["batch", "sample"])
def test_fused_matches_unfused(jitter_order):
    frames = _frames()
    key = jax.random.PRNGKey(7)
    cfg = dict(img_dim=SIZE, seq_len=T, jitter_order=jitter_order,
               fused_compute="float32")
    fused = pretrain_batch_fused(key, frames, AugConfig(**cfg, fused="on"))
    unfused = _pretrain_batch_unfused(key, frames,
                                      AugConfig(**cfg, fused="off"))
    assert fused.shape == unfused.shape == (B, V, T, SIZE, SIZE, 3)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-5)


def test_fused_bf16_compute_close():
    """bfloat16 in-kernel compute (interpret-mode only until Mosaic can
    lower bf16 vector compares) stays within bf16 chain noise of the f32
    pipeline."""
    frames = _frames(5)
    key = jax.random.PRNGKey(11)
    fused = pretrain_batch_fused(
        key, frames, AugConfig(img_dim=SIZE, seq_len=T, fused="on",
                               fused_compute="bfloat16"))
    ref = _pretrain_batch_unfused(
        key, frames, AugConfig(img_dim=SIZE, seq_len=T, fused="off"))
    # normalized space: std ~0.225 amplifies [0,1] noise ~4.5x. Hue-sector
    # flips at bf16-rounded boundaries make a ~2% pixel tail with larger
    # deviations, so assert on the distribution, not the max.
    err = np.abs(np.asarray(fused) - np.asarray(ref))
    # mean ~0.014 observed = ~0.8 u8 levels of bf16 rounding noise
    assert err.mean() < 0.025, err.mean()
    assert np.quantile(err, 0.99) < 0.15, np.quantile(err, 0.99)


def test_fused_covers_blur_and_null_pipeline():
    """Across enough samples both the blur-on and view-0 null branches are
    hit; outputs must still match the unfused composition."""
    frames = _frames(1)
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        cfg = dict(img_dim=SIZE, seq_len=T, fused_compute="float32")
        fused = pretrain_batch_fused(key, frames,
                                     AugConfig(**cfg, fused="on"))
        unfused = _pretrain_batch_unfused(key, frames,
                                          AugConfig(**cfg, fused="off"))
        np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                                   atol=2e-5)


def test_fused_bf16_output():
    frames = _frames(2)
    key = jax.random.PRNGKey(3)
    cfg = AugConfig(img_dim=SIZE, seq_len=T, out_dtype="bfloat16",
                    fused="on", fused_compute="float32")
    out = pretrain_batch_fused(key, frames, cfg)
    assert out.dtype == jnp.bfloat16
    ref = _pretrain_batch_unfused(
        key, frames,
        AugConfig(img_dim=SIZE, seq_len=T, out_dtype="bfloat16", fused="off"))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=1e-2)


@pytest.mark.parametrize("rand_flip,jitter", [(True, True), (False, True),
                                              (True, False)])
def test_classifier_fused_matches_unfused(rand_flip, jitter):
    from dualvar_tpu.aug.pipeline import (_classifier_train_batch_unfused,
                                          classifier_train_batch_fused)
    rng = np.random.default_rng(8)
    frames = jnp.asarray(
        rng.integers(0, 255, (4, T, H0, W0, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(13)
    cfg = dict(img_dim=SIZE, seq_len=T, rand_flip=rand_flip,
               with_color_jitter=jitter, fused_compute="float32")
    fused = classifier_train_batch_fused(
        key, frames, AugConfig(**cfg, fused="on"))
    unfused = _classifier_train_batch_unfused(
        key, frames, AugConfig(**cfg, fused="off"))
    assert fused.shape == unfused.shape == (4, T, SIZE, SIZE, 3)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               atol=2e-5)


def test_dispatch_respects_cfg():
    """fused='off' (and 'auto' on CPU) routes through the unfused path."""
    frames = _frames(4)
    key = jax.random.PRNGKey(5)
    off = pretrain_batch(key, frames, AugConfig(img_dim=SIZE, seq_len=T,
                                                fused="off"))
    auto = pretrain_batch(key, frames, AugConfig(img_dim=SIZE, seq_len=T,
                                                 fused="auto"))
    np.testing.assert_array_equal(np.asarray(off), np.asarray(auto))


def test_fused_on_tpu_hardware():
    """Hardware (non-interpret) kernel vs the unfused pipeline — the
    Mosaic-compiled path. Skipped off-TPU; bench.py re-runs this check on
    every benched round (aug_fused_check in the JSON)."""
    if jax.default_backend() != "tpu":
        pytest.skip("needs a TPU; covered on-hardware by bench.py")
    frames = _frames(9)
    key = jax.random.PRNGKey(17)
    cfg = dict(img_dim=SIZE, seq_len=T, fused_compute="float32")
    fused = pretrain_batch_fused(key, frames, AugConfig(**cfg, fused="on"))
    ref = _pretrain_batch_unfused(key, frames, AugConfig(**cfg, fused="off"))
    # the unfused TPU blur einsum uses bf16 MXU operands; the kernel blur
    # is f32-exact — blurred clips differ by that operand rounding
    assert float(jnp.max(jnp.abs(fused - ref))) < 0.2


def test_fused_sharded_matches_single_device():
    """The shard_map-wrapped fused kernel on the 8-virtual-device CPU mesh
    must reproduce the unsharded fused output bitwise (same key => same
    per-sample draws; the kernel itself is per-clip)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dualvar_tpu.core.mesh import make_mesh

    rng = np.random.default_rng(21)
    frames = jnp.asarray(
        rng.integers(0, 255, (8, V * T, H0, W0, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(23)
    cfg = AugConfig(img_dim=SIZE, seq_len=T, fused="on",
                    fused_compute="float32")
    single = pretrain_batch_fused(key, frames, cfg)

    mesh = make_mesh()
    fs = jax.device_put(frames, NamedSharding(mesh, P("data")))
    sharded = jax.jit(
        lambda k, f: pretrain_batch_fused(k, f, cfg, mesh, "data"),
        out_shardings=NamedSharding(mesh, P()),
    )(key, fs)
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))


def test_fused_honours_normalize_flag():
    frames = _frames(6)
    key = jax.random.PRNGKey(29)
    raw = pretrain_batch_fused(
        key, frames, AugConfig(img_dim=SIZE, seq_len=T, normalize=False,
                               fused="on", fused_compute="float32"))
    ref = _pretrain_batch_unfused(
        key, frames, AugConfig(img_dim=SIZE, seq_len=T, normalize=False,
                               fused="off"))
    # un-normalized outputs live in [0, 1]
    assert float(jnp.min(raw)) >= 0.0 and float(jnp.max(raw)) <= 1.0
    np.testing.assert_allclose(np.asarray(raw), np.asarray(ref), atol=2e-5)


def test_forced_on_with_per_frame_jitter_raises():
    frames = _frames(7)
    cfg = AugConfig(img_dim=SIZE, seq_len=T, aug_temp_consist=False,
                    fused="on")
    with pytest.raises(ValueError, match="clip-consistent"):
        pretrain_batch(jax.random.PRNGKey(0), frames, cfg)
