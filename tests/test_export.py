"""AOT serving export (dualvar_tpu/export.py): the serialized StableHLO
artifact must reproduce the live eval forward exactly, for both serving
signatures, and round-trip through the CLI."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dualvar_tpu.aug.pipeline import AugConfig
from dualvar_tpu.core.config import CLASSIFIER_PRESETS
from dualvar_tpu.export import (export_serving, load_serving, main,
                                make_serving_fn)
from dualvar_tpu.train.classifier import build_model


@pytest.fixture(scope="module")
def smoke_model():
    cfg = CLASSIFIER_PRESETS["smoke"]
    model = build_model(cfg)
    example = jnp.zeros(
        (1, cfg.data.seq_len, cfg.data.img_dim, cfg.data.img_dim, 3))
    variables = model.init({"params": jax.random.key(0)}, example,
                           train=False)
    aug_cfg = AugConfig(img_dim=cfg.data.img_dim, seq_len=cfg.data.seq_len)
    return cfg, model, variables, aug_cfg


def _frames(cfg, n_clips=1, batch=2, seed=0):
    rng = np.random.RandomState(seed)
    H0, W0 = cfg.data.scale_hw
    return rng.randint(
        0, 256, (batch, n_clips * cfg.data.seq_len, H0, W0, 3), np.uint8)


def test_export_roundtrip_single_clip(smoke_model, tmp_path):
    cfg, model, variables, aug_cfg = smoke_model
    frames = _frames(cfg)
    path = str(tmp_path / "single.jaxexp")
    blob = export_serving(model, variables, aug_cfg, frames.shape, path,
                          platforms=("cpu",))
    assert len(blob) > 0
    served = load_serving(path)
    probs, logits, feat = served(frames)
    want_p, want_l, want_f = make_serving_fn(model, variables, aug_cfg)(frames)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want_p),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(want_l),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(want_f),
                               atol=1e-5)
    assert probs.shape == (2, cfg.num_class)
    np.testing.assert_allclose(np.asarray(probs).sum(axis=1), 1.0, atol=1e-5)


def test_export_roundtrip_ten_clip(smoke_model, tmp_path):
    cfg, model, variables, aug_cfg = smoke_model
    frames = _frames(cfg, n_clips=10)
    path = str(tmp_path / "ten.jaxexp")
    export_serving(model, variables, aug_cfg, frames.shape, path,
                   ten_clip=True, platforms=("cpu",))
    probs, logits, feat = load_serving(path)(frames)
    assert probs.shape == (2, cfg.num_class)
    assert logits.shape[:2] == (2, 10) and feat.shape[:2] == (2, 10)
    # clip-averaged probs == mean of per-clip softmax (the published
    # temporal-10-clip protocol, reference classifier.py:657-738)
    per_clip = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(probs),
                               np.asarray(per_clip.mean(axis=1)), atol=1e-6)


def test_export_cli_from_checkpoint(smoke_model, tmp_path):
    """CLI path: save a CheckpointStore checkpoint, export from it, and the
    artifact must match the live model under the loaded weights."""
    from dualvar_tpu.core.checkpoint import CheckpointStore

    cfg, model, variables, aug_cfg = smoke_model
    store = CheckpointStore(str(tmp_path / "model"))
    store.save(0, {"step": jnp.zeros((), jnp.int32),
                   "params": variables["params"],
                   "batch_stats": variables["batch_stats"]})
    out = str(tmp_path / "cli.jaxexp")
    main(["--preset", "smoke", "--ckpt", str(tmp_path / "model"),
          "--out", out, "--batch", "2", "--platforms", "cpu"])
    frames = _frames(cfg, seed=1)
    probs, _, _ = load_serving(out)(frames)
    want_p, _, _ = make_serving_fn(model, variables, aug_cfg)(frames)
    np.testing.assert_allclose(np.asarray(probs), np.asarray(want_p),
                               atol=1e-6)
