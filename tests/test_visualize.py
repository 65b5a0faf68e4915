"""Visualization parity (round-4 VERDICT #8): the reference's image channel
(utils/tensorboard_utils.py:17 PlotterThread image dispatch), batch_denorm
(utils/utils.py:65-72), get_features attention maps (model/simclr.py:123-127)
and the --visualize driver branch (pretrain.py:555,581-584)."""

import dataclasses
import glob
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def test_batch_denorm_inverts_normalize():
    from dualvar_tpu.aug.functional import normalize
    from dualvar_tpu.core.utils import batch_denorm

    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 8, 8, 3))
    y = batch_denorm(normalize(x))
    assert np.allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_metrics_writer_add_image(tmp_path):
    from dualvar_tpu.core.metrics_writer import MetricsWriter

    w = MetricsWriter(str(tmp_path), use_tensorboard=False)
    w.add_image("vis/sample0/input", np.random.rand(16, 16, 3), 0)
    w.add_image("gray_map", np.random.rand(8, 8).astype(np.float32), 3)
    w.add_image("u8", np.zeros((4, 4, 3), np.uint8), 1)
    w.close()
    img_dir = tmp_path / "img"
    names = sorted(os.listdir(img_dir))
    assert "vis_sample0_input_0.png" in names, names
    assert "gray_map_3.png" in names, names
    assert "u8_1.png" in names, names
    from PIL import Image

    im = Image.open(img_dir / "vis_sample0_input_0.png")
    assert im.size == (16, 16)


def test_get_features_on_all_model_families(rng):
    """get_features exists on SimCLRNaked (reference parity), TSV4 and the
    MoCo encoder (beyond-reference, VERDICT #8), all via the r21d
    multi_level path."""
    from dualvar_tpu.models.ssl.moco import MoCoEncoder
    from dualvar_tpu.models.ssl.simclr import SimCLRTimeSeriesV4

    x = jax.random.uniform(rng, (1, 4, 32, 32, 3))

    m = SimCLRTimeSeriesV4(network="r21d", dtype=jnp.float32)
    block = jnp.tile(x[:, None], (1, 3, 1, 1, 1, 1))
    v = m.init({"params": rng, "shuffle": rng}, block, train=True)
    feats = m.apply(v, x, train=False,
                    method=SimCLRTimeSeriesV4.get_features)
    assert len(feats) >= 3
    for f in feats:
        assert f.ndim == 4 and f.shape[0] == 1  # (B, T', H', W')

    enc = MoCoEncoder(network="r21d", dtype=jnp.float32)
    ev = enc.init(rng, x, True)
    feats2 = enc.apply(ev, x, False, method=MoCoEncoder.get_features)
    assert len(feats2) == len(feats)
    assert all(np.all(np.isfinite(np.asarray(f))) for f in feats2)


def test_visualize_driver_writes_images(tmp_path):
    """--visualize smoke: images appear under {exp}/img/ (VERDICT #8
    done-condition)."""
    from dualvar_tpu.core.config import PRETRAIN_PRESETS, ModelConfig
    from dualvar_tpu.train.pretrain import visualize

    cfg = PRETRAIN_PRESETS["smoke_dualvar"]
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, seq_len=4, img_dim=32,
                                 scale_hw=(40, 36), workers=2,
                                 synthetic_videos=8),
        model=ModelConfig(net="r21d", model="simclr_timeseriesv4",
                          dtype="float32"),
        run=dataclasses.replace(cfg.run, log_root=str(tmp_path)),
    )
    written = visualize(cfg, n_samples=2)
    assert written
    # the writer thread is async; close() joins it, but be tolerant
    for _ in range(50):
        if all(os.path.exists(p) for p in written):
            break
        time.sleep(0.1)
    missing = [p for p in written if not os.path.exists(p)]
    assert not missing, missing
    exp_imgs = glob.glob(os.path.join(str(tmp_path), "**", "img", "*.png"),
                         recursive=True)
    assert len(exp_imgs) == len(written)
    assert any("input" in p for p in exp_imgs)
    assert any("stage" in p for p in exp_imgs)
