"""End-to-end pytest smoke for the classifier eval protocols and driver loops
on tiny synthetic configs (the CLI equivalents were also driven manually;
these pin them in CI)."""

import dataclasses

import numpy as np
import pytest

from dualvar_tpu.core.config import CLASSIFIER_PRESETS, PRETRAIN_PRESETS, ModelConfig


def _tiny(cfg):
    return dataclasses.replace(
        cfg,
        data=dataclasses.replace(
            cfg.data, seq_len=4, img_dim=32, scale_hw=(40, 36),
            synthetic_videos=8, synthetic_classes=2, workers=2),
        model=ModelConfig(net="r3d", dtype="float32"),
        run=dataclasses.replace(cfg.run, log_root=None),  # set per-test
    )


@pytest.fixture
def clf_cfg(tmp_path):
    cfg = _tiny(CLASSIFIER_PRESETS["smoke"])
    cfg = dataclasses.replace(
        cfg, num_class=2,
        optim=dataclasses.replace(cfg.optim, batch_size=4, epochs=1),
        run=dataclasses.replace(cfg.run, log_root=str(tmp_path),
                                print_freq=1, eval_freq=1))
    return cfg


def test_retrieval_protocol(clf_cfg):
    from dualvar_tpu.train.classifier import test_retrieval

    out = test_retrieval(clf_cfg)
    assert set(out) == {"R@1", "R@5", "R@10", "R@20", "R@50"}
    for v in out.values():
        assert 0.0 <= v <= 1.0
    # synthetic train/test share videos and features are deterministic:
    # nearest neighbor of each video is itself
    assert out["R@1"] == 1.0


def test_temporal_tenclip_protocol(clf_cfg):
    from dualvar_tpu.train.classifier import test_temporal_tenclip

    out = test_temporal_tenclip(clf_cfg)
    assert 0.0 <= out["top1"] <= 1.0 and out["top5"] == 1.0  # 2 classes
    assert out["classwise"]


def test_center_crop_protocol(clf_cfg):
    from dualvar_tpu.train.classifier import test_multicrop

    out = test_multicrop(clf_cfg, "center")
    assert 0.0 <= out["top1"] <= 1.0


def test_classifier_train_loop(clf_cfg):
    from dualvar_tpu.train.classifier import train

    final = train(clf_cfg, max_steps=2)
    assert np.isfinite(final["loss"])
    assert "val_top1" in final


def test_pretrain_loop_and_resume(tmp_path):
    from dualvar_tpu.train.pretrain import train

    cfg = PRETRAIN_PRESETS["smoke"]
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, seq_len=4, img_dim=32,
                                 scale_hw=(40, 36), synthetic_videos=8,
                                 workers=2),
        optim=dataclasses.replace(cfg.optim, batch_size=4, epochs=2),
        run=dataclasses.replace(cfg.run, log_root=str(tmp_path),
                                print_freq=1, eval_freq=1, save_freq=1),
    )
    m1 = train(cfg, max_steps=2)
    assert np.isfinite(m1["total_loss"])
    # resume from the saved checkpoint
    cfg2 = cfg.replace(run=dataclasses.replace(cfg.run, resume="auto"))
    m2 = train(cfg2, max_steps=4)
    assert np.isfinite(m2["total_loss"])


def test_temporal_tenclip_resumes_trained_checkpoint(clf_cfg, tmp_path):
    """Train -> save -> run a test protocol from the saved checkpoint
    (the reference --test path, classifier.py:274-319)."""
    import dataclasses as dc
    import os

    from dualvar_tpu.train.classifier import set_path, test_temporal_tenclip, train

    train(clf_cfg, max_steps=1)
    ckpt_dir = os.path.join(set_path(clf_cfg), "model")
    cfg = dc.replace(clf_cfg, run=dc.replace(clf_cfg.run, resume=ckpt_dir))
    out = test_temporal_tenclip(cfg)
    assert 0.0 <= out["top1"] <= 1.0


@pytest.mark.parametrize("dataset_name,model", [
    ("ucf101-2clip", "simclr_naked"),
    ("ucf101-2clip-prototype", "simclr_naked"),
])
def test_pretrain_variants_smoke(dataset_name, model, tmp_path):
    # reference get_data selects dataset classes by name (pretrain.py:535-548)
    import dataclasses

    from dualvar_tpu.core.config import PRETRAIN_PRESETS, ModelConfig
    from dualvar_tpu.train.pretrain import train

    cfg = PRETRAIN_PRESETS["smoke"]
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, dataset=dataset_name, seq_len=4,
                                 img_dim=32, scale_hw=(40, 36)),
        model=ModelConfig(net="r3d", model=model, dtype="float32"),
        run=dataclasses.replace(cfg.run, log_root=str(tmp_path),
                                prefix=f"smoke_{dataset_name}"),
    )
    final = train(cfg, max_steps=2)
    assert any(k.endswith("_loss") for k in final)
    assert all(np.isfinite(v) for v in final.values())
