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
    # persisted artifact set mirrors the reference (classifier.py:861-915,
    # 977): per-split mean/per-clip features, labels, vnames + sim matrix,
    # dataset-prefixed in --dirname
    import glob
    import json as _json
    import os

    feat_dirs = glob.glob(os.path.join(
        clf_cfg.run.log_root, "**", clf_cfg.dirname), recursive=True)
    assert len(feat_dirs) == 1
    d, ds = feat_dirs[0], clf_cfg.data.dataset.split("-")[0]
    for split in ("test", "train"):
        f = np.load(os.path.join(d, f"{ds}_{split}_feature.npy"))
        p = np.load(os.path.join(d, f"{ds}_{split}_per_feature.npy"))
        l = np.load(os.path.join(d, f"{ds}_{split}_label.npy"))
        v = _json.load(open(os.path.join(d, f"{ds}_{split}_vname.json")))
        n = clf_cfg.data.synthetic_videos
        assert f.shape[0] == p.shape[0] == l.shape[0] == len(v) == n
        assert p.shape[1] == 10 and p.shape[2] == f.shape[1]
        np.testing.assert_allclose(p.mean(1), f, rtol=1e-5, atol=1e-5)
        assert all(isinstance(x, str) and "/" in x for x in v)
    sim = np.load(os.path.join(d, f"{ds}_sim.npy"))
    assert sim.shape == (n, n)


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
