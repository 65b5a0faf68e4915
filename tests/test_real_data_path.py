"""End-to-end real-file data path: frame JPEGs on disk + CSV indices ->
load_split -> PretrainDataset/JpegFrameSource (native decoder) -> HostLoader
-> one jitted pretrain step. This is the exact plumbing a real UCF101/HMDB51
run uses (minus scale)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from dualvar_tpu.data.indices import load_class_index, load_split  # noqa: E402
from dualvar_tpu.data.loader import HostLoader, JpegFrameSource, PretrainDataset  # noqa: E402


@pytest.fixture(scope="module")
def frame_db(tmp_path_factory):
    """8 videos x 2 classes, 30 frames each, reference directory layout:
    {db}/{class}/{video}/image_%05d.jpg + ClassInd.txt + train_split01.csv."""
    root = tmp_path_factory.mktemp("idx")
    db = tmp_path_factory.mktemp("frames")
    classes = ["wave", "jump"]
    (root / "ClassInd.txt").write_text("\n".join(classes))
    rng = np.random.RandomState(0)
    rows = []
    for v in range(8):
        cls = classes[v % 2]
        vdir = db / cls / f"v_{cls}_{v:03d}"
        vdir.mkdir(parents=True)
        base = rng.randint(0, 255, (60, 80, 3), dtype=np.uint8)
        for i in range(30):
            Image.fromarray(np.roll(base, i * 2, axis=1)).save(
                str(vdir / f"image_{i + 1:05d}.jpg"), quality=80)
        rows.append(f"{vdir}/,30")
    (root / "train_split01.csv").write_text("\n".join(rows))
    return str(root), str(db)


def test_load_split_and_decode(frame_db):
    root, db = frame_db
    entries = load_split(root, "train", val_size=2)
    val = load_split(root, "val", val_size=2)
    assert len(entries) == 6 and len(val) == 2
    ci = load_class_index(root)
    src = JpegFrameSource(db, scale=(48, 40))
    frames = src(entries[0].vname, np.array([0, 5, 29]))
    assert frames.shape == (3, 48, 40, 3)
    assert frames.std() > 5  # actually decoded content, not zeros


def test_pretrain_step_on_real_files(frame_db):
    root, db = frame_db
    entries = load_split(root, "train", val_size=2)
    ci = load_class_index(root)
    ds = PretrainDataset(
        entries=entries, class_index=ci,
        source=JpegFrameSource(db, scale=(48, 40)),
        num_frames=4, ds=2,
    )
    loader = HostLoader(ds, batch_size=4, seed=0, num_workers=2)
    batch = next(iter(loader.epoch(0)))
    assert batch["frames"].shape == (4, 12, 48, 40, 3)

    from dualvar_tpu.aug.pipeline import AugConfig, pretrain_batch
    from dualvar_tpu.models.ssl.simclr import SimCLRNaked

    cfg = AugConfig(img_dim=32, seq_len=4)
    block = pretrain_batch(jax.random.PRNGKey(0),
                           jnp.asarray(batch["frames"]), cfg)
    model = SimCLRNaked(network="r3d")
    variables = model.init({"params": jax.random.PRNGKey(0)}, block[:, :2],
                           train=True)
    ret, _ = model.apply(variables, block[:, :2], train=True,
                         mutable=["batch_stats"])
    assert np.isfinite(float(ret["clip_contrast_loss"]))


def test_native_batch_assembler_matches_per_sample(frame_db):
    """HostLoader's whole-batch native assembler (one decode call per
    batch straight into the batch buffer) must produce bitwise-identical
    batches to the per-sample path."""
    from dualvar_tpu import native
    from dualvar_tpu.data.loader import ClassifierDataset

    if not native.available():
        pytest.skip("native decoder unavailable")
    root, db = frame_db
    entries = load_split(root, "train", val_size=2)
    ci = load_class_index(root)
    ds = ClassifierDataset(
        entries=entries, class_index=ci,
        source=JpegFrameSource(db, scale=(48, 40)),
        num_frames=4, ds=2)
    fast = HostLoader(ds, 3, shuffle=True, seed=7, num_workers=2)
    assert fast._native_batch_ctx() is not None
    slow = HostLoader(ds, 3, shuffle=True, seed=7, num_workers=2)
    slow._native_batch_ctx = lambda: None  # force the per-sample path
    for bf, bs in zip(fast.epoch(3), slow.epoch(3)):
        assert set(bf) == set(bs)
        for k in bf:
            np.testing.assert_array_equal(bf[k], bs[k])
