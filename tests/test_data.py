"""Index loading, sharding, datasets, and the host loader."""

import os

import numpy as np
import pytest

from dualvar_tpu.data.indices import (
    load_class_index,
    load_split,
    shard_for_process,
)
from dualvar_tpu.data.loader import (
    ClassifierDataset,
    HostLoader,
    PretrainDataset,
    SyntheticFrameSource,
    TenClipDataset,
    synthetic_entries,
)


def _write_index(tmp_path, n=20):
    root = str(tmp_path)
    classes = ["jump", "run"]
    with open(os.path.join(root, "ClassInd.txt"), "w") as f:
        f.write("\n".join(classes))
    rows = []
    for i in range(n):
        c = classes[i % 2]
        rows.append(f"/data/frames/{c}/v_{c}_{i:03d}/,{100 + i}")
    with open(os.path.join(root, "train_split01.csv"), "w") as f:
        f.write("\n".join(rows))
    with open(os.path.join(root, "test_split01.csv"), "w") as f:
        f.write("\n".join(rows[:6]))
    return root


def test_load_class_index(tmp_path):
    root = _write_index(tmp_path)
    ci = load_class_index(root)
    assert ci.num_class == 2
    assert ci.encode("run") == 1 and ci.decode(0) == "jump"


def test_load_split_train_val_disjoint(tmp_path):
    root = _write_index(tmp_path, n=20)
    train = load_split(root, "train", val_size=5)
    val = load_split(root, "val", val_size=5)
    test = load_split(root, "test")
    assert len(train) == 15 and len(val) == 5 and len(test) == 6
    assert {e.vname for e in train}.isdisjoint({e.vname for e in val})
    e = train[0]
    assert e.vname.count("/") == 1 and e.vlen >= 100  # "class/videoname"


def test_vendored_hmdb51_splits_load():
    """The hmdb51 split-01 CSVs are vendored (reference
    process_data/data/hmdb51/{train,test}_split01.csv) so --data_root
    process_data/data/hmdb51 works without regeneration."""
    root = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "process_data", "data", "hmdb51")
    ci = load_class_index(root)
    assert ci.num_class == 51
    train = load_split(root, "train")  # default val carve-out of 800
    val = load_split(root, "val")
    test = load_split(root, "test")
    assert len(train) == 3563 - 800 and len(val) == 800 and len(test) == 1523
    assert {e.vname for e in train}.isdisjoint({e.vname for e in val})
    labels = {e.vlabel for e in train + val + test}
    assert labels <= set(ci.classes)
    e = train[0]
    assert e.vname == f"{e.vlabel}/{e.vname.split('/')[1]}" and e.vlen > 0


def test_vendored_ucf101_video_source():
    """video_source.json (reference process_data/data/ucf101/) maps
    'v_<Class>_g<group>' to a source-video id; vendored for dataset-prep
    parity."""
    import json

    root = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "process_data", "data", "ucf101")
    with open(os.path.join(root, "video_source.json")) as f:
        src = json.load(f)
    assert len(src) > 2000 and all(isinstance(v, int) for v in src.values())
    assert "v_ApplyEyeMakeup_g01" in src


def test_shard_for_process_partitions():
    shards = [shard_for_process(103, p, 4, shuffle_seed=1) for p in range(4)]
    assert all(len(s) == len(shards[0]) for s in shards)
    total = np.concatenate(shards)
    assert set(total.tolist()) == set(range(103))  # covers all (with pad dups)


def test_synthetic_source_deterministic():
    src = SyntheticFrameSource(scale=(24, 20))
    a = src("cls/vid1", np.array([0, 3, 5]))
    b = src("cls/vid1", np.array([0, 3, 5]))
    np.testing.assert_array_equal(a, b)
    assert a.shape == (3, 24, 20, 3) and a.dtype == np.uint8
    c = src("cls/vid2", np.array([0, 3, 5]))
    assert np.abs(a.astype(int) - c.astype(int)).mean() > 1


def test_pretrain_dataset_sample():
    entries, ci = synthetic_entries(8, 2)
    ds = PretrainDataset(entries, ci, SyntheticFrameSource((24, 20)),
                         num_frames=4, ds=2)
    s = ds(0, np.random.default_rng(0))
    assert s["frames"].shape == (12, 24, 20, 3)  # 3 views x 4 frames
    assert 0 <= s["label"] < 2


def test_tenclip_dataset_sample():
    entries, ci = synthetic_entries(8, 2)
    ds = TenClipDataset(entries, ci, SyntheticFrameSource((24, 20)),
                        num_frames=4, ds=2)
    s = ds(1, np.random.default_rng(0))
    assert s["frames"].shape == (40, 24, 20, 3)


def test_host_loader_deterministic_and_shuffles():
    entries, ci = synthetic_entries(16, 2)
    ds = ClassifierDataset(entries, ci, SyntheticFrameSource((24, 20)),
                           num_frames=4, ds=2, mode="train")
    l1 = HostLoader(ds, batch_size=4, seed=5, num_workers=2)
    l2 = HostLoader(ds, batch_size=4, seed=5, num_workers=2)
    b1 = next(iter(l1.epoch(0)))
    b2 = next(iter(l2.epoch(0)))
    np.testing.assert_array_equal(b1["frames"], b2["frames"])
    np.testing.assert_array_equal(b1["label"], b2["label"])
    # different epoch -> different order
    b3 = next(iter(l1.epoch(1)))
    assert not np.array_equal(b1["vid"], b3["vid"])
    assert len(l1) == 4


def test_host_loader_drop_last():
    entries, ci = synthetic_entries(10, 2)
    ds = ClassifierDataset(entries, ci, SyntheticFrameSource((24, 20)),
                           num_frames=4, ds=2, mode="val")
    keep = HostLoader(ds, batch_size=4, drop_last=False, shuffle=False)
    drop = HostLoader(ds, batch_size=4, drop_last=True, shuffle=False)
    assert len(keep) == 3 and len(drop) == 2
    batches = list(keep.epoch(0))
    assert [len(b["label"]) for b in batches] == [4, 4, 2]


def test_classifier_dataset_test_mode_enumerates_all_windows():
    # every half-overlapping window of every video becomes one record with
    # the video's vid; per-vid prob averaging then reproduces the reference's
    # mean-over-windows protocol (classifier.py:612-628)
    from dualvar_tpu.data import samplers as S
    from dualvar_tpu.data.loader import (ClassifierDataset,
                                         SyntheticFrameSource,
                                         synthetic_entries)

    entries, ci = synthetic_entries(6, 2)
    ds = ClassifierDataset(entries=entries, class_index=ci,
                           source=SyntheticFrameSource(scale=(24, 20)),
                           num_frames=16, ds=2, mode="test")
    expected = sum(S.n_test_windows(e.vlen, 16, 2) for e in entries)
    assert len(ds) == expected > len(entries)  # synthetic vlen >= 60 -> multi
    rng = np.random.default_rng(0)
    vids = [int(ds(i, rng)["vid"]) for i in range(len(ds))]
    counts = np.bincount(vids, minlength=len(entries))
    for ei, e in enumerate(entries):
        assert counts[ei] == S.n_test_windows(e.vlen, 16, 2)
    sample = ds(0, rng)
    assert sample["frames"].shape == (16, 24, 20, 3)


def test_pretrain_dataset_variants():
    # 2clip / prototype / stage-prototype clip assembly (reference
    # local_dataset.py:55-175, 204-244, 246-308)
    from dualvar_tpu.data.loader import (PretrainDataset,
                                         SyntheticFrameSource,
                                         synthetic_entries)

    entries, ci = synthetic_entries(4, 2)
    src = SyntheticFrameSource(scale=(24, 20))
    for variant, aug_series, views in (("2clip", False, 2),
                                       ("2clip", True, 3),
                                       ("prototype", False, 2),
                                       ("stage-prototype", True, 3)):
        ds = PretrainDataset(entries=entries, class_index=ci, source=src,
                             num_frames=8, ds=2, aug_series=aug_series,
                             variant=variant)
        s = ds(0, np.random.default_rng(0))
        assert s["frames"].shape == (views * 8, 24, 20, 3), variant
    # aug_series appends clip1 again: view 3 == view 1
    ds = PretrainDataset(entries=entries, class_index=ci, source=src,
                         num_frames=8, ds=2, aug_series=True, variant="2clip")
    f = ds(1, np.random.default_rng(1))["frames"]
    np.testing.assert_array_equal(f[:8], f[16:])


def test_dataset_variant_name_mapping():
    from dualvar_tpu.train.pretrain import dataset_variant

    assert dataset_variant("ucf101-2clip-stage-prototype") == "stage-prototype"
    assert dataset_variant("k400-2clip-stage-prototype") == "stage-prototype"
    assert dataset_variant("ucf101-2clip-prototype") == "prototype"
    assert dataset_variant("ucf101-2clip") == "2clip"
    assert dataset_variant("ucf101") == "stage-prototype"


def test_vendored_class_indices():
    # official class lists vendored under process_data/data (SURVEY §2.1 #21)
    import os

    from dualvar_tpu.data.indices import load_class_index

    root = os.path.join(os.path.dirname(__file__), "..", "process_data", "data")
    for name, n in (("ucf101", 101), ("hmdb51", 51), ("k400", 400)):
        ci = load_class_index(os.path.join(root, name))
        assert len(ci.classes) == n
    ucf = load_class_index(os.path.join(root, "ucf101"))
    assert ucf.encode("ApplyEyeMakeup") == 0


def test_vendored_ucf_split_lists_parse():
    import os

    from dualvar_tpu.data.prep.write_csv import ucf101_split_videos

    root = os.path.join(os.path.dirname(__file__), "..", "process_data",
                        "data", "ucf101")
    train = ucf101_split_videos(root, 1, "train")
    test = ucf101_split_videos(root, 1, "test")
    assert len(train) == 9537 and len(test) == 3783  # official split-1 sizes
    assert all("/" in v and not v.endswith(".avi") for v in train[:5])


def test_load_split_missing_csv_message(tmp_path):
    import pytest

    from dualvar_tpu.data.indices import load_split

    with pytest.raises(FileNotFoundError, match="write_csv"):
        load_split(str(tmp_path), mode="train")
