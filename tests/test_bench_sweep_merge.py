"""Regression tests for the per-net incremental merge in the hardware sweep
scripts (scripts/backbone_bench.py, scripts/eval_bench.py) and the resume
predicate in scripts/tpu_watch_sweeps.py.

Each backbone costs a full TPU compile through a relay that wedges for
hours (PARITY.md round-3/4); a sweep that only writes its JSON at the end
loses everything to a mid-run death (observed live: round-4 left
BENCH_BACKBONES.json with a single net). These pin the land-as-measured
behavior: every net's record is merged keyed by name the moment it exists,
re-runs overwrite, error records are replaced by later successes, and the
watcher treats only error-free records as done.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import tpu_watch_sweeps as watch  # noqa: E402  (no jax import — cheap)


def _merge_fns():
    import backbone_bench
    import eval_bench
    return [(backbone_bench._merge_result, backbone_bench.CANDIDATES),
            (eval_bench._merge_result, eval_bench.CANDIDATES)]


def test_merge_accumulates_overwrites_and_orders(tmp_path):
    for i, (merge, candidates) in enumerate(_merge_fns()):
        path = str(tmp_path / f"bench{i}.json")
        merge(path, {"net": "r50", "batch": 16, "ms_per_step": 1.0})
        merge(path, {"net": "r3d", "batch": 128, "ms_per_step": 2.0})
        merge(path, {"net": "r3d", "batch": 128, "ms_per_step": 3.0})
        doc = json.load(open(path))
        by_net = {r["net"]: r for r in doc["results"]}
        assert set(by_net) == {"r3d", "r50"}
        assert by_net["r3d"]["ms_per_step"] == 3.0, "re-run must overwrite"
        order = [r["net"] for r in doc["results"]]
        assert order == sorted(order, key=list(candidates).index), \
            "results must hold registry order regardless of merge order"
        assert doc["shape"] and doc["device"]


def test_merge_replaces_error_with_success_and_tolerates_corrupt(tmp_path):
    for i, (merge, _) in enumerate(_merge_fns()):
        path = str(tmp_path / f"bench{i}.json")
        merge(path, {"net": "s3d", "error": "relay died"})
        merge(path, {"net": "s3d", "batch": 64, "ms_per_step": 5.0})
        doc = json.load(open(path))
        (rec,) = [r for r in doc["results"] if r["net"] == "s3d"]
        assert "error" not in rec and rec["ms_per_step"] == 5.0
        # a half-written file from a killed process must not wedge the sweep
        with open(path, "w") as f:
            f.write('{"results": [')
        merge(path, {"net": "c3d", "batch": 32, "ms_per_step": 7.0})
        doc = json.load(open(path))
        assert [r["net"] for r in doc["results"]] == ["c3d"]


def test_merge_best_row_policy(tmp_path):
    """Measured rows are protected but honest: errors never clobber them
    (yet persist as last_error), slower different-batch re-measurements
    land as annotations, faster ones take over and keep the old row as the
    annotation, and a same-batch re-measurement replaces the row so a
    real regression revises the headline (scripts/_sweep_merge.py)."""
    for i, (merge, _) in enumerate(_merge_fns()):
        path = str(tmp_path / f"best{i}.json")
        merge(path, {"net": "s3d", "batch": 64, "ms_per_step": 91.9,
                     "clips_per_sec": 1393.0})
        doc = json.load(open(path))
        (rec,) = [r for r in doc["results"] if r["net"] == "s3d"]
        assert rec["measured_at"], "measured rows must carry a timestamp"
        # error attempt must not replace the measured row, but must leave
        # a trace on it
        merge(path, {"net": "s3d", "batch": 64, "error": "relay wedged"})
        doc = json.load(open(path))
        (rec,) = [r for r in doc["results"] if r["net"] == "s3d"]
        assert rec["clips_per_sec"] == 1393.0 and "error" not in rec
        assert rec["last_error"]["error"] == "relay wedged"
        assert rec["last_error"]["batch"] == 64 and rec["last_error"]["ts"]
        # slower larger batch -> annotation, row unchanged
        merge(path, {"net": "s3d", "batch": 256, "ms_per_step": 400.0,
                     "clips_per_sec": 1280.0})
        doc = json.load(open(path))
        (rec,) = [r for r in doc["results"] if r["net"] == "s3d"]
        assert rec["batch"] == 64
        (a,) = rec["also_measured"]
        assert (a["batch"], a["clips_per_sec"]) == (256, 1280.0)
        # re-measuring an annotation batch updates the annotation in place
        merge(path, {"net": "s3d", "batch": 256, "ms_per_step": 390.0,
                     "clips_per_sec": 1313.0})
        doc = json.load(open(path))
        (rec,) = [r for r in doc["results"] if r["net"] == "s3d"]
        assert len(rec["also_measured"]) == 1
        assert rec["also_measured"][0]["clips_per_sec"] == 1313.0
        # faster batch takes the row and carries the old one along
        merge(path, {"net": "s3d", "batch": 128, "ms_per_step": 160.0,
                     "clips_per_sec": 1600.0})
        doc = json.load(open(path))
        (rec,) = [r for r in doc["results"] if r["net"] == "s3d"]
        assert rec["batch"] == 128 and rec["clips_per_sec"] == 1600.0
        by_batch = {a["batch"]: a for a in rec["also_measured"]}
        assert by_batch[64]["clips_per_sec"] == 1393.0
        assert by_batch[256]["clips_per_sec"] == 1313.0
        # SAME-batch slower re-measurement revises the headline row —
        # the artifact is latest-measured-per-batch, not max-over-runs
        merge(path, {"net": "s3d", "batch": 128, "ms_per_step": 170.0,
                     "clips_per_sec": 1505.0})
        doc = json.load(open(path))
        (rec,) = [r for r in doc["results"] if r["net"] == "s3d"]
        assert rec["clips_per_sec"] == 1505.0, \
            "same-batch re-measurement must replace the row"
        assert {a["batch"] for a in rec["also_measured"]} == {64, 256}, \
            "other-batch annotations must be carried through"


def test_watcher_done_requires_error_free_record(tmp_path, monkeypatch):
    monkeypatch.setattr(watch, "REPO", str(tmp_path))
    art = "BENCH_X.json"
    assert not watch._done(art, "r3d"), "missing artifact is not done"
    with open(tmp_path / art, "w") as f:
        json.dump({"results": [{"net": "r3d", "ms_per_step": 1.0},
                               {"net": "s3d", "error": "oom"}]}, f)
    assert watch._done(art, "r3d")
    assert not watch._done(art, "s3d"), "error record must be retried"
    assert not watch._done(art, "r21d")
    with open(tmp_path / art, "w") as f:
        f.write("not json")
    assert not watch._done(art, "r3d"), "corrupt artifact is not done"
