"""Shared land-as-measured merge for the hardware sweep scripts.

Each backbone costs a full TPU compile through a relay that wedges for
hours (PARITY.md round-3/4), so sweep records are merged into the JSON
artifact the moment they exist, keyed by net name. Policy (pinned by
tests/test_bench_sweep_merge.py):

  * an error record never clobbers a measured row, but it is PERSISTED on
    the row as ``last_error`` (a recurring OOM/failure at the recorded
    config must leave a trace, not vanish into a print);
  * a re-measurement at the SAME batch as the recorded row replaces the
    row — latest measurement wins, so a genuine perf regression revises
    the headline downward instead of hiding under a max-over-runs ratchet;
  * a re-measurement at a DIFFERENT batch that is slower per clip lands
    as an ``also_measured`` annotation on the existing row;
  * a faster different-batch re-measurement becomes the row and carries
    the previous row along as an annotation (deduped by batch, latest
    wins);
  * every measured row/annotation carries ``measured_at`` (UTC) so stale
    optima are distinguishable;
  * rows without ``clips_per_sec`` keep the original overwrite
    semantics (error->success replacement, corrupt-file tolerance).
"""

import datetime
import json
import os

_ANNOT_KEYS = ("batch", "ms_per_step", "clips_per_sec", "mfu_pct",
               "videos_per_sec_10clip", "measured_at")


def _now() -> str:
    return datetime.datetime.now(
        datetime.timezone.utc).isoformat(timespec="seconds")


def parse_batches(spec: str) -> tuple:
    """Parse the batch part of a ``net:batch`` CLI probe. Accepts a single
    int or a comma-separated list ('s3d:256,128'); raises SystemExit with a
    usage message on junk instead of a bare ValueError (ADVICE r4)."""
    try:
        batches = tuple(int(x) for x in spec.split(",") if x.strip())
    except ValueError:
        raise SystemExit(
            f"bad batch spec {spec!r}: expected 'net:B' or 'net:B1,B2' "
            f"with integer batches (e.g. s3d:256 or s3d:256,128)")
    if not batches or any(b <= 0 for b in batches):
        raise SystemExit(f"bad batch spec {spec!r}: batches must be "
                         f"positive integers")
    return batches


def _annot(rec: dict) -> dict:
    return {k: rec[k] for k in _ANNOT_KEYS if k in rec}


def _dedup_by_batch(annots: list) -> list:
    """Keep the LAST annotation per batch (later entries are newer)."""
    by_batch = {}
    for a in annots:
        by_batch[a.get("batch")] = a
    return list(by_batch.values())


def merge_result(path: str, rec: dict, fresh_doc: dict, order: list,
                 key: str = "net"):
    doc = fresh_doc
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (json.JSONDecodeError, OSError):
            pass

    if not rec.get("error"):
        rec.setdefault("measured_at", _now())

    prev = next((r for r in doc.get("results", [])
                 if r.get(key) == rec.get(key)), None)
    if prev is not None and prev.get("clips_per_sec"):
        if rec.get("error"):
            # keep the measured row, but the failure must leave a trace
            prev["last_error"] = {"error": rec["error"],
                                  "batch": rec.get("batch"), "ts": _now()}
            print(f"  merge: keeping measured {rec[key]} row "
                  f"(new attempt errored; recorded as last_error)",
                  flush=True)
            with open(path, "w") as f:
                json.dump(doc, f, indent=1)
            return
        same_batch = rec.get("batch") == prev.get("batch")
        if not same_batch and rec.get("clips_per_sec", 0) \
                < prev["clips_per_sec"]:
            also = prev.setdefault("also_measured", [])
            also[:] = _dedup_by_batch(
                [a for a in also if a.get("batch") != rec.get("batch")]
                + [_annot(rec)])
            print(f"  merge: {rec[key]} B={rec.get('batch')} slower per "
                  f"clip than recorded B={prev.get('batch')}; kept as "
                  f"annotation", flush=True)
            with open(path, "w") as f:
                json.dump(doc, f, indent=1)
            return
        if same_batch:
            # latest measurement at the recorded config wins outright —
            # annotations at other batches are carried through untouched
            if prev.get("also_measured"):
                rec.setdefault("also_measured", prev["also_measured"])
            if rec.get("clips_per_sec", 0) < prev["clips_per_sec"]:
                print(f"  merge: {rec[key]} B={rec.get('batch')} "
                      f"re-measured slower "
                      f"({rec.get('clips_per_sec')} vs "
                      f"{prev['clips_per_sec']} clips/s); row revised",
                      flush=True)
        else:
            carried = prev.get("also_measured", []) + [_annot(prev)]
            rec["also_measured"] = _dedup_by_batch(
                [a for a in carried if a.get("batch") != rec.get("batch")]
                + rec.get("also_measured", []))

    doc["results"] = ([r for r in doc.get("results", [])
                       if r.get(key) != rec.get(key)] + [rec])
    doc["results"].sort(key=lambda r: order.index(r[key])
                        if r.get(key) in order else 99)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
