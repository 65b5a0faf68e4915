"""Shared land-as-measured merge for the hardware sweep scripts.

Each backbone costs a full TPU compile through a relay that wedges for
hours (PARITY.md round-3/4), so sweep records are merged into the JSON
artifact the moment they exist, keyed by net name. Policy (pinned by
tests/test_bench_sweep_merge.py):

  * an error record never clobbers a measured row (the wedge is the
    relay's fault, not the config's);
  * a re-measurement that is SLOWER per clip (e.g. a larger batch that
    fit but scaled sublinearly) lands as an ``also_measured`` annotation
    on the existing row instead of replacing it;
  * a faster re-measurement becomes the row and carries the previous
    row along as the annotation;
  * rows without ``clips_per_sec`` keep the original overwrite
    semantics (error->success replacement, corrupt-file tolerance).
"""

import json
import os

_ANNOT_KEYS = ("batch", "ms_per_step", "clips_per_sec", "mfu_pct",
               "videos_per_sec_10clip")


def _annot(rec: dict) -> dict:
    return {k: rec[k] for k in _ANNOT_KEYS if k in rec}


def merge_result(path: str, rec: dict, fresh_doc: dict, order: list,
                 key: str = "net"):
    doc = fresh_doc
    if os.path.exists(path):
        try:
            with open(path) as f:
                doc = json.load(f)
        except (json.JSONDecodeError, OSError):
            pass

    prev = next((r for r in doc.get("results", [])
                 if r.get(key) == rec.get(key)), None)
    if prev is not None and prev.get("clips_per_sec"):
        if rec.get("error"):
            print(f"  merge: keeping measured {rec[key]} row "
                  f"(new attempt errored)", flush=True)
            return
        if rec.get("clips_per_sec", 0) < prev["clips_per_sec"]:
            also = prev.setdefault("also_measured", [])
            also[:] = [a for a in also if a.get("batch") != rec.get("batch")]
            also.append(_annot(rec))
            print(f"  merge: {rec[key]} B={rec.get('batch')} slower per "
                  f"clip than recorded B={prev.get('batch')}; kept as "
                  f"annotation", flush=True)
            with open(path, "w") as f:
                json.dump(doc, f, indent=1)
            return
        carried = prev.get("also_measured", []) + [_annot(prev)]
        rec["also_measured"] = ([a for a in carried
                                 if a.get("batch") != rec.get("batch")]
                                + rec.get("also_measured", []))

    doc["results"] = ([r for r in doc.get("results", [])
                       if r.get(key) != rec.get(key)] + [rec])
    doc["results"].sort(key=lambda r: order.index(r[key])
                        if r.get(key) in order else 99)
    with open(path, "w") as f:
        json.dump(doc, f, indent=1)
