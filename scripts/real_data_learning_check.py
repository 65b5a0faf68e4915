"""Learnability through the REAL file path (round-4 VERDICT weak #7):
write the deterministic synthetic videos to disk as a JPEG frame tree in
the reference layout, index it with ClassInd.txt + train_split01.csv, and
run the PRODUCTION pretrain driver (`train()`) on it — load_split ->
JpegFrameSource (native C++ decoder) -> HostLoader -> jitted SimCLR steps
— asserting the contrastive loss drops well below the chance plateau
ln(2B-1). This is scripts/learning_check.py re-driven through every real
I/O layer a UCF101/HMDB51 run uses; accuracy-parity readiness evidence
short of real data.

Prints one JSON line. Usage: python scripts/real_data_learning_check.py
[steps] [batch]
"""

from __future__ import annotations

import dataclasses
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# dims overridable for the CPU-suite variant (tiny shapes; the hardware
# record uses the defaults)
SEQ = int(os.environ.get("RLC_SEQ", "8"))
IMG = int(os.environ.get("RLC_IMG", "64"))
H0 = IMG + 16
W0 = IMG + 8
VLEN = 5 * SEQ


def write_tree(root: str, db: str, n_videos: int = 32):
    """Synthetic learnable videos -> {db}/{class}/{video}/image_%05d.jpg +
    index CSVs under {root} (the reference directory contract)."""
    from PIL import Image
    import numpy as np

    from dualvar_tpu.data.loader import SyntheticFrameSource, synthetic_entries

    os.makedirs(root, exist_ok=True)
    entries, class_index = synthetic_entries(n_videos, 8, min_len=VLEN,
                                             max_len=VLEN + 1)
    with open(os.path.join(root, "ClassInd.txt"), "w") as f:
        f.write("\n".join(class_index.classes))
    src = SyntheticFrameSource(scale=(H0, W0))
    rows = []
    for e in entries:
        vdir = os.path.join(db, e.vname)  # vname = "class/video"
        os.makedirs(vdir, exist_ok=True)
        frames = src(e.vname, np.arange(VLEN))
        for i in range(VLEN):
            Image.fromarray(frames[i]).save(
                os.path.join(vdir, f"image_{i + 1:05d}.jpg"), quality=90)
        rows.append(f"{vdir}/,{VLEN}")
    with open(os.path.join(root, "train_split01.csv"), "w") as f:
        f.write("\n".join(rows))


def main(steps: int = 60, batch: int = 16):
    import tempfile

    from dualvar_tpu.core.config import PRETRAIN_PRESETS, ModelConfig
    from dualvar_tpu.train.pretrain import train

    base = tempfile.mkdtemp(prefix="real_learn_")
    root, db = os.path.join(base, "idx"), os.path.join(base, "frames")
    write_tree(root, db)

    cfg = PRETRAIN_PRESETS["smoke"]
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, synthetic=False, data_root=root, db_path=db,
            dataset="ucf101-2clip-stage-prototype", val_size=4,
            seq_len=SEQ, ds=2, img_dim=IMG, scale_hw=(H0, W0), workers=4),
        model=ModelConfig(net="r3d", model="simclr_naked", dtype="bfloat16"),
        optim=dataclasses.replace(cfg.optim, batch_size=batch, lr=0.003,
                                  epochs=10000, schedule=(9999,)),
        run=dataclasses.replace(cfg.run, prefix="real_learning_check",
                                log_root=os.path.join(base, "log"),
                                print_freq=min(10, steps), eval_freq=1000,
                                save_freq=1000),
    )
    metrics = train(cfg, max_steps=steps)
    loss = metrics.get("clip_loss", float("inf"))
    chance = math.log(2 * batch - 1)
    record = {
        "metric": "real-file-path learnability (JPEG tree -> native decode "
                  "-> production pretrain driver)",
        "steps": steps, "batch": batch,
        "final_clip_loss": round(float(loss), 4),
        "chance_plateau": round(chance, 4),
        "margin": round(chance - float(loss), 4),
        "learned": bool(loss < chance - 0.3),
    }
    print(json.dumps(record), flush=True)
    return 0 if record["learned"] else 1


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sys.exit(main(steps, batch))
