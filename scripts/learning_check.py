"""Does training actually learn? Run N steps of SimCLR (naked or full
DualVar) on the deterministic synthetic dataset and watch the contrastive
top-1 accuracy climb far above chance. The synthetic videos are mutually
distinguishable, so the instance-discrimination task is learnable.

Usage: python scripts/learning_check.py [steps] [model]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dualvar_tpu.core.config import PRETRAIN_PRESETS, ModelConfig
from dualvar_tpu.train.pretrain import train


def main(steps: int = 60, model: str = "simclr_naked"):
    cfg = PRETRAIN_PRESETS["smoke"]
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, seq_len=8, img_dim=64,
                                 scale_hw=(80, 72), synthetic_videos=32,
                                 workers=4),
        model=ModelConfig(net="r3d", model=model, dtype="bfloat16",
                          moco_k=32),
        optim=dataclasses.replace(cfg.optim, batch_size=16, lr=0.03,
                                  epochs=1000, schedule=(999,)),
        run=dataclasses.replace(cfg.run, prefix="learning_check",
                                print_freq=10, eval_freq=1000,
                                save_freq=1000),
    )
    metrics = train(cfg, max_steps=steps)
    top1 = metrics.get("clip_top1", 0.0)
    print(f"final clip_top1 after {steps} steps: {top1:.3f} "
          f"(chance ~ {1 / (2 * 16):.3f})")
    assert top1 > 0.3, "training did not learn"
    print("learning check PASSED")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 60,
         sys.argv[2] if len(sys.argv) > 2 else "simclr_naked")
