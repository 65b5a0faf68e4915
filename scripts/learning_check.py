"""Does training actually learn? Run N steps of SimCLR (naked or full
DualVar) on the deterministic synthetic dataset and watch the contrastive
loss drop well below the chance plateau ln(2B-1). The synthetic videos are
low-frequency patterns, so the instance-discrimination task is learnable.

Found while building this check: lr 0.03 at batch 16 collapses the
embeddings within one step (loss pins at exactly ln(2B-1)); the reference
recipe's lr 0.003 learns steadily. Untrained 3D-CNN embeddings start out
nearly collapsed anyway (mean pairwise cosine ~0.99), so progress shows up
in the loss before top-1.

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
        optim=dataclasses.replace(cfg.optim, batch_size=16, lr=0.003,
                                  epochs=10000, schedule=(9999,)),
        run=dataclasses.replace(cfg.run, prefix="learning_check",
                                print_freq=10, eval_freq=1000,
                                save_freq=1000),
    )
    import math

    metrics = train(cfg, max_steps=steps)
    loss = metrics.get("clip_loss", float("inf"))
    top1 = metrics.get("clip_top1", 0.0)
    chance_loss = math.log(2 * 16 - 1)
    print(f"after {steps} steps: clip_loss {loss:.3f} "
          f"(chance plateau {chance_loss:.3f}), clip_top1 {top1:.3f}")
    assert loss < chance_loss - 0.4, "training did not learn"
    print("learning check PASSED")


def classifier_check(steps: int = 360):
    """Supervised path: classifier on synthetic class-structured videos must
    reach high val accuracy (verified 1.0 on TPU in 360 steps)."""
    from dualvar_tpu.core.config import CLASSIFIER_PRESETS
    from dualvar_tpu.train.classifier import train as clf_train

    cfg = CLASSIFIER_PRESETS["smoke"]
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, seq_len=8, img_dim=64,
                                 scale_hw=(80, 72), synthetic_videos=64,
                                 synthetic_classes=4, workers=4),
        model=ModelConfig(net="r3d", dtype="bfloat16"),
        optim=dataclasses.replace(cfg.optim, batch_size=16, lr=0.01,
                                  epochs=120, schedule=(80,)),
        run=dataclasses.replace(cfg.run, prefix="clf_learning_check",
                                print_freq=20, eval_freq=30, save_freq=30),
        num_class=4,
    )
    final = clf_train(cfg, max_steps=steps)
    print(f"classifier after {steps} steps: val_top1 {final.get('val_top1')}")
    assert final.get("val_top1", 0) > 0.6, "classifier did not learn"
    print("classifier learning check PASSED")


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[2] == "classifier":
        classifier_check(int(sys.argv[1]))
    else:
        main(int(sys.argv[1]) if len(sys.argv) > 1 else 300,
             sys.argv[2] if len(sys.argv) > 2 else "simclr_naked")
