"""Checkpoint store: orbax-backed pytree save/restore with the reference's
retention and cross-stage surgery semantics.

Reference behavior being reproduced (utils/utils.py:18-44, pretrain.py:287-357,
classifier.py:357-376):
  * periodic save of {state, epoch, best_acc} with rolling deletion unless
    ``keep_all`` (k400 runs keep everything);
  * a always-current "latest" pointer for crash recovery (--resume restores
    epoch+1, iteration, best_acc, model+optimizer state);
  * best-k retention ranked by train/val accuracy;
  * pretrain -> classifier transfer: the torch reference rewrites state-dict
    key strings ('encoder_q.0.' -> 'backbone.', classifier.py:362-366); here
    the param trees are structured, so the transfer is just grafting the
    pretrain tree's 'backbone' subtree (and its BN stats) into the classifier
    tree — ``load_pretrained_backbone``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointStore:
    """Two retention policies side by side, matching the reference exactly:
    a rolling 'latest' for crash recovery (utils/utils.py:29-34
    latest.pth.tar; 2 kept so a crash mid-write never loses both) and a
    'best'-k set ranked by accuracy (utils/utils.py:36-44 model_best_*).
    ``keep_all`` switches the best manager to keep everything (the k400
    behavior, pretrain.py:357)."""

    def __init__(self, directory: str, keep_all: bool = False, best_k: int = 5):
        self.directory = os.path.abspath(directory)
        # backwards compat: a flat store (old layout / external dir) is
        # treated as the latest manager
        self._flat = os.path.isdir(self.directory) and any(
            name.isdigit() for name in os.listdir(self.directory)
        )
        latest_dir = self.directory if self._flat else os.path.join(
            self.directory, "latest")
        self.latest_mgr = ocp.CheckpointManager(
            latest_dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=2, create=True),
        )
        self.best_mgr = None
        if not self._flat:
            self.best_mgr = ocp.CheckpointManager(
                os.path.join(self.directory, "best"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=None if keep_all else best_k,
                    best_fn=None if keep_all else (lambda m: m.get("acc", 0.0)),
                    best_mode="max",
                    create=True,
                ),
            )

    def save(self, epoch: int, state: Any, metrics: dict[str, float] | None = None):
        self.latest_mgr.save(epoch, args=ocp.args.StandardSave(state),
                             metrics=metrics or {})
        if self.best_mgr is not None:
            self.best_mgr.save(epoch, args=ocp.args.StandardSave(state),
                               metrics=metrics or {})
        self.latest_mgr.wait_until_finished()
        if self.best_mgr is not None:
            self.best_mgr.wait_until_finished()

    def latest_epoch(self) -> int | None:
        return self.latest_mgr.latest_step()

    def best_epoch(self) -> int | None:
        if self.best_mgr is not None:
            return self.best_mgr.best_step()
        return self.latest_mgr.latest_step()

    def restore(self, epoch: int | None = None, template: Any = None) -> Any:
        if epoch is None:
            epoch = self.latest_mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        mgr = self.latest_mgr
        if epoch not in (mgr.all_steps() or []):
            if self.best_mgr is not None and epoch in (self.best_mgr.all_steps() or []):
                mgr = self.best_mgr
            else:
                raise FileNotFoundError(
                    f"epoch {epoch} not found under {self.directory}")
        if template is not None:
            return mgr.restore(epoch, args=ocp.args.StandardRestore(template))
        return mgr.restore(epoch)

    def close(self):
        self.latest_mgr.close()
        if self.best_mgr is not None:
            self.best_mgr.close()


def save_single(path: str, state: Any):
    """One-shot pytree save (for exported features etc.)."""
    ocp.StandardCheckpointer().save(os.path.abspath(path), state, force=True)


def restore_single(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))


def load_pretrained_backbone(
    classifier_variables: dict, pretrain_variables: dict, logger=None
) -> dict:
    """Graft the pretrain encoder's backbone params + BN stats into a
    classifier variable tree (reference key remap, classifier.py:362-366 +
    partial-load tolerance of neq_load_customized, utils/utils.py:112-137).

    Both trees must contain params['backbone']; every other classifier
    subtree (final_fc, heads) keeps its fresh init — exactly the subset the
    reference's remap would have matched.
    """
    out = jax.tree.map(lambda x: x, classifier_variables)  # shallow-ish copy
    for col in ("params", "batch_stats"):
        if col in pretrain_variables and col in out and "backbone" in pretrain_variables[col]:
            src = pretrain_variables[col]["backbone"]
            dst = out[col]["backbone"]
            src_shapes = jax.tree.map(lambda a: a.shape, src)
            dst_shapes = jax.tree.map(lambda a: a.shape, dst)
            if src_shapes != dst_shapes:
                raise ValueError(
                    "pretrain backbone does not match classifier backbone: "
                    f"{src_shapes} vs {dst_shapes}"
                )
            out[col]["backbone"] = src
            if logger:
                logger.info(f"loaded pretrained backbone {col}")
    return out
