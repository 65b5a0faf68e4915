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


def _is_orbax_step_dir(path: str) -> bool:
    """True when ``path`` holds an orbax step checkpoint: the step dir (or an
    item dir inside it) carries orbax metadata / a commit-success marker."""
    if not os.path.isdir(path):
        return False
    markers = ("_CHECKPOINT_METADATA", "commit_success.txt", "_METADATA",
               "manifest.ocdbt")
    entries = os.listdir(path)
    if any(m in entries for m in markers):
        return True
    return any(
        os.path.isdir(os.path.join(path, e))
        and any(m in os.listdir(os.path.join(path, e)) for m in markers)
        for e in entries
    )


class CheckpointStore:
    """Two retention policies side by side, matching the reference exactly:
    a rolling 'latest' for crash recovery (utils/utils.py:29-34
    latest.pth.tar; 2 kept so a crash mid-write never loses both) and a
    'best'-k set ranked by accuracy (utils/utils.py:36-44 model_best_*).
    ``keep_all`` switches the best manager to keep everything (the k400
    behavior, pretrain.py:357)."""

    def __init__(self, directory: str, keep_all: bool = False, best_k: int = 5,
                 async_save: bool = False):
        self.directory = os.path.abspath(directory)
        # async_save=True overlaps checkpoint I/O with training: save()
        # returns once the state is snapshotted and the write runs in
        # orbax's background thread (a subsequent save/restore/close waits
        # for it). The torch reference blocks the train loop on every
        # torch.save (utils/utils.py:18-44); on TPU the step runs on device
        # while the host writes, so this is effectively free pipelining.
        self.async_save = async_save
        # backwards compat: a flat store (old layout / external dir) is
        # treated as the latest manager. Detected by the presence of an
        # actual orbax step checkpoint (digit-named dir containing orbax
        # metadata), not merely a digit-named entry — a stray '0/' dir in a
        # non-checkpoint path must not flip the layout.
        self._flat = os.path.isdir(self.directory) and any(
            name.isdigit() and _is_orbax_step_dir(
                os.path.join(self.directory, name))
            for name in os.listdir(self.directory)
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
        if not self.async_save:
            self.wait_until_finished()

    def wait_until_finished(self):
        """Block until every in-flight async save has committed."""
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
        self.wait_until_finished()  # an in-flight async save must land first
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
        self.wait_until_finished()
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


def merge_matching_leaves(
    dst: Any, src: Any, logger=None, strict: bool = False, prefix: str = ""
) -> tuple[Any, dict[str, list[str]]]:
    """Copy every ``src`` leaf whose path exists in ``dst`` with the same
    shape; keep the ``dst`` leaf otherwise. The tolerant intersection load of
    the reference's ``neq_load_customized`` (utils/utils.py:112-137), which
    deliberately loads what matches and *reports* the rest so ablation /
    cross-backbone checkpoint reuse degrades gracefully.

    Returns (merged_tree, report) with report keys 'loaded',
    'missing_in_src' (dst leaves kept at their fresh init), and 'unused_src'
    (src leaves with no matching dst path or a mismatched shape).
    ``strict=True`` raises unless the trees match exactly.
    """
    from jax.tree_util import keystr, tree_flatten_with_path

    dst_leaves, treedef = tree_flatten_with_path(dst)
    src_leaves, _ = tree_flatten_with_path(src)
    src_map = {keystr(p): v for p, v in src_leaves}
    report = {"loaded": [], "missing_in_src": [], "unused_src": []}
    merged = []
    for path, leaf in dst_leaves:
        k = keystr(path)
        s = src_map.pop(k, None)
        if s is not None and tuple(s.shape) == tuple(leaf.shape):
            merged.append(s)
            report["loaded"].append(prefix + k)
        else:
            if s is not None:  # present but shape-mismatched
                report["unused_src"].append(
                    f"{prefix}{k} (shape {tuple(s.shape)} vs "
                    f"{tuple(leaf.shape)})")
            merged.append(leaf)
            report["missing_in_src"].append(prefix + k)
    report["unused_src"].extend(prefix + k for k in src_map)
    if strict and (report["missing_in_src"] or report["unused_src"]):
        raise ValueError(
            "strict load: trees do not match; "
            f"not loaded: {report['missing_in_src'][:8]}; "
            f"unused from checkpoint: {report['unused_src'][:8]}")
    if logger:
        # mirrors the reference's '=======Check Weights Loaded======' report
        logger.info(
            f"partial load{' ' + prefix if prefix else ''}: "
            f"{len(report['loaded'])} leaves loaded, "
            f"{len(report['missing_in_src'])} kept at init, "
            f"{len(report['unused_src'])} unused from checkpoint")
        for k in report["missing_in_src"]:
            logger.info(f"  not loaded (kept init): {k}")
        for k in report["unused_src"]:
            logger.info(f"  unused from checkpoint: {k}")
    return treedef.unflatten(merged), report


def load_pretrained_backbone(
    classifier_variables: dict, pretrain_variables: dict, logger=None,
    strict: bool = False,
) -> dict:
    """Graft the pretrain encoder's backbone params + BN stats into a
    classifier variable tree (reference key remap, classifier.py:362-366 +
    partial-load tolerance of neq_load_customized, utils/utils.py:112-137).

    Both trees should contain params['backbone']; every other classifier
    subtree (final_fc, heads) keeps its fresh init — exactly the subset the
    reference's remap would have matched. Leaves whose path or shape differs
    (cross-backbone / ablation ckpt reuse) are skipped and reported;
    ``strict=True`` restores the hard failure on any mismatch.
    """
    out = jax.tree.map(lambda x: x, classifier_variables)  # shallow-ish copy
    for col in ("params", "batch_stats"):
        if col in pretrain_variables and col in out and "backbone" in pretrain_variables[col]:
            merged, _ = merge_matching_leaves(
                out[col]["backbone"], pretrain_variables[col]["backbone"],
                logger=logger, strict=strict, prefix=f"{col}/backbone")
            out[col]["backbone"] = merged
    return out
