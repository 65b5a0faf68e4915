"""Downstream classification driver: finetune / linear-probe training,
validation, multi-crop and temporal-10-clip test protocols, and k-NN video
retrieval (reference classifier.py entry point).

Modes (reference classifier.py:38-108 flags + :273-319 dispatch):
  * train: finetune ('ft') or linear probe ('last' — backbone frozen, BN in
    inference mode, reference classifier.py:240-253,435-438);
  * test center/five/ten-crop (classifier.py:545-654 test_10crop);
  * test temporal 10-clip (classifier.py:657-738 temporal_test_10clip);
  * retrieval: 10-clip averaged features, centered + L2-normalised cosine
    k-NN, R@{1,5,10,20,50} (classifier.py:787-995 test_retrieval).

Usage:
    python -m dualvar_tpu.train.classifier --preset smoke
    python -m dualvar_tpu.train.classifier --preset smoke --test retrieval
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..aug.pipeline import (
    AugConfig,
    classifier_train_batch,
    eval_batch,
    tenclip_batch,
    tencrop_batch,
)
from ..core.checkpoint import CheckpointStore, load_pretrained_backbone
from ..core.config import CLASSIFIER_PRESETS, ClassifierConfig
from ..core.logging import get_logger
from ..core.mesh import (data_mesh_for_batch, init_distributed, make_mesh,
                         replicated, shard_batch)
from ..core.meters import AverageMeter, ProgressMeter
from ..core.metrics_writer import MetricsWriter
from ..data.indices import load_class_index, load_split
from ..data.loader import (
    ClassifierDataset,
    HostLoader,
    JpegFrameSource,
    SyntheticFrameSource,
    TenClipDataset,
    synthetic_entries,
)
from ..models.backbones import select_backbone
from ..models.heads import LinearClassifier
from ..models.ssl.losses import cross_entropy_from_logits, topk_accuracy


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def build_model(cfg: ClassifierConfig) -> LinearClassifier:
    dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[cfg.model.dtype]
    backbone, param = select_backbone(cfg.model.net, dtype=dtype,
                                      remat=cfg.model.remat)
    return LinearClassifier(
        backbone=backbone,
        feature_size=param["feature_size"],
        num_class=cfg.num_class,
        dropout_rate=cfg.dropout,
        use_dropout=cfg.use_dropout,
        use_l2_norm=cfg.use_l2_norm,
        use_final_bn=cfg.use_final_bn,
        dtype=dtype,
    )


def make_optimizer(cfg: ClassifierConfig, steps_per_epoch: int):
    """SGD + step decay at schedule epochs (classifier.py:998-1003: x0.1 at
    each scheduled epoch)."""
    o = cfg.optim
    boundaries = {e * steps_per_epoch: 0.1 for e in o.schedule}
    lr = optax.piecewise_constant_schedule(o.lr, boundaries)
    if o.optim == "adam":
        return optax.adamw(lr, weight_decay=o.wd), lr
    tx = optax.chain(
        optax.add_decayed_weights(o.wd),
        optax.sgd(lr, momentum=o.momentum),
    )
    return tx, lr


def make_train_step(model: LinearClassifier, tx, aug_cfg: AugConfig,
                    train_what: str, mesh=None):
    freeze_backbone = train_what == "last"

    def train_step(state: TrainState, frames_u8, labels, key):
        k_aug, k_drop = jax.random.split(jax.random.fold_in(key, state.step))
        clips = classifier_train_batch(k_aug, frames_u8, aug_cfg, mesh=mesh)

        # linear probe: backbone frozen AND BN fully in inference mode
        # (reference model.eval() when train_what == 'last', classifier.py:435-438)
        bn_train = not freeze_backbone

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            # in probe mode train=False keeps BN in inference mode; nothing is
            # written to the mutable collection so batch_stats pass through
            (logit, _), updated = model.apply(
                variables, clips, train=bn_train,
                rngs={"dropout": k_drop},
                mutable=["batch_stats"],
            )
            loss = cross_entropy_from_logits(logit, labels)
            return loss, (logit, updated.get("batch_stats", state.batch_stats))

        (loss, (logit, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if freeze_backbone:
            # probe mode excludes backbone params from the optimizer entirely
            # (reference classifier.py:240-247) — zero their *updates* so
            # neither gradients nor weight decay move them
            updates = dict(updates)
            updates["backbone"] = jax.tree.map(jnp.zeros_like,
                                               updates["backbone"])
        params = optax.apply_updates(state.params, updates)
        top1, top5 = topk_accuracy(logit, labels, (1, 5))
        metrics = {"loss": loss, "top1": top1, "top5": top5}
        return TrainState(step=state.step + 1, params=params,
                          batch_stats=new_bs, opt_state=new_opt), metrics

    return train_step


def make_eval_step(model: LinearClassifier, aug_cfg: AugConfig):
    """Masked-sum eval step: the final partial batch is padded to the static
    batch size with mask=0 rows, so one compiled program serves every batch
    and the returned sums are exact. Under a multi-host mesh the batch is
    globally assembled, so the sums are already global on every host."""

    @jax.jit
    def eval_step(params, batch_stats, frames_u8, labels, mask):
        clips = eval_batch(frames_u8, aug_cfg)
        logit, _ = model.apply(
            {"params": params, "batch_stats": batch_stats}, clips, train=False
        )
        logp = jax.nn.log_softmax(logit.astype(jnp.float32), axis=-1)
        per_loss = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        top1 = (logit.argmax(axis=1) == labels).astype(jnp.float32)
        k5 = jax.lax.top_k(logit, min(5, logit.shape[-1]))[1]
        top5 = (k5 == labels[:, None]).any(axis=1).astype(jnp.float32)
        m = mask.astype(jnp.float32)
        return {"loss": (per_loss * m).sum(), "top1": (top1 * m).sum(),
                "top5": (top5 * m).sum(), "n": m.sum()}

    return eval_step


def _pad_batch(batch: dict, batch_size: int) -> dict:
    """Pad a partial batch to the static batch size and add a validity mask."""
    n = len(batch["label"])
    out = dict(batch)
    if n < batch_size:
        pad = batch_size - n
        for k in list(out):
            x = out[k]
            out[k] = np.concatenate(
                [x, np.repeat(x[-1:], pad, axis=0)], axis=0)
        out["mask"] = np.concatenate([np.ones(n, np.float32),
                                      np.zeros(pad, np.float32)])
    else:
        out["mask"] = np.ones(n, np.float32)
    return out


def build_datasets(cfg: ClassifierConfig, mode: str):
    d = cfg.data
    if d.synthetic:
        entries, class_index = synthetic_entries(
            d.synthetic_videos, d.synthetic_classes
        )
        source = SyntheticFrameSource(scale=d.scale_hw)
    else:
        name = "hmdb51" if "hmdb" in d.dataset else (
            "k400" if "k400" in d.dataset else "ucf101")
        root = d.data_root or os.path.join("process_data", "data", name)
        entries = load_split(root, mode=mode, which_split=d.which_split,
                             val_size=d.val_size)
        class_index = load_class_index(root)
        source = JpegFrameSource(d.db_path, scale=d.scale_hw,
                                 fast_decode=d.fast_decode)
    return entries, class_index, source


def classifier_dataset(cfg: ClassifierConfig, mode: str) -> ClassifierDataset:
    entries, class_index, source = build_datasets(cfg, mode)
    return ClassifierDataset(
        entries=entries, class_index=class_index, source=source,
        num_frames=cfg.data.seq_len * cfg.data.num_seq, ds=cfg.data.ds,
        mode=mode,
    )


def tenclip_dataset(cfg: ClassifierConfig, mode: str) -> TenClipDataset:
    entries, class_index, source = build_datasets(cfg, mode)
    return TenClipDataset(
        entries=entries, class_index=class_index, source=source,
        num_frames=cfg.data.seq_len, ds=cfg.data.ds,
    )


def set_path(cfg: ClassifierConfig) -> str:
    """log/{prefix}/ft/{name}/{ucf|hmdb}/ layout (classifier.py:1087-1116)."""
    fold = "hmdb" if "hmdb" in cfg.data.dataset else "ucf"
    exp = os.path.join(cfg.run.log_root, cfg.run.prefix, "ft",
                       cfg.run.name_prefix, fold)
    if jax.process_index() == 0:
        os.makedirs(os.path.join(exp, "model"), exist_ok=True)
        os.makedirs(os.path.join(exp, "img"), exist_ok=True)
    return exp


def init_state(cfg: ClassifierConfig, model, tx, rng, logger):
    example = jnp.zeros(
        (1, cfg.data.seq_len, cfg.data.img_dim, cfg.data.img_dim, 3),
        jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, example, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if cfg.run.pretrain:
        pstore = CheckpointStore(cfg.run.pretrain)
        pre = pstore.restore()
        pre_vars = {"params": pre["params"], "batch_stats": pre["batch_stats"]}
        grafted = load_pretrained_backbone(
            {"params": params, "batch_stats": batch_stats}, pre_vars, logger
        )
        params, batch_stats = grafted["params"], grafted["batch_stats"]
        logger.info(f"=> loaded pretrained checkpoint '{cfg.run.pretrain}'")
    return TrainState(
        step=jnp.zeros((), jnp.int32), params=params,
        batch_stats=batch_stats, opt_state=tx.init(params),
    )


def train(cfg: ClassifierConfig, max_steps: int | None = None) -> dict[str, float]:
    init_distributed()
    exp_path = set_path(cfg)
    logger = get_logger(os.path.join(exp_path, "log"),
                        process_index=jax.process_index())
    logger.info(
        f"Classifier to {cfg.num_class} classes with {cfg.model.net} backbone"
    )
    mesh = data_mesh_for_batch(cfg.optim.batch_size)
    model = build_model(cfg)
    aug_cfg = AugConfig(
        img_dim=cfg.data.img_dim, seq_len=cfg.data.seq_len,
        with_color_jitter=cfg.aug.with_color_jitter,
        rand_flip=cfg.aug.rand_flip,
        jitter_order=cfg.aug.jitter_order,
        fused=cfg.aug.fused_aug,
    )

    train_loader = HostLoader(
        classifier_dataset(cfg, "train"), cfg.optim.batch_size,
        shuffle=True, seed=cfg.run.seed, num_workers=cfg.data.workers,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    # val sharded by process like train: shard_for_process pads every host to
    # the same shard length, so hosts stay in lockstep batch-for-batch and the
    # eval step's global sums are exact (DistributedSampler semantics)
    val_loader = HostLoader(
        classifier_dataset(cfg, "val"), cfg.optim.batch_size,
        shuffle=False, seed=cfg.run.seed, num_workers=cfg.data.workers,
        drop_last=False,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    steps_per_epoch = len(train_loader)
    logger.info(f"=> Effective batch = {cfg.optim.batch_size * jax.process_count()}"
                f"; {steps_per_epoch} steps/epoch")

    tx, lr_fn = make_optimizer(cfg, steps_per_epoch)
    rng = jax.random.PRNGKey(cfg.run.seed)
    state = init_state(cfg, model, tx, rng, logger)
    state = jax.device_put(state, replicated(mesh))
    train_step = jax.jit(
        make_train_step(model, tx, aug_cfg, cfg.train_what, mesh=mesh),
        donate_argnums=(0,),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )
    eval_step = make_eval_step(model, aug_cfg)

    store = CheckpointStore(os.path.join(exp_path, "model"),
                            async_save=cfg.run.async_ckpt)
    writer = (MetricsWriter(os.path.join(exp_path, "img", "train"))
              if jax.process_index() == 0 else None)
    start_epoch = cfg.optim.start_epoch
    if cfg.run.resume:
        last = store.latest_epoch()
        if last is not None:
            state = jax.device_put(
                store.restore(last, template=jax.tree.map(np.asarray, state)),
                replicated(mesh))
            start_epoch = last + 1
            logger.info(f"=> resumed from epoch {last}")

    best_acc = 0.0
    global_step = start_epoch * steps_per_epoch
    final: dict[str, float] = {}
    done = False
    for epoch in range(start_epoch, cfg.optim.epochs):
        meters = {k: AverageMeter(k, ":.4f") for k in ("loss", "top1", "top5")}
        progress = ProgressMeter(
            steps_per_epoch, list(meters.values()),
            prefix=f"Epoch:[{epoch}/{cfg.optim.epochs}] "
                   f"lr:{float(lr_fn(global_step)):.5f} ",
            logger=logger)
        tic = time.time()
        for it, batch in enumerate(train_loader.epoch(epoch)):
            frames = shard_batch(mesh, batch["frames"])
            labels = shard_batch(mesh, batch["label"])
            state, metrics = train_step(state, frames, labels, rng)
            if (it + 1) % cfg.run.print_freq == 0 or it == steps_per_epoch - 1:
                metrics = jax.device_get(metrics)
                for k, m in meters.items():
                    m.update(float(metrics[k]), cfg.optim.batch_size)
                progress.display(it)
                if writer:
                    for k, v in metrics.items():
                        writer.add_scalar(f"local/{k}", float(v), global_step)
                final = {k: float(v) for k, v in metrics.items()}
            global_step += 1
            if max_steps is not None and global_step >= max_steps:
                done = True
                break
        logger.info(f"train epoch [{epoch}] T-epoch:{time.time() - tic:.2f}")

        if (epoch + 1) % cfg.run.eval_freq == 0 or done:
            sums = {"loss": 0.0, "top1": 0.0, "top5": 0.0, "n": 0.0}
            for batch in val_loader.epoch(0):
                b = _pad_batch(batch, cfg.optim.batch_size)
                m = jax.device_get(eval_step(
                    state.params, state.batch_stats,
                    shard_batch(mesh, b["frames"]),
                    shard_batch(mesh, b["label"]),
                    shard_batch(mesh, b["mask"])))
                for k in sums:
                    sums[k] += float(m[k])
            n = max(sums["n"], 1.0)
            val_acc = sums["top1"] / n
            logger.info(
                f"val Epoch: [{epoch}] Loss: {sums['loss'] / n:.4f} "
                f"Acc@1: {val_acc:.4f} Acc@5: {sums['top5'] / n:.4f}")
            if writer:
                writer.add_scalar("val/top1", val_acc, epoch)
            final["val_top1"] = val_acc
            best_acc = max(best_acc, val_acc)
            # all processes call save — orbax synchronizes internally
            store.save(epoch, jax.device_get(state), {"acc": val_acc})
        if done:
            break

    if writer:
        writer.close()
    store.close()
    return final


# --------------------------------------------------------------------------
# test protocols
# --------------------------------------------------------------------------

def _gather_concat(*arrays: np.ndarray) -> tuple[np.ndarray, ...]:
    """Concatenate per-host result arrays across processes (equal shapes per
    host are guaranteed by shard_for_process' padded shards). Single-process:
    identity."""
    if jax.process_count() == 1:
        return arrays
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(arrays)
    return tuple(np.concatenate(list(g)) for g in gathered)


def _dedupe_by_vid(vids: np.ndarray, *arrays: np.ndarray):
    """Drop duplicate records (shard padding repeats some videos) and order
    by video id."""
    _, first = np.unique(vids, return_index=True)
    return tuple(a[first] for a in (vids,) + arrays)


def _test_loader(cfg: ClassifierConfig, dataset) -> HostLoader:
    return HostLoader(dataset, cfg.optim.batch_size, shuffle=False,
                      seed=0, num_workers=cfg.data.workers, drop_last=False,
                      process_index=jax.process_index(),
                      process_count=jax.process_count())


def _load_test_state(cfg: ClassifierConfig, model, logger):
    rng = jax.random.PRNGKey(0)
    example = jnp.zeros(
        (1, cfg.data.seq_len, cfg.data.img_dim, cfg.data.img_dim, 3),
        jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, example, train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    if cfg.run.resume:  # path to a classifier checkpoint dir
        store = CheckpointStore(cfg.run.resume)
        state = store.restore()  # template-free: raw array tree
        params, batch_stats = state["params"], state["batch_stats"]
        logger.info(f"=> loaded test checkpoint '{cfg.run.resume}'")
    elif cfg.run.pretrain:  # retrieval directly from a pretrain checkpoint
        pstore = CheckpointStore(cfg.run.pretrain)
        pre = pstore.restore()
        grafted = load_pretrained_backbone(
            {"params": params, "batch_stats": batch_stats},
            {"params": pre["params"], "batch_stats": pre["batch_stats"]},
            logger)
        params, batch_stats = grafted["params"], grafted["batch_stats"]
    else:
        logger.info("[warning] testing with random init weights")
    return params, batch_stats


def test_multicrop(cfg: ClassifierConfig, protocol: str = "ten") -> dict[str, float]:
    """center/five/ten-crop test (reference test_10crop, classifier.py:545-654):
    average softmax probabilities over crop x flip combinations per video."""
    init_distributed()
    exp_path = set_path(cfg)
    logger = get_logger(os.path.join(exp_path, "test_log"),
                        process_index=jax.process_index())
    model = build_model(cfg)
    params, batch_stats = _load_test_state(cfg, model, logger)
    aug_cfg = AugConfig(img_dim=cfg.data.img_dim, seq_len=cfg.data.seq_len)
    dataset = classifier_dataset(cfg, "test")
    loader = _test_loader(cfg, dataset)

    aug_list = {"center": [5], "five": [5, 1, 2, 3, 4],
                "ten": [5, 1, 2, 3, 4]}[protocol]
    flip_list = [0, 1] if protocol == "ten" else [0]

    # one compiled program per (where, flip) combination; params passed as
    # arguments so the weights are not baked into 10 programs as constants
    from functools import partial

    @partial(jax.jit, static_argnums=(2, 3))
    def step(variables, frames_u8, where, flip):
        clips = tencrop_batch(frames_u8, aug_cfg, where, bool(flip))
        logit, _ = model.apply(variables, clips, train=False)
        return jax.nn.softmax(logit.astype(jnp.float32), axis=-1)

    variables = {"params": params, "batch_stats": batch_stats}
    n_vids = len(dataset.entries)
    n_class = cfg.num_class
    # nested accumulators: center ⊂ five ⊂ ten (reference reports all three
    # from one 10-combination pass, classifier.py:629-653). Accumulation is
    # per *record* (video, window) and assignment-idempotent: each
    # (record, where, flip) probability is deterministic, so shard-padding
    # duplicates — which can land on a different host than the original
    # (shard_for_process wraps the global list) — overwrite with the same
    # value instead of double-counting, and the cross-host combine divides
    # by how many hosts saw each record.
    groups = ["center", "five", "ten"][: {"center": 1, "five": 2, "ten": 3}[protocol]]
    n_rec = len(dataset)
    rec_vid = dataset.record_vids()
    prob_rec = {g: np.zeros((n_rec, n_class), np.float64) for g in groups}
    g_passes = {g: 0 for g in groups}
    seen = np.zeros(n_rec, bool)
    labels_arr = np.full(n_vids, -1, np.int64)
    for flip in flip_list:
        for where in aug_list:
            in_five = flip == 0
            in_center = in_five and where == 5
            logger.info(f"Aug type: {where}; flip: {flip}")
            tmp = np.zeros((n_rec, n_class), np.float64)
            for batch in loader.epoch(0):
                p = np.asarray(step(variables, jnp.asarray(batch["frames"]),
                                    where, flip))
                rids = np.asarray(batch["rid"])
                tmp[rids] = p
                seen[rids] = True
                labels_arr[np.asarray(batch["vid"])] = np.asarray(batch["label"])
            for g, member in (("center", in_center), ("five", in_five),
                              ("ten", True)):
                if g in prob_rec and member:
                    prob_rec[g] += tmp
                    g_passes[g] += 1

    if jax.process_count() > 1:
        gathered = _gather_concat(
            labels_arr[None], seen[None].astype(np.int64),
            *[prob_rec[g][None] for g in groups])
        labels_arr = gathered[0].max(axis=0)
        seen_counts = gathered[1].sum(axis=0)
        for i, g in enumerate(groups):
            prob_rec[g] = (gathered[2 + i].sum(axis=0)
                           / np.maximum(seen_counts, 1)[:, None])
        seen = seen_counts > 0

    prob_sum = {g: np.zeros((n_vids, n_class), np.float64) for g in groups}
    prob_n = {g: np.zeros(n_vids, np.int64) for g in groups}
    for g in groups:
        np.add.at(prob_sum[g], rec_vid[seen], prob_rec[g][seen])
        np.add.at(prob_n[g], rec_vid[seen], g_passes[g])

    out: dict[str, float] = {}
    for g in groups:
        seen = prob_n[g] > 0
        mean_probs = prob_sum[g][seen] / prob_n[g][seen, None]
        labels = labels_arr[seen]
        top1 = float(np.mean(mean_probs.argmax(1) == labels))
        k = min(5, n_class)
        topk = np.argsort(-mean_probs, axis=1)[:, :k]
        top5 = float(np.mean((topk == labels[:, None]).any(axis=1)))
        logger.info(f"{g}-crop: Mean: Acc@1: {top1:.4f} Acc@5: {top5:.4f}")
        out[f"{g}_top1"], out[f"{g}_top5"] = top1, top5
    out["top1"], out["top5"] = out[f"{protocol}_top1"], out[f"{protocol}_top5"]
    if jax.process_index() == 0:
        with open(os.path.join(exp_path, f"prob-{protocol}.json"), "w") as f:
            json.dump(out, f)
    return out


def test_temporal_tenclip(cfg: ClassifierConfig) -> dict[str, float]:
    """Temporal 10-clip center-crop test (reference temporal_test_10clip,
    classifier.py:657-738): per video, mean softmax over 10 uniform clips."""
    init_distributed()
    exp_path = set_path(cfg)
    logger = get_logger(os.path.join(exp_path, "temporal_10_test_log"),
                        process_index=jax.process_index())
    model = build_model(cfg)
    params, batch_stats = _load_test_state(cfg, model, logger)
    aug_cfg = AugConfig(img_dim=cfg.data.img_dim, seq_len=cfg.data.seq_len)
    dataset = tenclip_dataset(cfg, "test")
    loader = _test_loader(cfg, dataset)

    @jax.jit
    def step(variables, frames_u8):
        clips = tenclip_batch(frames_u8, aug_cfg)  # (B, 10, T, d, d, C)
        B = clips.shape[0]
        flat = clips.reshape(B * 10, *clips.shape[2:])
        logit, _ = model.apply(variables, flat, train=False)
        p = jax.nn.softmax(logit.astype(jnp.float32), axis=-1)
        return p.reshape(B, 10, -1).mean(axis=1)

    variables = {"params": params, "batch_stats": batch_stats}
    probs, labels, vids, classwise = [], [], [], {}
    for batch in loader.epoch(0):
        p = np.asarray(step(variables, jnp.asarray(batch["frames"])))
        probs.append(p)
        labels.append(np.asarray(batch["label"]))
        vids.append(np.asarray(batch["vid"]))
    _, probs, labels = _dedupe_by_vid(*_gather_concat(
        np.concatenate(vids), np.concatenate(probs), np.concatenate(labels)))
    top1 = float(np.mean(probs.argmax(1) == labels))
    top5 = float(np.mean([
        l in np.argsort(-p)[:5] for p, l in zip(probs, labels)]))
    logger.info(
        f"temporal 10-clip: Mean: Acc@1: {top1:.4f} Acc@5: {top5:.4f}")
    # classwise summary (reference summarize_classwise_probability,
    # classifier.py:741-759)
    for p, l in zip(probs, labels):
        classwise.setdefault(int(l), []).append(int(p.argmax() == l))
    class_acc = {int(k): float(np.mean(v)) for k, v in classwise.items()}
    out = {"top1": top1, "top5": top5, "classwise": class_acc}
    if jax.process_index() == 0:
        with open(os.path.join(exp_path, "prob-temporal_10_clip.json"), "w") as f:
            json.dump(out, f)
    return out


def extract_tenclip_features(cfg, model, params, batch_stats, mode, aug_cfg):
    """Per-video 10-clip features: returns (mean_feature (N,D), per-clip
    feature (N,10,D), label (N,), vname list) — the artifact set the
    reference persists per split (classifier.py:878-915)."""
    dataset = tenclip_dataset(cfg, mode)
    loader = _test_loader(cfg, dataset)

    @jax.jit
    def step(variables, frames_u8):
        clips = tenclip_batch(frames_u8, aug_cfg)
        B = clips.shape[0]
        flat = clips.reshape(B * 10, *clips.shape[2:])
        _, feat = model.apply(variables, flat, train=False)
        per = feat.reshape(B, 10, -1)
        return per.mean(axis=1), per  # classifier.py:888-890

    variables = {"params": params, "batch_stats": batch_stats}
    feats, pers, labels, vids = [], [], [], []
    for batch in loader.epoch(0):
        f, p = step(variables, jnp.asarray(batch["frames"]))
        feats.append(np.asarray(f))
        pers.append(np.asarray(p))
        labels.append(np.asarray(batch["label"]))
        vids.append(np.asarray(batch["vid"]))
    vids, feats, pers, labels = _dedupe_by_vid(*_gather_concat(
        np.concatenate(vids), np.concatenate(feats), np.concatenate(pers),
        np.concatenate(labels)))
    # TenClipDataset vid == entry index, so names resolve locally
    vnames = [dataset.entries[int(v)].vname for v in vids]
    return feats, pers, labels, vnames


def test_retrieval(cfg: ClassifierConfig) -> dict[str, float]:
    """k-NN video retrieval (reference test_retrieval, classifier.py:787-995)."""
    init_distributed()
    exp_path = set_path(cfg)
    logger = get_logger(os.path.join(exp_path, "test_retrieval_log"),
                        process_index=jax.process_index())
    model = build_model(cfg)
    params, batch_stats = _load_test_state(cfg, model, logger)
    aug_cfg = AugConfig(img_dim=cfg.data.img_dim, seq_len=cfg.data.seq_len)

    test_f, test_p, test_l, test_v = extract_tenclip_features(
        cfg, model, params, batch_stats, "test", aug_cfg)
    train_f, train_p, train_l, train_v = extract_tenclip_features(
        cfg, model, params, batch_stats, "train", aug_cfg)
    logger.info(f"test {test_f.shape}, train {train_f.shape}")

    # persist the reference's full artifact set (classifier.py:861-915,977):
    # per-split mean + per-clip features, labels, video names, and the
    # similarity matrix, dataset-prefixed in --dirname (npy/json instead of
    # pth.tar/pkl — same contents, framework-neutral formats)
    ds_name = cfg.data.dataset.split("-")[0]
    feat_dir = os.path.join(exp_path, cfg.dirname)
    if jax.process_index() == 0:
        os.makedirs(feat_dir, exist_ok=True)
        for split, f, p, l, v in (("test", test_f, test_p, test_l, test_v),
                                  ("train", train_f, train_p, train_l, train_v)):
            np.save(os.path.join(feat_dir, f"{ds_name}_{split}_feature.npy"), f)
            np.save(os.path.join(feat_dir, f"{ds_name}_{split}_per_feature.npy"), p)
            np.save(os.path.join(feat_dir, f"{ds_name}_{split}_label.npy"), l)
            with open(os.path.join(feat_dir, f"{ds_name}_{split}_vname.json"),
                      "w") as fp:
                json.dump(list(v), fp)

    # centering + L2 norm + cosine similarity (classifier.py:966-975)
    test_f = test_f - test_f.mean(0, keepdims=True)
    train_f = train_f - train_f.mean(0, keepdims=True)
    test_f /= np.maximum(np.linalg.norm(test_f, axis=1, keepdims=True), 1e-12)
    train_f /= np.maximum(np.linalg.norm(train_f, axis=1, keepdims=True), 1e-12)
    sim = jnp.asarray(test_f) @ jnp.asarray(train_f).T
    sim = np.asarray(sim)
    if jax.process_index() == 0:
        np.save(os.path.join(feat_dir, f"{ds_name}_sim.npy"), sim)

    out = {}
    for k in (1, 5, 10, 20, 50):
        kk = min(k, sim.shape[1])
        topk = np.argsort(-sim, axis=1)[:, :kk]
        hit = (train_l[topk] == test_l[:, None]).any(axis=1)
        out[f"R@{k}"] = float(hit.mean())
        logger.info(f"R@{k} ({k}NN acc) = {out[f'R@{k}']:.4f}")
    if jax.process_index() == 0:
        with open(os.path.join(feat_dir, "retrieval.json"), "w") as f:
            json.dump(out, f)
    return out


def _override(group, args, names):
    kw = {n: getattr(args, n) for n in names if getattr(args, n) is not None}
    return dataclasses.replace(group, **kw) if kw else group


def main():
    """Flag surface mirrors the reference parser (classifier.py:38-108); a
    preset supplies the defaults, every flag overrides it."""
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="smoke", choices=sorted(CLASSIFIER_PRESETS))
    p.add_argument("--test", default="",
                   choices=["", "center", "five", "ten", "temporal_ten_clip",
                            "retrieval"])
    # model / probe group
    p.add_argument("--net", default=None)
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize backbone activations in the backward pass")
    p.add_argument("--train_what", default=None, choices=[None, "ft", "last"])
    p.add_argument("--use_dropout", action="store_const", const=True, default=None)
    p.add_argument("--use_norm", dest="use_l2_norm", action="store_const",
                   const=True, default=None)
    p.add_argument("--use_bn", dest="use_final_bn", action="store_const",
                   const=True, default=None)
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--jitter_order", default=None,
                   choices=[None, "batch", "sample"],
                   help="color-jitter op-order granularity: 'sample' is the "
                        "reference-exact per-clip order (use for parity runs)")
    p.add_argument("--fused_aug", default=None,
                   choices=[None, "auto", "on", "off"],
                   help="fused Pallas aug kernel (default auto: on for TPU)")
    p.add_argument("--with_color_jitter", type=int, default=None,
                   choices=[None, 0, 1],
                   help="finetune-time color jitter (classifier.py:50)")
    p.add_argument("--aug_crop", type=int, default=None,
                   choices=[None, 0, 1],
                   help="1 (default): fixed 128x171 portrait resize before "
                        "the test crop (reference --aug_crop + img_dim 112, "
                        "classifier.py:688-693); 0: short-side resize to "
                        "img_resize_dim (landscape for the 4:3 frame trees)")
    p.add_argument("--rand_flip", type=int, default=None,
                   choices=[None, 0, 1],
                   help="random horizontal flip in finetune aug "
                        "(classifier.py:1015)")
    # dataset group
    p.add_argument("--dataset", default=None)
    p.add_argument("--which_split", type=int, default=None)
    p.add_argument("--seq_len", type=int, default=None)
    p.add_argument("--num_seq", type=int, default=None)
    p.add_argument("--ds", type=int, default=None)
    p.add_argument("--img_dim", type=int, default=None)
    p.add_argument("--img_resize_dim", type=int, default=None,
                   help="host resize short side (classifier.py:58)")
    p.add_argument("-j", "--workers", type=int, default=None)
    p.add_argument("--fast_decode", type=int, default=None, choices=[None, 0, 1],
                   help="DCT-scaled JPEG decode (~1.35x faster host decode; "
                        "near-equal, not bitwise-PIL pixels)")
    p.add_argument("--data_root", default=None)
    p.add_argument("--db_path", default=None)
    p.add_argument("--val_size", type=int, default=None,
                   help="rows carved from the train CSV as val (default "
                        "800, the reference constant; lower for small "
                        "custom datasets)")
    # optim group
    p.add_argument("--optim", default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--wd", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--schedule", nargs="*", type=int, default=None)
    # run group
    p.add_argument("--prefix", default=None)
    p.add_argument("--name_prefix", default=None)
    p.add_argument("--print_freq", type=int, default=None)
    p.add_argument("--eval_freq", type=int, default=None)
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--pretrain", default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--dirname", default=None,
                   help="retrieval feature-dump dir under the experiment "
                        "path (reference classifier.py:77; default 'feature')")
    p.add_argument("--max_steps", type=int, default=None)
    args = p.parse_args()

    cfg = CLASSIFIER_PRESETS[args.preset]
    num_class_by_dataset = {"ucf101": 101, "hmdb51": 51}
    if args.dataset:
        cfg = dataclasses.replace(
            cfg, num_class=num_class_by_dataset.get(
                args.dataset.split("-")[0], cfg.num_class))
    data = _override(cfg.data, args,
                     ("dataset", "which_split", "seq_len", "num_seq", "ds",
                      "img_dim", "workers", "data_root", "db_path",
                      "val_size"))
    if args.fast_decode is not None:
        data = dataclasses.replace(data, fast_decode=bool(args.fast_decode))
    if args.img_resize_dim is not None:
        # reference Scale(img_resize_dim) is a short-side resize; the static
        # pipeline keeps the 4:3 source aspect at the new short side
        r = args.img_resize_dim
        data = dataclasses.replace(data, img_resize_dim=r,
                                   scale_hw=(round(r * 171 / 128), r))
    if args.aug_crop == 0:
        # reference non-aug_crop test path: Scale(img_resize_dim) short-side
        # resize (classifier.py:684-687) — landscape (H=r, W=4r/3) for the
        # 4:3 frame trees extract_frames produces, vs the aug_crop fixed
        # 128x171 portrait the presets default to
        r = data.img_resize_dim
        data = dataclasses.replace(data, scale_hw=(r, round(r * 171 / 128)))
    if args.data_root or args.db_path:
        data = dataclasses.replace(data, synthetic=False)
    aug = _override(cfg.aug, args, ("jitter_order", "fused_aug"))
    for k in ("with_color_jitter", "rand_flip", "aug_crop"):
        v = getattr(args, k)
        if v is not None:
            aug = dataclasses.replace(aug, **{k: bool(v)})
    cfg = dataclasses.replace(
        cfg,
        data=data,
        aug=aug,
        model=_override(cfg.model, args, ("net", "remat")),
        optim=_override(
            dataclasses.replace(
                cfg.optim,
                schedule=tuple(args.schedule) if args.schedule else cfg.optim.schedule),
            args, ("optim", "batch_size", "lr", "wd", "epochs")),
        run=_override(cfg.run, args,
                      ("prefix", "name_prefix", "print_freq", "eval_freq",
                       "save_freq", "pretrain", "resume")),
    )
    for name in ("train_what", "use_dropout", "use_l2_norm", "use_final_bn",
                 "dropout", "dirname"):
        if getattr(args, name) is not None:
            cfg = dataclasses.replace(cfg, **{name: getattr(args, name)})

    if args.test == "retrieval":
        test_retrieval(cfg)
    elif args.test == "temporal_ten_clip":
        test_temporal_tenclip(cfg)
    elif args.test in ("center", "five", "ten"):
        test_multicrop(cfg, args.test)
    else:
        train(cfg, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
