"""SSL pretraining driver (reference pretrain.py entry point).

One jitted ``train_step`` fuses: uint8 batch -> on-device augmentation ->
model forward (all losses) -> grads -> SGD update -> metric scalars. The
batch is sharded over the mesh 'data' axis; parameters/optimizer/MoCo state
are replicated — XLA's partitioner supplies what DDP + SyncBN + GatherLayer
did in the reference (pretrain.py:244-253, utils/utils.py:321).

Usage:
    python -m dualvar_tpu.train.pretrain --preset smoke
    python -m dualvar_tpu.train.pretrain --preset paper_table1_k400 \
        --data_root ... --db_path ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ..aug.pipeline import AugConfig, pretrain_batch
from ..core.utils import batch_denorm
from ..core.checkpoint import CheckpointStore, merge_matching_leaves
from ..core.config import PRETRAIN_PRESETS, PretrainConfig
from ..core.logging import get_logger
from ..core.mesh import (data_mesh_for_batch, init_distributed, make_mesh,
                         replicated, shard_batch)
from ..core.meters import AverageMeter, MeterBank, ProgressMeter
from ..core.metrics_writer import MetricsWriter
from ..data.indices import load_class_index, load_split
from ..data.loader import (
    HostLoader,
    JpegFrameSource,
    PretrainDataset,
    SyntheticFrameSource,
    synthetic_entries,
)
from ..models.ssl.losses import topk_accuracy
from .tasks import TaskState, make_task, total_loss


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    moco: Any
    opt_state: Any


def _load_pretrain_weights(state: "TrainState", path: str, logger) -> "TrainState":
    """Tolerant weights-only load into a fresh TrainState: params, BN stats,
    and MoCo state (key-encoder params/stats by matching leaves; queue /
    series_queue / ptr by matching shape). Optimizer state and step are left
    at init — the reference's --pretrain semantics (pretrain.py:306-319 +
    neq_load_customized, utils/utils.py:112-137). Accepts our own pretrain
    checkpoints and reference imports written by core/convert.py."""
    pre = CheckpointStore(path).restore()  # template-free raw tree
    updates = {}
    for field in ("params", "batch_stats"):
        src = pre.get(field)
        if src is not None:
            merged, _ = merge_matching_leaves(
                getattr(state, field), src, logger, prefix=field + " ")
            updates[field] = merged
    src_moco = pre.get("moco")
    if state.moco is not None and isinstance(src_moco, dict):
        m = state.moco
        mupd = {}
        for f in ("params_k", "batch_stats_k"):
            s = src_moco.get(f)
            if s is not None and getattr(m, f) is not None:
                merged, _ = merge_matching_leaves(
                    getattr(m, f), s, logger, prefix=f"moco.{f} ")
                mupd[f] = merged
        for f in ("queue", "series_queue", "ptr"):
            s = src_moco.get(f)
            d = getattr(m, f)
            if s is not None and d is not None:
                if tuple(np.shape(s)) == tuple(np.shape(d)):
                    mupd[f] = jnp.asarray(np.asarray(s), d.dtype)
                elif logger:
                    logger.info(
                        f"  moco.{f} shape {np.shape(s)} != {np.shape(d)}, "
                        "kept init")
        updates["moco"] = m.replace(**mupd)
    return state.replace(**updates)


def make_optimizer(cfg: PretrainConfig, steps_per_epoch: int):
    """SGD momentum 0.9 + decoupled-into-grad weight decay + MultiStepLR
    gamma 0.1 (reference pretrain.py:272,328). ``optim='adam'``: the
    reference parses --optim (pretrain.py:128) but its optimizer is
    hard-coded SGD (:272) — here the flag actually works (adamw, matching
    the classifier driver's adam branch)."""
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


def compute_metrics(ret: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """Per-loss scalars + accuracies, mirroring the reference's dynamic meter
    discovery (pretrain.py:404-445) with a static key set under jit."""
    metrics: dict[str, jax.Array] = {}
    for key, val in ret.items():
        if not key.endswith("loss"):
            continue
        prefix = key.replace("contrast_loss", "").replace("loss", "").rstrip("_")
        metrics[f"{prefix}_loss"] = val
        for lk in (f"{prefix}_logits", f"{prefix}_margin_logits"):
            if lk in ret:
                labels = ret[lk.replace("logits", "labels")]
                metrics[f"{prefix}_top1"] = topk_accuracy(ret[lk], labels, (1,))[0]
                if prefix == "clip":
                    metrics["clip_top5"] = topk_accuracy(ret[lk], labels, (1, 5))[1]
    metrics["total_loss"] = total_loss(ret)
    return metrics


def make_train_step(task, tx, aug_cfg: AugConfig, mesh=None):
    """``mesh``: the step's device mesh — needed for the fused aug kernel
    to map over batch shards on multi-device runs (aug/pipeline.py
    _sharded_aug_fused)."""
    def train_step(state: TrainState, frames_u8: jax.Array, key: jax.Array):
        k_aug, k_shuffle = jax.random.split(jax.random.fold_in(key, state.step))
        block = pretrain_batch(k_aug, frames_u8, aug_cfg, mesh=mesh)
        if task.n_views == 2:
            block = block[:, :2]

        def loss_fn(params):
            tstate = TaskState(params=params, batch_stats=state.batch_stats,
                               moco=state.moco)
            ret, new_bs, new_moco = task.forward(
                params, tstate, block, k_shuffle, train=True
            )
            return total_loss(ret), (ret, new_bs, new_moco)

        (loss, (ret, new_bs, new_moco)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = compute_metrics(ret)
        new_state = TrainState(
            step=state.step + 1, params=params, batch_stats=new_bs,
            moco=new_moco, opt_state=new_opt,
        )
        return new_state, metrics

    return train_step


def dataset_variant(dataset: str) -> str:
    """Map the reference's dataset-name suffixes to pretrain clip-sampler
    variants (reference get_data, pretrain.py:535-548; dataset classes
    local_dataset.py:55,204,246)."""
    if dataset.endswith("2clip-stage-prototype"):
        return "stage-prototype"
    if dataset.endswith("2clip-prototype"):
        return "prototype"
    if dataset.endswith("2clip"):
        return "2clip"
    return "stage-prototype"


def build_dataset(cfg: PretrainConfig, n_views: int = 3):
    d = cfg.data
    if d.synthetic:
        entries, class_index = synthetic_entries(
            d.synthetic_videos, d.synthetic_classes
        )
        source = SyntheticFrameSource(scale=d.scale_hw)
    else:
        name = d.dataset.split("-")[0]  # ucf101 | hmdb51 | k400
        root = d.data_root or os.path.join("process_data", "data", name)
        entries = load_split(root, mode="train", which_split=d.which_split,
                             val_size=d.val_size)
        class_index = load_class_index(root)
        source = JpegFrameSource(d.db_path, scale=d.scale_hw,
                                 fast_decode=d.fast_decode)
    # 2-view models don't need the aug_series third view; skip assembling,
    # decoding, and augmenting it (the reference always built it and the
    # round-1 driver sliced it off on device)
    aug_series = cfg.aug.aug_series and n_views == 3
    return PretrainDataset(
        entries=entries, class_index=class_index, source=source,
        num_frames=d.seq_len, ds=d.ds, rand_flip=cfg.aug.rand_flip,
        aug_series=aug_series, variant=dataset_variant(d.dataset),
    )


def set_path(cfg: PretrainConfig) -> str:
    """log/{prefix}/pretrain/{name}/ layout (reference pretrain.py:567-591)."""
    exp = os.path.join(cfg.run.log_root, cfg.run.prefix, "pretrain",
                       cfg.run.name_prefix)
    if jax.process_index() == 0:
        os.makedirs(os.path.join(exp, "model"), exist_ok=True)
        os.makedirs(os.path.join(exp, "img"), exist_ok=True)
    return exp


def train(cfg: PretrainConfig, max_steps: int | None = None,
          profile_steps: int = 0) -> dict[str, float]:
    """Full pretraining loop. Returns the final epoch's mean metrics.

    ``profile_steps`` > 0 captures a jax.profiler trace of that many steps
    (after compilation) under {exp_path}/img/profile — the TPU-native
    replacement for the reference's manual wall timing (SURVEY.md §5)."""
    init_distributed()
    exp_path = set_path(cfg)
    logger = get_logger(os.path.join(exp_path, "log"),
                        process_index=jax.process_index())
    logger.info(f"=> creating {cfg.model.model} with '{cfg.model.net}' backbone")

    mesh = data_mesh_for_batch(cfg.optim.batch_size)
    task = make_task(cfg.model)
    dataset = build_dataset(cfg, task.n_views)
    loader = HostLoader(
        dataset, cfg.optim.batch_size, shuffle=True, seed=cfg.run.seed,
        num_workers=cfg.data.workers,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    steps_per_epoch = len(loader)
    logger.info(f"train dataset size {len(dataset)}, {steps_per_epoch} steps/epoch")

    aug_cfg = AugConfig(
        img_dim=cfg.data.img_dim, seq_len=cfg.data.seq_len,
        aug_temp_consist=cfg.aug.aug_temp_consist,
        aug_temp_grad_consist=cfg.aug.aug_temp_grad_consist,
        jitter_order=cfg.aug.jitter_order,
        fused=cfg.aug.fused_aug,
    )
    tx, lr_fn = make_optimizer(cfg, steps_per_epoch)

    rng = jax.random.PRNGKey(cfg.run.seed)
    H, W = cfg.data.scale_hw
    example = jnp.zeros(
        (cfg.optim.batch_size, task.n_views, cfg.data.seq_len,
         cfg.data.img_dim, cfg.data.img_dim, 3), jnp.float32)
    tstate = task.init(rng, example)
    state = TrainState(
        step=jnp.zeros((), jnp.int32), params=tstate.params,
        batch_stats=tstate.batch_stats, moco=tstate.moco,
        opt_state=tx.init(tstate.params),
    )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info(f"params: {n_params / 1e6:.2f}M")

    # replicate state, shard batches
    state = jax.device_put(state, replicated(mesh))
    train_step = jax.jit(
        make_train_step(task, tx, aug_cfg, mesh=mesh), donate_argnums=(0,),
        out_shardings=(replicated(mesh), replicated(mesh)),
    )

    store = CheckpointStore(os.path.join(exp_path, "model"),
                            keep_all=cfg.run.keep_all,
                            async_save=cfg.run.async_ckpt)
    start_epoch = cfg.optim.start_epoch
    best_acc = 0.0
    if cfg.run.resume:
        rstore = CheckpointStore(cfg.run.resume) if cfg.run.resume != "auto" \
            else store
        last = rstore.latest_epoch()
        if last is not None:
            state = jax.device_put(
                rstore.restore(last, template=jax.tree.map(np.asarray, state)),
                replicated(mesh))
            start_epoch = last + 1
            logger.info(f"=> resumed from epoch {last}")
        else:
            logger.info("[warning] no checkpoint found, training from scratch")
    elif cfg.run.pretrain:
        # weights-only load: model params / BN stats / MoCo state from a
        # checkpoint (ours, or one imported from the reference via
        # core/convert.py); optimizer and epoch start fresh — the
        # reference's --pretrain semantics (pretrain.py:306-319) with
        # neq_load_customized's tolerant partial matching
        state = _load_pretrain_weights(state, cfg.run.pretrain, logger)
        state = jax.device_put(state, replicated(mesh))
        logger.info(f"=> loaded pretrain weights from '{cfg.run.pretrain}'")

    writer = (MetricsWriter(os.path.join(exp_path, "img", "pretrain"))
              if jax.process_index() == 0 else None)

    global_step = start_epoch * steps_per_epoch
    final_metrics: dict[str, float] = {}
    done = False
    for epoch in range(start_epoch, cfg.optim.epochs):
        bank = MeterBank()
        t_data = AverageMeter("Data", ":.3f")
        t_batch = AverageMeter("Time", ":.3f")
        progress = ProgressMeter(
            steps_per_epoch, [],
            prefix=f"Epoch:[{epoch}/{cfg.optim.epochs}] "
                   f"lr:{float(lr_fn(global_step)):.5f} ",
            logger=logger)
        tic = time.time()
        end = time.time()
        # overlap H2D with compute: batches are placed on device one step
        # ahead of consumption (the loader already decodes ahead on the host)
        def placed_frames():
            for b in loader.epoch(epoch):
                yield shard_batch(mesh, b["frames"])

        batches = placed_frames()
        lookahead = next(batches, None)
        it = -1
        while lookahead is not None:
            it += 1
            frames = lookahead
            lookahead = next(batches, None)
            t_data.update(time.time() - end)
            if profile_steps and global_step == start_epoch * steps_per_epoch + 1:
                jax.profiler.start_trace(os.path.join(exp_path, "img", "profile"))
            state, metrics = train_step(state, frames, rng)
            if profile_steps and global_step == (
                    start_epoch * steps_per_epoch + profile_steps):
                jax.tree.map(lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                logger.info(f"profiler trace written ({profile_steps} steps)")
            if (it + 1) % cfg.run.print_freq == 0 or it == steps_per_epoch - 1:
                metrics = jax.device_get(metrics)  # sync point
                B = cfg.optim.batch_size
                for k, v in metrics.items():
                    if k.endswith("_loss"):
                        bank.loss(k[:-5]).update(float(v), B)
                    elif k.endswith("top1"):
                        bank.acc(k[:-5]).update(float(v), B)
                progress.meters = [t_batch, t_data] + bank.all_meters()
                progress.display(it)
                if writer:
                    for k, v in metrics.items():
                        writer.add_scalar(f"local/{k}", float(v), global_step)
                final_metrics = {k: float(v) for k, v in metrics.items()}
            t_batch.update(time.time() - end)
            end = time.time()
            global_step += 1
            if max_steps is not None and global_step >= max_steps:
                done = True
                break

        logger.info(
            f"Epoch: [{epoch}/{cfg.optim.epochs}]\tT-epoch:{time.time() - tic:.2f}"
        )
        if writer:
            for key, m in bank.losses.items():
                writer.add_scalar(f"global/{key}_loss", m.avg, epoch)
            for key, m in bank.accs.items():
                writer.add_scalar(f"global/{key}_acc", m.avg, epoch)

        if ((epoch + 1) % cfg.run.eval_freq == 0 or epoch == cfg.optim.epochs - 1
                or done):
            train_acc = bank.accs["clip"].avg if "clip" in bank.accs else 0.0
            best_acc = max(best_acc, train_acc)
            if (epoch + 1) % cfg.run.save_freq == 0 or epoch == cfg.optim.epochs - 1 or done:
                # save on ALL processes: orbax CheckpointManager synchronizes
                # across processes and writes from the primary host; gating on
                # process 0 would deadlock multi-host runs at the first save
                store.save(epoch, jax.device_get(state), {"acc": train_acc})
                logger.info(f"saved checkpoint epoch {epoch} (acc {train_acc:.4f})")
        if done:
            break

    logger.info(
        f"Training from ep {start_epoch} to ep {cfg.optim.epochs} finished"
    )
    if writer:
        writer.close()
    store.close()
    return final_metrics


def visualize(cfg: PretrainConfig, n_samples: int = 4) -> list[str]:
    """The reference's ``--visualize`` capability (pretrain.py:555,581-584:
    unshuffled loader, img path swap, attention images through the plotter's
    image channel, tensorboard_utils.py:17): write the denormed input frame
    plus per-stage channel-mean attention maps for a handful of samples as
    PNGs under ``{exp}/img/`` and TensorBoard when available.

    Weights come from ``cfg.run.pretrain`` (weights-only load) when set,
    otherwise fresh init. Needs a multi_level backbone (r21d). Returns the
    written file paths."""
    try:
        import PIL  # noqa: F401
    except ImportError:
        raise RuntimeError(
            "--visualize writes PNGs and needs pillow (without it the "
            "writer falls back to .npy dumps and the returned paths would "
            "be wrong)")
    init_distributed()
    exp_path = set_path(cfg)
    logger = get_logger(os.path.join(exp_path, "vis_log"),
                        process_index=jax.process_index())
    task = make_task(cfg.model)
    if cfg.model.net != "r21d":
        raise ValueError(
            f"--visualize needs the multi_level backbone ('r21d'), got "
            f"{cfg.model.net!r} (reference get_features, model/simclr.py:123)")
    if cfg.model.remat:
        raise ValueError("--visualize needs remat=False (multi_level arg)")

    dataset = build_dataset(cfg, task.n_views)
    B = min(n_samples, len(dataset))
    # unshuffled loader: the reference disables shuffling under --visualize
    # (pretrain.py:555) so runs are comparable across checkpoints
    loader = HostLoader(dataset, B, shuffle=False, seed=cfg.run.seed,
                        num_workers=cfg.data.workers)
    frames = next(iter(loader.epoch(0)))["frames"]

    rng = jax.random.PRNGKey(cfg.run.seed)
    example = jnp.zeros((B, task.n_views, cfg.data.seq_len,
                         cfg.data.img_dim, cfg.data.img_dim, 3), jnp.float32)
    tstate = task.init(rng, example)
    if cfg.run.pretrain:
        st = TrainState(step=jnp.zeros((), jnp.int32), params=tstate.params,
                        batch_stats=tstate.batch_stats, moco=tstate.moco,
                        opt_state=())
        st = _load_pretrain_weights(st, cfg.run.pretrain, logger)
        tstate = TaskState(params=st.params, batch_stats=st.batch_stats,
                           moco=st.moco)
        logger.info(f"=> visualizing weights from '{cfg.run.pretrain}'")

    # same aug configuration as train() builds (pretrain.py:239-245) so the
    # visualized inputs are the augmentations training actually sees
    aug_cfg = AugConfig(img_dim=cfg.data.img_dim, seq_len=cfg.data.seq_len,
                        aug_temp_consist=cfg.aug.aug_temp_consist,
                        aug_temp_grad_consist=cfg.aug.aug_temp_grad_consist,
                        jitter_order=cfg.aug.jitter_order,
                        fused=cfg.aug.fused_aug)
    block = pretrain_batch(jax.random.fold_in(rng, 1),
                           jnp.asarray(frames), aug_cfg)
    view0 = block[:, 0]  # (B, T, d, d, 3), normalized
    attn = task.get_features(tstate.params, tstate, view0)

    writer = MetricsWriter(exp_path)  # images land under {exp}/img/
    written = []
    mid_in = view0.shape[1] // 2
    inputs = np.asarray(jnp.clip(batch_denorm(view0[:, mid_in]), 0.0, 1.0))
    for i in range(B):
        writer.add_image(f"vis/sample{i}/input", inputs[i], 0)
        written.append(os.path.join(exp_path, "img",
                                    f"vis_sample{i}_input_0.png"))
        for s, fmap in enumerate(attn):
            a = np.asarray(fmap[i], np.float32)  # (T', H', W')
            a = a[a.shape[0] // 2]  # middle time slice
            lo, hi = float(a.min()), float(a.max())
            a = (a - lo) / (hi - lo) if hi > lo else np.zeros_like(a)
            writer.add_image(f"vis/sample{i}/stage{s}", a, 0)
            written.append(os.path.join(exp_path, "img",
                                        f"vis_sample{i}_stage{s}_0.png"))
    writer.close()
    logger.info(f"wrote {len(written)} visualization images under "
                f"{os.path.join(exp_path, 'img')}")
    return written


def _override(group, args, names):
    """dataclasses.replace(group) with every non-None CLI value in names."""
    kw = {n: getattr(args, n) for n in names if getattr(args, n) is not None}
    return dataclasses.replace(group, **kw) if kw else group


def main():
    """Flag surface mirrors the reference parser (pretrain.py:90-164); a
    preset supplies the defaults, every flag overrides it."""
    p = argparse.ArgumentParser()
    p.add_argument("--preset", default="smoke", choices=sorted(PRETRAIN_PRESETS))
    # model group
    p.add_argument("--net", default=None)
    p.add_argument("--model", default=None)
    p.add_argument("--mode", "--series_mode", dest="mode", default=None,
                   choices=[None, "clip-sr-tc", "clip-sr", "clip-sr-dtw"])
    p.add_argument("--n_series", type=int, default=None)
    p.add_argument("--series_dim", type=int, default=None)
    p.add_argument("--shufflerank_theta", type=float, default=None)
    p.add_argument("--series_T", type=float, default=None)
    p.add_argument("--aligned_T", type=float, default=None)
    p.add_argument("--moco-dim", dest="moco_dim", type=int, default=None)
    p.add_argument("--moco-k", dest="moco_k", type=int, default=None)
    p.add_argument("--moco-m", dest="moco_m", type=float, default=None)
    p.add_argument("--moco-t", dest="moco_t", type=float, default=None)
    p.add_argument("--moco_shuffle_bn", type=int, default=None,
                   help="BN batch-shuffle parity mode: number of BN groups")
    p.add_argument("--remat", action="store_true", default=None,
                   help="rematerialize backbone activations in the backward "
                        "pass (numerics unchanged, ~1/3 more FLOPs, large "
                        "activation-memory saving; fits r21d at B=64)")
    p.add_argument("--packed_encode", type=int, default=None,
                   choices=[None, 0, 1],
                   help="pack the SR shuffled pass into the main encode "
                        "batch (TSV4: faster on TPU; BN train stats merge "
                        "across views — documented divergence, see "
                        "core/config.py)")
    # aug group
    p.add_argument("--jitter_order", default=None,
                   choices=[None, "batch", "sample"],
                   help="color-jitter op-order granularity: 'sample' is the "
                        "reference-exact per-clip order (use for parity runs)")
    p.add_argument("--aug_temp_consist", type=int, default=None,
                   choices=[None, 0, 1],
                   help="temporally-consistent color jitter (pretrain.py:124)")
    p.add_argument("--aug_series", type=int, default=None,
                   choices=[None, 0, 1],
                   help="3-view series batch assembly (pretrain.py:125)")
    p.add_argument("--rand_flip", type=int, default=None,
                   choices=[None, 0, 1],
                   help="random temporal flip of the second clip "
                        "(pretrain.py:126)")
    p.add_argument("--fused_aug", default=None,
                   choices=[None, "auto", "on", "off"],
                   help="fused Pallas aug kernel (default auto: on for TPU)")
    # dataset group
    p.add_argument("--dataset", default=None)
    p.add_argument("--data_root", default=None)
    p.add_argument("--db_path", default=None)
    p.add_argument("--val_size", type=int, default=None,
                   help="rows carved from the train CSV as val (default "
                        "800, the reference constant; lower for small "
                        "custom datasets)")
    p.add_argument("--seq_len", type=int, default=None)
    p.add_argument("--ds", type=int, default=None)
    p.add_argument("--img_dim", type=int, default=None)
    p.add_argument("-j", "--workers", type=int, default=None)
    p.add_argument("--fast_decode", type=int, default=None, choices=[None, 0, 1],
                   help="DCT-scaled JPEG decode (~1.35x faster host decode; "
                        "near-equal, not bitwise-PIL pixels)")
    # optim group
    p.add_argument("--num_seq", type=int, default=None,
                   help="clips per sample (pretrain.py:117)")
    p.add_argument("--optim", default=None, choices=[None, "sgd", "adam"])
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--wd", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--start_epoch", type=int, default=None)
    p.add_argument("--schedule", nargs="*", type=int, default=None)
    # run group
    p.add_argument("--prefix", default=None)
    p.add_argument("--name_prefix", default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--print_freq", type=int, default=None)
    p.add_argument("--eval_freq", type=int, default=None)
    p.add_argument("--save_freq", type=int, default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--pretrain", default=None)
    p.add_argument("--async_ckpt", type=int, default=None, choices=[None, 0, 1],
                   help="overlap checkpoint writes with training (default 1)")
    # driver extras
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--profile_steps", type=int, default=0)
    p.add_argument("--visualize", action="store_true",
                   help="write input + attention-map images under {exp}/img/ "
                        "instead of training (reference pretrain.py:581; "
                        "needs --net r21d; use --pretrain for real weights)")
    args = p.parse_args()

    cfg = PRETRAIN_PRESETS[args.preset]
    if args.packed_encode is not None:
        args.packed_encode = bool(args.packed_encode)
    data = _override(cfg.data, args,
                     ("dataset", "data_root", "db_path", "seq_len", "ds",
                      "img_dim", "workers", "num_seq", "val_size"))
    if args.fast_decode is not None:
        data = dataclasses.replace(data, fast_decode=bool(args.fast_decode))
    if args.data_root or args.db_path:
        data = dataclasses.replace(data, synthetic=False)
    aug = _override(cfg.aug, args, ("jitter_order", "fused_aug"))
    for k in ("aug_temp_consist", "aug_series", "rand_flip"):
        v = getattr(args, k)
        if v is not None:
            aug = dataclasses.replace(aug, **{k: bool(v)})
    cfg = cfg.replace(
        data=data,
        aug=aug,
        model=_override(cfg.model, args,
                        ("net", "model", "mode", "n_series", "series_dim",
                         "shufflerank_theta", "series_T", "aligned_T",
                         "moco_dim", "moco_k", "moco_m", "moco_t",
                         "moco_shuffle_bn", "remat", "packed_encode")),
        optim=_override(
            dataclasses.replace(
                cfg.optim,
                schedule=tuple(args.schedule) if args.schedule else cfg.optim.schedule),
            args, ("batch_size", "lr", "wd", "epochs", "start_epoch",
                   "optim")),
        run=dataclasses.replace(
            _override(cfg.run, args,
                      ("prefix", "name_prefix", "seed", "print_freq",
                       "eval_freq", "save_freq", "resume", "pretrain")),
            **({} if args.async_ckpt is None
               else {"async_ckpt": bool(args.async_ckpt)})),
    )
    if args.visualize:
        visualize(cfg)
    else:
        train(cfg, max_steps=args.max_steps, profile_steps=args.profile_steps)


if __name__ == "__main__":
    main()
