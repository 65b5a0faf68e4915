"""Host-side input pipeline: frame decode workers + async device prefetch.

The reference uses torch DataLoader worker *processes* running PIL decode and
the whole PIL augmentation stack (utils/utils.py:297-311 FastDataLoader,
dataset/local_dataset.py:145-164). Here the host only decodes JPEGs and
resizes (PIL releases the GIL inside libjpeg, so a thread pool suffices);
crops/jitter/blur/normalise run fused on device (dualvar_tpu.aug) and batches
transfer as uint8 — 4x less PCIe/HBM traffic than float32.

Datasets are index->numpy-sample callables; ``HostLoader`` adds seeded
epoch shuffling, per-host sharding, a decode thread pool and a bounded
prefetch queue; ``device_prefetch`` overlaps H2D copies with compute.

``SyntheticFrameSource`` generates deterministic frames without any files —
the CPU-runnable path used by tests and bench (BASELINE.json config #1).
"""

from __future__ import annotations

import os
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from typing import Any, Callable, Iterator

import numpy as np

from . import samplers
from .indices import ClassIndex, VideoEntry, load_class_index, load_split, shard_for_process

try:  # PIL is a host-only dependency
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


# --------------------------------------------------------------------------
# frame sources
# --------------------------------------------------------------------------

class JpegFrameSource:
    """Reads ``{db_path}/{vname}/image_{i+1:05d}.jpg`` (reference
    local_dataset.py:149-150) and resizes with bicubic antialiasing (the
    reference Scale default, augmentation.py:126).

    Fixed-size resizes go through the native C++ decoder (dualvar_tpu.native:
    libjpeg + PIL-equivalent resampler + thread pool) when it is available;
    the PIL path is the fallback and handles int short-side resizes."""

    def __init__(self, db_path: str, scale: tuple[int, int] | int = (171, 128),
                 use_native: bool = True, native_threads: int = 4,
                 fast_decode: bool = False):
        # scale: (H, W) fixed resize, or int short-side resize.
        # fast_decode: DCT-domain scaled decode (libjpeg k/8 scaling) — skips
        # most IDCT work when the source frames are larger than `scale`;
        # pixels are close to but NOT bitwise-equal with the PIL-parity path,
        # so it stays opt-in (native path only).
        self.db_path = db_path
        self.scale = scale
        self.native_threads = native_threads
        self.fast_decode = fast_decode
        self._native = None
        if use_native and not isinstance(scale, int):
            from .. import native

            if native.available():
                self._native = native

    def paths(self, vname: str, frame_indices: np.ndarray) -> list[str]:
        return [
            os.path.join(self.db_path, vname, f"image_{int(i) + 1:05d}.jpg")
            for i in frame_indices
        ]

    @property
    def native_batch(self):
        """(native_module, (H, W)) when the batch-assembler fast path is
        usable, else None."""
        if self._native is None:
            return None
        return self._native, tuple(self.scale)

    def __call__(self, vname: str, frame_indices: np.ndarray) -> np.ndarray:
        paths = self.paths(vname, frame_indices)
        if self._native is not None:
            return self._native.decode_jpeg_files(
                paths, self.scale, n_threads=self.native_threads,
                fast=self.fast_decode,
            )
        frames = []
        for i in frame_indices:
            path = os.path.join(self.db_path, vname, f"image_{int(i) + 1:05d}.jpg")
            with Image.open(path) as im:
                im = im.convert("RGB")
                if isinstance(self.scale, int):
                    w, h = im.size
                    if w < h:
                        ow, oh = self.scale, int(self.scale * h / w)
                    else:
                        oh, ow = self.scale, int(self.scale * w / h)
                    im = im.resize((ow, oh), Image.BICUBIC)
                else:
                    H, W = self.scale
                    im = im.resize((W, H), Image.BICUBIC)
                frames.append(np.asarray(im, dtype=np.uint8))
        return np.stack(frames)


class SyntheticFrameSource:
    """Deterministic pseudo-video frames, no filesystem. Each video is a
    translating superposition of random low-frequency color waves seeded by
    its name; same (vname, index) always yields the same frame.

    Low-frequency structure matters: iid-noise frames are *unlearnable* for
    instance discrimination through a global-average-pooled CNN (pooling
    averages the noise away and every video collapses to the same embedding);
    smooth per-video patterns keep videos separable, so contrastive training
    on this source actually converges (scripts/learning_check.py)."""

    def __init__(self, scale: tuple[int, int] = (171, 128)):
        self.scale = scale

    def __call__(self, vname: str, frame_indices: np.ndarray) -> np.ndarray:
        H, W = self.scale
        import zlib

        # class determines the wave frequencies (so classification is
        # learnable); the video id adds phases/amplitudes (so instance
        # discrimination within a class is too). crc32: stable across
        # processes, unlike hash().
        cls_part = vname.split("/")[0]
        cls_rng = np.random.default_rng(zlib.crc32(cls_part.encode()))
        vid_rng = np.random.default_rng(zlib.crc32(vname.encode()))
        y = np.arange(H)[:, None] / H
        x = np.arange(W)[None, :] / W
        base = np.zeros((H, W, 3), np.float32)
        for c in range(3):
            for _ in range(3):
                fy, fx = cls_rng.uniform(0.5, 4.0, 2)
                phase = vid_rng.uniform(0, 2 * np.pi)
                amp = vid_rng.uniform(0.5, 1.0)
                base[..., c] += amp * np.sin(
                    2 * np.pi * (fy * y + fx * x) + phase).astype(np.float32)
        base = (127.5 + 50.0 * base).clip(0, 255).astype(np.uint8)
        out = np.empty((len(frame_indices), H, W, 3), dtype=np.uint8)
        for n, i in enumerate(frame_indices):
            out[n] = np.roll(base, shift=int(i) * 3, axis=1)
        return out


def synthetic_entries(
    n_videos: int, n_classes: int, min_len: int = 60, max_len: int = 300, seed: int = 0
) -> tuple[list[VideoEntry], ClassIndex]:
    rng = np.random.default_rng(seed)
    classes = [f"class{c:03d}" for c in range(n_classes)]
    entries = []
    for v in range(n_videos):
        c = classes[v % n_classes]
        vlen = int(rng.integers(min_len, max_len))
        name = f"{c}/video{v:05d}"
        entries.append(VideoEntry(f"/synthetic/{name}/", vlen, c, name))
    return entries, ClassIndex(classes)


# --------------------------------------------------------------------------
# datasets: index -> numpy sample dict
# --------------------------------------------------------------------------

@dataclass
class PretrainDataset:
    """Multi-clip pretrain samples; ``variant`` selects the clip sampler,
    mirroring the reference's 2-CLIP dataset family:

    * ``stage-prototype`` — two stage-prototype clips (+ clip1 again when
      aug_series), reference UCF101LMDB_2CLIP_Stage_Prototype
      (local_dataset.py:246-308);
    * ``prototype`` — two center-clipped prototype clips, reference
      UCF101LMDB_2CLIP_Protytype (local_dataset.py:204-244);
    * ``2clip`` — two independent train windows via double_sampler,
      reference UCF101LMDB_2CLIP (local_dataset.py:140-143).

    ``aug_series`` appends clip1's indices as a third view for the
    TimeSeriesV4 shuffle-rank pass (local_dataset.py:291-292); the plain
    variants default to the reference's 2-view output but honor it too, so
    every variant can feed every model family.
    """

    entries: list[VideoEntry]
    class_index: ClassIndex
    source: Callable[[str, np.ndarray], np.ndarray]
    num_frames: int = 16
    ds: int = 4
    rand_flip: bool = True
    aug_series: bool = True
    variant: str = "stage-prototype"

    def __len__(self):
        return len(self.entries)

    def _indices(self, rng: np.random.Generator, vlen: int) -> np.ndarray:
        T = self.num_frames
        if self.variant == "stage-prototype":
            return samplers.stage_prototype_views(
                rng, vlen, T, self.ds, self.rand_flip, self.aug_series)
        if self.variant == "prototype":
            idx1 = samplers.prototype_sampler(rng, vlen, T, self.ds)
            idx2 = samplers.prototype_sampler(rng, vlen, T, self.ds)
        elif self.variant == "2clip":
            both = samplers.double_sampler(rng, vlen, T, self.ds)
            idx1, idx2 = both[:T], both[T:]
        else:
            raise ValueError(f"unknown pretrain dataset variant {self.variant!r}")
        out = np.concatenate([idx1, idx2])
        return np.concatenate([out, idx1]) if self.aug_series else out

    def plan(self, index: int, rng: np.random.Generator):
        """(vname, frame_indices, aux) with the decode deferred — the
        HostLoader batch-assembler fast path decodes a whole batch's plans
        in one native call."""
        e = self.entries[index]
        idx = self._indices(rng, e.vlen)
        return e.vname, idx, {
            "label": np.int32(self.class_index.encode(e.vlabel)),
        }

    def __call__(self, index: int, rng: np.random.Generator) -> dict[str, Any]:
        vname, idx, aux = self.plan(index, rng)
        return {"frames": self.source(vname, idx), **aux}


@dataclass
class ClassifierDataset:
    """Single-clip classification samples (reference UCF101LMDB,
    local_dataset.py:176-201).

    Test mode covers ALL half-overlapping temporal windows per video
    (reference frame_sampler test branch, local_dataset.py:107-123): each
    (video, window) pair is its own fixed-shape record carrying the video's
    ``vid``, and the protocols' per-vid probability averaging reproduces the
    reference's mean-over-windows (classifier.py:612-628) without padded
    shapes.
    """

    entries: list[VideoEntry]
    class_index: ClassIndex
    source: Callable[[str, np.ndarray], np.ndarray]
    num_frames: int = 16
    ds: int = 2
    mode: str = "train"  # train | val | test

    def __post_init__(self):
        self._records = None
        if self.mode == "test":
            self._records = [
                (ei, w)
                for ei, e in enumerate(self.entries)
                for w in range(samplers.n_test_windows(
                    e.vlen, self.num_frames, self.ds))
            ]

    def __len__(self):
        return len(self._records) if self._records is not None \
            else len(self.entries)

    def plan(self, index: int, rng: np.random.Generator):
        if self._records is not None:
            ei, w = self._records[index]
            e = self.entries[ei]
            idx = samplers.test_window(rng, e.vlen, self.num_frames, self.ds, w)
        else:
            ei = index
            e = self.entries[ei]
            idx = samplers.frame_sampler_train(rng, e.vlen, self.num_frames, self.ds)
        return e.vname, idx, {
            "label": np.int32(self.class_index.encode(e.vlabel)),
            "vid": np.int32(ei),
            # record id: in test mode one (video, window) pair — the stable
            # key multi-host protocols dedupe shard-padding duplicates on
            "rid": np.int32(index),
        }

    def __call__(self, index: int, rng: np.random.Generator) -> dict[str, Any]:
        vname, idx, aux = self.plan(index, rng)
        return {"frames": self.source(vname, idx), **aux}

    def record_vids(self) -> np.ndarray:
        """vid per record id (test mode: records are (video, window) pairs;
        train/val: records are videos)."""
        if self._records is not None:
            return np.asarray([ei for ei, _ in self._records], np.int64)
        return np.arange(len(self.entries), dtype=np.int64)


@dataclass
class TenClipDataset:
    """10 uniformly spaced clips per video (reference UCF101_10CLIP,
    local_dataset.py:311-350)."""

    entries: list[VideoEntry]
    class_index: ClassIndex
    source: Callable[[str, np.ndarray], np.ndarray]
    num_frames: int = 16
    ds: int = 2

    def __len__(self):
        return len(self.entries)

    def plan(self, index: int, rng: np.random.Generator):
        e = self.entries[index]
        idx = samplers.tenclip_sampler(e.vlen, self.num_frames, self.ds)
        return e.vname, idx, {
            "label": np.int32(self.class_index.encode(e.vlabel)),
            "vid": np.int32(index),
        }

    def __call__(self, index: int, rng: np.random.Generator) -> dict[str, Any]:
        vname, idx, aux = self.plan(index, rng)
        return {"frames": self.source(vname, idx), **aux}


# --------------------------------------------------------------------------
# loader
# --------------------------------------------------------------------------

class HostLoader:
    """Seeded, sharded, thread-pooled batch loader with bounded prefetch.

    Equivalent role to FastDataLoader + DistributedSampler
    (pretrain.py:550-556): per-epoch deterministic shuffle, per-host shard,
    drop_last batching.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        seed: int = 0,
        num_workers: int = 8,
        drop_last: bool = True,
        process_index: int = 0,
        process_count: int = 1,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_index = process_index
        self.process_count = process_count
        self.prefetch = prefetch
        self.num_workers = num_workers
        self.pool = ThreadPoolExecutor(max_workers=num_workers)

    def __len__(self):
        n = len(shard_for_process(len(self.dataset), self.process_index,
                                  self.process_count))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _rng(self, epoch: int, index: int) -> np.random.Generator:
        """THE per-sample rng stream — single definition: the batch
        assembler's bitwise equality with the per-sample path depends on
        both building identical streams."""
        return np.random.default_rng(
            np.random.SeedSequence([self.seed, epoch, int(index)])
        )

    def _sample(self, epoch: int, index: int) -> dict[str, np.ndarray]:
        return self.dataset(int(index), self._rng(epoch, index))

    def _native_batch_ctx(self):
        """(native_module, (H, W)) when the whole-batch native assembler
        applies: dataset exposes plan() and its source is a fixed-size
        native-decoding JpegFrameSource."""
        src = getattr(self.dataset, "source", None)
        if (hasattr(self.dataset, "plan")
                and getattr(src, "native_batch", None) is not None):
            return src.native_batch
        return None

    def _readahead(self, epoch: int, indices) -> None:
        """Page-cache hint (posix_fadvise WILLNEED) for a batch that will be
        decoded one prefetch-window from now: plans are recomputed (cheap,
        deterministic index arithmetic per (epoch, index)) and the frame
        file list handed to the kernel, which queues async disk reads and
        returns immediately. Overlaps cold-cache IO of batch b+prefetch with
        the decode of batch b; a no-op on cache-resident trees, synthetic
        sources, or when the native library is unavailable."""
        src = getattr(self.dataset, "source", None)
        if src is None or not hasattr(self.dataset, "plan") \
                or not hasattr(src, "paths"):
            return
        from .. import native

        if not native.available():
            return
        paths = [
            p
            for i in indices
            for vname, idx, _ in (self.dataset.plan(int(i),
                                                    self._rng(epoch, int(i))),)
            for p in src.paths(vname, idx)
        ]
        native.readahead_files(paths)

    def _assemble(self, epoch: int, indices) -> dict[str, np.ndarray]:
        """Batch-assembler fast path: sample every plan, then decode all
        B*F frames straight into the batch buffer with one native call
        (the C++ pool balances across frames; no per-sample collate copy).
        Bitwise-identical to the per-sample path — same per-index rng
        stream, same decoder (tests/test_real_data_path.py)."""
        nb = self._native_batch_ctx()
        src = self.dataset.source
        plans = [self.dataset.plan(int(i), self._rng(epoch, int(i)))
                 for i in indices]
        native_mod, (H, W) = nb
        F = len(plans[0][1])
        assert all(len(idx) == F for _, idx, _ in plans), \
            [len(idx) for _, idx, _ in plans]
        out = np.empty((len(plans), F, H, W, 3), np.uint8)
        paths = [p for vname, idx, _ in plans for p in src.paths(vname, idx)]
        # up to `prefetch` assemblies run concurrently, each spawning its
        # own native decode threads — split the budget so the host is not
        # oversubscribed 2x
        ok = native_mod.decode_jpeg_files_into(
            paths, out.reshape(len(plans) * F, H, W, 3),
            n_threads=max(1, self.num_workers // max(1, min(
                self.prefetch, 2))),
            fast=getattr(src, "fast_decode", False))
        assert ok
        batch = {"frames": out}
        for k in plans[0][2]:
            batch[k] = np.stack([aux[k] for _, _, aux in plans])
        return batch

    def epoch(self, epoch: int = 0) -> Iterator[dict[str, np.ndarray]]:
        order = shard_for_process(
            len(self.dataset),
            self.process_index,
            self.process_count,
            shuffle_seed=(self.seed + epoch) if self.shuffle else None,
        )
        nb = len(order) // self.batch_size if self.drop_last \
            else -(-len(order) // self.batch_size)
        batches = [
            order[b * self.batch_size : (b + 1) * self.batch_size]
            for b in range(nb)
        ]
        pending = []
        bi = 0
        use_native_batch = self._native_batch_ctx() is not None

        def submit(b):
            if b + self.prefetch < nb:  # prime the page cache one window out
                self.pool.submit(self._readahead, epoch,
                                 batches[b + self.prefetch])
            if use_native_batch:
                return self.pool.submit(self._assemble, epoch, batches[b])
            return [self.pool.submit(self._sample, epoch, i) for i in batches[b]]

        while bi < min(self.prefetch, nb):
            pending.append(submit(bi))
            bi += 1
        for b in range(nb):
            futs = pending.pop(0)
            if bi < nb:
                pending.append(submit(bi))
                bi += 1
            if use_native_batch:
                yield futs.result()
                continue
            samples = [f.result() for f in futs]
            yield {
                k: np.stack([s[k] for s in samples]) for k in samples[0]
            }


def device_prefetch(it: Iterator, size: int = 2) -> Iterator:
    """Move batches to device ``size`` steps ahead of consumption."""
    import jax

    buf: list = []
    it = iter(it)
    try:
        for _ in range(size):
            buf.append(jax.device_put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(jax.device_put(next(it)))
        except StopIteration:
            pass
        yield out
