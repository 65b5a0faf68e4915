"""Composed augmentation pipelines mirroring the reference entry points.

The reference composes per-clip PIL transform pipelines in the dataloader
workers (pretrain.py:491-532, classifier.py:1006-1033) and picks one pipeline
per clip with MultiRandomizedTransform weights (augmentation.py:782-810).
Here each pipeline is a single branchless jitted function over a whole
sample's frames: the host only decodes + resizes JPEGs; crops, flips, color
jitter, blur and normalisation run fused on device, vmapped over the batch.

Pretrain pipeline weights (pretrain.py:523-527): view 1 gets the null
(crop-only) pipeline with prob 0.2 and the full aug pipeline with prob 0.8;
views 2 and 3 always get the full pipeline (the "base" and "same-series"
pipelines are identical in the released code, pretrain.py:500-521).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from . import functional as F

Array = jax.Array


@dataclass(frozen=True)
class AugConfig:
    """Flags mirrored from the reference argparse groups (pretrain.py:114-126,
    classifier.py:50-105)."""

    img_dim: int = 112
    seq_len: int = 16
    aug_temp_consist: bool = True  # --aug_temp_consist
    aug_temp_grad_consist: bool = False  # latent --aug_temp_grad_consist
    with_color_jitter: bool = True  # classifier --with_color_jitter
    rand_flip: bool = False  # classifier spatial flip (classifier.py:1016)
    normalize: bool = True
    out_dtype: str = "float32"  # 'bfloat16' halves the aug->model HBM traffic
    # 'batch': one jitter op-order draw per (step, view), shared across the
    # batch — under vmap a per-sample order forces all 4x4 switch branches to
    # materialize (measured ~3x aug cost). 'sample': reference-exact
    # per-clip order (augmentation.py:510 random.shuffle per clip).
    jitter_order: str = "batch"
    # fused Pallas aug kernel (ops/aug_fused.py): 'auto' = on for TPU
    # backends, off elsewhere (the CPU interpret path is test-only slow);
    # 'on'/'off' force. The fused path honours jitter_order='sample' at no
    # extra cost (the op-order switch index is a kernel scalar).
    fused: str = "off"
    # in-kernel compute dtype for the fused path; 'float32' matches the
    # unfused pipeline to ~1e-5. 'bfloat16' halves the VMEM-bandwidth-bound
    # blend-op cost (hue internally stays f32 — Mosaic cannot lower
    # packed-bf16 vector compares, and the sector selects are where bf16
    # rounding bites); experimental until re-measured on hardware.
    fused_compute: str = "float32"

    @property
    def jitter_mode(self) -> str:
        if self.aug_temp_grad_consist:
            return "grad"
        return "consistent" if self.aug_temp_consist else "frame"


def _finish(clip: Array, cfg: AugConfig) -> Array:
    if cfg.normalize:
        clip = F.normalize(clip)
    if cfg.out_dtype != "float32":
        clip = clip.astype(cfg.out_dtype)
    return clip


def _augmented_clip(key: Array, clip_u8: Array, cfg: AugConfig, use_aug,
                    order: Array | None = None) -> Array:
    """crop -> [jitter p=.8 outer] -> [blur p=.5]; `use_aug` gates the two
    random applies (the null pipeline is crop-only, pretrain.py:493-497).

    The crop slices the uint8 frames before float conversion (the full
    171x128 field never materializes in f32), and both random applies are
    folded into the ops themselves (identity factors / delta blur kernel)
    instead of computing both branches and selecting.
    """
    k_crop, k_jit_on, k_jit, k_blur_on, k_sig = jax.random.split(key, 5)
    clip = F.to_float(F.random_crop(k_crop, clip_u8, cfg.img_dim))
    jit_on = use_aug & (jax.random.uniform(k_jit_on) < 0.8)
    clip = F.color_jitter(k_jit, clip, 0.8, 0.8, 0.8, 0.2, p=0.8,
                          mode=cfg.jitter_mode, order=order, gate=jit_on)
    blur_on = use_aug & (jax.random.uniform(k_blur_on) < 0.5)
    sigma = jax.random.uniform(k_sig, minval=0.1, maxval=2.0)
    clip = F.gaussian_blur(clip, sigma, on=blur_on)
    return clip


def pretrain_sample(key: Array, frames_u8: Array, cfg: AugConfig,
                    orders: Array | None = None) -> Array:
    """One pretrain sample: (n_views*T, H0, W0, C) uint8 ->
    (n_views, T, img_dim, img_dim, C) float, normalised.

    Views are the stage-prototype dataset's [clip1, clip2, clip1-again]
    (dataset/local_dataset.py:291-292); each view gets an independent
    pipeline draw (MultiRandomizedTransform, augmentation.py:795-810).
    ``orders``: optional (n_views, 4) batch-shared jitter op orders.
    """
    T = cfg.seq_len
    n_views = frames_u8.shape[0] // T
    clips = frames_u8.reshape(n_views, T, *frames_u8.shape[1:])
    keys = jax.random.split(key, n_views + 1)
    out = []
    for v in range(n_views):
        # view 0: null pipeline with prob 0.2 (pretrain.py:523-527)
        use_aug = (
            jax.random.uniform(keys[n_views]) < 0.8 if v == 0
            else jnp.bool_(True)
        )
        order = None if orders is None else orders[v]
        out.append(_finish(
            _augmented_clip(keys[v], clips[v], cfg, use_aug, order), cfg))
    return jnp.stack(out)


def classifier_train_sample(key: Array, frames_u8: Array, cfg: AugConfig,
                            order: Array | None = None) -> Array:
    """Finetune/linear-probe train pipeline (classifier.py:1007-1020):
    crop -> [whole-clip flip] -> [consistent jitter p=.8]."""
    k_crop, k_flip, k_jit = jax.random.split(key, 3)
    clip = F.to_float(F.random_crop(k_crop, frames_u8, cfg.img_dim))
    if cfg.rand_flip:
        clip = F.random_hflip(k_flip, clip, 0.5)
    if cfg.with_color_jitter:
        clip = F.color_jitter(k_jit, clip, 0.8, 0.8, 0.8, 0.2, p=0.8,
                              mode="consistent", order=order)
    return _finish(clip, cfg)


def eval_sample(frames_u8: Array, cfg: AugConfig) -> Array:
    """val/test pipeline (classifier.py:1022-1029): center crop only."""
    return _finish(F.to_float(F.center_crop(frames_u8, cfg.img_dim)), cfg)


def tencrop_sample(frames_u8: Array, cfg: AugConfig, where: int, flip: bool) -> Array:
    """Multi-crop test pipeline (classifier.py:589-600): optional flip then
    one of the five crops."""
    clip = frames_u8
    if flip:
        clip = F.hflip(clip)
    return _finish(F.to_float(F.five_crop(clip, cfg.img_dim, where)), cfg)


def tenclip_sample(frames_u8: Array, cfg: AugConfig) -> Array:
    """Temporal-10-clip pipeline (classifier.py:683-695): per-clip center
    crop. frames: (10*T, H0, W0, C) -> (10, T, dim, dim, C)."""
    T = cfg.seq_len
    clips = frames_u8.reshape(10, T, *frames_u8.shape[1:])
    return jax.vmap(
        lambda c: _finish(F.to_float(F.center_crop(c, cfg.img_dim)), cfg))(clips)


# generic multi-clip composers (reference augmentation.py:733-894) ---------
#
# Each takes keyed per-clip transform callables `fn(key, clip) -> clip` with
# identical output shapes (a lax.switch requirement) and composes them the way
# the reference's PIL-list composers did.

def transform_controller(key: Array, clip: Array, fns, weights) -> Array:
    """Pick one transform by weight and apply it (reference
    TransformController, augmentation.py:869-882)."""
    k_pick, k_apply = jax.random.split(key)
    cum = jnp.cumsum(jnp.asarray(weights) / sum(weights))
    idx = jnp.searchsorted(cum, jax.random.uniform(k_pick), side="right")
    return jax.lax.switch(jnp.minimum(idx, len(fns) - 1),
                          [lambda c, f=f: f(k_apply, c) for f in fns], clip)


def randomized_transform(key: Array, frames: Array, fns, weights,
                         seq_len: int) -> Array:
    """Per-clip weighted transform choice over a multi-clip frame list
    (reference RandomizedTransform, augmentation.py:813-839). ``weights`` may
    be one distribution (shared) or one per clip (MultiRandomizedTransform,
    augmentation.py:782-810)."""
    n_clips = frames.shape[0] // seq_len
    clips = frames.reshape(n_clips, seq_len, *frames.shape[1:])
    if not hasattr(weights[0], "__len__"):
        weights = [weights] * n_clips
    keys = jax.random.split(key, n_clips)
    out = [transform_controller(keys[i], clips[i], fns, weights[i])
           for i in range(n_clips)]
    return jnp.concatenate(out, axis=0)


def two_clip_transform(key: Array, frames: Array, base_fn, null_fn,
                       seq_len: int, p: float = 0.3) -> Array:
    """Each of two clips independently gets base with prob p else null
    (reference TwoClipTransform, augmentation.py:733-758)."""
    return randomized_transform(key, frames, [base_fn, null_fn],
                                [p, 1.0 - p], seq_len)


def one_clip_transform(key: Array, frames: Array, base_fn, null_fn,
                       seq_len: int) -> Array:
    """Keep one of the two clips (random), produce [base(x), null(x)] in a
    random order (reference OneClipTransform, augmentation.py:842-866)."""
    k_half, k_order, k1, k2 = jax.random.split(key, 4)
    clips = frames.reshape(2, seq_len, *frames.shape[1:])
    x = jnp.where(jax.random.uniform(k_half) < 0.5, clips[0], clips[1])
    a, b = base_fn(k1, x), null_fn(k2, x)
    swap = jax.random.uniform(k_order) < 0.5
    q = jnp.where(swap, a, b)
    k = jnp.where(swap, b, a)
    return jnp.concatenate([q, k], axis=0)


def multiple_clip_transform(key: Array, frames: Array, fns, seq_len: int) -> Array:
    """Apply fns[i] to clip i of a multi-clip frame list (reference
    MultipleClipTransform, augmentation.py:761-780)."""
    n_clips = frames.shape[0] // seq_len
    assert n_clips == len(fns), (n_clips, len(fns))
    clips = frames.reshape(n_clips, seq_len, *frames.shape[1:])
    keys = jax.random.split(key, n_clips)
    return jnp.concatenate(
        [fns[i](keys[i], clips[i]) for i in range(n_clips)], axis=0)


def two_crops_transform(key: Array, clip: Array, base_fn) -> Array:
    """Two independent draws of the same pipeline -> (2, ...) views
    (reference TwoCropsTransform, augmentation.py:886-894)."""
    k1, k2 = jax.random.split(key)
    return jnp.stack([base_fn(k1, clip), base_fn(k2, clip)])


# fused-kernel path --------------------------------------------------------

def _draw_clip_params(key: Array, cfg: AugConfig, use_aug, H0: int, W0: int,
                      order: Array | None):
    """Draw one clip's augmentation parameters with the EXACT key-splitting
    discipline of ``_augmented_clip`` -> ``F.color_jitter`` ->
    ``F.sample_jitter_factors``, but return them as arrays for the fused
    kernel instead of applying ops. Same key => same random decisions as
    the unfused path (the fused==unfused equivalence tests rely on this)."""
    import jax.random as jr

    k_crop, k_jit_on, k_jit, k_blur_on, k_sig = jr.split(key, 5)
    ky, kx = jr.split(k_crop)
    y0 = jr.randint(ky, (), 0, H0 - cfg.img_dim + 1)
    x0 = jr.randint(kx, (), 0, W0 - cfg.img_dim + 1)
    jit_on = use_aug & (jr.uniform(k_jit_on) < 0.8)
    k_apply, k_factors, k_order = jr.split(k_jit, 3)
    f = F.sample_jitter_factors(k_factors, cfg.seq_len, 0.8, 0.8, 0.8, 0.2,
                                cfg.jitter_mode)
    apply = jit_on & (jr.uniform(k_apply) < 0.8)
    ident = dict(brightness=1.0, contrast=1.0, saturation=1.0, hue=0.0)
    factors = jnp.stack([
        jnp.where(apply, f[n], ident[n])
        for n in ("brightness", "contrast", "saturation", "hue")])
    if order is None:
        order = jr.permutation(k_order, 4)
    blur_on = use_aug & (jr.uniform(k_blur_on) < 0.5)
    sigma = jr.uniform(k_sig, minval=0.1, maxval=2.0)
    return (jnp.stack([y0, x0]).astype(jnp.int32), order.astype(jnp.int32),
            factors, jnp.stack([sigma, blur_on.astype(jnp.float32)]))


@partial(jax.jit, static_argnames=("cfg", "mesh", "data_axis"))
def pretrain_batch_fused(key: Array, frames_u8: Array, cfg: AugConfig,
                         mesh=None, data_axis: str = "data") -> Array:
    """Fused-kernel variant of ``pretrain_batch``: all randomness drawn here
    (mirroring the unfused key splits), the whole crop->jitter->blur->
    normalize chain in one Pallas pass (ops/aug_fused.py)."""
    from ..ops.aug_fused import aug_fused

    B, VT, H0, W0, C = frames_u8.shape
    T = cfg.seq_len
    V = VT // T
    k_batch, k_order = jax.random.split(key)
    shared = None
    if cfg.jitter_order == "batch":
        shared = jnp.stack([
            jax.random.permutation(jax.random.fold_in(k_order, v), 4)
            for v in range(V)])

    def draw_sample(k):
        ks = jax.random.split(k, V + 1)
        per_view = []
        for v in range(V):
            use_aug = (jax.random.uniform(ks[V]) < 0.8 if v == 0
                       else jnp.bool_(True))
            per_view.append(_draw_clip_params(
                ks[v], cfg, use_aug, H0, W0,
                None if shared is None else shared[v]))
        return tuple(jnp.stack(x) for x in zip(*per_view))

    crops, orders, factors, blurs = jax.vmap(draw_sample)(
        jax.random.split(k_batch, B))
    d = cfg.img_dim
    clips = frames_u8.reshape(B * V, T, H0, W0, C)

    def crop_one(clip, cr):
        return jax.lax.dynamic_slice(
            clip, (0, cr[0], cr[1], 0), (T, d, d, C))

    # crop on uint8 + planar transpose outside the kernel: XLA does both
    # exactly and cheaply; Mosaic can't express the unaligned dynamic slice
    cropped = jax.vmap(crop_one)(clips, crops.reshape(B * V, 2))
    planar = cropped.transpose(0, 4, 1, 2, 3)  # (B*V, C, T, d, d)
    # consistent mode: all T entries of each factor row are one broadcast
    # draw — pass the scalars (the kernel requires clip-consistent factors)
    assert cfg.jitter_mode == "consistent", cfg.jitter_mode
    call = (partial(aug_fused, out_dtype=jnp.dtype(cfg.out_dtype),
                    compute_dtype=jnp.dtype(cfg.fused_compute),
                    normalize=cfg.normalize)
            if mesh is None else
            partial(_sharded_aug_fused(mesh, data_axis),
                    out_dtype=jnp.dtype(cfg.out_dtype),
                    compute_dtype=jnp.dtype(cfg.fused_compute),
                    normalize=cfg.normalize))
    out = call(
        planar, orders.reshape(B * V, 4),
        factors[..., 0].reshape(B * V, 4), blurs.reshape(B * V, 2))
    d = cfg.img_dim
    return out.reshape(B, V, C, T, d, d).transpose(0, 1, 3, 4, 5, 2)


@partial(jax.jit, static_argnames=("cfg", "mesh", "data_axis"))
def classifier_train_batch_fused(key: Array, frames_u8: Array,
                                 cfg: AugConfig, mesh=None,
                                 data_axis: str = "data") -> Array:
    """Fused-kernel variant of ``classifier_train_batch`` (crop ->
    [whole-clip flip] -> [consistent jitter p=.8] -> normalize, no blur),
    with randomness drawn via the unfused path's exact key splits."""
    import jax.random as jr

    from ..ops.aug_fused import aug_fused

    B, T_, H0, W0, C = frames_u8.shape
    d = cfg.img_dim
    k_batch, k_order = jax.random.split(key)
    shared = (jr.permutation(k_order, 4)
              if cfg.jitter_order == "batch" else None)

    def draw(k):
        k_crop, k_flip, k_jit = jr.split(k, 3)
        ky, kx = jr.split(k_crop)
        y0 = jr.randint(ky, (), 0, H0 - d + 1)
        x0 = jr.randint(kx, (), 0, W0 - d + 1)
        do_flip = (jr.uniform(k_flip) < 0.5) & bool(cfg.rand_flip)
        k_apply, k_factors, k_order_s = jr.split(k_jit, 3)
        f = F.sample_jitter_factors(k_factors, cfg.seq_len, 0.8, 0.8, 0.8,
                                    0.2, "consistent")
        apply = (jr.uniform(k_apply) < 0.8) & bool(cfg.with_color_jitter)
        ident = dict(brightness=1.0, contrast=1.0, saturation=1.0, hue=0.0)
        factors = jnp.stack([
            jnp.where(apply, f[n][0], ident[n])
            for n in ("brightness", "contrast", "saturation", "hue")])
        order = shared if shared is not None else jr.permutation(k_order_s, 4)
        return (jnp.stack([y0, x0]).astype(jnp.int32), do_flip,
                order.astype(jnp.int32), factors)

    crops, flips, orders, factors = jax.vmap(draw)(jr.split(k_batch, B))

    def crop_one(clip, cr, do_flip):
        c = jax.lax.dynamic_slice(clip, (0, cr[0], cr[1], 0), (T_, d, d, C))
        return jnp.where(do_flip, c[:, :, ::-1, :], c)

    cropped = jax.vmap(crop_one)(frames_u8, crops, flips)
    call = (partial(aug_fused, out_dtype=jnp.dtype(cfg.out_dtype),
                    compute_dtype=jnp.dtype(cfg.fused_compute),
                    normalize=cfg.normalize)
            if mesh is None else
            partial(_sharded_aug_fused(mesh, data_axis),
                    out_dtype=jnp.dtype(cfg.out_dtype),
                    compute_dtype=jnp.dtype(cfg.fused_compute),
                    normalize=cfg.normalize))
    out = call(
        cropped.transpose(0, 4, 1, 2, 3), orders, factors,
        jnp.tile(jnp.asarray([[1.0, 0.0]], jnp.float32), (B, 1)))
    return out.transpose(0, 2, 3, 4, 1)


def _sharded_aug_fused(mesh, axis: str):
    """shard_map wrapper for the fused kernel: a pallas_call inside jit has
    no SPMD partitioning rule, so without this a batch-sharded multi-chip
    step would replicate the global batch onto every chip. The parameter
    draws happen OUTSIDE (plain jnp, partitioned by XLA); only the kernel
    call itself maps, with every operand batch-sharded on dim 0."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..ops.aug_fused import aug_fused

    spec = P(axis)

    def call(clips, orders, factors, blurs, *, out_dtype, compute_dtype,
             normalize=True):
        fn = shard_map(
            partial(aug_fused, out_dtype=out_dtype,
                    compute_dtype=compute_dtype, normalize=normalize),
            mesh=mesh, in_specs=(spec, spec, spec, spec), out_specs=spec,
            # pallas_call's out_shape carries no varying-across-mesh info
            check_vma=False)
        return fn(clips, orders, factors, blurs)

    return call


def _use_fused(cfg: AugConfig, mesh=None, check_jitter_mode=True) -> bool:
    """Single source of truth for the fused-vs-unfused dispatch (the
    classifier passes check_jitter_mode=False: its pipeline always jitters
    clip-consistently regardless of the pretrain mode flags)."""
    if check_jitter_mode and cfg.jitter_mode != "consistent":
        # per-frame factor modes need a lane->batch relayout Mosaic cannot
        # lower; they stay on the unfused path
        if cfg.fused == "on":
            raise ValueError(
                "fused='on' requires clip-consistent jitter "
                f"(jitter_mode={cfg.jitter_mode!r}); use fused='auto'/'off' "
                "for per-frame factor modes")
        return False
    if cfg.fused == "auto":
        # multi-device needs the shard_map wrapper (callers pass the mesh;
        # see _sharded_aug_fused for why): without one, 'auto' falls back
        # to the unfused path rather than silently replicating the batch
        return jax.default_backend() == "tpu" and (
            mesh is not None or jax.device_count() == 1)
    return cfg.fused == "on"


# batched, jitted entry points --------------------------------------------

def pretrain_batch(key: Array, frames_u8: Array, cfg: AugConfig,
                   mesh=None, data_axis: str = "data") -> Array:
    """(B, n_views*T, H0, W0, C) uint8 -> (B, n_views, T, d, d, C).

    ``mesh``: pass the step's device mesh when running batch-sharded on
    more than one device so the fused kernel maps over shards (see
    _sharded_aug_fused); without it 'auto' stays unfused off single-chip.
    """
    if mesh is not None and mesh.devices.size <= 1:
        mesh = None
    if _use_fused(cfg, mesh):
        return pretrain_batch_fused(key, frames_u8, cfg, mesh, data_axis)
    return _pretrain_batch_unfused(key, frames_u8, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _pretrain_batch_unfused(key: Array, frames_u8: Array,
                            cfg: AugConfig) -> Array:
    n_views = frames_u8.shape[1] // cfg.seq_len
    k_batch, k_order = jax.random.split(key)
    orders = None
    if cfg.jitter_order == "batch":
        orders = jnp.stack([
            jax.random.permutation(jax.random.fold_in(k_order, v), 4)
            for v in range(n_views)])
    keys = jax.random.split(k_batch, frames_u8.shape[0])
    return jax.vmap(
        lambda k, f: pretrain_sample(k, f, cfg, orders))(keys, frames_u8)


def classifier_train_batch(key: Array, frames_u8: Array, cfg: AugConfig,
                           mesh=None, data_axis: str = "data") -> Array:
    # the classifier pipeline always jitters clip-consistently
    # (classifier.py:1007-1020), so the fused kernel applies regardless of
    # the pretrain jitter mode flags
    if mesh is not None and mesh.devices.size <= 1:
        mesh = None
    if _use_fused(cfg, mesh, check_jitter_mode=False):
        return classifier_train_batch_fused(key, frames_u8, cfg, mesh,
                                            data_axis)
    return _classifier_train_batch_unfused(key, frames_u8, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _classifier_train_batch_unfused(key: Array, frames_u8: Array,
                                    cfg: AugConfig) -> Array:
    k_batch, k_order = jax.random.split(key)
    order = (jax.random.permutation(k_order, 4)
             if cfg.jitter_order == "batch" else None)
    keys = jax.random.split(k_batch, frames_u8.shape[0])
    return jax.vmap(
        lambda k, f: classifier_train_sample(k, f, cfg, order))(keys, frames_u8)


@partial(jax.jit, static_argnames=("cfg",))
def eval_batch(frames_u8: Array, cfg: AugConfig) -> Array:
    return jax.vmap(lambda f: eval_sample(f, cfg))(frames_u8)


@partial(jax.jit, static_argnames=("cfg", "where", "flip"))
def tencrop_batch(frames_u8: Array, cfg: AugConfig, where: int, flip: bool) -> Array:
    return jax.vmap(lambda f: tencrop_sample(f, cfg, where, flip))(frames_u8)


@partial(jax.jit, static_argnames=("cfg",))
def tenclip_batch(frames_u8: Array, cfg: AugConfig) -> Array:
    return jax.vmap(lambda f: tenclip_sample(f, cfg))(frames_u8)
