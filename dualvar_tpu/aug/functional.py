"""On-device video augmentation primitives.

Capability parity with the reference's PIL/tensor augmentation stack
(utils/augmentation.py, utils/transforms.py), redesigned as fused,
jit-compiled tensor ops: every op takes a whole clip ``(T, H, W, C)``
float32 in [0, 1] plus an explicit PRNG key and is branchless — random
"apply with probability p" decisions become factor selection with
``jnp.where``, so one compiled program covers every random outcome. The ops
vmap over the batch and fuse into the input-normalisation epilogue on TPU
(the reference runs PIL loops in dataloader workers: augmentation.py:587-652).

Factor semantics follow torchvision's float-tensor functional ops, which the
reference ColorJitter delegates to (augmentation.py:493-505):

    brightness: img * f                       (clamped to [0,1])
    contrast:   blend(img, mean(gray(img)), f)
    saturation: blend(img, gray(img), f)
    hue:        h channel rotated by f in HSV

Deliberate divergence: GaussianBlur uses a true separable Gaussian taps
kernel; PIL approximates a Gaussian with box blurs (augmentation.py:706-721).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

# torchvision rgb_to_grayscale / reference utils/transforms.py:66 weights
_GRAY_W = (0.2989, 0.587, 0.114)


def to_float(clip_u8: Array) -> Array:
    """uint8 [0,255] -> float32 [0,1] (ToTensor, augmentation.py:361-364)."""
    return clip_u8.astype(jnp.float32) / 255.0


def normalize(clip: Array, mean=IMAGENET_MEAN, std=IMAGENET_STD) -> Array:
    """Channel normalisation (utils/transforms.py:57; pretrain.py:280-282)."""
    mean = jnp.asarray(mean, clip.dtype)
    std = jnp.asarray(std, clip.dtype)
    return (clip - mean) / std


def grayscale(clip: Array) -> Array:
    """Luminance, keepdims 1 channel."""
    w = jnp.asarray(_GRAY_W, clip.dtype)
    return jnp.sum(clip * w, axis=-1, keepdims=True)


def _blend(a: Array, b: Array, ratio: Array) -> Array:
    return jnp.clip(a * ratio + b * (1.0 - ratio), 0.0, 1.0)


def adjust_brightness(clip: Array, factor: Array) -> Array:
    """factor: scalar or (T,1,1,1). torchvision F.adjust_brightness."""
    return _blend(clip, jnp.zeros_like(clip), factor)


def adjust_contrast(clip: Array, factor: Array) -> Array:
    """Per-frame gray mean (torchvision computes mean over the image)."""
    mean = jnp.mean(grayscale(clip), axis=(-3, -2), keepdims=True)
    return _blend(clip, mean, factor)


def adjust_saturation(clip: Array, factor: Array) -> Array:
    return _blend(clip, grayscale(clip), factor)


def rgb_to_hsv(clip: Array) -> Array:
    """Vectorized RGB->HSV, mirroring the reference's numpy port of PIL
    (augmentation.py:26-65) which itself mirrors torchvision."""
    r, g, b = clip[..., 0], clip[..., 1], clip[..., 2]
    maxc = jnp.max(clip, axis=-1)
    minc = jnp.min(clip, axis=-1)
    eqc = maxc == minc
    cr = maxc - minc
    ones = jnp.ones_like(maxc)
    s = cr / jnp.where(eqc, ones, maxc)
    cr_div = jnp.where(eqc, ones, cr)
    rc = (maxc - r) / cr_div
    gc = (maxc - g) / cr_div
    bc = (maxc - b) / cr_div
    hr = jnp.where(maxc == r, bc - gc, 0.0)
    hg = jnp.where((maxc == g) & (maxc != r), 2.0 + rc - bc, 0.0)
    hb = jnp.where((maxc != g) & (maxc != r), 4.0 + gc - rc, 0.0)
    h = jnp.mod((hr + hg + hb) / 6.0 + 1.0, 1.0)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(clip: Array) -> Array:
    """Vectorized HSV->RGB (reference augmentation.py:67-88).

    Branchless sector formula, mathematically identical to the 6-sector
    select chain (piecewise v/q/p/t per sector) but without materializing
    6 conditions x 3 channels of clip-sized intermediates:
    channel(n) = v - v*s*clip(min(k, 4-k), 0, 1), k = (n + 6h) mod 6.
    """
    h, s, v = clip[..., 0], clip[..., 1], clip[..., 2]
    h6 = h * 6.0
    vs = v * s

    def chan(n):
        k = jnp.mod(n + h6, 6.0)
        return v - vs * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


def adjust_hue(clip: Array, factor: Array) -> Array:
    """factor: scalar or (T,1,1,1) in [-0.5, 0.5]."""
    hsv = rgb_to_hsv(clip)
    h = jnp.mod(hsv[..., 0:1] + jnp.broadcast_to(factor, hsv[..., 0:1].shape), 1.0)
    return hsv_to_rgb(jnp.concatenate([h, hsv[..., 1:]], axis=-1))


# --------------------------------------------------------------------------
# spatial ops
# --------------------------------------------------------------------------

def random_crop(key: Array, clip: Array, size: int,
                n_seqblock: int = 0) -> Array:
    """Clip-consistent random crop (augmentation.py:149-175, n_seqblock=0).

    ``n_seqblock`` > 0 re-draws the crop position every ``n_seqblock``
    consecutive frames (the reference's block-consistent variant,
    augmentation.py:167-175: a fresh origin whenever ``i % n_seqblock == 0``).
    """
    T, H, W, C = clip.shape
    ky, kx = jax.random.split(key)
    if n_seqblock <= 0:
        y0 = jax.random.randint(ky, (), 0, H - size + 1)
        x0 = jax.random.randint(kx, (), 0, W - size + 1)
        return jax.lax.dynamic_slice(clip, (0, y0, x0, 0), (T, size, size, C))
    n_blocks = -(-T // n_seqblock)
    y0 = jnp.repeat(jax.random.randint(ky, (n_blocks,), 0, H - size + 1),
                    n_seqblock)[:T]
    x0 = jnp.repeat(jax.random.randint(kx, (n_blocks,), 0, W - size + 1),
                    n_seqblock)[:T]
    return jax.vmap(
        lambda f, y, x: jax.lax.dynamic_slice(f, (y, x, 0), (size, size, C))
    )(clip, y0, x0)


def center_crop(clip: Array, size: int) -> Array:
    """augmentation.py:178-191 (int(round((d - size)/2)) origins)."""
    T, H, W, C = clip.shape
    y0 = int(round((H - size) / 2.0))
    x0 = int(round((W - size) / 2.0))
    return clip[:, y0 : y0 + size, x0 : x0 + size, :]


def five_crop(clip: Array, size: int, where: int) -> Array:
    """1=topleft 2=topright 3=botleft 4=botright 5=center
    (augmentation.py:194-220)."""
    T, H, W, C = clip.shape
    if where == 1:
        return clip[:, :size, :size, :]
    if where == 2:
        return clip[:, :size, W - size :, :]
    if where == 3:
        return clip[:, H - size :, :size, :]
    if where == 4:
        # reference crops (w-tw, h-tw, w, h): height origin uses tw
        return clip[:, H - size :, W - size :, :]
    return center_crop(clip, size)


def hflip(clip: Array) -> Array:
    return clip[:, :, ::-1, :]


def random_hflip(key: Array, clip: Array, p: float = 0.5,
                 seq_len: int = 0) -> Array:
    """Whole-clip random flip (augmentation.py:314-341; consistent=False with
    seq_len == clip length is one draw per clip).

    ``seq_len`` > 0 re-draws the flip decision every ``seq_len`` consecutive
    frames (the reference's per-seq-block variant, augmentation.py:332-341:
    a fresh draw whenever ``idx % seq_len == 0``)."""
    T = clip.shape[0]
    if seq_len <= 0 or seq_len >= T:
        do = jax.random.uniform(key) < p
        return jnp.where(do, hflip(clip), clip)
    n_blocks = -(-T // seq_len)
    do = jnp.repeat(jax.random.uniform(key, (n_blocks,)) < p, seq_len)[:T]
    return jnp.where(do[:, None, None, None], hflip(clip), clip)


def resize(clip: Array, out_h: int, out_w: int, method: str = "bicubic") -> Array:
    """Device-side resize (PIL Scale equivalent; augmentation.py:125-146 uses
    BICUBIC). Host loaders may resize with PIL instead for exact parity."""
    T, H, W, C = clip.shape
    return jax.image.resize(clip, (T, out_h, out_w, C), method=method)


def gaussian_blur(clip: Array, sigma: Array, taps: int = 13,
                  on: Array | bool = True) -> Array:
    """Separable Gaussian blur with traced sigma (shape-static taps).

    Capability parity with augmentation.py:706-721 (one sigma per clip,
    sigma ~ U[0.1, 2]); kernel is a true Gaussian rather than PIL's
    box-blur approximation.

    ``on``: traced random-apply gate; when False the ORIGINAL clip is
    returned bit-exactly (a cheap select — the not-blurred view must not
    pick up the band matmuls' bf16 operand rounding).
    """
    T, H, W, C = clip.shape
    r = taps // 2
    x = jnp.arange(-r, r + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / jnp.maximum(sigma, 1e-6)) ** 2)
    k = k / jnp.sum(k)

    # Separable blur as two banded-matrix matmuls on the MXU: a depthwise
    # conv with C=3 channels wastes 125/128 lanes, while B[u, v] = k[u - v]
    # over the edge-padded axis is a dense (dim+2r, dim) contraction XLA
    # tiles at full rate. Edge-replicate padding like PIL (zero padding
    # would darken borders).
    def band(n):
        iu = jax.lax.broadcasted_iota(jnp.int32, (n + 2 * r, n), 0)
        iv = jax.lax.broadcasted_iota(jnp.int32, (n + 2 * r, n), 1)
        d = iu - iv  # in [0, 2r] inside the band
        return jnp.where((d >= 0) & (d <= 2 * r), k[jnp.clip(d, 0, 2 * r)],
                         0.0).astype(clip.dtype)

    out = jnp.pad(clip, ((0, 0), (r, r), (r, r), (0, 0)), mode="edge")
    # rows: (T, H+2r, W+2r, C) x (W+2r, W) over the W axis
    out = jnp.einsum("thuc,uw->thwc", out, band(W))
    # cols: contract the H+2r axis
    out = jnp.einsum("tuwc,uh->thwc", out, band(H))
    if not (isinstance(on, bool) and on):
        out = jnp.where(on, out, clip)
    return out


def random_gray_channel_split(key: Array, clip: Array, p: float = 0.8,
                              block: int = 1) -> Array:
    """'RandomGray' — replicate one random channel over all three with prob p,
    one draw per clip (augmentation.py:373-426, consistent). ``block`` > 1
    draws per spatial grid cell (the blockwise channel-split variant)."""
    if block > 1:
        return _blockwise(
            lambda k, c: random_gray_channel_split(k, c, p, block=1),
            key, clip, block,
        )
    kc, kp = jax.random.split(key)
    ch = jax.random.randint(kc, (), 0, 3)
    picked = jnp.take(clip, ch, axis=-1)[..., None]
    gray = jnp.broadcast_to(picked, clip.shape)
    do = jax.random.uniform(kp) < p
    return jnp.where(do, gray, clip)


def channel_mask(key: Array, clip: Array, p: float = 0.75,
                 block: int = 1) -> Array:
    """Zero one random RGB channel with prob p, one draw per clip
    (augmentation.py:663-703, consistent). ``block`` > 1 draws per spatial
    grid cell."""
    if block > 1:
        return _blockwise(lambda k, c: channel_mask(k, c, p, block=1),
                          key, clip, block)
    kf, = jax.random.split(key, 1)
    randfloat = jax.random.uniform(kf)
    rgb_ind = (randfloat * 100.0).astype(jnp.int32) // jnp.int32(100 * (p / 3.0)) - 1
    rgb_ind = jnp.clip(rgb_ind, 0, 2)
    mask_on = randfloat >= (1.0 - p)
    ch = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, clip.shape[-1]), 3)
    keep = jnp.where(mask_on & (ch == rgb_ind), 0.0, 1.0)
    return clip * keep


# --------------------------------------------------------------------------
# color jitter — the reference's consistent / per-frame / gradient-consistent
# variants as factor tensors + a random op order
# --------------------------------------------------------------------------

def _blockwise(op, key: Array, clip: Array, block: int):
    """Apply a keyed per-clip op independently to a (block x block) spatial
    grid (the reference's block machinery, augmentation.py:587-618). Requires
    H and W divisible by block (true for the 112/128 training dims)."""
    T, H, W, C = clip.shape
    g = block
    assert H % g == 0 and W % g == 0, (H, W, g)
    hu, wu = H // g, W // g
    tiles = clip.reshape(T, g, hu, g, wu, C).transpose(1, 3, 0, 2, 4, 5)
    tiles = tiles.reshape(g * g, T, hu, wu, C)
    keys = jax.random.split(key, g * g)
    out = jax.vmap(op)(keys, tiles)
    out = out.reshape(g, g, T, hu, wu, C).transpose(2, 0, 3, 1, 4, 5)
    return out.reshape(T, H, W, C)


def random_sized_crop(
    key: Array, clip: Array, size: int, p: float = 1.0,
    area_range: tuple[float, float] = (0.5, 1.0),
    ratio_range: tuple[float, float] = (3 / 4, 4 / 3),
) -> Array:
    """Clip-consistent random resized crop (reference augmentation.py:261-312):
    sample a target area fraction and aspect ratio, crop, resize to
    ``size`` x ``size``; with prob 1-p, center-crop instead.

    Branchless form: instead of the reference's 10-attempt rejection loop the
    sampled window is clamped to the image bounds, and the resample uses
    ``jax.image.scale_and_translate`` so the dynamic window needs no dynamic
    shapes.
    """
    T, H, W, C = clip.shape
    k_p, k_area, k_ratio, k_swap, k_x, k_y = jax.random.split(key, 6)
    area = jax.random.uniform(k_area, minval=area_range[0], maxval=area_range[1])
    ratio = jax.random.uniform(k_ratio, minval=ratio_range[0],
                               maxval=ratio_range[1])
    target = area * H * W
    w = jnp.sqrt(target * ratio)
    h = jnp.sqrt(target / ratio)
    swap = jax.random.uniform(k_swap) < 0.5  # reference's 50% w/h swap
    w, h = jnp.where(swap, h, w), jnp.where(swap, w, h)
    w = jnp.clip(w, 8.0, W)
    h = jnp.clip(h, 8.0, H)
    x0 = jax.random.uniform(k_x) * (W - w)
    y0 = jax.random.uniform(k_y) * (H - h)
    do = jax.random.uniform(k_p) < p
    # center-crop fallback window
    cw = jnp.float32(min(H, W, size) if size <= min(H, W) else min(H, W))
    x0 = jnp.where(do, x0, (W - cw) / 2)
    y0 = jnp.where(do, y0, (H - cw) / 2)
    w = jnp.where(do, w, cw)
    h = jnp.where(do, h, cw)
    scale = jnp.stack([size / h, size / w])
    translation = jnp.stack([-y0 * size / h, -x0 * size / w])
    return jax.image.scale_and_translate(
        clip, (T, size, size, C), (1, 2), scale, translation,
        method="bilinear",
    )


def random_rotation(key: Array, clip: Array, degree: float = 15.0,
                    p: float = 1.0) -> Array:
    """Clip-consistent random rotation (reference augmentation.py:344-358).

    Divergence: the reference rotates with expand=True (output grows with the
    angle — a dynamic shape); here the canvas is fixed and out-of-frame
    pixels are zero. The released pipelines never use rotation.
    """
    from jax.scipy.ndimage import map_coordinates

    T, H, W, C = clip.shape
    k_p, k_deg = jax.random.split(key)
    deg = jax.random.uniform(k_deg, minval=-degree, maxval=degree)
    do = jax.random.uniform(k_p) < p
    theta = jnp.where(do, deg * jnp.pi / 180.0, 0.0)
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx
    src_y = cy + yy * jnp.cos(theta) - xx * jnp.sin(theta)
    src_x = cx + yy * jnp.sin(theta) + xx * jnp.cos(theta)

    def rot_frame(frame):  # (H, W, C)
        def chan(c):
            return map_coordinates(c, [src_y, src_x], order=1, cval=0.0)

        return jnp.stack([chan(frame[..., i]) for i in range(C)], axis=-1)

    return jax.vmap(rot_frame)(clip)


def pad_frames(clip: Array, pad: int, value: float = 0.0) -> Array:
    """Border padding (reference Padding / ImageOps.expand, augmentation.py:117-122)."""
    return jnp.pad(clip, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   constant_values=value)


def sample_jitter_factors(
    key: Array,
    seq_len: int,
    brightness: float = 0.8,
    contrast: float = 0.8,
    saturation: float = 0.8,
    hue: float = 0.2,
    mode: str = "consistent",
) -> dict[str, Array]:
    """Per-frame factor vectors, shape (T,).

    mode: 'consistent' — one draw per clip (augmentation.py:596 with
    n_seqblock == seq_len); 'frame' — fresh draw per frame (consistent=False);
    'grad' — linear ramp from a start to an end draw (grad_consistent,
    augmentation.py:512-525).
    """
    kb, kc, ks, kh = jax.random.split(key, 4)

    def draw(k, lo, hi, n):
        return jax.random.uniform(k, (n,), minval=lo, maxval=hi)

    ranges = dict(
        brightness=(max(0.0, 1 - brightness), 1 + brightness),
        contrast=(max(0.0, 1 - contrast), 1 + contrast),
        saturation=(max(0.0, 1 - saturation), 1 + saturation),
        hue=(-hue, hue),
    )
    out = {}
    for name, k in zip(("brightness", "contrast", "saturation", "hue"),
                       (kb, kc, ks, kh)):
        lo, hi = ranges[name]
        if mode == "consistent":
            f = jnp.broadcast_to(draw(k, lo, hi, 1), (seq_len,))
        elif mode == "frame":
            f = draw(k, lo, hi, seq_len)
        elif mode == "grad":
            ends = draw(k, lo, hi, 2)
            f = jnp.linspace(ends[0], ends[1], seq_len)
        else:
            raise ValueError(mode)
        out[name] = f
    return out


def color_jitter(
    key: Array,
    clip: Array,
    brightness: float = 0.8,
    contrast: float = 0.8,
    saturation: float = 0.8,
    hue: float = 0.2,
    p: float = 0.8,
    mode: str = "consistent",
    block: int = 1,
    order: Array | None = None,
    gate: Array | bool = True,
) -> Array:
    """Reference ColorJitter (augmentation.py:429-652): with probability ``p``
    apply the four adjustments with random factors in a random order;
    otherwise identity. Branchless: the no-apply case uses identity factors.
    ``block`` > 1 draws independent factors/order/apply per spatial grid cell
    (the blockwise variant, augmentation.py:596-618).

    ``gate``: extra random-apply gate ANDed with the internal ``p`` draw
    (the reference wraps ColorJitter in an outer RandomApply,
    pretrain.py:503-505); folding it into the factors here avoids
    materializing both the jittered and the pass-through clip.

    ``order``: optional externally drawn (4,) op-order permutation. Under
    ``vmap`` a per-sample order makes every ``lax.switch`` lower to
    select-over-all-branches (4 slots x 4 materialized ops, hue 4x); one
    order per *batch* draw keeps the switch scalar so exactly one branch
    executes per slot. The factors/apply draws stay per sample.
    """
    if block > 1:
        return _blockwise(
            lambda k, c: color_jitter(k, c, brightness, contrast, saturation,
                                      hue, p, mode, block=1, order=order,
                                      gate=gate),
            key, clip, block,
        )
    k_apply, k_factors, k_order = jax.random.split(key, 3)
    T = clip.shape[0]
    f = sample_jitter_factors(k_factors, T, brightness, contrast, saturation,
                              hue, mode)
    apply = gate & (jax.random.uniform(k_apply) < p)
    ident = dict(brightness=1.0, contrast=1.0, saturation=1.0, hue=0.0)
    factors = {
        name: jnp.where(apply, f[name], ident[name]).reshape(T, 1, 1, 1)
        for name in f
    }
    if order is None:
        order = jax.random.permutation(k_order, 4)

    ops = [
        lambda c: adjust_brightness(c, factors["brightness"]),
        lambda c: adjust_contrast(c, factors["contrast"]),
        lambda c: adjust_saturation(c, factors["saturation"]),
        lambda c: adjust_hue(c, factors["hue"]),
    ]

    # statically unrolled: a fori_loop here lowers to a device while-loop
    # that blocks fusion (profiled at ~67 ms/step at B=128 on v5e); four
    # unrolled switches let XLA fuse each op chain
    for i in range(4):
        clip = jax.lax.switch(order[i], ops, clip)
    return clip
