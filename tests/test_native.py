"""Native C++ data-path runtime (dualvar_tpu.native) vs the PIL oracle."""

import os

import numpy as np
import pytest

from dualvar_tpu import native

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

if not native.available():  # toolchain or libjpeg missing in this env
    pytest.skip("native library unavailable", allow_module_level=True)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(8):
        img = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
        p = str(d / f"f{i}.jpg")
        Image.fromarray(img).save(p, quality=80)
        paths.append(p)
    return paths


def test_decode_matches_pil(jpeg_dir):
    out = native.decode_jpeg_files(jpeg_dir, (171, 128), n_threads=4)
    assert out.shape == (8, 171, 128, 3) and out.dtype == np.uint8
    pil = np.stack([
        np.asarray(Image.open(p).convert("RGB").resize((128, 171),
                                                       Image.BICUBIC))
        for p in jpeg_dir
    ])
    diff = np.abs(out.astype(int) - pil.astype(int))
    # PIL uses fixed-point accumulation; tiny rounding differences expected
    assert diff.mean() < 0.6 and diff.max() <= 8


def test_resize_matches_pil_upscale():
    # PIL clamps+quantizes its intermediate pass to uint8; our resampler keeps
    # a float intermediate (higher precision), so isolated bicubic-overshoot
    # pixels may differ more — check aggregate closeness instead of max.
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (50, 40, 3), dtype=np.uint8)
    out = native.resize_bicubic(img, (100, 90))
    want = np.asarray(Image.fromarray(img).resize((90, 100), Image.BICUBIC))
    diff = np.abs(out.astype(int) - want.astype(int))
    assert diff.mean() < 0.6
    assert (diff > 2).mean() < 0.02


def test_fast_decode_close_to_exact(tmp_path_factory):
    """DCT-domain scaled decode (fast=True) approximates the full decode on
    natural-statistics content. Noise images are the worst case (scaled
    decode discards high frequencies), so the fixture is smooth."""
    d = tmp_path_factory.mktemp("smooth")
    yy, xx = np.mgrid[0:240, 0:320].astype(np.float64)
    img = np.stack([
        127 + 90 * np.sin(xx / 40.0) * np.cos(yy / 55.0),
        30 + 0.5 * xx + 0.2 * yy,
        200 - 0.4 * yy + 20 * np.sin((xx + yy) / 70.0),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    paths = []
    for i in range(4):
        p = str(d / f"s{i}.jpg")
        Image.fromarray(np.roll(img, 13 * i, axis=1)).save(p, quality=80)
        paths.append(p)

    exact = native.decode_jpeg_files(paths, (171, 128), n_threads=2)
    fast = native.decode_jpeg_files(paths, (171, 128), n_threads=2, fast=True)
    assert fast.shape == exact.shape and fast.dtype == np.uint8
    assert fast[0].sum() > 0
    diff = np.abs(fast.astype(int) - exact.astype(int))
    # 320x240 -> (171,128) decodes at 5/8 scale: small resample-chain delta
    assert diff.mean() < 2.0, diff.mean()
    assert (diff > 12).mean() < 0.01


def test_fast_decode_noop_when_target_larger(jpeg_dir):
    """fast=True must never DCT-downscale below the target: an upscaling
    resize (target > source) keeps the full 8/8 decode and stays equal to
    the exact path."""
    exact = native.decode_jpeg_files(jpeg_dir[:2], (300, 400), n_threads=1)
    fast = native.decode_jpeg_files(jpeg_dir[:2], (300, 400), n_threads=1,
                                    fast=True)
    np.testing.assert_array_equal(fast, exact)


def test_decode_missing_file_zero_filled(jpeg_dir):
    paths = [jpeg_dir[0], "/nonexistent/nope.jpg"]
    out = native.decode_jpeg_files(paths, (32, 32))
    assert out[1].sum() == 0 and out[0].sum() > 0


def test_loader_uses_native_path(jpeg_dir, tmp_path):
    """JpegFrameSource with fixed scale routes through the native decoder and
    matches the PIL fallback."""
    from dualvar_tpu.data.loader import JpegFrameSource

    db = os.path.dirname(jpeg_dir[0])
    os.makedirs(os.path.join(db, "v"), exist_ok=True)
    for i, p in enumerate(jpeg_dir[:4]):
        os.link(p, os.path.join(db, "v", f"image_{i + 1:05d}.jpg"))
    native_src = JpegFrameSource(db, (64, 48), use_native=True)
    pil_src = JpegFrameSource(db, (64, 48), use_native=False)
    assert native_src._native is not None
    a = native_src("v", np.array([0, 2]))
    b = pil_src("v", np.array([0, 2]))
    assert a.shape == b.shape == (2, 64, 48, 3)
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 0.6
