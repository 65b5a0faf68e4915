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


def test_readahead_counts_and_is_harmless(jpeg_dir):
    """readahead_files advises exactly the files that exist (missing paths
    skipped), returns immediately, and a subsequent decode is unaffected."""
    n = native.readahead_files(list(jpeg_dir) + ["/nonexistent/nope.jpg"])
    assert n == len(jpeg_dir)
    assert native.readahead_files([]) == 0
    out = native.decode_jpeg_files(jpeg_dir, (64, 48), n_threads=2)
    assert out.shape == (len(jpeg_dir), 64, 48, 3) and out[0].sum() > 0


def test_loader_issues_readahead(jpeg_dir, monkeypatch):
    """HostLoader primes the page cache one prefetch window ahead: with
    prefetch=1 over 3 batches, batches 1 and 2 get a readahead hint before
    their decode, with exactly the frame paths their plans will read."""
    from dualvar_tpu import native as native_mod
    from dualvar_tpu.data.loader import HostLoader, JpegFrameSource

    db = os.path.dirname(jpeg_dir[0])
    os.makedirs(os.path.join(db, "ra"), exist_ok=True)
    for i, p in enumerate(jpeg_dir[:6]):
        dst = os.path.join(db, "ra", f"image_{i + 1:05d}.jpg")
        if not os.path.exists(dst):
            os.link(p, dst)

    class TwoFrameDataset:
        """6 single-video windows of 2 frames each, plan()-capable."""
        source = JpegFrameSource(db, (32, 32), use_native=True)

        def __len__(self):
            return 6

        def plan(self, index, rng):
            start = index % 5
            return "ra", np.array([start, start + 1]), {"label": np.int32(0)}

        def __call__(self, index, rng):
            vname, idx, aux = self.plan(index, rng)
            return {"frames": self.source(vname, idx), **aux}

    hinted = []
    real = native_mod.readahead_files

    def spy(paths):
        hinted.append(list(paths))
        return real(paths)

    monkeypatch.setattr(native_mod, "readahead_files", spy)
    loader = HostLoader(TwoFrameDataset(), batch_size=2, shuffle=False,
                        num_workers=2, prefetch=1)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    loader.pool.shutdown(wait=True)  # readahead futures flushed
    # 3 batches, prefetch=1 -> hints for batches 1 and 2 only
    assert len(hinted) == 2
    ds = TwoFrameDataset()
    for hint, b in zip(hinted, (1, 2)):
        want = [p for i in (2 * b, 2 * b + 1)
                for p in ds.source.paths(*ds.plan(i, None)[:2])]
        assert hint == want
