"""dvnative — ctypes bindings for the C++ data-path runtime (decoder.cpp).

Builds the shared library on first use (g++ + libjpeg, both baked into the
image) and caches it next to the source; falls back gracefully (``lib()``
returns None) when the toolchain or libjpeg is unavailable, in which case
callers use the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "decoder.cpp")
_SO = os.path.join(_DIR, "_libdvnative.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-std=c++17", _SRC,
        "-o", _SO, "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return True
    except (subprocess.SubprocessError, FileNotFoundError):
        return False


def lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            L = ctypes.CDLL(_SO)
        except OSError:
            return None
        L.dv_decode_files.restype = ctypes.c_int
        L.dv_decode_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int,
        ]
        L.dv_decode_buffers.restype = ctypes.c_int
        L.dv_decode_buffers.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        L.dv_readahead_files.restype = ctypes.c_int
        L.dv_readahead_files.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ]
        L.dv_resize_bicubic.restype = None
        L.dv_resize_bicubic.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        _lib = L
        return _lib


def available() -> bool:
    return lib() is not None


def decode_jpeg_files(
    paths: list[str], out_hw: tuple[int, int], n_threads: int = 8,
    fast: bool = False,
) -> np.ndarray | None:
    """Decode+resize JPEG files to a (n, H, W, 3) uint8 batch; None if the
    native library is unavailable. Failed frames come back zero-filled (the
    return count is checked by callers that care). ``fast=True`` decodes at
    the smallest covering k/8 DCT scale (skips most IDCT work; pixels are
    close to but not bitwise-equal with the PIL-parity path)."""
    L = lib()
    if L is None:
        return None
    H, W = out_hw
    n = len(paths)
    out = np.empty((n, H, W, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    L.dv_decode_files(
        arr, n, H, W, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads, int(fast),
    )
    return out


def decode_jpeg_files_into(
    paths: list[str], out: np.ndarray, n_threads: int = 8,
    fast: bool = False,
) -> bool:
    """Decode+resize JPEG files directly into a caller-provided
    (n, H, W, 3) C-contiguous uint8 buffer — the batch-assembler path: one
    native call per *batch*, the C++ thread pool load-balances across every
    frame of every sample, and the collate copy disappears. Returns False
    when the native library is unavailable. ``fast`` as in
    decode_jpeg_files."""
    L = lib()
    if L is None:
        return False
    n, H, W, C = out.shape
    assert C == 3 and len(paths) == n and out.dtype == np.uint8
    assert out.flags["C_CONTIGUOUS"]
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    L.dv_decode_files(
        arr, n, H, W, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_threads, int(fast),
    )
    return True


def readahead_files(paths: list[str]) -> int:
    """Hint the kernel to pull these files into the page cache
    (posix_fadvise WILLNEED; returns immediately). Used by HostLoader to
    overlap cold-cache disk reads of upcoming batches with the current
    batch's decode. Returns the number of files advised (0 when the native
    library is unavailable — callers treat this as a no-op hint)."""
    L = lib()
    if L is None or not paths:
        return 0
    arr = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    return L.dv_readahead_files(arr, len(paths))


def resize_bicubic(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray | None:
    """(H, W, 3) uint8 -> (out_h, out_w, 3) uint8 via the native resampler."""
    L = lib()
    if L is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    H, W = out_hw
    out = np.empty((H, W, 3), dtype=np.uint8)
    L.dv_resize_bicubic(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1],
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), H, W,
    )
    return out
