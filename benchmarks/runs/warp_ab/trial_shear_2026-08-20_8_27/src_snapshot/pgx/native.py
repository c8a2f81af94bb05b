"""JIT-compiled native plugin loader (the custom_ops.get_plugin analogue).

The reference compiles its C++/CUDA sources on first use into an md5-keyed
cached build dir guarded by a file lock (ada/torch_utils/custom_ops.py:
46-124).  pgx does the same for its C++ host runtime: g++ -O3 the sources
into ``~/.cache/pgx/<digest>/libpgx_runtime.so`` (digest over source bytes +
compiler flags, so edits rebuild and identical sources reuse the cache),
lock the build dir against concurrent builds, and bind via ctypes.  Every
entry point has a numpy fallback, selected automatically when no compiler
is available (same spirit as the reference's pure-torch fallbacks).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
import time
from typing import Optional

import numpy as np

_RUNTIME_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "runtime", "pgx_runtime.cpp")
_CFLAGS = ["-O3", "-fPIC", "-shared", "-std=c++17", "-march=native"]

_lib: Optional[ctypes.CDLL] = None
_lib_checked = False


class _FileLock:
    """Cooperative build lock (custom_ops.py FileBaton, :95-105)."""

    def __init__(self, path: str, timeout: float = 120.0):
        self.path = path
        self.timeout = timeout
        self._fd = None

    def __enter__(self):
        start = time.time()
        while True:
            try:
                self._fd = os.open(self.path,
                                   os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                return self
            except FileExistsError:
                if time.time() - start > self.timeout:
                    # assume the holder died: steal ONCE, then start a
                    # fresh wait so a live (slow) holder isn't re-stolen
                    # every retry
                    try:
                        os.unlink(self.path)
                    except FileNotFoundError:
                        pass
                    start = time.time()
                time.sleep(0.05)

    def __exit__(self, *exc):
        if self._fd is not None:
            os.close(self._fd)
        try:
            os.unlink(self.path)
        except FileNotFoundError:
            pass


def _build_dir() -> str:
    with open(_RUNTIME_SRC, "rb") as f:
        src = f.read()
    digest = hashlib.md5(src + " ".join(_CFLAGS).encode()).hexdigest()
    root = os.environ.get("PGX_CACHE_DIR",
                          os.path.join(os.path.expanduser("~"), ".cache",
                                       "pgx"))
    return os.path.join(root, digest)


def load_runtime(verbose: bool = False) -> Optional[ctypes.CDLL]:
    """Compile (once, cached) and load the native runtime; None when no
    toolchain is available."""
    global _lib, _lib_checked
    if _lib_checked:
        return _lib
    _lib_checked = True
    if os.environ.get("PGX_DISABLE_NATIVE"):
        return None
    try:
        build = _build_dir()
        so_path = os.path.join(build, "libpgx_runtime.so")
        if not os.path.exists(so_path):
            os.makedirs(build, exist_ok=True)
            with _FileLock(os.path.join(build, ".lock")):
                if not os.path.exists(so_path):
                    # unique tmp path: even if mutual exclusion is broken
                    # (stale-lock steal), concurrent builders cannot corrupt
                    # each other's output before the atomic replace
                    tmp = os.path.join(build, f"build.{os.getpid()}.so.tmp")
                    cmd = ["g++", *_CFLAGS, _RUNTIME_SRC, "-o", tmp]
                    if verbose:
                        print("pgx.native:", " ".join(cmd))
                    subprocess.run(cmd, check=True, capture_output=True)
                    os.replace(tmp, so_path)
        lib = ctypes.CDLL(so_path)
        assert lib.pgx_runtime_abi_version() == 2
        _lib = lib
    except Exception as exc:  # no compiler / build failure -> fallbacks
        if verbose:
            print(f"pgx.native: native runtime unavailable ({exc})")
        _lib = None
    return _lib


def native_available() -> bool:
    return load_runtime() is not None


# ---------------------------------------------------------------------------
# Entry points with numpy fallbacks
# ---------------------------------------------------------------------------

def _cptr(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


def normalize_u8(src: np.ndarray) -> np.ndarray:
    """uint8 -> float32 [-1, 1]."""
    lib = load_runtime()
    if lib is None:
        return src.astype(np.float32) / 127.5 - 1.0
    src = np.ascontiguousarray(src)
    out = np.empty(src.shape, np.float32)
    lib.normalize_u8_to_f32(_cptr(src, ctypes.c_uint8),
                            ctypes.c_int64(src.size),
                            _cptr(out, ctypes.c_float))
    return out


def gather_normalize(images: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Fused batch gather + normalize from a (N, H, W, C) uint8 store."""
    lib = load_runtime()
    if lib is None:
        return images[idx].astype(np.float32) / 127.5 - 1.0
    images = np.ascontiguousarray(images)
    idx = np.ascontiguousarray(idx, np.int64)
    # numpy-fallback semantics for the C++ path too: negative indices wrap,
    # out-of-range raises — the kernel does raw pointer arithmetic and
    # would otherwise read out of bounds silently
    n = len(images)
    idx = np.where(idx < 0, idx + n, idx)
    if idx.size and (idx.min() < 0 or idx.max() >= n):
        raise IndexError(f"index out of range for {n} images")
    elems = int(np.prod(images.shape[1:]))
    out = np.empty((len(idx),) + images.shape[1:], np.float32)
    lib.gather_normalize(_cptr(images, ctypes.c_uint8),
                         _cptr(idx, ctypes.c_int64),
                         ctypes.c_int64(len(idx)), ctypes.c_int64(elems),
                         _cptr(out, ctypes.c_float))
    return out


def resize_bilinear(src: np.ndarray, size: int) -> np.ndarray:
    """Batch bilinear (half-pixel, no antialias) resize of NHWC uint8."""
    lib = load_runtime()
    n, h, w, c = src.shape
    if lib is None:
        # numpy fallback: per-pixel bilinear sampling
        fy = np.clip((np.arange(size) + 0.5) * (h / size) - 0.5, 0, h - 1)
        fx = np.clip((np.arange(size) + 0.5) * (w / size) - 0.5, 0, w - 1)
        y0 = fy.astype(np.int64)
        x0 = fx.astype(np.int64)
        y1 = np.minimum(y0 + 1, h - 1)
        x1 = np.minimum(x0 + 1, w - 1)
        ty = (fy - y0)[None, :, None, None]
        tx = (fx - x0)[None, None, :, None]
        s = src.astype(np.float32)
        top = s[:, y0][:, :, x0] * (1 - tx) + s[:, y0][:, :, x1] * tx
        bot = s[:, y1][:, :, x0] * (1 - tx) + s[:, y1][:, :, x1] * tx
        return (top * (1 - ty) + bot * ty + 0.5).astype(np.uint8)
    src = np.ascontiguousarray(src)
    out = np.empty((n, size, size, c), np.uint8)
    lib.resize_bilinear_u8(_cptr(src, ctypes.c_uint8), ctypes.c_int64(n),
                           ctypes.c_int64(h), ctypes.c_int64(w),
                           ctypes.c_int64(c), _cptr(out, ctypes.c_uint8),
                           ctypes.c_int64(size), ctypes.c_int64(size))
    return out


def resize_box(src: np.ndarray, factor: int) -> np.ndarray:
    """Batch box-filter downsample by an integer factor (antialiased)."""
    lib = load_runtime()
    n, h, w, c = src.shape
    if lib is None:
        oh, ow = h // factor, w // factor
        v = src[:, :oh * factor, :ow * factor].reshape(
            n, oh, factor, ow, factor, c).astype(np.float32)
        return (v.mean(axis=(2, 4)) + 0.5).astype(np.uint8)
    src = np.ascontiguousarray(src)
    out = np.empty((n, h // factor, w // factor, c), np.uint8)
    lib.resize_box_u8(_cptr(src, ctypes.c_uint8), ctypes.c_int64(n),
                      ctypes.c_int64(h), ctypes.c_int64(w),
                      ctypes.c_int64(c), _cptr(out, ctypes.c_uint8),
                      ctypes.c_int64(factor))
    return out
