"""C++ native runtime: JIT build/caching and numerics parity vs fallbacks."""

import os

import numpy as np
import pytest

from pgx import native


def _has_gxx():
    import shutil
    return shutil.which("g++") is not None


pytestmark = pytest.mark.skipif(not _has_gxx(), reason="no g++ toolchain")


def test_runtime_builds_and_caches(tmp_path, monkeypatch):
    monkeypatch.setenv("PGX_CACHE_DIR", str(tmp_path))
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_checked", False)
    lib = native.load_runtime(verbose=True)
    assert lib is not None
    so = [p for p in os.listdir(tmp_path)]
    assert len(so) == 1  # one digest dir
    # second load uses cache (no rebuild): mtime unchanged
    path = os.path.join(str(tmp_path), so[0], "libpgx_runtime.so")
    mtime = os.path.getmtime(path)
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_checked", False)
    assert native.load_runtime() is not None
    assert os.path.getmtime(path) == mtime


def test_normalize_parity():
    rng = np.random.RandomState(0)
    x = (rng.rand(2, 8, 8, 3) * 255).astype(np.uint8)
    want = x.astype(np.float32) / 127.5 - 1.0
    got = native.normalize_u8(x)
    np.testing.assert_array_equal(got, want)


def test_gather_normalize_parity():
    rng = np.random.RandomState(1)
    images = (rng.rand(16, 4, 4, 3) * 255).astype(np.uint8)
    idx = np.asarray([3, 0, 15, 7])
    want = images[idx].astype(np.float32) / 127.5 - 1.0
    got = native.gather_normalize(images, idx)
    np.testing.assert_array_equal(got, want)


def test_resize_bilinear_matches_fallback():
    rng = np.random.RandomState(2)
    x = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    got = native.resize_bilinear(x, 8)
    # fallback path
    os.environ["PGX_DISABLE_NATIVE"] = "1"
    try:
        native._lib, native._lib_checked = None, False
        want = native.resize_bilinear(x, 8)
    finally:
        del os.environ["PGX_DISABLE_NATIVE"]
        native._lib, native._lib_checked = None, False
    # uint8 rounding: allow off-by-one
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_resize_box_matches_fallback():
    rng = np.random.RandomState(3)
    x = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    got = native.resize_box(x, 4)
    os.environ["PGX_DISABLE_NATIVE"] = "1"
    try:
        native._lib, native._lib_checked = None, False
        want = native.resize_box(x, 4)
    finally:
        del os.environ["PGX_DISABLE_NATIVE"]
        native._lib, native._lib_checked = None, False
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_torch_parity_bilinear():
    """The native bilinear matches torch F.interpolate uint8 semantics."""
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(4)
    x = (rng.rand(2, 16, 16, 3) * 255).astype(np.uint8)
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2).float(), size=(8, 8),
        mode="bilinear", align_corners=False, antialias=False)
    want = want.permute(0, 2, 3, 1).numpy()
    got = native.resize_bilinear(x, 8).astype(np.float32)
    assert np.abs(got - want).max() <= 1.0  # uint8 rounding


def test_gather_normalize_negative_and_oob_indices():
    """The C++ kernel does raw pointer arithmetic: the wrapper must give
    it numpy-fallback semantics — negative indices wrap, out-of-range
    raises — instead of reading out of bounds silently."""
    import pytest

    rng = np.random.RandomState(3)
    images = (rng.rand(8, 4, 4, 1) * 255).astype(np.uint8)
    idx = np.asarray([-1, 0, -8])
    want = images[idx].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_array_equal(native.gather_normalize(images, idx),
                                  want)
    with pytest.raises(IndexError):
        native.gather_normalize(images, np.asarray([8]))
    with pytest.raises(IndexError):
        native.gather_normalize(images, np.asarray([-9]))
