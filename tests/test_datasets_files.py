"""File-backed dataset paths: ImageFolder (aspect-preserving CelebA
transform), WikiArt CSV with size filtering, MNIST/CIFAR local-file readers,
and the Inception torch-weight loader round-trip."""

import gzip
import os
import pickle
import struct

import numpy as np
import pytest

from pgx.data import (ImageFolderDataset, WikiArtDataset, load_cifar10,
                      load_mnist)
from pgx.data.pipeline import folder_batches


def _write_png(path, w, h, color=(200, 30, 60)):
    from PIL import Image
    arr = np.zeros((h, w, 3), np.uint8)
    arr[:] = color
    arr[h // 4:h // 2, w // 4:w // 2] = 255
    Image.fromarray(arr).save(path)


def test_image_folder_aspect_preserving(tmp_path):
    root = tmp_path / "celeba"
    os.makedirs(root / "all")
    # CelebA-like tall images 178x218
    for i in range(3):
        _write_png(root / "all" / f"{i}.png", 178, 218)
    ds = ImageFolderDataset(str(root), resize_factor=1.2, random_crop=True,
                            hflip=True, seed=0)
    assert len(ds) == 3 and ds.num_classes == 1
    img = ds.load(0, 32)
    assert img.shape == (32, 32, 3)
    # reference margin: shorter edge -> 32 + int(32*0.2) + 1 = 39; the
    # longer edge must scale proportionally (39 * 218/178 ≈ 48), so crops
    # at different seeds can differ vertically (aspect preserved, no squash)
    imgs, labels = next(folder_batches(ds, 3, 32, seed=1))
    assert imgs.shape == (3, 32, 32, 3)
    assert imgs.min() >= -1.0 and imgs.max() <= 1.0
    assert labels.shape == (3,)


def test_batch_larger_than_dataset_raises(tmp_path):
    """batch_size > len(dataset) would make the epoch loop yield nothing
    and the prefetcher spin forever — must be a clear error instead."""
    import pytest

    from pgx.data import synthetic_dataset
    from pgx.data.pipeline import array_batches

    root = tmp_path / "tiny"
    os.makedirs(root / "all")
    for i in range(2):
        _write_png(root / "all" / f"{i}.png", 40, 40)
    ds = ImageFolderDataset(str(root), seed=0)
    with pytest.raises(ValueError, match="exceeds"):
        next(folder_batches(ds, 4, 32, seed=0))

    arr = synthetic_dataset(n=4, size=16, channels=1, seed=0)
    with pytest.raises(ValueError, match="exceeds"):
        next(array_batches(arr, 8, 16, seed=0))


def test_limit_clears_decode_cache(tmp_path):
    """limit() remaps path indices; decode-cache entries from before the
    remap must not alias different files afterwards."""
    root = tmp_path / "folder"
    os.makedirs(root / "all")
    for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255),
                               (255, 255, 0)]):
        _write_png(root / "all" / f"{i}.png", 40, 40, color=color)
    ds = ImageFolderDataset(str(root), random_crop=False, hflip=False,
                            seed=0)
    before = ds.load(0, 32).copy()          # warms cache under key (0, 32)
    ds.limit(2, seed=3)
    after = ds.load(0, 32)
    # seed 3 selects files {1, 3}: post-limit index 0 is a DIFFERENT file,
    # so a stale cache hit would return `before` (file 0)
    fresh = ImageFolderDataset(str(root), random_crop=False, hflip=False,
                               seed=0).limit(2, seed=3).load(0, 32)
    np.testing.assert_array_equal(after, fresh)
    assert not np.array_equal(after, before)


def test_folder_stream_resume_reproducible(tmp_path):
    """Crop/flip randomness is counter-derived from (seed, epoch, index):
    restarting the batch iterator reproduces the exact augmentation stream
    (resume reproducibility — the reference's seeded DataLoader semantics,
    train.py:36-47), while different epochs/seeds still draw fresh crops."""
    root = tmp_path / "imgs"
    os.makedirs(root / "all")
    for i in range(4):
        _write_png(root / "all" / f"{i}.png", 100, 140, color=(i * 50, 10, 9))
    ds = ImageFolderDataset(str(root), resize_factor=1.5, random_crop=True,
                            hflip=True, seed=3)

    # same (seed, epoch, idx) -> bit-identical; load() is pure
    a = ds.load(1, 32, seed=7, epoch=0)
    b = ds.load(1, 32, seed=7, epoch=0)
    np.testing.assert_array_equal(a, b)

    # two independent iterators at the same seed = identical streams
    def take(k, seed):
        it = folder_batches(ds, 2, 32, seed=seed)
        return [next(it)[0] for _ in range(k)]
    s1 = take(5, seed=11)   # 4 imgs / batch 2 -> crosses an epoch boundary
    s2 = take(5, seed=11)
    for x, y in zip(s1, s2):
        np.testing.assert_array_equal(x, y)

    # different epochs and different seeds draw different crops
    assert any(not np.array_equal(s1[0], s1[i]) for i in (2, 4))
    s3 = take(1, seed=12)
    assert not np.array_equal(s1[0], s3[0])


def test_folder_parallel_decode_identical(tmp_path):
    """num_workers > 0 must yield the bit-identical batch stream: loads
    are keyed (seed, epoch, index) and the pool map preserves order, so
    worker count/scheduling cannot reorder or reseed anything."""
    root = tmp_path / "imgs"
    os.makedirs(root / "a")
    os.makedirs(root / "b")
    for i in range(6):
        _write_png(root / ("a" if i % 2 else "b") / f"{i}.png", 80, 96,
                   color=(i * 40, 200 - i * 30, 7))
    ds = ImageFolderDataset(str(root), resize_factor=1.2, random_crop=True,
                            hflip=True, seed=0)

    def take(k, workers):
        it = folder_batches(ds, 2, 32, seed=5, num_workers=workers)
        out = [next(it) for _ in range(k)]
        it.close()  # exercises the pool-shutdown finally
        return out
    sync = take(7, workers=0)       # crosses 2 epoch boundaries
    par = take(7, workers=3)
    for (xi, xl), (yi, yl) in zip(sync, par):
        np.testing.assert_array_equal(xi, yi)
        np.testing.assert_array_equal(xl, yl)


def test_wikiart_csv_dataset(tmp_path):
    img_root = tmp_path / "images"
    rows = []
    for cat, size in [("portrait", 64), ("portrait", 16),
                      ("landscape", 128)]:
        os.makedirs(img_root / cat, exist_ok=True)
        name = f"{cat}/{size}.png"
        _write_png(img_root / cat / f"{size}.png", size, size)
        rows.append((name, cat, size))
    csv_path = tmp_path / "data_info.csv"
    with open(csv_path, "w") as f:
        f.write("filename,category,size\n")
        for name, cat, size in rows:
            f.write(f"{name},{cat},{size}\n")

    ds = WikiArtDataset(str(csv_path), str(img_root))
    assert ds.num_classes == 2
    # size filter: only images with size >= resolution survive
    assert len(ds.subset_for(32)) == 2
    assert len(ds.subset_for(128)) == 1
    img = ds.load("portrait/64.png", 32)
    assert img.shape == (32, 32, 3)

    from pgx.cli.conditional_proper_wikiart import wikiart_batches
    imgs, labels = next(wikiart_batches(ds, 2, 32, seed=0))
    assert imgs.shape == (2, 32, 32, 3)
    assert set(labels) <= {0, 1}


def test_mnist_idx_reader(tmp_path):
    n, h, w = 5, 28, 28
    rng = np.random.RandomState(0)
    images = (rng.rand(n, h, w) * 255).astype(np.uint8)
    labels = rng.randint(0, 10, n).astype(np.uint8)
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">IIII", 2051, n, h, w) + images.tobytes())
    with gzip.open(tmp_path / "train-labels-idx1-ubyte.gz", "wb") as f:
        f.write(struct.pack(">II", 2049, n) + labels.tobytes())
    ds = load_mnist(str(tmp_path))
    assert ds.images.shape == (n, h, w, 1)
    np.testing.assert_array_equal(ds.labels, labels)


def test_cifar_pickle_reader(tmp_path):
    base = tmp_path / "cifar-10-batches-py"
    os.makedirs(base)
    rng = np.random.RandomState(1)
    for i in range(1, 6):
        batch = {b"data": (rng.rand(4, 3072) * 255).astype(np.uint8),
                 b"labels": list(rng.randint(0, 10, 4))}
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(batch, f)
    ds = load_cifar10(str(tmp_path))
    assert ds.images.shape == (20, 32, 32, 3)
    assert ds.num_classes == 10


def test_sklearn_digits_loader():
    """The bundled real dataset: 1797 8x8 grayscale digits, full uint8
    range, ten balanced classes."""
    from pgx.data import load_sklearn_digits
    ds = load_sklearn_digits()
    assert ds.images.shape == (1797, 8, 8, 1)
    assert ds.images.dtype == np.uint8
    assert ds.images.max() > 200          # rescaled from 0..16 to 0..255
    assert ds.num_classes == 10
    assert set(np.unique(ds.labels)) == set(range(10))
    rgb = load_sklearn_digits(rgb=True)
    assert rgb.images.shape == (1797, 8, 8, 3)
    np.testing.assert_array_equal(rgb.images[..., 0], rgb.images[..., 2])


def test_dataset_subset_balanced():
    from pgx.data import load_sklearn_digits
    ds = load_sklearn_digits()
    sub = ds.subset(200, seed=3)
    assert len(sub) == 200
    counts = np.bincount(sub.labels, minlength=10)
    assert counts.min() == counts.max() == 20  # class-balanced
    # deterministic
    sub2 = ds.subset(200, seed=3)
    np.testing.assert_array_equal(sub.images, sub2.images)
    # exactly n even when n isn't a multiple of num_classes
    sub3 = ds.subset(255, seed=3)
    assert len(sub3) == 255
    c3 = np.bincount(sub3.labels, minlength=10)
    assert c3.min() >= 25 and c3.max() <= 26  # round-robin top-up


def test_folder_and_wikiart_limit(tmp_path):
    """--limit-images works for the file-backed datasets too."""
    import csv

    from PIL import Image

    from pgx.data import ImageFolderDataset, WikiArtDataset

    root = tmp_path / "imgs"
    for c in range(3):
        os.makedirs(root / f"c{c}")
        for i in range(5):
            Image.new("RGB", (16, 16)).save(root / f"c{c}" / f"{i}.png")
    ds = ImageFolderDataset(str(root)).limit(7, seed=0)
    assert len(ds) == 7
    counts = np.bincount(ds.labels, minlength=3)
    assert counts.min() >= 2 and counts.max() <= 3

    with open(tmp_path / "info.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["filename", "category", "size"])
        for c in range(3):
            for i in range(5):
                w.writerow([f"c{c}/{i}.png", f"c{c}", 16])
    wa = WikiArtDataset(str(tmp_path / "info.csv"), str(root)).limit(7)
    assert len(wa.rows) == 7
    cats = np.bincount([wa.categories[c] for _, c, _ in wa.rows],
                       minlength=3)
    assert cats.min() >= 2 and cats.max() <= 3


def test_inception_weight_loader_roundtrip(tmp_path):
    """load_torch_weights consumes a torchvision-named state_dict file and
    the loaded net reproduces the source parameters' forward."""
    import torch

    import jax
    from pgx.eval.inception import (inception_pool3, init_inception,
                                    load_torch_weights)

    params = init_inception(jax.random.PRNGKey(0))
    sd = {}
    for name, p in params.items():
        w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))  # HWIO -> OIHW
        sd[f"{name}.conv.weight"] = torch.from_numpy(w.copy())
        sd[f"{name}.bn.weight"] = torch.from_numpy(np.asarray(p["gamma"]))
        sd[f"{name}.bn.bias"] = torch.from_numpy(np.asarray(p["beta"]))
        sd[f"{name}.bn.running_mean"] = torch.from_numpy(
            np.asarray(p["mean"]))
        sd[f"{name}.bn.running_var"] = torch.from_numpy(np.asarray(p["var"]))
    path = str(tmp_path / "inception.pth")
    torch.save(sd, path)

    loaded = load_torch_weights(path)
    x = np.random.RandomState(2).randn(1, 299, 299, 3).astype(np.float32)
    a = np.asarray(inception_pool3(params, x))
    b = np.asarray(inception_pool3(loaded, x))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
