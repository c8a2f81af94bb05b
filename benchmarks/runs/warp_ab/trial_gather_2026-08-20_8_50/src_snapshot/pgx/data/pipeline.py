"""Batching, normalization, and device prefetch.

The reference's torch DataLoader + ``.to(device)`` copy (the per-iteration
host->device boundary, SURVEY.md section 3.1) becomes: numpy batch assembly
on the host, ``[-1, 1]`` normalization, and a background-thread prefetcher
that lands batches on the mesh (batch-sharded) one step ahead, so the TPU
never waits on the host.
"""

from __future__ import annotations

import queue
import threading
from contextlib import contextmanager
from typing import Iterator, Optional, Tuple

import numpy as np

import jax

from pgx.data.datasets import ArrayDataset, ImageFolderDataset


def normalize_to_unit(images_u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1, 1] (Normalize(0.5, 0.5), train.py:44-46).

    Uses the C++ runtime when available (pgx.native), numpy otherwise."""
    if images_u8.dtype == np.uint8:
        from pgx.native import normalize_u8
        return normalize_u8(images_u8)
    return images_u8.astype(np.float32) / 127.5 - 1.0


def array_batches(dataset: ArrayDataset, batch_size: int, resolution: int,
                  seed: int = 0) -> Iterator[Tuple[np.ndarray,
                                                   Optional[np.ndarray]]]:
    """Infinite shuffled epochs over a per-resolution cache (replaces the
    reference's rebuilt DataLoader per stage)."""
    images = dataset.at_resolution(resolution)
    labels = dataset.labels
    from pgx.native import gather_normalize
    rng = np.random.RandomState(seed)
    n = len(images)
    if batch_size > n:
        raise ValueError(
            f"batch_size={batch_size} exceeds the {n} available images at "
            f"{resolution}px — the epoch loop would yield nothing and "
            f"training would hang (reduce the batch or --limit-images less)")
    while True:
        order = rng.permutation(n)
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start:start + batch_size]
            # fused C++ gather+normalize when the native runtime is built
            yield (gather_normalize(images, idx),
                   labels[idx] if labels is not None else None)


@contextmanager
def ordered_map_pool(num_workers: int):
    """Yield an order-preserving map over an optional decode thread pool
    (``num_workers == 0`` -> builtin ``map``, fully synchronous); the pool
    is shut down (queued work cancelled) on exit.  Order preservation is
    what keeps a worker-pool batch stream bit-identical to the synchronous
    path regardless of worker count or scheduling — shared by the folder
    and WikiArt pipelines."""
    if num_workers > 0:
        from concurrent.futures import ThreadPoolExecutor
        pool = ThreadPoolExecutor(num_workers)
        try:
            yield pool.map
        finally:
            pool.shutdown(wait=False, cancel_futures=True)
    else:
        yield map


def folder_batches(dataset: ImageFolderDataset, batch_size: int,
                   resolution: int, seed: int = 0, num_workers: int = 0
                   ) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
    """``num_workers > 0`` decodes each batch's images through a thread
    pool (PIL decode/resize release the GIL) with a stream identical to
    the synchronous path: every load is keyed by (seed, epoch, index)."""
    rng = np.random.RandomState(seed)
    n = len(dataset)
    if batch_size > n:
        raise ValueError(
            f"batch_size={batch_size} exceeds the {n} available images — "
            f"the epoch loop would yield nothing and training would hang")
    epoch = 0
    with ordered_map_pool(num_workers) as pmap:
        while True:
            order = rng.permutation(n)
            for start in range(0, n - batch_size + 1, batch_size):
                idx = order[start:start + batch_size]
                # crop/flip randomness is counter-derived from
                # (seed, epoch, index) so restarting this iterator
                # reproduces the exact augmentation stream (resume
                # reproducibility)
                load = (lambda i, e=epoch: dataset.load(
                    int(i), resolution, seed=seed, epoch=e))
                imgs = np.stack(list(pmap(load, idx)))
                labs = (dataset.labels[idx] if dataset.labels is not None
                        else None)
                yield normalize_to_unit(imgs), labs
            epoch += 1


class DevicePrefetcher:
    """Background thread that assembles + uploads the next batch while the
    current train step runs (double-buffered)."""

    _SENTINEL = object()

    def __init__(self, iterator, mesh=None, depth: int = 2,
                 image_sharding=None):
        from pgx.parallel import batch_sharding
        self._sharding = batch_sharding(mesh) if mesh is not None else None
        # spatial model-parallelism shards the image H dim too; labels
        # stay batch-sharded (pgx/parallel/tp.py spatial_batch_sharding)
        self._image_sharding = image_sharding or self._sharding
        # multi-host: each process feeds its slice of the global batch and
        # the shards are stitched into one global array (SURVEY.md 2.8 —
        # the InfiniteSampler(rank, num_replicas) equivalent)
        self._multihost = jax.process_count() > 1
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._iterator = iterator
        self._stop = threading.Event()
        self._error = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _put(self, batch):
        imgs, labels = batch
        if self._sharding is not None:
            if self._multihost:
                put = lambda a, sh: jax.make_array_from_process_local_data(
                    sh, np.asarray(a))
            else:
                put = lambda a, sh: jax.device_put(a, sh)
            imgs = put(imgs, self._image_sharding)
            if labels is not None:
                labels = put(labels, self._sharding)
        return imgs, labels

    def _worker(self):
        try:
            for batch in self._iterator:
                if self._stop.is_set():
                    return
                self._q.put(self._put(batch))
        except BaseException as exc:  # surface in the consumer thread
            self._error = exc
        finally:
            self._q.put(self._SENTINEL)

    def __iter__(self):
        return self

    def __next__(self):
        item = self._q.get()
        if item is self._SENTINEL:
            if self._error is not None:
                raise RuntimeError(
                    "DevicePrefetcher worker failed") from self._error
            raise StopIteration
        return item

    def close(self):
        self._stop.set()
        # drain so the worker can observe the stop flag
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
