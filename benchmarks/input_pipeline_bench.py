"""Input-pipeline throughput: can the host feed the TPU at step rate?

Every training bench so far times the device step on a resident batch; this
one times the HOST side — batch assembly (gather+normalize via the C++
runtime for array datasets, decode+resize+crop for folder datasets) and the
DevicePrefetcher upload — per resolution, and compares against the measured
train-step rates so pipeline-bound stages are visible.

The reference never measures this either (its torch DataLoader is rebuilt
per stage and never profiled, train.py:110-111); on a 1-core host the
folder path's per-image PNG decode is the candidate bottleneck.

Usage:
    python benchmarks/input_pipeline_bench.py                 # array path
    python benchmarks/input_pipeline_bench.py --folder DIR    # folder path
    python benchmarks/input_pipeline_bench.py --make-folder N # synth folder
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

# step rates from benchmarks/README.md (one v5e chip, bf16, batch 32,
# reference-exact GP, stable phase) — the demand side of the comparison
STEP_IMG_S = {4: 5120.0, 8: 3900.0, 16: 2061.0, 32: 684.0, 64: 232.0,
              128: 129.5}


def make_synthetic_folder(root: str, n: int, size: int = 192,
                          classes: int = 10) -> None:
    from PIL import Image
    rng = np.random.RandomState(0)
    for i in range(n):
        cls = os.path.join(root, f"class_{i % classes}")
        os.makedirs(cls, exist_ok=True)
        arr = rng.randint(0, 256, (size, size, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(cls, f"img_{i:05d}.png"))


def bench_iterator(it, batch_size: int, steps: int, warmup: int = 3):
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(steps):
        next(it)
    dt = time.perf_counter() - t0
    return batch_size * steps / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--resolutions", default="4,8,16,32,64,128")
    p.add_argument("--folder", default=None,
                   help="ImageFolder root (CelebA-style path)")
    p.add_argument("--make-folder", type=int, default=0,
                   help="build a synthetic N-image folder in /tmp and bench it")
    p.add_argument("--cache-bytes", type=int, default=None,
                   help="folder decode cache budget (None = default)")
    p.add_argument("--workers", type=int, default=0,
                   help="decode threads for the folder path (0 = sync)")
    p.add_argument("--prefetch", action="store_true",
                   help="also time the DevicePrefetcher end-to-end feed rate")
    args = p.parse_args()

    from pgx.data.datasets import ImageFolderDataset, load_sklearn_digits
    from pgx.data.pipeline import array_batches, folder_batches

    resolutions = [int(r) for r in args.resolutions.split(",")]
    results = {}

    folder_root = args.folder
    tmp = None
    if args.make_folder:
        tmp = tempfile.TemporaryDirectory(prefix="pgx_ipbench_")
        folder_root = tmp.name
        make_synthetic_folder(folder_root, args.make_folder)

    if folder_root:
        kw = {}
        if args.cache_bytes is not None:
            kw["cache_bytes"] = args.cache_bytes
        ds = ImageFolderDataset(folder_root, resize_factor=1.2,
                                random_crop=True, hflip=True, **kw)
        kind = "folder"
        make = lambda res: folder_batches(ds, args.batch_size, res,
                                          num_workers=args.workers)
    else:
        ds = load_sklearn_digits(rgb=True)
        kind = "array"
        make = lambda res: array_batches(ds, args.batch_size, res)

    for res in resolutions:
        it = make(res)
        # folder path: first epoch decodes (cold), later epochs hit the
        # decode cache — report both so the cache's effect is visible
        n_batches = max(1, len(ds) // args.batch_size)
        if kind == "folder":
            # clamp to >= 1 timed step: tiny folders (n_batches <= 3)
            # would otherwise time zero iterations and report 0.0
            cold = bench_iterator(it, args.batch_size,
                                  max(1, min(args.steps, n_batches - 3)),
                                  warmup=min(3, max(0, n_batches - 1)))
            # drain to the next epoch boundary so the cache is fully primed
            for _ in range(2 * n_batches):
                next(it)
            warm = bench_iterator(it, args.batch_size, args.steps)
            row = {"cold_img_s": round(cold, 1), "warm_img_s": round(warm, 1)}
            feed = warm
        else:
            feed = bench_iterator(it, args.batch_size, args.steps)
            row = {"img_s": round(feed, 1)}
        demand = STEP_IMG_S.get(res)
        if demand:
            row["step_img_s"] = demand
            row["headroom"] = round(feed / demand, 2)
        results[res] = row
        print(f"{kind} @ {res:4d}px: {row}", flush=True)

    if args.prefetch:
        from pgx.data.pipeline import DevicePrefetcher
        for res in resolutions:
            pf = DevicePrefetcher(make(res))
            for _ in range(3):
                next(pf)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                next(pf)
            dt = time.perf_counter() - t0
            rate = args.batch_size * args.steps / dt
            results[res]["prefetch_img_s"] = round(rate, 1)
            print(f"prefetch @ {res:4d}px: {rate:.1f} img/s", flush=True)
            pf.close()

    print(json.dumps({"kind": kind, "batch_size": args.batch_size,
                      "results": results}))
    if tmp:
        tmp.cleanup()


if __name__ == "__main__":
    main()
