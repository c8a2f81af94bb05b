"""ADA augmentation visual demo (mirrors ada/augmentation_fun.py): a grid
sweeping the augmentation probability p over [0, 1) on one batch of images.

    python -m pgx.cli.augmentation_demo --synthetic --out /tmp/aug.png
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from pgx.augment import bgc_config, augment_pipe
from pgx.data import synthetic_dataset
from pgx.data.pipeline import normalize_to_unit
from pgx.utils.png import save_image_grid


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", default=None, help="image folder (optional)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--out", default="augmentation_demo.png")
    p.add_argument("--rows", type=int, default=5, help="p values, 0..1")
    p.add_argument("--cols", type=int, default=5)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.path and not args.synthetic:
        from pgx.data import ImageFolderDataset
        from pgx.data.pipeline import folder_batches
        ds = ImageFolderDataset(args.path)
        imgs, _ = next(folder_batches(ds, args.cols, args.size,
                                      seed=args.seed))
    else:
        ds = synthetic_dataset(n=args.cols, size=args.size, channels=3,
                               seed=args.seed)
        imgs = normalize_to_unit(ds.at_resolution(args.size))

    cfg = bgc_config(noise=1, cutout=1, imgfilter=1 if args.size >= 64 else 0)
    rows = []
    for r in range(args.rows):
        p_val = r / args.rows
        out = augment_pipe(jax.random.PRNGKey(args.seed + r),
                           jnp.asarray(imgs), cfg, p_val)
        rows.append(np.asarray(out))
    grid = np.concatenate(rows, axis=0)
    save_image_grid(args.out, grid, nrow=args.cols)
    print(f"wrote {args.out} ({args.rows} p-levels x {args.cols} images)")
    return args.out


if __name__ == "__main__":
    main()
