"""Checkpoint-sweep FID driver CLI (mirrors fid/load_mnist_model_and_fid_it
.py and fid/load_cifar_model_and_fid_it.py).

Scores every generator checkpoint in a trial directory against real-data
statistics, writing an incremental fid_score.json.  The growth schedule is
reconstructed from the trial's train_config_*.json.

Example:
    python -m pgx.cli.fid_sweep --trial trial_mnist_.../ --dataset mnist \
        --path /data/mnist --num-samples 2000
"""

from __future__ import annotations

import argparse

import numpy as np

from pgx import checkpoint as ckpt
from pgx.data import load_cifar10, load_mnist, load_sklearn_digits, \
    synthetic_dataset
from pgx.eval import load_torch_weights, make_extractor, sweep_trial
from pgx.train.schedule import schedule_from_dict


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trial", required=True, help="trial directory")
    p.add_argument("--dataset", default="synthetic",
                   choices=["mnist", "cifar10", "sklearn-digits",
                            "synthetic"])
    p.add_argument("--path", default=None, help="dataset root")
    p.add_argument("--num-samples", type=int, default=2000)
    p.add_argument("--num-real", type=int, default=2000)
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--inception-weights", default=None,
                   help="torch state_dict file for the FID InceptionV3; "
                        "random init if absent (pipeline testing only)")
    p.add_argument("--kid", action="store_true",
                   help="also score the Kernel Inception Distance (unbiased "
                        "MMD^2 with error bars; pgx.eval.kid) into an "
                        "incremental kid_score.json")
    p.add_argument("--kid-subset-size", type=int, default=1000)
    p.add_argument("--kid-subsets", type=int, default=100)
    p.add_argument("--data-parallel", type=int, default=1,
                   help="shard each Inception batch over this many devices "
                        "(features identical to single-device; use a "
                        "--batch-size divisible by it to avoid padding)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = ckpt.load_config(args.trial)
    if "schedule" not in cfg:
        raise SystemExit("trial config lacks a schedule block; re-run "
                         "training with this version or pass a schedule")
    schedule = schedule_from_dict(cfg["schedule"])

    if args.dataset == "mnist":
        dataset = load_mnist(args.path)
    elif args.dataset == "sklearn-digits":
        dataset = load_sklearn_digits()
    elif args.dataset == "cifar10":
        dataset = load_cifar10(args.path)
    else:
        gcfg_d = cfg["generator"]
        dataset = synthetic_dataset(
            n=max(args.num_real, 256),
            size=32, channels=gcfg_d.get("img_channels", 3), seed=args.seed)

    rng = np.random.RandomState(args.seed)
    images = dataset.at_resolution(dataset.images.shape[1])
    idx = rng.choice(len(images), min(args.num_real, len(images)),
                     replace=False)
    real = images[idx]

    params = (load_torch_weights(args.inception_weights)
              if args.inception_weights else None)
    if params is None:
        print("WARNING: no inception weights given — using random init; "
              "scores are NOT comparable to published FID", flush=True)
    mesh = None
    if args.data_parallel > 1:
        import jax

        from pgx.parallel import make_mesh
        devs = jax.devices()
        if len(devs) < args.data_parallel:
            raise SystemExit(f"--data-parallel {args.data_parallel} needs "
                             f"that many devices; have {len(devs)}")
        mesh = make_mesh(devs[:args.data_parallel])
    extractor = make_extractor(params=params, mesh=mesh)

    scores = sweep_trial(args.trial, schedule, real,
                         num_samples=args.num_samples,
                         batch_size=args.batch_size, extractor=extractor,
                         kid=args.kid, kid_subset_size=args.kid_subset_size,
                         kid_subsets=args.kid_subsets)
    # segregate entries still marked in-training (per-stage baseline, no
    # checkpoint file to re-score from): not comparable to the sweep's
    # native-resolution baseline, so they must not leak into best-of or
    # into the returned comparable set
    from pgx.eval.sweep import load_fid_meta
    meta = load_fid_meta(args.trial)
    comparable = {k: v for k, v in scores.items() if k not in meta}
    leftover = {k: v for k, v in scores.items() if k in meta}
    best = (min(comparable.items(), key=lambda kv: kv[1])
            if comparable else None)
    if best:
        print(f"best: {best[0]} FID={best[1]:.2f}")
    for k in sorted(leftover):
        print(f"note: {k} keeps its in-training per-stage baseline "
              f"(no checkpoint file to re-score from); excluded from best")
    return {"comparable": comparable, "in_training": leftover}


if __name__ == "__main__":
    main()
