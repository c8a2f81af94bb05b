"""MNIST 8->32 progressive WGAN-GP training (mirrors mnist_train.py).

Reference workload (mnist_train.py:274-302): z=128, ch=8, bs=4, lr=1e-3,
legacy iteration-split schedule with a 100k-iteration tail at final res.

Example:
    python -m pgx.cli.mnist_train --synthetic --total-iter 60 --channels 8 \
        --batch-size 8 --output /tmp/trial_verify
"""

from __future__ import annotations

import argparse

from pgx.cli.common import add_ada_args, ada_configs_from_args, \
    add_common_args, get_dataset, \
    maybe_init_multihost
from pgx.models import zoo
from pgx.cli.common import train_config_from_args
from pgx.train import LegacySchedule
from pgx.train.loop import LoopConfig, train_loop


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, defaults=dict(trial_name="mnist", z_dim=128,
                                     channels=8, total_iter=90000,
                                     max_step=3, checkpoint_every=2000))
    p.add_argument("--tail-iterations", type=int, default=0,
                   help="extra iterations at final resolution "
                        "(reference default 100000)")
    p.add_argument("--full-conv-blocks", action="store_true",
                   help="use two-conv blocks instead of MnistConvBlock")
    add_ada_args(p)
    args = p.parse_args(argv)
    maybe_init_multihost(args)

    gcfg = zoo.mnist_generator(
        z_dim=args.z_dim, channel=args.channels, pixel_norm=args.pixel_norm,
        tanh=args.tanh, use_mnist_conv_blocks=not args.full_conv_blocks,
        dtype=args.dtype)
    dcfg = zoo.mnist_discriminator(
        feat_dim=args.channels,
        use_mnist_conv_blocks=not args.full_conv_blocks, dtype=args.dtype)
    tc = train_config_from_args(args)
    schedule = LegacySchedule(args.total_iter, args.max_step, args.init_step)
    dataset = get_dataset(args, "mnist")

    loop_cfg = LoopConfig(
        trial_name=args.trial_name, main_path=args.main_path,
        batch_size=args.batch_size, sample_every=args.sample_every,
        checkpoint_every=args.checkpoint_every, log_every=args.log_every,
        seed=args.seed, tail_iterations=args.tail_iterations,
        use_mesh=args.use_mesh,
        fid_every=args.fid_every, fid_samples=args.fid_samples,
        inception_weights=args.inception_weights,
        steps_per_call=args.steps_per_call,
        model_parallel=args.model_parallel,
        model_parallel_mode=args.model_parallel_mode,
        checkpoint_backend=args.checkpoint_backend)
    aug_cfg, ada_cfg, augment_p = ada_configs_from_args(args)
    trial_dir = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg,
                           resume_dir=args.resume,
                           augment_cfg=aug_cfg, ada_cfg=ada_cfg,
                           augment_p=augment_p)
    print(f"done: {trial_dir}")
    return trial_dir


if __name__ == "__main__":
    main()
