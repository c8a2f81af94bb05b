"""CIFAR-10 legacy 8->32 progressive WGAN-GP training (mirrors
cifar_train.py: z=128, ch=128, bs=4, 300k iters, max_step=3)."""

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
    add_common_args(p, defaults=dict(trial_name="cifar", z_dim=128,
                                     channels=128, total_iter=300000,
                                     max_step=3))
    add_ada_args(p)
    args = p.parse_args(argv)
    maybe_init_multihost(args)

    gcfg = zoo.legacy_generator(z_dim=args.z_dim, channel=args.channels,
                                pixel_norm=args.pixel_norm, tanh=args.tanh,
                                max_step=args.max_step, dtype=args.dtype)
    dcfg = zoo.legacy_discriminator(feat_dim=args.channels,
                                    max_step=args.max_step, dtype=args.dtype)
    tc = train_config_from_args(args)
    schedule = LegacySchedule(args.total_iter, args.max_step, args.init_step)
    dataset = get_dataset(args, "cifar10")

    loop_cfg = LoopConfig(
        trial_name=args.trial_name, main_path=args.main_path,
        batch_size=args.batch_size, sample_every=args.sample_every,
        checkpoint_every=args.checkpoint_every, log_every=args.log_every,
        seed=args.seed, use_mesh=args.use_mesh,
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
