"""CIFAR-10 'proper' (paper-faithful) 4->32 progressive WGAN-GP training
(mirrors proper_cifar_train.py: z=512, ch=512, bs=4, 800k images per
mini-step, max_step=4, images-seen schedule)."""

from __future__ import annotations

import argparse

from pgx.cli.common import add_ada_args, ada_configs_from_args, \
    add_common_args, add_stage_batch_arg, get_dataset, \
    maybe_init_multihost, parse_stage_batches
from pgx.models import zoo
from pgx.cli.common import train_config_from_args
from pgx.train import ProperSchedule
from pgx.train.loop import LoopConfig, train_loop


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, defaults=dict(trial_name="proper_cifar", z_dim=512,
                                     channels=512, max_step=4, tanh=False,
                                     checkpoint_every=2000))
    p.add_argument("--images-per-mini-step", type=int, default=800000)
    add_stage_batch_arg(p)
    add_ada_args(p)
    args = p.parse_args(argv)
    maybe_init_multihost(args)

    gcfg = zoo.correct_generator(z_dim=args.z_dim, channel=args.channels,
                                 pixel_norm=args.pixel_norm, tanh=args.tanh,
                                 max_step=args.max_step, dtype=args.dtype)
    dcfg = zoo.correct_discriminator(feat_dim=args.channels,
                                     max_step=args.max_step,
                                     dtype=args.dtype)
    tc = train_config_from_args(args)
    schedule = ProperSchedule(args.images_per_mini_step, args.batch_size,
                              args.max_step, args.init_step,
                              stage_batches=parse_stage_batches(
                                  args.stage_batches, args.max_step,
                                  args.init_step))
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
