"""CelebA-style legacy progressive WGAN-GP training (mirrors train.py).

Reference CLI (train.py:207-232): ImageFolder data with
Resize(1.2x) + RandomCrop + HFlip, legacy Generator/Discriminator,
iteration-split schedule clamped at max_step.
"""

from __future__ import annotations

import argparse
import functools

from pgx.cli.common import add_ada_args, add_common_args, ada_configs_from_args, maybe_init_multihost
from pgx.data import ImageFolderDataset, synthetic_dataset
from pgx.data.pipeline import array_batches, folder_batches
from pgx.models import zoo
from pgx.cli.common import train_config_from_args
from pgx.train import LegacySchedule
from pgx.train.loop import LoopConfig, train_loop


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p, defaults=dict(trial_name="celeba", z_dim=128,
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

    if args.synthetic or args.path is None:
        dataset = synthetic_dataset(n=max(4 * args.batch_size, 256), size=64,
                                    channels=3, seed=args.seed)
        batch_fn = array_batches
    else:
        dataset = ImageFolderDataset(args.path, resize_factor=1.2,
                                     random_crop=True, hflip=True,
                                     seed=args.seed)
        if args.limit_images:
            dataset.limit(args.limit_images, seed=args.seed)
        batch_fn = functools.partial(folder_batches,
                                     num_workers=args.data_workers)

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
                           resume_dir=args.resume, batch_fn=batch_fn,
                           augment_cfg=aug_cfg, ada_cfg=ada_cfg,
                           augment_p=augment_p)
    print(f"done: {trial_dir}")
    return trial_dir


if __name__ == "__main__":
    main()
