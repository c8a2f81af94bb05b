"""Grow a trained smaller-net checkpoint into a bigger-max_step net (mirrors
scripts/smaller_to_bigger_net_checkpoint_load.py).

Loads the latest G/D checkpoints of a trial, builds larger configs (more
stages / higher max_step), copies every matching resolution-keyed parameter
(the reference's by-name G copy and align-from-the-end D logic collapse to
one rule here), verifies output equivalence at the shared step, and writes
the grown checkpoints into a new trial directory.

    python -m pgx.cli.grow_checkpoint --trial trial_xxx/ \
        --target-channels 512,512,512,512,256,128,64,64 --target-max-step 8
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import numpy as np

import jax
import jax.numpy as jnp

from pgx import checkpoint as ckpt
from pgx.models import init_discriminator, init_generator


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trial", required=True)
    p.add_argument("--out", default=None,
                   help="output trial dir (default: <trial>_grown)")
    p.add_argument("--target-channels", required=True,
                   help="comma-separated per-stage channels for the grown G")
    p.add_argument("--target-max-step", type=int, required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--check-step", type=int, default=1,
                   help="shared step for the equivalence assert")
    args = p.parse_args(argv)

    cfg = ckpt.load_config(args.trial)
    gcfg, dcfg, tc = ckpt.configs_from_dict(cfg)

    channels = tuple(int(c) for c in args.target_channels.split(","))
    big_g = dataclasses.replace(gcfg, channels=channels,
                                max_step=args.target_max_step)
    # D stages mirror G: stage_out[k] feeds stage_in[k-1]
    big_d = dataclasses.replace(
        dcfg,
        stage_in=channels,
        stage_out=(channels[0],) + channels[:-1],
        max_step=args.target_max_step)

    gpath = ckpt.latest_checkpoint(args.trial, "g")
    dpath = ckpt.latest_checkpoint(args.trial, "d")
    if gpath is None:
        raise SystemExit(f"no checkpoints in {args.trial}")
    small_gp = ckpt.load_params(gpath)
    small_dp = ckpt.load_params(dpath)

    key = jax.random.PRNGKey(args.seed)
    kg, kd = jax.random.split(key)
    big_gp = ckpt.grow_params(small_gp, init_generator(kg, big_g))
    big_dp = ckpt.grow_params(small_dp, init_discriminator(kd, big_d))

    # equivalence at the shared step (reference :79-92): same z/label must
    # produce the same image through G AND the same score through D.
    z = jax.random.normal(jax.random.PRNGKey(args.seed + 1), (4, gcfg.z_dim))
    labels = (jnp.zeros((4,), jnp.int32)
              if gcfg.conditioning != "none" else None)
    ckpt.assert_grow_equivalence(small_gp, gcfg, big_gp, big_g, z,
                                 labels=labels, step=args.check_step)
    from pgx.models.generator import generator_apply
    img = generator_apply(small_gp, gcfg, z, labels, step=args.check_step)
    dlabels = labels if dcfg.conditioning != "none" else None
    ckpt.assert_grow_equivalence_d(small_dp, dcfg, big_dp, big_d, img,
                                   labels=dlabels, step=args.check_step)

    out_dir = args.out or args.trial.rstrip("/") + "_grown"
    os.makedirs(os.path.join(out_dir, "checkpoint"), exist_ok=True)
    it = ckpt.checkpoint_iteration(gpath)
    ckpt.save_params(os.path.join(out_dir, "checkpoint",
                                  ckpt.checkpoint_name(it, "g")), big_gp)
    ckpt.save_params(os.path.join(out_dir, "checkpoint",
                                  ckpt.checkpoint_name(it, "d")), big_dp)
    extra = {k: v for k, v in cfg.items()
             if k not in ("generator", "discriminator", "train")}
    if "schedule" in extra and "max_step" in extra["schedule"]:
        # the copied schedule must allow the grown net's new stages —
        # tools that re-derive (step, alpha) per iteration (generate,
        # fid_sweep, create_gif) read it from this config
        extra["schedule"] = {**extra["schedule"],
                             "max_step": args.target_max_step}
    ckpt.save_config(out_dir, big_g, big_d, tc, extra=extra, postfix="grown")
    print(f"grown checkpoints written to {out_dir} "
          f"(equivalence verified at step {args.check_step})")
    return out_dir


if __name__ == "__main__":
    main()
