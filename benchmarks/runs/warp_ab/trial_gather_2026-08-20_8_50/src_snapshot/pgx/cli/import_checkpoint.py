"""Import a reference (PyTorch) trial into pgx format.

The reference saves raw state_dicts as ``{iter}_g.model`` / ``{iter}_d.model``
under ``trial_*/checkpoint/`` next to a ``train_config_*.json``
(train.py:182-187, mnist_train.py:100-121); its FID sweeps consume them
(fid/load_cifar_model_and_fid_it.py:93-103).  This CLI converts such a trial
(or a single checkpoint pair) into a pgx trial directory — npz checkpoints +
pgx config JSON — ready for ``pgx.cli.fid_sweep``, ``pgx.cli.grow_checkpoint``,
``pgx.cli.create_gif``, or resuming training.

    python -m pgx.cli.import_checkpoint --trial /ref/trial_proper_cifar \\
        --family proper --out /tmp/imported

    python -m pgx.cli.import_checkpoint --g-model 100000_g.model \\
        --family conditional_proper --num-classes 10 --out /tmp/imported

The transplant is layout conversion only (tests/test_model_parity.py pins it
to the reference at float64 rtol 1e-9).  ``--sample`` additionally renders a
grid from each imported generator for eyeballing.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from pgx import checkpoint as ckpt
from pgx.checkpoint.torch_import import FAMILIES, import_checkpoint_pair


def _write_sample(out_dir, name, gcfg, g_params, seed=0):
    import jax
    import jax.numpy as jnp

    from pgx.models import generator_apply
    from pgx.utils.png import save_image_grid

    n = 25
    key = jax.random.PRNGKey(seed)
    z = jax.random.normal(key, (n, gcfg.z_dim), jnp.float32)
    labels = None
    if gcfg.conditioning != "none":
        labels = jnp.arange(n) % gcfg.num_classes
    step = gcfg.max_step
    imgs = generator_apply(g_params, gcfg, z, labels, step=step,
                           alpha=jnp.float32(1.0), fading=False)
    os.makedirs(os.path.join(out_dir, "sample"), exist_ok=True)
    path = os.path.join(out_dir, "sample", f"{name}_imported.png")
    save_image_grid(path, np.asarray(imgs), nrow=5)
    return path


def main(argv=None):
    p = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--trial", help="reference trial dir "
                                   "(train_config_*.json + checkpoint/)")
    p.add_argument("--g-model", help="single *_g.model file instead of a "
                                     "trial dir")
    p.add_argument("--d-model", help="optional *_d.model companion")
    p.add_argument("--family", required=True, choices=sorted(FAMILIES),
                   help="reference model family (per training script)")
    p.add_argument("--num-classes", type=int, default=10,
                   help="conditional class count (the reference does not "
                        "record it in its config JSON)")
    p.add_argument("--out", required=True, help="output pgx trial dir")
    p.add_argument("--latest-only", action="store_true",
                   help="convert only the newest checkpoint pair")
    p.add_argument("--sample", action="store_true",
                   help="render a 5x5 sample grid per imported generator")
    args = p.parse_args(argv)

    if not args.trial and not args.g_model:
        p.error("provide --trial or --g-model")

    ref_cfg = {}
    if args.trial:
        try:
            ref_cfg = ckpt.load_config(args.trial)
        except FileNotFoundError:
            print("warning: no train_config_*.json in the trial dir; "
                  "inferring dims from checkpoint shapes")
    if "generator" not in ref_cfg:
        from pgx.checkpoint.torch_import import (infer_ref_config,
                                                 load_torch_state_dict)
        g_probes = ([args.g_model] if args.g_model
                    else ckpt.list_checkpoints(args.trial, "g"))
        if not g_probes:
            raise SystemExit(f"no *_g.model checkpoints in {args.trial}")
        g_probe = g_probes[-1]
        d_paths = [args.d_model] if args.d_model else (
            ckpt.list_checkpoints(args.trial, "d")[-1:] if args.trial else [])
        ref_cfg = {**infer_ref_config(
            load_torch_state_dict(g_probe),
            load_torch_state_dict(d_paths[0]) if d_paths else None),
            **ref_cfg}
    gcfg, dcfg = FAMILIES[args.family](ref_cfg, args.num_classes)

    if args.g_model:
        pairs = [(args.g_model, args.d_model)]
    else:
        g_paths = ckpt.list_checkpoints(args.trial, "g")
        if not g_paths:
            raise SystemExit(f"no *_g.model checkpoints in {args.trial}")
        if args.latest_only:
            g_paths = g_paths[-1:]
        d_by_iter = {ckpt.checkpoint_iteration(pth): pth
                     for pth in ckpt.list_checkpoints(args.trial, "d")}
        pairs = [(gp, d_by_iter.get(ckpt.checkpoint_iteration(gp)))
                 for gp in g_paths]

    os.makedirs(os.path.join(args.out, "checkpoint"), exist_ok=True)
    from pgx.train import TrainConfig
    tc_kwargs = {}
    if "learning_rate" in ref_cfg:
        tc_kwargs["learning_rate"] = ref_cfg["learning_rate"]
    extra = {k: ref_cfg[k] for k in
             ("batch_size", "total_iter", "images_seen_per_mini_step",
              "max_step", "init_step", "trial_name") if k in ref_cfg}
    extra["imported_from"] = args.trial or args.g_model
    extra["reference_family"] = args.family
    ckpt.save_config(args.out, gcfg, dcfg, TrainConfig(**tc_kwargs),
                     extra=extra, postfix="imported")

    for g_path, d_path in pairs:
        it = ckpt.checkpoint_iteration(g_path)
        g_params, d_params = import_checkpoint_pair(g_path, d_path,
                                                    gcfg, dcfg)
        ckpt.save_params(os.path.join(args.out, "checkpoint",
                                      ckpt.checkpoint_name(it, "g")),
                         g_params)
        if d_params is not None:
            ckpt.save_params(os.path.join(args.out, "checkpoint",
                                          ckpt.checkpoint_name(it, "d")),
                             d_params)
        msg = f"imported iter {it}: G" + ("" if d_params is None else "+D")
        if args.sample:
            msg += f" -> {_write_sample(args.out, str(it).zfill(3), gcfg, g_params)}"
        print(msg)
    print(f"pgx trial written to {args.out}")
    return args.out


if __name__ == "__main__":
    main()
