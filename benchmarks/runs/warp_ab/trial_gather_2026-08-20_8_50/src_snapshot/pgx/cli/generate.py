"""Sample from a trained trial's generator checkpoint.

The reference only emits sample grids from inside its training loops
(train.py:171-180); this standalone tool loads any ``{iter}_g.model``
checkpoint (EMA generator), re-derives the growth state (step, alpha)
from the trial's schedule exactly like the FID drivers
(fid/load_cifar_model_and_fid_it.py:97-103), and writes a PNG grid
and/or an .npz of raw samples.

    python -m pgx.cli.generate --trial trial_xxx/ --num 100 --out grid.png
    python -m pgx.cli.generate --trial trial_xxx/ --checkpoint 28000 \
        --per-class 10 --npz samples.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from pgx import checkpoint as ckpt
from pgx.train.schedule import schedule_from_dict
from pgx.train.wgan import make_eval_generate
from pgx.utils.png import save_image_grid


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--trial", required=True, help="trial directory")
    p.add_argument("--checkpoint", type=int, default=None,
                   help="iteration index (default: latest)")
    p.add_argument("--num", type=int, default=50,
                   help="sample count for unconditional models")
    p.add_argument("--per-class", type=int, default=10,
                   help="samples per class for conditional models "
                        "(one class per grid row)")
    p.add_argument("--out", default=None,
                   help="output PNG grid (default: <trial>/generated_"
                        "<iter>.png)")
    p.add_argument("--npz", default=None,
                   help="also save raw samples (+labels) as .npz")
    p.add_argument("--batch-size", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    cfg = ckpt.load_config(args.trial)
    gcfg, _, _ = ckpt.configs_from_dict(cfg)
    schedule = schedule_from_dict(cfg["schedule"])

    try:
        gpath, params, iteration, st = ckpt.load_generator_state(
            args.trial, schedule, args.checkpoint)
    except FileNotFoundError as exc:
        raise SystemExit(str(exc))

    conditional = gcfg.conditioning != "none"
    rng = np.random.RandomState(args.seed)
    if conditional:
        c = gcfg.num_classes
        labels = np.repeat(np.arange(c), args.per_class)
        nrow = args.per_class
    else:
        labels = None
        nrow = 10
    n = len(labels) if conditional else args.num
    z = rng.randn(n, gcfg.z_dim).astype(np.float32)

    import jax.numpy as jnp
    gen = make_eval_generate(gcfg, step=st.step, fading=st.fading)
    outs = []
    for lo in range(0, n, args.batch_size):
        hi = min(lo + args.batch_size, n)
        lab = jnp.asarray(labels[lo:hi]) if conditional else None
        outs.append(np.asarray(gen(params, jnp.asarray(z[lo:hi]), lab,
                                   jnp.float32(st.alpha))))
    images = np.concatenate(outs)

    out = args.out or os.path.join(args.trial, f"generated_{iteration}.png")
    save_image_grid(out, images, nrow=nrow)
    print(f"wrote {out} ({n} samples at {st.resolution}px, "
          f"step {st.step}, alpha {st.alpha:.2f})")
    if args.npz:
        payload = {"images": images, "z": z}
        if labels is not None:
            payload["labels"] = labels
        np.savez(args.npz, **payload)
        print(f"wrote {args.npz}")
    return out


if __name__ == "__main__":
    main()
