"""Profiling driver: capture a TensorBoard/Perfetto trace of the flagship
train step (the reference only has latent record_function hooks with no
driver, SURVEY.md section 5.1; here the driver exists).

    python -m pgx.cli.profile_step --out /tmp/pgx_trace [--steps 5]

View with: tensorboard --logdir /tmp/pgx_trace   (or load the .pb in
perfetto).  Also prints per-phase wall times measured with host fetches
(block_until_ready is unreliable on the axon relay).
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/pgx_trace")
    p.add_argument("--steps", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--step", type=int, default=6,
                   help="growth stage (6 = 128px flagship; 7-9 use the "
                        "grown zoo.conditional_correct_grown plan)")
    p.add_argument("--gp-mode", default="reverse",
                   choices=["reverse", "jvp"])
    p.add_argument("--remat", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from pgx.models import zoo
    from pgx.train import TrainConfig, init_train_state, make_train_step

    if args.step <= 6:
        from __graft_entry__ import _flagship_configs
        gcfg, dcfg = _flagship_configs(dtype=args.dtype)
    else:
        gcfg, dcfg = zoo.conditional_correct_grown(args.step,
                                                   dtype=args.dtype)
    tc = TrainConfig(gp_mode=args.gp_mode, remat=args.remat)
    state = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)
    rng = np.random.RandomState(0)
    res = gcfg.resolution(args.step)
    real = jnp.asarray(rng.randn(args.batch_size, res, res, 3)
                       .astype(np.float32))
    labels = jnp.asarray(rng.randint(0, gcfg.num_classes, args.batch_size))
    alpha = jnp.float32(1.0)
    step_fn = make_train_step(gcfg, dcfg, tc, step=args.step, fading=False)

    # compile outside the trace
    state, metrics = step_fn(state, real, labels, alpha)
    float(metrics["d_total"])

    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, metrics = step_fn(state, real, labels, alpha)
        float(metrics["d_total"])

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, metrics = step_fn(state, real, labels, alpha)
    float(metrics["d_total"])
    dt = (time.perf_counter() - t0) / args.steps
    print(f"trace written to {args.out}; "
          f"{dt * 1e3:.1f} ms/step = {args.batch_size / dt:.1f} img/s")


if __name__ == "__main__":
    main()
