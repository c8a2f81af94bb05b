"""Per-stage training-throughput harness (SURVEY.md section 7 item 11:
images/sec/chip per growth stage).

For each resolution stage of the flagship conditional 'proper' config,
times the full fused G+D WGAN-GP train step (fade and stabilize phases) and
prints a table plus one JSON summary line.

    python benchmarks/stage_throughput.py [--batch-size 32] [--steps 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--gp-every", type=int, default=1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from pgx.train import TrainConfig, init_train_state, make_train_step

    gcfg, dcfg = _flagship_configs(dtype=args.dtype)
    tc = TrainConfig(gp_every=args.gp_every)
    state0 = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, gcfg.num_classes, args.batch_size))
    alpha = jnp.float32(0.5)

    rows = []
    for step in range(1, gcfg.max_step + 1):
        res = gcfg.resolution(step)
        real = jnp.asarray(
            rng.randn(args.batch_size, res, res, 3).astype(np.float32))
        for fading in ([False] if step == 1 else [True, False]):
            fn = make_train_step(gcfg, dcfg, tc, step=step, fading=fading,
                                 donate=False)
            state, m = fn(state0, real, labels, alpha)
            float(m["d_total"])  # force compile + completion (axon relay)
            t0 = time.perf_counter()
            s = state0
            for _ in range(args.steps):
                s, m = fn(s, real, labels, alpha)
            float(m["d_total"])
            dt = (time.perf_counter() - t0) / args.steps
            ips = args.batch_size / dt
            phase = "fade" if fading else "stable"
            rows.append({"step": step, "resolution": res, "phase": phase,
                         "ms_per_step": round(dt * 1e3, 1),
                         "images_per_sec": round(ips, 1)})
            print(f"step {step} ({res:>3}px, {phase:>6}): "
                  f"{dt * 1e3:7.1f} ms  {ips:8.1f} img/s", flush=True)

    print(json.dumps({"metric": "per_stage_images_per_sec",
                      "batch_size": args.batch_size, "dtype": args.dtype,
                      "gp_every": args.gp_every, "stages": rows}))


if __name__ == "__main__":
    main()
