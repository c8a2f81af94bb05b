"""Remat-policy throughput at high resolution (VERDICT r2 next-step #6).

Round 2 measured blanket remat at the 256px 7-stage flagship: plain maxes
out at batch 32 (71.2 img/s), --remat reaches batch 64 at 51.7 img/s
(0.73x/step).  This bench compares the round-3 SELECTIVE policies —
'convs' (save conv/matmul outputs, recompute elementwise only) and
'd_only' (checkpoint only the GP double-backward path) — at the same
shapes.

    python benchmarks/remat_bench.py --step 7 --batch-size 64
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def make_configs(step, dtype):
    """Conditional proper-arch G/D grown past the zoo's 128px ceiling
    (zoo.conditional_correct_grown: constant 512 through 32px, then the
    standard halving plan — the round-2 benchmarks/README.md rows)."""
    from pgx.models import zoo

    return zoo.conditional_correct_grown(step, dtype=dtype)


def bench(policy, remat, step, batch, dtype, steps, gp_mode="reverse",
          gp_every=1):
    import jax
    import jax.numpy as jnp

    from pgx.train import TrainConfig, init_train_state, make_train_step

    gcfg, dcfg = make_configs(step, dtype)
    tc = dataclasses.replace(TrainConfig(), remat=remat,
                             remat_policy=policy, gp_mode=gp_mode,
                             gp_every=gp_every)
    state = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)

    res = 4 * 2 ** (step - 1)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(batch, res, res, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 10, batch))
    alpha = jnp.float32(1.0)

    # lazy regularization runs a cycle of 1 GP step + (gp_every-1) plain
    # steps; time whole cycles so the number is the amortized rate
    fns = {gp: make_train_step(gcfg, dcfg, tc, step=step, fading=False,
                               apply_gp=gp)
           for gp in ({True, False} if gp_every > 1 else {True})}

    def cycle(state):
        for i in range(gp_every):
            state, m = fns[gp_every == 1 or i == 0](state, real, labels,
                                                    alpha)
        return state, m

    state, m = cycle(state)
    float(m["d_total"])
    state, m = cycle(state)
    float(m["d_total"])
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = cycle(state)
    float(m["d_total"])
    dt = (time.perf_counter() - t0) / (steps * gp_every)
    return batch / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--step", type=int, default=7, help="7 = 256px")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--policies", default="none,full,convs,d_only",
                   help="'none' = plain step (remat off) baseline")
    p.add_argument("--gp-mode", default="reverse",
                   choices=["reverse", "jvp"])
    p.add_argument("--gp-every", type=int, default=1,
                   help="lazy regularization interval; >1 times whole "
                        "GP cycles and reports the amortized img/s")
    args = p.parse_args()

    res = 4 * 2 ** (args.step - 1)
    for policy in args.policies.split(","):
        try:
            ips = bench(policy if policy != "none" else "full",
                        policy != "none", args.step, args.batch_size,
                        args.dtype, args.steps, gp_mode=args.gp_mode,
                        gp_every=args.gp_every)
            print(f"{res}px bs={args.batch_size} remat={policy} "
                  f"gp={args.gp_mode}x{args.gp_every}: {ips:.1f} img/s",
                  flush=True)
        except Exception as e:  # OOM etc. — record and continue
            print(f"{res}px bs={args.batch_size} remat={policy} "
                  f"gp={args.gp_mode}x{args.gp_every}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
