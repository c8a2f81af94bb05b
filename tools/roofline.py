"""HBM+FLOP roofline for the flagship 128px train step (VERDICT r3 #2b).

For each step variant, pulls XLA's compiled-executable cost analysis
(algebraic FLOPs + HBM bytes accessed) and compares the measured wall time
against BOTH hardware bounds:

    t_mxu  = flops / peak_flops          (compute bound)
    t_hbm  = bytes / hbm_bandwidth       (memory bound)
    attainable = max(t_mxu, t_hbm)       (roofline)

``pct_attainable = attainable / measured`` — how close the step runs to
the binding roof.  Prints a markdown table for benchmarks/README.md.

Usage:  python tools/roofline.py [--batch-size 32] [--steps 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e: bf16 197 TFLOP/s, HBM 819 GB/s (public spec)
PEAK_FLOPS = 197e12
HBM_BW = 819e9


def _cost(jitted, *args):
    c = jitted.lower(*args).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return c


def measure(fn, state, real, labels, alpha, steps):
    state2, m = fn(state, real, labels, alpha)
    float(m["d_total"])                       # axon relay: fetch = barrier
    t0 = time.perf_counter()
    s = state
    for _ in range(steps):
        s, m = fn(s, real, labels, alpha)
    float(m["d_total"])
    return (time.perf_counter() - t0) / steps


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from pgx.train import TrainConfig, init_train_state, make_train_step
    from pgx.utils.compile_cache import enable_compilation_cache

    try:
        enable_compilation_cache()
    except Exception:
        pass

    gcfg, dcfg = _flagship_configs(dtype=args.dtype)
    rng = np.random.RandomState(0)
    real = jnp.asarray(
        rng.randn(args.batch_size, 128, 128, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, gcfg.num_classes, args.batch_size))
    alpha = jnp.float32(1.0)

    variants = [
        ("reference-exact step (gp1)", dict(), dict()),
        ("no-GP step (the gp_every>1 filler)", dict(), dict(apply_gp=False)),
        ("fused_g step", dict(fused_g=True), dict()),
        ("jvp-GP step", dict(gp_mode="jvp"), dict()),
    ]

    rows = []
    for name, tc_kw, mk_kw in variants:
        tc = TrainConfig(**tc_kw)
        state = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)
        fn = make_train_step(gcfg, dcfg, tc, step=6, fading=False,
                             donate=False, **mk_kw)
        c = _cost(fn, state, real, labels, alpha)
        flops = float(c.get("flops", 0.0))
        byts = float(c.get("bytes accessed", 0.0))
        wall = measure(fn, state, real, labels, alpha, args.steps)
        t_mxu = flops / PEAK_FLOPS
        t_hbm = byts / HBM_BW
        attain = max(t_mxu, t_hbm)
        rows.append((name, flops, byts, t_mxu, t_hbm, wall,
                     attain / wall if wall else 0.0))
        extra = {k: v for k, v in c.items()
                 if "bytes" in k and k != "bytes accessed" and v}
        if extra:
            print(f"# {name}: extra byte counters: {extra}",
                  file=sys.stderr)

    print("| step variant | TFLOP | HBM GB | t_mxu ms | t_hbm ms | "
          "measured ms | % of attainable | binding roof |")
    print("|---|---|---|---|---|---|---|---|")
    for name, fl, by, tm, th, wall, pct in rows:
        roof = "MXU" if tm >= th else "HBM"
        print(f"| {name} | {fl / 1e12:.1f} | {by / 1e9:.1f} | "
              f"{tm * 1e3:.1f} | {th * 1e3:.1f} | {wall * 1e3:.1f} | "
              f"{100 * pct:.0f}% | {roof} |")


if __name__ == "__main__":
    main()
