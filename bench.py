"""Headline benchmark: images/sec/chip for a full G+D WGAN-GP train step at
the 128x128 stage (BASELINE.md north-star).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

``vs_baseline`` compares against the PyTorch reference running its own
training iteration for the same workload on the hardware it supports here
(CPU; the reference has no TPU path).  The reference-side measurement is
cached in BASELINE_MEASURED.json by tools/measure_reference_baseline.py; if
absent, vs_baseline is null.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def bench_train_step(batch_size: int, dtype: str, steps: int,
                     fading: bool = False, gp_every: int = 1,
                     ada: bool = False, gp_mode: str = "reverse",
                     steps_per_call: int = 1, fused_g: bool = False):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from pgx.train import (TrainConfig, init_train_state,
                           make_train_multi_step, make_train_step)

    gcfg, dcfg = _flagship_configs(dtype=dtype)
    tc = TrainConfig(gp_every=gp_every, gp_mode=gp_mode, fused_g=fused_g)
    aug_kwargs = {}
    if ada:
        from pgx.augment import AdaConfig, bgc_config
        aug_kwargs = dict(augment_cfg=bgc_config(), ada_cfg=AdaConfig())
    state = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)

    res = 128
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(batch_size, res, res, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, gcfg.num_classes, batch_size))
    alpha = jnp.float32(1.0)

    if steps_per_call > 1:
        # the scanned dispatch is the SAME iteration stream (lax.scan over
        # the single-step body; parity-locked in tests/test_train_step.py),
        # so the headline stays a reference-exact G+D step measurement —
        # with the per-call host overhead amortized as the shipped
        # --steps-per-call training path does
        k = steps_per_call
        mfn = make_train_multi_step(gcfg, dcfg, tc, step=6, fading=fading,
                                    k=k, **aug_kwargs)
        reals, labs = (real,) * k, (labels,) * k
        alphas = jnp.ones((k,), jnp.float32)
        state, metrics = mfn(state, reals, labs, alphas)
        float(metrics["d_total"])
        nw = max(1, steps // k)
        t0 = time.perf_counter()
        for _ in range(nw):
            state, metrics = mfn(state, reals, labs, alphas)
        float(metrics["d_total"])
        dt = time.perf_counter() - t0
        return batch_size * k * nw / dt, metrics

    train_step = make_train_step(gcfg, dcfg, tc, step=6, fading=fading,
                                 **aug_kwargs)
    nogp_step = (make_train_step(gcfg, dcfg, tc, step=6, fading=fading,
                                 apply_gp=False, **aug_kwargs)
                 if gp_every > 1 else None)

    # compile + warmup.  NOTE: on the axon-relay TPU platform
    # block_until_ready() returns before remote execution completes; only a
    # host fetch forces completion, so we time N chained steps and fetch one
    # scalar at the end (the state dependency chain serializes the steps).
    state, metrics = train_step(state, real, labels, alpha)
    float(metrics["d_total"])
    for _ in range(2):
        state, metrics = train_step(state, real, labels, alpha)
    float(metrics["d_total"])

    if nogp_step is not None:
        state, metrics = nogp_step(state, real, labels, alpha)
        float(metrics["d_total"])

    t0 = time.perf_counter()
    for i in range(steps):
        fn = (train_step if (nogp_step is None or i % gp_every == 0)
              else nogp_step)
        state, metrics = fn(state, real, labels, alpha)
    float(metrics["d_total"])
    dt = time.perf_counter() - t0
    return batch_size * steps / dt, metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--dtype", default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--gp-every", type=int, default=1,
                   help="lazy GP interval (1 = reference-exact)")
    p.add_argument("--ada", action="store_true",
                   help="bench with the full ADA pipeline (bgc policy, "
                        "adaptive controller) wired into the step")
    p.add_argument("--gp-mode", default="reverse",
                   choices=["reverse", "jvp"],
                   help="GP gradient structure (TrainConfig.gp_mode)")
    p.add_argument("--fused-g", action="store_true",
                   help="FusedProp simultaneous update "
                        "(TrainConfig.fused_g; changes G-step semantics)")
    p.add_argument("--steps-per-call", type=int, default=8,
                   help="iterations per device dispatch (lax.scan over the "
                        "identical single-step body; 1 = one jit call per "
                        "iteration)")
    args = p.parse_args()
    if args.steps_per_call % max(args.gp_every, 1):
        import sys
        print(f"steps_per_call={args.steps_per_call} is not a multiple of "
              f"gp_every={args.gp_every}; falling back to single-step "
              f"dispatch", file=sys.stderr)
        args.steps_per_call = 1          # scan needs k % gp_every == 0

    ips, metrics = bench_train_step(args.batch_size, args.dtype,
                                    max(args.steps, args.steps_per_call * 3),
                                    gp_every=args.gp_every, ada=args.ada,
                                    gp_mode=args.gp_mode,
                                    steps_per_call=args.steps_per_call,
                                    fused_g=args.fused_g)

    vs = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    # the measured reference baseline is the plain (non-ADA) iteration;
    # an --ada run has no comparable reference number (the reference never
    # wired its pipeline in), so vs_baseline stays null there
    if os.path.exists(baseline_path) and not args.ada:
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_ips = ref.get("reference_images_per_sec")
        if ref_ips:
            vs = ips / ref_ips

    metric = "images_per_sec_per_chip_128px_cond_gd_step"
    if args.ada:
        metric += "_ada"
    if args.fused_g:
        metric += "_fused"
    print(json.dumps({
        "metric": metric,
        "value": round(ips, 2),
        "unit": "img/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "steps_per_call": args.steps_per_call,
    }))


if __name__ == "__main__":
    main()
