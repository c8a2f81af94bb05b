"""Per-stage training-throughput harness (SURVEY.md section 7 item 11:
images/sec/chip per growth stage).

For each resolution stage of the flagship conditional 'proper' config,
times the full fused G+D WGAN-GP train step (fade and stabilize phases) and
prints a table plus one JSON summary line.

    python benchmarks/stage_throughput.py [--batch-size 32] [--steps 10]

Weak-scaling mode (``--weak-scaling``): fixes the per-device batch and
measures the full sharded train step over growing device-count meshes
(1, 2, 4, ... of the available devices).  On a real multi-chip slice this
is the ICI scaling bench; on CPU run it with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` (plus forcing the
cpu platform) to validate the mode functionally.

    python benchmarks/stage_throughput.py --weak-scaling --step 6
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
    p.add_argument("--steps-per-call", type=int, default=1,
                   help="time the scanned multi-step dispatch "
                        "(make_train_multi_step) instead of one jit call "
                        "per iteration — the small-stage host-overhead "
                        "amortization")
    p.add_argument("--weak-scaling", action="store_true",
                   help="fixed per-device batch over growing device meshes")
    p.add_argument("--step", type=int, default=6,
                   help="growth stage for --weak-scaling (default: 128px)")
    p.add_argument("--tiny", action="store_true",
                   help="small non-flagship config (functional validation "
                        "of --weak-scaling on CPU virtual devices)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from pgx.train import TrainConfig, init_train_state, make_train_step

    if args.steps_per_call % max(args.gp_every, 1):
        print(f"steps_per_call={args.steps_per_call} is not a multiple of "
              f"gp_every={args.gp_every}; falling back to single-step "
              f"dispatch", file=sys.stderr)
        args.steps_per_call = 1

    if args.weak_scaling:
        return weak_scaling(args)

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
            k = args.steps_per_call
            if k > 1:
                from pgx.train import make_train_multi_step
                mfn = make_train_multi_step(gcfg, dcfg, tc, step=step,
                                            fading=fading, k=k,
                                            donate=False)
                reals = (real,) * k
                labs = (labels,) * k
                alphas = jnp.full((k,), 0.5, jnp.float32)
                fn = lambda s: mfn(s, reals, labs, alphas)
            else:
                sfn = make_train_step(gcfg, dcfg, tc, step=step,
                                      fading=fading, donate=False)
                fn = lambda s: sfn(s, real, labels, alpha)
            state, m = fn(state0)
            float(m["d_total"])  # force compile + completion (axon relay)
            t0 = time.perf_counter()
            s = state0
            for _ in range(args.steps):
                s, m = fn(s)
            float(m["d_total"])
            dt = (time.perf_counter() - t0) / (args.steps * k)
            ips = args.batch_size / dt
            phase = "fade" if fading else "stable"
            rows.append({"step": step, "resolution": res, "phase": phase,
                         "ms_per_step": round(dt * 1e3, 1),
                         "images_per_sec": round(ips, 1)})
            print(f"step {step} ({res:>3}px, {phase:>6}): "
                  f"{dt * 1e3:7.1f} ms  {ips:8.1f} img/s", flush=True)

    print(json.dumps({"metric": "per_stage_images_per_sec",
                      "batch_size": args.batch_size, "dtype": args.dtype,
                      "gp_every": args.gp_every,
                      "steps_per_call": args.steps_per_call,
                      "stages": rows}))


def weak_scaling(args):
    """img/s and img/s/device at one stage, for meshes of 1, 2, 4, ...
    devices with a fixed per-device batch (``--batch-size``)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from pgx.parallel.mesh import make_mesh, replicate, shard_batch
    from pgx.train import TrainConfig, init_train_state, make_train_step

    if args.tiny:
        from pgx.models import zoo
        gcfg = zoo.conditional_correct_generator(
            z_dim=16, num_classes=4, channel=16, max_step=6,
            dtype=args.dtype)
        dcfg = zoo.conditional_correct_discriminator_wgangp(
            feat_dim=16, num_classes=4, max_step=6, dtype=args.dtype)
    else:
        gcfg, dcfg = _flagship_configs(dtype=args.dtype)
    tc = TrainConfig(gp_every=args.gp_every)
    step = min(args.step, gcfg.max_step)
    res = gcfg.resolution(step)
    devices = jax.devices()
    counts = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= len(devices)]

    rng = np.random.RandomState(0)
    rows = []
    for n in counts:
        mesh = make_mesh(devices[:n])
        global_batch = args.batch_size * n
        real = rng.randn(global_batch, res, res, 3).astype(np.float32)
        labels = rng.randint(0, gcfg.num_classes, global_batch)
        with mesh:
            state = replicate(
                mesh, init_train_state(jax.random.PRNGKey(0), gcfg, dcfg,
                                       tc))
            real_d, labels_d = shard_batch(mesh, real, jnp.asarray(labels))
            fn = make_train_step(gcfg, dcfg, tc, step=step, fading=False,
                                 donate=False)
            s, m = fn(state, real_d, labels_d, jnp.float32(1.0))
            float(m["d_total"])  # compile + completion barrier
            t0 = time.perf_counter()
            for _ in range(args.steps):
                s, m = fn(s, real_d, labels_d, jnp.float32(1.0))
            float(m["d_total"])
        dt = (time.perf_counter() - t0) / args.steps
        ips = global_batch / dt
        rows.append({"devices": n, "global_batch": global_batch,
                     "ms_per_step": round(dt * 1e3, 1),
                     "images_per_sec": round(ips, 1),
                     "images_per_sec_per_device": round(ips / n, 1)})
        print(f"{n:>3} device(s), batch {global_batch:>4}: "
              f"{dt * 1e3:7.1f} ms  {ips:8.1f} img/s  "
              f"({ips / n:7.1f} /device)", flush=True)

    eff = (rows[-1]["images_per_sec_per_device"]
           / rows[0]["images_per_sec_per_device"] if rows else 0.0)
    print(json.dumps({"metric": "weak_scaling_images_per_sec",
                      "stage": step, "resolution": res,
                      "per_device_batch": args.batch_size,
                      "dtype": args.dtype,
                      "scaling_efficiency": round(eff, 3), "rows": rows}))


if __name__ == "__main__":
    main()
