"""Serving/sampling throughput per growth stage.

Training benches live in stage_throughput.py; this measures the *deployed*
path — the jitted EMA-generator forward shared by the sample-grid writer,
``pgx.cli.generate`` and the FID sweep (``pgx.train.make_eval_generate``) —
as both batched throughput (images/sec, one chip) and single-request
latency (ms for a batch-1 call, host fetch included).

    python benchmarks/sampling_bench.py [--batch-size 64] [--steps 20]

Timing methodology (same caveat as bench.py): the axon TPU relay's
``block_until_ready`` returns before remote execution completes, so the
throughput loop chains K dispatches and ends with a host fetch; latency
timings fetch every call.
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
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--steps", type=int, default=20,
                   help="timed generate calls per stage")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--output", default="float", choices=["float", "uint8"],
                   help="generator output dtype; 'uint8' quantizes on "
                        "device (the serving default — 4x smaller fetches)")
    p.add_argument("--fetch-every-call", action="store_true",
                   help="serving pattern: fetch the images of EVERY batch "
                        "to host (a server must), instead of chained "
                        "dispatches with one terminal fetch")
    p.add_argument("--service", action="store_true",
                   help="measure through GeneratorService (dispatch/fetch "
                        "pipeline + dynamic batching) instead of raw fn "
                        "calls; implies fetching every batch")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from pgx.models.generator import init_generator
    from pgx.train import make_eval_generate

    gcfg, _ = _flagship_configs(dtype=args.dtype)
    params = init_generator(jax.random.PRNGKey(0), gcfg)
    rng = np.random.RandomState(0)
    labels = jnp.asarray(rng.randint(0, gcfg.num_classes, args.batch_size))
    lab1 = labels[:1]

    rows = []
    for step in range(1, gcfg.max_step + 1):
        res = gcfg.resolution(step)
        fn = make_eval_generate(gcfg, step=step, fading=False,
                                output=args.output)
        z = jnp.asarray(rng.randn(args.batch_size, gcfg.z_dim)
                        .astype(np.float32))
        z1 = z[:1]

        if args.service:
            # the real serving stack: batcher dispatch + pipelined fetch.
            # Stream K batch-sized requests, then drain all futures.
            from pgx.serve import GeneratorService
            svc = GeneratorService.from_params(
                gcfg, params, step=step, max_batch=args.batch_size,
                max_wait_ms=0.5, output=args.output)
            znp = np.asarray(z)
            labnp = np.asarray(labels)

            def chain(k):
                futs = [svc.submit(znp, labnp) for _ in range(k)]
                for f in futs:
                    f.result(timeout=600)
        elif args.fetch_every_call:
            # serving pattern: every batch's images come back to host
            def chain(k):
                for _ in range(k):
                    np.asarray(fn(params, z, labels))
        else:
            # throughput ceiling: chained dispatches, one terminal host
            # fetch; median of 3 trials after a chained warmup (the chain
            # expression itself compiles on first use)
            def chain(k):
                zz = z
                for _ in range(k):
                    out = fn(params, zz, labels)
                    # data-dependent chain so dispatches cannot collapse
                    zz = z + 0.0 * jnp.mean(out[:1].astype(jnp.float32))
                float(jnp.mean(out[:1].astype(jnp.float32)))

        chain(2)  # compile + completion (generate AND the chain graph)
        dts = []
        for _ in range(3):
            t0 = time.perf_counter()
            chain(args.steps)
            dts.append((time.perf_counter() - t0) / args.steps)
        ips = args.batch_size / float(np.median(dts))
        if args.service:
            svc.close()

        # latency: batch-1 request, host fetch each call
        out1 = np.asarray(fn(params, z1, lab1))
        lats = []
        for _ in range(args.steps):
            t0 = time.perf_counter()
            out1 = np.asarray(fn(params, z1, lab1))
            lats.append(time.perf_counter() - t0)
        lat_ms = 1e3 * float(np.median(lats))
        assert np.isfinite(out1).all()

        rows.append({"step": step, "res": res, "img_per_sec": round(ips, 1),
                     "batch1_latency_ms": round(lat_ms, 2)})
        print(f"stage {step} ({res}px): {ips:8.1f} img/s "
              f"(batch {args.batch_size}) | batch-1 latency {lat_ms:.2f} ms",
              flush=True)

    print(json.dumps({"metric": "sampling_throughput_per_stage",
                      "batch_size": args.batch_size, "dtype": args.dtype,
                      "output": args.output,
                      "fetch_every_call": args.fetch_every_call,
                      "service": args.service,
                      "rows": rows}))


if __name__ == "__main__":
    main()
