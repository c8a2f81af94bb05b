"""Headline benchmark: images/sec/chip for a full G+D WGAN-GP train step at
the 128x128 stage (BASELINE.md north-star), plus the DEFENSIBLE absolute
numbers — sustained TFLOP/s and MFU (XLA-cost-analysis FLOPs / wall /
chip peak).

Run bare (``python bench.py``, the driver invocation) it prints one JSON
line per configuration:
  1. FIRST, the reference-exact 128px iteration — the comparable series
     across rounds (metric ``images_per_sec_per_chip_128px_cond_gd_step``).
     Emitted first so the headline survives even if a bounded runner cuts
     the sweep short (each later configuration costs fresh XLA compiles;
     with a slow remote-compile tunnel the full sweep can take ~30 min),
  2. the production recipe (--gp-every 4 --fused-g --steps-per-call 8,
     the documented fast path; semantics differ from the reference's exact
     update order, see benchmarks/README.md),
  3. the per-stage growth curve — reference-exact iteration at every
     stage of the flagship config (8/16/32/64px) plus the grown 7-stage
     256px config at batch 16, each with its own MFU/TFLOPs.
With any explicit flag it benches exactly the requested configuration and
prints one line (``--per-stage`` sweeps the growth curve instead).

``vs_torch_cpu_reference`` compares against the PyTorch reference running
its own training iteration for the same workload on the hardware it
supports here (CPU; the reference has no TPU path) — a cross-hardware
ratio that mostly measures TPU-vs-one-CPU-core, kept only because it is
the only like-for-like reference measurement this box allows
(BASELINE_MEASURED.json, tools/measure_reference_baseline.py).  The
headline quality figure is ``mfu``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

# bf16 peak per chip, by device_kind substring (FLOP/s)
_PEAK_BF16 = [
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v5", 197e12),
    ("v6", 918e12), ("trillium", 918e12),
    ("v4", 275e12),
    ("v3", 123e12), ("v2", 45e12),
]


def _chip_peak_flops() -> float | None:
    env = os.environ.get("PGX_TPU_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    import jax
    kind = jax.devices()[0].device_kind.lower()
    for sub, peak in _PEAK_BF16:
        if sub in kind:
            return peak
    return None


def _flops_per_call(jitted, *args) -> float | None:
    """XLA cost-analysis FLOPs for one call of an already-jitted fn."""
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):   # older jax: one dict/device
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


def bench_train_step(batch_size: int, dtype: str, steps: int,
                     fading: bool = False, gp_every: int = 1,
                     ada: bool = False, gp_mode: str = "reverse",
                     steps_per_call: int = 1, fused_g: bool = False,
                     weights_cast: str = "site", step: int = 6,
                     configs=None, d_concat: bool = False):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_configs
    from pgx.train import (TrainConfig, init_train_state,
                           make_train_multi_step, make_train_step)

    gcfg, dcfg = configs if configs is not None else _flagship_configs(
        dtype=dtype)
    tc = TrainConfig(gp_every=gp_every, gp_mode=gp_mode, fused_g=fused_g,
                     weights_cast=weights_cast, d_concat=d_concat)
    aug_kwargs = {}
    if ada:
        from pgx.augment import AdaConfig, bgc_config
        aug_kwargs = dict(augment_cfg=bgc_config(), ada_cfg=AdaConfig())
    state = init_train_state(jax.random.PRNGKey(0), gcfg, dcfg, tc)

    res = gcfg.resolution(step)
    rng = np.random.RandomState(0)
    real = jnp.asarray(rng.randn(batch_size, res, res, 3).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, gcfg.num_classes, batch_size))
    alpha = jnp.float32(1.0)

    # per-image FLOPs, ALWAYS from the single-step executables (XLA cost
    # analysis counts a lax.scan body once, not k times, so the scanned
    # dispatch's own analysis under-reports by exactly k).  With
    # gp_every > 1 the cycle average weighs the two step variants.
    def _per_image_flops():
        f_gp = _flops_per_call(
            make_train_step(gcfg, dcfg, tc, step=step, fading=fading,
                            donate=False, **aug_kwargs),
            state, real, labels, alpha)
        if not f_gp:
            return None
        if gp_every > 1:
            f_no = _flops_per_call(
                make_train_step(gcfg, dcfg, tc, step=step, fading=fading,
                                apply_gp=False, donate=False, **aug_kwargs),
                state, real, labels, alpha)
            if not f_no:
                return None
            f_gp = (f_gp + (gp_every - 1) * f_no) / gp_every
        return f_gp / batch_size

    fpi = _per_image_flops()

    if steps_per_call > 1:
        # the scanned dispatch is the SAME iteration stream (lax.scan over
        # the single-step body; parity-locked in tests/test_train_step.py),
        # so the headline stays a reference-exact G+D step measurement —
        # with the per-call host overhead amortized as the shipped
        # --steps-per-call training path does
        k = steps_per_call
        mfn = make_train_multi_step(gcfg, dcfg, tc, step=step, fading=fading,
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
        return batch_size * k * nw / dt, metrics, fpi

    train_step = make_train_step(gcfg, dcfg, tc, step=step, fading=fading,
                                 **aug_kwargs)
    nogp_step = (make_train_step(gcfg, dcfg, tc, step=step, fading=fading,
                                 apply_gp=False, **aug_kwargs)
                 if gp_every > 1 else None)

    # compile + warmup.  NOTE: on the axon-relay TPU platform
    # block_until_ready() returns before remote execution completes; only a
    # host fetch forces completion, so we time N chained steps and fetch one
    # scalar at the end (the state dependency chain serializes the steps.)
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
    return batch_size * steps / dt, metrics, fpi


def _bench_line(args, *, gp_every, fused_g, ada, metric_suffix="",
                step=6, configs=None, batch_size=None, metric=None,
                include_vs_torch=True, extra_fields=None):
    batch_size = batch_size or args.batch_size
    ips, metrics, flops_per_image = bench_train_step(
        batch_size, args.dtype,
        max(args.steps, args.steps_per_call * 3),
        gp_every=gp_every, ada=ada, gp_mode=args.gp_mode,
        steps_per_call=args.steps_per_call, fused_g=fused_g,
        weights_cast=args.weights_cast, step=step, configs=configs,
        d_concat=getattr(args, "d_concat", False))

    vs = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    # the measured reference baseline is the plain (non-ADA) iteration at
    # the 128px flagship stage; an --ada run (or another stage) has no
    # comparable reference number, so the ratio stays null there
    if os.path.exists(baseline_path) and not ada and include_vs_torch:
        with open(baseline_path) as f:
            ref = json.load(f)
        ref_ips = ref.get("reference_images_per_sec")
        if ref_ips:
            vs = ips / ref_ips

    tflops = mfu = None
    if flops_per_image:
        tflops = flops_per_image * ips / 1e12
        peak = _chip_peak_flops()
        if peak:
            mfu = flops_per_image * ips / peak

    if metric is None:
        metric = "images_per_sec_per_chip_128px_cond_gd_step"
        if ada:
            metric += "_ada"
        if fused_g:
            metric += "_fused"
        metric += metric_suffix
    print(json.dumps({
        "metric": metric,
        "value": round(ips, 2),
        "unit": "img/s",
        # MFU is the defensible cross-hardware number (BASELINE.md): the
        # torch-CPU ratio below is TPU-chip-vs-one-CPU-core, labeled as such
        "mfu": round(mfu, 4) if mfu else None,
        "tflops_per_s": round(tflops, 1) if tflops else None,
        "vs_baseline": round(mfu, 4) if mfu else None,
        "vs_baseline_metric": "mfu (fraction of chip bf16 peak)",
        "vs_torch_cpu_reference": round(vs, 2) if vs else None,
        "steps_per_call": args.steps_per_call,
        "gp_every": gp_every,
        "fused_g": fused_g,
        "batch_size": batch_size,
        **(extra_fields or {}),
    }), flush=True)


def _stage_lines(args):
    """One JSON line per growth stage of the flagship config (8..64px;
    the 128px stage is the headline line emitted last), plus the grown
    7-stage 256px config (batch 16, matching benchmarks/README.md's stage
    table) — the reference-exact iteration at every stage, each with its
    own MFU/TFLOPs so the whole growth curve is regression-checkable
    round over round (VERDICT r4 next #3)."""
    from __graft_entry__ import _flagship_configs
    gcfg, dcfg = _flagship_configs(dtype=args.dtype)
    for step in range(2, 6):
        res = gcfg.resolution(step)
        _bench_line(
            args, gp_every=args.gp_every, fused_g=False, ada=False,
            step=step, configs=(gcfg, dcfg),
            metric=f"images_per_sec_per_chip_{res}px_cond_gd_step_stage",
            include_vs_torch=False,
            extra_fields={"stage": step, "stage_resolution": res})

    from pgx.models import zoo
    grown = zoo.conditional_correct_grown(7, dtype=args.dtype)
    _bench_line(
        args, gp_every=args.gp_every, fused_g=False, ada=False,
        step=7, configs=grown, batch_size=16,
        metric="images_per_sec_per_chip_256px_cond_gd_step_grown",
        include_vs_torch=False,
        extra_fields={"stage": 7, "stage_resolution": 256})


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
    p.add_argument("--weights-cast", default="site",
                   choices=["site", "once"],
                   help="per-conv scale+cast of the f32 masters (site) vs "
                        "one barrier'd bf16 copy per forward (once); "
                        "TrainConfig.weights_cast")
    p.add_argument("--steps-per-call", type=int, default=8,
                   help="iterations per device dispatch (lax.scan over the "
                        "identical single-step body; 1 = one jit call per "
                        "iteration)")
    p.add_argument("--d-concat", action="store_true",
                   help="batched-D dispatch: one 3B D pass over "
                        "concat([real, fake, x_hat]) with per-slice "
                        "minibatch stddev (TrainConfig.d_concat)")
    p.add_argument("--per-stage", action="store_true",
                   help="bench every growth stage (8..64px + grown 256px) "
                        "instead of only the 128px headline")
    default_invocation = len(sys.argv) == 1
    args = p.parse_args()
    try:
        # the cost-analysis passes compile the single-step variants besides
        # the scanned dispatch; persist the executables so repeat bench
        # runs (and driver rounds) skip straight to execution
        from pgx.utils.compile_cache import enable_compilation_cache
        enable_compilation_cache()
    except Exception:
        pass
    if args.steps_per_call % max(args.gp_every, 1):
        print(f"steps_per_call={args.steps_per_call} is not a multiple of "
              f"gp_every={args.gp_every}; falling back to single-step "
              f"dispatch", file=sys.stderr)
        args.steps_per_call = 1          # scan needs k % gp_every == 0

    if default_invocation:
        # headline (reference-exact 128px, the round-over-round comparable
        # series) FIRST so it survives a bounded runner; then the
        # production recipe; then the per-stage growth curve
        _bench_line(args, gp_every=args.gp_every, fused_g=args.fused_g,
                    ada=args.ada,
                    extra_fields={"stage": 6, "stage_resolution": 128})
        _bench_line(args, gp_every=4, fused_g=True, ada=False,
                    metric_suffix="_production_gp4")
        _stage_lines(args)
        return
    if args.per_stage:
        _stage_lines(args)
        return
    _bench_line(args, gp_every=args.gp_every, fused_g=args.fused_g,
                ada=args.ada,
                extra_fields={"stage": 6, "stage_resolution": 128})


if __name__ == "__main__":
    main()
