"""The host-side training loop.

Orchestrates: growth schedule -> per-stage jitted train steps (cached per
(step, fading, update_g)) -> prefetched data -> periodic sample grids,
checkpoints, and CSV/console logging — mirroring the reference loop protocol
(SURVEY.md section 2.3) with full-state resume the reference lacks.

Design notes (TPU):
* one compiled graph per (stage, fade-phase); alpha is traced, so a stage
  compiles at most twice and never retraces as alpha anneals.
* metric accumulation stays on device between log points (no per-iteration
  host sync); the only host work in steady state is the numpy batch prep,
  which the DevicePrefetcher overlaps with the device step.
"""

from __future__ import annotations

import dataclasses
import datetime
import json
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from pgx import checkpoint as ckpt
from pgx.data.pipeline import DevicePrefetcher, array_batches
from pgx.models.config import DiscriminatorConfig, GeneratorConfig
from pgx.parallel import make_mesh_for_batch, replicate
from pgx.train.wgan import (TrainConfig, init_train_state,
                            make_eval_generate, make_train_multi_step,
                            make_train_step)
from pgx.utils.png import save_image_grid


@dataclasses.dataclass
class LoopConfig:
    trial_name: str = "trial"
    main_path: str = "."
    batch_size: int = 4
    sample_every: int = 1000
    checkpoint_every: int = 10000
    log_every: int = 500
    seed: int = 0
    total_iterations: Optional[int] = None
    tail_iterations: int = 0          # mnist_train.py:88-90 final-res tail
    sample_rows: int = 5
    sample_cols: int = 10
    keep_full_state: bool = True
    checkpoint_backend: str = "npz"   # "npz" (msgpack full state) | "orbax"
                                      # (async step-indexed full state)
    fid_every: int = 0              # in-training quality gate: FID of the
                                    # EMA generator every N iterations,
                                    # appended to the trial's
                                    # fid_score.json (0 = off; the
                                    # reference only scores post-hoc)
    fid_samples: int = 1024
    inception_weights: Optional[str] = None
    use_mesh: bool = True
    steps_per_call: int = 1         # roll N iterations into one lax.scan
                                    # dispatch (make_train_multi_step) —
                                    # amortizes host overhead at the small
                                    # early stages; 1 == one jit call per
                                    # iteration (reference cadence);
                                    # 0 == auto: time a few single steps at
                                    # each stage start and pick the window
                                    # (16 for dispatch-bound stages, 8 for
                                    # borderline, 1 once device-bound,
                                    # always capped so one window stays
                                    # well under a SIGTERM grace period).
                                    # NOTE: a dispatched window cannot be
                                    # interrupted — on SIGTERM the emergency
                                    # checkpoint lands after the in-flight
                                    # window drains, so an explicit large N
                                    # needs a kill grace period covering
                                    # N x the per-step time
    model_parallel: int = 1         # model-axis shards (pgx/parallel/tp.py)
    model_parallel_mode: str = "channels"   # "channels" (TP) | "spatial"
    verbose: bool = True
    snapshot_sources: bool = True   # train.py:87-89 source snapshot


def make_trial_dir(loop_cfg: LoopConfig) -> Tuple[str, str]:
    """trial_{name}_{date}_{hour}_{minute} layout (train.py:78-89)."""
    now = datetime.datetime.now()
    postfix = f"{loop_cfg.trial_name}_{now.date()}_{now.hour}_{now.minute}"
    trial_dir = os.path.join(loop_cfg.main_path, f"trial_{postfix}")
    os.makedirs(os.path.join(trial_dir, "checkpoint"), exist_ok=True)
    os.makedirs(os.path.join(trial_dir, "sample"), exist_ok=True)
    return trial_dir, postfix


def _sample_grid_inputs(gcfg: GeneratorConfig, loop_cfg: LoopConfig,
                        rng: np.random.RandomState):
    if gcfg.conditioning != "none":
        c = gcfg.num_classes
        labels = np.repeat(np.arange(c), c)     # C rows, one class per row
        z = rng.randn(c * c, gcfg.z_dim).astype(np.float32)
        return z, labels, c
    n = loop_cfg.sample_rows * loop_cfg.sample_cols
    z = rng.randn(n, gcfg.z_dim).astype(np.float32)
    return z, None, loop_cfg.sample_cols


def _scan_window(i: int, st, schedule, total: int, tc: TrainConfig,
                 loop_cfg: LoopConfig, k: int) -> int:
    """How many iterations starting at ``i`` can run as one scanned
    dispatch: the full ``k``, or 1 (single-step fallback).  A window must
    not cross a sample/checkpoint/log boundary (events fire at the window
    end, exactly like the single-step cadence), must stay inside one
    (stage, fade-phase, resolution), must start gp_every-aligned, and must
    not overrun ``total``."""
    if i % tc.gp_every != 0 or k % tc.gp_every != 0 or i + k > total:
        return 1
    events = [loop_cfg.sample_every, loop_cfg.checkpoint_every,
              loop_cfg.log_every]
    if loop_cfg.fid_every > 0:
        events.append(loop_cfg.fid_every)
    for every in events:
        # next event strictly inside (i, i+k) -> can't fuse past it
        if ((i // every) + 1) * every < i + k:
            return 1
    for j in range(1, k):
        s2 = schedule.state_at(i + j)
        if ((s2.step, s2.fading, s2.resolution)
                != (st.step, st.fading, st.resolution)):
            return 1
    return k


def _load_newest_state(trial_dir: str, state):
    """Restore the NEWEST full-state source in ``trial_dir`` into ``state``
    and return ``(state, start_iter)``.

    A trial may hold both orbax and msgpack state (e.g. trained with the
    orbax backend, then resumed with the default npz backend); blindly
    preferring one would silently roll training back to a stale iteration.
    Falls back to model-only resume (reference semantics: EMA ckpt loaded
    into both G and g_running, mnist_train.py:312-314).
    """
    from pgx.checkpoint.orbax_backend import has_orbax_state
    state_files = sorted(
        (f for f in os.listdir(os.path.join(trial_dir, "checkpoint"))
         if f.endswith("_state.msgpack")),
        key=lambda n: int(n.split("_")[0]))
    msgpack_it = int(state_files[-1].split("_")[0]) if state_files else -1
    store, orbax_it = None, -1
    try:
        if has_orbax_state(trial_dir):
            from pgx.checkpoint.orbax_backend import OrbaxStateStore
            store = OrbaxStateStore(trial_dir, async_save=False)
            orbax_it = store.latest_iteration() or -1
        if orbax_it >= 0 and orbax_it >= msgpack_it:
            state = store.restore(orbax_it, jax.device_get(state))
            return state, int(state["iteration"])
    finally:
        if store is not None:
            store.close()
    if state_files:
        path = os.path.join(trial_dir, "checkpoint", state_files[-1])
        state = ckpt.load_state(path, state)
        return state, int(state["iteration"])
    gpath = ckpt.latest_checkpoint(trial_dir, "g")
    dpath = ckpt.latest_checkpoint(trial_dir, "d")
    if gpath is None:
        raise FileNotFoundError(f"no checkpoints in {trial_dir}")
    g = ckpt.load_params(gpath)
    state["g"], state["g_ema"] = g, jax.tree.map(jnp.copy, g)
    state["d"] = ckpt.load_params(dpath)
    start_iter = ckpt.checkpoint_iteration(gpath)
    state["iteration"] = jnp.asarray(start_iter, jnp.int32)
    return state, start_iter


def _augment_recipe(augment_cfg, ada_cfg, augment_p):
    """JSON form of the run's augmentation settings, saved in the trial
    config so the full recipe is machine-readable (A/B legs distinguish
    by artifact, not directory naming) and resume can warn on drift."""
    if augment_cfg is None:
        return None
    rec: Dict[str, Any] = {"pipe": dataclasses.asdict(augment_cfg),
                           "mode": ("adaptive" if ada_cfg is not None
                                    else "fixed")}
    if ada_cfg is not None:
        rec["ada"] = dataclasses.asdict(ada_cfg)
    else:
        rec["p"] = float(augment_p)
    return rec


def train_loop(gcfg: GeneratorConfig, dcfg: DiscriminatorConfig,
               tc: TrainConfig, schedule, dataset, loop_cfg: LoopConfig,
               resume_dir: Optional[str] = None,
               batch_fn: Callable = array_batches,
               augment_cfg=None, ada_cfg=None, augment_p: float = 1.0,
               hooks: Optional[Dict[str, Callable]] = None) -> str:
    """Run training; returns the trial directory path.  ``augment_cfg`` /
    ``ada_cfg`` enable the on-device ADA pipeline + adaptive-p controller."""
    hooks = hooks or {}
    aug_recipe = _augment_recipe(augment_cfg, ada_cfg, augment_p)

    # Reference semantics: resume reloads the trial's config JSON and trains
    # THAT architecture AND growth schedule (load_saved_config,
    # proper_cifar_train.py:55-69) — the CLI's args may drift (a grown
    # checkpoint's channel plan, a forgotten --stage-batches).  Resolved up
    # front because mesh sizing below derives from the schedule's per-stage
    # batches.  Multi-host: only process 0 reads the filesystem (the trial
    # dir may not exist elsewhere); the result is broadcast so every process
    # compiles the same architecture.
    if resume_dir is not None:
        from pgx.parallel.distributed import broadcast_obj
        from pgx.train.schedule import schedule_from_dict, schedule_to_dict
        saved = saved_sched = None
        saved_aug = "missing"
        if jax.process_index() == 0:
            try:
                cfg_json = ckpt.load_config(resume_dir.rstrip("/"))
                saved = ckpt.configs_from_dict(cfg_json)
                saved_sched = cfg_json.get("schedule")
                saved_aug = cfg_json.get("augment", "missing")
            except (FileNotFoundError, KeyError, TypeError):
                saved = saved_sched = None
        saved, saved_sched, saved_aug = broadcast_obj(
            (saved, saved_sched, saved_aug)
            if jax.process_index() == 0 else None)
        # augmentation is NOT auto-restored (it comes from CLI flags, not
        # the model configs) — but silently continuing an ADA trial
        # augmentation-free (or vice versa) corrupts the run's recipe, so
        # drift against the saved recipe warns loudly (ADVICE r4).
        # Compare through a JSON round trip: the saved side came back from
        # disk with tuples as lists, and that representation difference is
        # not drift.
        aug_json = json.loads(json.dumps(aug_recipe))
        if saved_aug != "missing" and saved_aug != aug_json:
            import warnings
            warnings.warn(
                f"resume: augmentation settings differ from the trial's "
                f"saved recipe — saved {saved_aug!r}, configured "
                f"{aug_recipe!r}.  The CONFIGURED settings apply; re-pass "
                f"the original --ada/--ada-p/--ada-warp flags to continue "
                f"the recorded recipe", RuntimeWarning)
        if saved is not None and (saved[0] != gcfg or saved[1] != dcfg):
            import warnings
            warnings.warn(
                "resume: model configs in the trial's train_config JSON "
                "differ from the configured ones; using the saved configs "
                "(reference resume semantics)", RuntimeWarning)
            gcfg, dcfg = saved[0], saved[1]
        if (saved_sched is not None
                and schedule_to_dict(schedule) != saved_sched):
            import warnings
            warnings.warn(
                "resume: growth schedule in the trial's train_config JSON "
                "differs from the configured one; using the saved schedule "
                "— otherwise the resumed iteration would map to a "
                "different (step, alpha, batch)", RuntimeWarning)
            # the saved schedule governs the (step, alpha) mapping, but
            # the CALLER still chooses how long to train (the reference
            # resume's additional_iterations, mnist_train.py:61): keep the
            # run length the drifted schedule implied
            if loop_cfg.total_iterations is None:
                loop_cfg = dataclasses.replace(
                    loop_cfg, total_iterations=schedule.total_iterations(
                        loop_cfg.tail_iterations))
            schedule = schedule_from_dict(saved_sched)

    # per-stage batch sizes (ProperSchedule.stage_batches): the schedule
    # prescribes the data batch for each growth stage; unlisted stages (and
    # schedules without the capability) use loop_cfg.batch_size.  The mesh
    # must evenly shard EVERY stage's batch, so it is sized for their gcd.
    _batch_hook = getattr(schedule, "batch_for_step", None)

    def stage_batch_for(step: int) -> int:
        b = _batch_hook(step) if _batch_hook is not None else None
        return int(b) if b else loop_cfg.batch_size

    import math
    stage_batches = sorted({
        stage_batch_for(s)
        for s in range(getattr(schedule, "init_step", 1),
                       getattr(schedule, "max_step", 1) + 1)})
    mesh_batch = stage_batches[0]
    for b in stage_batches[1:]:
        mesh_batch = math.gcd(mesh_batch, b)

    if not loop_cfg.use_mesh:
        mesh = None
        if loop_cfg.model_parallel > 1:
            raise ValueError("model_parallel requires use_mesh=True")
    elif loop_cfg.model_parallel > 1:
        if loop_cfg.model_parallel_mode not in ("channels", "spatial"):
            raise ValueError(
                f"unknown model_parallel_mode "
                f"{loop_cfg.model_parallel_mode!r} (channels|spatial)")
        from pgx.parallel.tp import make_mesh_2d_for_batch
        mesh = make_mesh_2d_for_batch(mesh_batch,
                                      loop_cfg.model_parallel)
    else:
        mesh = make_mesh_for_batch(mesh_batch)

    # multi-host (DCN): loop_cfg.batch_size is the GLOBAL batch; each
    # process assembles its slice (distinct data via a per-host seed
    # offset), only process 0 touches the filesystem, and every process
    # enters every jitted computation (SPMD requirement).  Call
    # pgx.parallel.initialize_multihost before train_loop to enable.
    n_hosts = jax.process_count()
    is_main = jax.process_index() == 0
    host_seed = loop_cfg.seed
    if n_hosts > 1:
        if mesh is None:
            raise ValueError("multi-host training requires use_mesh=True")
        host_seed = loop_cfg.seed + 104729 * jax.process_index()
        # fail at launch, not hours in when the offending stage begins:
        # every per-stage global batch must split evenly across hosts
        for b in stage_batches:
            if b % n_hosts:
                raise ValueError(
                    f"per-stage batch {b} is not divisible by {n_hosts} "
                    f"hosts (stage batches: {stage_batches})")

    def host_batch_for(global_batch: int) -> int:
        """This process's share of a (per-stage) global batch."""
        if n_hosts > 1:
            from pgx.parallel.distributed import host_batch_slice
            return host_batch_slice(global_batch)[0]
        return global_batch

    key = jax.random.PRNGKey(loop_cfg.seed)
    state = init_train_state(key, gcfg, dcfg, tc)
    start_iter = 0

    orbax_store = None
    use_orbax = loop_cfg.checkpoint_backend == "orbax"

    def needs_cross_host_gather(tree):
        """True iff any leaf is sharded across processes (multi-host model
        parallelism).  Sharding is identical on every process, so all
        processes agree — safe to branch collectives on."""
        return any(
            isinstance(a, jax.Array) and not a.is_fully_addressable
            and not a.is_fully_replicated for a in jax.tree.leaves(tree))

    def host_copy(tree):
        """Device -> host copy of a state pytree.  Leaves sharded across
        *processes* (multi-host model parallelism) need a cross-host
        gather, so every process must enter this together; replicated and
        locally-sharded leaves are plain device_get."""
        def fetch(a):
            if (isinstance(a, jax.Array) and not a.is_fully_addressable
                    and not a.is_fully_replicated):
                from jax.experimental import multihost_utils
                return np.asarray(multihost_utils.process_allgather(
                    a, tiled=True))
            return jax.device_get(a)
        return jax.tree.map(fetch, tree)

    def save_full(it, current_state):
        """One checkpoint write (periodic / interrupt / final): the
        reference-format {iter}_g/_d.model param files always; the full
        train state via the configured backend.  Collective when the state
        is sharded across hosts (see host_copy) — call from EVERY process;
        only process 0 writes."""
        nonlocal orbax_store
        if not is_main and not needs_cross_host_gather(current_state):
            return  # replicated case: nothing for non-main to contribute
        host_state = host_copy(current_state)
        if not is_main:
            return
        ckpt.save_checkpoint(trial_dir, it, host_state,
                             full_state=loop_cfg.keep_full_state
                             and not use_orbax)
        if use_orbax and loop_cfg.keep_full_state:
            if orbax_store is None:
                from pgx.checkpoint.orbax_backend import OrbaxStateStore
                orbax_store = OrbaxStateStore(trial_dir)
            orbax_store.save(it, host_state)

    if resume_dir is not None:
        trial_dir = resume_dir.rstrip("/")
        base = os.path.basename(trial_dir)
        # strip the conventional prefix only when present: a renamed/copied
        # resume dir must not get its name mangled (the postfix names the
        # CSV log this run appends to)
        postfix = base[len("trial_"):] if base.startswith("trial_") else base
        if is_main:  # a grown/imported trial dir may lack the subdirs
            os.makedirs(os.path.join(trial_dir, "sample"), exist_ok=True)
            os.makedirs(os.path.join(trial_dir, "checkpoint"), exist_ok=True)
        # (gcfg/dcfg/schedule were already resolved from the trial's saved
        # config at the top of train_loop, before mesh sizing.)
        from pgx.parallel.distributed import broadcast_obj, broadcast_state
        # Broadcast the load OUTCOME before the state collectives: if the
        # restore fails on process 0 only (e.g. a resume dir with no
        # checkpoints), every host must raise the same error — otherwise
        # non-main hosts hang in broadcast_state until the DCN timeout.
        load_err = None
        if is_main:
            try:
                state, start_iter = _load_newest_state(trial_dir, state)
            except Exception as e:  # re-raised on every host below
                load_err = f"{type(e).__name__}: {e}"
        load_err, start_iter = broadcast_obj(
            (load_err, start_iter) if is_main else None)
        if load_err is not None:
            raise RuntimeError(
                f"resume failed on process 0: {load_err} (trial dir: "
                f"{trial_dir})")
        state = broadcast_state(state)
    elif is_main:
        trial_dir, postfix = make_trial_dir(loop_cfg)
        from pgx.train.schedule import schedule_to_dict
        ckpt.save_config(trial_dir, gcfg, dcfg, tc,
                         extra={"batch_size": loop_cfg.batch_size,
                                "seed": loop_cfg.seed,
                                "schedule": schedule_to_dict(schedule),
                                # full run recipe incl. augmentation —
                                # None for augmentation-free runs, so
                                # drift is detectable either way
                                "augment": aug_recipe},
                         postfix=postfix)
        if loop_cfg.snapshot_sources:
            from pgx.utils.persistence import snapshot_sources
            snapshot_sources(trial_dir)
    else:
        # non-main hosts never write; keep a name for return value symmetry
        trial_dir = os.path.join(loop_cfg.main_path,
                                 f"trial_{loop_cfg.trial_name}_host"
                                 f"{jax.process_index()}")
        postfix = loop_cfg.trial_name

    log_path = os.path.join(trial_dir, f"train_log_{postfix}.txt")
    log_ada = augment_cfg is not None
    if is_main and not os.path.exists(log_path):
        with open(log_path, "w") as f:
            f.write("iter,g,d,grad,alpha"
                    + (",ada_p,ada_r" if log_ada else "") + "\n")

    if mesh is not None:
        if (loop_cfg.model_parallel > 1
                and loop_cfg.model_parallel_mode == "channels"):
            from pgx.parallel.tp import shard_state
            state = shard_state(mesh, state)
        else:
            state = replicate(mesh, state)

    total = (loop_cfg.total_iterations
             if loop_cfg.total_iterations is not None
             else schedule.total_iterations(loop_cfg.tail_iterations))

    step_cache: Dict[Any, Callable] = {}
    gen_cache: Dict[Any, Callable] = {}
    sample_rng = np.random.RandomState(loop_cfg.seed + 1)
    sample_z, sample_labels, sample_nrow = _sample_grid_inputs(
        gcfg, loop_cfg, sample_rng)

    # in-training FID works multihost too: the metric pass itself is a
    # process-0-local computation over a HOST copy of the EMA params — no
    # other process enters its jits.  Non-main processes only participate
    # in the collective EMA gather when the state is sharded across hosts
    # (model parallelism); with replicated params they skip the tick
    # entirely and the usual async-dispatch headroom absorbs process 0's
    # scoring time.  The real baseline is process 0's host slice of the
    # dataset (deterministic; entries are marked in-training and re-scored
    # by any post-hoc sweep anyway).
    fid_hook = None
    # the folder/wikiart gate is evaluated on EVERY process (same dataset
    # type everywhere) so the per-tick collective-gather branch below is
    # SPMD-consistent
    fid_ticks = loop_cfg.fid_every > 0 and hasattr(dataset, "at_resolution")
    if loop_cfg.fid_every > 0 and not fid_ticks and is_main:
        import warnings
        warnings.warn("in-training FID needs an array-backed dataset with "
                      "per-resolution caches; for folder/WikiArt pipelines "
                      "run pgx.cli.fid_sweep post-hoc", RuntimeWarning)
    if fid_ticks and is_main:
        from pgx.eval.sweep import TrainingFid
        extractor = None
        if loop_cfg.inception_weights:
            from pgx.eval.fid import make_extractor
            from pgx.eval.inception import load_torch_weights
            extractor = make_extractor(
                load_torch_weights(loop_cfg.inception_weights))
        fid_hook = TrainingFid(dataset, gcfg,
                               num_samples=loop_cfg.fid_samples,
                               extractor=extractor,
                               seed=loop_cfg.seed,
                               gen_cache=gen_cache if n_hosts == 1
                               else None)

    prefetcher = None
    current_res = None
    sums: Dict[str, Any] = {}
    count = 0
    img_count = 0
    gp_count = 0
    cur_batch = loop_cfg.batch_size
    t_log = time.time()
    # machine-readable wall-clock artifact (ADVICE r4: logs carried no
    # timestamps, so throughput claims weren't checkable): per log tick,
    # cumulative seconds since this run started + window img/s.  Appends
    # across resumes (prior runs' entries are kept; elapsed_s restarts).
    run_t0 = time.time()
    timing_path = os.path.join(trial_dir, "timing.json")
    timing: Dict[str, Any] = {}
    if is_main and os.path.exists(timing_path):
        try:
            with open(timing_path) as f:
                timing = json.load(f)
        except (OSError, ValueError):
            timing = {}

    conditional = gcfg.conditioning != "none"
    auto_scan = loop_cfg.steps_per_call == 0
    scan_k = max(1, int(loop_cfg.steps_per_call))
    if scan_k > 1 and scan_k % tc.gp_every != 0:
        # _scan_window only fuses gp_every-aligned windows; a misaligned
        # request would silently degrade to single-step dispatch forever.
        # Round to the nearest multiple so the feature still engages.
        adj = max(tc.gp_every, round(scan_k / tc.gp_every) * tc.gp_every)
        print(f"steps_per_call={scan_k} is not a multiple of "
              f"gp_every={tc.gp_every}; using {adj}")
        scan_k = adj
    can_scan = ((scan_k > 1 or auto_scan) and tc.n_critic == 1
                and "on_iteration" not in hooks)
    stage_k: Dict[int, int] = {}    # auto mode: chosen window per stage
    measure: list = []              # auto mode: single-step ms samples

    def _auto_k(ms: float) -> int:
        """Window for a measured single-step time: dispatch overhead is
        ~2-3 ms/step (benchmarks/README.md 'Scanned multi-step dispatch'),
        so scanning pays big below ~20 ms, modestly below ~60, and only
        compile time above.  The window is additionally capped so one
        uninterruptible dispatch stays under ~5 s of device time: the
        SIGTERM emergency checkpoint can only land after the in-flight
        window drains, and it must beat the orchestrator's SIGKILL."""
        base = 16 if ms < 20.0 else (8 if ms < 60.0 else 1)
        if base == 1:
            return 1
        base = min(base, max(1, int(5000.0 / max(ms, 1e-3))))
        return max(tc.gp_every * max(1, base // tc.gp_every), 1)

    # TPU-pod preemption / managed-job shutdown arrives as SIGTERM, not
    # KeyboardInterrupt: route it through the same emergency-checkpoint
    # unwind so a preempted run is resumable at the exact iteration it
    # stopped (signal handlers only install from the main thread — tests
    # and embedded uses off-thread keep default delivery)
    import signal
    import threading as _threading
    sigterm_installed = False
    prev_sigterm = None
    sigterm_hit = False
    if _threading.current_thread() is _threading.main_thread():
        def _on_sigterm(signum, frame):
            # DEFER: raising here can land between a donated device dispatch
            # and the rebinding of `state`, leaving the emergency checkpoint
            # only deleted buffers ("Array has been deleted").  The loop
            # raises at the next iteration boundary, where `state` is whole.
            nonlocal sigterm_hit
            sigterm_hit = True
        try:
            prev_sigterm = signal.signal(signal.SIGTERM, _on_sigterm)
            sigterm_installed = True
        except ValueError:
            pass

    try:
        i = start_iter
        while i < total:
            if sigterm_hit:
                raise SystemExit(143)
            st = schedule.state_at(i)
            if st.resolution != current_res:
                if prefetcher is not None:
                    prefetcher.close()
                img_sh = None
                if (mesh is not None and loop_cfg.model_parallel > 1
                        and loop_cfg.model_parallel_mode == "spatial"):
                    from pgx.parallel.tp import (spatial_batch_sharding,
                                                 use_spatial_sharding)
                    if use_spatial_sharding(st.resolution,
                                            loop_cfg.model_parallel):
                        img_sh = spatial_batch_sharding(mesh)
                cur_batch = stage_batch_for(st.step)
                prefetcher = DevicePrefetcher(
                    batch_fn(dataset, host_batch_for(cur_batch),
                             st.resolution, seed=host_seed + st.step), mesh,
                    image_sharding=img_sh)
                current_res = st.resolution
                measure.clear()

            w = 1
            if can_scan and i != start_iter:   # first iter fires events
                k_here = (stage_k.get(st.step, 1) if auto_scan else scan_k)
                if k_here > 1:
                    w = _scan_window(i, st, schedule, total, tc, loop_cfg,
                                     k_here)
            if w > 1:
                batches = [next(prefetcher) for _ in range(w)]
                alphas = np.asarray(
                    [schedule.state_at(i + j).alpha for j in range(w)],
                    np.float32)
                mkey = ("multi", st.step, st.fading, w)
                if mkey not in step_cache:
                    step_cache[mkey] = make_train_multi_step(
                        gcfg, dcfg, tc, step=st.step, fading=st.fading,
                        k=w, augment_cfg=augment_cfg, ada_cfg=ada_cfg,
                        augment_p=augment_p)
                state, metrics = step_cache[mkey](
                    state, tuple(b[0] for b in batches),
                    tuple(b[1] for b in batches) if conditional else None,
                    alphas)
                gp_count += w // tc.gp_every     # metrics are window sums
            else:
                imgs, labels = next(prefetcher)
                update_g = (i + 1) % tc.n_critic == 0
                apply_gp = i % tc.gp_every == 0
                fkey = (st.step, st.fading, update_g, apply_gp)
                if fkey not in step_cache:
                    step_cache[fkey] = make_train_step(
                        gcfg, dcfg, tc, step=st.step, fading=st.fading,
                        update_g=update_g, apply_gp=apply_gp,
                        augment_cfg=augment_cfg, ada_cfg=ada_cfg,
                        augment_p=augment_p)
                t_meas = (time.perf_counter()
                          if auto_scan and can_scan
                          and st.step not in stage_k else None)
                state, metrics = step_cache[fkey](
                    state, imgs, labels, jnp.float32(st.alpha))
                if t_meas is not None:
                    # measure a few single steps at stage start (a fetch is
                    # the only completion barrier on the axon relay); the
                    # first samples are compiles (two graph variants when
                    # gp_every > 1), min of the rest is the step
                    float(metrics["d_total"])
                    measure.append(time.perf_counter() - t_meas)
                    if len(measure) >= 5:
                        ms = 1e3 * min(measure[2:])
                        if n_hosts > 1:
                            # every host reaches this at the same iteration
                            # (deterministic trigger), but wall-clock
                            # timings differ per host — the window choice
                            # must be SPMD-identical or hosts compile
                            # different programs and hang, so process 0's
                            # measurement decides for everyone
                            from pgx.parallel.distributed import \
                                broadcast_obj
                            ms = broadcast_obj(ms if is_main else None)
                        stage_k[st.step] = _auto_k(ms)
                        measure.clear()
                        if loop_cfg.verbose and is_main:
                            print(f"[auto] stage {st.step}: {ms:.1f} "
                                  f"ms/step -> steps_per_call "
                                  f"{stage_k[st.step]}", flush=True)
                # with gp_every > 1, average the penalty only over
                # iterations that actually computed it (the zeros from
                # skipped iterations would dilute the logged value by
                # ~1/gp_every vs the reference's per-application number)
                gp_count += int(apply_gp)

            count += w
            img_count += w * cur_batch
            sums = (metrics if not sums else
                    jax.tree.map(lambda a, b: a + b, sums, metrics))

            it = i + w
            if w > 1:
                # events below report the LAST iteration of the window
                # (same step/fading by construction; alpha advanced)
                st = schedule.state_at(it - 1)
            if it % loop_cfg.sample_every == 0 or i == start_iter:
                gkey = (st.step, st.fading)
                if gkey not in gen_cache:
                    gen_cache[gkey] = make_eval_generate(
                        gcfg, step=st.step, fading=st.fading)
                # every process enters the jitted generate (SPMD); only the
                # main host serializes the grid
                images = gen_cache[gkey](
                    state["g_ema"], jnp.asarray(sample_z),
                    jnp.asarray(sample_labels)
                    if sample_labels is not None else None,
                    jnp.float32(st.alpha))
                # collective gather only when XLA left the output sharded
                # across hosts (model-parallel meshes); otherwise non-main
                # processes skip the host copy entirely
                if is_main or needs_cross_host_gather(images):
                    images = host_copy(images)
                if is_main:
                    save_image_grid(
                        os.path.join(trial_dir, "sample",
                                     f"{str(it).zfill(3)}.png"),
                        np.asarray(images), nrow=sample_nrow)

            if it % loop_cfg.checkpoint_every == 0 or i == start_iter:
                # every process enters (save_full gathers cross-host
                # shards collectively); only process 0 writes
                try:
                    save_full(it, state)
                except OSError:
                    pass  # reference behavior: never die on a ckpt write

            if fid_ticks and it % loop_cfg.fid_every == 0:
                ema = state["g_ema"]
                if n_hosts > 1 and (is_main
                                    or needs_cross_host_gather(ema)):
                    # multihost: the metric pass runs process-0-local over
                    # a host copy of the EMA params; non-main processes
                    # participate only in the collective gather (model-
                    # parallel shardings), mirroring the sample-grid path
                    ema = host_copy(ema)
                if fid_hook is not None:
                    try:
                        fid = fid_hook.score(trial_dir, it, ema, st)
                        if loop_cfg.verbose:
                            print(f"{it}; FID: {fid:.4f} "
                                  f"(res {st.resolution})", flush=True)
                    except Exception as e:   # metric failure never kills
                        import warnings
                        warnings.warn(f"in-training FID failed at {it}: "
                                      f"{e}", RuntimeWarning)

            if it % loop_cfg.log_every == 0 and count:
                vals = {k: float(v) / count for k, v in sums.items()}
                if "grad_penalty" in sums:
                    vals["grad_penalty"] = (
                        float(sums["grad_penalty"]) / max(gp_count, 1))
                dt = time.time() - t_log
                ips = img_count / max(dt, 1e-9)
                msg = (f"{it}; G: {vals.get('g_loss', 0):.3f}; "
                       f"D: {vals.get('d_loss', 0):.3f}; "
                       f"Grad: {vals.get('grad_penalty', 0):.3f}; "
                       f"Alpha: {st.alpha:.3f}; "
                       + (f"AdaP: {vals.get('ada_p', 0):.3f}; "
                          if log_ada else "")
                       + f"res {st.resolution}; {ips:.1f} img/s")
                if loop_cfg.verbose and is_main:
                    print(msg, flush=True)
                if is_main:
                    with open(log_path, "a") as f:
                        f.write(f"{it},{vals.get('g_loss', 0):.5f},"
                                f"{vals.get('d_loss', 0):.5f},"
                                f"{vals.get('grad_penalty', 0):.5f},"
                                f"{st.alpha:.5f}"
                                + (f",{vals.get('ada_p', 0):.5f},"
                                   f"{vals.get('ada_r', 0):.5f}"
                                   if log_ada else "") + "\n")
                    timing[str(it)] = {
                        "elapsed_s": round(time.time() - run_t0, 2),
                        "img_s": round(ips, 2),
                        "resolution": st.resolution}
                    try:
                        with open(timing_path, "w") as f:
                            json.dump(timing, f, indent=1)
                    except OSError:
                        pass   # timing is an artifact, never a failure
                sums, count, gp_count, t_log = {}, 0, 0, time.time()
                img_count = 0

            if "on_iteration" in hooks:
                hooks["on_iteration"](i, st, state, metrics)
            i += w
    except (KeyboardInterrupt, SystemExit):
        # failure handling the reference lacks (its ckpt saves are bare
        # try/except, train.py:183-187): an interrupted run leaves a
        # resumable checkpoint at the exact iteration it stopped.  Skipped
        # when the state is sharded across hosts: the collective gather
        # cannot run from one process's signal handler.
        if is_main and not needs_cross_host_gather(state):
            it = int(jax.device_get(state["iteration"]))
            try:
                save_full(it, state)
                print(f"interrupted: emergency checkpoint saved at "
                      f"iteration {it} in {trial_dir}", flush=True)
            except Exception:  # best-effort: never mask the interrupt
                pass
        raise
    else:
        save_full(total, state)  # collective; process 0 writes
    finally:
        if sigterm_installed:
            signal.signal(signal.SIGTERM, prev_sigterm)
        if prefetcher is not None:
            prefetcher.close()
        if orbax_store is not None:
            orbax_store.close()  # drain pending async saves

    return trial_dir
