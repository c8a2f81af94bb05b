"""Multi-process (multi-host) training smoke: two OS processes, each with a
4-device virtual CPU backend, train the mnist config over one 8-device
global mesh via jax.distributed (Gloo CPU collectives).  Exercises
pgx.parallel.distributed.initialize_multihost / host_batch_slice, the
prefetcher's make_array_from_process_local_data path, multihost replicate(),
and main-host-only filesystem IO (SURVEY.md section 2.8 / 5.8)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        argv = [
            sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
            "--synthetic", "--multihost",
            "--coordinator-address", f"127.0.0.1:{port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--total-iter", "8", "--batch-size", "8", "--channels", "8",
            "--max-step", "2", "--sample-every", "4",
            "--checkpoint-every", "8", "--log-every", "4",
            # iterations 4..8 run as one scanned window: covers the
            # multi-step dispatch under real multi-process SPMD
            "--steps-per-call", "4",
            # in-training FID tick under multihost: the metric pass runs
            # process-0-local over a host copy of the replicated EMA
            # (pgx/train/loop.py); process 1 skips the tick entirely
            "--fid-every", "8", "--fid-samples", "16",
            "--output", str(tmp_path),
        ]
        procs.append(subprocess.Popen(argv, cwd=REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out

    # exactly one process (the main host) wrote the trial artifacts
    trials = [d for d in os.listdir(tmp_path) if d.startswith("trial_")]
    assert len(trials) == 1, trials
    trial = os.path.join(tmp_path, trials[0])
    ckpts = os.listdir(os.path.join(trial, "checkpoint"))
    assert any(n.endswith("_g.model") for n in ckpts), ckpts
    samples = os.listdir(os.path.join(trial, "sample"))
    assert samples
    # the in-training FID tick scored the EMA net on the main host
    import json
    with open(os.path.join(trial, "fid_score.json")) as f:
        fid_scores = json.load(f)
    assert fid_scores and all(
        float(v) >= 0 for v in fid_scores.values()), fid_scores
    # losses logged and finite
    logs = [n for n in os.listdir(trial) if n.startswith("train_log")]
    with open(os.path.join(trial, logs[0])) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) >= 2  # header + at least one row
    for row in lines[1:]:
        vals = [float(v) for v in row.split(",")[1:]]
        assert all(abs(v) < 1e6 for v in vals), row

    # --- phase 2: multi-host RESUME without a shared filesystem ---------
    # Process 0 resumes from the real trial dir; process 1 is given a path
    # that does NOT exist on its "filesystem" — the saved configs, newest
    # checkpoint choice, and restored state must be resolved on process 0
    # and broadcast (pgx/train/loop.py resume path), never read locally.
    port2 = _free_port()
    ghost = os.path.join(str(tmp_path), "ghost", trials[0])
    procs = []
    for pid in range(2):
        argv = [
            sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
            "--synthetic", "--multihost",
            "--coordinator-address", f"127.0.0.1:{port2}",
            "--num-processes", "2", "--process-id", str(pid),
            "--total-iter", "16", "--batch-size", "8", "--channels", "8",
            "--max-step", "2", "--sample-every", "8",
            "--checkpoint-every", "8", "--log-every", "4",
            "--output", str(tmp_path),
            "--resume", trial if pid == 0 else ghost,
        ]
        procs.append(subprocess.Popen(argv, cwd=REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"resume process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
    ckpts = os.listdir(os.path.join(trial, "checkpoint"))
    assert any(n.startswith("016_") for n in ckpts), ckpts


@pytest.mark.slow
def test_two_process_stage_batches(tmp_path):
    """Per-stage batch sizes under real 2-process SPMD: global batches
    32 -> 16 across the growth switch (per-host 16 -> 8), mesh sized for
    the gcd; both processes agree on every stage's shapes."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        argv = [
            sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
            "--cli", "proper", "--synthetic", "--multihost",
            "--coordinator-address", f"127.0.0.1:{port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--batch-size", "16", "--channels", "8", "--z-dim", "8",
            "--images-per-mini-step", "128", "--max-step", "2",
            "--stage-batches", "4:32",
            "--sample-every", "8", "--checkpoint-every", "20",
            "--log-every", "4", "--steps-per-call", "4",
            "--output", str(tmp_path),
        ]
        procs.append(subprocess.Popen(argv, cwd=REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out

    trials = [d for d in os.listdir(tmp_path) if d.startswith("trial_")]
    assert len(trials) == 1, trials
    trial = os.path.join(tmp_path, trials[0])
    # schedule: stage1 = 128/32 = 4 iters, stage2 = 2*128/16 = 16 -> 20
    ckpts = os.listdir(os.path.join(trial, "checkpoint"))
    assert any(n.startswith("020_") for n in ckpts), ckpts
    import json
    cfg_file = [n for n in os.listdir(trial)
                if n.startswith("train_config")][0]
    with open(os.path.join(trial, cfg_file)) as f:
        sched = json.load(f)["schedule"]
    assert sched["stage_batches"] == {"1": 32}


@pytest.mark.slow
def test_two_process_spatial(tmp_path):
    """Spatial model parallelism across hosts: a (data=4, model=2) mesh
    over 2 processes x 4 devices with images H-sharded over the
    within-host model axis.  Exercises the prefetcher's
    make_array_from_process_local_data with the 2-D image sharding (batch
    slices per host, full H per slice) and the per-stage spatial gate
    across a growth switch."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        argv = [
            sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
            "--synthetic", "--multihost",
            "--coordinator-address", f"127.0.0.1:{port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--model-parallel", "2", "--model-parallel-mode", "spatial",
            "--total-iter", "8", "--batch-size", "8", "--channels", "8",
            "--max-step", "2", "--sample-every", "4",
            "--checkpoint-every", "8", "--log-every", "4",
            "--output", str(tmp_path),
        ]
        procs.append(subprocess.Popen(argv, cwd=REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out

    trials = [d for d in os.listdir(tmp_path) if d.startswith("trial_")]
    assert len(trials) == 1, trials
    trial = os.path.join(tmp_path, trials[0])
    ckpts = os.listdir(os.path.join(trial, "checkpoint"))
    assert any(n.endswith("_g.model") for n in ckpts), ckpts
    assert os.listdir(os.path.join(trial, "sample"))


@pytest.mark.slow
def test_two_process_model_parallel(tmp_path):
    """Tensor parallelism across hosts: a (data=4, model=2) global mesh
    over 2 processes x 4 devices.  Params are channel-sharded across
    BOTH processes, so this exercises the paths only cross-host sharding
    reaches: shard_state's per-shard placement, the collective host_copy
    (process_allgather) behind every checkpoint save and sample grid, and
    main-host-only writes of the gathered full arrays."""
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    procs = []
    for pid in range(2):
        argv = [
            sys.executable, os.path.join(REPO, "tests", "multihost_worker.py"),
            "--synthetic", "--multihost",
            "--coordinator-address", f"127.0.0.1:{port}",
            "--num-processes", "2", "--process-id", str(pid),
            "--model-parallel", "2",
            "--total-iter", "8", "--batch-size", "8", "--channels", "8",
            "--max-step", "2", "--sample-every", "4",
            "--checkpoint-every", "4", "--log-every", "4",
            # FID tick with CROSS-HOST-sharded params: every process must
            # enter the collective EMA gather before process 0 scores
            "--fid-every", "8", "--fid-samples", "16",
            "--output", str(tmp_path),
        ]
        procs.append(subprocess.Popen(argv, cwd=REPO, env=env,
                                      stdout=subprocess.PIPE,
                                      stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out

    trials = [d for d in os.listdir(tmp_path) if d.startswith("trial_")]
    assert len(trials) == 1, trials
    trial = os.path.join(tmp_path, trials[0])
    # the gathered checkpoints hold FULL (unsharded) param arrays
    from pgx import checkpoint as ckpt
    gpath = ckpt.latest_checkpoint(trial, "g")
    assert gpath is not None
    import numpy as np
    params = ckpt.load_params(gpath)
    leaves = [np.asarray(a) for a in __import__("jax").tree.leaves(params)]
    assert all(np.all(np.isfinite(a.astype(np.float32))) for a in leaves)
    assert os.listdir(os.path.join(trial, "sample"))
    # the FID tick ran over the collectively-gathered EMA params
    import json
    with open(os.path.join(trial, "fid_score.json")) as f:
        fid_scores = json.load(f)
    assert fid_scores, fid_scores
