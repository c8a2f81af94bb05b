"""End-to-end smoke: tiny MNIST-config training run through the real loop
(SURVEY.md section 4 item (d)): losses finite, schedule advances through a
stage switch, samples + checkpoints + logs written, resume works."""

import os

import pytest

pytestmark = pytest.mark.slow

import numpy as np

from pgx import checkpoint as ckpt
from pgx.data import synthetic_dataset
from pgx.models import zoo
from pgx.train import LegacySchedule, TrainConfig
from pgx.train.loop import LoopConfig, train_loop


def _tiny_setup(tmp_path, total_iter=24, max_step=2):
    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    tc = TrainConfig()
    schedule = LegacySchedule(total_iter, max_step, 1)
    dataset = synthetic_dataset(n=64, size=32, channels=1, seed=0)
    loop_cfg = LoopConfig(trial_name="smoke", main_path=str(tmp_path),
                          batch_size=8, sample_every=10, checkpoint_every=10,
                          log_every=5, verbose=False)
    return gcfg, dcfg, tc, schedule, dataset, loop_cfg


def test_training_loop_end_to_end(tmp_path):
    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    trial_dir = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    # stage switch happened: schedule spans two resolutions in 24 iters
    assert schedule.state_at(0).resolution == 8
    assert schedule.state_at(schedule.total_iterations() - 1).resolution == 16

    # artifacts: config json, CSV log, samples, checkpoints
    cfg = ckpt.load_config(trial_dir)
    g2, d2, t2 = ckpt.configs_from_dict(cfg)
    assert g2 == gcfg and d2 == dcfg and t2 == tc

    log = [f for f in os.listdir(trial_dir) if f.startswith("train_log")]
    assert log
    lines = open(os.path.join(trial_dir, log[0])).read().strip().splitlines()
    assert lines[0] == "iter,g,d,grad,alpha"
    assert len(lines) > 1
    vals = np.asarray([l.split(",")[1:3] for l in lines[1:]], np.float32)
    assert np.isfinite(vals).all()

    samples = os.listdir(os.path.join(trial_dir, "sample"))
    assert any(s.endswith(".png") for s in samples)
    assert ckpt.latest_checkpoint(trial_dir, "g") is not None
    assert ckpt.latest_checkpoint(trial_dir, "d") is not None


def test_stage_batch_schedule_end_to_end(tmp_path):
    """Per-stage batch sizes (ProperSchedule.stage_batches): the loop feeds
    each stage its own batch, the mesh is sized for the gcd (32/16/8 on the
    8-device CPU mesh -> all 8 devices), events fire, and a mid-run resume
    continues under the same per-stage batches (schedule JSON roundtrip)."""
    from pgx.train import ProperSchedule
    gcfg = zoo.correct_generator(z_dim=8, channel=8, max_step=3)
    dcfg = zoo.correct_discriminator(feat_dim=8, max_step=3)
    schedule = ProperSchedule(96, 8, max_step=3,
                              stage_batches={1: 32, 2: 16, 3: 8})
    # spans: stage1 96/32=3, stage2 2*6=12, stage3 2*12=24 -> 39 iterations
    assert schedule.total_iterations() == 39
    dataset = synthetic_dataset(n=64, size=16, channels=3, seed=0)
    loop_cfg = LoopConfig(trial_name="stageb", main_path=str(tmp_path),
                          batch_size=8, sample_every=10, checkpoint_every=10,
                          log_every=5, verbose=False)
    trial_dir = train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                           loop_cfg)

    lines = _log_lines(trial_dir)
    assert lines, "no log rows written"
    vals = np.asarray([l.split(",")[1:3] for l in lines], np.float32)
    assert np.isfinite(vals).all()

    def final_iteration(tdir):
        from flax.serialization import msgpack_restore
        path = os.path.join(tdir, "checkpoint", "039_state.msgpack")
        with open(path, "rb") as f:
            return int(msgpack_restore(f.read())["iteration"])

    assert final_iteration(trial_dir) == 39

    # resume from the iteration-10 checkpoint: runs the remaining stages
    # with their own batches through to the same total
    import shutil
    resumed = os.path.join(str(tmp_path), "trial_resumed")
    shutil.copytree(trial_dir, resumed)
    for f in os.listdir(os.path.join(resumed, "checkpoint")):
        if not f.startswith("010_"):
            os.remove(os.path.join(resumed, "checkpoint", f))
    trial2 = train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                        loop_cfg, resume_dir=resumed)
    assert final_iteration(trial2) == 39


def _log_lines(trial_dir):
    log = [f for f in os.listdir(trial_dir) if f.startswith("train_log")]
    assert log
    path = os.path.join(trial_dir, log[0])
    return open(path).read().strip().splitlines()[1:]


def test_resume_from_full_state(tmp_path):
    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    loop_cfg.total_iterations = 12
    trial_dir = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    loop_cfg2 = LoopConfig(**{**loop_cfg.__dict__, "total_iterations": 20})
    trial_dir2 = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg2,
                            resume_dir=trial_dir)
    assert trial_dir2 == trial_dir
    last = ckpt.latest_checkpoint(trial_dir, "g")
    assert ckpt.checkpoint_iteration(last) == 20


def test_model_only_resume(tmp_path):
    """Reference-style resume: only *_g.model / *_d.model present."""
    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    loop_cfg.total_iterations = 10
    loop_cfg.keep_full_state = False
    trial_dir = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    loop_cfg2 = LoopConfig(**{**loop_cfg.__dict__, "total_iterations": 14})
    train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg2,
               resume_dir=trial_dir)
    assert ckpt.checkpoint_iteration(
        ckpt.latest_checkpoint(trial_dir, "g")) == 14


def test_orbax_backend_save_and_resume(tmp_path):
    """checkpoint_backend='orbax': full state goes through the async Orbax
    store (no *_state.msgpack), param .model files still written, and
    resume restores iteration/step from the Orbax state."""
    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    loop_cfg.total_iterations = 12
    loop_cfg.checkpoint_backend = "orbax"
    trial_dir = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    names = os.listdir(os.path.join(trial_dir, "checkpoint"))
    assert not any(n.endswith("_state.msgpack") for n in names)
    assert any(n.endswith("_g.model") for n in names)
    from pgx.checkpoint.orbax_backend import has_orbax_state
    assert has_orbax_state(trial_dir)

    loop_cfg2 = LoopConfig(**{**loop_cfg.__dict__, "total_iterations": 16})
    trial_dir2 = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg2,
                            resume_dir=trial_dir)
    assert trial_dir2 == trial_dir
    assert ckpt.checkpoint_iteration(
        ckpt.latest_checkpoint(trial_dir, "g")) == 16


def test_resume_prefers_newest_full_state(tmp_path):
    """A trial holding BOTH an orbax state and a newer msgpack state (orbax
    run later resumed with the default backend) must resume from the
    newest, not silently roll back to the stale orbax step."""
    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    loop_cfg.total_iterations = 8
    loop_cfg.checkpoint_backend = "orbax"
    trial_dir = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    loop_cfg2 = LoopConfig(**{**loop_cfg.__dict__, "total_iterations": 14,
                              "checkpoint_backend": "npz"})
    train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg2,
               resume_dir=trial_dir)  # leaves 14_state.msgpack + orbax@8

    loop_cfg3 = LoopConfig(**{**loop_cfg.__dict__, "total_iterations": 18,
                              "checkpoint_backend": "npz"})
    train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg3,
               resume_dir=trial_dir)
    names = os.listdir(os.path.join(trial_dir, "checkpoint"))
    its = sorted(int(n.split("_")[0]) for n in names
                 if n.endswith("_state.msgpack"))
    # the third run must have started at 14 (not the stale orbax 8):
    # its first periodic save lands at iteration 15 (i == start_iter)
    assert 15 in its and 18 in its


def test_interrupt_saves_emergency_checkpoint(tmp_path):
    """A KeyboardInterrupt mid-run leaves a resumable checkpoint at the
    exact interrupted iteration (the reference loses everything since its
    last periodic save)."""
    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    loop_cfg.total_iterations = 20
    loop_cfg.checkpoint_every = 100  # no periodic saves before interrupt

    def bomb(i, st, state, metrics):
        if i == 6:
            raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg,
                   hooks={"on_iteration": bomb})
    trials = [d for d in os.listdir(tmp_path) if d.startswith("trial_")]
    trial_dir = os.path.join(tmp_path, trials[0])
    last = ckpt.latest_checkpoint(trial_dir, "g")
    assert ckpt.checkpoint_iteration(last) == 7  # interrupted at i=6 -> it=7

    loop_cfg2 = LoopConfig(**{**loop_cfg.__dict__, "total_iterations": 12})
    train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg2,
               resume_dir=trial_dir)
    assert ckpt.checkpoint_iteration(
        ckpt.latest_checkpoint(trial_dir, "g")) == 12


def test_checkpoint_roundtrip_and_grower(tmp_path):
    import jax
    import jax.numpy as jnp

    from pgx.models import init_generator

    from pgx.models import GeneratorConfig

    # grow a 3-stage (4..16) proper net into a 4-stage (4..32) one
    small_cfg = GeneratorConfig(z_dim=8, channels=(8, 8, 8), arch="proper",
                                tanh=False, max_step=3)
    big_cfg = GeneratorConfig(z_dim=8, channels=(8, 8, 8, 8), arch="proper",
                              tanh=False, max_step=4)
    small = init_generator(jax.random.PRNGKey(0), small_cfg)
    big = init_generator(jax.random.PRNGKey(1), big_cfg)

    path = os.path.join(str(tmp_path), "g.model.npz")
    ckpt.save_params(path, small)
    small2 = ckpt.load_params(path)
    for a, b in zip(jax.tree.leaves(small), jax.tree.leaves(small2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    grown = ckpt.grow_params(small2, big)
    z = jax.random.normal(jax.random.PRNGKey(2), (3, 8))
    ckpt.assert_grow_equivalence(small, small_cfg, grown, big_cfg, z, step=2)
    # new stages unchanged from big's init
    np.testing.assert_array_equal(
        np.asarray(grown["to_rgb"]["32"]["w"]),
        np.asarray(big["to_rgb"]["32"]["w"]))


def test_steps_per_call_matches_single_dispatch(tmp_path):
    """steps_per_call rolls iterations into scanned windows but leaves the
    training stream identical: same final params/EMA, same artifacts at
    the same iterations, windows falling back to single steps around
    stage/phase/event boundaries automatically."""
    import jax

    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    t1 = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    import dataclasses
    loop_cfg2 = dataclasses.replace(loop_cfg, trial_name="smoke_scan",
                                    steps_per_call=5)
    t2 = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg2)

    assert sorted(os.listdir(os.path.join(t1, "checkpoint"))) == \
        sorted(os.listdir(os.path.join(t2, "checkpoint")))
    g1 = ckpt.load_params(ckpt.latest_checkpoint(t1, "g"))
    g2 = ckpt.load_params(ckpt.latest_checkpoint(t2, "g"))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-5, atol=1e-6), g1, g2)
    d1 = ckpt.load_params(ckpt.latest_checkpoint(t1, "d"))
    d2 = ckpt.load_params(ckpt.latest_checkpoint(t2, "d"))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-5, atol=1e-6), d1, d2)


def test_steps_per_call_gp_every_misaligned(tmp_path, capsys):
    """steps_per_call that is not a multiple of gp_every must not silently
    degrade to single-step dispatch forever: the loop rounds it to the
    nearest gp_every multiple (and says so), and the stream still matches
    the single-dispatch run exactly."""
    import dataclasses
    import jax

    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    tc = dataclasses.replace(tc, gp_every=2)
    t1 = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    loop_cfg2 = dataclasses.replace(loop_cfg, trial_name="smoke_mis",
                                    steps_per_call=5)
    t2 = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg2)
    assert "not a multiple of gp_every=2; using 4" in capsys.readouterr().out

    g1 = ckpt.load_params(ckpt.latest_checkpoint(t1, "g"))
    g2 = ckpt.load_params(ckpt.latest_checkpoint(t2, "g"))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-5, atol=1e-6), g1, g2)


def test_in_training_fid_gate(tmp_path):
    """--fid-every scores the EMA generator during the run: fid_score.json
    appears with entries under the sweep's {iter}_g.model keys, finite, at
    exactly the configured cadence."""
    import dataclasses
    import json

    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    loop_cfg = dataclasses.replace(loop_cfg, trial_name="smoke_fid",
                                   fid_every=10, fid_samples=16)
    trial = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    with open(os.path.join(trial, "fid_score.json")) as f:
        scores = json.load(f)
    assert set(scores) == {"010_g.model", "020_g.model"}
    assert all(np.isfinite(v) for v in scores.values())

    # in-training entries are marked: their per-stage-resolution balanced
    # baseline is not comparable to a post-hoc sweep's, so the sweep must
    # RE-score them under its own baseline instead of skipping — except
    # where no checkpoint file exists (nothing to regenerate from): those
    # keep the mark so comparisons can exclude them
    from pgx.eval.sweep import load_fid_meta, load_fid_scores, sweep_trial
    assert set(load_fid_meta(trial)) == set(scores)
    os.remove(os.path.join(trial, "checkpoint", "010_g.model"))
    real = dataset.at_resolution(32)[:24]
    swept = sweep_trial(trial, schedule, real, num_samples=16,
                        batch_size=8, verbose=False)
    assert set(swept) >= set(scores)
    # 020 had a checkpoint -> re-scored, mark cleared; 010's file was
    # removed -> keeps its in-training mark (and its per-stage score)
    assert set(load_fid_meta(trial)) == {"010_g.model"}
    assert all(np.isfinite(v) for v in load_fid_scores(trial).values())


def test_resume_restores_saved_schedule(tmp_path):
    """Resume must train under the trial's SAVED growth schedule, not the
    caller's: a drifted schedule (forgotten --stage-batches, different
    split) would map the resumed iteration to a different (step, alpha).
    Also: a renamed trial dir (no 'trial_' prefix) must not get its log
    postfix mangled."""
    import dataclasses
    import shutil
    import warnings as _warnings

    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    trial = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)

    renamed = os.path.join(str(tmp_path), "backup_run")
    shutil.copytree(trial, renamed)
    drifted = LegacySchedule(100, 2, 1)      # saved one is (24, 2, 1)
    with pytest.warns(RuntimeWarning, match="growth schedule"):
        train_loop(gcfg, dcfg, tc, drifted, dataset, loop_cfg,
                   resume_dir=renamed)
    # un-mangled postfix: the resumed run logs under the dir's own name
    assert os.path.exists(os.path.join(renamed,
                                       "train_log_backup_run.txt"))
    # same schedule passed -> no schedule warning
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        train_loop(gcfg, dcfg, tc, LegacySchedule(24, 2, 1), dataset,
                   loop_cfg, resume_dir=renamed)
    assert not any("growth schedule" in str(w.message) for w in caught)


def test_steps_per_call_auto(tmp_path):
    """steps_per_call=0 (auto) times each stage, picks a window, and still
    matches the single-dispatch run exactly (same checkpoints, same
    params): the measurement steps are ordinary single steps."""
    import dataclasses
    import jax

    gcfg, dcfg, tc, schedule, dataset, loop_cfg = _tiny_setup(tmp_path)
    t1 = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg)
    loop_cfg2 = dataclasses.replace(loop_cfg, trial_name="smoke_auto",
                                    steps_per_call=0)
    t2 = train_loop(gcfg, dcfg, tc, schedule, dataset, loop_cfg2)

    assert sorted(os.listdir(os.path.join(t1, "checkpoint"))) == \
        sorted(os.listdir(os.path.join(t2, "checkpoint")))
    g1 = ckpt.load_params(ckpt.latest_checkpoint(t1, "g"))
    g2 = ckpt.load_params(ckpt.latest_checkpoint(t2, "g"))
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=2e-5, atol=1e-6), g1, g2)


def test_sigterm_preemption_saves_emergency_checkpoint(tmp_path):
    """TPU-pod preemption arrives as SIGTERM: a real training process must
    unwind through the emergency-checkpoint path (resumable full state at
    the iteration it stopped) and exit 143 — failure handling the
    reference lacks entirely (its saves are bare try/except)."""
    import signal
    import subprocess
    import sys
    import time

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    code = (
        "import os\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=8'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from pgx.cli.mnist_train import main\n"
        f"main(['--synthetic', '--total-iter', '100000', '--channels',"
        f" '8', '--batch-size', '8', '--main-path', {str(tmp_path)!r},"
        " '--log-every', '5', '--sample-every', '100000',"
        " '--checkpoint-every', '100000'])\n")
    p = subprocess.Popen([sys.executable, "-c", code],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
    try:
        # wait until the run is live (initial checkpoint written), then let
        # it train a little before "preempting" it
        trial = None
        deadline = time.time() + 420
        while time.time() < deadline:
            trials = [d for d in os.listdir(tmp_path)
                      if d.startswith("trial_")]
            if trials:
                ck = os.path.join(tmp_path, trials[0], "checkpoint")
                if os.path.isdir(ck) and any(
                        n.endswith("_state.msgpack")
                        for n in os.listdir(ck)):
                    trial = os.path.join(tmp_path, trials[0])
                    break
            time.sleep(1)
        assert trial is not None, "run never wrote its initial checkpoint"
        time.sleep(10)
        p.send_signal(signal.SIGTERM)
        out, _ = p.communicate(timeout=180)
    finally:
        if p.poll() is None:
            p.kill()
    assert p.returncode == 143, (p.returncode, out[-2000:])
    assert "interrupted: emergency checkpoint" in out, out[-2000:]
    states = [n for n in os.listdir(os.path.join(trial, "checkpoint"))
              if n.endswith("_state.msgpack")]
    assert states, "no resumable full state after preemption"
