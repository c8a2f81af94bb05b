"""Schedulers: pure-arithmetic state must match a step-by-step simulation of
the reference's in-loop state machines (train.py:100-111,
proper_cifar_train.py:162-189)."""

import numpy as np
import pytest

from pgx.train import LegacySchedule, ProperSchedule


def simulate_legacy(n, total_iter, max_step, init_step=1):
    """The reference legacy loop's (step, alpha) sequence."""
    states = []
    step, iteration = init_step, 0.0
    L = total_iter // max_step
    for _ in range(n):
        alpha = min(1.0, (2.0 / L) * iteration) if iteration != np.inf else 1.0
        if iteration != np.inf and iteration > L:
            alpha = 0.0
            iteration = 0.0
            step += 1
            if step > max_step:
                iteration = np.inf
                alpha = 1.0
                step = max_step
        states.append((step, alpha))
        if iteration != np.inf:
            iteration += 1
    return states


def simulate_proper(n, ips, max_step, init_step=1):
    """The reference proper loop's (step, alpha) sequence."""
    states = []
    step, si = init_step, 0.0
    for _ in range(n):
        alpha = min(1.0, si / ips) if si != np.inf else 1.0
        if si == ips and step == 1:
            alpha, si, step = 0.0, 0.0, 2
        elif si == 2 * ips:
            alpha, si = 0.0, 0.0
            step += 1
            if step > max_step:
                alpha, si, step = 1.0, np.inf, max_step
        states.append((step, alpha))
        if si != np.inf:
            si += 1
    return states


def test_legacy_schedule_rejects_degenerate_split():
    """total_iter < max_step gives a zero-length stage in the reference's
    split — a clear constructor error beats a ZeroDivisionError mid-loop."""
    with pytest.raises(ValueError, match="total_iter"):
        LegacySchedule(2, 3)
    LegacySchedule(3, 3)    # one iteration per stage is the minimum


@pytest.mark.parametrize("total_iter,max_step,init_step",
                         [(30, 3, 1), (60, 6, 1), (44, 4, 2), (100, 3, 3)])
def test_legacy_schedule_matches_reference_loop(total_iter, max_step,
                                                init_step):
    sched = LegacySchedule(total_iter, max_step, init_step)
    sim = simulate_legacy(3 * total_iter, total_iter, max_step, init_step)
    for i, (step, alpha) in enumerate(sim):
        st = sched.state_at(i)
        assert st.step == step, f"i={i}: step {st.step} != {step}"
        assert abs(st.alpha - alpha) < 1e-12, f"i={i}: alpha {st.alpha} != {alpha}"
        assert st.resolution == 4 * 2 ** step
        assert st.fading == (st.alpha < 1.0)


@pytest.mark.parametrize("ips,max_step,init_step",
                         [(10, 4, 1), (7, 3, 1), (10, 4, 2), (5, 6, 3)])
def test_proper_schedule_matches_reference_loop(ips, max_step, init_step):
    sched = ProperSchedule(images_seen_per_mini_step=ips, batch_size=1,
                           max_step=max_step, init_step=init_step)
    sim = simulate_proper(3 * 2 * ips * max_step, ips, max_step, init_step)
    for i, (step, alpha) in enumerate(sim):
        st = sched.state_at(i)
        assert st.step == step, f"i={i}: step {st.step} != {step}"
        assert abs(st.alpha - alpha) < 1e-12, f"i={i}: alpha {st.alpha} != {alpha}"
        assert st.resolution == 4 * 2 ** (step - 1)


def test_proper_total_iterations():
    sched = ProperSchedule(800, 4, max_step=4, init_step=1)
    # ips = 200: stage1 200 + 3 stages x 400
    assert sched.total_iterations() == 200 + 3 * 400
    sched2 = ProperSchedule(800, 4, max_step=4, init_step=2)
    assert sched2.total_iterations() == 3 * 400


def simulate_proper_stage_batches(images, batches, max_step, init_step=1):
    """Straightforward simulation with per-stage batches: stage s consumes
    `images` images per mini-step at batch batches[s] (1 mini-step at stage
    1, fade+stabilize = 2 after); alpha ramps over the fade mini-step."""
    states = []
    for s in range(init_step, max_step + 1):
        ips = images // batches[s]
        minis = 1 if s == 1 else 2
        for j in range(minis * ips):
            states.append((s, min(1.0, j / ips), batches[s]))
    return states


@pytest.mark.parametrize("init_step", [1, 2])
def test_proper_schedule_stage_batches(init_step):
    images, max_step = 240, 4
    batches = {1: 80, 2: 40, 3: 24, 4: 8}
    sched = ProperSchedule(images, 8, max_step, init_step,
                           stage_batches=batches)
    sim = simulate_proper_stage_batches(images, batches, max_step, init_step)
    assert sched.total_iterations() == len(sim)
    for i, (step, alpha, batch) in enumerate(sim):
        st = sched.state_at(i)
        assert (st.step, st.resolution) == (step, 4 * 2 ** (step - 1)), i
        assert abs(st.alpha - alpha) < 1e-12, i
        assert st.fading == (alpha < 1.0 and step > 1), i
        assert sched.batch_for_step(step) == batch
    # past the end: final state, alpha pinned, batch clamps to max_step's
    end = sched.state_at(len(sim))
    assert end.final and end.alpha == 1.0 and end.step == max_step
    assert sched.batch_for_step(max_step + 3) == batches[max_step]
    # the fixed-batch schedule prescribes nothing (loop batch_size rules)
    assert ProperSchedule(240, 8, 4).batch_for_step(2) is None


def test_proper_stage_batches_dict_roundtrip():
    from pgx.train.schedule import schedule_from_dict, schedule_to_dict
    sched = ProperSchedule(240, 8, 4, 1, stage_batches={1: 80, 3: 24})
    d = schedule_to_dict(sched)
    back = schedule_from_dict(d)
    assert back.total_iterations() == sched.total_iterations()
    for i in range(0, sched.total_iterations() + 5, 3):
        assert back.state_at(i) == sched.state_at(i)
    for s in range(1, 5):
        assert back.batch_for_step(s) == sched.batch_for_step(s)
    # fixed-batch serialization unchanged (old trials keep resuming)
    d2 = schedule_to_dict(ProperSchedule(240, 8, 4))
    assert d2["batch_size"] == 1 and "stage_batches" not in d2
    assert schedule_from_dict(d2).state_at(7) == \
        ProperSchedule(240, 8, 4).state_at(7)


def test_parse_stage_batches():
    from pgx.cli.common import parse_stage_batches
    assert parse_stage_batches(None, 4) is None
    assert parse_stage_batches("4:512,8:256,16:128", 4) == \
        {1: 512, 2: 256, 3: 128}
    # below init_step: dropped (stage never trained)
    assert parse_stage_batches("4:512,16:128", 4, init_step=2) == {3: 128}
    with pytest.raises(ValueError):
        parse_stage_batches("6:32", 4)          # not a stage resolution
    with pytest.raises(ValueError):
        parse_stage_batches("64:32", 3)         # past max_step
    with pytest.raises(ValueError):
        parse_stage_batches("4:0", 4)           # bad batch


def test_legacy_resume_is_pure():
    sched = LegacySchedule(90000, 3, 1)
    # arbitrary resume point re-derives identical state (SURVEY section 5.4)
    a = sched.state_at(50000)
    b = sched.state_at(50000)
    assert a == b
