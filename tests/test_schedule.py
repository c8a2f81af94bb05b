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


def test_legacy_resume_is_pure():
    sched = LegacySchedule(90000, 3, 1)
    # arbitrary resume point re-derives identical state (SURVEY section 5.4)
    a = sched.state_at(50000)
    b = sched.state_at(50000)
    assert a == b
