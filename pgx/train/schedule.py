"""Progressive-growth schedulers as pure functions of the global iteration.

The reference mutates (step, alpha, iteration) inline in its training loops;
here each scheduler is a pure map ``global_iter -> ScheduleState`` so resume
is trivially arithmetic and logging/FID sweeps can re-derive state
(SURVEY.md section 2.3 "Growth schedulers", section 5.4 resume).

Two schemes:

* ``LegacySchedule`` — iteration-split (train.py:100-111,
  mnist_train.py:141-153): stage length ``L+1`` iterations with
  ``L = total_iter // max_step``; ``alpha = min(1, 2*j/L)`` within a stage
  (fade-in occupies the first half); after the last stage, alpha pins to 1.
  NOTE: the reference's own resume arithmetic (mnist_train.py:66-80) divides
  by ``L`` not ``L+1`` and therefore drifts from its loop by one iteration
  per completed stage; ours is exact w.r.t. the loop semantics.

* ``ProperSchedule`` — images-seen (proper_cifar_train.py:162-189):
  ``ips = images_seen_per_mini_step // batch_size``; stage 1 lasts one
  mini-step, every later stage two (fade + stabilize);
  ``alpha = min(1, j / ips)``.

Resolutions: legacy trains at ``4 * 2**step`` (train.py:110), proper at
``4 * 2**(step-1)`` (proper_cifar_train.py:50).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class ScheduleState:
    step: int
    alpha: float
    fading: bool          # statically selects the blend graph
    resolution: int
    final: bool           # past the last growth stage (alpha pinned at 1)


class LegacySchedule:
    def __init__(self, total_iter: int, max_step: int, init_step: int = 1):
        assert max_step >= 1 and init_step >= 1
        self.total_iter = total_iter
        self.max_step = max_step
        self.init_step = init_step
        self.stage_len = total_iter // max_step       # L
        self.span = self.stage_len + 1                # actual loop period

    def state_at(self, i: int) -> ScheduleState:
        step = self.init_step + i // self.span
        j = i % self.span
        if step > self.max_step:
            return ScheduleState(self.max_step, 1.0, False,
                                 4 * 2 ** self.max_step, True)
        alpha = min(1.0, 2.0 * j / self.stage_len)
        return ScheduleState(step, alpha, alpha < 1.0, 4 * 2 ** step, False)

    def total_iterations(self, tail: int = 0) -> int:
        """Iterations to traverse all stages from init_step, plus a tail at
        the final resolution (mnist_train.py:88-90 uses tail=100000)."""
        remaining = self.max_step - self.init_step + 1
        return remaining * self.span + tail


class ProperSchedule:
    def __init__(self, images_seen_per_mini_step: int, batch_size: int,
                 max_step: int, init_step: int = 1):
        assert max_step >= 1 and init_step >= 1
        self.ips = images_seen_per_mini_step // batch_size
        assert self.ips >= 1, (
            f"images_seen_per_mini_step={images_seen_per_mini_step} must be "
            f">= batch_size={batch_size}")
        self.max_step = max_step
        self.init_step = init_step

    def state_at(self, i: int) -> ScheduleState:
        ips = self.ips
        if self.init_step == 1:
            if i < ips:
                step, j = 1, i
            else:
                step = 2 + (i - ips) // (2 * ips)
                j = (i - ips) % (2 * ips)
        else:
            step = self.init_step + i // (2 * ips)
            j = i % (2 * ips)
        if step > self.max_step:
            return ScheduleState(self.max_step, 1.0, False,
                                 4 * 2 ** (self.max_step - 1), True)
        alpha = min(1.0, j / ips)
        # step 1 has no fade target (4x4 is the first head).
        fading = alpha < 1.0 and step > 1
        return ScheduleState(step, alpha, fading, 4 * 2 ** (step - 1), False)

    def total_iterations(self, tail: int = 0) -> int:
        if self.init_step == 1:
            total = self.ips + 2 * self.ips * (self.max_step - 1)
        else:
            total = 2 * self.ips * (self.max_step - self.init_step + 1)
        return total + tail


def schedule_to_dict(schedule) -> dict:
    """JSON-serializable schedule description (stored in the trial config so
    FID sweeps / resume can re-derive (step, alpha) per iteration)."""
    if isinstance(schedule, LegacySchedule):
        return {"kind": "legacy", "total_iter": schedule.total_iter,
                "max_step": schedule.max_step,
                "init_step": schedule.init_step}
    if isinstance(schedule, ProperSchedule):
        return {"kind": "proper",
                "images_seen_per_mini_step": schedule.ips,
                "batch_size": 1,  # ips already divided
                "max_step": schedule.max_step,
                "init_step": schedule.init_step}
    raise TypeError(type(schedule))


def schedule_from_dict(d: dict):
    if d["kind"] == "legacy":
        return LegacySchedule(d["total_iter"], d["max_step"], d["init_step"])
    if d["kind"] == "proper":
        return ProperSchedule(d["images_seen_per_mini_step"],
                              d.get("batch_size", 1), d["max_step"],
                              d["init_step"])
    raise ValueError(d["kind"])
