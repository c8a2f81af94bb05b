"""Cross-process training statistics (TPU-native training_stats).

Re-design of ada/torch_utils/training_stats.py: the reference accumulates
lock-free per-device moment vectors ``[n, sum(x), sum(x^2)]`` per named stat
and all-reduces them on sync (:23,79-99,234-266).  Here the moments are a
plain pytree of (3,)-vectors that lives wherever the caller keeps it
(typically inside the jitted train step's carried state), reduced with
``lax.psum`` under shard_map/pmap or implicitly global under GSPMD jit; the
host-side Collector mirrors the reference's mean/std-over-update-window API
(:113-230).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax.numpy as jnp
from jax import lax

Moments = jnp.ndarray  # shape (3,): [num, sum(x), sum(x^2)]


def init_moments() -> Moments:
    return jnp.zeros((3,), jnp.float32)


def report(moments: Moments, value: jnp.ndarray) -> Moments:
    """Accumulate a tensor of samples into a moment vector
    (training_stats.report, :56-99)."""
    x = jnp.asarray(value, jnp.float32).reshape(-1)
    return moments + jnp.stack([
        jnp.asarray(x.size, jnp.float32), jnp.sum(x), jnp.sum(jnp.square(x))])


def psum_moments(moments: Moments, axis_name: str) -> Moments:
    """Cross-device reduction (the reference's torch.distributed.all_reduce,
    :254-266) — under GSPMD jit this is unnecessary (reductions are already
    global); needed only inside shard_map/pmap bodies."""
    return lax.psum(moments, axis_name)


def mean(moments) -> float:
    m = np.asarray(moments, np.float64)
    return float(m[1] / m[0]) if m[0] > 0 else float("nan")


def std(moments) -> float:
    m = np.asarray(moments, np.float64)
    if m[0] <= 0:
        return float("nan")
    mu = m[1] / m[0]
    var = max(m[2] / m[0] - mu * mu, 0.0)
    return float(np.sqrt(var))


class Collector:
    """Host-side stat windows (training_stats.Collector, :113-230):
    ``update(named_moments)`` folds a new device-side snapshot in;
    mean/std read the delta since the previous update window."""

    def __init__(self, regex: str = ".*"):
        import re
        self._regex = re.compile(regex)
        self._cumulative: Dict[str, np.ndarray] = {}
        self._delta: Dict[str, np.ndarray] = {}

    def names(self):
        return sorted(self._delta)

    def update(self, named_moments: Dict[str, Moments]) -> None:
        seen = set()
        for name, m in named_moments.items():
            if not self._regex.fullmatch(name):
                continue
            cur = np.asarray(m, np.float64)
            prev = self._cumulative.get(name, np.zeros(3))
            if cur[0] < prev[0]:
                # cumulative count dropped: the device-side moments were
                # re-initialized (e.g. a new growth stage) — the whole
                # snapshot is this window's delta, not cur - stale_prev
                prev = np.zeros(3)
            self._delta[name] = cur - prev
            self._cumulative[name] = cur
            seen.add(name)
        # a stat absent from this snapshot contributed nothing THIS window
        # (reference Collector semantics) — don't report last window's
        # delta as current
        for name in self._delta:
            if name not in seen:
                self._delta[name] = np.zeros(3)

    def num(self, name: str) -> int:
        return int(self._delta.get(name, np.zeros(3))[0])

    def mean(self, name: str) -> float:
        return mean(self._delta.get(name, np.zeros(3)))

    def std(self, name: str) -> float:
        return std(self._delta.get(name, np.zeros(3)))

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {n: {"num": self.num(n), "mean": self.mean(n),
                    "std": self.std(n)} for n in self.names()}


def check_replica_consistency(tree, atol: float = 0.0,
                              label: str = "state") -> None:
    """Assert a replicated pytree is bit-identical across devices — the
    TPU-native check_ddp_consistency (ada/torch_utils/misc.py:178-187).

    Works on fully-replicated jax.Arrays by comparing every per-device
    shard against the first.
    """
    import jax

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) < 2:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            got = np.asarray(s.data)
            # equal_nan: identical NaNs ARE bit-identical — a diverged but
            # consistent state must not masquerade as replica drift
            if not np.allclose(ref, got, atol=atol, rtol=0, equal_nan=True):
                name = jax.tree_util.keystr(path)
                raise AssertionError(
                    f"{label}{name} differs between device "
                    f"{shards[0].device} and {s.device}")
