"""Infra helpers (TPU-native ada/torch_utils/misc.py equivalents).

* ``constant`` — cached device constants (:22-41);
* ``assert_shape`` — shape checks that tolerate traced dims (:80-93);
* ``InfiniteSampler`` — rank/num_replicas-aware shuffling infinite index
  stream (:109-140) for multi-host input sharding;
* ``copy_params`` / ``named_leaves`` — params copy helpers (:145-160);
* ``print_param_summary`` — per-module parameter/shape table
  (print_module_summary, :192-260) for pytree params.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Iterator, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=None)
def _cached_constant(value_bytes: bytes, shape, dtype_str: str):
    arr = np.frombuffer(value_bytes, dtype=np.dtype(dtype_str)).reshape(shape)
    return jnp.asarray(arr)


def constant(value, shape=None, dtype=None) -> jnp.ndarray:
    """Cached device constant (misc.constant): repeated calls with the same
    value return the same committed jax.Array, avoiding re-uploads."""
    arr = np.asarray(value, dtype=dtype)
    if shape is not None:
        arr = np.broadcast_to(arr, shape).copy()
    return _cached_constant(arr.tobytes(), arr.shape, arr.dtype.str)


def assert_shape(x, ref_shape: Sequence[Optional[int]]) -> None:
    """Assert tensor shape; ``None`` entries are wildcards
    (misc.assert_shape semantics)."""
    if x.ndim != len(ref_shape):
        raise AssertionError(
            f"wrong rank: got {x.ndim}, expected {len(ref_shape)}")
    for i, (got, want) in enumerate(zip(x.shape, ref_shape)):
        if want is None:
            continue
        if got != want:
            raise AssertionError(
                f"wrong size for dim {i}: got {got}, expected {want}")


class InfiniteSampler:
    """Rank-sharded infinite shuffling sampler (misc.InfiniteSampler):
    yields dataset indices forever, each replica seeing a disjoint
    1/num_replicas slice per pass, with optional window shuffling."""

    def __init__(self, dataset_size: int, rank: int = 0,
                 num_replicas: int = 1, shuffle: bool = True, seed: int = 0,
                 window_size: float = 0.5):
        assert dataset_size > 0 and 0 <= rank < num_replicas
        assert 0 <= window_size <= 1
        self.dataset_size = dataset_size
        self.rank = rank
        self.num_replicas = num_replicas
        self.shuffle = shuffle
        self.seed = seed
        self.window_size = window_size

    def __iter__(self) -> Iterator[int]:
        order = np.arange(self.dataset_size)
        rnd = None
        window = 0
        if self.shuffle:
            rnd = np.random.RandomState(self.seed)
            rnd.shuffle(order)
            window = int(np.rint(order.size * self.window_size))
        idx = 0
        while True:
            i = idx % order.size
            if idx % self.num_replicas == self.rank:
                yield int(order[i])
            if rnd is not None and window >= 2:
                j = (i - rnd.randint(window)) % order.size
                order[i], order[j] = order[j], order[i]
            idx += 1


def named_leaves(tree) -> Dict[str, Any]:
    """Flat {path: leaf} view of a params pytree (misc params/buffers
    helpers)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(path): leaf for path, leaf in flat}


def copy_params(src, dst, require_all: bool = True):
    """Copy matching-path leaves of ``src`` into ``dst``
    (misc.copy_params_and_buffers)."""
    src_flat = named_leaves(src)

    def rec(path, leaf):
        name = jax.tree_util.keystr(path)
        if name in src_flat:
            assert src_flat[name].shape == leaf.shape
            return src_flat[name]
        if require_all:
            raise KeyError(name)
        return leaf

    flat = jax.tree_util.tree_flatten_with_path(dst)
    leaves = [rec(p, l) for p, l in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def print_param_summary(params, name: str = "params") -> str:
    """Parameter table: path, shape, dtype, count + totals
    (print_module_summary's role for pytrees)."""
    rows = []
    total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        rows.append((jax.tree_util.keystr(path), str(tuple(leaf.shape)),
                     str(leaf.dtype), n))
    width = max((len(r[0]) for r in rows), default=10)
    lines = [f"{name}:"]
    for path, shape, dtype, n in rows:
        lines.append(f"  {path:<{width}}  {shape:<18} {dtype:<10} {n:>12,}")
    lines.append(f"  {'total':<{width}}  {'':<18} {'':<10} {total:>12,}")
    out = "\n".join(lines)
    print(out)
    return out
