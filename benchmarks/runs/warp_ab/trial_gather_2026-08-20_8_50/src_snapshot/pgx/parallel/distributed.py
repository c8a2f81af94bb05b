"""Multi-host (DCN) initialization and input-sharding helpers.

The reference never initializes a process group (SURVEY.md section 5.8);
its vendored DDP plumbing maps onto JAX as:

* ``torch.distributed.init_process_group``  -> ``initialize_multihost``
  (jax.distributed.initialize; ICI collectives within a slice, DCN across
  hosts are then implicit in GSPMD lowering);
* rank-sharded ``InfiniteSampler``          -> ``host_batch_slice`` (each
  host feeds its addressable shard of the global batch) together with
  ``pgx.utils.misc.InfiniteSampler(rank, num_replicas)``;
* ``check_ddp_consistency``                 -> ``pgx.parallel.stats.
  check_replica_consistency``.

Single-host slices (including this container's one chip) need none of this
— ``make_mesh`` over ``jax.devices()`` is enough.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize cross-host JAX.

    Returns (process_index, process_count).  With all arguments None the
    call is forwarded to ``jax.distributed.initialize()`` which auto-detects
    TPU-pod topology from the environment; explicitly pass
    ``num_processes=1`` (or simply don't call this) for single-process runs.
    """
    if num_processes == 1:
        return jax.process_index(), jax.process_count()
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return jax.process_index(), jax.process_count()


def broadcast_obj(obj=None):
    """Broadcast a picklable object from process 0 to every process.

    Two-phase broadcast (length, then payload) over
    ``multihost_utils.broadcast_one_to_all`` so hosts WITHOUT a shared
    filesystem can receive configs / scalars resolved on the main host
    (resume metadata, schedule state).  Non-main processes pass anything
    (ignored).  Single-process: returns ``obj`` unchanged.
    """
    if jax.process_count() == 1:
        return obj
    import pickle

    import numpy as np
    from jax.experimental import multihost_utils

    if jax.process_index() == 0:
        payload = np.frombuffer(pickle.dumps(obj), np.uint8).copy()
    else:
        payload = np.zeros(0, np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(
        np.asarray(payload.size, np.int32)))
    buf = np.zeros(n, np.uint8)
    if jax.process_index() == 0:
        buf[:] = payload
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return pickle.loads(buf.tobytes())


def broadcast_state(state):
    """Broadcast a pytree of arrays from process 0 (same structure on every
    process; non-main values are shape/dtype placeholders).  Used at resume
    time so only the main host needs the checkpoint files on disk."""
    if jax.process_count() == 1:
        return state
    import numpy as np
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(jax.device_get(state))
    return jax.tree.map(np.asarray, out)


def host_batch_slice(global_batch: int) -> Tuple[int, int, int]:
    """(host_batch, start, end): this process's slice of the global batch
    when each host assembles only its addressable shard."""
    n = jax.process_count()
    assert global_batch % n == 0, (
        f"global batch {global_batch} not divisible by {n} hosts")
    per = global_batch // n
    start = jax.process_index() * per
    return per, start, start + per


def make_global_batch(mesh, host_arrays, axis_name: str = "data"):
    """Assemble a globally-sharded array from per-host shards
    (jax.make_array_from_process_local_data wrapper; the library-API
    counterpart of DevicePrefetcher's internal put path)."""
    from pgx.parallel.mesh import batch_sharding

    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, a),
        host_arrays)
