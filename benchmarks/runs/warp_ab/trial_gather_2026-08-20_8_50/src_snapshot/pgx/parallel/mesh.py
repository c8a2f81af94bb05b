"""Device mesh and sharding helpers.

The reference is single-process/single-device with unused DDP plumbing
(SURVEY.md section 2.8).  Here data parallelism is first-class: a 1-D
``('data',)`` mesh, batches sharded over it, parameters/optimizer state
replicated.  Under jit + GSPMD the train step's batch reductions (losses,
gradients, minibatch-stddev) are global automatically — XLA inserts the
psums over ICI; no NCCL-style code is needed.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence[jax.Device]] = None,
              axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_for_batch(batch_size: int, axis_name: str = "data") -> Mesh:
    """Largest device prefix that evenly divides the global batch.

    Warns loudly when devices are dropped: e.g. the reference's default
    batch_size=4 on an 8-chip slice would otherwise quietly train on half
    the hardware.
    """
    devices = jax.devices()
    n = len(devices)
    while n > 1 and batch_size % n != 0:
        n -= 1
    if n < len(devices) and jax.process_count() > 1:
        # a prefix-mesh in a multi-host run leaves hosts with uneven
        # device counts, which per-host batch assembly
        # (make_array_from_process_local_data) cannot satisfy — refuse
        # loudly instead of failing at the first batch
        raise ValueError(
            f"batch_size={batch_size} is not divisible by the "
            f"{len(devices)} devices of this multi-host mesh; raise it to "
            f"a multiple of {len(devices)}")
    if n < len(devices):
        warnings.warn(
            f"batch_size={batch_size} is not divisible by the "
            f"{len(devices)} available devices; training will use only "
            f"{n} device(s). Raise batch_size to a multiple of "
            f"{len(devices)} to use the full mesh.", RuntimeWarning,
            stacklevel=2)
    return Mesh(np.asarray(devices[:n]), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays, axis_name: str = "data"):
    """Place host arrays on device, batch-sharded."""
    sh = batch_sharding(mesh, axis_name)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params / train state) across the mesh.

    Multi-host safe: when the mesh spans processes, each host contributes
    its (identical, same-seed) local copy via
    ``make_array_from_process_local_data`` instead of ``device_put``."""
    sh = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sh, np.asarray(a)), tree)
    return jax.tree.map(lambda a: jax.device_put(a, sh), tree)
