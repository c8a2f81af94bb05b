"""Model-axis parallelism: 2-D ``(data, model)`` meshes.

TPU-first replacement for the reference's (unused) DDP plumbing on the
scaling axis DDP cannot cover (SURVEY.md section 2.8, section 5.7): when a
single chip's HBM — not FLOPs — binds at high resolution, sharding must
split the *model*, not just the batch.  Rather than wrapping modules, the
design is declarative: parameters are *placed* channel-sharded over the
``model`` mesh axis with ``NamedSharding``, and GSPMD partitions every
conv, both WGAN-GP backward passes, the Adam update and the EMA
accordingly, inserting the all-gathers/psums over ICI.  The train step
(pgx/train/wgan.py) is sharding-agnostic and unchanged.

Two modes, composable with data parallelism on the same mesh:

- ``channels`` (tensor parallelism): every float parameter whose trailing
  dim divides the model-axis size is sharded on that dim — conv HWIO
  kernels and biases on C_out, the HWOI transpose-conv input projection on
  its latent dim, linears on their output dim.  Splits params, Adam
  moments and the widest activations tp-ways.  Indivisible leaves (the
  3-channel to_rgb heads, scalars, RNG keys, counters) stay replicated.
- ``spatial``: parameters replicated, *images* sharded over H (batch over
  ``data``, height over ``model``).  GSPMD partitions the convs spatially
  with halo exchanges — the right axis when activations (not params)
  dominate, e.g. 1024px batches.

Use ``--model-parallel N [--model-parallel-mode channels|spatial]`` on any
trainer CLI; correctness is pinned by tests/test_tp.py (sharded == single
device on the full production recipe).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh_2d(n_data: int, n_model: int,
                 devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A ``(data, model)`` mesh over the first ``n_data * n_model`` devices.

    The model axis is the *minor* (fastest-varying) dim, so on real slices
    the model-parallel collectives (per-layer all-gathers / halo
    exchanges) ride adjacent-chip ICI links while the once-per-step
    gradient psum spans the rest.
    """
    devices = list(devices) if devices is not None else jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(f"mesh {n_data}x{n_model} needs {need} devices, "
                         f"have {len(devices)}")
    if jax.process_count() > 1 and jax.local_device_count() % n_model:
        # The minor model axis must lie within hosts: jax.devices() is
        # process-major, so model groups are consecutive devices.  A model
        # axis spanning processes would also make the prefetcher's
        # process-local batch assembly infer a WRONG global batch (each
        # host's distinct per-seed slice treated as a replica) — silent
        # divergence, not a crash — so reject the topology outright.
        raise ValueError(
            f"model_parallel={n_model} does not divide the "
            f"{jax.local_device_count()} local devices per host; the "
            f"model axis must not span hosts")
    arr = np.asarray(devices[:need]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def make_mesh_2d_for_batch(batch_size: int, n_model: int,
                           devices: Optional[Sequence[jax.Device]] = None
                           ) -> Mesh:
    """Largest ``(data, model)`` mesh such that data | batch_size.

    Mirrors ``make_mesh_for_batch``: warns when devices are dropped."""
    import warnings
    devices = list(devices) if devices is not None else jax.devices()
    if len(devices) % n_model:
        raise ValueError(f"model_parallel={n_model} does not divide the "
                         f"{len(devices)} available devices")
    n_data = len(devices) // n_model
    while n_data > 1 and batch_size % n_data:
        n_data -= 1
    if n_data * n_model < len(devices) and jax.process_count() > 1:
        # dropping devices in a multi-host run can exclude another host's
        # chips entirely; every process must enter every jitted step
        # (pgx/train/loop.py), so that hangs/crashes instead of training —
        # refuse loudly rather than warn
        raise ValueError(
            f"batch_size={batch_size} is not divisible by "
            f"{len(devices)}//{n_model} data shards; a multi-host run "
            f"cannot drop devices — raise batch_size to a multiple of "
            f"{len(devices) // n_model}")
    if n_data * n_model < len(devices):
        warnings.warn(
            f"batch_size={batch_size} is not divisible by "
            f"{len(devices)}//{n_model} data shards; using a "
            f"{n_data}x{n_model} mesh ({n_data * n_model} of "
            f"{len(devices)} devices)", RuntimeWarning, stacklevel=2)
    return make_mesh_2d(n_data, n_model, devices)


def _leaf_spec(leaf, n_model: int) -> P:
    """Channel-sharding rule for one train-state leaf.

    Shard the trailing dim over the model axis iff the leaf is floating
    (RNG keys / iteration counters / optax counts must replicate) and the
    dim divides the axis.  The trailing dim is C_out for conv HWIO and
    bias, the latent dim for the HWOI transpose-conv projection and the
    embedding table — all valid partitions (output- resp.
    contraction-sharded; GSPMD inserts the psum for the latter)."""
    shape = jnp.shape(leaf)
    dtype = getattr(leaf, "dtype", None)
    if (not shape or dtype is None
            or not jnp.issubdtype(dtype, jnp.floating)
            or shape[-1] % n_model):
        return P()
    return P(*([None] * (len(shape) - 1)), MODEL_AXIS)


def state_shardings(state, mesh: Mesh):
    """Pytree of ``NamedSharding`` for a train state (or params tree)
    under channel-mode tensor parallelism on ``mesh``'s model axis."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, _leaf_spec(leaf, n_model)), state)


def shard_state(mesh: Mesh, state):
    """Place a (host or replicated) train state channel-sharded.

    Multi-host safe: every process holds the full identical state
    (same-seed init or broadcast), so each addressable shard is served
    by slicing the local copy (``make_array_from_callback``)."""
    shardings = state_shardings(state, mesh)
    if jax.process_count() > 1:
        def place(a, sh):
            a = np.asarray(a)
            return jax.make_array_from_callback(
                a.shape, sh, lambda idx: a[idx])
        return jax.tree.map(place, state, shardings)
    return jax.tree.map(jax.device_put, state, shardings)


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batch sharding for spatial mode: batch over ``data``, image
    height over ``model``.  GSPMD spatially partitions every conv that
    touches it (halo exchange at the 3x3 borders).

    Multi-host note: the prefetcher assembles global batches from
    process-local slices along the BATCH dim, so in multi-host runs the
    model axis must lie within a host (both modes; ``make_mesh_2d``
    enforces local_device_count % n_model == 0)."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def use_spatial_sharding(resolution: int, n_model: int) -> bool:
    """Spatial mode's per-stage gate: early growth stages can be SHORTER
    than the model axis (4px with --model-parallel 8), where splitting H
    n_model-ways is impossible — those stages fall back to batch-only
    sharding.  Powers of two make divisibility the whole condition."""
    return resolution % n_model == 0
