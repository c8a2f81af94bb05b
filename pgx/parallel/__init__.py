"""Mesh/sharding helpers and distributed training stats."""

from pgx.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicate,
    replicated,
    shard_batch,
)
