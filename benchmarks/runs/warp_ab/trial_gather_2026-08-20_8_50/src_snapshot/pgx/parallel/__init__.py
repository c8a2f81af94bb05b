"""Mesh/sharding helpers and distributed training stats."""

from pgx.parallel import stats  # noqa: F401
from pgx.parallel.distributed import (  # noqa: F401
    host_batch_slice,
    initialize_multihost,
    make_global_batch,
)
from pgx.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    make_mesh_for_batch,
    replicate,
    replicated,
    shard_batch,
)
from pgx.parallel.tp import (  # noqa: F401
    make_mesh_2d,
    make_mesh_2d_for_batch,
    shard_state,
    spatial_batch_sharding,
    state_shardings,
)
from pgx.parallel.stats import (  # noqa: F401
    Collector,
    check_replica_consistency,
    init_moments,
    psum_moments,
    report,
)
