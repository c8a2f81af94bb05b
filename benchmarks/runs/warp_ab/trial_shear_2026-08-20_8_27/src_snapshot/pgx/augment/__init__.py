"""ADA augmentation pipeline + adaptive-p controller."""

from pgx.augment.adaptive import (  # noqa: F401
    AdaConfig,
    ada_update,
    init_ada_state,
)
from pgx.augment.pipe import (  # noqa: F401
    AugmentConfig,
    augment_pipe,
    bgc_config,
)
