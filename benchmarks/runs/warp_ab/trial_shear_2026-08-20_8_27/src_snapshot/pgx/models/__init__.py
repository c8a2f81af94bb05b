"""Unified progressive G/D models + the reference-zoo factory configs."""

from pgx.models.config import (  # noqa: F401
    DiscriminatorConfig,
    GeneratorConfig,
)
from pgx.models.discriminator import (  # noqa: F401
    discriminator_apply,
    init_discriminator,
)
from pgx.models.generator import (  # noqa: F401
    generator_apply,
    init_generator,
    l2_normalize,
)
from pgx.models import zoo  # noqa: F401
