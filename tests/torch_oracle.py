"""Test-only helpers: use the PyTorch reference at /root/reference as a
numerical oracle.

The reference is imported (read-only) and its randomly initialized
state_dicts are transplanted into pgx parameter pytrees (layout conversion
only — no reference code is copied).  Skipped automatically when the
reference checkout is unavailable.
"""

import sys

import numpy as np
import pytest

import jax.numpy as jnp

REFERENCE_PATH = "/root/reference"


def load_reference_modules():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    try:
        import progan_modules  # noqa: F401
        import mnist_pggan  # noqa: F401
    except ImportError:
        pytest.skip("reference checkout not available")
    return progan_modules, mnist_pggan


# The layout-conversion transplant lives in the shipped importer
# (pgx/checkpoint/torch_import.py, the engine behind pgx.cli.import_checkpoint);
# these wrappers keep the oracle tests' module-object interface.
from pgx.checkpoint.torch_import import (  # noqa: F401,E402
    block_from,
    conv_from,
    convt_from,
    discriminator_params_from_state_dict,
    embed_from,
    generator_params_from_state_dict,
    linear_from,
)


def generator_params_from_torch(model, cfg):
    """Transplant any reference generator's state_dict into pgx params."""
    return generator_params_from_state_dict(model.state_dict(), cfg)


def discriminator_params_from_torch(model, cfg):
    """Transplant any reference discriminator's state_dict into pgx params."""
    return discriminator_params_from_state_dict(model.state_dict(), cfg)
