"""Pallas TPU kernel registry (the custom_ops analogue).

The reference JIT-compiles CUDA plugins at import with cached build dirs
(ada/torch_utils/custom_ops.py:46-124) and falls back to pure-torch refs.
Here kernel availability is decided once per process (Pallas requires a TPU
backend or interpret mode), and callers go through the dispatchers which
pick the Pallas fast path or the lax reference path.
"""

from __future__ import annotations

import functools
import os

import jax


@functools.lru_cache(maxsize=1)
def pallas_available() -> bool:
    if os.environ.get("PGX_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


from pgx.ops.pallas.kernels import (  # noqa: F401,E402
    bias_act_pallas,
    pixel_norm_lrelu_pallas,
    upfirdn2d_pallas,
)
