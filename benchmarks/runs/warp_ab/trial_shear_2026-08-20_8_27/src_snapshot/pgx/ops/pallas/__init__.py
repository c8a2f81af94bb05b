"""Pallas TPU kernel registry (the custom_ops analogue).

The reference JIT-compiles CUDA plugins at import with cached build dirs
(ada/torch_utils/custom_ops.py:46-124) and falls back to pure-torch refs.
Here the lax formulations in pgx.ops are the default path and the Pallas
kernels are an opt-in fast path: set ``PGX_USE_PALLAS=1`` to route
``pgx.ops.upfirdn2d`` (separable filters, up/down <= 2) and
``pgx.ops.bias_act`` through them on a TPU backend.  Default stays lax
because XLA's conv lowering benches slightly faster for the FIR shapes,
while the Pallas path is exact f32 (no bf16 MXU rounding) — see
tests/test_pallas_kernels.py and the kernel docstrings.
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


def pallas_enabled() -> bool:
    """Opt-in dispatch switch consulted by the pgx.ops dispatchers."""
    return bool(os.environ.get("PGX_USE_PALLAS")) and pallas_available()


from pgx.ops.pallas.kernels import (  # noqa: F401,E402
    bias_act_pallas,
    pixel_norm_lrelu_pallas,
    upfirdn2d_pallas,
)
from pgx.ops.pallas.shear import shift_1d_pallas  # noqa: F401,E402
