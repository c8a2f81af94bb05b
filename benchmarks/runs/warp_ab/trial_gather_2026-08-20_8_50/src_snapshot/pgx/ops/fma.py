"""Fused multiply-add (reference: ada/torch_utils/ops/fma.py).

The reference wraps torch.addcmul with a custom backward incl. broadcasting
un-reduction (:20-58).  XLA fuses ``a * b + c`` and differentiates through
broadcasting natively, so the TPU-native op is the expression itself.
"""

import jax.numpy as jnp


def fma(a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    return a * b + c
