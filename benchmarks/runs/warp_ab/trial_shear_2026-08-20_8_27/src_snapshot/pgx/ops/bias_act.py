"""Fused bias + activation + gain + clamp with the reference's 9-activation
registry (ada/torch_utils/ops/bias_act.py:23-33).

The reference hand-writes fwd/1st/2nd-order CUDA kernels selected by a
``grad`` flag (ops/bias_act.cpp:32, bias_act.cu:23-162).  On TPU this whole
op is a short elementwise chain that XLA fuses into the neighboring matmul
epilogue, and nested ``jax.grad`` provides exact 2nd-order gradients — so the
TPU-native "kernel" is simply this function under jit.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Dict, Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ActivationSpec:
    func: Callable
    def_alpha: float
    def_gain: float
    has_2nd_grad: bool  # informational: the reference tracks which CUDA
                        # kernels implement d2y; JAX differentiates them all


activation_funcs: Dict[str, ActivationSpec] = {
    "linear": ActivationSpec(lambda x, a: x, 0.0, 1.0, False),
    "relu": ActivationSpec(lambda x, a: jnp.maximum(x, 0.0), 0.0,
                           math.sqrt(2.0), False),
    "lrelu": ActivationSpec(lambda x, a: jnp.where(x >= 0, x, a * x), 0.2,
                            math.sqrt(2.0), False),
    "tanh": ActivationSpec(lambda x, a: jnp.tanh(x), 0.0, 1.0, True),
    "sigmoid": ActivationSpec(lambda x, a: 1.0 / (1.0 + jnp.exp(-x)), 0.0,
                              1.0, True),
    "elu": ActivationSpec(lambda x, a: jnp.where(x >= 0, x,
                                                 jnp.exp(x) - 1.0), 0.0,
                          1.0, True),
    "selu": ActivationSpec(
        lambda x, a: 1.0507009873554805 * jnp.where(
            x >= 0, x, 1.6732632423543772 * (jnp.exp(x) - 1.0)),
        0.0, 1.0, True),
    "softplus": ActivationSpec(lambda x, a: jnp.logaddexp(x, 0.0), 0.0, 1.0,
                               True),
    "swish": ActivationSpec(lambda x, a: x / (1.0 + jnp.exp(-x)), 0.0,
                            math.sqrt(2.0), True),
}


def bias_act(x: jnp.ndarray, b: Optional[jnp.ndarray] = None, dim: int = -1,
             act: str = "linear", alpha: Optional[float] = None,
             gain: Optional[float] = None,
             clamp: Optional[float] = None) -> jnp.ndarray:
    """y = clamp(gain * act(x + broadcast(b, dim))).

    Matches the reference's public op (ops/bias_act.py:55-89); ``dim`` is the
    channel axis of ``b`` in ``x`` (default -1 for NHWC).
    """
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)
    assert clamp is None or clamp >= 0  # ref ops/bias_act.py:98

    if dim in (-1, x.ndim - 1):
        # opt-in Pallas fast path (PGX_USE_PALLAS=1 on a TPU backend)
        from pgx.ops.pallas import pallas_enabled
        if pallas_enabled():
            from pgx.ops.pallas import bias_act_pallas
            return bias_act_pallas(x, b, act=act, alpha=alpha, gain=gain,
                                   clamp=clamp)

    clamp = float(clamp) if clamp is not None else -1.0

    if b is not None:
        shape = [1] * x.ndim
        shape[dim] = -1
        x = x + b.reshape(shape).astype(x.dtype)
    y = spec.func(x, alpha)
    if gain != 1.0:
        y = y * gain
    if clamp >= 0:
        y = jnp.clip(y, -clamp, clamp)
    return y
