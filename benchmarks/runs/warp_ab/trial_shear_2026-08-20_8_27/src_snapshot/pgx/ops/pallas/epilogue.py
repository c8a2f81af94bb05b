"""Fused conv-block epilogue: bias + PixelNorm + LeakyReLU, one HBM pass.

Profiling the 128px flagship train step shows the conv-block epilogue
(bias add -> pixel-norm reduce -> rsqrt multiply -> leaky-relu select)
lowered by XLA as three separate fusions, each a full read+write of the
largest activations (~28 ms of a 250 ms step).  This kernel computes the
whole epilogue in a single pass over VMEM row tiles: read the (pre-bias)
conv output once, write the activated result once.  The backward is a
second Pallas kernel (custom_vjp) that recomputes the cheap row statistics
in VMEM instead of re-reading saved intermediates, and emits per-block
bias-gradient partial sums.

Math (per row, channels c = lanes):
  a   = y + b
  r   = rsqrt(mean_c(a^2) + eps)          [pixel norm, progan_modules.py:58]
  out = lrelu(a * r, slope)
Backward, given g:
  dpn = g * (a >= 0 ? 1 : slope)          [sign(a·r) == sign(a), r > 0]
  s   = sum_c(dpn * a)
  da  = r * dpn - r^3 * (s / C) * a
  db  = sum_rows(da)

The row statistics (sum-of-squares, rsqrt) are computed in f32
registers in both the forward kernel and the tangent rule — this
target's VPU has no bf16 rsqrt, and the in-register conversion is free,
so the kernel is slightly MORE accurate than the bf16-accumulating XLA
composition.  Dispatch falls back to the XLA composition off-TPU or for
unsupported shapes; parity is tested in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_tile(rows: int, limit: int = 256) -> int:
    t = min(rows, limit)
    while rows % t:
        t -= 1
    return t


def _fwd_kernel(y_ref, b_ref, o_ref, *, slope, eps, inv_c):
    a = y_ref[:] + b_ref[:]
    # statistics in f32 registers: the target VPU lacks bf16 rsqrt (and
    # comparisons), and the in-register conversion is free — unlike the
    # XLA path, where f32 accumulation meant extra HBM-format passes
    af = a.astype(jnp.float32)
    ssq = jnp.sum(af * af, axis=1, keepdims=True)
    r = lax.rsqrt(ssq * inv_c + eps)
    out = af * r
    o_ref[:] = jnp.where(af < 0.0, slope * out, out).astype(o_ref.dtype)


def supported(y: jnp.ndarray) -> bool:
    c = y.shape[-1]
    rows = int(np.prod(y.shape[:-1]))
    return (c % 128 == 0 and rows % 8 == 0
            and y.dtype in (jnp.bfloat16, jnp.float32))


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3))
def bias_pixelnorm_lrelu(y: jnp.ndarray, b: jnp.ndarray,
                         slope: float = 0.2,
                         eps: float = 1e-8) -> jnp.ndarray:
    """lrelu(pixel_norm(y + b), slope) over NHWC in one fused pass.

    ``y`` is the pre-bias conv output; ``b`` the (C,) bias (any float
    dtype — cast to y.dtype like the unfused path).

    Differentiation: custom_jvp with a plain-jnp tangent rule.  The rule
    is linear in the tangents, so JAX transposes it for reverse mode, and
    it is itself differentiable — which WGAN-GP requires (the gradient
    penalty reverse-differentiates D's reverse gradient).  Only the
    primal runs the Pallas kernel; a custom_vjp with a Pallas backward
    would fail at the GP's second linearization.
    """
    return _forward(y, b, slope, eps)


def _forward(y, b, slope, eps):
    shape = y.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    y2 = y.reshape(rows, c)
    b2 = b.astype(y.dtype).reshape(1, c)
    tile = _row_tile(rows)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, slope=np.float32(slope),
                          eps=np.float32(eps),
                          inv_c=np.float32(1.0 / c)),
        out_shape=jax.ShapeDtypeStruct((rows, c), y.dtype),
        grid=(rows // tile,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(y2, b2)
    return out.reshape(shape)


@bias_pixelnorm_lrelu.defjvp
def _jvp_rule(slope, eps, primals, tangents):
    y, b = primals
    dy, db = tangents
    dt = jnp.dtype(y.dtype)
    c = y.shape[-1]
    inv_c = np.float32(1.0 / c)

    # primal via the function itself so higher-order differentiation
    # re-enters this rule instead of hitting the raw Pallas call
    out = bias_pixelnorm_lrelu(y, b, slope, eps)

    # statistics in f32 to match the forward kernel exactly — the tangent
    # must linearize the same function the primal evaluated
    a = (y + b.astype(dt)).astype(jnp.float32)
    da = (dy + db.astype(dy.dtype)).astype(jnp.float32)
    ssq = jnp.sum(a * a, axis=-1, keepdims=True)
    r = lax.rsqrt(ssq * inv_c + np.float32(eps))
    # d(a*r) = da*r + a*dr,  dr = -r^3 * mean_c(a*da)
    m = jnp.sum(a * da, axis=-1, keepdims=True) * inv_c
    dpn = da * r - a * (r * r * r) * m
    dout = jnp.where(a >= 0, dpn, np.float32(slope) * dpn)
    return out, dout.astype(dt)
