"""Equalized-learning-rate layer primitives, TPU-first.

The reference implements equalized LR as a torch forward-pre-hook that
recomputes ``weight = weight_orig * sqrt(2 / fan_in)`` before every forward
(reference: progan_modules.py:8-51).  Here the parameters are stored at their
raw N(0,1) initialization and the He constant is a *static* Python float folded
into the jitted graph at apply time — semantically identical (optimizer sees
the raw weights, forward sees the scaled weights) with zero runtime overhead.

fan_in semantics reproduce the reference's quirk exactly
(``fan_in = w.size(1) * w[0][0].numel()``, progan_modules.py:24):
  * Conv2d           (torch OIHW)  -> fan_in = in_ch * kh * kw
  * ConvTranspose2d  (torch IOHW)  -> fan_in = out_ch * kh * kw   (quirk!)
  * Linear           (torch OI)    -> fan_in = in_features
  * Embedding        (torch NE)    -> fan_in = embedding_dim

Parameters are plain dict pytrees; all image tensors are NHWC; conv kernels
are stored HWIO (transpose-conv kernels HWOI, see ``equal_conv_transpose2d``).
Compute runs in ``x.dtype`` (callers pick f32 or bf16); scales are applied in
f32 then cast.  Convs/matmuls keep the compute dtype end-to-end — the TPU MXU
accumulates in f32 internally for bf16 operands, and leaving the output dtype
equal to the input dtype keeps forward and VJP kernels dtype-consistent
(an explicit f32 preferred_element_type breaks the bf16 backward conv).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

_CONV_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def _normal(key, shape):
    return jax.random.normal(key, shape, dtype=jnp.float32)


# ---------------------------------------------------------------------------
# PixelNorm / LeakyReLU / minibatch stddev
# ---------------------------------------------------------------------------

def pixel_norm(x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Per-pixel channel normalization: x / sqrt(mean_c(x^2) + eps).

    Reference: progan_modules.py:54-60 (channel dim there is 1/NCHW; here -1).

    The reduction accumulates in the compute dtype: exact in f32/f64, and in
    bf16 mode it stays bf16 end-to-end — profiling showed XLA's default
    f32-accumulation converts around every pixel-norm reduce were ~1/4 of
    device time at the 128px flagship (G fwd 20.0 -> 14.3 ms with this).
    """
    ssq = jnp.sum(jnp.square(x), axis=-1, keepdims=True, dtype=x.dtype)
    inv_c = jnp.asarray(1.0 / x.shape[-1], x.dtype)
    return x * lax.rsqrt(ssq * inv_c + jnp.asarray(eps, x.dtype))


def leaky_relu(x: jnp.ndarray, slope: float = 0.2) -> jnp.ndarray:
    return jnp.where(x >= 0, x, slope * x)


def minibatch_stddev(x: jnp.ndarray, eps: float = 1e-8,
                     axis_name: Optional[str] = None) -> jnp.ndarray:
    """Append the minibatch-stddev feature map as one extra channel.

    Biased variance over the batch per (H, W, C) position, sqrt(var + eps),
    averaged to a scalar, broadcast to (B, H, W, 1) and concatenated.
    Reference: progan_modules.py:289-293.

    ``axis_name`` computes the statistic over a mapped device axis (for
    shard_map/pmap use).  Under plain jit + GSPMD sharding, batch reductions
    are already global, matching the reference's single-device semantics.
    """
    if axis_name is None:
        var = jnp.var(x, axis=0)
    else:
        n = lax.psum(jnp.ones((), x.dtype), axis_name) * x.shape[0]
        mean = lax.psum(jnp.sum(x, axis=0), axis_name) / n
        var = lax.psum(jnp.sum(jnp.square(x - mean), axis=0), axis_name) / n
    mean_std = jnp.mean(jnp.sqrt(var + eps))
    b, h, w, _ = x.shape
    feat = jnp.full((b, h, w, 1), mean_std, dtype=x.dtype)
    return jnp.concatenate([x, feat], axis=-1)


# ---------------------------------------------------------------------------
# Equalized conv / linear / embedding
# ---------------------------------------------------------------------------

def equal_conv2d_init(key, in_ch: int, out_ch: int, kernel: int) -> Params:
    """EqualConv2d params: w ~ N(0,1) HWIO, b = 0. Ref: progan_modules.py:63-73."""
    return {
        "w": _normal(key, (kernel, kernel, in_ch, out_ch)),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def equal_conv2d(p: Params, x: jnp.ndarray, padding: int = 0,
                 stride: int = 1) -> jnp.ndarray:
    kh, kw, in_ch, _ = p["w"].shape
    scale = math.sqrt(2.0 / (in_ch * kh * kw))
    w = (p["w"] * scale).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_CONV_DIMNUMS,
    )
    return y + p["b"].astype(x.dtype)


def equal_conv_transpose2d_init(key, in_ch: int, out_ch: int,
                                kernel: int) -> Params:
    """EqualConvTranspose2d params, stored HWOI (out, in trailing).

    Ref: progan_modules.py:76-92. The HWOI layout mirrors torch's IOHW so the
    reference fan_in quirk (out_ch * k * k) maps onto axis -2.
    """
    return {
        "w": _normal(key, (kernel, kernel, out_ch, in_ch)),
        "b": jnp.zeros((out_ch,), jnp.float32),
    }


def equal_conv_transpose2d(p: Params, x: jnp.ndarray, stride: int = 1,
                           padding: int = 0) -> jnp.ndarray:
    """Transposed conv matching torch ConvTranspose2d semantics.

    Implemented as input-dilated regular convolution with a spatially flipped
    kernel and padding (k - 1 - p) — the standard equivalence, expressed so XLA
    tiles it onto the MXU like any other conv.
    """
    kh, kw, out_ch, _ = p["w"].shape
    scale = math.sqrt(2.0 / (out_ch * kh * kw))  # reference fan_in quirk
    w = p["w"] * scale
    w = jnp.flip(w, axis=(0, 1))          # HWOI, flipped spatially
    w = jnp.swapaxes(w, 2, 3)             # -> HWIO for a regular conv
    pad = ((kh - 1 - padding, kh - 1 - padding),
           (kw - 1 - padding, kw - 1 - padding))
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=pad,
        lhs_dilation=(stride, stride),
        dimension_numbers=_CONV_DIMNUMS,
    )
    return y + p["b"].astype(x.dtype)


def latent_to_4x4(p: Params, z: jnp.ndarray) -> jnp.ndarray:
    """Fast path for the 4x4 'input layer': ConvTranspose2d(k=4,s=1,p=0) on a
    1x1 spatial input is exactly a dense map z -> (4,4,out); expressed as one
    MXU matmul instead of a dilated conv. Ref call site: progan_modules.py:182.
    """
    kh, kw, out_ch, in_ch = p["w"].shape
    scale = math.sqrt(2.0 / (out_ch * kh * kw))
    w = (p["w"] * scale).astype(z.dtype).reshape(kh * kw * out_ch, in_ch)
    y = jax.lax.dot_general(z, w, (((1,), (1,)), ((), ())))
    y = y.reshape(z.shape[0], kh, kw, out_ch)
    return y + p["b"].astype(z.dtype)


def equal_linear_init(key, in_dim: int, out_dim: int) -> Params:
    """EqualLinear params: w (in, out) ~ N(0,1), b = 0. Ref: progan_modules.py:95-106."""
    return {
        "w": _normal(key, (in_dim, out_dim)),
        "b": jnp.zeros((out_dim,), jnp.float32),
    }


def equal_linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    in_dim = p["w"].shape[0]
    scale = math.sqrt(2.0 / in_dim)
    w = (p["w"] * scale).astype(x.dtype)
    y = jax.lax.dot_general(x, w, (((x.ndim - 1,), (0,)), ((), ())))
    return y + p["b"].astype(x.dtype)


def embedding_init(key, num_embeddings: int, dim: int) -> Params:
    """Embedding table ~ N(0,1) (torch nn.Embedding default init)."""
    return {"w": _normal(key, (num_embeddings, dim))}


def embedding(p: Params, labels: jnp.ndarray, equalized: bool = False,
              dtype=jnp.float32) -> jnp.ndarray:
    """Label embedding lookup; ``equalized`` applies the EqualEmbed scale
    sqrt(2 / dim) (reference fan_in quirk for Embedding: fan_in = dim;
    progan_modules.py:109-117)."""
    w = p["w"]
    if equalized:
        w = w * math.sqrt(2.0 / w.shape[1])
    return jnp.take(w, labels, axis=0).astype(dtype)


# ---------------------------------------------------------------------------
# Conv blocks
# ---------------------------------------------------------------------------

def conv_block_init(key, in_ch: int, out_ch: int, kernel1: int = 3,
                    kernel2: Optional[int] = None) -> Params:
    """Two-conv block params. Ref: ConvBlock, progan_modules.py:120-148."""
    k1, k2 = jax.random.split(key)
    kernel2 = kernel1 if kernel2 is None else kernel2
    return {
        "conv1": equal_conv2d_init(k1, in_ch, out_ch, kernel1),
        "conv2": equal_conv2d_init(k2, out_ch, out_ch, kernel2),
    }


def conv_block(p: Params, x: jnp.ndarray, padding1: int = 1,
               padding2: Optional[int] = None, use_pixel_norm: bool = True,
               slope: float = 0.2) -> jnp.ndarray:
    """[EqualConv2d -> PixelNorm? -> LeakyReLU] x2."""
    padding2 = padding1 if padding2 is None else padding2
    x = equal_conv2d(p["conv1"], x, padding=padding1)
    if use_pixel_norm:
        x = pixel_norm(x)
    x = leaky_relu(x, slope)
    x = equal_conv2d(p["conv2"], x, padding=padding2)
    if use_pixel_norm:
        x = pixel_norm(x)
    x = leaky_relu(x, slope)
    return x


def single_conv_block_init(key, in_ch: int, out_ch: int,
                           kernel: int = 3) -> Params:
    """Single-conv block params. Ref: MnistConvBlock, progan_modules.py:151-164."""
    return {"conv1": equal_conv2d_init(key, in_ch, out_ch, kernel)}


def single_conv_block(p: Params, x: jnp.ndarray, padding: int = 1,
                      use_pixel_norm: bool = True,
                      slope: float = 0.2) -> jnp.ndarray:
    x = equal_conv2d(p["conv1"], x, padding=padding)
    if use_pixel_norm:
        x = pixel_norm(x)
    return leaky_relu(x, slope)
