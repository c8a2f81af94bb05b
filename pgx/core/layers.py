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
import threading
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
                     axis_name: Optional[str] = None,
                     groups: int = 1) -> jnp.ndarray:
    """Append the minibatch-stddev feature map as one extra channel.

    Biased variance over the batch per (H, W, C) position, sqrt(var + eps),
    averaged to a scalar, broadcast to (B, H, W, 1) and concatenated.
    Reference: progan_modules.py:289-293.

    ``axis_name`` computes the statistic over a mapped device axis (for
    shard_map/pmap use).  Under plain jit + GSPMD sharding, batch reductions
    are already global, matching the reference's single-device semantics.

    ``groups > 1`` computes the statistic independently per contiguous
    batch slice of size ``B / groups`` — the per-slice semantics of the
    batched-D dispatch (``TrainConfig.d_concat``), where one 3B forward
    over ``concat([real, fake, x_hat])`` must score each B-slice exactly
    as three separate B-batch forwards would (no cross-slice coupling).
    """
    if groups > 1:
        if axis_name is not None:
            raise ValueError("minibatch_stddev: groups and axis_name are "
                             "mutually exclusive (grouped stats are a "
                             "single-call dispatch detail)")
        b, h, w, c = x.shape
        if b % groups:
            raise ValueError(f"batch {b} not divisible by groups={groups}")
        xg = x.reshape(groups, b // groups, h, w, c)
        var = jnp.var(xg, axis=1)                       # (G, H, W, C)
        mean_std = jnp.mean(jnp.sqrt(var + eps), axis=(1, 2, 3))   # (G,)
        feat = jnp.broadcast_to(
            mean_std[:, None, None, None, None],
            (groups, b // groups, h, w, 1)).reshape(b, h, w, 1)
        return jnp.concatenate([x, feat.astype(x.dtype)], axis=-1)
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
                 stride: int = 1, bias: bool = True) -> jnp.ndarray:
    kh, kw, in_ch, _ = p["w"].shape
    scale = math.sqrt(2.0 / (in_ch * kh * kw))
    w = (p["w"] * scale).astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_CONV_DIMNUMS,
    )
    if not bias:
        return y  # caller fuses the bias into the epilogue
    return y + p["b"].astype(x.dtype)


# Bilinear 2x upsample as zero-stuff + 4-tap FIR: out =
# corr(dilate2(edge_pad(x,1)), F4), F4 = [1,3,3,1]/4 — the shared constant
# from the real resize op, so the fusion can't drift from it.
from pgx.ops.resize import UP_FIR as _UP_FIR              # noqa: E402
from pgx.ops.resize import _upsample2x_axis_h             # noqa: E402


def equal_conv2d_up2x(p: Params, x: jnp.ndarray,
                      bias: bool = True) -> jnp.ndarray:
    """Fused ``equal_conv2d(p, upsample2x(x), padding=1)``.

    upsample2x (bilinear, torch align_corners=False parity) is itself a
    zero-stuffing + 4-tap FIR per axis, so upsample->3x3-conv is ONE conv
    over the low-res input: correlate the dilated edge-padded input with the
    composed 6x6 kernel K = W (*) F4xF4 (full convolution of the 3x3 kernel
    with the separable upsample filter).  Exact linear composition — the
    2x-resolution intermediate (the generator's largest tensors,
    progan_modules.py:205) is never materialized in HBM; XLA lowers the
    lhs_dilated conv onto the MXU directly.

    Derivation (1-D): up[i] = sum_k F4[k] u[i+k] with u = dilate2(edge_pad
    (x,1)); conv3-pad1 gives y[i] = sum_m K[m] u[i+m-1], K = conv_full(W,F4)
    -> lhs_dilation=2, padding=(1,1), kernel 6, out length exactly 2H.
    """
    kh, kw, in_ch, out_ch = p["w"].shape
    assert (kh, kw) == (3, 3), "fused up-conv is specialized to 3x3 kernels"
    scale = math.sqrt(2.0 / (in_ch * kh * kw))
    w = (p["w"] * scale).astype(x.dtype)

    # Composed kernel: K[m,n,i,o] = sum_{j,l} F4[m-j] F4[n-l] w[j,l,i,o]
    # (full convolution of each 3x3 plane with F4xF4).  The band structure
    # is expanded to explicit weighted sums — profiled faster than both a
    # batched-conv formulation (IO-batch of 3x3 single-channel images,
    # ~10x) and a band-matrix matmul (6x3 operands pad MXU tiles terribly).
    f = _UP_FIR

    def band_mix(t):
        # (3, ...) -> (6, ...): out[m] = sum_j F4[m-j] t[j]
        return jnp.stack([
            f[0] * t[0],
            f[1] * t[0] + f[0] * t[1],
            f[2] * t[0] + f[1] * t[1] + f[0] * t[2],
            f[3] * t[0] + f[2] * t[1] + f[1] * t[2],
            f[3] * t[1] + f[2] * t[2],
            f[3] * t[2],
        ])

    k6 = band_mix(jnp.swapaxes(band_mix(w), 0, 1))
    k6 = jnp.swapaxes(k6, 0, 1)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = lax.conv_general_dilated(
        xp, k6, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2), dimension_numbers=_CONV_DIMNUMS)

    # Border correction.  The sequential form zero-pads in UPSAMPLED space
    # before the 3x3 conv; the composed conv instead keeps reading the FIR's
    # natural extension one sample beyond each upsampled edge.  Those
    # out-of-range samples have a closed form — ext_up[-1, :] row is exactly
    # the 1-D W-upsample of x's first row (with corner pixels at the ends),
    # and symmetrically for the other three edges — so subtracting their
    # 3-tap conv contribution from the output border makes the fusion exact.
    def corr1d(strip, taps):           # strip (B, L, C), taps (3, C, O)
        return lax.conv_general_dilated(
            strip, taps, window_strides=(1,), padding=((0, 0),),
            dimension_numbers=("NHC", "HIO", "NHC"))

    def up1d(v):                        # (B, L, C) -> (B, 2L, C)
        # the 1-D strip form of pgx.ops.resize.upsample2x — share its tap
        # math so the border correction can never drift from the real op
        vp = jnp.pad(v[:, :, None, :], ((0, 0), (1, 1), (0, 0), (0, 0)),
                     mode="edge")
        return _upsample2x_axis_h(vp)[:, :, 0, :]

    w3 = w                              # (3, 3, Cin, Cout), already scaled
    top = jnp.concatenate([x[:, 0, :1], up1d(x[:, 0]), x[:, 0, -1:]], axis=1)
    bot = jnp.concatenate([x[:, -1, :1], up1d(x[:, -1]), x[:, -1, -1:]],
                          axis=1)
    c_top = corr1d(top, w3[0])          # (B, 2W, O) for output row 0
    c_bot = corr1d(bot, w3[2])          # for output row 2H-1
    # column strips exclude corners (already counted in the row strips):
    # zero-pad the in-range strip so the 3-tap window never reads a corner
    left = jnp.pad(up1d(x[:, :, 0]), ((0, 0), (1, 1), (0, 0)))
    right = jnp.pad(up1d(x[:, :, -1]), ((0, 0), (1, 1), (0, 0)))
    c_left = corr1d(left, w3[:, 0])     # (B, 2H, O) for output col 0
    c_right = corr1d(right, w3[:, 2])   # for output col 2W-1

    h2, w2 = y.shape[1], y.shape[2]
    y = y - jnp.pad(c_top[:, None], ((0, 0), (0, h2 - 1), (0, 0), (0, 0)))
    y = y - jnp.pad(c_bot[:, None], ((0, 0), (h2 - 1, 0), (0, 0), (0, 0)))
    y = y - jnp.pad(c_left[:, :, None], ((0, 0), (0, 0), (0, w2 - 1), (0, 0)))
    y = y - jnp.pad(c_right[:, :, None], ((0, 0), (0, 0), (w2 - 1, 0), (0, 0)))
    if not bias:
        return y  # caller fuses the bias into the epilogue
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


def conv_epilogue(y: jnp.ndarray, b: jnp.ndarray, use_pixel_norm: bool,
                  slope: float = 0.2) -> jnp.ndarray:
    """bias -> PixelNorm? -> LeakyReLU on a pre-bias conv output.

    A one-pass Pallas kernel exists (pgx/ops/pallas/epilogue.py) and wins
    in isolation (XLA lowers this chain as three read+write fusions), but
    measured END-TO-END it loses: its custom_jvp linearization
    materializes the (a, r) coefficient tensors as residuals that XLA's
    native VJP would recompute inside fused backward kernels, costing
    more HBM traffic than the fused forward saves (130 -> 105 img/s at
    the 128px flagship).  It therefore stays opt-in (PGX_USE_PALLAS=1,
    e.g. for no-grad inference paths); the XLA composition is the
    default and the oracle.
    """
    if use_pixel_norm:
        from pgx.ops.pallas import pallas_enabled
        if pallas_enabled():
            from pgx.ops.pallas.epilogue import (bias_pixelnorm_lrelu,
                                                 supported)
            if supported(y):
                return bias_pixelnorm_lrelu(y, b, slope)
    y = y + b.astype(y.dtype)
    if use_pixel_norm:
        y = pixel_norm(y)
    return leaky_relu(y, slope)


_FUSED_SCOPE = threading.local()  # per-thread trace-time stack


class fused_conv_scope:
    """Trace-time scope forcing the fused conv kernel on (or off) for the
    enclosed apply calls.  This is an opt-in EXPERIMENTATION hook: no
    production path uses it.  Scoping it into the training step's two
    forward-only positions (the D step's stop_gradient'd G forward, eval
    sampling) was measured as an end-to-end REGRESSION (130.2 -> 122.7
    img/s flagship; 19.1 -> 29.5 ms sampling) despite the kernel's
    isolated microbench win (1.06x at 16^2, 1.26x at 32^2) — the pallas_call
    boundary blocks XLA's cross-op scheduling; see the round-3 notes in
    pgx/train/wgan.py and benchmarks/README.md before re-enabling."""

    def __init__(self, enabled: bool = True):
        self.enabled = enabled

    def __enter__(self):
        stack = getattr(_FUSED_SCOPE, "stack", None)
        if stack is None:
            stack = _FUSED_SCOPE.stack = []
        stack.append(self.enabled)
        return self

    def __exit__(self, *exc):
        _FUSED_SCOPE.stack.pop()
        return False


def _fused_conv_enabled() -> bool:
    """Dispatch switch for the one-pass Pallas conv3x3+epilogue kernel
    (see pgx/ops/pallas/conv_epilogue.py): ON only inside a
    ``fused_conv_scope`` — positions that are forward-only or first-order
    (its custom_vjp cannot sit under the WGAN-GP double-backward:
    custom_vjp is once-differentiable, so D's conv blocks must stay XLA).
    ``PGX_DISABLE_FUSED_CONV=1`` kills it everywhere.  Note: the fused
    kernel accumulates the pixel-norm statistic in f32 (the default XLA
    path deliberately stays bf16, pixel_norm above) — numerics are
    slightly *better*, not bit-identical, where it applies."""
    import os

    from pgx.ops.pallas import pallas_available
    if os.environ.get("PGX_DISABLE_FUSED_CONV"):
        return False
    stack = getattr(_FUSED_SCOPE, "stack", None)
    return bool(stack and stack[-1]) and pallas_available()


def _maybe_fused_conv_step(p: Params, x: jnp.ndarray, padding: int,
                           use_pixel_norm: bool, slope: float):
    """The fused Pallas kernel when enabled + shape-supported, else None."""
    kh, kw, in_ch, _ = p["w"].shape
    if padding != 1 or (kh, kw) != (3, 3) or not _fused_conv_enabled():
        return None
    from pgx.ops.pallas.conv_epilogue import make_conv3x3_epilogue, supported
    if not supported(x, p["w"]):
        return None
    scale = math.sqrt(2.0 / (in_ch * kh * kw))
    op = make_conv3x3_epilogue(use_pixel_norm=use_pixel_norm, slope=slope)
    return op(x, p["w"] * scale, p["b"])


def conv_block(p: Params, x: jnp.ndarray, padding1: int = 1,
               padding2: Optional[int] = None, use_pixel_norm: bool = True,
               slope: float = 0.2, upsample_first: bool = False) -> jnp.ndarray:
    """[EqualConv2d -> PixelNorm? -> LeakyReLU] x2.

    ``upsample_first`` fuses a preceding bilinear upsample2x into conv1
    (exact; see equal_conv2d_up2x) — the caller passes the LOW-res input.
    """
    padding2 = padding1 if padding2 is None else padding2
    if upsample_first:
        x = equal_conv2d_up2x(p["conv1"], x, bias=False)
        x = conv_epilogue(x, p["conv1"]["b"], use_pixel_norm, slope)
    else:
        fused = _maybe_fused_conv_step(p["conv1"], x, padding1,
                                       use_pixel_norm, slope)
        if fused is None:
            x = equal_conv2d(p["conv1"], x, padding=padding1, bias=False)
            x = conv_epilogue(x, p["conv1"]["b"], use_pixel_norm, slope)
        else:
            x = fused
    fused = _maybe_fused_conv_step(p["conv2"], x, padding2,
                                   use_pixel_norm, slope)
    if fused is not None:
        return fused
    x = equal_conv2d(p["conv2"], x, padding=padding2, bias=False)
    x = conv_epilogue(x, p["conv2"]["b"], use_pixel_norm, slope)
    return x


def single_conv_block_init(key, in_ch: int, out_ch: int,
                           kernel: int = 3) -> Params:
    """Single-conv block params. Ref: MnistConvBlock, progan_modules.py:151-164."""
    return {"conv1": equal_conv2d_init(key, in_ch, out_ch, kernel)}


def single_conv_block(p: Params, x: jnp.ndarray, padding: int = 1,
                      use_pixel_norm: bool = True, slope: float = 0.2,
                      upsample_first: bool = False) -> jnp.ndarray:
    if upsample_first:
        x = equal_conv2d_up2x(p["conv1"], x, bias=False)
    else:
        fused = _maybe_fused_conv_step(p["conv1"], x, padding,
                                       use_pixel_norm, slope)
        if fused is not None:
            return fused
        x = equal_conv2d(p["conv1"], x, padding=padding, bias=False)
    return conv_epilogue(x, p["conv1"]["b"], use_pixel_norm, slope)
