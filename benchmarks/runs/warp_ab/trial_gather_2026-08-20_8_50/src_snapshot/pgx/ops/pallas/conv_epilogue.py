"""Fused 3x3 SAME conv + (bias -> PixelNorm -> LeakyReLU) Pallas kernel.

The round-2 profile showed the 128px flagship step spends ~28 of 247 ms in
conv epilogues: XLA lowers bias/pixel-norm/lrelu as separate fusions, each a
full HBM read+write of the largest activations, because its conv emitters
don't absorb the channel-reduction epilogue.  This kernel is the "fuse the
epilogue INTO the conv" experiment (VERDICT r2 next-step #2, playing the
role the reference's fused bias_act CUDA kernel plays next to cuDNN,
ada/torch_utils/ops/bias_act.cu:23-162): the conv is computed as 9
shifted-tap MXU matmuls accumulating in f32 VMEM, and the epilogue runs
in-register before the single HBM write of the activated output.

Layout notes (Mosaic): x blocks are (bt, H, W, C) with the last two dims
tiled; the (bt*H*W, C) matmul view is relayout-free when W is a multiple of
the sublane tile (16 for bf16, 8 for f32) — hence the ``supported`` gate on
W >= 16 (after padding W+2 slices the dx taps shift sublanes, which Mosaic
handles with a vector shift).  Channel dims must be lane-aligned (128).

The pixel-norm reduction spans ALL output channels, so the kernel tiles the
batch only and holds the full (C_in -> C_out) weight block in VMEM; the
batch tile adapts to the VMEM budget.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024


def _interpret_default() -> bool:
    """Compile on TPU backends; interpret elsewhere (CPU tests)."""
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True


def supported(x: jnp.ndarray, w: jnp.ndarray) -> bool:
    """Shapes this kernel handles: 3x3 SAME conv, NHWC, lane-aligned
    channels, sublane-aligned W, and at least one batch tile in budget."""
    if x.ndim != 4 or w.shape[:2] != (3, 3):
        return False
    b, h, wd, cin = x.shape
    cout = w.shape[3]
    if w.shape[2] != cin or cin % _LANE or cout % _LANE:
        return False
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    if wd % sub or wd < sub or h < 3:
        return False
    return _pick_batch_tile(x, cout) >= 1


def _pick_batch_tile(x: jnp.ndarray, cout: int) -> int:
    b, h, wd, cin = x.shape
    esize = x.dtype.itemsize
    weights = 9 * cin * cout * esize
    per_item = ((h + 2) * (wd + 2) * cin * esize     # padded input copy
                + h * wd * cin * esize               # input block
                + 2 * h * wd * cout * 4)             # f32 acc (+1 temp)
    bt = max(int((_VMEM_BUDGET - weights) // max(per_item, 1)), 0)
    bt = min(bt, b)
    while bt > 1 and b % bt:
        bt -= 1
    return bt


def _kernel(x_ref, w_ref, b_ref, o_ref, r_ref=None, *, use_pn, slope, eps):
    """One body for both variants: when ``r_ref`` is given (the
    differentiated forward) the pixel-norm scale r = rsqrt(mean+eps) is
    additionally written as a (bt, h, w, 1) residual — 1/C_out the size of
    the activation; the backward reconstructs everything else from the
    OUTPUT y (alive downstream anyway): leaky-relu is invertible
    (v = y / lrelu'(y)) and u = v / r, so no full-size pre-activation ever
    hits HBM.  ``r_ref`` is only emitted when use_pn is True (without
    pixel-norm the backward needs no residual at all)."""
    bt, h, wd, cin = x_ref.shape
    co = o_ref.shape[-1]
    x = x_ref[:]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    m = bt * h * wd
    acc = jnp.zeros((m, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = lax.slice(xp, (0, dy, dx, 0),
                           (bt, dy + h, dx + wd, cin))
            acc = acc + jnp.dot(xs.reshape(m, cin), w_ref[dy, dx],
                                preferred_element_type=jnp.float32)
    y = acc + b_ref[:].astype(jnp.float32)
    if use_pn:
        ssq = jnp.sum(jnp.square(y), axis=-1, keepdims=True)
        r = lax.rsqrt(ssq * (1.0 / co) + eps)
        if r_ref is not None:
            r_ref[:] = r.reshape(bt, h, wd, 1)
        y = y * r
    y = jnp.where(y >= 0, y, slope * y)
    o_ref[:] = y.astype(o_ref.dtype).reshape(bt, h, wd, co)


def conv3x3_epilogue_fwd(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                         *, use_pixel_norm: bool = True, slope: float = 0.2,
                         eps: float = 1e-8, interpret: bool = None,
                         emit_r: bool = False):
    """y = lrelu(pixel_norm(conv3x3_same(x, w) + b)) in ONE HBM pass.

    ``w`` is the PRE-SCALED HWIO kernel (the EqualLR constant already
    folded, as ``equal_conv2d`` computes it); ``b`` the bias.  With
    ``emit_r`` (differentiated forward; requires pixel-norm) returns
    ``(y, r)`` where r is the pixel-norm scale residual.
    """
    assert not (emit_r and not use_pixel_norm), \
        "r is only defined (and only needed) for the pixel-norm variant"
    bsz, h, wd, cin = x.shape
    cout = w.shape[3]
    bt = _pick_batch_tile(x, cout)
    assert bt >= 1 and bsz % bt == 0, (bsz, bt)
    if interpret is None:
        interpret = _interpret_default()
    wb = w.astype(x.dtype)
    bb = b.astype(x.dtype).reshape(1, cout)
    out_shape = jax.ShapeDtypeStruct((bsz, h, wd, cout), x.dtype)
    out_spec = pl.BlockSpec((bt, h, wd, cout), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    if emit_r:
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((bsz, h, wd, 1), jnp.float32)]
        out_spec = [out_spec,
                    pl.BlockSpec((bt, h, wd, 1), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        functools.partial(_kernel, use_pn=use_pixel_norm, slope=slope,
                          eps=eps),
        out_shape=out_shape,
        grid=(bsz // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, wd, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, cin, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        interpret=interpret,
    )(x, wb, bb)


@functools.lru_cache(maxsize=None)
def make_conv3x3_epilogue(use_pixel_norm: bool = True, slope: float = 0.2,
                          eps: float = 1e-8):
    """Differentiable fused op ``(x, w_scaled, b) -> y``.

    Forward: the Pallas kernel, additionally emitting the tiny pixel-norm
    scale residual r.  Backward: the epilogue VJP is reconstructed from
    (y, r) — leaky-relu inverted in place of a saved pre-activation — then
    XLA's own optimal gradient convs via ``jax.vjp`` of the bare conv (the
    unused primal is DCE'd under jit).  Under ``stop_gradient`` (e.g. the
    D step's G forward) only the primal kernel runs: no residual write.
    """
    def conv_only(x, w):
        return lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.custom_vjp
    def op(x, w, b):
        return conv3x3_epilogue_fwd(x, w, b, use_pixel_norm=use_pixel_norm,
                                    slope=slope, eps=eps)

    def op_fwd(x, w, b):
        if use_pixel_norm:
            y, r = conv3x3_epilogue_fwd(x, w, b, use_pixel_norm=True,
                                        slope=slope, eps=eps, emit_r=True)
        else:  # backward needs no residual: lrelu inverts from y alone
            y = conv3x3_epilogue_fwd(x, w, b, use_pixel_norm=False,
                                     slope=slope, eps=eps)
            r = None
        return y, (x, w, y, r)

    def op_bwd(res, g):
        x, w, y, r = res
        acc = jnp.promote_types(y.dtype, jnp.float32)
        c = y.shape[-1]
        # invert the epilogue from its own output: v = y / lrelu'(y)
        pos = y >= 0
        lr_slope = jnp.where(pos, 1.0, slope)
        v = y.astype(acc) / lr_slope
        dv = g.astype(acc) * lr_slope
        if use_pixel_norm:
            # u = v / r;  du = r*dv - (r^3/c) u <dv,u> = r*(dv - v<dv,v>/c)
            du = r * (dv - v * (jnp.sum(dv * v, axis=-1,
                                        keepdims=True) / c))
        else:
            du = dv
        du = du.astype(x.dtype)
        db = jnp.sum(du.astype(jnp.float32), axis=(0, 1, 2))
        _, conv_vjp = jax.vjp(conv_only, x, w.astype(x.dtype))
        dx, dw = conv_vjp(du)
        return dx, dw.astype(jnp.float32), db

    op.defvjp(op_fwd, op_bwd)
    return op


def conv3x3_epilogue_ref(x, w, b, *, use_pixel_norm=True, slope=0.2,
                         eps=1e-8):
    """XLA reference composition (the current default path's math)."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + b.astype(x.dtype)
    if use_pixel_norm:
        acc = jnp.promote_types(y.dtype, jnp.float32)
        ssq = jnp.sum(jnp.square(y.astype(acc)), axis=-1, keepdims=True)
        y = (y.astype(acc) * lax.rsqrt(ssq / y.shape[-1] + eps)).astype(
            x.dtype)
    return jnp.where(y >= 0, y, jnp.asarray(slope, y.dtype) * y)
