"""Pallas TPU kernel for the per-line fractional shift (shear pass).

The gather-free ADA warp (pgx/ops/warp.py) spends its time in two shear
passes: a binary roll+select ladder over the image.  In pure XLA each of the
~10 ladder steps is a separate HBM round trip (rolls don't fuse); this
kernel runs the whole ladder inside VMEM — one HBM read + one write per
pass, ~10x less memory traffic.  It is the replacement for the hot half of
the reference's CUDA tier: where upfirdn2d.cu accelerated the FIR resampling
around ``grid_sample``, this kernel accelerates the warp itself.

Contract matches ``pgx.ops.warp._shift_1d_jnp``: img [B, C, R, N];
axis=3 shifts along N with one shift per (B, R) line, axis=2 shifts along R
with one shift per (B, N) column.  Linear interpolation, zero fill.  The
shift vector is laid out along the axis it broadcasts over (sublanes for
axis=3, lanes for axis=2) so the selects vectorize without relayouts.

The op is linear in ``img`` and its transpose is the same shift negated, so
the custom VJP in pgx/ops/warp.py reuses the kernel.  ``shift`` is treated
as non-differentiable — in the augment pipe it derives from PRNG draws only
(enforced with stop_gradient at the call site).

The tiled (sublane) extent need not arrive tile-friendly: axis=3 zero-pads
R up to a multiple of 8 when required (rows are independent lines, so the
padding is exact and sliced off after the call).  This matters for the
axis=2 big-extent fallback, whose transpose hands the kernel R = the
original minor extent (e.g. 2*(w + 2*hz_pad), never a multiple of 8).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ladder(g, s, length, roll_axis, expand):
    """Shared ladder body: g [C, R, N] block; s broadcasts via ``expand``."""
    out_dtype = g.dtype
    if jnp.dtype(out_dtype).itemsize < 4:
        g = g.astype(jnp.float32)   # Mosaic only rotates 32-bit lanes
    s = jnp.clip(s, -(length + 2.0), length + 2.0)
    k = jnp.floor(s)
    frac = expand(s - k).astype(g.dtype)
    kint = k.astype(jnp.int32)
    kmod = jnp.mod(kint, length)
    for bit in range(max(1, int(np.ceil(np.log2(length))))):
        rolled = pltpu.roll(g, (-(1 << bit)) % length, axis=roll_axis)
        take = expand((kmod >> bit) & 1) == 1
        g = jnp.where(take, rolled, g)
    g1 = pltpu.roll(g, (length - 1) % length, axis=roll_axis)
    pos = jax.lax.broadcasted_iota(jnp.int32, g.shape, roll_axis)
    src = pos + expand(kint)
    v0 = ((src >= 0) & (src < length)).astype(g.dtype)
    v1 = ((src >= -1) & (src < length - 1)).astype(g.dtype)
    return ((1.0 - frac) * g * v0 + frac * g1 * v1).astype(out_dtype)


def _kernel_axis3(shift_ref, img_ref, out_ref, *, n):
    g = img_ref[0]                                      # [C, TR, N]
    s = shift_ref[0]                                    # [TR, 1] (sublanes)
    out_ref[0] = _ladder(g, s, n, roll_axis=2,
                         expand=lambda v: v[None, :, :])


def _kernel_axis2(shift_ref, img_ref, out_ref, *, r):
    g = img_ref[0]                                      # [C, R, TN]
    s = shift_ref[0]                                    # [1, TN] (lanes)
    out_ref[0] = _ladder(g, s, r, roll_axis=1,
                         expand=lambda v: v[None, :, :])


def _pick_tile(total: int, limit: int) -> int:
    """Largest divisor of ``total`` that is a multiple of 8 (Mosaic sublane
    tiling) and <= limit.  ``total`` must be a multiple of 8 (the axis=3
    entry pads it up), so 8 always qualifies and the result is a true
    divisor — never a VMEM-impossible full extent."""
    assert total % 8 == 0, total
    for cand in range(min(total, limit) // 8 * 8, 7, -8):
        if total % cand == 0:
            return cand
    return 8


_VMEM_BLOCK_BUDGET = 2 * 1024 * 1024


def _axis2_needs_transpose(r: int, n: int, bytes_per: int) -> bool:
    """Route an axis=2 call through the tileable axis=3 kernel (transpose
    round trip) when the untileable (1, 1, R, N) block would blow scoped
    VMEM.  The ladder body keeps ~10 block-sized values live (g, rolled,
    select masks, g1, iota, two validity masks, two products), so the
    safe block ceiling is ~1/10th of the 16 MB VMEM space — observed live:
    a 1088x524 f32 block (2.3 MB) compiled to a 21.3 MB scoped-vmem stack
    and aborted at the 256px ADA stage (batch 16); half the kernel budget
    (1 MB -> ~10 MB working set) keeps headroom for double buffering."""
    return r * n * bytes_per > _VMEM_BLOCK_BUDGET // 2


def shift_1d_pallas(img: jnp.ndarray, shift: jnp.ndarray, axis: int,
                    interpret: bool = False) -> jnp.ndarray:
    """One fused shear pass on TPU.  See module docstring for the contract."""
    b, c, r, n = img.shape
    shift = shift.astype(jnp.float32)
    # _ladder upcasts sub-32-bit blocks to f32 (Mosaic only rotates 32-bit
    # lanes), so VMEM occupancy is governed by 4-byte working copies even
    # for bf16 inputs — size the tiles accordingly
    bytes_per = max(jnp.dtype(img.dtype).itemsize, 4)
    if axis == 3:
        r_out = r
        pad_r = (-r) % 8
        if pad_r:
            # rows are independent lines: zero rows compute garbage that is
            # sliced off below, so the padding is exact
            img = jnp.pad(img, ((0, 0), (0, 0), (0, pad_r), (0, 0)))
            shift = jnp.pad(shift, ((0, 0), (0, pad_r)))
            r += pad_r
        # r is a multiple of 8 here, so this returns a true divisor <=
        # max(8, limit): blocks never exceed ~max(budget, 8-row minimum)
        tr = _pick_tile(r, max(8, _VMEM_BLOCK_BUDGET // (c * n * bytes_per)))
        out = pl.pallas_call(
            functools.partial(_kernel_axis3, n=n),
            out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
            grid=(b, r // tr),
            in_specs=[
                pl.BlockSpec((1, tr, 1), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, tr, n), lambda i, j: (i, 0, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c, tr, n), lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(shift[:, :, None], img)
        return out[:, :, :r_out, :] if pad_r else out
    if axis == 2:
        # rolls cross the whole R extent, so R can't be tiled; blocks are
        # (1, 1, R, N) per channel.  For extents past the VMEM budget, go
        # through the lane-tiled axis=3 kernel with a transpose round trip.
        if _axis2_needs_transpose(r, n, bytes_per):
            out = shift_1d_pallas(jnp.swapaxes(img, 2, 3), shift, 3,
                                  interpret=interpret)
            return jnp.swapaxes(out, 2, 3)
        return pl.pallas_call(
            functools.partial(_kernel_axis2, r=r),
            out_shape=jax.ShapeDtypeStruct(img.shape, img.dtype),
            grid=(b, c),
            in_specs=[
                pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, r, n), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, r, n), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(shift[:, None, :], img)
    raise ValueError(f"axis must be 2 or 3, got {axis}")
