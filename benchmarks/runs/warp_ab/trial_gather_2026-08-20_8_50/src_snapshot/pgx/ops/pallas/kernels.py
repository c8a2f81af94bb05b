"""Pallas TPU kernels — the native tier of the ops stack.

The reference ships hand-written CUDA for its two hot ops (upfirdn2d.cu's
tile-specialized FIR resampler, bias_act.cu's fused activation) selected at
runtime over pure-torch fallbacks (ops/upfirdn2d.py:162-164).  pgx mirrors
that architecture on TPU: these Pallas kernels are the fast path, the lax
formulations in pgx.ops are the reference/fallback path, and the same
dual-implementation testing strategy applies (kernels validated against the
lax path, which is itself validated against the torch reference).

Kernel design notes (see /opt/skills/guides/pallas_guide.md):
* ``fir_rows`` — 1-D FIR along the row (sublane) axis of a (R, C) array with
  polyphase up=2 support and stride-``down`` output.  The filter taps are
  unrolled statically; each grid instance holds a full row panel in VMEM and
  a lane tile of columns, so the VPU sees contiguous (8, 128) tiles.
  Separable 2-D filtering = two passes with a transpose between (the
  transpose folds into XLA layout assignment).
* ``bias_act`` — fused bias + activation + gain + clamp over lane tiles.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pgx.ops.bias_act import activation_funcs

_LANE = 128


def _pad_cols(x: jnp.ndarray):
    c = x.shape[-1]
    pad = (-c) % _LANE
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    return x, c


# ---------------------------------------------------------------------------
# fir_rows: y[i, :] = sum_t f[t] * xpad[i*down + t, :]   (after up-dilation)
# ---------------------------------------------------------------------------

def _fir_kernel(x_ref, o_ref, *, taps, rows_out):
    # stride-1 only: Mosaic restricts strided vector slices, so decimation
    # is handled by polyphase splitting outside the kernel (_fir_down)
    x = x_ref[:]
    acc = None
    for t, w in enumerate(taps):
        sl = lax.slice(x, (t, 0), (t + rows_out, x.shape[1]))
        acc = sl * w if acc is None else acc + sl * w
    o_ref[:] = acc


def _fir_rows_s1(xp: jnp.ndarray, taps, rows_out: int) -> jnp.ndarray:
    """Stride-1 FIR along axis 0 of an already-padded 2-D array."""
    xp, true_cols = _pad_cols(xp)
    cols = xp.shape[1]
    tile = min(cols, 512)
    while cols % tile:
        tile //= 2
    grid = (cols // tile,)
    out = pl.pallas_call(
        functools.partial(_fir_kernel, taps=tuple(float(t) for t in taps),
                          rows_out=rows_out),
        out_shape=jax.ShapeDtypeStruct((rows_out, cols), xp.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((xp.shape[0], tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((rows_out, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(xp)
    return out[:, :true_cols]


def _fir_pass(x: jnp.ndarray, taps, down: int, pad0: int,
              pad1: int) -> jnp.ndarray:
    """FIR + decimation along axis 0 (zero padding built in).

    down > 1 runs as a polyphase sum of stride-1 kernels over the
    row-parity planes: out[i] = sum_ph sum_k taps[down*k+ph] xp[down*(i+k)+ph].
    """
    ntaps = len(taps)
    # negative padding is cropping: slice the corresponding rows off before
    # filtering (zero-pad and crop commute with a zero-padded FIR)
    if pad0 < 0:
        x = x[-pad0:]
        pad0 = 0
    if pad1 < 0:
        x = x[:pad1]
        pad1 = 0
    xp = jnp.pad(x, ((pad0, pad1), (0, 0)))
    rows_out = (xp.shape[0] - ntaps) // down + 1
    if rows_out <= 0:
        return jnp.zeros((max(rows_out, 0), x.shape[1]), x.dtype)
    if down == 1:
        return _fir_rows_s1(xp, taps, rows_out)
    acc = None
    for ph in range(down):
        sub = [float(t) for t in taps[ph::down]]
        if not sub:
            continue
        xph = xp[ph::down]
        need = rows_out + len(sub) - 1
        if xph.shape[0] < need:
            xph = jnp.pad(xph, ((0, need - xph.shape[0]), (0, 0)))
        term = _fir_rows_s1(xph, sub, rows_out)
        acc = term if acc is None else acc + term
    return acc


def _upfir_rows(x: jnp.ndarray, f: np.ndarray, up: int, down: int,
                pad0: int, pad1: int) -> jnp.ndarray:
    """upfirdn along axis 0 of a 2-D array; up in {1, 2} via polyphase."""
    f = np.asarray(f, np.float64)
    n = x.shape[0]
    if up == 1:
        return _fir_pass(x, f[::-1], down, pad0, pad1)

    # up == 2: polyphase decomposition.  The dilated signal d has
    # d[2m] = x[m] (plus one trailing zero, matching the lax path); with
    # left pad P, out[i] = sum_t ff[t] d[i - P + t].  Outputs of each parity
    # are a plain FIR over x with the parity's tap subset — so each phase
    # reuses the same Pallas row-FIR kernel, then the phases interleave.
    ff = f[::-1]
    ntaps = len(ff)
    out_len = 2 * n + pad0 + pad1 - ntaps + 1

    phases = []
    for parity in (0, 1):
        rows_out = max((out_len - parity + 1) // 2, 0)
        idx = [t for t in range(ntaps) if (parity - pad0 + t) % 2 == 0]
        sub = [float(ff[t]) for t in idx]
        if not sub or rows_out == 0:
            phases.append(jnp.zeros((rows_out, x.shape[1]), x.dtype))
            continue
        # out[2j + parity] = sum_k sub[k] * x[j + off0 + k]
        off0 = (parity - pad0 + idx[0]) // 2
        drop = max(off0, 0)
        pad_l = max(-off0, 0)
        xb = x[drop:]
        need = rows_out + len(sub) - 1
        pad_r = max(0, need - (n - drop) - pad_l)
        ph = _fir_pass(xb, sub, down=1, pad0=pad_l, pad1=pad_r)[:rows_out]
        phases.append(ph)

    even, odd = phases
    out = jnp.zeros((out_len, x.shape[1]), x.dtype)
    out = out.at[0::2].set(even)
    out = out.at[1::2].set(odd)
    if down > 1:
        out = out[::down]
    return out


def upfirdn2d_pallas(x: jnp.ndarray, f, up: int = 1, down: int = 1,
                     padding=0, flip_filter: bool = False,
                     gain: float = 1.0) -> jnp.ndarray:
    """Separable upfirdn2d via two row-FIR passes (Pallas fast path for the
    up=1 case; polyphase composition for up=2).  Matches
    pgx.ops.upfirdn2d.upfirdn2d for 1-D (separable) filters."""
    from pgx.ops.upfirdn2d import _parse_padding
    f = np.asarray(f)
    assert f.ndim == 1, "pallas path expects a separable (1-D) filter"
    if flip_filter:
        f = f[::-1]
    px0, px1, py0, py1 = _parse_padding(padding)
    g = float(np.sqrt(gain))
    fv = f * g

    b, h, w, c = x.shape
    # pass along H: rows = H, cols = W*C
    xr = x.reshape(b, h, w * c)
    yr = jax.vmap(lambda xx: _upfir_rows(xx, fv, up, down, py0, py1))(xr)
    h2 = yr.shape[1]
    # pass along W: transpose W to rows
    yt = jnp.swapaxes(yr.reshape(b, h2, w, c), 1, 2).reshape(b, w, h2 * c)
    zt = jax.vmap(lambda xx: _upfir_rows(xx, fv, up, down, px0, px1))(yt)
    w2 = zt.shape[1]
    return jnp.swapaxes(zt.reshape(b, w2, h2, c), 1, 2)


# ---------------------------------------------------------------------------
# bias_act kernel
# ---------------------------------------------------------------------------

def _bias_act_kernel(x_ref, b_ref, o_ref, *, act, alpha, gain, clamp):
    x = x_ref[:] + b_ref[:]
    y = activation_funcs[act].func(x, alpha)
    if gain != 1.0:
        y = y * gain
    if clamp >= 0:
        y = jnp.clip(y, -clamp, clamp)
    o_ref[:] = y


def bias_act_pallas(x: jnp.ndarray, b: Optional[jnp.ndarray] = None,
                    act: str = "linear", alpha: Optional[float] = None,
                    gain: Optional[float] = None,
                    clamp: Optional[float] = None) -> jnp.ndarray:
    """Fused bias+activation over the channel (last) axis of an NHWC array
    (the bias_act.cu equivalent; validated against pgx.ops.bias_act)."""
    spec = activation_funcs[act]
    alpha = float(spec.def_alpha if alpha is None else alpha)
    gain = float(spec.def_gain if gain is None else gain)
    clamp = float(clamp) if clamp is not None else -1.0

    shape = x.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    x2 = x.reshape(rows, c)
    if b is None:
        b = jnp.zeros((c,), x.dtype)
    x2p, true_c = _pad_cols(x2)
    bp = jnp.pad(b.astype(x.dtype), (0, x2p.shape[1] - c))[None, :]

    row_tile = min(rows, 256)
    while rows % row_tile:
        row_tile -= 1
    out = pl.pallas_call(
        functools.partial(_bias_act_kernel, act=act, alpha=alpha, gain=gain,
                          clamp=clamp),
        out_shape=jax.ShapeDtypeStruct(x2p.shape, x.dtype),
        grid=(rows // row_tile,),
        in_specs=[
            pl.BlockSpec((row_tile, x2p.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, x2p.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((row_tile, x2p.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2p, bp)
    return out[:, :true_c].reshape(shape)


# ---------------------------------------------------------------------------
# fused pixel-norm + leaky-relu epilogue
# ---------------------------------------------------------------------------

def _pn_lrelu_kernel(x_ref, o_ref, *, slope, eps, true_c):
    x = x_ref[:]
    # channel mean over the REAL channels only (block may be lane-padded)
    ssq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
    y = x * lax.rsqrt(ssq / true_c + eps)
    o_ref[:] = jnp.where(y >= 0, y, slope * y)


def pixel_norm_lrelu_pallas(x: jnp.ndarray, slope: float = 0.2,
                            eps: float = 1e-8) -> jnp.ndarray:
    """Fused PixelNorm + LeakyReLU (the conv-block epilogue) over NHWC."""
    shape = x.shape
    c = shape[-1]
    rows = int(np.prod(shape[:-1]))
    x2, true_c = _pad_cols(x.reshape(rows, c))
    row_tile = min(rows, 256)
    while rows % row_tile:
        row_tile -= 1
    out = pl.pallas_call(
        functools.partial(_pn_lrelu_kernel, slope=slope, eps=eps,
                          true_c=float(c)),
        out_shape=jax.ShapeDtypeStruct(x2.shape, x.dtype),
        grid=(rows // row_tile,),
        in_specs=[pl.BlockSpec((row_tile, x2.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((row_tile, x2.shape[1]), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(x2)
    return out[:, :true_c].reshape(shape)
