"""upfirdn2d — pad / upsample(zero-stuff) / FIR filter / downsample, fused.

TPU-native equivalent of the reference's CUDA kernel stack
(ada/torch_utils/ops/upfirdn2d.cpp/.cu + the autograd wrapper
ada/torch_utils/ops/upfirdn2d.py): one ``lax.conv_general_dilated`` with
``lhs_dilation`` (upsampling), window strides (downsampling), and explicit
padding — exactly the composition the CUDA kernel hand-fuses, left to XLA to
tile onto the TPU conv units.  Gradients (any order) come from JAX autodiff;
the reference needed a hand-derived transposed-upfirdn backward
(ops/upfirdn2d.py:214-268).

Filter convention matches the reference (ops/upfirdn2d.py:169-208): the
default performs true convolution (filter flipped before correlation);
``flip_filter=True`` correlates with the filter as given.  Separable 1-D
filters run as two cheap 1-D passes (ops/upfirdn2d.py:239-240).

All image tensors NHWC; filters are numpy/jnp arrays shaped (fh, fw) or (fw,)
for separable application.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

FilterLike = Union[np.ndarray, jnp.ndarray, Sequence[float], None]


def setup_filter(f: FilterLike, normalize: bool = True,
                 flip_filter: bool = False, gain: float = 1.0,
                 separable: Optional[bool] = None) -> jnp.ndarray:
    """Prepare a FIR filter (ops/upfirdn2d.py:72-116 semantics).

    Returns a float32 array of shape (fh, fw) or (fw,) when separable.
    """
    if f is None:
        f = 1.0
    f = np.asarray(f, np.float64)
    assert f.ndim in (0, 1, 2)
    if f.ndim == 0:
        f = f[np.newaxis]
    if separable is None:
        separable = f.ndim == 1 and f.size >= 8
    if f.ndim == 1 and not separable:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    if flip_filter:
        f = np.flip(f, axis=tuple(range(f.ndim)))
    f = f * gain ** (f.ndim / 2)
    return jnp.asarray(f, jnp.float32)


def _parse_padding(padding) -> Tuple[int, int, int, int]:
    if isinstance(padding, int):
        return padding, padding, padding, padding
    padding = list(padding)
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def _upfirdn2d_1d(x: jnp.ndarray, f: jnp.ndarray, axis: int, up: int,
                  down: int, pad0: int, pad1: int,
                  flip_filter: bool) -> jnp.ndarray:
    """One separable 1-D pass along H (axis=1) or W (axis=2)."""
    if not flip_filter:
        f = jnp.flip(f, axis=0)
    fw = f.shape[0]
    kernel = f.reshape((fw, 1, 1, 1) if axis == 1 else (1, fw, 1, 1))
    c = x.shape[-1]
    kernel = jnp.tile(kernel.astype(x.dtype), (1, 1, 1, c))
    # lhs_dilation inserts zeros only BETWEEN samples; the reference
    # zero-stuffs AFTER each sample too (ops/upfirdn2d.py:186), so add the
    # missing up-1 trailing zeros as extra padding (exactly equivalent).
    pad1 = pad1 + (up - 1)
    dil = (up, 1) if axis == 1 else (1, up)
    strides = (down, 1) if axis == 1 else (1, down)
    pad = ((pad0, pad1), (0, 0)) if axis == 1 else ((0, 0), (pad0, pad1))
    return lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=pad, lhs_dilation=dil,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def upfirdn2d(x: jnp.ndarray, f: FilterLike, up: int = 1, down: int = 1,
              padding=0, flip_filter: bool = False,
              gain: float = 1.0) -> jnp.ndarray:
    """Fused pad -> upsample(up) -> FIR filter -> downsample(down), NHWC.

    Matches the reference op (ops/upfirdn2d.py:120-165) including negative
    padding (crop) semantics.
    """
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    f = jnp.asarray(f)
    px0, px1, py0, py1 = _parse_padding(padding)

    if f.ndim == 1 and up in (1, 2) and down in (1, 2):
        # opt-in Pallas fast path (PGX_USE_PALLAS=1 on a TPU backend)
        from pgx.ops.pallas import pallas_enabled
        if pallas_enabled():
            return _upfirdn2d_pallas_ad(
                x, tuple(np.asarray(f, np.float64).tolist()), up, down,
                (px0, px1, py0, py1), bool(flip_filter), float(gain))

    if f.ndim == 1:
        # separable: vertical pass then horizontal pass; gain split evenly
        g = float(np.sqrt(gain))
        y = _upfirdn2d_1d(x, f * g, axis=1, up=up, down=down,
                          pad0=py0, pad1=py1, flip_filter=flip_filter)
        return _upfirdn2d_1d(y, f * g, axis=2, up=up, down=down,
                             pad0=px0, pad1=px1, flip_filter=flip_filter)

    if not flip_filter:
        f = jnp.flip(f, axis=(0, 1))
    fh, fw = f.shape
    c = x.shape[-1]
    kernel = jnp.tile((f * gain).astype(x.dtype).reshape(fh, fw, 1, 1),
                      (1, 1, 1, c))
    # see _upfirdn2d_1d: account for the reference's trailing zero-stuffing
    return lax.conv_general_dilated(
        x, kernel, window_strides=(down, down),
        padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)


def _upfirdn2d_sep_lax(x, f, up, down, pads, flip_filter):
    """The separable lax formulation (reference math, XLA-differentiable)."""
    px0, px1, py0, py1 = pads
    y = _upfirdn2d_1d(x, f, axis=1, up=up, down=down,
                      pad0=py0, pad1=py1, flip_filter=flip_filter)
    return _upfirdn2d_1d(y, f, axis=2, up=up, down=down,
                         pad0=px0, pad1=px1, flip_filter=flip_filter)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6))
def _upfirdn2d_pallas_ad(x, f_taps, up, down, pads, flip_filter, gain):
    """Pallas forward with the lax formulation as the reverse-mode rule.

    pl.pallas_call has no AD rule, so without this wrapper the opt-in
    PGX_USE_PALLAS flag would break any differentiated trace — notably the
    ADA-augmented G update (ADVICE r1).  upfirdn2d is linear in x, so the
    VJP of the lax path is primal-independent and exact.
    """
    from pgx.ops.pallas import upfirdn2d_pallas
    return upfirdn2d_pallas(x, np.asarray(f_taps, np.float32), up=up,
                            down=down, padding=pads,
                            flip_filter=flip_filter, gain=gain)


def _upfirdn2d_pallas_fwd(x, f_taps, up, down, pads, flip_filter, gain):
    return (_upfirdn2d_pallas_ad(x, f_taps, up, down, pads, flip_filter,
                                 gain), x.shape)


def _upfirdn2d_pallas_bwd(f_taps, up, down, pads, flip_filter, gain,
                          x_shape, g):
    f = jnp.asarray(np.asarray(f_taps, np.float32)
                    * np.sqrt(gain, dtype=np.float32))
    _, vjp = jax.vjp(
        lambda xx: _upfirdn2d_sep_lax(xx, f, up, down, pads, flip_filter),
        jnp.zeros(x_shape, g.dtype))
    return (vjp(g)[0],)


_upfirdn2d_pallas_ad.defvjp(_upfirdn2d_pallas_fwd, _upfirdn2d_pallas_bwd)


def filter2d(x: jnp.ndarray, f: FilterLike, padding=0,
             flip_filter: bool = False, gain: float = 1.0) -> jnp.ndarray:
    """Same-resolution filtering (ops/upfirdn2d.py:272-304 padding algebra)."""
    f = jnp.asarray(f) if f is not None else jnp.ones((1, 1), jnp.float32)
    fh, fw = (f.shape[0], f.shape[0]) if f.ndim == 1 else f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += fw // 2
    px1 += (fw - 1) // 2
    py0 += fh // 2
    py1 += (fh - 1) // 2
    return upfirdn2d(x, f, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain)


def upsample2d(x: jnp.ndarray, f: FilterLike, up: int = 2, padding=0,
               flip_filter: bool = False, gain: float = 1.0) -> jnp.ndarray:
    """Upsample with FIR smoothing (ops/upfirdn2d.py:308-343 padding algebra)."""
    f = jnp.asarray(f) if f is not None else jnp.ones((1, 1), jnp.float32)
    fh, fw = (f.shape[0], f.shape[0]) if f.ndim == 1 else f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 = px0 * up + (fw + up - 1) // 2
    px1 = px1 * up + (fw - up) // 2
    py0 = py0 * up + (fh + up - 1) // 2
    py1 = py1 * up + (fh - up) // 2
    return upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain * up * up)


def downsample2d(x: jnp.ndarray, f: FilterLike, down: int = 2, padding=0,
                 flip_filter: bool = False,
                 gain: float = 1.0) -> jnp.ndarray:
    """Downsample with FIR anti-aliasing (ops/upfirdn2d.py:347-384)."""
    f = jnp.asarray(f) if f is not None else jnp.ones((1, 1), jnp.float32)
    fh, fw = (f.shape[0], f.shape[0]) if f.ndim == 1 else f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    px0 += (fw - down + 1) // 2
    px1 += (fw - down) // 2
    py0 += (fh - down + 1) // 2
    py1 += (fh - down) // 2
    return upfirdn2d(x, f, down=down, padding=(px0, px1, py0, py1),
                     flip_filter=flip_filter, gain=gain)
