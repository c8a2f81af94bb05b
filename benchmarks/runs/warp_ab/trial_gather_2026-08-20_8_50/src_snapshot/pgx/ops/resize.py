"""Bilinear 2x up/down sampling with exact PyTorch parity, TPU-first.

The reference model zoo resizes exclusively with
``F.interpolate(scale_factor=2 or 0.5, mode='bilinear', align_corners=False)``
(reference: progan_modules.py:167-168, :205, :299).  Fade-in blending is
numerically sensitive to this choice (SURVEY.md section 7 "hard parts" #4), so
instead of approximating with a generic resampler we derive the exact closed
forms and implement them as static elementwise arithmetic + reshapes, which XLA
fuses into neighboring ops (no gathers, no dynamic shapes):

* ``upsample2x``: with half-pixel centers the source coordinate of output pixel
  ``i`` is ``i/2 - 0.25``; with torch's edge clamping this is an edge-pad(1)
  followed by a fixed 2-tap filter, interleaved:
      out[2j]   = 0.25*p[j]   + 0.75*p[j+1]
      out[2j+1] = 0.75*p[j+1] + 0.25*p[j+2]       (p = edge-padded input)
  applied separably along H and W.

* ``downsample2x``: source coordinate of output pixel ``i`` is ``2i + 0.5``,
  i.e. the average of pixels ``2i`` and ``2i+1`` -> exactly 2x2 mean pooling,
  which we compute as a reshape + mean (pure VPU, no windowing primitive).

Both are arbitrarily differentiable (plain arithmetic), so the WGAN-GP
double-backward through the discriminator's downsampling path needs no
gradfix machinery (reference needed ops/conv2d_gradfix.py for this).

All functions take NHWC arrays.
"""

from __future__ import annotations

import jax.numpy as jnp


# The bilinear 2x upsample as a zero-stuffing FIR: F4 = [1,3,3,1]/4, i.e.
# the interleaved (0.25, 0.75) / (0.75, 0.25) phase taps below.  The fused
# upsample->conv in pgx/core/layers.py composes its kernel from this same
# constant so the two paths can never drift apart.
UP_FIR = (0.25, 0.75, 0.75, 0.25)


def _upsample2x_axis_h(p: jnp.ndarray) -> jnp.ndarray:
    """Interleaved 2-tap filter along axis 1 of an edge-padded NHWC array."""
    even = UP_FIR[0] * p[:, :-2] + UP_FIR[1] * p[:, 1:-1]
    odd = UP_FIR[2] * p[:, 1:-1] + UP_FIR[3] * p[:, 2:]
    b, h, w, c = even.shape
    out = jnp.stack([even, odd], axis=2)  # (B, H, 2, W, C)
    return out.reshape(b, 2 * h, w, c)


def upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact `F.interpolate(x, scale_factor=2, mode='bilinear', align_corners=False)`.

    NHWC in, NHWC out with doubled spatial dims.
    """
    p = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    x = _upsample2x_axis_h(p)
    # Same filter along W via transpose (XLA folds transposes into the layout).
    x = jnp.swapaxes(x, 1, 2)
    p = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    x = _upsample2x_axis_h(p)
    return jnp.swapaxes(x, 1, 2)


def downsample2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact `F.interpolate(x, scale_factor=0.5, mode='bilinear', align_corners=False)`.

    For even input sizes this equals 2x2 mean pooling. NHWC in/out.
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    # sum * 0.25 is bit-identical to mean (power-of-two scale) and benches
    # ~16% faster on TPU than the mean lowering at the 128px flagship shape
    return x.sum(axis=(2, 4), dtype=x.dtype) * jnp.asarray(0.25, x.dtype)


def avg_pool2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 average pooling (the reference's commented-out alternative,
    progan_modules.py:298) — identical to ``downsample2x``."""
    return downsample2x(x)
