"""2D convolution with fused up/downsampling (reference:
ada/torch_utils/ops/conv2d_resample.py:59-154).

The reference special-cases five fast paths to dodge cuDNN pitfalls
(:107-147); under XLA a single composition of upfirdn2d + conv compiles to
the same fused HLO, so only the generic path is needed.  Not used by the GAN
models themselves (they resize with the bilinear ops) — provided for op-layer
parity (SURVEY.md section 2.5).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from pgx.ops.upfirdn2d import _parse_padding, upfirdn2d


def _conv2d(x: jnp.ndarray, w: jnp.ndarray, groups: int = 1,
            flip_weight: bool = True) -> jnp.ndarray:
    """w is HWIO; flip_weight=True is ordinary cross-correlation (torch
    conv2d), False flips the kernel (transpose-conv style)."""
    if not flip_weight:
        w = jnp.flip(w, axis=(0, 1))
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


def conv2d_resample(x: jnp.ndarray, w: jnp.ndarray, f=None, up: int = 1,
                    down: int = 1, padding=0, groups: int = 1,
                    flip_weight: bool = True,
                    flip_filter: bool = False) -> jnp.ndarray:
    """NHWC x, HWIO w, optional FIR f applied around the conv."""
    fh, fw = (1, 1)
    if f is not None:
        f = jnp.asarray(f)
        fh, fw = (f.shape[0], f.shape[0]) if f.ndim == 1 else f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    x = upfirdn2d(x, f if up > 1 else None, up=up,
                  padding=(px0, px1, py0, py1), gain=up ** 2,
                  flip_filter=flip_filter)
    x = _conv2d(x, w, groups=groups, flip_weight=flip_weight)
    if down > 1:
        x = upfirdn2d(x, f, down=down, flip_filter=flip_filter)
    return x
