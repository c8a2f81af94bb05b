"""Bilinear grid sampling, arbitrarily differentiable.

TPU-native replacement for the reference's grid_sample_gradfix
(ada/torch_utils/ops/grid_sample_gradfix.py): torch needed a hand-written
double-backward through aten internals; a gather-based formulation in JAX is
differentiable to any order for free.

Semantics match ``F.grid_sample(input, grid, mode='bilinear',
padding_mode='zeros', align_corners=False)`` — the exact call the ADA
pipeline makes (ada/augment.py:292) — with NHWC input and grid (B, Hg, Wg, 2)
holding normalized (x, y) coordinates in [-1, 1].
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample(x: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    gx = (grid[..., 0] + 1.0) * (w * 0.5) - 0.5   # align_corners=False
    gy = (grid[..., 1] + 1.0) * (h * 0.5) - 0.5

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    tx = gx - x0
    ty = gy - y0

    def gather(ix, iy):
        # zero padding: mask out-of-range taps
        valid = ((ix >= 0) & (ix < w) & (iy >= 0) & (iy < h))
        ix_c = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iy_c = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        batch_idx = jnp.arange(b).reshape(b, 1, 1)
        vals = x[batch_idx, iy_c, ix_c]               # (B, Hg, Wg, C)
        return vals * valid[..., None].astype(x.dtype)

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)

    tx = tx[..., None].astype(x.dtype)
    ty = ty[..., None].astype(x.dtype)
    top = v00 * (1 - tx) + v01 * tx
    bot = v10 * (1 - tx) + v11 * tx
    return top * (1 - ty) + bot * ty


def affine_grid(theta: jnp.ndarray, size, align_corners: bool = False
                ) -> jnp.ndarray:
    """torch.nn.functional.affine_grid equivalent: theta (B, 2, 3) row-major
    affine maps from output normalized coords to input normalized coords;
    size = (B, H, W).  Returns (B, H, W, 2) with (x, y) last.
    """
    b, h, w = size
    dt = theta.dtype
    if align_corners:
        ys = jnp.linspace(-1.0, 1.0, h, dtype=dt)
        xs = jnp.linspace(-1.0, 1.0, w, dtype=dt)
    else:
        ys = (jnp.arange(h, dtype=dt) * 2 + 1) / h - 1.0
        xs = (jnp.arange(w, dtype=dt) * 2 + 1) / w - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    ones = jnp.ones_like(gx)
    coords = jnp.stack([gx, gy, ones], axis=-1)       # (H, W, 3)
    out = jnp.einsum("bij,hwj->bhwi", theta, coords)  # (B, H, W, 2)
    return out
