"""Gather-free affine warp for the ADA geometric pipeline.

The reference executes its geometric augmentations as reflect-pad -> 2x FIR
upsample -> ``grid_sample`` at an affine grid -> 2x FIR downsample
(ada/augment.py:271-302).  ``grid_sample``'s per-pixel gathers are the wrong
primitive for TPU: measured at the 128px stage they cost 105 of the augment
pipeline's ~123 ms (docs/ROADMAP.md).  This module replaces the warp with a
multi-pass formulation built ONLY from TPU-friendly primitives — batched
matmuls (MXU) and static rolls + selects (VPU):

  pass 0   conditional transpose blit (absorbs the 90-degree part so the
           shear factors stay small; per-sample boolean select)
  pass 1   the diagonal part: per-axis 1-D resampling matrices that fold the
           reference's sym6 up-filter and the bilinear tent together, applied
           as two batched matmuls, landing on a 2x-supersampled intermediate
           (the same rate the reference interpolates at)
  pass 2/3 the triangular (shear) parts: per-row / per-column fractional
           shifts, integer part via a binary roll+select ladder, fractional
           part via a two-tap blend — no gathers, exact zero-fill semantics
  pass 4   the reference's sym6 down-filter as two static matmuls

Factorization: after an optional axis swap (image transpose), the inverse
affine ``A`` is decomposed as ``A = D(sx,sy) @ ShearX(alpha) @ ShearY(gamma)``
(pass order: leftmost factor first).  The swap is chosen per sample to
minimize ``max(|alpha|, |gamma|)``; for every pure rotation this bounds both
shears by 1.

Exactness: for transforms with no rotation component (flips, 90-degree
rotations, integer/fractional translation, iso/aniso scaling) the shear
factors are zero and this chain is algebraically IDENTICAL to the reference
operator (the per-axis matrices are built from the same upfirdn algebra, see
``upfirdn_matrix_1d``).  Rotations insert two extra 1-D tent interpolations
at the 2x-supersampled rate — a sub-half-pixel-scale softening; the gather
path (``pgx.ops.grid_sample``) remains available as the bit-parity oracle
(``AugmentConfig.warp_impl='gather'``).

Shear extents are static: shifts are representable up to ``shear_margin``
(in units of half the output extent, default 1.0 — covers all pure rotations
and ~95% of worst-case p=1 ADA transforms); beyond the margin samples read
zeros, mirroring how the reference's own clamped pad (augment.py:283) runs
out of content for extreme transforms.

Gradients: every pass is linear in the image (matmul / roll / select), so
JAX autodiff produces exact, equally-cheap VJPs — required because the ADA
pipe sits between G and D in the WGAN-GP graph.
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_HIGH = lax.Precision.HIGHEST


def upfirdn_matrix_1d(n_in: int, f, up: int = 1, down: int = 1,
                      pad0: int = 0, pad1: int = 0,
                      flip_filter: bool = False) -> np.ndarray:
    """Dense matrix of one separable upfirdn pass (numpy, static).

    Mirrors ``pgx.ops.upfirdn2d._upfirdn2d_1d`` exactly, including its
    filter flip and the trailing ``up - 1`` zero-stuffing pad; validated
    against it in tests/test_warp.py.  Returns [n_out, n_in] float64.
    """
    f = np.asarray(f, np.float64).reshape(-1)
    if not flip_filter:
        f = f[::-1]
    pad1 = pad1 + (up - 1)
    dil_len = (n_in - 1) * up + 1
    total = dil_len + pad0 + pad1
    n_out = (total - len(f)) // down + 1
    m = np.zeros((n_out, n_in))
    ks = np.arange(len(f))
    for o in range(n_out):
        pos = o * down + ks - pad0
        sel = (pos >= 0) & (pos < dil_len) & (pos % up == 0)
        m[o, pos[sel] // up] += f[sel]
    return m


@functools.lru_cache(maxsize=None)
def _static_matrices(n_pad: int, n_img: int, hz: Tuple[float, ...]):
    """(U2 [2*n_pad, n_pad], D2 [n_img, out_n]) for one axis, as numpy f32.

    U2 reproduces ``upsample2d(x, hz, up=2)`` (gain 4 => sqrt-gain 2 per
    axis, ops/upfirdn2d.py:308-343 padding algebra); D2 reproduces
    ``downsample2d(x, hz, down=2, padding=-2*hz_pad, flip_filter=True)``
    (ops/upfirdn2d.py:347-384) — the exact calls the ADA pipe makes.
    """
    f = np.asarray(hz, np.float64)
    fw = f.shape[0]
    hz_pad = fw // 4
    up_m = upfirdn_matrix_1d(n_pad, f * 2.0, up=2, down=1,
                             pad0=(fw + 1) // 2, pad1=(fw - 2) // 2,
                             flip_filter=False)
    out_n = 2 * (n_img + 2 * hz_pad)
    dn_m = upfirdn_matrix_1d(out_n, f, up=1, down=2,
                             pad0=-2 * hz_pad + (fw - 1) // 2,
                             pad1=-2 * hz_pad + (fw - 2) // 2,
                             flip_filter=True)
    assert up_m.shape == (2 * n_pad, n_pad)
    assert dn_m.shape == (n_img, out_n), dn_m.shape
    return up_m.astype(np.float32), dn_m.astype(np.float32)


def _decompose(a_mat: jnp.ndarray, t_vec: jnp.ndarray):
    """Batched pivoted decomposition A_eff = D(sx,sy) Shx(alpha) Shy(gamma).

    Returns (swap, sx, sy, alpha, gamma, tx, ty) where ``swap`` selects the
    transposed-image variant (rows of A and components of t swapped).  The
    pivot picks whichever variant has the smaller max shear magnitude.
    """
    a = a_mat[:, 0, 0]
    b = a_mat[:, 0, 1]
    c = a_mat[:, 1, 0]
    d = a_mat[:, 1, 1]

    def safe(x):
        return jnp.where(jnp.abs(x) < 1e-8, jnp.where(x < 0, -1e-8, 1e-8), x)

    def shears(aa, bb, cc, dd):
        det = safe(aa * dd - bb * cc)
        dd = safe(dd)
        return bb * dd / det, cc / dd

    al0, ga0 = shears(a, b, c, d)
    al1, ga1 = shears(c, d, a, b)          # rows swapped (transposed image)
    swap = (jnp.maximum(jnp.abs(al1), jnp.abs(ga1))
            < jnp.maximum(jnp.abs(al0), jnp.abs(ga0)))
    aa = jnp.where(swap, c, a)
    bb = jnp.where(swap, d, b)
    cc = jnp.where(swap, a, c)
    dd = jnp.where(swap, b, d)
    tx = jnp.where(swap, t_vec[:, 1], t_vec[:, 0])
    ty = jnp.where(swap, t_vec[:, 0], t_vec[:, 1])
    det = safe(aa * dd - bb * cc)
    dd_s = safe(dd)
    sx = det / dd_s
    sy = dd
    alpha = bb * dd_s / det
    gamma = cc / dd_s
    return swap, sx, sy, alpha, gamma, aa, bb, cc, dd, tx, ty


def _shift_1d_jnp(img: jnp.ndarray, shift: jnp.ndarray,
                  axis: int) -> jnp.ndarray:
    """Per-line 1-D fractional shift: out[x] = in[x + shift(line)].

    ``img`` [B, C, R, N] (lane-friendly layout: the minor axis carries the
    image row so the roll ladder uses all 128 lanes).  ``axis`` is 3 (shift
    along N, one shift per R-line: ``shift`` [B, R]) or 2 (shift along R,
    one shift per N-column: ``shift`` [B, N]).  Linear (tent) interpolation,
    zero fill outside the extent.  Integer part runs as a binary
    roll+select ladder (static roll amounts — compiler-friendly; wraparound
    is cancelled by the validity mask), fractional part as a 2-tap blend.
    """
    b, c, r, n = img.shape
    length = img.shape[axis]
    s = jnp.clip(shift, -(length + 2.0), length + 2.0)
    k = jnp.floor(s)
    frac = s - k
    kint = k.astype(jnp.int32)
    kmod = jnp.mod(kint, length)

    if axis == 3:
        expand = lambda v: v[:, None, :, None]        # [B,R] -> [B,1,R,1]
    else:
        expand = lambda v: v[:, None, None, :]        # [B,N] -> [B,1,1,N]

    g = img
    for bit in range(max(1, int(np.ceil(np.log2(length))))):
        rolled = jnp.roll(g, -(1 << bit), axis=axis)
        take = expand(((kmod >> bit) & 1).astype(bool))
        g = jnp.where(take, rolled, g)
    g1 = jnp.roll(g, -1, axis=axis)
    pos_shape = [1, 1, 1, 1]
    pos_shape[axis] = length
    src = (jnp.arange(length, dtype=jnp.int32).reshape(pos_shape)
           + expand(kint))
    v0 = ((src >= 0) & (src < length)).astype(img.dtype)
    v1 = ((src >= -1) & (src < length - 1)).astype(img.dtype)
    frac = expand(frac).astype(img.dtype)
    return (1.0 - frac) * g * v0 + frac * g1 * v1


@functools.lru_cache(maxsize=1)
def _pallas_shear_enabled() -> bool:
    import os
    if os.environ.get("PGX_DISABLE_PALLAS_SHEAR"):
        return False
    from pgx.ops.pallas import pallas_available
    return pallas_available()


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _shift_1d_pallas_ad(img, shift, axis):
    """Pallas shear with an exact linear-transpose VJP: the adjoint of a
    fractional shift by s is the fractional shift by -s (tent weights and
    zero-fill masks mirror exactly; verified in tests/test_warp.py)."""
    from pgx.ops.pallas.shear import shift_1d_pallas
    return shift_1d_pallas(img, shift, axis)


def _shift_1d_pallas_fwd(img, shift, axis):
    return _shift_1d_pallas_ad(img, shift, axis), shift


def _shift_1d_pallas_bwd(axis, shift, ct):
    # shift is PRNG-derived in the augment pipe (stop_gradient'ed below)
    return _shift_1d_pallas_ad(ct, -shift, axis), jnp.zeros_like(shift)


_shift_1d_pallas_ad.defvjp(_shift_1d_pallas_fwd, _shift_1d_pallas_bwd)


def _shift_1d(img: jnp.ndarray, shift: jnp.ndarray, axis: int) -> jnp.ndarray:
    shift = lax.stop_gradient(shift)
    if _pallas_shear_enabled():
        return _shift_1d_pallas_ad(img, shift, axis)
    return _shift_1d_jnp(img, shift, axis)


def _centered(n: int) -> jnp.ndarray:
    return jnp.arange(n, dtype=jnp.float32) - (n / 2 - 0.5)


def _tent_matrix(u: jnp.ndarray, n_src: int) -> jnp.ndarray:
    """[B, M, n_src] bilinear-interpolation matrix at coords ``u`` [B, M]
    (source pixels at centered coordinates, zero outside)."""
    kc = _centered(n_src)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, :, None] - kc[None, None, :]))


def ada_geom_warp_shear(padded: jnp.ndarray, a_mat: jnp.ndarray,
                        t_vec: jnp.ndarray, img_hw: Tuple[int, int],
                        hz, *, shear_margin: float = 1.0) -> jnp.ndarray:
    """Apply the ADA geometric operator to a reflect-padded batch.

    ``padded`` [B, Hp, Wp, C] (square: Hp == Wp required — every reference
    workload is square); ``a_mat`` [B, 2, 2] / ``t_vec`` [B, 2] are the
    linear/translation parts of the accumulated inverse homography ``G_inv``
    in original-image centered pixel units (augment.py:226-264).  Returns
    [B, H, W, C] — the counterpart of upsample2d -> grid_sample ->
    downsample2d in the gather path.
    """
    b, hp, wp, c = padded.shape
    h, w = img_hw
    if hp != wp:
        raise ValueError("shear warp requires square padded input; "
                         "use warp_impl='gather' for non-square images")
    hz_t = tuple(np.asarray(hz, np.float64).reshape(-1).tolist())
    fw = len(hz_t)
    hz_pad = fw // 4
    out_h, out_w = 2 * (h + 2 * hz_pad), 2 * (w + 2 * hz_pad)
    u2_np, d2x_np = _static_matrices(wp, w, hz_t)
    _, d2y_np = _static_matrices(hp, h, hz_t)
    u2 = jnp.asarray(u2_np)

    # static shear margins (in 2x-grid pixels), rounded so the Pallas shear
    # kernel tiles evenly and the roll axis is lane-aligned
    def _round_up(v, m):
        return ((v + m - 1) // m) * m

    my2 = int(np.ceil(shear_margin * out_w / 2)) + 2
    vy = _round_up(out_h + 2 * my2, 64)
    my2 = (vy - out_h) // 2
    mx2 = int(np.ceil(shear_margin * vy / 2)) + 2
    vx = _round_up(out_w + 2 * mx2, 128)
    mx2 = (vx - out_w) // 2

    swap, sx, sy, alpha, gamma, aa, bb, cc, dd, tx, ty = _decompose(
        jnp.asarray(a_mat, jnp.float32), jnp.asarray(t_vec, jnp.float32))

    # pass 0: conditional transpose blit
    padded = jnp.where(swap[:, None, None, None],
                       jnp.swapaxes(padded, 1, 2), padded)

    # total map on the 2x grids: u = A_eff p + T,  T = A_eff h + 2 t - h
    t_x = 0.5 * (aa + bb) + 2.0 * tx - 0.5
    t_y = 0.5 * (cc + dd) + 2.0 * ty - 0.5

    # pass 1: diagonal resample (sym6 up-filter folded in), 2x intermediate
    ux = sx[:, None] * _centered(vx)[None, :] + t_x[:, None]   # [B, Vx]
    uy = sy[:, None] * _centered(vy)[None, :] + t_y[:, None]   # [B, Vy]
    mx_mat = jnp.einsum("bmk,kw->bmw", _tent_matrix(ux, 2 * wp), u2,
                        precision=_HIGH)                        # [B, Vx, Wp]
    my_mat = jnp.einsum("bmk,kh->bmh", _tent_matrix(uy, 2 * hp), u2,
                        precision=_HIGH)                        # [B, Vy, Hp]
    dt = padded.dtype
    v = jnp.einsum("bmw,bhwc->bhmc", mx_mat.astype(dt), padded,
                   precision=_HIGH)                             # [B, Hp, Vx, C]
    # land in [B, C, Vy, Vx]: the shear ladders roll along the minor axis
    # with full lane occupancy (NHWC with C=3 would waste 125 of 128 lanes)
    v = jnp.einsum("bnh,bhmc->bcnm", my_mat.astype(dt), v,
                   precision=_HIGH)                             # [B, C, Vy, Vx]

    # pass 2: x-shear, then crop to the output column window
    v = _shift_1d(v, alpha[:, None] * _centered(vy)[None, :], axis=3)
    v = lax.slice_in_dim(v, mx2, mx2 + out_w, axis=3)

    # pass 3: y-shear, then crop to the output row window
    v = _shift_1d(v, gamma[:, None] * _centered(out_w)[None, :], axis=2)
    v = lax.slice_in_dim(v, my2, my2 + out_h, axis=2)

    # pass 4: sym6 down-filter (static matrices), back to NHWC
    v = jnp.einsum("hm,bcmw->bchw", jnp.asarray(d2y_np, dt), v,
                   precision=_HIGH)
    v = jnp.einsum("wn,bchn->bhwc", jnp.asarray(d2x_np, dt), v,
                   precision=_HIGH)
    return v
