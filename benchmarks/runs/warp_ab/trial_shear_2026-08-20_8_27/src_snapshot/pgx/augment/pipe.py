"""ADA augmentation pipeline as a pure jittable function.

TPU-first re-design of the reference's AugmentPipe (ada/augment.py:118-430,
vendored StyleGAN2-ADA): the 15 transforms — pixel blitting, a single inverse
homography for all geometric warps (executed as reflect-pad -> 2x FIR
upsample -> affine grid_sample -> FIR downsample), a 4x4 homogeneous color
matrix, a 4-band wavelet filter bank, noise, and cutout — run entirely
on-device inside the jitted train step, driven by one scalar probability
``p`` and a threaded PRNG key.

Static-shape adaptation (SURVEY.md section 7 hard-part #5): the reference
computes the reflect-pad margin from the per-batch transform corners
(augment.py:273-284, dynamic shapes) and clamps it to at most
(width-1, height-1).  Here the pad is that static worst case.  Inside the
reference's data-dependent margin the reflect content is identical, and
beyond either margin both implementations sample zeros, so results match
bit-for-bit in debug mode (verified against the torch pipe in tests).

``debug_percentile`` reproduces the reference's deterministic mode
(augment.py:186-187) and is the oracle-parity hook.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.scipy.special import erfinv

from pgx.ops.grid_sample import affine_grid, grid_sample
from pgx.ops.upfirdn2d import downsample2d, upsample2d
from pgx.ops.warp import ada_geom_warp_shear

# Wavelet low-pass coefficients used by the pipeline (augment.py:22-39 table;
# only the two filters the pipe consumes).
WAVELETS = {
    "sym2": [-0.12940952255092145, 0.22414386804185735, 0.836516303737469,
             0.48296291314469025],
    "sym6": [0.015404109327027373, 0.0034907120842174702,
             -0.11799011114819057, -0.048311742585633, 0.4910559419267466,
             0.787641141030194, 0.3379294217276218, -0.07263752278646252,
             -0.021060292512300564, 0.04472490177066578,
             0.0017677118642428036, -0.007800708325034148],
}


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Probability multipliers and ranges (augment.py:119-165 defaults)."""

    xflip: float = 0.0
    rotate90: float = 0.0
    xint: float = 0.0
    xint_max: float = 0.125
    scale: float = 0.0
    rotate: float = 0.0
    aniso: float = 0.0
    xfrac: float = 0.0
    scale_std: float = 0.2
    rotate_max: float = 1.0
    aniso_std: float = 0.2
    xfrac_std: float = 0.125
    brightness: float = 0.0
    contrast: float = 0.0
    lumaflip: float = 0.0
    hue: float = 0.0
    saturation: float = 0.0
    brightness_std: float = 0.2
    contrast_std: float = 0.5
    hue_max: float = 1.0
    saturation_std: float = 1.0
    imgfilter: float = 0.0
    imgfilter_bands: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    imgfilter_std: float = 1.0
    noise: float = 0.0
    cutout: float = 0.0
    noise_std: float = 0.1
    cutout_size: float = 0.5
    # Geometric-warp backend: 'shear' = the gather-free multi-pass warp
    # (pgx.ops.warp — matmuls + rolls, the TPU fast path; exact for every
    # non-rotation transform); 'gather' = the grid_sample formulation that
    # bit-matches the torch reference (the oracle / non-square fallback).
    warp_impl: str = "shear"
    # static shear-shift budget in units of half the output extent; 1.0
    # covers all pure rotations (see pgx/ops/warp.py docstring)
    shear_margin: float = 1.0


def bgc_config(**overrides) -> AugmentConfig:
    """The ADA paper's default 'bgc' policy: blit + geom + color enabled."""
    base = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                saturation=1)
    base.update(overrides)
    return AugmentConfig(**base)


import functools


@functools.lru_cache(maxsize=1)
def _filter_bank() -> np.ndarray:
    """4-band bandpass bank from sym2 (augment.py:171-180).  Lazy: scipy is
    only needed when the imgfilter transform is actually used."""
    import scipy.signal
    hz_lo = np.asarray(WAVELETS["sym2"])
    hz_hi = hz_lo * ((-1) ** np.arange(hz_lo.size))
    hz_lo2 = np.convolve(hz_lo, hz_lo[::-1]) / 2
    hz_hi2 = np.convolve(hz_hi, hz_hi[::-1]) / 2
    bank = np.eye(4, 1)
    for i in range(1, bank.shape[0]):
        bank = np.dstack([bank, np.zeros_like(bank)]).reshape(
            bank.shape[0], -1)[:, :-1]
        bank = scipy.signal.convolve(bank, [hz_lo2])
        lo = (bank.shape[1] - hz_hi2.size) // 2
        bank[i, lo:lo + hz_hi2.size] += hz_hi2
    return bank


@functools.lru_cache(maxsize=1)
def _hz_geom() -> np.ndarray:
    """Normalized sym6 low-pass (setup_filter semantics) as pure numpy so
    importing this module never initializes a JAX backend."""
    f = np.asarray(WAVELETS["sym6"], np.float64)
    return (f / f.sum()).astype(np.float32)


# --- batched homogeneous-matrix helpers (augment.py:44-108) ----------------

def _eye3(b):
    return jnp.tile(jnp.eye(3, dtype=jnp.float32), (b, 1, 1))


def _f32(x):
    # under jax_enable_x64, default-dtype literals (jnp.ones, np.pi products)
    # would otherwise scatter f64 values into the f32 eye matrices
    return jnp.asarray(x, jnp.float32)


def _translate2d(tx, ty):
    tx, ty = _f32(tx), _f32(ty)
    b = tx.shape[0]
    m = _eye3(b)
    return m.at[:, 0, 2].set(tx).at[:, 1, 2].set(ty)


def _scale2d(sx, sy):
    sx, sy = _f32(sx), _f32(sy)
    b = sx.shape[0]
    m = _eye3(b)
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy)


def _rotate2d(theta):
    theta = _f32(theta)
    b = theta.shape[0]
    c, s = jnp.cos(theta), jnp.sin(theta)
    m = _eye3(b)
    return (m.at[:, 0, 0].set(c).at[:, 0, 1].set(-s)
            .at[:, 1, 0].set(s).at[:, 1, 1].set(c))


def _translate3d(tx, ty, tz):
    tx, ty, tz = _f32(tx), _f32(ty), _f32(tz)
    b = tx.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    return m.at[:, 0, 3].set(tx).at[:, 1, 3].set(ty).at[:, 2, 3].set(tz)


def _scale3d(sx, sy, sz):
    sx, sy, sz = _f32(sx), _f32(sy), _f32(sz)
    b = sx.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    return m.at[:, 0, 0].set(sx).at[:, 1, 1].set(sy).at[:, 2, 2].set(sz)


def _rotate3d(v, theta):
    v, theta = _f32(v), _f32(theta)
    vx, vy, vz = v[0], v[1], v[2]
    s, c = jnp.sin(theta), jnp.cos(theta)
    cc = 1 - c
    b = theta.shape[0]
    m = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    rows = [
        (0, 0, vx * vx * cc + c), (0, 1, vx * vy * cc - vz * s),
        (0, 2, vx * vz * cc + vy * s),
        (1, 0, vy * vx * cc + vz * s), (1, 1, vy * vy * cc + c),
        (1, 2, vy * vz * cc - vx * s),
        (2, 0, vz * vx * cc - vy * s), (2, 1, vz * vy * cc + vx * s),
        (2, 2, vz * vz * cc + c),
    ]
    for i, j, val in rows:
        m = m.at[:, i, j].set(val)
    return m


def augment_pipe(key: jax.Array, images: jnp.ndarray, cfg: AugmentConfig,
                 p, debug_percentile: Optional[float] = None) -> jnp.ndarray:
    """Apply the ADA pipeline to an NHWC batch in [-1, 1].

    ``p`` is the adaptive overall probability (traced scalar); ``cfg`` is
    static so disabled transform groups compile away entirely, exactly like
    the reference's ``if multiplier > 0`` Python guards.
    """
    b, height, width, c = images.shape
    p = jnp.asarray(p, jnp.float32)
    dp = (None if debug_percentile is None
          else jnp.asarray(debug_percentile, jnp.float32))
    keys = iter(jax.random.split(key, 48))

    def rand(shape):
        return jax.random.uniform(next(keys), shape, jnp.float32)

    def randn(shape):
        return jax.random.normal(next(keys), shape, jnp.float32)

    def gate(value, prob, identity):
        """Bernoulli-select value vs identity per sample."""
        mask = rand(value.shape[:1] + (1,) * (value.ndim - 1)) < prob
        return jnp.where(mask, value, identity)

    # ---------------- pixel blitting + geometric: G_inv -------------------
    g_inv = _eye3(b)
    geom_active = any(getattr(cfg, n) > 0 for n in
                      ("xflip", "rotate90", "xint", "scale", "rotate",
                       "aniso", "xfrac"))

    if cfg.xflip > 0:
        i = jnp.floor(rand((b,)) * 2)
        i = gate(i, cfg.xflip * p, jnp.zeros_like(i))
        if dp is not None:
            i = jnp.full_like(i, jnp.floor(dp * 2))
        g_inv = g_inv @ _scale2d(1 / (1 - 2 * i), jnp.ones((b,)))

    if cfg.rotate90 > 0:
        i = jnp.floor(rand((b,)) * 4)
        i = gate(i, cfg.rotate90 * p, jnp.zeros_like(i))
        if dp is not None:
            i = jnp.full_like(i, jnp.floor(dp * 4))
        g_inv = g_inv @ _rotate2d(np.pi / 2 * i)  # rotate2d_inv(-x) = rotate2d(x)

    if cfg.xint > 0:
        t = (rand((b, 2)) * 2 - 1) * cfg.xint_max
        t = gate(t, cfg.xint * p, jnp.zeros_like(t))
        if dp is not None:
            t = jnp.full_like(t, (dp * 2 - 1) * cfg.xint_max)
        g_inv = g_inv @ _translate2d(-jnp.round(t[:, 0] * width),
                                     -jnp.round(t[:, 1] * height))

    if cfg.scale > 0:
        s = jnp.exp2(randn((b,)) * cfg.scale_std)
        s = gate(s, cfg.scale * p, jnp.ones_like(s))
        if dp is not None:
            s = jnp.full_like(s, jnp.exp2(erfinv(dp * 2 - 1) * cfg.scale_std))
        g_inv = g_inv @ _scale2d(1 / s, 1 / s)

    p_rot = 1 - jnp.sqrt(jnp.clip(1 - cfg.rotate * p, 0, 1))
    if cfg.rotate > 0:
        theta = (rand((b,)) * 2 - 1) * np.pi * cfg.rotate_max
        theta = gate(theta, p_rot, jnp.zeros_like(theta))
        if dp is not None:
            theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * cfg.rotate_max)
        g_inv = g_inv @ _rotate2d(theta)  # rotate2d_inv(-theta)

    if cfg.aniso > 0:
        s = jnp.exp2(randn((b,)) * cfg.aniso_std)
        s = gate(s, cfg.aniso * p, jnp.ones_like(s))
        if dp is not None:
            s = jnp.full_like(s, jnp.exp2(erfinv(dp * 2 - 1) * cfg.aniso_std))
        g_inv = g_inv @ _scale2d(1 / s, s)

    if cfg.rotate > 0:
        theta = (rand((b,)) * 2 - 1) * np.pi * cfg.rotate_max
        theta = gate(theta, p_rot, jnp.zeros_like(theta))
        if dp is not None:
            theta = jnp.zeros_like(theta)
        g_inv = g_inv @ _rotate2d(theta)

    if cfg.xfrac > 0:
        t = randn((b, 2)) * cfg.xfrac_std
        t = gate(t, cfg.xfrac * p, jnp.zeros_like(t))
        if dp is not None:
            t = jnp.full_like(t, erfinv(dp * 2 - 1) * cfg.xfrac_std)
        g_inv = g_inv @ _translate2d(-t[:, 0] * width, -t[:, 1] * height)

    # ---------------- execute geometric transform --------------------------
    if geom_active:
        hz_np = _hz_geom()
        hz_pad = hz_np.shape[0] // 4
        # static worst-case reflect margin (reference clamps its data-
        # dependent margin to exactly this, augment.py:283)
        mx, my = width - 1, height - 1
        images = jnp.pad(images, ((0, 0), (my, my), (mx, mx), (0, 0)),
                         mode="reflect")
        # symmetric pad => the (mx0-mx1)/2 origin shift is zero

        if cfg.warp_impl == "shear" and height == width:
            # gather-free fast path (pgx/ops/warp.py): same operator, built
            # from matmuls + rolls instead of grid_sample's gathers
            images = ada_geom_warp_shear(
                images, g_inv[:, :2, :2], g_inv[:, :2, 2], (height, width),
                hz_np, shear_margin=cfg.shear_margin)
        else:
            hz = jnp.asarray(hz_np)
            images = upsample2d(images, hz, up=2)
            s2 = _scale2d(jnp.full((b,), 2.0), jnp.full((b,), 2.0))
            s2_inv = _scale2d(jnp.full((b,), 0.5), jnp.full((b,), 0.5))
            t_half = _translate2d(jnp.full((b,), -0.5), jnp.full((b,), -0.5))
            t_half_inv = _translate2d(jnp.full((b,), 0.5),
                                      jnp.full((b,), 0.5))
            g_inv = s2 @ g_inv @ s2_inv
            g_inv = t_half @ g_inv @ t_half_inv

            out_h = (height + hz_pad * 2) * 2
            out_w = (width + hz_pad * 2) * 2
            in_h, in_w = images.shape[1], images.shape[2]
            sa = _scale2d(jnp.full((b,), 2 / in_w), jnp.full((b,), 2 / in_h))
            sb = _scale2d(jnp.full((b,), out_w / 2),
                          jnp.full((b,), out_h / 2))
            g_inv = sa @ g_inv @ sb

            grid = affine_grid(g_inv[:, :2, :], (b, out_h, out_w))
            images = grid_sample(images, grid)
            images = downsample2d(images, hz, down=2, padding=-hz_pad * 2,
                                  flip_filter=True)

    # ---------------- color transform C ------------------------------------
    eye4 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (b, 1, 1))
    cmat = eye4
    v = jnp.asarray(np.asarray([1, 1, 1, 0]) / np.sqrt(3), jnp.float32)

    if cfg.brightness > 0:
        bb = randn((b,)) * cfg.brightness_std
        bb = gate(bb, cfg.brightness * p, jnp.zeros_like(bb))
        if dp is not None:
            bb = jnp.full_like(bb, erfinv(dp * 2 - 1) * cfg.brightness_std)
        cmat = _translate3d(bb, bb, bb) @ cmat

    if cfg.contrast > 0:
        cc = jnp.exp2(randn((b,)) * cfg.contrast_std)
        cc = gate(cc, cfg.contrast * p, jnp.ones_like(cc))
        if dp is not None:
            cc = jnp.full_like(cc, jnp.exp2(erfinv(dp * 2 - 1)
                                            * cfg.contrast_std))
        cmat = _scale3d(cc, cc, cc) @ cmat

    if cfg.lumaflip > 0:
        i = jnp.floor(rand((b, 1, 1)) * 2)
        i = gate(i, cfg.lumaflip * p, jnp.zeros_like(i))
        if dp is not None:
            i = jnp.full_like(i, jnp.floor(dp * 2))
        vv = jnp.outer(v, v)
        cmat = (eye4 - 2 * vv[None] * i) @ cmat  # Householder reflection

    if cfg.hue > 0 and c > 1:
        theta = (rand((b,)) * 2 - 1) * np.pi * cfg.hue_max
        theta = gate(theta, cfg.hue * p, jnp.zeros_like(theta))
        if dp is not None:
            theta = jnp.full_like(theta, (dp * 2 - 1) * np.pi * cfg.hue_max)
        cmat = _rotate3d(v[:3] / jnp.linalg.norm(v[:3]), theta) @ cmat

    if cfg.saturation > 0 and c > 1:
        s = jnp.exp2(randn((b, 1, 1)) * cfg.saturation_std)
        s = gate(s, cfg.saturation * p, jnp.ones_like(s))
        if dp is not None:
            s = jnp.full_like(s, jnp.exp2(erfinv(dp * 2 - 1)
                                          * cfg.saturation_std))
        vv = jnp.outer(v, v)
        cmat = (vv[None] + (eye4 - vv[None]) * s) @ cmat

    color_active = any(getattr(cfg, n) > 0 for n in
                       ("brightness", "contrast", "lumaflip", "hue",
                        "saturation"))
    if color_active:
        flat = images.reshape(b, height * width, c)    # (B, P, C)
        if c == 3:
            flat = jnp.einsum("bij,bpj->bpi", cmat[:, :3, :3], flat) \
                + cmat[:, None, :3, 3]
        elif c == 1:
            cm = jnp.mean(cmat[:, :3, :], axis=1, keepdims=True)  # (B,1,4)
            flat = flat * jnp.sum(cm[:, :, :3], axis=2)[:, None] \
                + cm[:, :, 3][:, None]
        else:
            raise ValueError("images must be RGB or grayscale")
        images = flat.reshape(b, height, width, c)

    # ---------------- image-space filtering --------------------------------
    if cfg.imgfilter > 0:
        fbank_np = _filter_bank().astype(np.float32)
        fbank = jnp.asarray(fbank_np)
        num_bands = fbank.shape[0]
        assert len(cfg.imgfilter_bands) == num_bands
        expected_power = jnp.asarray(np.array([10, 1, 1, 1]) / 13,
                                     jnp.float32)
        g = jnp.ones((b, num_bands), jnp.float32)
        for i, band_strength in enumerate(cfg.imgfilter_bands):
            t_i = jnp.exp2(randn((b,)) * cfg.imgfilter_std)
            t_i = gate(t_i, cfg.imgfilter * p * band_strength,
                       jnp.ones_like(t_i))
            if dp is not None:
                t_i = (jnp.full_like(t_i, jnp.exp2(erfinv(dp * 2 - 1)
                                                   * cfg.imgfilter_std))
                       if band_strength > 0 else jnp.ones_like(t_i))
            t = jnp.ones((b, num_bands), jnp.float32).at[:, i].set(t_i)
            t = t / jnp.sqrt(jnp.sum(expected_power * jnp.square(t), axis=-1,
                                     keepdims=True))
            g = g * t

        hz_prime = g @ fbank                           # (B, taps)
        taps = hz_prime.shape[1]
        pad = fbank_np.shape[1] // 2
        # NHWC grouped conv: channels = B*C, per-channel separable filter
        x = jnp.transpose(images, (1, 2, 0, 3)).reshape(
            1, height, width, b * c)
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode="reflect")
        k = jnp.repeat(hz_prime, c, axis=0)            # (B*C, taps)
        ky = k.T.reshape(taps, 1, 1, b * c)
        kx = k.T.reshape(1, taps, 1, b * c)
        x = jax.lax.conv_general_dilated(
            x, ky, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b * c)
        x = jax.lax.conv_general_dilated(
            x, kx, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=b * c)
        images = jnp.transpose(x.reshape(height, width, b, c), (2, 0, 1, 3))

    # ---------------- corruptions -------------------------------------------
    if cfg.noise > 0:
        sigma = jnp.abs(randn((b, 1, 1, 1))) * cfg.noise_std
        sigma = gate(sigma, cfg.noise * p, jnp.zeros_like(sigma))
        if dp is not None:
            sigma = jnp.full_like(sigma, erfinv(dp) * cfg.noise_std)
        images = images + randn((b, height, width, c)) * sigma

    if cfg.cutout > 0:
        size = jnp.full((b, 2, 1, 1, 1), cfg.cutout_size, jnp.float32)
        size = gate(size, cfg.cutout * p, jnp.zeros_like(size))
        center = rand((b, 2, 1, 1, 1))
        if dp is not None:
            size = jnp.full_like(size, cfg.cutout_size)
            center = jnp.full_like(center, dp)
        coord_x = jnp.arange(width).reshape(1, 1, -1)
        coord_y = jnp.arange(height).reshape(1, -1, 1)
        mask_x = (jnp.abs((coord_x + 0.5) / width - center[:, 0, :, :, 0])
                  >= size[:, 0, :, :, 0] / 2)
        mask_y = (jnp.abs((coord_y + 0.5) / height - center[:, 1, :, :, 0])
                  >= size[:, 1, :, :, 0] / 2)
        mask = jnp.logical_or(mask_x, mask_y).astype(images.dtype)
        images = images * mask[..., None]

    return images
