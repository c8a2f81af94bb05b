"""Gather-free shear warp (pgx/ops/warp.py) vs the grid_sample oracle.

The shear path must be algebraically exact for every non-rotation transform
(flips, 90-degree rotations, integer/fractional translation, iso/aniso
scaling — the per-axis matrices reproduce the reference's upfirdn algebra),
and interpolation-equivalent for rotations (two extra 1-D tents at the
2x-supersampled rate).  The gather path is the bit-parity oracle against the
torch reference (tests/test_augment_oracle.py)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgx.augment.pipe import AugmentConfig, augment_pipe, bgc_config
from pgx.ops.upfirdn2d import _upfirdn2d_1d
from pgx.ops.warp import upfirdn_matrix_1d

KEY = jax.random.PRNGKey(0)


def _run(x, cfgkw, pct, impl, p=1.0):
    cfg = (dataclasses.replace(bgc_config(), warp_impl=impl)
           if cfgkw == "bgc" else AugmentConfig(**cfgkw, warp_impl=impl))
    return np.asarray(augment_pipe(KEY, jnp.asarray(x), cfg, p,
                                   debug_percentile=pct))


def _rand_images(b=4, res=16, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return np.tanh(rng.randn(b, res, res, c)).astype(np.float32)


def _smooth_images(b=4, res=32, c=3, seed=1):
    rng = np.random.RandomState(seed)
    lo = jnp.asarray(rng.randn(b, 4, 4, c).astype(np.float32))
    x = jax.image.resize(lo, (b, res, res, c), "cubic")
    return np.tanh(np.asarray(x)).astype(np.float32)


@pytest.mark.parametrize("up,down,p0,p1,flip", [
    (2, 1, 6, 5, False), (1, 2, -1, -1, True),
    (1, 1, 3, 2, False), (2, 2, 4, 4, True), (2, 1, 0, 0, False)])
def test_upfirdn_matrix_matches_conv(up, down, p0, p1, flip):
    rng = np.random.RandomState(0)
    n = 37
    f = rng.randn(12)
    x = rng.randn(2, 3, n, 4).astype(np.float32)
    want = np.asarray(_upfirdn2d_1d(
        jnp.asarray(x), jnp.asarray(f, jnp.float32), axis=2, up=up,
        down=down, pad0=p0, pad1=p1, flip_filter=flip))
    m = upfirdn_matrix_1d(n, f, up=up, down=down, pad0=p0, pad1=p1,
                          flip_filter=flip)
    got = np.einsum("om,bhmc->bhoc", m.astype(np.float32), x)
    np.testing.assert_allclose(got, want, atol=1e-4)


EXACT_GROUPS = [{"xflip": 1}, {"rotate90": 1}, {"xint": 1}, {"scale": 1},
                {"aniso": 1}, {"xfrac": 1},
                {"xflip": 1, "rotate90": 1, "xint": 1, "scale": 1,
                 "aniso": 1, "xfrac": 1}]


@pytest.mark.parametrize("kwargs", EXACT_GROUPS)
@pytest.mark.parametrize("pct", [0.1, 0.23, 0.57, 0.91])
def test_shear_exact_for_non_rotation(kwargs, pct):
    x = _rand_images(res=16, seed=int(pct * 100))
    g = _run(x, kwargs, pct, "gather")
    s = _run(x, kwargs, pct, "shear")
    np.testing.assert_allclose(s, g, atol=5e-5)


@pytest.mark.parametrize("pct", [0.1, 0.3, 0.45, 0.6, 0.8, 0.95])
def test_shear_rotation_interp_equivalent(pct):
    """On band-limited (smooth) images the two warps agree to ~1%."""
    x = _smooth_images()
    g = _run(x, {"rotate": 1}, pct, "gather")
    s = _run(x, {"rotate": 1}, pct, "shear")
    d = np.abs(g - s)
    assert d.max() < 0.05, d.max()
    assert d.mean() < 0.005, d.mean()


@pytest.mark.parametrize("pct", [0.15, 0.35, 0.65, 0.85])
def test_shear_full_bgc_smooth(pct):
    x = _smooth_images(seed=2)
    g = _run(x, "bgc", pct, "gather")
    s = _run(x, "bgc", pct, "shear")
    d = np.abs(g - s)
    assert d.max() < 0.06, d.max()
    assert d.mean() < 0.008, d.mean()


def test_shear_stochastic_distribution_close():
    """Same PRNG key => same transform draws => outputs statistically
    indistinguishable (moments) and pixelwise close in the mean."""
    x = _rand_images(b=8, res=32, seed=3)
    cfg_g = dataclasses.replace(bgc_config(), warp_impl="gather")
    cfg_s = dataclasses.replace(bgc_config(), warp_impl="shear")
    g = np.asarray(augment_pipe(KEY, jnp.asarray(x), cfg_g, 0.6))
    s = np.asarray(augment_pipe(KEY, jnp.asarray(x), cfg_s, 0.6))
    assert abs(g.mean() - s.mean()) < 1e-3
    # white noise is the worst case for the two extra 1-D tents the shear
    # path inserts under rotation: allow a few percent relative smoothing
    assert abs(g.std() - s.std()) / g.std() < 0.05
    assert np.abs(g - s).mean() < 0.05


def test_shear_grad_flows():
    x = jnp.asarray(_rand_images(b=2, res=16, seed=4))
    cfg = dataclasses.replace(bgc_config(), warp_impl="shear")

    def loss(img):
        return jnp.sum(augment_pipe(KEY, img, cfg, 0.6) ** 2)

    g = jax.grad(loss)(x)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.linalg.norm(g)) > 0


def test_shear_grad_matches_gather_for_separable():
    """For a non-rotation transform the two paths are the same linear
    operator, so input gradients must agree too."""
    x = jnp.asarray(_rand_images(b=2, res=16, seed=5))

    def loss(img, impl):
        cfg = AugmentConfig(scale=1, aniso=1, xint=1, warp_impl=impl)
        return jnp.sum(augment_pipe(KEY, img, cfg, 1.0,
                                    debug_percentile=0.37) ** 2)

    gg = jax.grad(lambda i: loss(i, "gather"))(x)
    gs = jax.grad(lambda i: loss(i, "shear"))(x)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(gg), atol=2e-4)


def test_non_square_falls_back_to_gather():
    rng = np.random.RandomState(6)
    x = jnp.asarray(np.tanh(rng.randn(2, 16, 24, 3)).astype(np.float32))
    cfg = AugmentConfig(scale=1, warp_impl="shear")
    out = augment_pipe(KEY, x, cfg, 1.0, debug_percentile=0.4)
    want = augment_pipe(KEY, x, AugmentConfig(scale=1, warp_impl="gather"),
                        1.0, debug_percentile=0.4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_shear_p_zero_identity_matches_gather():
    x = _rand_images(b=2, res=16, seed=7)
    g = np.asarray(augment_pipe(
        KEY, jnp.asarray(x),
        dataclasses.replace(bgc_config(), warp_impl="gather"), 0.0))
    s = np.asarray(augment_pipe(
        KEY, jnp.asarray(x),
        dataclasses.replace(bgc_config(), warp_impl="shear"), 0.0))
    np.testing.assert_allclose(s, g, atol=5e-5)


def test_shear_grayscale():
    rng = np.random.RandomState(8)
    x = jnp.asarray(np.tanh(rng.randn(2, 16, 16, 1)).astype(np.float32))
    g = np.asarray(augment_pipe(KEY, x,
                                AugmentConfig(xint=1, scale=1,
                                              warp_impl="gather"),
                                1.0, debug_percentile=0.6))
    s = np.asarray(augment_pipe(KEY, x,
                                AugmentConfig(xint=1, scale=1,
                                              warp_impl="shear"),
                                1.0, debug_percentile=0.6))
    np.testing.assert_allclose(s, g, atol=5e-5)
