"""Pallas kernels vs the lax reference path (interpret mode on CPU) — the
same dual-implementation strategy the reference uses for its CUDA kernels."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pgx.ops.bias_act import bias_act
from pgx.ops.upfirdn2d import setup_filter, upfirdn2d

# run every pallas_call in interpreter mode on the CPU test backend
from jax.experimental.pallas import tpu as pltpu


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    from jax.experimental import pallas as pl
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)
    import pgx.ops.pallas.kernels as K
    monkeypatch.setattr(K.pl, "pallas_call", patched)
    yield


def _rand(shape, seed=0):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, 0), (1, 1, 3), (1, 2, 1), (2, 1, 0), (2, 1, 2), (2, 2, 1),
    (1, 2, (2, 1, 1, 2)), (2, 1, (1, 3, 2, 0)),
])
def test_upfirdn2d_pallas_matches_lax(up, down, pad):
    from pgx.ops.pallas.kernels import upfirdn2d_pallas

    x = jnp.asarray(_rand((2, 8, 8, 3), seed=up * 7 + down))
    f = np.asarray(setup_filter([1, 3, 3, 1], separable=True))
    assert f.ndim == 1
    want = np.asarray(upfirdn2d(x, jnp.asarray(f), up=up, down=down,
                                padding=pad, gain=1.5))
    got = np.asarray(upfirdn2d_pallas(x, f, up=up, down=down, padding=pad,
                                      gain=1.5))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_pallas_sym6_roundtrip():
    """The exact calls the ADA geometric path makes: sym6 up-2 then down-2."""
    from pgx.augment.pipe import WAVELETS
    from pgx.ops.pallas.kernels import upfirdn2d_pallas
    from pgx.ops.upfirdn2d import downsample2d, upsample2d

    f = np.asarray(setup_filter(WAVELETS["sym6"], separable=True))
    x = jnp.asarray(_rand((1, 12, 12, 2), seed=3))

    want_up = np.asarray(upsample2d(x, jnp.asarray(f)))
    got_up = np.asarray(upfirdn2d_pallas(
        x, f, up=2,
        padding=((len(f) + 1) // 2, (len(f) - 2) // 2,
                 (len(f) + 1) // 2, (len(f) - 2) // 2), gain=4))
    np.testing.assert_allclose(got_up, want_up, rtol=1e-4, atol=1e-5)

    want_dn = np.asarray(downsample2d(x, jnp.asarray(f)))
    got_dn = np.asarray(upfirdn2d_pallas(
        x, f, down=2,
        padding=((len(f) - 1) // 2, (len(f) - 2) // 2,
                 (len(f) - 1) // 2, (len(f) - 2) // 2)))
    np.testing.assert_allclose(got_dn, want_dn, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", ["linear", "lrelu", "tanh", "swish"])
def test_bias_act_pallas_matches(act):
    from pgx.ops.pallas.kernels import bias_act_pallas

    x = jnp.asarray(_rand((2, 5, 5, 7), seed=11))
    b = jnp.asarray(_rand((7,), seed=12))
    want = np.asarray(bias_act(x, b, act=act, clamp=1.5))
    got = np.asarray(bias_act_pallas(x, b, act=act, clamp=1.5))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pixel_norm_lrelu_pallas_matches():
    from pgx.core import leaky_relu, pixel_norm
    from pgx.ops.pallas.kernels import pixel_norm_lrelu_pallas

    x = jnp.asarray(_rand((3, 4, 4, 24), seed=21))
    want = np.asarray(leaky_relu(pixel_norm(x), 0.2))
    got = np.asarray(pixel_norm_lrelu_pallas(x, slope=0.2))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dispatcher_routes_to_pallas(monkeypatch):
    """PGX_USE_PALLAS=1 routes pgx.ops.upfirdn2d / bias_act through the
    Pallas kernels (interpret mode here) with identical results."""
    import pgx.ops.pallas as P

    monkeypatch.setenv("PGX_USE_PALLAS", "1")
    monkeypatch.setattr(P, "pallas_enabled", lambda: True)

    x = jnp.asarray(_rand((2, 8, 8, 3), seed=77))
    f1d = np.asarray(setup_filter([1, 3, 3, 1], separable=True))
    via_dispatch = np.asarray(upfirdn2d(x, jnp.asarray(f1d), up=2,
                                        padding=1))
    monkeypatch.setattr(P, "pallas_enabled", lambda: False)
    via_lax = np.asarray(upfirdn2d(x, jnp.asarray(f1d), up=2, padding=1))
    np.testing.assert_allclose(via_dispatch, via_lax, rtol=1e-4, atol=1e-5)

    monkeypatch.setattr(P, "pallas_enabled", lambda: True)
    b = jnp.asarray(_rand((3,), seed=78))
    got = np.asarray(bias_act(x, b, act="lrelu", clamp=1.0))
    monkeypatch.setattr(P, "pallas_enabled", lambda: False)
    want = np.asarray(bias_act(x, b, act="lrelu", clamp=1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_upfirdn2d_pallas_negative_padding():
    """The ADA geometric path's crop call: down=2 with padding=-hz_pad*2."""
    from pgx.ops.pallas.kernels import upfirdn2d_pallas

    x = jnp.asarray(_rand((1, 20, 20, 2), seed=91))
    f = np.asarray(setup_filter([1, 3, 3, 1], separable=True))
    want = np.asarray(upfirdn2d(x, jnp.asarray(f), down=2,
                                padding=(-2, -1, -2, -1)))
    got = np.asarray(upfirdn2d_pallas(x, f, down=2, padding=(-2, -1, -2, -1)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_pallas_dispatch_is_differentiable(monkeypatch):
    """ADVICE r1: the PGX_USE_PALLAS dispatch must survive reverse-mode AD
    (the ADA-augmented G update differentiates through up/downsample2d)."""
    import pgx.ops.pallas as P

    monkeypatch.setattr(P, "pallas_enabled", lambda: True)

    f = setup_filter([1, 3, 3, 1])
    x = jnp.asarray(_rand((2, 8, 8, 3), seed=5))

    def loss_pallas(xx):
        return jnp.sum(jnp.square(upfirdn2d(xx, f, up=2, down=1, padding=1,
                                            gain=4.0)))

    gp = jax.grad(loss_pallas)(x)

    monkeypatch.setattr(P, "pallas_enabled", lambda: False)
    gl = jax.grad(loss_pallas)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gl),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# shear kernel (pgx/ops/pallas/shear.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("axis", [2, 3])
def test_shift_1d_pallas_matches_jnp_ladder(axis):
    from pgx.ops.pallas.shear import shift_1d_pallas
    from pgx.ops.warp import _shift_1d_jnp

    key = jax.random.PRNGKey(0)
    img = jax.random.normal(key, (2, 3, 64, 128), jnp.float32)
    lines = img.shape[2] if axis == 3 else img.shape[3]
    shift = jax.random.normal(jax.random.PRNGKey(1), (2, lines)) * 40.0
    want = _shift_1d_jnp(img, shift, axis)
    got = shift_1d_pallas(img, shift, axis, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_shift_1d_pallas_pads_untiled_rows():
    """axis=3 with R not a multiple of 8 — the shape the axis=2 big-extent
    fallback hands over (2*(w + 2*hz_pad) is never tile-friendly).  The
    kernel must zero-pad to a Mosaic-tileable extent and slice back."""
    from pgx.ops.pallas.shear import shift_1d_pallas
    from pgx.ops.warp import _shift_1d_jnp

    img = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 52, 128),
                            jnp.float32)
    shift = jax.random.normal(jax.random.PRNGKey(6), (2, 52)) * 30.0
    want = _shift_1d_jnp(img, shift, 3)
    got = shift_1d_pallas(img, shift, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_shift_1d_pallas_axis2_fallback_matches(monkeypatch):
    """Force the axis=2 transpose fallback (tiny VMEM budget) with a minor
    extent that is not a multiple of 8 — the 512px+ crash shape in
    miniature.  Previously _pick_tile fell through to the full extent and
    Mosaic got a VMEM-impossible block."""
    import pgx.ops.pallas.shear as shear
    from pgx.ops.warp import _shift_1d_jnp

    monkeypatch.setattr(shear, "_VMEM_BLOCK_BUDGET", 1024)
    img = jax.random.normal(jax.random.PRNGKey(7), (1, 2, 64, 100),
                            jnp.float32)
    shift = jax.random.normal(jax.random.PRNGKey(8), (1, 100)) * 20.0
    want = _shift_1d_jnp(img, shift, 2)
    got = shear.shift_1d_pallas(img, shift, 2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_axis2_routing_accounts_for_ladder_working_set():
    """Routing regression for the 256px ADA VMEM abort (observed live,
    round 5): a 1088x524 f32 axis=2 block is only 2.3 MB, but the ladder
    keeps ~10 block-sized values live, so Mosaic's scoped-vmem stack hit
    21.3 MB against the 16 MB space.  Such shapes must take the tileable
    transpose route; the 128px warp shape (544x270) stays direct."""
    from pgx.ops.pallas.shear import _axis2_needs_transpose

    assert _axis2_needs_transpose(1088, 524, 4)      # 256px stage, f32
    assert _axis2_needs_transpose(2176, 1088, 4)     # 512px stage
    assert not _axis2_needs_transpose(544, 270, 4)   # 128px stage
    assert not _axis2_needs_transpose(136, 68, 4)    # 32px stage


def test_shift_1d_pallas_axis2_256px_shape_matches():
    """The exact failing extent class end-to-end (interpret mode): axis=2
    at a 256px-warp-sized minor extent goes through the transpose route
    and still matches the jnp ladder bit-for-bit within tolerance."""
    import pgx.ops.pallas.shear as shear
    from pgx.ops.warp import _shift_1d_jnp

    img = jax.random.normal(jax.random.PRNGKey(11), (1, 1, 272, 131),
                            jnp.float32)
    shift = jax.random.normal(jax.random.PRNGKey(12), (1, 131)) * 40.0
    # 272*131*4 ≈ 0.14 MB: shrink the budget so this shape crosses the
    # same threshold the real 1088x524 block does at full size
    import unittest.mock as mock
    with mock.patch.object(shear, "_VMEM_BLOCK_BUDGET", 64 * 1024):
        assert shear._axis2_needs_transpose(272, 131, 4)
        got = shear.shift_1d_pallas(img, shift, 2, interpret=True)
    want = _shift_1d_jnp(img, shift, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_shift_1d_pallas_vjp_is_negated_shift():
    """The kernel's custom VJP reuses the forward with -shift; it must equal
    autodiff through the jnp ladder."""
    from pgx.ops.warp import _shift_1d_jnp
    from pgx.ops.pallas.shear import shift_1d_pallas

    key = jax.random.PRNGKey(2)
    img = jax.random.normal(key, (2, 1, 32, 128), jnp.float32)
    shift = jax.random.normal(jax.random.PRNGKey(3), (2, 32)) * 20.0
    ct = jax.random.normal(jax.random.PRNGKey(4), img.shape, jnp.float32)

    _, vjp = jax.vjp(lambda x: _shift_1d_jnp(x, shift, 3), img)
    want = vjp(ct)[0]
    got = shift_1d_pallas(ct, -shift, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_fused_epilogue_matches_composition():
    """bias_pixelnorm_lrelu (one-pass epilogue kernel) == bias + pixel_norm
    + leaky_relu composition, values and grads (f32, interpret mode)."""
    from pgx.core.layers import leaky_relu, pixel_norm
    from pgx.ops.pallas.epilogue import bias_pixelnorm_lrelu, supported

    y = jnp.asarray(_rand((2, 4, 4, 128), seed=5))
    b = jnp.asarray(_rand((128,), seed=6))
    assert supported(y)

    def ref(yy, bb):
        return leaky_relu(pixel_norm(yy + bb.astype(yy.dtype)), 0.2)

    got = bias_pixelnorm_lrelu(y, b, 0.2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref(y, b)),
                               atol=1e-6, rtol=1e-5)

    gy_r, gb_r = jax.grad(lambda a, c: jnp.sum(jnp.tanh(ref(a, c))),
                          argnums=(0, 1))(y, b)
    gy_p, gb_p = jax.grad(
        lambda a, c: jnp.sum(jnp.tanh(bias_pixelnorm_lrelu(a, c, 0.2))),
        argnums=(0, 1))(y, b)
    np.testing.assert_allclose(np.asarray(gy_p), np.asarray(gy_r),
                               atol=1e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gb_p), np.asarray(gb_r),
                               atol=1e-4, rtol=1e-4)


def test_fused_epilogue_unsupported_shapes():
    from pgx.ops.pallas.epilogue import supported
    assert not supported(jnp.zeros((2, 4, 4, 96)))      # C not /128
    assert not supported(jnp.zeros((3, 1, 1, 128)))     # rows not /8
    assert not supported(jnp.zeros((8, 4, 4, 128), jnp.float64))


def test_fused_epilogue_double_grad():
    """The WGAN-GP pattern: reverse-differentiate the reverse gradient of
    a function containing the fused epilogue (custom_jvp rule must be
    differentiable) — matches the XLA composition."""
    from pgx.core.layers import leaky_relu, pixel_norm
    from pgx.ops.pallas.epilogue import bias_pixelnorm_lrelu

    y = jnp.asarray(_rand((2, 2, 2, 128), seed=7))
    b = jnp.asarray(_rand((128,), seed=8))

    def gp(fn):
        def loss(bb):
            gx = jax.grad(lambda xx: jnp.sum(fn(xx, bb)))(y)
            n = jnp.sqrt(jnp.sum(jnp.square(gx), axis=(1, 2, 3)))
            return jnp.mean(jnp.square(n - 1.0))
        return jax.grad(loss)(b)

    ref = gp(lambda xx, bb: leaky_relu(
        pixel_norm(xx + bb.astype(xx.dtype)), 0.2))
    got = gp(lambda xx, bb: bias_pixelnorm_lrelu(xx, bb, 0.2))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# fused conv3x3 + epilogue (VERDICT r2 #2: epilogue fused INTO the conv)
# ---------------------------------------------------------------------------

def test_conv_epilogue_fused_matches_xla():
    """9-tap-matmul Pallas conv + in-register epilogue == the XLA
    composition (SAME 3x3 conv -> bias -> pixel-norm -> lrelu)."""
    from pgx.ops.pallas.conv_epilogue import (conv3x3_epilogue_fwd,
                                              conv3x3_epilogue_ref,
                                              supported)

    rng = np.random.RandomState(0)
    for (b, h, w, ci, co), pn in [((4, 16, 16, 256, 256), True),
                                  ((2, 32, 16, 128, 256), True),
                                  ((4, 16, 16, 128, 128), False)]:
        x = jnp.asarray(rng.randn(b, h, w, ci).astype(np.float32))
        wk = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32) * 0.05)
        bb = jnp.asarray(rng.randn(co).astype(np.float32) * 0.1)
        assert supported(x, wk)
        got = conv3x3_epilogue_fwd(x, wk, bb, use_pixel_norm=pn)
        want = conv3x3_epilogue_ref(x, wk, bb, use_pixel_norm=pn)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=3e-5, rtol=1e-4)


def test_conv_epilogue_fused_unsupported_shapes():
    from pgx.ops.pallas.conv_epilogue import supported

    w_ok = jnp.zeros((3, 3, 128, 128))
    assert not supported(jnp.zeros((2, 16, 16, 96)),
                         jnp.zeros((3, 3, 96, 128)))       # C_in not /128
    assert not supported(jnp.zeros((2, 16, 12, 128)), w_ok)  # W not /8
    assert not supported(jnp.zeros((2, 16, 16, 128)),
                         jnp.zeros((5, 5, 128, 128)))      # not 3x3


def test_conv_epilogue_fused_grads_match_xla():
    """custom_vjp (manual epilogue VJP from the saved pre-activation +
    XLA gradient convs) matches autodiff through the XLA composition."""
    from pgx.ops.pallas.conv_epilogue import (conv3x3_epilogue_ref,
                                              make_conv3x3_epilogue)

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 128).astype(np.float32))
    wk = jnp.asarray(rng.randn(3, 3, 128, 128).astype(np.float32) * 0.05)
    bb = jnp.asarray(rng.randn(128).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.randn(2, 16, 16, 128).astype(np.float32))

    for pn in (True, False):
        op = make_conv3x3_epilogue(use_pixel_norm=pn)
        gp = jax.grad(lambda *a: jnp.sum(op(*a) * g),
                      argnums=(0, 1, 2))(x, wk, bb)
        gr = jax.grad(lambda *a: jnp.sum(conv3x3_epilogue_ref(
            *a, use_pixel_norm=pn) * g), argnums=(0, 1, 2))(x, wk, bb)
        for a, b2 in zip(gp, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=5e-4, rtol=1e-3)
