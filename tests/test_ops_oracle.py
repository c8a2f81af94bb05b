"""Oracle parity for the ops layer vs the reference's pure-torch
implementations (ada/torch_utils/ops/*, the same dual-impl strategy the
reference uses to validate its CUDA kernels)."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference/ada")

try:
    from torch_utils.ops import bias_act as ref_ba
    from torch_utils.ops import grid_sample_gradfix as ref_gs
    from torch_utils.ops import upfirdn2d as ref_up
except ImportError:  # pragma: no cover
    ref_ba = ref_up = ref_gs = None

from pgx.ops.bias_act import activation_funcs, bias_act
from pgx.ops.grid_sample import affine_grid, grid_sample
from pgx.ops.upfirdn2d import (downsample2d, filter2d, setup_filter,
                               upfirdn2d, upsample2d)

pytestmark = pytest.mark.skipif(ref_up is None,
                                reason="reference ada not importable")


def _nchw(x):
    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())


def _nhwc(t):
    return t.permute(0, 2, 3, 1).numpy()


def _rand(shape, seed):
    return np.random.RandomState(seed).randn(*shape).astype(np.float32)


@pytest.mark.parametrize("fdesc", [[1, 3, 3, 1], [1, 2, 1],
                                   np.ones((3, 3)), None,
                                   [1, 2, 3, 4, 5, 6, 7, 8]])
def test_setup_filter_matches(fdesc):
    ours = np.asarray(setup_filter(fdesc, gain=2.0))
    want = ref_up.setup_filter(fdesc, gain=2.0).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-6)


@pytest.mark.parametrize("up,down,pad,flip,gain", [
    (1, 1, 0, False, 1.0),
    (2, 1, 1, False, 1.0),
    (1, 2, 2, False, 1.0),
    (2, 2, (1, 2, 0, 3), False, 2.0),
    (4, 1, 3, True, 1.0),
    (1, 1, (-1, -1, -1, -1), False, 1.0),
    (3, 2, (2, 1, 1, 2), False, 1.5),
])
def test_upfirdn2d_matches(up, down, pad, flip, gain):
    x = _rand((2, 8, 8, 3), seed=up * 10 + down)
    f = ref_up.setup_filter([1, 3, 3, 1])
    want = _nhwc(ref_up.upfirdn2d(_nchw(x), f, up=up, down=down, padding=pad,
                                  flip_filter=flip, gain=gain))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f.numpy()),
                               up=up, down=down, padding=pad,
                               flip_filter=flip, gain=gain))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_upfirdn2d_separable_matches():
    x = _rand((2, 8, 8, 3), seed=3)
    f1d = ref_up.setup_filter([1, 2, 3, 4, 5, 6, 7, 8])  # stays 1-D
    assert f1d.ndim == 1
    want = _nhwc(ref_up.upfirdn2d(_nchw(x), f1d, up=2, padding=3, gain=2.0))
    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(f1d.numpy()),
                               up=2, padding=3, gain=2.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("fn_pair", ["upsample2d", "downsample2d", "filter2d"])
def test_wrappers_match(fn_pair):
    x = _rand((2, 8, 8, 3), seed=7)
    f = ref_up.setup_filter([1, 3, 3, 1])
    ours_fn = {"upsample2d": upsample2d, "downsample2d": downsample2d,
               "filter2d": filter2d}[fn_pair]
    ref_fn = getattr(ref_up, fn_pair)
    want = _nhwc(ref_fn(_nchw(x), f))
    got = np.asarray(ours_fn(jnp.asarray(x), jnp.asarray(f.numpy())))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("act", sorted(activation_funcs))
def test_bias_act_matches(act):
    x = _rand((2, 4, 4, 5), seed=11)
    b = _rand((5,), seed=12)
    want = _nhwc(ref_ba.bias_act(_nchw(x), torch.from_numpy(b), dim=1,
                                 act=act))
    got = np.asarray(bias_act(jnp.asarray(x), jnp.asarray(b), act=act))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_bias_act_gain_clamp():
    x = _rand((2, 4, 4, 5), seed=13)
    want = _nhwc(ref_ba.bias_act(_nchw(x), None, act="lrelu", gain=3.0,
                                 clamp=0.5))
    got = np.asarray(bias_act(jnp.asarray(x), act="lrelu", gain=3.0,
                              clamp=0.5))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_matches_torch():
    x = _rand((2, 8, 8, 3), seed=21)
    theta = np.stack([
        np.array([[0.8, 0.2, 0.1], [-0.1, 1.1, -0.2]], np.float32),
        np.array([[1.3, 0.0, -0.4], [0.3, 0.7, 0.5]], np.float32),
    ])
    grid_t = torch.nn.functional.affine_grid(
        torch.from_numpy(theta), size=(2, 3, 10, 10), align_corners=False)
    want = _nhwc(ref_gs.grid_sample(_nchw(x), grid_t))
    grid_j = affine_grid(jnp.asarray(theta), (2, 10, 10))
    np.testing.assert_allclose(np.asarray(grid_j), grid_t.numpy(), rtol=1e-5,
                               atol=1e-6)
    got = np.asarray(grid_sample(jnp.asarray(x), grid_j))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sample_double_grad():
    x = jnp.asarray(_rand((1, 6, 6, 2), seed=31))
    grid = affine_grid(jnp.asarray([[[0.9, 0.1, 0.0], [0.0, 1.0, 0.1]]],
                                   dtype=jnp.float32), (1, 6, 6))

    def f(img):
        return jnp.sum(grid_sample(img, grid) ** 2)

    g = jax.grad(lambda im: jnp.sum(jax.grad(f)(im) ** 2))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_upfirdn2d_gradient_vs_torch():
    x = _rand((1, 6, 6, 2), seed=41)
    f = ref_up.setup_filter([1, 3, 3, 1])

    xt = _nchw(x).requires_grad_(True)
    ref_out = ref_up.upsample2d(xt, f)
    ref_out.pow(2).sum().backward()
    want = _nhwc(xt.grad.detach())

    def loss(img):
        return jnp.sum(upsample2d(img, jnp.asarray(f.numpy())) ** 2)

    got = np.asarray(jax.grad(loss)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("up,down,pad,flip_w", [
    (1, 1, 0, True), (2, 1, 1, False), (1, 2, 1, True), (2, 2, 0, True),
])
def test_conv2d_resample_matches(up, down, pad, flip_w):
    from torch_utils.ops import conv2d_resample as ref_cr

    from pgx.ops.conv2d_resample import conv2d_resample

    x = _rand((2, 8, 8, 4), seed=51)
    w = _rand((3, 3, 4, 6), seed=52)       # HWIO
    w_t = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)).copy())  # OIHW
    f = ref_up.setup_filter([1, 3, 3, 1])
    want = _nhwc(ref_cr.conv2d_resample(_nchw(x), w_t, f=f, up=up, down=down,
                                        padding=pad, flip_weight=flip_w))
    got = np.asarray(conv2d_resample(jnp.asarray(x), jnp.asarray(w), 
                                     f=jnp.asarray(f.numpy()), up=up,
                                     down=down, padding=pad,
                                     flip_weight=flip_w))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
