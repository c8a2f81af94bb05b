"""Golden/parity tests for equalized-LR primitives (SURVEY.md section 2.1).

Torch sides are built from the documented formulas: raw N(0,1) weights with a
runtime scale sqrt(2/fan_in), fan_in = w.size(1) * w[0][0].numel()
(reference: progan_modules.py:22-27).
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pgx.core import (
    conv_block,
    conv_block_init,
    embedding,
    embedding_init,
    equal_conv2d,
    equal_conv2d_init,
    equal_conv_transpose2d,
    equal_conv_transpose2d_init,
    equal_linear,
    equal_linear_init,
    latent_to_4x4,
    minibatch_stddev,
    pixel_norm,
)


def _key(i=0):
    return jax.random.PRNGKey(i)


def test_pixel_norm_golden():
    x = np.array([[3.0, 4.0]], dtype=np.float32).reshape(1, 1, 1, 2)
    got = np.asarray(pixel_norm(jnp.asarray(x)))
    denom = math.sqrt((9 + 16) / 2 + 1e-8)
    np.testing.assert_allclose(got, x / denom, rtol=1e-6)


def test_pixel_norm_matches_torch_formula():
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 5, 7).astype(np.float32)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    want = (t / torch.sqrt(torch.mean(t ** 2, dim=1, keepdim=True) + 1e-8))
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(pixel_norm(jnp.asarray(x))), want,
                               rtol=1e-5, atol=1e-6)


def test_equal_conv2d_matches_torch():
    p = equal_conv2d_init(_key(1), in_ch=5, out_ch=7, kernel=3)
    rng = np.random.RandomState(1)
    x = rng.randn(2, 8, 8, 5).astype(np.float32)
    # torch: OIHW weight from our HWIO, scaled by sqrt(2 / (in*kh*kw)).
    w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    scale = math.sqrt(2.0 / (5 * 3 * 3))
    want = F.conv2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                    torch.from_numpy(w * scale),
                    torch.from_numpy(np.asarray(p["b"])), padding=1)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(equal_conv2d(p, jnp.asarray(x), padding=1))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("spatial,stride,padding", [(1, 1, 0), (4, 2, 1),
                                                    (3, 1, 1)])
def test_equal_conv_transpose2d_matches_torch(spatial, stride, padding):
    in_ch, out_ch, k = 6, 5, 4
    p = equal_conv_transpose2d_init(_key(2), in_ch, out_ch, kernel=k)
    rng = np.random.RandomState(2)
    x = rng.randn(2, spatial, spatial, in_ch).astype(np.float32)
    # torch ConvTranspose2d weight layout is (in, out, kh, kw); ours HWOI.
    w = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
    scale = math.sqrt(2.0 / (out_ch * k * k))  # reference fan_in quirk
    want = F.conv_transpose2d(torch.from_numpy(x).permute(0, 3, 1, 2),
                              torch.from_numpy(w * scale),
                              torch.from_numpy(np.asarray(p["b"])),
                              stride=stride, padding=padding)
    want = want.permute(0, 2, 3, 1).numpy()
    got = np.asarray(
        equal_conv_transpose2d(p, jnp.asarray(x), stride=stride,
                               padding=padding))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_latent_to_4x4_equals_general_transpose_conv():
    p = equal_conv_transpose2d_init(_key(3), in_ch=16, out_ch=8, kernel=4)
    z = jax.random.normal(_key(4), (3, 16))
    via_conv = equal_conv_transpose2d(p, z.reshape(3, 1, 1, 16))
    via_matmul = latent_to_4x4(p, z)
    np.testing.assert_allclose(np.asarray(via_matmul), np.asarray(via_conv),
                               rtol=1e-4, atol=1e-5)


def test_equal_linear_matches_torch():
    p = equal_linear_init(_key(5), in_dim=9, out_dim=4)
    rng = np.random.RandomState(5)
    x = rng.randn(7, 9).astype(np.float32)
    w = np.asarray(p["w"]).T  # torch (out, in)
    scale = math.sqrt(2.0 / 9)
    want = F.linear(torch.from_numpy(x), torch.from_numpy(w * scale),
                    torch.from_numpy(np.asarray(p["b"]))).numpy()
    got = np.asarray(equal_linear(p, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_embedding_equalized_scale():
    p = embedding_init(_key(6), num_embeddings=10, dim=16)
    labels = jnp.asarray([0, 3, 9])
    plain = embedding(p, labels, equalized=False)
    eq = embedding(p, labels, equalized=True)
    np.testing.assert_allclose(np.asarray(eq),
                               np.asarray(plain) * math.sqrt(2.0 / 16),
                               rtol=1e-6)


def test_minibatch_stddev_golden():
    rng = np.random.RandomState(7)
    x = rng.randn(4, 4, 4, 3).astype(np.float32)
    out = np.asarray(minibatch_stddev(jnp.asarray(x)))
    assert out.shape == (4, 4, 4, 4)
    want_scalar = np.mean(np.sqrt(np.var(x, axis=0) + 1e-8))
    np.testing.assert_allclose(out[..., -1], np.full((4, 4, 4), want_scalar),
                               rtol=1e-5)
    np.testing.assert_allclose(out[..., :3], x, rtol=1e-6)


def test_minibatch_stddev_matches_torch_formula():
    rng = np.random.RandomState(8)
    x = rng.randn(6, 4, 4, 5).astype(np.float32)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    out_std = torch.sqrt(t.var(0, unbiased=False) + 1e-8)
    want = out_std.mean().item()
    got = np.asarray(minibatch_stddev(jnp.asarray(x)))[0, 0, 0, -1]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_conv_block_shapes_and_final_block():
    p = conv_block_init(_key(9), in_ch=8, out_ch=8)
    x = jax.random.normal(_key(10), (2, 8, 8, 8))
    assert conv_block(p, x).shape == (2, 8, 8, 8)
    # the discriminator's final block: 3x3 pad 1 then 4x4 valid -> 1x1
    pf = conv_block_init(_key(11), in_ch=9, out_ch=8, kernel1=3, kernel2=4)
    xf = jax.random.normal(_key(12), (2, 4, 4, 9))
    out = conv_block(pf, xf, padding1=1, padding2=0)
    assert out.shape == (2, 1, 1, 8)


def test_fused_upsample_conv_exact():
    """equal_conv2d_up2x == equal_conv2d(upsample2x(x), padding=1) exactly
    (one lhs_dilated conv with the composed 6x6 kernel + border correction;
    both linear, so the composition is exact up to f32 rounding) — values
    and gradients, odd and even sizes."""
    from pgx.core.layers import equal_conv2d_up2x
    from pgx.ops import upsample2x

    for i, (h, w) in enumerate([(7, 9), (8, 8), (16, 16)]):
        p = equal_conv2d_init(_key(20 + i), 5, 7, 3)
        x = jax.random.normal(_key(30 + i), (2, h, w, 5), jnp.float32)
        ref = equal_conv2d(p, upsample2x(x), padding=1)
        got = equal_conv2d_up2x(p, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)
        g_ref, gw_ref = jax.grad(
            lambda xx, pp: jnp.sum(jnp.tanh(
                equal_conv2d(pp, upsample2x(xx), padding=1))),
            argnums=(0, 1))(x, p)
        g_got, gw_got = jax.grad(
            lambda xx, pp: jnp.sum(jnp.tanh(equal_conv2d_up2x(pp, xx))),
            argnums=(0, 1))(x, p)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_got["w"]),
                                   np.asarray(gw_ref["w"]),
                                   atol=2e-4, rtol=1e-4)


def test_generator_fused_up_conv_dispatch_matches():
    """G output is identical whether the fused up-conv dispatch is on
    (forced at every stage) or off."""
    import dataclasses
    from pgx.models import zoo
    from pgx.models.generator import generator_apply, init_generator

    base = zoo.correct_generator(z_dim=16, channel=16)
    on = dataclasses.replace(base, fuse_up_conv_min_size=4)
    off = dataclasses.replace(base, fuse_up_conv_min_size=0)
    params = init_generator(_key(40), base)
    z = jax.random.normal(_key(41), (3, 16))
    for step, fading in [(3, False), (4, True)]:
        a = generator_apply(params, on, z, step=step, alpha=0.7,
                            fading=fading)
        b = generator_apply(params, off, z, step=step, alpha=0.7,
                            fading=fading)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-6, rtol=1e-5)
