"""Exact-parity tests: pgx resize ops vs torch F.interpolate (the reference's
resizer, progan_modules.py:167-168,:205,:299)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from pgx.ops import downsample2x, upsample2x


def _rand(shape, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(*shape).astype(np.float32)


@pytest.mark.parametrize("shape", [(2, 4, 4, 3), (1, 8, 8, 1), (3, 16, 8, 5),
                                   (4, 1, 1, 2), (2, 32, 32, 3)])
def test_upsample2x_matches_torch_bilinear(shape):
    x = _rand(shape, seed=shape[1])
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(upsample2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("shape", [(2, 4, 4, 3), (1, 8, 8, 1), (3, 16, 8, 5),
                                   (2, 32, 32, 3), (2, 256, 256, 3)])
def test_downsample2x_matches_torch_bilinear(shape):
    x = _rand(shape, seed=shape[2])
    want = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=0.5,
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    got = np.asarray(downsample2x(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_up_then_down_roundtrip_shape():
    x = jnp.asarray(_rand((2, 8, 8, 4)))
    assert upsample2x(x).shape == (2, 16, 16, 4)
    assert downsample2x(x).shape == (2, 4, 4, 4)
