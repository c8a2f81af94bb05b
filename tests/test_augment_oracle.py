"""ADA pipeline parity vs the reference AugmentPipe in its deterministic
debug mode (augment.py:186-187 — every random draw replaced by a fixed
percentile), transform group by transform group."""

import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/ada")  # ada.torch_utils.misc imports top-level dnnlib

try:
    from ada.augment import AugmentPipe
except ImportError:  # pragma: no cover
    AugmentPipe = None

from pgx.augment import AdaConfig, AugmentConfig, ada_update, augment_pipe, \
    bgc_config, init_ada_state

pytestmark = pytest.mark.skipif(AugmentPipe is None,
                                reason="reference ada not importable")


def _rand_images(b=4, res=16, c=3, seed=0):
    rng = np.random.RandomState(seed)
    return np.tanh(rng.randn(b, res, res, c)).astype(np.float32)


def _compare(kwargs, percentile, res=16, c=3, atol=1e-4, p=1.0):
    x = _rand_images(res=res, c=c, seed=int(percentile * 100))
    ref_pipe = AugmentPipe(**kwargs)
    ref_pipe.p.copy_(torch.as_tensor(float(p)))
    with torch.no_grad():
        want = ref_pipe(torch.from_numpy(x).permute(0, 3, 1, 2),
                        debug_percentile=percentile)
    want = want.permute(0, 2, 3, 1).numpy()

    # bit-parity vs torch requires the grid_sample formulation; the shear
    # fast path has its own equivalence suite in tests/test_warp.py
    cfg = AugmentConfig(**{k: (tuple(v) if isinstance(v, list) else v)
                           for k, v in kwargs.items()},
                        warp_impl="gather")
    got = np.asarray(augment_pipe(jax.random.PRNGKey(0), jnp.asarray(x),
                                  cfg, p, debug_percentile=percentile))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol,
                               err_msg=f"kwargs={kwargs} pct={percentile}")


GROUPS = [
    {"xflip": 1},
    {"rotate90": 1},
    {"xint": 1},
    {"scale": 1},
    {"rotate": 1},
    {"aniso": 1},
    {"xfrac": 1},
    {"brightness": 1},
    {"contrast": 1},
    {"lumaflip": 1},
    {"hue": 1},
    {"saturation": 1},
    {"imgfilter": 1},
    {"cutout": 1},
]


@pytest.mark.parametrize("kwargs", GROUPS,
                         ids=[list(g)[0] for g in GROUPS])
@pytest.mark.parametrize("percentile", [0.1, 0.5, 0.9])
def test_single_transform_parity(kwargs, percentile):
    # imgfilter reflect-pads by 21px, so the reference needs >= 64px inputs
    _compare(kwargs, percentile,
             res=64 if "imgfilter" in kwargs else 16)


@pytest.mark.parametrize("percentile", [0.25, 0.75])
def test_full_bgc_policy_parity(percentile):
    kwargs = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                  xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                  saturation=1)
    _compare(kwargs, percentile, atol=5e-4)


def test_all_transforms_parity():
    kwargs = dict(xflip=1, rotate90=1, xint=1, scale=1, rotate=1, aniso=1,
                  xfrac=1, brightness=1, contrast=1, lumaflip=1, hue=1,
                  saturation=1, imgfilter=1, cutout=1)
    _compare(kwargs, 0.4, atol=5e-4, res=64)


def test_noise_statistics():
    """Even in the reference's debug mode the noise VALUES stay random
    (augment.py:413 draws fresh randn) — only sigma is pinned.  So compare
    the realized noise statistics, not pixels."""
    from jax.scipy.special import erfinv as jerfinv

    x = _rand_images(b=8, res=32)
    dp = 0.9
    got = np.asarray(augment_pipe(jax.random.PRNGKey(3), jnp.asarray(x),
                                  AugmentConfig(noise=1), 1.0,
                                  debug_percentile=dp))
    delta = got - x
    sigma = float(jerfinv(dp)) * 0.1
    assert abs(delta.mean()) < 0.01
    np.testing.assert_allclose(delta.std(), sigma, rtol=0.1)


def test_grayscale_parity():
    kwargs = dict(xflip=1, scale=1, brightness=1, contrast=1, lumaflip=1,
                  cutout=1)
    _compare(kwargs, 0.3, c=1)


def test_p_zero_geometry_is_near_identity():
    """p=0: every gate selects identity; the geometric path still runs its
    pad/filter/warp round trip, which is numerically near-lossless."""
    x = _rand_images()
    cfg = bgc_config()
    got = np.asarray(augment_pipe(jax.random.PRNGKey(1), jnp.asarray(x), cfg,
                                  p=0.0))
    np.testing.assert_allclose(got, x, atol=5e-3)


def test_stochastic_mode_runs_and_differs():
    x = _rand_images()
    cfg = bgc_config()
    a = np.asarray(augment_pipe(jax.random.PRNGKey(1), jnp.asarray(x), cfg,
                                p=0.9))
    b = np.asarray(augment_pipe(jax.random.PRNGKey(2), jnp.asarray(x), cfg,
                                p=0.9))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-3  # different keys -> different augs


def test_augment_is_differentiable():
    x = jnp.asarray(_rand_images(b=2, res=8))
    cfg = bgc_config()

    def loss(img):
        return jnp.sum(augment_pipe(jax.random.PRNGKey(0), img, cfg,
                                    p=0.7) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_adaptive_controller_matches_reference():
    sys.path.insert(0, "/root/reference")
    from ada.adapt_augm import AdaptiveAugment

    ref = AdaptiveAugment(prev_ada_p=0.0, ada_target=0.6, ada_length=1000,
                          batch_size=4)
    ref.initialize()
    state = init_ada_state(0.0)
    cfg = AdaConfig(ada_target=0.6, ada_length=1000)

    rng = np.random.RandomState(0)
    for i in range(32):
        logits = rng.randn(4).astype(np.float32) + 0.5
        want_p = ref.update(torch.from_numpy(logits))
        state = ada_update(state, jnp.asarray(logits), cfg, batch_size=4)
        np.testing.assert_allclose(float(state["p"]), want_p, atol=1e-6,
                                   err_msg=f"iter {i}")
