"""FID machinery tests: frechet-distance golden values, preprocessing-quirk
parity with the reference, Inception architecture sanity, and an end-to-end
sweep over a real trial directory."""

import json
import os

import numpy as np
import pytest

import jax

from pgx.eval import (
    calculate_frechet_distance,
    get_activations,
    inception_pool3,
    init_inception,
    make_extractor,
    preprocess,
    sweep_trial,
    to_uint8_quirk,
)


def test_frechet_distance_identical_is_zero():
    rng = np.random.RandomState(0)
    acts = rng.randn(200, 16)
    mu, sigma = acts.mean(0), np.cov(acts, rowvar=False)
    assert abs(calculate_frechet_distance(mu, sigma, mu, sigma)) < 1e-6


def test_frechet_distance_mean_shift_golden():
    # equal covariances: d^2 = ||mu1 - mu2||^2
    d = 8
    sigma = np.eye(d)
    mu1 = np.zeros(d)
    mu2 = np.full(d, 0.5)
    got = calculate_frechet_distance(mu1, sigma, mu2, sigma)
    np.testing.assert_allclose(got, 0.25 * d, atol=1e-8)


def test_frechet_distance_diagonal_golden():
    # diagonal covariances: Tr(C1 + C2 - 2 sqrt(C1 C2))
    s1 = np.diag([1.0, 4.0])
    s2 = np.diag([9.0, 16.0])
    want = (1 + 9 - 2 * 3) + (4 + 16 - 2 * 8)
    got = calculate_frechet_distance(np.zeros(2), s1, np.zeros(2), s2)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_uint8_quirk_matches_reference_formula():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 4, 3).astype(np.float32)
    got = to_uint8_quirk(x)
    want = ((np.tanh(x) + 1) * 127.5).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
    u8 = (rng.rand(4, 4, 3) * 255).astype(np.uint8)
    np.testing.assert_array_equal(to_uint8_quirk(u8), u8)


def test_preprocess_matches_torch_chain():
    """Full preprocessing parity with the reference chain: MyDataset squash
    -> torchvision Resize(299)/ToTensor/Normalize -> wrapper 2x-1."""
    import torch
    from PIL import Image

    rng = np.random.RandomState(2)
    x = rng.randn(2, 3, 16, 16).astype(np.float32)  # reference feeds NCHW

    want = []
    for item in x:
        t = ((np.tanh(item) + 1) * 127.5).astype(np.uint8)
        t = np.transpose(t, (1, 2, 0))
        im = Image.fromarray(t).convert("RGB").resize((299, 299),
                                                      Image.BILINEAR)
        arr = np.asarray(im, np.float32) / 255.0
        arr = (arr - np.array([0.485, 0.456, 0.406])) / np.array(
            [0.229, 0.224, 0.225])
        want.append(arr * 2 - 1)
    want = np.stack(want).astype(np.float32)

    got = preprocess(x)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_inception_output_shape_and_determinism():
    params = init_inception(jax.random.PRNGKey(0))
    x = np.random.RandomState(0).randn(2, 299, 299, 3).astype(np.float32)
    feats = np.asarray(inception_pool3(params, x))
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
    feats2 = np.asarray(inception_pool3(params, x))
    np.testing.assert_array_equal(feats, feats2)


def test_activations_batching_consistent():
    extractor = make_extractor(key=jax.random.PRNGKey(1))
    data = (np.random.RandomState(3).rand(7, 16, 16, 3) * 255).astype(
        np.uint8)
    a = get_activations(data, extractor, batch_size=3)
    b = get_activations(data, extractor, batch_size=7)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_sweep_trial_end_to_end(tmp_path):
    """Train a tiny run, then sweep its checkpoints with a random-weight
    extractor; fid_score.json is written incrementally and skips re-scores."""
    from pgx.data import synthetic_dataset
    from pgx.models import zoo
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    schedule = LegacySchedule(8, 2, 1)
    dataset = synthetic_dataset(n=32, size=16, channels=1, seed=0)
    loop_cfg = LoopConfig(trial_name="fidsweep", main_path=str(tmp_path),
                          batch_size=4, sample_every=100,
                          checkpoint_every=6, log_every=100, verbose=False,
                          total_iterations=12)
    trial = train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                       loop_cfg)

    extractor = make_extractor(key=jax.random.PRNGKey(2))
    real = dataset.at_resolution(16)[:32]
    scores = sweep_trial(trial, schedule, real, num_samples=16,
                         batch_size=8, extractor=extractor, verbose=False)
    assert scores
    with open(os.path.join(trial, "fid_score.json")) as f:
        saved = json.load(f)
    assert saved == scores
    assert all(np.isfinite(v) for v in saved.values())

    # idempotent: second sweep rescans but scores nothing new
    scores2 = sweep_trial(trial, schedule, real, num_samples=16,
                          batch_size=8, extractor=extractor, verbose=False)
    assert scores2 == scores
