"""KID (Kernel Inception Distance) tests: kernel parity against sklearn,
the unbiased MMD^2 estimator against a brute-force double loop, statistical
behavior (zero at equality, positive under shift), and the sweep's
kid_score.json protocol."""

import json
import os

import numpy as np

import jax

from pgx.eval import (
    kid_from_activations,
    make_extractor,
    mmd2_unbiased,
    polynomial_kernel,
    sweep_trial,
)
from pgx.eval.kid import calculate_kid_given_data


def test_polynomial_kernel_matches_sklearn():
    from sklearn.metrics.pairwise import polynomial_kernel as sk_poly
    rng = np.random.RandomState(0)
    x = rng.randn(13, 7)
    y = rng.randn(9, 7)
    np.testing.assert_allclose(
        polynomial_kernel(x, y),
        sk_poly(x, y, degree=3, gamma=1.0 / 7, coef0=1.0), rtol=1e-12)
    np.testing.assert_allclose(
        polynomial_kernel(x, y, degree=2, gamma=0.3, coef0=0.5),
        sk_poly(x, y, degree=2, gamma=0.3, coef0=0.5), rtol=1e-12)


def test_mmd2_unbiased_matches_bruteforce():
    rng = np.random.RandomState(1)
    x = rng.randn(6, 4)
    y = rng.randn(5, 4)
    k = lambda a, b: (a @ b / 4 + 1.0) ** 3
    m, n = len(x), len(y)
    sxx = sum(k(x[i], x[j]) for i in range(m) for j in range(m) if i != j)
    syy = sum(k(y[i], y[j]) for i in range(n) for j in range(n) if i != j)
    sxy = sum(k(x[i], y[j]) for i in range(m) for j in range(n))
    want = sxx / (m * (m - 1)) + syy / (n * (n - 1)) - 2 * sxy / (m * n)
    got = mmd2_unbiased(polynomial_kernel(x, x), polynomial_kernel(y, y),
                        polynomial_kernel(x, y))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_kid_zero_at_equality_positive_under_shift():
    rng = np.random.RandomState(2)
    real = rng.randn(400, 16)
    same = rng.randn(400, 16)
    shifted = rng.randn(400, 16) + 1.0
    mean_same, std_same = kid_from_activations(real, same, subset_size=100,
                                               num_subsets=40)
    mean_shift, std_shift = kid_from_activations(real, shifted,
                                                 subset_size=100,
                                                 num_subsets=40)
    # unbiased estimator: ~0 (within a few error bars) at equality,
    # decisively positive under a mean shift
    assert abs(mean_same) < 5 * (std_same / np.sqrt(40) + 1e-12)
    assert mean_shift > 10 * mean_same + 5 * std_shift / np.sqrt(40)
    assert mean_shift > 0.1

    # deterministic given the seed; subset clamps to the smaller set
    again = kid_from_activations(real, shifted, subset_size=100,
                                 num_subsets=40)
    assert again == (mean_shift, std_shift)
    small = kid_from_activations(real[:5], shifted, subset_size=100,
                                 num_subsets=3)
    assert np.isfinite(small[0])


def test_kid_given_data_end_to_end():
    extractor = make_extractor(key=jax.random.PRNGKey(3))
    rng = np.random.RandomState(4)
    real = rng.randint(0, 255, (24, 16, 16, 3)).astype(np.uint8)
    fake = rng.randint(0, 255, (24, 16, 16, 3)).astype(np.uint8)
    mean, std = calculate_kid_given_data(real, fake, extractor=extractor,
                                         batch_size=8, subset_size=12,
                                         num_subsets=5)
    assert np.isfinite(mean) and np.isfinite(std) and std >= 0
    # same data both sides: the unbiased estimate lands at ~0 (the subsets
    # overlap so the estimate is slightly negative-biased; bound loosely)
    mean0, _ = calculate_kid_given_data(real, real, extractor=extractor,
                                        batch_size=8, subset_size=12,
                                        num_subsets=5)
    assert abs(mean0) < abs(mean) + 1e-6


def test_sweep_kid_fills_missing_scores(tmp_path):
    """kid=True scores KID into kid_score.json — including for checkpoints
    whose FID already exists (no FID rescore), and idempotently."""
    from pgx.data import synthetic_dataset
    from pgx.models import zoo
    from pgx.train import LegacySchedule, TrainConfig
    from pgx.train.loop import LoopConfig, train_loop

    gcfg = zoo.mnist_generator(z_dim=8, channel=8)
    dcfg = zoo.mnist_discriminator(feat_dim=8)
    schedule = LegacySchedule(8, 2, 1)
    dataset = synthetic_dataset(n=32, size=16, channels=1, seed=0)
    loop_cfg = LoopConfig(trial_name="kidsweep", main_path=str(tmp_path),
                          batch_size=4, sample_every=100,
                          checkpoint_every=6, log_every=100, verbose=False,
                          total_iterations=12)
    trial = train_loop(gcfg, dcfg, TrainConfig(), schedule, dataset,
                       loop_cfg)

    extractor = make_extractor(key=jax.random.PRNGKey(5))
    real = dataset.at_resolution(16)[:24]
    # FID-only first (the pre-existing protocol)
    fid_scores = sweep_trial(trial, schedule, real, num_samples=16,
                             batch_size=8, extractor=extractor,
                             verbose=False)
    assert not os.path.exists(os.path.join(trial, "kid_score.json"))

    # kid=True fills KID for the already-FID-scored checkpoints
    scores = sweep_trial(trial, schedule, real, num_samples=16,
                         batch_size=8, extractor=extractor, verbose=False,
                         kid=True, kid_subset_size=12, kid_subsets=4)
    assert scores == fid_scores  # FID untouched
    with open(os.path.join(trial, "kid_score.json")) as f:
        kid_saved = json.load(f)
    assert set(kid_saved) == set(fid_scores)
    assert all(np.isfinite(v[0]) and v[1] >= 0 for v in kid_saved.values())

    # idempotent second pass
    sweep_trial(trial, schedule, real, num_samples=16, batch_size=8,
                extractor=extractor, verbose=False, kid=True,
                kid_subset_size=12, kid_subsets=4)
    with open(os.path.join(trial, "kid_score.json")) as f:
        assert json.load(f) == kid_saved


def test_kid_full_set_is_deterministic_single_pass():
    """When subset_size covers BOTH sets every 'subset' is a permutation
    of the full sets and MMD^2 is permutation-invariant: one computation
    (std 0), not num_subsets identical kernel passes."""
    from pgx.eval.kid import mmd2_unbiased, polynomial_kernel

    rng = np.random.RandomState(0)
    real, fake = rng.randn(50, 8), rng.randn(50, 8) + 0.5
    mean, std = kid_from_activations(real, fake, subset_size=1000,
                                     num_subsets=100)
    assert std == 0.0
    want = mmd2_unbiased(polynomial_kernel(real, real),
                         polynomial_kernel(fake, fake),
                         polynomial_kernel(real, fake))
    assert np.isclose(mean, want)
