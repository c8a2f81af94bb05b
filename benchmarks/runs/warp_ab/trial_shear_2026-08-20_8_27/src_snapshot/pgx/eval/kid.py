"""Kernel Inception Distance (KID; Binkowski et al. 2018, "Demystifying
MMD GANs").

The reference's quality gate is FID-only (fid/musem_fid.py) — KID is the
complementary production metric this framework adds: the squared MMD
between real and generated pool3 feature sets under the cubic polynomial
kernel, computed with the UNBIASED estimator over random subsets.  Unlike
FID (whose finite-sample bias is large exactly in the low-sample regime a
training-time gate runs in), KID's estimator is unbiased and comes with a
per-subset standard deviation as an error bar.

Feature space and preprocessing are shared with ``pgx.eval.fid`` (the
oracle-locked InceptionV3 pool3 chain incl. the reference's tanh-uint8
quirk), so FID and KID scores for a run ride the same extractor and are
directly comparable across checkpoints.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def polynomial_kernel(x: np.ndarray, y: np.ndarray, degree: int = 3,
                      gamma: Optional[float] = None,
                      coef0: float = 1.0) -> np.ndarray:
    """k(a, b) = (gamma <a, b> + coef0) ** degree, gamma default 1/dim —
    the KID paper's kernel (and sklearn's parameterization, which the tests
    use as the oracle)."""
    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return (gamma * (x @ y.T) + coef0) ** degree


def mmd2_unbiased(k_xx: np.ndarray, k_yy: np.ndarray,
                  k_xy: np.ndarray) -> float:
    """Unbiased squared MMD from precomputed kernel matrices (diagonal
    terms excluded from the within-set sums)."""
    m = k_xx.shape[0]
    n = k_yy.shape[0]
    assert m > 1 and n > 1, "unbiased MMD^2 needs >= 2 samples per set"
    sum_xx = (k_xx.sum() - np.trace(k_xx)) / (m * (m - 1))
    sum_yy = (k_yy.sum() - np.trace(k_yy)) / (n * (n - 1))
    sum_xy = k_xy.mean()
    return float(sum_xx + sum_yy - 2.0 * sum_xy)


def kid_from_activations(real_acts: np.ndarray, fake_acts: np.ndarray,
                         subset_size: int = 1000, num_subsets: int = 100,
                         degree: int = 3, gamma: Optional[float] = None,
                         coef0: float = 1.0,
                         seed: int = 0) -> Tuple[float, float]:
    """(mean, std) of the unbiased polynomial-MMD^2 over ``num_subsets``
    random same-size subsets of the two activation sets (the KID paper's
    protocol; subset_size clamps to the smaller set)."""
    real_acts = np.asarray(real_acts, np.float64)
    fake_acts = np.asarray(fake_acts, np.float64)
    m = min(subset_size, len(real_acts), len(fake_acts))
    assert m > 1, "KID needs >= 2 samples per set"
    rng = np.random.RandomState(seed)
    if m == len(real_acts) and m == len(fake_acts):
        # every "subset" is a permutation of the full sets and MMD^2 is
        # permutation-invariant: one deterministic value (std 0), not
        # num_subsets identical kernel computations
        num_subsets = 1
    vals = np.empty(num_subsets, np.float64)
    for i in range(num_subsets):
        x = real_acts[rng.choice(len(real_acts), m, replace=False)]
        y = fake_acts[rng.choice(len(fake_acts), m, replace=False)]
        k_xx = polynomial_kernel(x, x, degree, gamma, coef0)
        k_yy = polynomial_kernel(y, y, degree, gamma, coef0)
        k_xy = polynomial_kernel(x, y, degree, gamma, coef0)
        vals[i] = mmd2_unbiased(k_xx, k_yy, k_xy)
    return float(vals.mean()), float(vals.std())


def calculate_kid_given_data(real: np.ndarray, fake: np.ndarray,
                             extractor: Optional[Callable] = None,
                             batch_size: int = 50, subset_size: int = 1000,
                             num_subsets: int = 100,
                             seed: int = 0) -> Tuple[float, float]:
    """End-to-end KID between two image sets (the KID analogue of
    ``pgx.eval.fid.calculate_fid_given_data``): same extractor, same
    preprocessing chain."""
    from pgx.eval.fid import get_activations, make_extractor
    if extractor is None:
        extractor = make_extractor()
    real_acts = get_activations(real, extractor, batch_size)
    fake_acts = get_activations(fake, extractor, batch_size)
    return kid_from_activations(real_acts, fake_acts,
                                subset_size=subset_size,
                                num_subsets=num_subsets, seed=seed)
