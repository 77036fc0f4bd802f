"""Lambda estimators for zero-truncated-Poisson coverage correction.

Behavioral spec: sylph src/inference.rs. All estimators take the full
coverage vector (zeros for non-contained k-mers + inlier multiplicities);
histogram variants are provided because every estimator is a function of the
value multiset only — that is what the batched/bootstrap paths use.
"""

import math
from typing import Optional

import numpy as np

from ..constants import SAMPLE_SIZE_CUTOFF


def mean_u32(data: np.ndarray) -> Optional[float]:
    """src/inference.rs:116-124."""
    if data.size == 0:
        return None
    return float(data.sum(dtype=np.float64)) / data.size


def var_u32(data: np.ndarray) -> Optional[float]:
    """Population variance (src/inference.rs:104-114)."""
    if data.size == 0:
        return None
    m = mean_u32(data)
    d = data.astype(np.float64) - m
    return float((d * d).sum()) / data.size


def _hist(full_covs: np.ndarray) -> np.ndarray:
    if full_covs.size == 0:
        return np.zeros(1, dtype=np.int64)
    return np.bincount(full_covs.astype(np.int64))


def ratio_lambda_hist(hist: np.ndarray, n_total: int,
                      min_count_correct: float) -> Optional[float]:
    """ratio estimator on a value histogram (src/inference.rs:207-242).

    lambda = (count[m+1] / count[m]) * (m+1) at the modal nonzero
    multiplicity m (ties broken toward the larger value)."""
    nz_vals = np.flatnonzero(hist[1:]) + 1
    if nz_vals.size == 1:
        return None
    num_zero = int(hist[0]) if hist.size else 0
    if n_total - num_zero < SAMPLE_SIZE_CUTOFF:
        return None
    if nz_vals.size == 0:
        return None
    counts = hist[nz_vals]
    best = counts.max()
    most_ind = int(nz_vals[counts == best].max())  # tie -> larger value
    if most_ind + 1 >= hist.size or hist[most_ind + 1] == 0:
        return None
    count_p1 = float(hist[most_ind + 1])
    count = float(hist[most_ind])
    if count_p1 < min_count_correct or count < min_count_correct:
        return None
    return count_p1 / count * float(most_ind + 1)


def ratio_lambda(full_covs: np.ndarray,
                 min_count_correct: float) -> Optional[float]:
    return ratio_lambda_hist(_hist(full_covs), int(full_covs.size),
                             min_count_correct)


def mme_lambda(full_covs: np.ndarray) -> Optional[float]:
    """Method-of-moments estimator (src/inference.rs:126-155)."""
    h = _hist(full_covs)
    nz_vals = np.flatnonzero(h[1:])
    if nz_vals.size == 1:
        return None
    num_zero = int(h[0])
    if full_covs.size - num_zero < SAMPLE_SIZE_CUTOFF:
        return None
    m = mean_u32(full_covs)
    v = var_u32(full_covs)
    lam = v / m + m - 1.0
    return lam if lam >= 0.0 else None


def _newton_raphson(rat: float, mean: float) -> float:
    """1000-iteration fixed Newton solve (src/inference.rs:194-205)."""
    curr = mean / (1.0 - rat)
    for _ in range(1000):
        t1 = (1.0 - rat) * curr
        try:
            e = math.exp(-curr)
        except OverflowError:
            e = float("inf")
        t2 = mean * (1.0 - e)
        t3 = 1.0 - rat
        t4 = mean * e
        curr = curr - (t1 - t2) / (t3 - t4)
        if math.isnan(curr):
            return curr
    return curr


def mle_zip(full_covs: np.ndarray, _k: float) -> Optional[float]:
    """Zero-truncated-Poisson MLE (src/inference.rs:157-192). Note the
    reference computes the zero-ratio in f32 before widening."""
    h = _hist(full_covs)
    nz_vals = np.flatnonzero(h[1:])
    if nz_vals.size == 1:
        return None
    num_zero = int(h[0])
    n = int(full_covs.size)
    if n - num_zero < SAMPLE_SIZE_CUTOFF:
        return None
    m = mean_u32(full_covs)
    rat = float(np.float32(num_zero) / np.float32(n))
    lam = _newton_raphson(rat, m)
    if lam < 0.0 or math.isnan(lam):
        return None
    return lam


def _r_from_moments_lambda(m: float, v: float, lam: float) -> float:
    """src/inference.rs:6-10."""
    return lam / (v - 1.0 + lam + m)


def _ratio_formula(val: float, r: float, lam: float) -> float:
    """src/inference.rs:12-19."""
    if r < 100.0:
        return (math.gamma(r + val + 1.0) / (val + 1.0)
                / math.gamma(r + val) * lam / (r + lam))
    return (r + val + 1.0) / (val + 1.0) * lam / (r + lam)


def binary_search_lambda(full_covs: np.ndarray) -> Optional[float]:
    """Negative-binomial grid search, hidden --nb flag
    (src/inference.rs:29-102)."""
    if full_covs.size == 0:
        return None
    m = mean_u32(full_covs)
    v = var_u32(full_covs)
    h = _hist(full_covs)
    ones = float(h[1]) if h.size > 1 else 0.0
    twos = float(h[2]) if h.size > 2 else 0.0
    ratio_est = twos / ones if ones else (float("inf") if twos else
                                          float("nan"))
    left = max(0.003, m - 2.0)
    right = m + 5.0
    best = None
    best_val = 10000.0
    for i in range(10000):
        test = (right - left) / 10000.0 * i + left
        r = _r_from_moments_lambda(m, v, test)
        if r < 0.0:
            continue
        try:
            proposed = _ratio_formula(1.0, r, test)
        except (OverflowError, ValueError):
            continue
        p = abs(proposed - ratio_est)
        if p < best_val:
            best_val = p
            best = test
    return best
