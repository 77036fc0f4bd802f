"""Coverage statistics → adjusted ANI, for one (genome, sample) pair.

Behavioral spec: the second half of sylph ``get_stats``
(src/contain.rs:654-813), ``ani_from_lambda`` (:817-847) and
``bootstrap_interval`` (:849-898). The input is the sorted multiplicity
vector of contained k-mers; everything downstream is a function of its value
multiset, so the bootstrap is evaluated on histograms with the wyrand index
stream generated in one vectorized pass.
"""

import math
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from ..constants import (CUTOFF_PVALUE, MAX_MEDIAN_FOR_MEAN_FINAL_EST,
                         MEDIAN_ANI_THRESHOLD, SAMPLE_SIZE_CUTOFF)
from ..core.types import AdjustKind, AdjustStatus
from .gammainc import poisson_cdf
from .inference import (binary_search_lambda, mean_u32, mle_zip, mme_lambda,
                        ratio_lambda, ratio_lambda_hist)
from .wyrand import wyrand_indices

_BOOTSTRAP_ITERS = 100
_BOOTSTRAP_SEED = 7


@dataclass
class StatParams:
    k: int
    min_count_correct: float = 3.0
    estimator: str = "ratio"      # ratio | mme | nb | mle (hidden flags)
    no_ci: bool = False
    no_adj: bool = False
    mean_coverage: bool = False


@dataclass
class CoverageStats:
    naive_ani: float
    final_est_ani: float
    final_est_cov: float
    mean_cov: float          # >=1 mean (what the TSV prints as Mean_cov_geq1)
    median_cov: float
    lam: AdjustStatus
    ani_ci: Tuple[Optional[float], Optional[float]]
    lambda_ci: Tuple[Optional[float], Optional[float]]


def _estimate_lambda(full_covs: np.ndarray, p: StatParams) -> Optional[float]:
    """Estimator dispatch (src/contain.rs:696-707; default = ratio)."""
    if p.estimator == "mme":
        return mme_lambda(full_covs)
    if p.estimator == "nb":
        return binary_search_lambda(full_covs)
    if p.estimator == "mle":
        return mle_zip(full_covs, float(p.k))
    return ratio_lambda(full_covs, p.min_count_correct)


def ani_from_lambda(lam: Optional[float], k: float,
                    full_cov_len: int, nonzero: int) -> Optional[float]:
    """src/contain.rs:817-847 (full_cov passed as (len, #nonzero))."""
    if lam is None:
        return None
    denom = (1.0 - math.exp(-lam))
    # IEEE semantics like the Rust source: x/0 = inf (or nan for 0/0)
    with np.errstate(divide="ignore", invalid="ignore"):
        adj_index = float(np.float64(nonzero) / np.float64(denom)
                          / np.float64(full_cov_len))
        ani = float(np.power(np.float64(adj_index), np.float64(1.0 / k)))
    if ani < 0.0 or math.isnan(ani):
        return None
    return ani


def coverage_stats(covs_sorted: np.ndarray, gn_kmers: int,
                   p: StatParams, min_ani: float,
                   run_ci_if_pass: bool = True) -> Optional[CoverageStats]:
    """Full statistics chain for one pair; None iff the adjusted ANI falls
    below ``min_ani`` (src/contain.rs:746-764) — callers must treat empty
    ``covs`` separately (they return None before calling)."""
    contain_count = int(covs_sorted.size)
    if contain_count == 0:
        return None
    k = float(p.k)
    naive_ani = math.pow(contain_count / gn_kmers, 1.0 / k)
    median_cov = float(covs_sorted[contain_count // 2])

    # Poisson outlier cut (src/contain.rs:664-675): scan values from the
    # median element up; max_cov = last value passing the CDF cutoff before
    # the first failure.
    max_cov = math.inf
    if median_cov < 30.0:
        upper_vals = np.unique(covs_sorted[contain_count // 2:])
        for v in upper_vals.tolist():
            if poisson_cdf(float(v), median_cov) < CUTOFF_PVALUE:
                max_cov = float(v)
            else:
                break

    inliers = covs_sorted[covs_sorted.astype(np.float64) <= max_cov]
    n_inliers = int(inliers.size)
    n_full = gn_kmers - contain_count + n_inliers
    inlier_sum = float(inliers.sum(dtype=np.float64))
    mean_cov = inlier_sum / n_full
    geq1_mean_cov = inlier_sum / contain_count

    # lambda path only when median <= 2 (src/contain.rs:692-713)
    if median_cov > MEDIAN_ANI_THRESHOLD:
        lam_status = AdjustStatus.high()
    else:
        full_covs = np.zeros(n_full, dtype=np.uint32)
        full_covs[n_full - n_inliers:] = inliers
        test_lambda = _estimate_lambda(full_covs, p)
        lam_status = (AdjustStatus.low() if test_lambda is None
                      else AdjustStatus.lam(test_lambda))

    if lam_status.kind == AdjustKind.LAMBDA:
        final_est_cov = lam_status.value
    elif median_cov < MAX_MEDIAN_FOR_MEAN_FINAL_EST:
        final_est_cov = geq1_mean_cov
    else:
        final_est_cov = geq1_mean_cov if p.mean_coverage else median_cov

    opt_lambda = (final_est_cov if lam_status.kind == AdjustKind.LAMBDA
                  else None)
    opt_est_ani = ani_from_lambda(opt_lambda, k, n_full, n_inliers)
    if opt_lambda is None or opt_est_ani is None or p.no_adj:
        final_est_ani = naive_ani
    else:
        final_est_ani = opt_est_ani

    if final_est_ani < min_ani:
        return None

    ani_ci = (None, None)
    lambda_ci = (None, None)
    if run_ci_if_pass and not p.no_ci and opt_lambda is not None:
        full_covs = np.zeros(n_full, dtype=np.uint32)
        full_covs[n_full - n_inliers:] = inliers
        ani_ci, lambda_ci = bootstrap_interval(full_covs, k, p)

    return CoverageStats(
        naive_ani=naive_ani,
        final_est_ani=final_est_ani,
        final_est_cov=final_est_cov,
        mean_cov=geq1_mean_cov,
        median_cov=median_cov,
        lam=lam_status,
        ani_ci=ani_ci,
        lambda_ci=lambda_ci,
    )


def _bootstrap_general(full_covs: np.ndarray, k: float, p: StatParams):
    """Scalar bootstrap for the hidden non-ratio estimators."""
    from .wyrand import WyRand
    rng = WyRand(_BOOTSTRAP_SEED)
    n = int(full_covs.size)
    res_ani, res_lambda = [], []
    for _ in range(_BOOTSTRAP_ITERS):
        idx = np.fromiter((rng.usize(n) for _ in range(n)), dtype=np.int64,
                          count=n)
        rand_vec = full_covs[idx]
        lam = _estimate_lambda(rand_vec, p)
        nonzero = int(np.count_nonzero(rand_vec))
        ani = ani_from_lambda(lam, k, n, nonzero)
        if ani is not None and lam is not None:
            if not math.isnan(ani) and not math.isnan(lam):
                res_ani.append(ani)
                res_lambda.append(lam)
    return _percentiles(res_ani, res_lambda)


def _percentiles(res_ani, res_lambda):
    """5th/95th percentile pick (src/contain.rs:886-897)."""
    res_ani = sorted(res_ani)
    res_lambda = sorted(res_lambda)
    suc = len(res_ani)
    if suc < 50:
        return (None, None), (None, None)
    low_i = suc * 5 // 100 - 1
    high_i = suc * 95 // 100 - 1
    return ((res_ani[low_i], res_ani[high_i]),
            (res_lambda[low_i], res_lambda[high_i]))


def bootstrap_interval(full_covs: np.ndarray, k: float, p: StatParams):
    """100-resample bootstrap with fastrand(7) (src/contain.rs:849-898),
    vectorized: one wyrand index stream, per-iteration value histograms,
    histogram-form ratio estimator."""
    if p.estimator != "ratio":
        return _bootstrap_general(full_covs, k, p)
    n = int(full_covs.size)
    if n == 0:
        return (None, None), (None, None)
    idx = wyrand_indices(_BOOTSTRAP_SEED, _BOOTSTRAP_ITERS * n, n)
    vals = full_covs[idx.astype(np.int64)].astype(np.int64)
    vmax = int(full_covs.max())
    width = vmax + 2
    iter_ids = np.repeat(np.arange(_BOOTSTRAP_ITERS, dtype=np.int64), n)
    flat = np.bincount(iter_ids * width + vals,
                       minlength=_BOOTSTRAP_ITERS * width)
    hists = flat.reshape(_BOOTSTRAP_ITERS, width)

    # vectorized across the 100 iterations, bit-identical to the scalar
    # walk: every f64 op is elementwise (numpy array div/pow match the
    # scalar np ops exactly); only exp stays a scalar loop — numpy's
    # SIMD exp differs from libm in the last ulp and the scalar chain
    # (math.exp, matching Rust f64::exp) is the parity target
    lam_v, nz_v = _ratio_lambda_hist_batch(hists, n, p.min_count_correct)
    denom = np.fromiter((1.0 - math.exp(-v) if not math.isnan(v) else
                         np.nan for v in lam_v),
                        dtype=np.float64, count=lam_v.size)
    with np.errstate(divide="ignore", invalid="ignore"):
        adj = nz_v.astype(np.float64) / denom / np.float64(n)
        ani_v = np.power(adj, np.float64(1.0 / k))
    ok = (~np.isnan(lam_v)) & (~np.isnan(ani_v)) & (ani_v >= 0.0)
    return _percentiles([float(v) for v in ani_v[ok]],
                        [float(v) for v in lam_v[ok]])


def _ratio_lambda_hist_batch(hists: np.ndarray, n_total: int,
                             min_count_correct: float):
    """ratio_lambda_hist over [I, W] histogram rows -> ([I] lambda with
    NaN where the scalar form returns None, [I] nonzero counts).
    Decision-for-decision identical to the scalar walk."""
    I, W = hists.shape
    pos = hists[:, 1:] > 0
    nzc = pos.sum(axis=1)
    num_zero = hists[:, 0]
    # modal nonzero multiplicity, ties -> larger value: last argmax
    H1 = hists[:, 1:]
    best = H1.max(axis=1, initial=0)
    rev_arg = np.argmax(H1[:, ::-1] == best[:, None], axis=1)
    most_ind = (W - 1) - rev_arg             # value index into hists
    rows = np.arange(I)
    count = hists[rows, np.minimum(most_ind, W - 1)].astype(np.float64)
    p1 = most_ind + 1
    has_p1 = p1 < W
    count_p1 = np.where(
        has_p1, hists[rows, np.minimum(p1, W - 1)], 0).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        lam = count_p1 / count * (most_ind.astype(np.float64) + 1.0)
    invalid = ((nzc <= 1)
               | (n_total - num_zero < SAMPLE_SIZE_CUTOFF)
               | ~has_p1 | (count_p1 == 0)
               | (count_p1 < min_count_correct)
               | (count < min_count_correct))
    lam = np.where(invalid, np.nan, lam)
    return lam, n_total - num_zero
