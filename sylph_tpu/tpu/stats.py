"""Batched coverage statistics on device: histogram -> ANI/lambda per genome.

Vectorized (f32) re-expression of the host statistics chain
(sylph_tpu.stats.contain_stats, spec: sylph src/contain.rs:654-847 +
src/inference.rs:207-242): naive ANI, median, Poisson outlier cut,
ratio-lambda, lambda-adjusted ANI — computed for ALL genomes in one shot
from the [G, H] coverage histograms the containment kernel emits. The
reference runs this per genome on one core; here it is a few VPU passes.

Precision note: device stats are f32 (TPU f64 is emulated); the host engine
remains the f64 bit-parity oracle for TSV output. The Poisson cut compares
the *lower* regularized gamma P(v+1, median) > 1 - CUTOFF_PVALUE, which is
exactly equivalent to the reference's ``cdf < CUTOFF_PVALUE`` but numerically
representable in f32 (the CDF itself saturates at 1 - 1e-10).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (CUTOFF_PVALUE, MAX_MEDIAN_FOR_MEAN_FINAL_EST,
                         MEDIAN_ANI_THRESHOLD, SAMPLE_SIZE_CUTOFF)

_TAIL_P = np.float32(np.float64(1.0) - np.float64(CUTOFF_PVALUE))


class GenomeStats(NamedTuple):
    """Per-genome batched results; all arrays shaped [G]."""
    naive_ani: jnp.ndarray      # f32
    final_ani: jnp.ndarray      # f32 (lambda-adjusted where available)
    final_cov: jnp.ndarray      # f32 effective coverage
    lam: jnp.ndarray            # f32 ratio-lambda (garbage where ~lam_valid)
    lam_valid: jnp.ndarray      # bool
    median_cov: jnp.ndarray     # f32
    mean_cov: jnp.ndarray       # f32 (>=1 mean, the TSV's Mean_cov_geq1)
    contained: jnp.ndarray      # i32: pre-cut containment count
    n_inliers: jnp.ndarray      # i32: post-Poisson-cut count
    valid: jnp.ndarray          # bool: passes min_ani & size gates


@functools.partial(jax.jit,
                   static_argnames=("k", "min_ani", "min_count_correct",
                                    "min_number_kmers"))
def stats_from_histograms(hist: jnp.ndarray, n_kmers: jnp.ndarray, *,
                          k: int, min_ani: float,
                          min_count_correct: float = 3.0,
                          min_number_kmers: float = 50.0) -> GenomeStats:
    """hist: [G, H] int32 multiplicity histograms (bucket 0 = not contained);
    n_kmers: [G] int32 genome sketch sizes."""
    G, H = hist.shape
    f32 = jnp.float32
    hist = hist.astype(jnp.int32)
    n_kmers_f = n_kmers.astype(f32)
    mult = jnp.arange(H, dtype=f32)[None, :]          # bucket -> value

    contained = jnp.sum(hist[:, 1:], axis=1)
    contained_f = contained.astype(f32)
    safe_contained = jnp.maximum(contained, 1)
    inv_k = f32(1.0 / k)

    naive_ani = jnp.power(contained_f / jnp.maximum(n_kmers_f, 1.0), inv_k)

    # median = covs_sorted[contained // 2] via histogram cumsum
    cum = jnp.cumsum(hist[:, 1:], axis=1)
    target = (safe_contained // 2)[:, None]
    median = (jnp.argmax(cum > target, axis=1) + 1).astype(f32)

    # Poisson outlier cut (src/contain.rs:664-675): keep multiplicity v iff
    # P(X <= v) < CUTOFF under X~Poisson(median); monotone in v so the
    # reference's scan-and-break equals a per-bucket mask. Only applied when
    # median < 30.
    lower_p = jax.scipy.special.gammainc(mult + 1.0, median[:, None])
    pass_cut = lower_p > _TAIL_P
    inlier = jnp.where(median[:, None] < 30.0, pass_cut, True)
    hist_in = jnp.where(inlier, hist, 0).at[:, 0].set(hist[:, 0])

    n_inliers = jnp.sum(hist_in[:, 1:], axis=1)
    n_full = n_kmers - contained + n_inliers
    n_full_f = jnp.maximum(n_full.astype(f32), 1.0)
    inlier_sum = jnp.sum(hist_in[:, 1:].astype(f32) * mult[:, 1:], axis=1)
    geq1_mean = inlier_sum / jnp.maximum(contained_f, 1.0)

    # ratio-lambda on the inlier histogram (src/inference.rs:207-242):
    # modal nonzero multiplicity m (ties -> larger value),
    # lambda = hist[m+1]/hist[m] * (m+1).
    vals = hist_in[:, 1:]
    rev = vals[:, ::-1]
    m_val = (H - 1 - jnp.argmax(rev, axis=1)).astype(jnp.int32)   # in 1..H-1
    cnt_m = jnp.take_along_axis(hist_in, m_val[:, None], axis=1)[:, 0]
    mp1 = jnp.minimum(m_val + 1, H - 1)
    cnt_mp1 = jnp.take_along_axis(hist_in, mp1[:, None], axis=1)[:, 0]
    cnt_mp1 = jnp.where(m_val + 1 <= H - 1, cnt_mp1, 0)
    n_nonzero_vals = jnp.sum((vals > 0).astype(jnp.int32), axis=1)
    lam = (cnt_mp1.astype(f32) / jnp.maximum(cnt_m.astype(f32), 1.0)
           * (m_val.astype(f32) + 1.0))
    lam_ok = ((n_nonzero_vals > 1)
              & (n_inliers >= SAMPLE_SIZE_CUTOFF)
              & (cnt_mp1.astype(f32) >= f32(min_count_correct))
              & (cnt_m.astype(f32) >= f32(min_count_correct))
              & (median <= f32(MEDIAN_ANI_THRESHOLD)))

    # final coverage estimate (src/contain.rs:715-728)
    final_cov = jnp.where(
        lam_ok, lam,
        jnp.where(median < f32(MAX_MEDIAN_FOR_MEAN_FINAL_EST),
                  geq1_mean, median))

    # lambda-adjusted ANI (src/contain.rs:817-847)
    adj_index = (n_inliers.astype(f32)
                 / jnp.maximum(1.0 - jnp.exp(-lam), f32(1e-30))
                 / n_full_f)
    adj_ani = jnp.power(adj_index, inv_k)
    adj_ok = lam_ok & jnp.isfinite(adj_ani) & (adj_ani >= 0.0)
    final_ani = jnp.where(adj_ok, adj_ani, naive_ani)

    valid = ((contained > 0)
             & (n_kmers_f >= f32(min_number_kmers))
             & (final_ani >= f32(min_ani)))

    return GenomeStats(
        naive_ani=naive_ani, final_ani=final_ani, final_cov=final_cov,
        lam=lam, lam_valid=lam_ok, median_cov=median, mean_cov=geq1_mean,
        contained=contained, n_inliers=n_inliers, valid=valid)
