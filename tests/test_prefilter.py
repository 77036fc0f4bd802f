"""Batched pass-1 prefilter vs the exact scalar statistics path.

The prefilter (engine/prefilter.py) must keep a superset of the genomes the
scalar coverage_stats chain keeps — randomized histogram-level checks plus
an end-to-end identical-output check on a 100-genome synthetic database
with low-coverage (lambda-rescued) targets.
"""

import gzip
import io

import numpy as np
import pytest

from sylph_tpu.engine.prefilter import _H, candidate_mask, genome_hists
from sylph_tpu.stats.contain_stats import StatParams, coverage_stats

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _scalar_survives(covs, n_kmers, min_ani, no_adj=False):
    if covs.size == 0 or n_kmers < 50.0:
        return False
    st = coverage_stats(np.sort(covs.astype(np.uint32)), n_kmers,
                        StatParams(k=31, no_adj=no_adj, no_ci=True),
                        min_ani, run_ci_if_pass=False)
    return st is not None


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_candidate_mask_superset_random(seed):
    rng = np.random.default_rng(seed)
    G = 300
    n_kmers = rng.integers(30, 4000, size=G)
    covs_list = []
    for g in range(G):
        kind = rng.integers(0, 4)
        nk = int(n_kmers[g])
        if kind == 0:        # empty
            covs = np.empty(0, np.int64)
        elif kind == 1:      # low-coverage Poisson (lambda path)
            lam = rng.uniform(0.05, 2.0)
            full = rng.poisson(lam, size=nk)
            covs = full[full > 0]
        elif kind == 2:      # high coverage
            contained = rng.integers(1, nk + 1)
            covs = rng.poisson(rng.uniform(3, 40), size=contained) + 1
        else:                # sparse with outliers
            contained = rng.integers(1, max(2, nk // 4))
            covs = rng.integers(1, 3, size=contained)
            if contained > 3:
                covs[:2] = rng.integers(20, 200, size=2)
        covs_list.append(covs.astype(np.int64))

    hist = np.zeros((G, _H), np.int64)
    for g, covs in enumerate(covs_list):
        if covs.size:
            hist[g] += np.bincount(np.minimum(covs, _H - 1),
                                   minlength=_H)

    for min_ani in (0.5, 0.87, 0.95):
        keep = candidate_mask(hist, n_kmers, k=31, min_ani=min_ani,
                              min_number_kmers=50.0, min_count_correct=3.0,
                              no_adj=False)
        for g in range(G):
            truth = _scalar_survives(covs_list[g], int(n_kmers[g]), min_ani)
            assert not (truth and not keep[g]), (
                f"prefilter dropped a survivor: g={g} min_ani={min_ani} "
                f"covs={covs_list[g][:20]} n={n_kmers[g]}")


def test_candidate_mask_lambda_rescue():
    # 0.3x coverage: naive ANI far below the floor, adjusted ANI ~1.0
    rng = np.random.default_rng(7)
    nk = 3000
    lam = 0.3
    full = rng.poisson(lam, size=nk)
    covs = full[full > 0].astype(np.int64)
    hist = np.zeros((64, _H), np.int64)
    hist[5] = np.bincount(np.minimum(covs, _H - 1), minlength=_H)
    n_kmers = np.full(64, nk, np.int64)
    naive = (covs.size / nk) ** (1 / 31)
    assert naive < 0.97          # naive alone would fail a 0.97 floor
    assert _scalar_survives(covs, nk, 0.97)
    keep = candidate_mask(hist, n_kmers, k=31, min_ani=0.97,
                          min_number_kmers=50.0, min_count_correct=3.0,
                          no_adj=False)
    assert keep[5]
    # no_adj disables the rescue
    keep2 = candidate_mask(hist, n_kmers, k=31, min_ani=0.97,
                           min_number_kmers=50.0, min_count_correct=3.0,
                           no_adj=True)
    assert not keep2[5]


def _closest_naive_cases(floor, k=31, per_side=4):
    """(contained, n_kmers) with naive ANI = (contained/n)^(1/k) landing
    as close as integer arithmetic allows on BOTH sides of the floor
    (~1e-12 at n <= 4e5)."""
    n = np.arange(2_000, 400_000, dtype=np.int64)
    c = np.round(n.astype(np.float64) * floor ** k).astype(np.int64)
    ok = c >= 1
    n, c = n[ok], c[ok]
    d = np.power(c / n, 1.0 / k) - floor
    above = np.flatnonzero(d >= 0)
    below = np.flatnonzero(d < 0)
    pick = np.concatenate([above[np.argsort(d[above])[:per_side]],
                           below[np.argsort(-d[below])[:per_side]]])
    return [(int(c[i]), int(n[i]), float(d[i])) for i in pick]


def _closest_adjusted_cases(floor, k=31, per_side=4):
    """(c1, c2, n_kmers) rows — c1 k-mers at multiplicity 1, c2 at 2 —
    whose ADJUSTED ANI ((c1+c2)/(1-e^-lam)/n)^(1/k), lam = 2*c2/c1,
    lands within ~1e-10 of the floor on both sides. All rows satisfy the
    ratio-lambda gates: modal multiplicity 1 (c1 > c2), counts >= 3,
    contained >= 25, median 1 <= 2."""
    target = floor ** k
    c1 = np.arange(100, 4000, 7, dtype=np.int64)
    rows = []
    for frac in (0.08, 0.15, 0.25, 0.4):
        c2 = np.maximum((c1 * frac).astype(np.int64), 3)
        m = c2 < c1
        a, b = c1[m], c2[m]
        lam = 2.0 * b / a
        nstar = (a + b) / ((1.0 - np.exp(-lam)) * target)
        for nn in (np.floor(nstar), np.ceil(nstar)):
            nn = nn.astype(np.int64)
            adj = np.power((a + b) / ((1.0 - np.exp(-lam)) * nn), 1.0 / k)
            rows.append(np.stack([a, b, nn, adj - floor]))
    r = np.concatenate(rows, axis=1)
    d = r[3]
    above = np.flatnonzero(d >= 0)
    below = np.flatnonzero(d < 0)
    pick = np.concatenate([above[np.argsort(d[above])[:per_side]],
                           below[np.argsort(-d[below])[:per_side]]])
    return [(int(r[0, i]), int(r[1, i]), int(r[2, i]), float(d[i]))
            for i in pick]


@pytest.mark.parametrize("floor", [0.90, 0.95])
def test_candidate_mask_adversarial_ani_floor(floor):
    """Constructed cases land within ulps of the query/profile ANI floors
    on BOTH sides (the _ANI_MARGIN guard's adversarial regime): the mask
    must keep every scalar survivor regardless of which side the
    vectorized transcendentals round to."""
    covs_list, hist_rows, nk_list, dists = [], [], [], []
    # naive-decision cases: every contained k-mer at multiplicity 3
    # (median 3 > 2 disables the lambda path; the scalar decision is
    # exactly naive_ani >= floor)
    for c, n, d in _closest_naive_cases(floor):
        covs_list.append(np.full(c, 3, np.int64))
        row = np.zeros(_H, np.int64)
        row[3] = c
        hist_rows.append(row)
        nk_list.append(n)
        dists.append(abs(d))
    # adjusted-decision cases: the ratio-lambda rescue computes the
    # final ANI, landing within ~1e-10 of the floor
    for c1, c2, n, d in _closest_adjusted_cases(floor):
        covs_list.append(np.concatenate([np.ones(c1, np.int64),
                                         np.full(c2, 2, np.int64)]))
        row = np.zeros(_H, np.int64)
        row[1], row[2] = c1, c2
        hist_rows.append(row)
        nk_list.append(n)
        dists.append(abs(d))
    assert min(dists) < 1e-11 and max(dists) < 5e-9   # truly adversarial

    hist = np.stack(hist_rows)
    n_kmers = np.asarray(nk_list, np.int64)
    keep = candidate_mask(hist, n_kmers, k=31, min_ani=floor,
                          min_number_kmers=50.0, min_count_correct=3.0,
                          no_adj=False)
    truths = [_scalar_survives(covs_list[g], int(n_kmers[g]), floor)
              for g in range(len(covs_list))]
    assert any(truths) and not all(truths)     # both sides represented
    for g, truth in enumerate(truths):
        assert not (truth and not keep[g]), (
            f"prefilter dropped a near-floor survivor: row {g}, "
            f"floor={floor}, |ani-floor|={dists[g]:.2e}, "
            f"hist={np.flatnonzero(hist[g])}, n={n_kmers[g]}")


def test_genome_hists_chunked():
    rng = np.random.default_rng(3)
    counts = rng.integers(0, 100, size=1000)
    gids = rng.integers(0, 10, size=1000)
    whole = genome_hists(iter([(counts, gids)]), 10)
    split = genome_hists(iter([(counts[:400], gids[:400]),
                               (counts[400:], gids[400:])]), 10)
    assert (whole == split).all()
    g0 = counts[(gids == 0) & (counts > 0)]
    assert whole[0].sum() == g0.size
    assert whole[0, 5] == int((g0 == 5).sum())
    assert whole[0, _H - 1] == int((g0 >= _H - 1).sum())


@pytest.fixture(scope="module")
def bigworld(tmp_path_factory):
    """100 genomes; targets at full AND low (lambda-path) coverage."""
    rng = np.random.default_rng(11)
    d = tmp_path_factory.mktemp("prefilter")
    n_genomes, glen = 100, 20_000
    genomes, paths = [], []
    for g in range(n_genomes):
        seq = rng.integers(0, 4, size=glen).astype(np.uint8)
        genomes.append(seq)
        p = d / f"g{g:03d}.fa.gz"
        with gzip.open(p, "wb") as f:
            f.write(b">genome%03d\n" % g + BASES[seq].tobytes() + b"\n")
        paths.append(str(p))

    reads = []
    # full-coverage targets
    for t, cov in [(3, 2.0), (17, 1.5), (55, 8.0), (70, 0.4), (88, 0.3)]:
        src = genomes[t]
        n_reads = int(glen * cov / 150)
        for s in rng.integers(0, glen - 150, size=n_reads):
            reads.append(src[s:s + 150].copy())
    rf = d / "sample.fq"
    with open(rf, "wb") as f:
        for i in rng.permutation(len(reads)):
            f.write(b"@r%d\n" % i + BASES[reads[i]].tobytes()
                    + b"\n+\n" + b"I" * 150 + b"\n")

    from sylph_tpu.engine.sketch_cmd import SketchOptions, sketch
    sketch(SketchOptions(files=[], genomes=paths, reads=[str(rf)],
                         db_out_name=str(d / "db"), sample_output_dir=str(d),
                         c=25, k=31, threads=4))
    return d


def _run(d, pseudotax, **kw):
    from sylph_tpu.engine.runner import ContainOptions, contain
    out = io.StringIO()
    contain(ContainOptions(files=[str(d / "db.syldb"),
                                  str(d / "sample.fq.sylsp")], **kw),
            pseudotax=pseudotax, out=out)
    return out.getvalue()


@pytest.mark.parametrize("pseudotax", [False, True])
def test_end_to_end_identical_output(bigworld, pseudotax, monkeypatch):
    d = bigworld
    with_pf = _run(d, pseudotax)
    monkeypatch.setattr("sylph_tpu.engine.prefilter.prefilter_candidates",
                        lambda *a, **k: None)
    without_pf = _run(d, pseudotax)
    assert with_pf == without_pf
    assert len(with_pf.strip().splitlines()) > 1   # found something


def _device_mask(hist, n_kmers, min_ani, no_adj=False):
    import jax
    import jax.numpy as jnp

    from sylph_tpu.engine.prefilter import candidate_mask_device
    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(candidate_mask_device(
            jnp.asarray(hist.astype(np.int32)),
            jnp.asarray(n_kmers.astype(np.int32)), k=31, min_ani=min_ani,
            min_number_kmers=50.0, min_count_correct=3.0, no_adj=no_adj))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_candidate_mask_device_superset(seed):
    """The f32 on-device mask must keep every genome the host f64 mask
    keeps (which itself is a superset of the scalar survivors)."""
    rng = np.random.default_rng(seed)
    G = 400
    n_kmers = rng.integers(30, 4000, size=G)
    hist = np.zeros((G, _H), np.int64)
    for g in range(G):
        kind = rng.integers(0, 4)
        nk = int(n_kmers[g])
        if kind == 1:
            lam = rng.uniform(0.05, 2.0)
            covs = rng.poisson(lam, size=nk)
            covs = covs[covs > 0]
        elif kind == 2:
            covs = rng.poisson(rng.uniform(3, 40),
                               size=rng.integers(1, nk + 1)) + 1
        elif kind == 3:
            covs = rng.integers(1, 3, size=rng.integers(1, max(2, nk)))
        else:
            covs = np.empty(0, np.int64)
        if covs.size:
            hist[g] += np.bincount(np.minimum(covs, _H - 1), minlength=_H)

    for min_ani in (0.5, 0.90, 0.95):
        host = candidate_mask(hist, n_kmers, k=31, min_ani=min_ani,
                              min_number_kmers=50.0,
                              min_count_correct=3.0, no_adj=False)
        dev = _device_mask(hist, n_kmers, min_ani)
        dropped = host & ~dev
        assert not dropped.any(), (
            f"device mask dropped host-kept rows {np.flatnonzero(dropped)}"
            f" at min_ani={min_ani}")


@pytest.mark.parametrize("floor", [0.90, 0.95])
def test_candidate_mask_device_adversarial_floor(floor):
    """Near-floor adversarial cases (see the host-mask twin test): the
    device f32 mask must also keep every scalar survivor."""
    hist_rows, nk_list, covs_list = [], [], []
    for c, n, _d in _closest_naive_cases(floor):
        row = np.zeros(_H, np.int64)
        row[3] = c
        hist_rows.append(row)
        nk_list.append(n)
        covs_list.append(np.full(c, 3, np.int64))
    for c1, c2, n, _d in _closest_adjusted_cases(floor):
        row = np.zeros(_H, np.int64)
        row[1], row[2] = c1, c2
        hist_rows.append(row)
        nk_list.append(n)
        covs_list.append(np.concatenate([np.ones(c1, np.int64),
                                         np.full(c2, 2, np.int64)]))
    hist = np.stack(hist_rows)
    n_kmers = np.asarray(nk_list, np.int64)
    dev = _device_mask(hist, n_kmers, floor)
    for g in range(len(covs_list)):
        truth = _scalar_survives(covs_list[g], int(n_kmers[g]), floor)
        assert not (truth and not dev[g]), (
            f"device mask dropped a near-floor survivor: row {g}")
