"""DeviceContainment chunked/multi-device index vs exact numpy counts."""

import jax
import numpy as np

from sylph_tpu.core.types import GenomeSketch, SequencesSketch
from sylph_tpu.engine.device_exec import DeviceContainment


def test_bucketed_engine_counts(monkeypatch):
    monkeypatch.setattr(DeviceContainment, "BUCKET_MIN", 1000)
    monkeypatch.setattr(DeviceContainment, "CHUNK", 4096)
    rng = np.random.default_rng(3)
    c = 50
    thr = ((1 << 64) - 1) // c
    pool = rng.integers(0, thr, size=6000, dtype=np.uint64)
    genomes = [GenomeSketch(
        genome_kmers=rng.choice(pool, size=900,
                                replace=False).astype(np.uint64),
        pseudotax_tracked_nonused_kmers=None, file_name=f"g{g}",
        first_contig_name=f"c{g}", c=c, k=31, gn_size=1, min_spacing=30)
        for g in range(10)]
    skm = rng.choice(pool, size=2500, replace=False).astype(np.uint64)
    scnt = rng.integers(1, 6, size=2500).astype(np.uint32)
    sample = SequencesSketch(kmers=skm, counts=scnt, c=c, k=31,
                             file_name="s", sample_name=None, paired=False,
                             mean_read_length=150.0)
    # pin one device: the chunked regimes are the single-device path
    eng = DeviceContainment(genomes, devices=[jax.devices()[0]])
    assert eng._use_buckets and len(eng._bchunks) > 1
    m = dict(zip(skm.tolist(), scnt.tolist()))
    for gi, g in enumerate(genomes):
        covs, lost = eng.genome_covs(gi, sample)
        want = sorted(m[int(km)] for km in g.genome_kmers if int(km) in m)
        assert covs.tolist() == want


def test_multi_chunk_multi_device_counts(monkeypatch):
    monkeypatch.setattr(DeviceContainment, "CHUNK", 1024)
    rng = np.random.default_rng(0)
    pool = rng.integers(0, 1 << 48, size=3000, dtype=np.uint64)
    genomes = []
    for g in range(12):
        ks = rng.choice(pool, size=700, replace=False).astype(np.uint64)
        genomes.append(GenomeSketch(
            genome_kmers=ks, pseudotax_tracked_nonused_kmers=None,
            file_name=f"g{g}", first_contig_name=f"c{g}", c=100, k=31,
            gn_size=100000, min_spacing=30))
    skm = rng.choice(pool, size=1500, replace=False).astype(np.uint64)
    scnt = rng.integers(1, 5, size=1500).astype(np.uint32)
    sample = SequencesSketch(kmers=skm, counts=scnt, c=100, k=31,
                             file_name="s", sample_name=None, paired=False,
                             mean_read_length=150.0)
    eng = DeviceContainment(genomes, devices=[jax.devices()[0]])
    assert len(eng._chunks) > 1     # the chunked path is actually exercised
    m = dict(zip(skm.tolist(), scnt.tolist()))
    for gi, g in enumerate(genomes):
        covs, lost = eng.genome_covs(gi, sample)
        want = sorted(m[int(km)] for km in g.genome_kmers if int(km) in m)
        assert covs.tolist() == want
        assert lost == 0


def test_sharded_multi_device_counts():
    """>1 device => shard_map merge join over the ('ip',) mesh; counts must
    be bit-identical to the single-device chunked engine."""
    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multi-device mesh")
    rng = np.random.default_rng(7)
    pool = rng.integers(0, 1 << 48, size=4000, dtype=np.uint64)
    genomes = []
    for g in range(16):
        ks = rng.choice(pool, size=800, replace=False).astype(np.uint64)
        genomes.append(GenomeSketch(
            genome_kmers=ks, pseudotax_tracked_nonused_kmers=None,
            file_name=f"g{g}", first_contig_name=f"c{g}", c=100, k=31,
            gn_size=100000, min_spacing=30))
    skm = rng.choice(pool, size=2000, replace=False).astype(np.uint64)
    scnt = rng.integers(1, 5, size=2000).astype(np.uint32)
    sample = SequencesSketch(kmers=skm, counts=scnt, c=100, k=31,
                             file_name="s", sample_name=None, paired=False,
                             mean_read_length=150.0)
    eng_sh = DeviceContainment(genomes)
    assert eng_sh._sharded is not None
    eng_1 = DeviceContainment(genomes, devices=[jax.devices()[0]])
    c_sh = eng_sh._counts(sample)
    c_1 = eng_1._counts(sample)
    n = min(c_sh.size, c_1.size)      # pad tails may differ in length
    assert (c_sh[:n] == c_1[:n]).all()
    assert not c_sh[n:].any() and not c_1[n:].any()
    for gi in range(len(genomes)):
        a, la = eng_sh.genome_covs(gi, sample)
        b, lb = eng_1.genome_covs(gi, sample)
        assert a.tolist() == b.tolist() and la == lb


def test_prefetch_batched_counts_parity():
    """prefetch() fills the cache with counts identical to per-sample
    joins, for both the sharded (multi-device) and merge (one-device)
    regimes."""
    rng = np.random.default_rng(11)
    pool = rng.integers(0, 1 << 48, size=4000, dtype=np.uint64)
    genomes = []
    for g in range(10):
        ks = rng.choice(pool, size=600, replace=False).astype(np.uint64)
        genomes.append(GenomeSketch(
            genome_kmers=ks, pseudotax_tracked_nonused_kmers=None,
            file_name=f"g{g}", first_contig_name=f"c{g}", c=100, k=31,
            gn_size=100000, min_spacing=30))

    def mk_sample(seed, n):
        r = np.random.default_rng(seed)
        skm = np.unique(r.choice(pool, size=n))
        return SequencesSketch(
            kmers=skm.astype(np.uint64),
            counts=r.integers(1, 5, size=skm.size).astype(np.uint32),
            c=100, k=31, file_name=f"s{seed}", sample_name=None,
            paired=False, mean_read_length=150.0)

    samples = [mk_sample(i, 500 + 301 * i) for i in range(3)]
    engines = [DeviceContainment(genomes)]
    if len(jax.devices()) > 1:
        engines.append(DeviceContainment(genomes,
                                         devices=[jax.devices()[0]]))
    for eng in engines:
        ref = DeviceContainment(genomes, devices=[jax.devices()[0]])
        eng.prefetch(samples)
        if eng._grange is None and not getattr(eng, "_use_buckets", False):
            assert all(id(s) in eng._cache for s in samples)
        for s in samples:
            got = eng._counts(s)
            want = ref._counts(s)
            n = min(got.size, want.size)
            assert (got[:n] == want[:n]).all()
            assert not got[n:].any() and not want[n:].any()
