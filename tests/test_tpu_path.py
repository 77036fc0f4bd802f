"""Device-path tests: JAX/TPU kernels vs the host numpy oracles.

Runs on the virtual 8-device CPU mesh (conftest); the same code paths are
exercised on real TPU by bench.py and __graft_entry__.py.
"""

import collections

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sylph_tpu.kmer.hashing import mm_hash64_np, mm_hash64_py
from sylph_tpu.kmer.seeding import fmh_seeds_np
from sylph_tpu.stats.contain_stats import StatParams, coverage_stats
from sylph_tpu.tpu import u64
from sylph_tpu.tpu.containment import (compact_rows, merge_join_hist,
                                       probe_counts, sort_pairs)
from sylph_tpu.tpu.pipeline import (build_host_index, finish_profile,
                                    make_mesh, make_sharded_profile_step,
                                    pack_reads, profile_step, sketch_batch)
from sylph_tpu.tpu.seeding import canonical_kmers, seed_hashes
from sylph_tpu.tpu.stats import stats_from_histograms


def _random_reads(rng, n, lo=40, hi=100):
    codes = "ACGT"
    return ["".join(codes[b] for b in rng.integers(0, 4, rng.integers(lo, hi))
                    ).encode() for _ in range(n)]


class TestU64:
    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 1 << 63, size=100, dtype=np.uint64) * 2 + 1
        hi, lo = u64.from_u64_np(x)
        assert (u64.to_u64_np(hi, lo) == x).all()

    def test_mm_hash_pairs_vs_scalar(self):
        rng = np.random.default_rng(1)
        x = rng.integers(0, 1 << 62, size=256, dtype=np.uint64)
        hi, lo = u64.from_u64_np(x)
        hhi, hlo = jax.jit(u64.mm_hash64)((jnp.asarray(hi), jnp.asarray(lo)))
        got = u64.to_u64_np(np.asarray(hhi), np.asarray(hlo))
        want = mm_hash64_np(x)
        assert (got == want).all()
        # and against the pure-python oracle for a few values
        for v in x[:8].tolist():
            assert mm_hash64_py(int(v)) == int(
                mm_hash64_np(np.array([v], np.uint64))[0])

    def test_shifts_adds(self):
        rng = np.random.default_rng(2)
        a = rng.integers(0, 1 << 64, size=64, dtype=np.uint64)
        b = rng.integers(0, 1 << 64, size=64, dtype=np.uint64)
        pa = tuple(map(jnp.asarray, u64.from_u64_np(a)))
        pb = tuple(map(jnp.asarray, u64.from_u64_np(b)))
        add = u64.to_u64_np(*[np.asarray(x) for x in u64.add(pa, pb)])
        assert (add == a + b).all()
        for s in (0, 1, 21, 31, 32, 33, 63):
            shl = u64.to_u64_np(*[np.asarray(x) for x in u64.shl(pa, s)])
            assert (shl == a << np.uint64(s)).all(), s
            shr = u64.to_u64_np(*[np.asarray(x) for x in u64.shr(pa, s)])
            assert (shr == a >> np.uint64(s)).all(), s
        assert (np.asarray(u64.lt(pa, pb)) == (a < b)).all()


class TestDeviceSeeding:
    @pytest.mark.parametrize("k", [15, 16, 21, 31])
    def test_canonical_vs_host(self, k):
        rng = np.random.default_rng(3)
        from sylph_tpu.kmer.seeding import canonical_kmers_np
        bases = rng.integers(0, 4, size=(4, 80)).astype(np.uint32)
        hi, lo = jax.jit(canonical_kmers, static_argnums=1)(bases, k)
        got = u64.to_u64_np(np.asarray(hi), np.asarray(lo))
        for i in range(4):
            want = canonical_kmers_np(bases[i].astype(np.uint8), k)
            assert (got[i] == want).all()

    @pytest.mark.parametrize("c,k", [(20, 31), (5, 21)])
    def test_seed_hashes_vs_host(self, c, k):
        rng = np.random.default_rng(4)
        reads = _random_reads(rng, 48)
        bases, lengths = pack_reads(reads, 100)
        hhi, hlo, keep = seed_hashes(bases, lengths, c=c, k=k)
        hhi, hlo, keep = map(np.asarray, (hhi, hlo, keep))
        got = collections.Counter(
            u64.to_u64_np(hhi[keep], hlo[keep]).tolist())
        want = collections.Counter()
        for r in reads:
            for h in fmh_seeds_np(r, c, k):
                want[int(h)] += 1
        assert got == want

    @pytest.mark.parametrize("c,k", [(200, 31), (20, 31), (5, 21)])
    def test_butterfly_pack_matches_xla(self, c, k):
        from sylph_tpu.tpu.pallas_seeding import seed_pack_pallas
        rng = np.random.default_rng(13)
        N, L = 128, 256
        bases = rng.integers(0, 4, size=(N, L)).astype(np.uint32)
        lengths = rng.integers(k, L + 1, size=N).astype(np.int32)
        hhi, hlo, keep = map(np.asarray,
                             seed_hashes(bases, lengths, c=c, k=k))
        chi, clo = map(np.asarray, seed_pack_pallas(
            bases, lengths, c=c, k=k, interpret=True))
        for i in range(N):
            live = chi[i] != np.uint32(0xFFFFFFFF)
            assert np.array_equal(chi[i][live], hhi[i][keep[i]][:128])
            assert np.array_equal(clo[i][live], hlo[i][keep[i]][:128])

    @pytest.mark.parametrize("c,k", [(200, 31), (20, 31), (5, 21)])
    def test_butterfly_pack_transposed_matches_xla(self, c, k):
        """seed_pack_pallas_t (read-per-COLUMN layout) must emit the same
        per-read survivor sequences as the row-major kernel/XLA seeding."""
        from sylph_tpu.tpu.pallas_seeding import seed_pack_pallas_t
        rng = np.random.default_rng(17)
        N, L = 128, 256
        bases = rng.integers(0, 4, size=(N, L)).astype(np.uint32)
        lengths = rng.integers(k, L + 1, size=N).astype(np.int32)
        hhi, hlo, keep = map(np.asarray,
                             seed_hashes(bases, lengths, c=c, k=k))
        chi, clo = map(np.asarray, seed_pack_pallas_t(
            np.ascontiguousarray(bases.T), lengths, c=c, k=k,
            interpret=True))
        cap = chi.shape[0]
        for i in range(N):
            live = chi[:, i] != np.uint32(0xFFFFFFFF)
            assert np.array_equal(chi[:, i][live], hhi[i][keep[i]][:cap])
            assert np.array_equal(clo[:, i][live], hlo[i][keep[i]][:cap])

    def test_sort_based_bincount(self, monkeypatch):
        from sylph_tpu.tpu import containment
        monkeypatch.setattr(containment, "_FORCE_SORT_BINCOUNT", True)
        rng = np.random.default_rng(15)
        for _ in range(4):
            n_bins = int(rng.integers(4, 3000))
            n = int(rng.integers(10, 100000))
            # adversarial: many singleton runs + one huge run
            seg = np.concatenate([
                rng.integers(0, n_bins, size=n // 2),
                np.full(n - n // 2, int(rng.integers(0, n_bins)))
            ]).astype(np.int32)
            got = np.asarray(jax.jit(
                containment._bincount, static_argnums=1)(
                    jnp.asarray(seg), n_bins))
            want = np.bincount(seg, minlength=n_bins)[:n_bins]
            assert (got == want).all()

    def test_repack_condenses_stream(self):
        from sylph_tpu.tpu.pallas_seeding import repack_pallas
        rng = np.random.default_rng(14)
        sent = np.uint32(0xFFFFFFFF)
        n = 50000
        hi = rng.integers(0, 1 << 20, size=n).astype(np.uint32)
        lo = rng.integers(0, 1 << 31, size=n).astype(np.uint32)
        dead = rng.random(n) > 0.09
        hi[dead] = sent
        lo[dead] = sent
        chi, clo = map(np.asarray, repack_pallas(
            hi, lo, row=1024, cap=256, interpret=True))
        want = [(int(a), int(b)) for a, b in zip(hi, lo) if a != sent]
        got = [(int(a), int(b)) for a, b in zip(chi.ravel(), clo.ravel())
               if a != sent]
        assert got == want
        assert chi.size == -(-n // 1024) * 256

    @pytest.mark.parametrize("c,k", [(20, 31), (5, 21), (7, 16)])
    def test_pallas_kernel_matches_xla(self, c, k):
        from sylph_tpu.tpu.pallas_seeding import seed_hashes_pallas
        rng = np.random.default_rng(11)
        N, L = 128, 256
        bases = rng.integers(0, 4, size=(N, L)).astype(np.uint32)
        lengths = rng.integers(k, L + 1, size=N).astype(np.int32)
        hhi, hlo, keep = map(np.asarray,
                             seed_hashes(bases, lengths, c=c, k=k))
        phi, plo, pkeep = map(np.asarray, seed_hashes_pallas(
            bases, lengths, c=c, k=k, interpret=True))
        W = L - k + 1
        assert (pkeep[:, :W] == keep).all()
        assert not pkeep[:, W:].any()
        assert (phi[:, :W][keep] == hhi[keep]).all()
        assert (plo[:, :W][keep] == hlo[keep]).all()

    def test_padding_rows_excluded(self):
        # pack_reads pads the batch with zero-length rows; no hashes leak
        rng = np.random.default_rng(5)
        reads = _random_reads(rng, 3)
        bases, lengths = pack_reads(reads, 100, pad_multiple=8)
        _, _, keep = seed_hashes(bases, lengths, c=1, k=21)
        assert not np.asarray(keep)[3:].any()


class TestDeviceContainment:
    def test_compact_rows(self):
        rng = np.random.default_rng(6)
        n = 2000
        hi = rng.integers(0, 1 << 20, size=n, dtype=np.uint32)
        lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
        keep = rng.random(n) < 0.02
        chi, clo = jax.jit(compact_rows, static_argnums=(3, 4))(
            hi, lo, keep, 512, 32)
        chi, clo = np.asarray(chi), np.asarray(clo)
        got = sorted(u64.to_u64_np(chi[chi != 0xFFFFFFFF],
                                   clo[chi != 0xFFFFFFFF]).tolist())
        want = sorted(u64.to_u64_np(hi[keep], lo[keep]).tolist())
        assert got == want

    def test_merge_join_vs_probe_vs_numpy(self):
        rng = np.random.default_rng(7)
        uniq = rng.integers(0, 1 << 40, size=500, dtype=np.uint64)
        mult = rng.integers(1, 6, size=500)
        stream = np.repeat(uniq, mult)
        rng.shuffle(stream)
        pad = 4096 - stream.size
        shi, slo = u64.from_u64_np(stream)
        shi = np.concatenate([shi, np.full(pad, 0xFFFFFFFF, np.uint32)])
        slo = np.concatenate([slo, np.full(pad, 0xFFFFFFFF, np.uint32)])
        genomes = [rng.choice(uniq, size=50, replace=False).astype(np.uint64)
                   for _ in range(5)]
        idx = build_host_index(genomes)
        G, H = 5, 16
        hist = merge_join_hist(
            jnp.asarray(idx.hi), jnp.asarray(idx.lo),
            jnp.asarray(idx.genome_ids), jnp.asarray(shi), jnp.asarray(slo),
            n_genomes=G, n_buckets=H)
        m = dict(zip(uniq.tolist(), mult.tolist()))
        want = np.zeros((G, H), np.int64)
        for g, ks in enumerate(genomes):
            for km in ks:
                want[g, min(m.get(int(km), 0), H - 1)] += 1
        assert (np.asarray(hist) == want).all()
        # probe_counts (binary-search oracle) agrees
        thi, tlo = sort_pairs(jnp.asarray(shi), jnp.asarray(slo))
        counts = np.asarray(probe_counts(thi, tlo, jnp.asarray(idx.hi),
                                         jnp.asarray(idx.lo)))
        gids = idx.genome_ids
        want2 = np.zeros((G, H), np.int64)
        for cnt, g in zip(counts.tolist(), gids.tolist()):
            if g < G:
                want2[g, min(cnt, H - 1)] += 1
        assert (want2 == want).all()


class TestDeviceStats:
    def _host_stats(self, covs, n_kmers, k, min_ani):
        p = StatParams(k=k, no_ci=True)
        return coverage_stats(np.sort(np.asarray(covs, np.uint32)),
                              n_kmers, p, min_ani)

    @pytest.mark.parametrize("seed", range(6))
    def test_matches_host_chain(self, seed):
        rng = np.random.default_rng(seed)
        G, H, k = 8, 64, 31
        hist = np.zeros((G, H), np.int32)
        n_kmers = np.zeros(G, np.int32)
        cov_lists = []
        for g in range(G):
            n = int(rng.integers(60, 4000))
            lam = float(rng.uniform(0.05, 4.0))
            covs = rng.poisson(lam, size=n)
            covs = covs[covs > 0]
            covs = np.minimum(covs, H - 1)
            n_kmers[g] = n
            cov_lists.append(covs)
            for v in covs:
                hist[g, v] += 1
            hist[g, 0] = 0
        st = stats_from_histograms(jnp.asarray(hist), jnp.asarray(n_kmers),
                                   k=k, min_ani=0.0,
                                   min_number_kmers=50.0)
        for g in range(G):
            covs = cov_lists[g]
            if covs.size == 0:
                continue
            hs = self._host_stats(covs, int(n_kmers[g]), k, 0.0)
            assert hs is not None
            np.testing.assert_allclose(float(st.naive_ani[g]), hs.naive_ani,
                                       rtol=2e-6)
            assert float(st.median_cov[g]) == hs.median_cov
            np.testing.assert_allclose(float(st.mean_cov[g]), hs.mean_cov,
                                       rtol=2e-5)
            np.testing.assert_allclose(float(st.final_cov[g]),
                                       hs.final_est_cov, rtol=2e-4)
            np.testing.assert_allclose(float(st.final_ani[g]),
                                       hs.final_est_ani, rtol=2e-5)


class TestPipeline:
    def _setup(self, rng, c=20, k=31, G=3):
        reads = _random_reads(rng, 64)
        bases, lengths = pack_reads(reads, 100)
        oracle = collections.Counter()
        for r in reads:
            for h in fmh_seeds_np(r, c, k):
                oracle[int(h)] += 1
        pool = np.array(list(oracle.keys()), dtype=np.uint64)
        genomes = []
        for g in range(G):
            own = rng.choice(pool, size=min(10, pool.size),
                             replace=False).astype(np.uint64)
            rand = rng.integers(0, (1 << 64) // c, size=50, dtype=np.uint64)
            genomes.append(np.concatenate([own, rand]))
        idx = build_host_index(genomes, pad_multiple=64)
        want = np.zeros((G, 64), np.int64)
        for g, ks in enumerate(genomes):
            for km in ks:
                want[g, min(oracle.get(int(km), 0), 63)] += 1
        return bases, lengths, idx, want

    def test_single_chip(self):
        rng = np.random.default_rng(8)
        bases, lengths, idx, want = self._setup(rng)
        hist, st = profile_step(bases, lengths, idx.hi, idx.lo,
                                idx.genome_ids, idx.n_kmers, c=20, k=31,
                                n_genomes=3, n_buckets=64, min_ani=0.5)
        assert (np.asarray(hist) == want).all()

    def test_two_phase(self):
        rng = np.random.default_rng(9)
        bases, lengths, idx, want = self._setup(rng)
        chi, clo, n = sketch_batch(bases, lengths, c=20, k=31)
        hist, st = finish_profile(chi, clo, idx.hi, idx.lo, idx.genome_ids,
                                  idx.n_kmers, k=31, n_genomes=3,
                                  n_buckets=64, min_ani=0.5)
        assert (np.asarray(hist) == want).all()
        n_sentinel = int(np.asarray((chi == np.uint32(0xFFFFFFFF)).sum()))
        assert int(np.asarray(n)) == chi.size - n_sentinel

    @pytest.mark.parametrize("n_devices", [4, 8])
    def test_sharded_matches(self, n_devices):
        rng = np.random.default_rng(10)
        bases, lengths, idx, want = self._setup(rng)
        mesh = make_mesh(n_devices)
        fn, _ = make_sharded_profile_step(mesh, c=20, k=31, n_genomes=3,
                                          n_buckets=64, min_ani=0.5)
        hist, st = fn(bases, lengths, idx.hi, idx.lo, idx.genome_ids,
                      idx.n_kmers)
        assert (np.asarray(hist) == want).all()

    def test_multi_sample_batched(self):
        from sylph_tpu.tpu.pipeline import finish_profile_batched
        rng = np.random.default_rng(12)
        S = 4
        histories = []
        smp_hi = []
        smp_lo = []
        bases, lengths, idx, _ = self._setup(rng)
        for s in range(S):
            b, ln, _, _ = self._setup(np.random.default_rng(100 + s))
            chi, clo, _ = sketch_batch(b, ln, c=20, k=31)
            h1, _ = finish_profile(chi, clo, idx.hi, idx.lo, idx.genome_ids,
                                   idx.n_kmers, k=31, n_genomes=3,
                                   n_buckets=64, min_ani=0.5)
            histories.append(np.asarray(h1))
            smp_hi.append(np.asarray(chi).reshape(-1))
            smp_lo.append(np.asarray(clo).reshape(-1))
        hist, st = finish_profile_batched(
            np.stack(smp_hi), np.stack(smp_lo), idx.hi, idx.lo,
            idx.genome_ids, idx.n_kmers, k=31, n_genomes=3, n_buckets=64,
            min_ani=0.5)
        assert (np.asarray(hist) == np.stack(histories)).all()
        assert st.naive_ani.shape == (S, 3)

    def test_graft_entry(self):
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", "/root/repo/__graft_entry__.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        mod.dryrun_multichip(8)
