"""Device (TPU) execution engine for query/profile containment.

Replaces the per-genome probe loop (host numpy searchsorted, see
engine/containment.py) with ONE device merge join of the whole genome index
against the sample's deduplicated (kmer, count) table, computed once per
sample. Every downstream consumer — pass-1 stats, the winner-table pass-2
re-count, dereplication — reads exact per-k-mer counts from the cached [M]
vector, so TSV output is bit-identical to the host path (statistics stay in
host f64).

This is the TPU-native replacement for sylph's rayon-parallel
``get_stats``/hashmap probing (src/contain.rs:284-307, 632-652): the index
lives in device HBM across samples; each sample costs one sort-merge join.
"""

import logging
import os
from typing import List, Optional

import numpy as np

from ..core.types import GenomeSketch, SequencesSketch

log = logging.getLogger("sylph")

_MERGE_JOIN_JIT = None
_MERGE_JOIN_BATCHED_JIT = None

_TRANSIENT_STATUS = ("UNAVAILABLE", "INTERNAL", "DEADLINE", "ABORTED",
                     "UNKNOWN")


def _is_transient_jax_error(e: Exception) -> bool:
    """True for backend failures worth one retry (relay blips), never for
    deterministic ones like RESOURCE_EXHAUSTED/INVALID_ARGUMENT."""
    try:
        import jax
        if not isinstance(e, jax.errors.JaxRuntimeError):
            return False
    except (ImportError, AttributeError):
        if type(e).__name__ != "JaxRuntimeError":
            return False
    return any(s in str(e) for s in _TRANSIENT_STATUS)


def _merge_join_jit():
    """Module-cached jitted merge join (one trace per process, not per
    sample; the XLA executable additionally persists via the repo cache)."""
    global _MERGE_JOIN_JIT
    if _MERGE_JOIN_JIT is None:
        import jax

        from ..tpu.containment import merge_join_counts
        _MERGE_JOIN_JIT = jax.jit(merge_join_counts)
    return _MERGE_JOIN_JIT


def _merge_join_batched_jit():
    """Vmapped-over-samples merge join: [S, T] sample tables vs one index
    chunk -> [S, M] counts in one program (multi-sample batching)."""
    global _MERGE_JOIN_BATCHED_JIT
    if _MERGE_JOIN_BATCHED_JIT is None:
        import jax

        from ..tpu.containment import merge_join_counts
        _MERGE_JOIN_BATCHED_JIT = jax.jit(jax.vmap(
            merge_join_counts, in_axes=(None, None, 0, 0, 0)))
    return _MERGE_JOIN_BATCHED_JIT


def device_available() -> bool:
    try:
        import jax
        return len(jax.devices()) > 0
    except Exception:
        return False


class DeviceContainment:
    """Holds the flattened genome index on device; serves per-sample counts.

    Three regimes by total index size:
      - merge (< BUCKET_MIN): chunked sort-merge join; exact per-k-mer
        counts cached per sample.
      - bucket (< GRANGE_MIN): whole-range bucketed compare join per chunk
        (the static index is never re-sorted per sample). Measured on v5e:
        2.4x faster than the merge join at 33.5M index vs 4.2M sample
        k-mers, but SLOWER at comparable sizes (index ~ sample).
      - grange (>= GRANGE_MIN, database scale): globally hash-sorted
        range-chunked layout (tpu/grange.py). Per-sample output is the
        per-genome coverage HISTOGRAM only (the multiset pass-1 statistics
        need); exact per-k-mer counts for the few surviving genomes come
        from the host probe, so fetching 10^8-10^9 counts through the
        interconnect is never required.
    """

    CHUNK = 1 << 22       # index k-mers per device call
    BUCKET_MIN = 1 << 24  # bucketed join at/above this total index size
    GRANGE_MIN = 1 << 26  # global-range layout at/above this total size

    def __init__(self, genome_sketches: List[GenomeSketch], devices=None):
        import jax

        from ..tpu import configure_persistent_cache
        from ..tpu.pipeline import build_host_index

        configure_persistent_cache()
        self._jax = jax
        self._genome_sketches = genome_sketches
        total = int(sum(g.genome_kmers.size for g in genome_sketches))
        self._grange = None
        self._sharded = None
        self._devices = list(devices) if devices is not None \
            else jax.devices()
        env_nd = os.environ.get("SYLPH_TPU_DEVICES")
        if devices is None and env_nd:
            self._devices = self._devices[:max(1, int(env_nd))]
        # per-sample counts cache: id(sample) -> (strong ref, counts).
        # Strong refs prevent id reuse aliasing; bounded so multi-sample
        # prefetch batches fit without unbounded growth.
        self._cache = {}
        self._hists_cache = {}      # grange regime: id -> (ref, [G,64])
        self._cache_cap = 16
        self._grange_span = None    # (pid, n_procs) in multi-host mode
        if total >= self.GRANGE_MIN:
            from ..tpu.grange import GRangeEngine, build_grange_index
            gidx = None
            cache_dir = os.environ.get("SYLPH_GRANGE_CACHE")
            fp = _grange_fingerprint(genome_sketches) if cache_dir else ""
            if cache_dir:
                gidx = _grange_cache_load(cache_dir, total,
                                          len(genome_sketches), fp)
            if gidx is None:
                kmers = np.concatenate(
                    [g.genome_kmers for g in genome_sketches]
                ).astype(np.uint64)
                gids = np.repeat(
                    np.arange(len(genome_sketches), dtype=np.int32),
                    [g.genome_kmers.size for g in genome_sketches])
                gidx = build_grange_index(kmers, gids,
                                          len(genome_sketches))
                del kmers, gids
                if cache_dir:
                    _grange_cache_save(cache_dir, total,
                                       len(genome_sketches), gidx, fp)
            max_res = self._grange_residency(gidx)
            # multi-host session (jax.distributed): each process owns a
            # round-robin chunk subset on its LOCAL devices and hists()
            # merges the [G, H] partials across processes (grange.py
            # merge_process_hists — BASELINE.md's pod-scale shape)
            span = None
            try:
                if jax.process_count() > 1:
                    span = (jax.process_index(), jax.process_count())
                    local = [d for d in self._devices
                             if d.process_index == jax.process_index()]
                    self._devices = local or jax.local_devices()
            except Exception:
                span = None
            self._grange_span = span
            self._grange = GRangeEngine(gidx, devices=self._devices,
                                        max_resident_chunks=max_res,
                                        process_span=span)
            log.debug(
                "Device index (grange): %d genomes, %d k-mers, %d chunks "
                "of [%d, %d] buckets (%s resident), %d spilled, over %d "
                "device(s)",
                len(genome_sketches), total, len(gidx.chunk_hi), gidx.B,
                gidx.CI, "all" if max_res is None else max_res,
                gidx.spill_kmers.size, len(self._devices))
            return
        if len(self._devices) > 1:
            self._init_sharded(jax, genome_sketches)
            return
        # (below: sub-GRANGE_MIN single-device regimes)
        # pad to the next power of two (>=1024) so compile shapes are
        # bounded: one program per distinct (chunk, sample) shape pair
        m = 1024
        while m < total:
            m *= 2
        m = min(m, -(-total // self.CHUNK) * self.CHUNK) if total else m
        self.index = build_host_index(
            [g.genome_kmers for g in genome_sketches], pad_multiple=m)
        self.offsets = np.concatenate(
            [[0], np.cumsum(self.index.n_kmers.astype(np.int64))])
        m = self.index.hi.size
        # index chunks round-robin across all selected devices: each
        # chunk's join runs on its resident device, so chunks process in
        # parallel (async dispatch) with no collectives needed — per-chunk
        # counts concatenate on host.
        self._use_buckets = (total >= self.BUCKET_MIN)
        if self._use_buckets:
            from ..tpu.bucket_join import build_bucketed_index
            c_min = min(g.c for g in genome_sketches)
            self._bchunks = []
            for i, s in enumerate(range(0, m, self.CHUNK)):
                bidx = build_bucketed_index(
                    self.index.hi[s:s + self.CHUNK],
                    self.index.lo[s:s + self.CHUNK], c_min)
                dev = self._devices[i % len(self._devices)]
                self._bchunks.append(
                    (bidx, jax.device_put(bidx.hi, dev),
                     jax.device_put(bidx.lo, dev)))
            self._chunks = []
        else:
            self._chunks = [
                tuple(jax.device_put((self.index.hi[s:s + self.CHUNK],
                                      self.index.lo[s:s + self.CHUNK]),
                                     self._devices[i % len(self._devices)]))
                for i, s in enumerate(range(0, m, self.CHUNK))]
        log.debug("Device index: %d genomes, %d k-mers, %d %s chunk(s) over "
                  "%d device(s)", len(genome_sketches), m,
                  len(self._bchunks) if self._use_buckets
                  else len(self._chunks),
                  "bucketed" if self._use_buckets else "merge-join",
                  len(self._devices))

    def _grange_residency(self, gidx):
        """Resident-chunk cap when the index exceeds the HBM budget.

        None = everything fits (the common case: GTDB-R220 ~ 10.6 GB on a
        16 GB chip). Budget = 70% of per-device memory (jax memory_stats
        when exposed; SYLPH_HBM_GB overrides — some relay/plugin backends
        report nothing), leaving headroom for the sample stream, join
        grids and collectives. Chunks beyond the cap stream per sample
        with async prefetch (tpu/grange.py)."""
        n_chunks = len(gidx.chunk_hi)
        chunk_bytes = gidx.B * gidx.CI * 12
        env = os.environ.get("SYLPH_HBM_GB")
        if env:
            budget = float(env) * 1e9
        else:
            try:
                stats = self._devices[0].memory_stats()
                budget = float(stats["bytes_limit"])
            except Exception:
                return None          # unknown memory: keep fast path
        per_dev = int(0.7 * budget) // max(chunk_bytes, 1)
        cap = per_dev * len(self._devices)
        return None if cap >= n_chunks else max(1, cap)

    def _init_sharded(self, jax, genome_sketches: List[GenomeSketch]):
        """Multi-device mode: the genome index shards over a 1-D ('ip',)
        mesh; each device merge-joins the (replicated) sample table against
        its shard under shard_map and the sharded output concatenates to
        exact per-k-mer counts — the multi-chip analog of the reference's
        per-genome rayon fan-out (src/contain.rs:266-307), with bit-parity
        preserved because statistics stay on the host."""
        from jax.sharding import Mesh, NamedSharding
        from jax.sharding import PartitionSpec as P

        from ..tpu.containment import merge_join_counts
        from ..tpu.pipeline import build_host_index

        n_dev = len(self._devices)
        # pad so the M axis shards evenly at any sample-pad shape
        m = 1024 * n_dev
        total = int(sum(g.genome_kmers.size for g in genome_sketches))
        while m < total:
            m *= 2
        self.index = build_host_index(
            [g.genome_kmers for g in genome_sketches], pad_multiple=m)
        self.offsets = np.concatenate(
            [[0], np.cumsum(self.index.n_kmers.astype(np.int64))])
        mesh = Mesh(np.asarray(self._devices), ("ip",))
        self._shard_smp = NamedSharding(mesh, P())
        fn = jax.shard_map(
            merge_join_counts, mesh=mesh,
            in_specs=(P("ip"), P("ip"), P(), P(), P()),
            out_specs=P("ip"), check_vma=False)
        self._sharded = jax.jit(fn)
        fnb = jax.shard_map(
            jax.vmap(merge_join_counts, in_axes=(None, None, 0, 0, 0)),
            mesh=mesh,
            in_specs=(P("ip"), P("ip"), P(), P(), P()),
            out_specs=P(None, "ip"), check_vma=False)
        self._sharded_batched = jax.jit(fnb)
        self._idx_dev = jax.device_put(
            (self.index.hi, self.index.lo), NamedSharding(mesh, P("ip")))
        log.debug("Device index (sharded): %d genomes, %d k-mers over %d "
                  "device(s)", len(genome_sketches), m, n_dev)

    def _cache_put(self, sample, counts: np.ndarray) -> None:
        if len(self._cache) >= self._cache_cap:
            self._cache.pop(next(iter(self._cache)))
        self._cache[id(sample)] = (sample, counts)

    @staticmethod
    def _pad_table(sample: SequencesSketch, t: int):
        """Sentinel-padded (hi, lo, weights) arrays of length t."""
        from ..tpu import u64
        skmers, scounts = sample.sorted_view()
        shi = np.full(t, 0xFFFFFFFF, np.uint32)
        slo = np.full(t, 0xFFFFFFFF, np.uint32)
        wts = np.zeros(t, np.int32)
        hi, lo = u64.from_u64_np(skmers)
        shi[:skmers.size] = hi
        slo[:skmers.size] = lo
        wts[:skmers.size] = scounts
        return shi, slo, wts

    def prefetch(self, samples: List[SequencesSketch]) -> None:
        """Batch the containment joins of several samples into one device
        program per index chunk ([S, T] vmapped merge join) — the CLI
        analog of finish_profile_batched (multi-sample data parallelism,
        reference counterpart: the chunked sample par_iter
        src/contain.rs:266-307). Counts land in the per-sample cache;
        regimes without a batched path (bucket, grange) are served
        per-sample on demand instead."""
        if self._grange is not None:
            # database-scale regime: batch the per-sample histogram sweeps
            # (single-device engines only — the stream path keeps the
            # whole batch on one chip)
            # samples that streamed to the device during ingest carry a
            # _device_view: their mask/hists run per-sample against the
            # resident view (~35 MB shipped DURING ingest) — re-uploading
            # them as [S, T] padded tables here would put GBs on a slow
            # wire at GTDB sample sizes
            todo = [s for s in samples if id(s) not in self._hists_cache
                    and getattr(s, "_device_view", None) is None]
            if len(todo) < 2 or len(self._devices) != 1 \
                    or self._grange_span is not None:
                return
            from ..utils.timing import stage_timer
            tables = [s.sorted_view() for s in todo]
            with stage_timer(
                    f"batched grange hists ({self._grange.gidx.m} k-mers "
                    f"x {len(todo)} samples)"):
                hs = self._grange.hists_batched(tables)
            for si, s in enumerate(todo):
                self._hists_cache[id(s)] = (s, hs[si])
                while len(self._hists_cache) > max(self._cache_cap,
                                                   len(todo) + 2):
                    self._hists_cache.pop(next(iter(self._hists_cache)))
            return
        todo = [s for s in samples if id(s) not in self._cache]
        if len(todo) < 2 or \
                (self._sharded is None and self._use_buckets):
            return
        import jax
        S = len(todo)
        t = max(1024, 1 << int(np.ceil(np.log2(max(
            max(s.kmers.size for s in todo), 1)))))
        tabs = [self._pad_table(s, t) for s in todo]
        shi = np.stack([a for a, _, _ in tabs])
        slo = np.stack([b for _, b, _ in tabs])
        wts = np.stack([w for _, _, w in tabs])
        self._cache_cap = max(self._cache_cap, S + 2)
        from ..utils.timing import stage_timer
        with stage_timer(
                f"batched containment join ({self.index.hi.size} k-mers x "
                f"{S} samples x {t} table slots)"):
            if self._sharded is not None:
                smp = jax.device_put((shi, slo, wts), self._shard_smp)
                counts = np.asarray(
                    self._sharded_batched(*self._idx_dev, *smp))
            else:
                fn = _merge_join_batched_jit()
                smp_by_dev = {
                    d: jax.device_put((shi, slo, wts), d)
                    for d in self._devices[:max(1, min(
                        len(self._devices), len(self._chunks)))]}
                outs = []
                for i, (chi, clo) in enumerate(self._chunks):
                    smp = smp_by_dev[self._devices[i % len(self._devices)]]
                    outs.append(fn(chi, clo, smp[0], smp[1], smp[2]))
                counts = np.concatenate(
                    [np.asarray(o) for o in outs], axis=1)
        for si, s in enumerate(todo):
            self._cache_put(s, counts[si])

    def _counts(self, sample: SequencesSketch) -> np.ndarray:
        # cache by identity; keep a strong ref so a GC'd sample's id can't
        # be recycled by a different object and alias the cache
        hit = self._cache.get(id(sample))
        if hit is not None and hit[0] is sample:
            return hit[1]
        import jax

        skmers, scounts = sample.sorted_view()
        # pad the sample table to the next power of two to bound compile
        # shapes (one program per (chunk, sample-bucket) pair)
        t = max(1024, 1 << int(np.ceil(np.log2(max(skmers.size, 1)))))
        shi, slo, wts = self._pad_table(sample, t)
        if self._sharded is not None:
            from ..utils.timing import stage_timer
            smp = jax.device_put((shi, slo, wts), self._shard_smp)
            with stage_timer(
                    f"sharded containment join ({self.index.hi.size} "
                    f"k-mers x {skmers.size} sample k-mers, "
                    f"{len(self._devices)} devices)"):
                counts = np.asarray(self._sharded(*self._idx_dev, *smp))
            self._cache_put(sample, counts)
            return counts
        # replicate the (tiny) sample table onto every device hosting chunks
        n_chunks = (len(self._bchunks) if self._use_buckets
                    else len(self._chunks))
        n_dev = min(len(self._devices), n_chunks)
        smp_by_dev = {
            d: jax.device_put((shi, slo, wts), d)
            for d in self._devices[:max(1, n_dev)]}

        from ..utils.timing import stage_timer
        with stage_timer(
                f"device containment join ({self.index.hi.size} k-mers x "
                f"{skmers.size} sample k-mers, "
                f"{'bucketed' if self._use_buckets else 'merge'})"):
            if self._use_buckets:
                from ..tpu.bucket_join import (bucket_join_device,
                                               sample_cs)
                parts = []
                for i, (bidx, dih, dil) in enumerate(self._bchunks):
                    smp = smp_by_dev[self._devices[i % len(self._devices)]]
                    CS = sample_cs(skmers.size, bidx.n_buckets)
                    parts.append((bidx, bucket_join_device(
                        dih, dil, smp[0], smp[1], smp[2],
                        width=bidx.width, B=bidx.n_buckets, CS=CS)))
                counts = np.zeros(self.index.hi.size, np.int32)
                for i, (bidx, grid) in enumerate(parts):
                    g = np.asarray(grid)
                    live = bidx.pos >= 0
                    base = i * self.CHUNK
                    counts[base + bidx.pos[live]] = g[live]
            else:
                fn = _merge_join_jit()
                outs = []
                for i, (chi, clo) in enumerate(self._chunks):
                    smp = smp_by_dev[self._devices[i % len(self._devices)]]
                    outs.append(fn(chi, clo, smp[0], smp[1], smp[2]))
                counts = np.concatenate([np.asarray(o) for o in outs])
        self._cache_put(sample, counts)
        return counts

    def serves_streams(self) -> bool:
        """True iff sample_streamer() would return a stream (the grange
        single-device serving regime) — a side-effect-free probe
        (sample_streamer starts an uploader thread per call)."""
        return (self._grange is not None and len(self._devices) == 1
                and self._grange_span is None)

    def sample_streamer(self):
        """DeviceSampleStream for the grange single-device serving path
        (None otherwise): the runner hands it to the read sketcher so
        the sample k-mers upload WHILE the file is still decoding."""
        if not self.serves_streams():
            return None
        from .device_sketch import DeviceSampleStream
        return DeviceSampleStream(self._devices[0])

    def candidates_mask(self, sample: SequencesSketch,
                        mask_kwargs: dict):
        """[G] bool candidate mask computed ON DEVICE, or None when the
        regime doesn't support it (multi-device merges / spill / heavy
        CSR are host-side, and non-grange regimes fetch exact counts
        anyway). Saves the [G, 64] histogram fetch at database scale."""
        if self._grange is None or len(self._devices) != 1 \
                or self._grange_span is not None:
            return None
        g = self._grange.gidx
        # heavy-run marker bins expand host-side, so their contribution
        # can't join the on-device decision — host path for those DBs.
        # Spill is different: it only ADDS counts, so genomes with ANY
        # spill hit are OR-ed into the candidate set below (superset-
        # safe), unless the spill list is degenerate.
        if g.n_heavy or g.spill_kmers.size > (1 << 20):
            return None
        from .prefilter import candidate_mask_device
        if not hasattr(self, "_n_kmers_dev"):
            import jax
            self._n_kmers_dev = jax.device_put(
                np.array([s.genome_kmers.size
                          for s in self._genome_sketches], np.int32),
                self._devices[0])

        def mask_fn(hist_dev):
            return candidate_mask_device(hist_dev, self._n_kmers_dev,
                                         **mask_kwargs)

        dv = getattr(sample, "_device_view", None)
        table_fn = _warm_table(sample, dv is not None)
        from ..utils.timing import stage_timer
        with stage_timer(
                f"device grange candidate mask ({g.m} k-mers x "
                f"{sample.kmers.size} sample k-mers)"):
            out = None
            if dv is not None and os.environ.get(
                    "SYLPH_MASK_STREAM", "1") != "0":
                # one-dispatch stream sweep: a single fused probe+mask
                # fetch instead of three serial round trips. The
                # previous request's measured match total (x1.5 margin)
                # sizes the code-compaction chain for the actual hit
                # rate; an under-estimate is caught by the conservation
                # check and retried without the hint.
                hint = getattr(self, "_mask_matches_hint", None)
                if hint:
                    # half-octave-quantized: the hint feeds a STATIC
                    # compile argument (the compaction density), so a
                    # raw count would recompile per request; rounded up
                    # to the next sqrt(2) step, serving sessions reuse
                    # at most 2 compiles per octave of hit rate
                    # (margin >= 1.5x before rounding)
                    hint = int(2.0 ** (np.ceil(2.0 * np.log2(
                        max(hint * 1.5, 2.0))) / 2.0)) + 1
                try:
                    ms = self._grange.candidate_mask_stream(
                        dv, mask_fn, n_matches=hint)
                    if ms is None and hint:
                        ms = self._grange.candidate_mask_stream(
                            dv, mask_fn)
                    if ms is not None:
                        out, self._mask_matches_hint = ms
                except Exception as e:
                    if not _is_transient_jax_error(e):
                        raise
                    log.warning("mask stream failed (%s); per-chunk "
                                "path", e)
            if out is None:
                try:
                    out = self._grange.hists(None, None, mask_fn=mask_fn,
                                             device_view=dv,
                                             table_fn=table_fn)
                except Exception as e:
                    if not _is_transient_jax_error(e):
                        raise
                    log.warning("device mask failed (%s); retrying once",
                                e)
                    out = self._grange.hists(None, None, mask_fn=mask_fn,
                                             device_view=dv,
                                             table_fn=table_fn)
        if out.ndim == 2:
            # engine fell back to the full histogram (bad chunk etc.):
            # cache it so the host prefilter path reuses it (same bounded
            # eviction as the prefetch path, or a long serving session of
            # repeated fallbacks would pin every sample's sketch)
            self._hists_cache[id(sample)] = (sample, out)
            while len(self._hists_cache) > max(self._cache_cap, 3):
                self._hists_cache.pop(next(iter(self._hists_cache)))
            return None
        if g.spill_kmers.size:
            import time as _time
            _t = _time.perf_counter()
            skmers, scounts = table_fn()
            sh = self._grange._spill_hist(skmers.astype(np.uint64),
                                          scounts)
            out = out | (sh[:, 1:].sum(axis=1) > 0)
            log.debug("[timing] candidate mask: spill OR (%d spill "
                      "k-mers) %.3f s", g.spill_kmers.size,
                      _time.perf_counter() - _t)
        return out

    def hists(self, sample: SequencesSketch) -> np.ndarray:
        """[G, 64] per-genome multiplicity histograms for the batched
        prefilter — the device replacement for probing every genome."""
        if self._grange is not None:
            hit = self._hists_cache.get(id(sample))
            if hit is not None and hit[0] is sample:
                return hit[1]
            dv = getattr(sample, "_device_view", None)
            table_fn = _warm_table(sample, dv is not None)
            from ..utils.timing import stage_timer
            with stage_timer(
                    f"device grange hists ({self._grange.gidx.m} k-mers x "
                    f"{sample.kmers.size} sample k-mers)"):
                try:
                    out = self._grange.hists(None, None, device_view=dv,
                                             table_fn=table_fn)
                except Exception as e:  # transient backend/compile blip:
                    # one retry before surfacing (a relay 500 otherwise
                    # discards the whole sample's multi-minute setup).
                    # Only retry transient-looking backend failures —
                    # deterministic errors (e.g. RESOURCE_EXHAUSTED)
                    # would just re-run a multi-minute guaranteed fail.
                    if not _is_transient_jax_error(e):
                        raise
                    log.warning("device hists failed (%s); retrying once",
                                e)
                    out = self._grange.hists(None, None, device_view=dv,
                                             table_fn=table_fn)
            if self._grange_span is not None:
                from ..tpu.grange import merge_process_hists
                out = merge_process_hists(out)
            return out
        counts = self._counts(sample)
        gids = self.index.genome_ids
        G = int(self.index.n_genomes)
        m = (counts > 0) & (gids < G)
        seg = (gids[m].astype(np.int64) * 64
               + np.minimum(counts[m].astype(np.int64), 63))
        return np.bincount(seg, minlength=G * 64).reshape(G, 64)

    def genome_covs(self, genome_index: int, sample: SequencesSketch,
                    winner=None, self_group: int = -1):
        """Drop-in for engine.containment.genome_covs using device counts."""
        if self._grange is not None:
            # database-scale mode: exact counts for the few candidate
            # genomes come from the host probe (the f64 parity oracle)
            from .containment import genome_covs as host_covs
            return host_covs(self._genome_sketches[genome_index], sample,
                             winner, self_group)
        counts = self._counts(sample)
        s, e = self.offsets[genome_index], self.offsets[genome_index + 1]
        cts = counts[s:e]
        hit = cts > 0
        kmers_lost = 0
        if winner is not None:
            g = self.index
            # owner lookup on the (small) winner table stays host-side
            kmers = u64_recombine(g.hi[s:e], g.lo[s:e])
            owners = winner.owner_groups(kmers)
            owned = owners == self_group
            kmers_lost = int(np.count_nonzero(hit & ~owned))
            hit = hit & owned
        covs = cts[hit].astype(np.uint32)
        covs.sort()
        return covs, kmers_lost


def u64_recombine(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    from ..tpu.u64 import to_u64_np
    return to_u64_np(hi, lo)


def _warm_table(sample, overlap: bool):
    """() -> (sorted_kmers_u64, counts) supplier for the grange sweep.

    With ``overlap`` (device-resident sample view present), the host sort
    runs on a side thread so it overlaps the device dispatch + compute —
    the table is only consumed at the spill probe / fallback, by which
    time the sort is usually done. Without a device view the sweep needs
    the table immediately, so it's computed inline."""
    if not overlap:
        sk, sc = sample.sorted_view()
        return lambda: (sk.astype(np.uint64, copy=False), sc)
    import threading
    th = threading.Thread(target=sample.sorted_view, daemon=True)
    th.start()

    def table_fn():
        th.join()
        sk, sc = sample.sorted_view()
        return sk.astype(np.uint64, copy=False), sc
    return table_fn


def _grange_fingerprint(genome_sketches) -> str:
    """Cheap content fingerprint of a genome-sketch list: per-genome sizes
    plus three sampled k-mers per genome (first/middle/last of the sorted-
    insertion-order array). A rebuilt or swapped syldb that happens to
    match on (n_genomes, total k-mers) alone changes this with overwhelming
    probability, so a stale cached grange layout can't silently load."""
    import hashlib
    h = hashlib.sha1()
    sizes = np.array([g.genome_kmers.size for g in genome_sketches],
                     np.int64)
    h.update(sizes.tobytes())
    for g in genome_sketches:
        k = g.genome_kmers
        if k.size:
            h.update(np.asarray([k[0], k[k.size // 2], k[-1]],
                                np.uint64).tobytes())
    return h.hexdigest()[:16]


def _grange_cache_path(cache_dir: str, total: int, n_genomes: int,
                       fp: str = "") -> str:
    nt = os.environ.get("SYLPH_NT", "auto")
    tag = f"_{fp}" if fp else ""
    return os.path.join(cache_dir,
                        f"grange_{n_genomes}_{total}{tag}_nt{nt}")


def _grange_cache_load(cache_dir: str, total: int, n_genomes: int,
                       fp: str = ""):
    """Disk-cached grange layout (opt-in via SYLPH_GRANGE_CACHE: a rebuild
    of a 10^8-k-mer database costs 10-20 min of host time; the cache key
    is (genome count, total k-mers, content fingerprint, layout), so a
    swapped database with matching counts rebuilds instead of loading a
    stale layout)."""
    d = _grange_cache_path(cache_dir, total, n_genomes, fp)
    meta_p = os.path.join(d, "meta.npz")
    if not os.path.exists(meta_p):
        return None
    from ..tpu.grange import GRangeIndex
    meta = np.load(meta_p)
    n_chunks = int(meta["n_chunks"])
    log.debug("grange layout loaded from cache %s", d)
    return GRangeIndex(
        [np.load(os.path.join(d, f"hi{i}.npy")) for i in range(n_chunks)],
        [np.load(os.path.join(d, f"lo{i}.npy")) for i in range(n_chunks)],
        [np.load(os.path.join(d, f"gid{i}.npy")) for i in range(n_chunks)],
        meta["bases"], meta["edges"], int(meta["width"]), int(meta["B"]),
        int(meta["CI"]), meta["spill_kmers"], meta["spill_gids"],
        int(meta["m"]), n_genomes, nt=int(meta["nt"]), ov=int(meta["ov"]),
        heavy_gids=meta["heavy_gids"], heavy_ptr=meta["heavy_ptr"])


def _grange_cache_save(cache_dir: str, total: int, n_genomes: int, gidx,
                       fp: str = ""):
    d = _grange_cache_path(cache_dir, total, n_genomes, fp)
    os.makedirs(d, exist_ok=True)
    np.savez(os.path.join(d, "meta.npz"),
             n_chunks=len(gidx.chunk_hi), bases=gidx.bases,
             edges=gidx.edges_u64, width=gidx.width, B=gidx.B, CI=gidx.CI,
             spill_kmers=gidx.spill_kmers, spill_gids=gidx.spill_gids,
             m=gidx.m, nt=gidx.nt, ov=gidx.ov, heavy_gids=gidx.heavy_gids,
             heavy_ptr=gidx.heavy_ptr)
    for i in range(len(gidx.chunk_hi)):
        np.save(os.path.join(d, f"hi{i}.npy"), gidx.chunk_hi[i])
        np.save(os.path.join(d, f"lo{i}.npy"), gidx.chunk_lo[i])
        np.save(os.path.join(d, f"gid{i}.npy"), gidx.chunk_gid[i])
    log.debug("grange layout cached to %s", d)
