"""query/profile orchestration.

Behavioral spec: sylph ``contain`` (src/contain.rs:115-351) and its helpers
``get_genome_sketches`` (:482-542), ``get_seq_sketch`` (:544-599),
``get_stats`` (:601-814). Sample processing order is deterministic here
(input order) where the reference's rayon scheduling makes inter-sample
output order nondeterministic; per-sample row content is identical.
"""

import logging
import math
import os
import sys
from dataclasses import dataclass, field
from typing import List, Optional, TextIO


from ..constants import (DEFAULT_C, DEFAULT_K, DEFAULT_MIN_COUNT_CORRECT,
                         DEFAULT_MIN_NUMBER_KMERS, DEFAULT_MIN_SPACING,
                         DEFAULT_REDUNDANT_ANI, MIN_ANI_DEF, MIN_ANI_P_DEF,
                         QUERY_FILE_SUFFIX_VALID, SAMPLE_FILE_SUFFIX_VALID)
from ..core.sketch_genomes import sketch_genome, sketch_genome_individual
from ..core.sketch_reads import sketch_pair_sequences, sketch_sequences
from ..core.types import AniResult, GenomeSketch, SequencesSketch
from ..io import sylformat
from ..io.fastx import is_fasta, is_fastq
from ..stats.contain_stats import StatParams, coverage_stats
from .containment import WinnerTable, genome_covs
from .output import print_ani_result, print_header
from .profile import (assign_groups, derep_if_reassign_threshold,
                      estimate_covered_bases, estimate_true_cov,
                      get_kmer_identity, winner_table)

log = logging.getLogger("sylph")


@dataclass
class ContainOptions:
    """Mirrors ContainArgs (sylph src/cmdline.rs:85-164)."""
    files: List[str] = field(default_factory=list)
    file_list: Optional[str] = None
    min_count_correct: float = DEFAULT_MIN_COUNT_CORRECT
    min_number_kmers: float = DEFAULT_MIN_NUMBER_KMERS
    minimum_ani: Optional[float] = None
    threads: int = 3
    sample_threads: Optional[int] = None
    estimate_unknown: bool = False
    seq_id: Optional[float] = None
    redundant_ani: float = DEFAULT_REDUNDANT_ANI
    reads: List[str] = field(default_factory=list)
    first_pair: List[str] = field(default_factory=list)
    second_pair: List[str] = field(default_factory=list)
    c: int = DEFAULT_C
    k: int = DEFAULT_K
    individual: bool = False
    min_spacing_kmer: int = DEFAULT_MIN_SPACING
    out_file_name: Optional[str] = None
    log_reassignments: bool = False
    pseudotax: bool = False
    estimator: str = "ratio"   # ratio|mme|nb|mle (hidden flags)
    no_ci: bool = False
    no_adj: bool = False
    mean_coverage: bool = False
    tpu: bool = False          # route containment through the device engine
    profile_trace: Optional[str] = None  # jax.profiler trace output dir


def sample_parallelism_step(pseudotax: bool, threads: int,
                            sample_threads: Optional[int],
                            num_raw_read_files: int) -> int:
    """Concurrent-sample worker count (sylph src/contain.rs:239-256).

    The reference counts RAW read files only (pre-sketched .sylsp samples
    are cheap to load and don't justify extra workers); profile floors at
    threads/3+1 so the nested per-genome parallelism keeps 2/3 of the pool.
    """
    if sample_threads is not None:
        return sample_threads if sample_threads > 0 else 1
    if pseudotax:
        return max(threads // 3 + 1, min(num_raw_read_files, threads))
    return max(1, min(num_raw_read_files, threads))


def _stat_params(opts: ContainOptions, k: int) -> StatParams:
    return StatParams(k=k, min_count_correct=opts.min_count_correct,
                      estimator=opts.estimator, no_ci=opts.no_ci,
                      no_adj=opts.no_adj, mean_coverage=opts.mean_coverage)


def get_stats(opts: ContainOptions, genome: GenomeSketch, genome_index: int,
              sample: SequencesSketch, winner: Optional[WinnerTable] = None,
              self_group: int = -1,
              log_reassign: bool = False,
              device_engine=None,
              covs_kl=None) -> Optional[AniResult]:
    """Engine half of sylph get_stats (src/contain.rs:601-814).

    ``covs_kl``: precomputed (covs, kmers_lost) from genome_covs_batch —
    the profile passes probe all candidates in one batch."""
    if genome.k != sample.k:
        log.error("k parameter for reads %s != k parameter for genome %s",
                  sample.k, genome.k)
        raise SystemExit(1)
    if genome.c < sample.c:
        log.error("c parameter for reads %s > c parameter for genome %s",
                  sample.c, genome.c)
        raise SystemExit(1)
    n_kmers = int(genome.genome_kmers.size)
    if float(n_kmers) < opts.min_number_kmers:
        return None
    if covs_kl is not None:
        covs, kmers_lost = covs_kl
    elif device_engine is not None:
        covs, kmers_lost = device_engine.genome_covs(
            genome_index, sample, winner, self_group)
    else:
        covs, kmers_lost = genome_covs(genome, sample, winner, self_group)
    if covs.size == 0:
        return None
    min_ani = (opts.minimum_ani / 100.0 if opts.minimum_ani is not None
               else (MIN_ANI_P_DEF if opts.pseudotax else MIN_ANI_DEF))
    # profiling pass 1 (winner None): its CI columns are never printed —
    # only pass-2 rows reach the TSV (derep returns results_new,
    # src/contain.rs:308,353-375) — and each bootstrap reseeds wyrand(7),
    # so skipping them changes no downstream number while halving the
    # per-candidate statistics cost at database scale
    st = coverage_stats(covs, n_kmers, _stat_params(opts, genome.k),
                        min_ani,
                        run_ci_if_pass=not (opts.pseudotax
                                            and winner is None))
    if st is None:
        if winner is not None and log_reassign:
            log.info(
                "Genome/contig %s/%s dropped below ANI threshold after "
                "reassigning %d k-mers (%d contained k-mers after reassign)",
                genome.file_name, genome.first_contig_name, kmers_lost,
                int(covs.size))
        return None
    seq_name = (sample.sample_name if sample.sample_name is not None
                else sample.file_name)
    return AniResult(
        naive_ani=st.naive_ani,
        final_est_ani=st.final_est_ani,
        final_est_cov=st.final_est_cov,
        seq_name=seq_name,
        gn_name=genome.file_name,
        contig_name=genome.first_contig_name,
        mean_cov=st.mean_cov,
        median_cov=st.median_cov,
        containment_index=(int(covs.size), n_kmers),
        lam=st.lam,
        ani_ci=st.ani_ci,
        lambda_ci=st.lambda_ci,
        genome_sketch=genome,
        genome_index=genome_index,
        kmers_lost=kmers_lost if winner is not None else None,
    )


def _classify_files(opts: ContainOptions):
    """src/contain.rs:149-223."""
    all_files = list(opts.files)
    if opts.file_list:
        with open(opts.file_list) as f:
            all_files.extend(line.rstrip("\n") for line in f)
    genome_sketch_files, genome_files = [], []
    read_sketch_files, read_files = [], []
    for f in all_files:
        if any(f.endswith(s) for s in QUERY_FILE_SUFFIX_VALID):
            genome_sketch_files.append(f)
        elif any(f.endswith(s) for s in SAMPLE_FILE_SUFFIX_VALID):
            read_sketch_files.append(f)
        elif is_fasta(f):
            genome_files.append(f)
        elif is_fastq(f):
            read_files.append([f])
        else:
            log.warning("%s file extension is not a sketch or a fasta/fastq "
                        "file.", f)
    if len(opts.first_pair) != len(opts.second_pair):
        log.error("Different number of paired sequences (-1, -2) for "
                  "sketching. Exiting.")
        raise SystemExit(1)
    for a, b in zip(opts.first_pair, opts.second_pair):
        read_files.append([a, b])
    for r in opts.reads:
        read_files.append([r])
    return genome_sketch_files, genome_files, read_sketch_files, read_files


_SKETCH_CACHE = {}      # db fingerprint -> List[GenomeSketch] (opt-in)


def _get_genome_sketches(opts: ContainOptions, genome_sketch_files,
                         genome_files) -> List[GenomeSketch]:
    """src/contain.rs:482-542.

    Under SYLPH_TPU_CACHE_INDEX=1 (the serving scenario, see
    _device_engine_for) the PARSED sketch list is cached alongside the
    device index: re-reading a GTDB-scale syldb costs seconds per call
    even page-warm, and the sketches are immutable once loaded."""
    serving = (os.environ.get("SYLPH_TPU_CACHE_INDEX") == "1"
               and genome_sketch_files and not genome_files)
    if serving:
        key = tuple(sorted(
            (os.path.abspath(p), os.path.getmtime(p), os.path.getsize(p))
            for p in genome_sketch_files))
        hit = _SKETCH_CACHE.get(key)
        if hit is not None:
            return hit
    max_genome_c = None   # reference's 'lowest_genome_c' actually tracks max
    current_k = None
    sketches: List[GenomeSketch] = []
    for path in genome_sketch_files:
        try:
            vec = sylformat.read_syldb(path)
        except (OSError, sylformat.SketchFormatError):
            log.error("The sketch `%s` is not a valid sketch. Perhaps it is "
                      "an older, incompatible version ", path)
            raise SystemExit(1)
        if not vec:
            continue
        c = vec[0].c
        k = vec[0].k
        if max_genome_c is None or max_genome_c < c:
            max_genome_c = c
        if current_k is None:
            current_k = k
        elif current_k != k:
            log.error("Query sketches have inconsistent -k. Exiting.")
            raise SystemExit(1)
        sketches.extend(vec)
    for path in genome_files:
        if max_genome_c is not None and max_genome_c < opts.c:
            log.error("Value of -c for contain is %s -- greater than the "
                      "smallest value of -c for a genome sketch %s. "
                      "Continuing without sketching.", opts.c, max_genome_c)
        elif current_k is not None and current_k != opts.k:
            log.error("-k %s is not equal to -k %s found in sketches. "
                      "Continuing without sketching.", opts.k, current_k)
        elif opts.individual:
            sketches.extend(sketch_genome_individual(
                opts.c, opts.k, path, opts.min_spacing_kmer, opts.pseudotax))
        else:
            g = sketch_genome(opts.c, opts.k, path, opts.min_spacing_kmer,
                              opts.pseudotax)
            if g is not None:
                sketches.append(g)
    if serving:
        _SKETCH_CACHE.clear()          # hold at most one resident db
        _SKETCH_CACHE[key] = sketches
    return sketches


def _get_seq_sketch(opts: ContainOptions, read_file: List[str],
                    is_sketch: bool, genome_c: int,
                    genome_k: int,
                    streamer=None) -> Optional[SequencesSketch]:
    """src/contain.rs:544-599."""
    if is_sketch:
        path = read_file[0]
        try:
            sk = sylformat.read_sylsp(path)
        except (OSError, sylformat.SketchFormatError):
            log.error("The sketch `%s` is not a valid sketch. Perhaps it is "
                      "an older incompatible version ", path)
            raise SystemExit(1)
        if sk.c > genome_c:
            log.error("%s value of -c is %s; this is greater than the "
                      "smallest value of -c = %s for a genome sketch. "
                      "Exiting.", path, sk.c, genome_c)
            return None
        if sk.c < genome_c:
            log.info("%s value of -c for reads is %s; this is smaller than "
                     "the -c for a genome sketch. Using the larger -c %s "
                     "instead.", path, sk.c, genome_c)
        return sk
    if genome_c < opts.c:
        log.error("%s error: value of -c for contain = %s -- greater than "
                  "the smallest value of -c for a genome sketch = %s. "
                  "Continuing without sketching.", read_file[0], opts.c,
                  genome_c)
        return None
    if genome_k != opts.k:
        log.error("%s -k %s is not equal to -k %s found in sketches. "
                  "Continuing without sketching.", read_file[0], opts.k,
                  genome_k)
        return None
    if len(read_file) == 1:
        return sketch_sequences(read_file[0], opts.c, opts.k, None, False,
                                device=opts.tpu,
                                on_segment=(streamer.push
                                            if streamer is not None
                                            else None))
    # on-the-fly paired sketching uses DEFAULT_FPR like the reference
    # (src/contain.rs:591)
    from ..constants import DEFAULT_FPR
    return sketch_pair_sequences(read_file[0], read_file[1], opts.c, opts.k,
                                 None, False, fpr=DEFAULT_FPR,
                                 on_segment=(streamer.push
                                             if streamer is not None
                                             else None),
                                 device=opts.tpu)


def process_sample(opts: ContainOptions, sample: SequencesSketch,
                   genome_sketches: List[GenomeSketch],
                   device_engine=None) -> List[AniResult]:
    """One sample vs all genomes (body of src/contain.rs:267-339)."""
    first_read_file = sample.file_name
    from ..utils.timing import stage_timer
    if opts.seq_id is not None:
        kmer_id_opt = math.pow(opts.seq_id / 100.0, float(sample.k))
    else:
        with stage_timer("kmer identity estimate"):
            kmer_id_opt = get_kmer_identity(sample, opts.estimate_unknown)
        if kmer_id_opt is not None:
            log.debug("%s has estimated identity %.3f.", first_read_file,
                      math.pow(kmer_id_opt, 1.0 / sample.k) * 100.0)

    from .prefilter import prefilter_candidates
    with stage_timer("pass-1 prefilter"):
        candidates = prefilter_candidates(opts, sample, genome_sketches,
                                          device_engine)
    if candidates is None:
        candidate_iter = enumerate(genome_sketches)
    else:
        # the prefilter skips get_stats' per-genome k/c compatibility
        # checks for dropped genomes — run them upfront so incompatible
        # databases still fail loudly (src/contain.rs:603-622)
        for g in genome_sketches:
            if g.k != sample.k:
                log.error("k parameter for reads %s != k parameter for "
                          "genome %s", sample.k, g.k)
                raise SystemExit(1)
            if g.c < sample.c:
                log.error("c parameter for reads %s > c parameter for "
                          "genome %s", sample.c, g.c)
                raise SystemExit(1)
        log.debug("%s: batched prefilter kept %d/%d genomes for the exact "
                  "statistics pass.", first_read_file, candidates.size,
                  len(genome_sketches))
        candidate_iter = ((int(i), genome_sketches[int(i)])
                          for i in candidates)
    def _host_probe(engine):
        return engine is None or getattr(engine, "_grange", None) \
            is not None

    def _batchable(genomes):
        # cap the concat: an unfiltered 100k-genome query would
        # materialize the whole database's k-mers
        return (1 < len(genomes)
                and sum(g.genome_kmers.size for g in genomes) <= (1 << 26))

    def _stats_map(fn, n_items):
        """Order-preserving map over per-genome get_stats calls,
        threaded like the reference's nested genome par_iter
        (src/contain.rs:284-292) when the pool is worth it — the
        bootstrap's big vectorized numpy ops drop the GIL."""
        if n_items < 8 or opts.threads <= 1 or opts.log_reassignments \
                or not _host_probe(device_engine):
            # non-grange device engines serve counts from a per-sample
            # cache filled on first use — keep those single-threaded so
            # parallel first calls can't dispatch duplicate joins
            return [fn(j) for j in range(n_items)]
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=min(opts.threads, 8)) as ex:
            return list(ex.map(fn, range(n_items)))

    candidate_list = list(candidate_iter)
    results = []
    with stage_timer("pass-1 exact stats"):
        batch = None
        if _host_probe(device_engine) \
                and _batchable([g for _, g in candidate_list]):
            from .containment import genome_covs_batch
            batch = genome_covs_batch([g for _, g in candidate_list],
                                      sample)

        def one1(j):
            i, g = candidate_list[j]
            return get_stats(opts, g, i, sample, None, -1,
                             opts.log_reassignments, device_engine,
                             covs_kl=batch[j] if batch is not None
                             else None)

        for r in _stats_map(one1, len(candidate_list)):
            if r is not None:
                results.append(r)
    estimate_true_cov(results, kmer_id_opt, opts.estimate_unknown,
                      sample.mean_read_length, sample.k)

    if opts.pseudotax:
        log.info("%s taxonomic profiling; reassigning k-mers for %d "
                 "genomes...", first_read_file, len(results))
        with stage_timer("winner table"):
            winner = winner_table(results, opts.log_reassignments)
        groups = assign_groups(results)
        results2 = []
        with stage_timer("pass-2 reassigned stats"):
            batch2 = None
            if _host_probe(device_engine) \
                    and _batchable([r.genome_sketch for r in results]):
                from .containment import genome_covs_batch
                with stage_timer("pass-2 batched probes"):
                    batch2 = genome_covs_batch(
                        [r.genome_sketch for r in results], sample,
                        winner, list(groups))
            with stage_timer("pass-2 per-genome stats",
                             items=len(results)):
                groups_l = list(groups)

                def one2(j):
                    r = results[j]
                    return get_stats(opts, r.genome_sketch,
                                     r.genome_index, sample, winner,
                                     groups_l[j],
                                     opts.log_reassignments,
                                     device_engine,
                                     covs_kl=(batch2[j]
                                              if batch2 is not None
                                              else None))

                for r2 in _stats_map(one2, len(results)):
                    if r2 is not None:
                        results2.append(r2)
        results = derep_if_reassign_threshold(results, results2,
                                              opts.redundant_ani, sample.k)
        estimate_true_cov(results, kmer_id_opt, opts.estimate_unknown,
                          sample.mean_read_length, sample.k)
        log.info("%s has %d genomes passing profiling threshold. ",
                 first_read_file, len(results))
        bases_explained = 1.0
        if opts.estimate_unknown:
            bases_explained = estimate_covered_bases(
                results, sample, sample.mean_read_length, sample.k)
            log.info("%s has %.2f%% of reads detected in database by "
                     "profile", first_read_file, bases_explained * 100.0)
        total_cov = sum(r.final_est_cov for r in results)
        total_seq_cov = sum(r.final_est_cov * float(r.genome_sketch.gn_size)
                            for r in results)
        for r in results:
            r.rel_abund = r.final_est_cov / total_cov * 100.0
        for r in results:
            r.seq_abund = (r.final_est_cov * float(r.genome_sketch.gn_size)
                           / total_seq_cov * 100.0 * bases_explained)
        results.sort(key=lambda r: -r.rel_abund)
    else:
        results.sort(key=lambda r: -r.final_est_ani)
    return results


_ENGINE_CACHE = {}      # db fingerprint -> DeviceContainment (opt-in)


def _device_engine_for(genome_sketch_files, genome_files,
                       genome_sketches):
    """DeviceContainment for this database, optionally reused across
    contain() calls in one process (SYLPH_TPU_CACHE_INDEX=1 — the serving
    scenario: repeated library/bench invocations against one database skip
    the index build + device upload, like a resident daemon would; CLI
    processes are one-shot so the default stays reference-faithful).
    Raw fasta inputs are sketched in-call and not fingerprinted, so they
    bypass the cache."""
    from .device_exec import DeviceContainment
    if (os.environ.get("SYLPH_TPU_CACHE_INDEX") != "1"
            or genome_files or not genome_sketch_files):
        return DeviceContainment(genome_sketches)
    key = tuple(sorted(
        (os.path.abspath(p), os.path.getmtime(p), os.path.getsize(p))
        for p in genome_sketch_files))
    if key not in _ENGINE_CACHE:
        _ENGINE_CACHE.clear()          # hold at most one resident index
        _ENGINE_CACHE[key] = DeviceContainment(genome_sketches)
    return _ENGINE_CACHE[key]


def _secondary_process(opts: ContainOptions) -> bool:
    """True on non-zero processes of a multi-host (jax.distributed)
    session: every process runs the identical pipeline — the device
    engine splits chunk ownership and merges histograms, so all
    downstream statistics (and rows) are the same on every host — and
    only process 0 writes the TSV."""
    if not opts.tpu:
        return False
    try:
        import jax
        return jax.process_count() > 1 and jax.process_index() != 0
    except Exception:
        return False


def contain(opts: ContainOptions, pseudotax: bool,
            out: Optional[TextIO] = None):
    """Entry point for query (pseudotax=False) / profile (pseudotax=True)."""
    from ..utils.threads import set_thread_budget
    set_thread_budget(opts.threads)
    if pseudotax:
        opts.pseudotax = True
    close_out = False
    if out is None:
        if opts.out_file_name and not _secondary_process(opts):
            out = open(opts.out_file_name, "w")
            close_out = True
        else:
            out = sys.stdout
    if _secondary_process(opts):
        out = open(os.devnull, "w")
        close_out = True

    log.info("Obtaining sketches...")
    (genome_sketch_files, genome_files, read_sketch_files,
     read_files) = _classify_files(opts)

    if not genome_sketch_files and not genome_files:
        log.error("No genome files found; see sylph query/profile -h for "
                  "help. Exiting")
        raise SystemExit(1)
    if not read_sketch_files and not read_files:
        log.error("No read files found; see sylph query/profile -h for "
                  "help. Exiting")
        raise SystemExit(1)

    genome_sketches = _get_genome_sketches(opts, genome_sketch_files,
                                           genome_files)
    log.info("Finished obtaining genome sketches.")
    if not genome_sketches:
        log.error("No genome sketches found; see sylph query/profile -h for "
                  "help. Exiting")
        raise SystemExit(1)
    if (genome_sketches[0].pseudotax_tracked_nonused_kmers is None
            and opts.pseudotax):
        log.error("Attempting profiling, but *.syldb was sketched with the "
                  "--disable-profiling option. Exiting")
        raise SystemExit(1)

    device_engine = None
    if opts.tpu:
        from .device_exec import DeviceContainment, device_available
        if device_available():
            import jax
            device_engine = _device_engine_for(genome_sketch_files,
                                               genome_files,
                                               genome_sketches)
            log.info("Containment runs on %d device(s).",
                     len(jax.devices()))
        else:
            log.warning("--tpu requested but no JAX device available; "
                        "falling back to the host engine.")

    all_samples = read_files + [[f] for f in read_sketch_files]
    n_raw = len(read_files)
    print_header(opts.pseudotax, out, opts.estimate_unknown)
    # sample-level parallelism mirrors the reference's chunked par_iter
    # (src/contain.rs:239-256, 266-267). The device engine instead batches
    # groups of samples through ONE vmapped containment join per index
    # chunk (DeviceContainment.prefetch) and emits results in order.
    if device_engine is not None:
        step = 1
    else:
        step = sample_parallelism_step(opts.pseudotax, opts.threads,
                                       opts.sample_threads, n_raw)

    def load(item):
        j, rf = item
        is_sketch = j >= n_raw
        streamer = None
        if device_engine is not None and not is_sketch and len(rf) <= 2:
            streamer = device_engine.sample_streamer()
        sk = None
        try:
            with stage_timer(f"load/sketch sample {rf[0]}"):
                sk = _get_seq_sketch(opts, rf, is_sketch,
                                     genome_sketches[0].c,
                                     genome_sketches[0].k,
                                     streamer=streamer)
        finally:
            if streamer is not None:
                if sk is not None:
                    view = streamer.finalize(sk.kmers, sk.counts)
                    if view is not None:
                        sk._device_view = view
                else:
                    streamer.close()
        return rf, sk

    def process(rf, sample):
        if sample is None:
            return rf, None
        with stage_timer(f"process sample {rf[0]}",
                         items=len(genome_sketches)):
            results = process_sample(opts, sample, genome_sketches,
                                     device_engine)
        return rf, results

    def handle(item):
        return process(*load(item))

    def device_batched(items):
        """Groups of samples share one vmapped device join; output order
        is preserved (multi-sample batching through the CLI). Groups are
        DOUBLE-BUFFERED: group i+1's loads/sketches run on the host pool
        while group i's device joins and statistics execute, so the
        device no longer idles through every group's ingest (the same
        overlap the grange chunk loop uses for uploads)."""
        from concurrent.futures import ThreadPoolExecutor
        # grange serving (per-sample streamed device views): the host
        # ingest dominates and its internal pools already use every
        # core, so concurrent sample loads only thrash — pipeline at
        # depth 1 instead (load sample i+1 while sample i's device join
        # + statistics run). Other regimes batch 8 for the vmapped join.
        env_b = os.environ.get("SYLPH_COHORT_DEPTH")
        serves = getattr(device_engine, "serves_streams",
                         lambda: False)()
        B = int(env_b) if env_b else (1 if serves else 8)
        groups = [items[i:i + B] for i in range(0, len(items), B)]
        if not groups:
            return
        with ThreadPoolExecutor(
                max_workers=max(1, min(opts.threads, B))) as lex:
            pend = [lex.submit(load, it) for it in groups[0]]
            for gi, grp in enumerate(groups):
                cur = [f.result() for f in pend]
                pend = ([lex.submit(load, it) for it in groups[gi + 1]]
                        if gi + 1 < len(groups) else [])
                samples = [s for _, s in cur if s is not None]
                if len(samples) > 1:
                    device_engine.prefetch(samples)
                for rf, sample in cur:
                    yield process(rf, sample)

    from ..utils.timing import maybe_profile, stage_timer
    with maybe_profile(opts.profile_trace):
        items = list(enumerate(all_samples))
        if device_engine is not None and len(items) > 1:
            outputs = device_batched(items)
        elif step == 1 or len(items) <= 1:
            outputs = map(handle, items)
        else:
            from concurrent.futures import ThreadPoolExecutor
            ex = ThreadPoolExecutor(max_workers=step)
            outputs = ex.map(handle, items)
        for rf, results in outputs:
            if results is not None:
                for r in results:
                    print_ani_result(r, opts.pseudotax, out)
                out.flush()
            if len(rf) > 1:
                log.info("Finished paired sample %s.", rf[0])
            else:
                log.info("Finished sample %s.", rf[0])
        if step > 1 and len(items) > 1:
            ex.shutdown()
    log.info("sylph finished.")
    if close_out:
        out.close()


def serve(opts: ContainOptions, pseudotax: bool,
          out: Optional[TextIO] = None,
          in_stream: Optional[TextIO] = None):
    """Resident-index serving loop (``sylph profile/query --serve``).

    Loads the database and builds/uploads the device index ONCE, then
    reads sample requests from ``in_stream`` (default stdin) — one per
    line: a read-file or .sylsp path, or two whitespace-separated paths
    for a read pair. Each request's TSV rows are written and flushed
    before the next line is read, so a driving process can pipeline
    samples against the warm index. This is the first-class surface for
    the warm-serving scenario SYLPH_TPU_CACHE_INDEX enables across
    library calls (reference counterpart: the resident-DB chunked sample
    loop, src/contain.rs:239-256 — amortized here across requests
    instead of across one invocation's file list). A bad request logs
    and continues; EOF ends the loop."""
    from ..utils.threads import set_thread_budget
    from ..utils.timing import stage_timer
    set_thread_budget(opts.threads)
    if pseudotax:
        opts.pseudotax = True
    close_out = False
    if out is None:
        if opts.out_file_name and not _secondary_process(opts):
            out = open(opts.out_file_name, "w")
            close_out = True
        else:
            out = sys.stdout
    if _secondary_process(opts):
        out = open(os.devnull, "w")
        close_out = True
    if in_stream is None:
        in_stream = sys.stdin

    log.info("Obtaining sketches...")
    (genome_sketch_files, genome_files, read_sketch_files,
     read_files) = _classify_files(opts)
    if not genome_sketch_files and not genome_files:
        log.error("No genome files found; see sylph query/profile -h for "
                  "help. Exiting")
        raise SystemExit(1)
    genome_sketches = _get_genome_sketches(opts, genome_sketch_files,
                                           genome_files)
    log.info("Finished obtaining genome sketches.")
    if not genome_sketches:
        log.error("No genome sketches found; see sylph query/profile -h "
                  "for help. Exiting")
        raise SystemExit(1)
    if (genome_sketches[0].pseudotax_tracked_nonused_kmers is None
            and opts.pseudotax):
        log.error("Attempting profiling, but *.syldb was sketched with the "
                  "--disable-profiling option. Exiting")
        raise SystemExit(1)

    device_engine = None
    if opts.tpu:
        from .device_exec import device_available
        if device_available():
            import jax
            device_engine = _device_engine_for(genome_sketch_files,
                                               genome_files,
                                               genome_sketches)
            log.info("Containment runs on %d device(s).",
                     len(jax.devices()))
        else:
            log.warning("--tpu requested but no JAX device available; "
                        "falling back to the host engine.")

    print_header(opts.pseudotax, out, opts.estimate_unknown)

    def one(rfiles: List[str], is_sketch: bool) -> None:
        streamer = None
        if device_engine is not None and not is_sketch \
                and len(rfiles) <= 2:
            streamer = device_engine.sample_streamer()
        sk = None
        try:
            with stage_timer(f"load/sketch sample {rfiles[0]}"):
                sk = _get_seq_sketch(opts, rfiles, is_sketch,
                                     genome_sketches[0].c,
                                     genome_sketches[0].k,
                                     streamer=streamer)
        finally:
            if streamer is not None:
                if sk is not None:
                    view = streamer.finalize(sk.kmers, sk.counts)
                    if view is not None:
                        sk._device_view = view
                else:
                    streamer.close()
        if sk is None:
            return
        with stage_timer(f"process sample {rfiles[0]}",
                         items=len(genome_sketches)):
            results = process_sample(opts, sk, genome_sketches,
                                     device_engine)
        for r in results:
            print_ani_result(r, opts.pseudotax, out)
        out.flush()
        log.info("Finished %ssample %s.",
                 "paired " if len(rfiles) > 1 else "", rfiles[0])

    log.info("Serving: reading sample paths from stdin "
             "(one per line; two paths = read pair).")
    # samples given up front (argv) serve first, then the request stream
    queued = ([(rf, False) for rf in read_files]
              + [([f], True) for f in read_sketch_files])
    for rfiles, is_sketch in queued:
        one(rfiles, is_sketch)
    for line in in_stream:
        parts = line.split()
        if not parts:
            continue
        if len(parts) > 2:
            log.error("serve: expected 1 or 2 paths per line, got %d "
                      "(%r); skipping.", len(parts), line.strip())
            continue
        is_sketch = (len(parts) == 1 and any(
            parts[0].endswith(s) for s in SAMPLE_FILE_SUFFIX_VALID))
        try:
            one(parts, is_sketch)
        except SystemExit as e:      # per-sample fatal (bad sketch file):
            log.error("serve: sample %s failed (exit %s); continuing.",
                      parts[0], e.code)
        except Exception:
            log.exception("serve: sample %s failed; continuing.",
                          parts[0])
    log.info("sylph serve finished.")
    if close_out:
        out.close()
