"""Command-line interface: ``sylph {sketch, profile, query, inspect}``.

Flag schema mirrors the reference CLI (sylph src/cmdline.rs) including the
hidden/vestigial flags; ``query`` and ``profile`` share one code path with a
pseudotax switch (src/main.rs:24-31).
"""

import argparse
import logging
import os
import sys

from .engine.inspect_cmd import InspectOptions, inspect
from .engine.runner import ContainOptions, contain
from .engine.sketch_cmd import SketchOptions, sketch


def _setup_logging(trace: bool = False, debug: bool = False):
    level = (logging.DEBUG - 5 if trace
             else logging.DEBUG if debug else logging.INFO)
    logging.basicConfig(
        stream=sys.stderr, level=level,
        format="%(asctime)s %(levelname)s [%(name)s] %(message)s",
        datefmt="%Y-%m-%dT%H:%M:%SZ", force=True)


def _add_sketch(sub):
    p = sub.add_parser(
        "sketch", help="Sketch sequences into samples (reads) and databases "
        "(genomes). Each sample.fq -> sample.sylsp. All *.fa -> *.syldb.")
    p.add_argument("files", nargs="*", help="fasta/fastq files; gzip "
                   "optional. fastq -> sample sketch (*.sylsp), fasta -> "
                   "database (*.syldb).")
    p.add_argument("-o", "--out-name-db", dest="db_out_name",
                   default="database")
    p.add_argument("-d", "--sample-output-directory",
                   dest="sample_output_dir", default="./")
    p.add_argument("-i", "--individual-records", dest="individual",
                   action="store_true")
    p.add_argument("-r", "--reads", nargs="+", default=None)
    p.add_argument("-g", "--genomes", nargs="+", default=None)
    p.add_argument("-l", "--list", dest="list_sequence", default=None)
    p.add_argument("--rl", dest="list_reads", default=None)
    p.add_argument("--gl", dest="list_genomes", default=None)
    p.add_argument("--l1", dest="list_first_pair", default=None)
    p.add_argument("--l2", dest="list_second_pair", default=None)
    p.add_argument("--lS", dest="list_sample_names", default=None)
    p.add_argument("-S", "--sample-names", dest="sample_names", nargs="+",
                   default=None)
    p.add_argument("-k", type=int, default=31)
    p.add_argument("-c", type=int, default=200)
    p.add_argument("-t", dest="threads", type=int, default=3)
    p.add_argument("--ram-barrier", dest="max_ram", type=int, default=None)
    p.add_argument("--trace", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--no-dedup", dest="no_dedup", action="store_true")
    p.add_argument("--disable-profiling", dest="no_pseudotax",
                   action="store_true")
    p.add_argument("--min-spacing", dest="min_spacing_kmer", type=int,
                   default=30)
    p.add_argument("--fpr", type=float, default=0.0001)
    p.add_argument("-1", "--first-pairs", dest="first_pair", nargs="+",
                   default=[])
    p.add_argument("-2", "--second-pairs", dest="second_pair", nargs="+",
                   default=[])
    p.add_argument("--tpu", action="store_true",
                   help="run k-mer extraction on the attached JAX device; "
                   "sketches are bit-identical to the host path")
    return p


def _add_contain(sub, name, helptext):
    p = sub.add_parser(name, help=helptext)
    p.add_argument("files", nargs="*")
    p.add_argument("-l", "--list", dest="file_list", default=None)
    p.add_argument("--min-count-correct", type=float, default=3.0,
                   dest="min_count_correct")
    p.add_argument("-M", "--min-number-kmers", type=float, default=50.0,
                   dest="min_number_kmers")
    p.add_argument("-m", "--minimum-ani", type=float, default=None,
                   dest="minimum_ani")
    p.add_argument("-t", dest="threads", type=int, default=3)
    p.add_argument("-s", "--sample-threads", dest="sample_threads", type=int,
                   default=None)
    p.add_argument("--trace", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("-u", "--estimate-unknown", dest="estimate_unknown",
                   action="store_true")
    p.add_argument("-I", "--read-seq-id", dest="seq_id", type=float,
                   default=None)
    p.add_argument("-R", "--redundancy-threshold", dest="redundant_ani",
                   type=float, default=99.0)
    p.add_argument("-r", "--reads", nargs="+", default=[])
    p.add_argument("-1", "--first-pairs", dest="first_pair", nargs="+",
                   default=[])
    p.add_argument("-2", "--second-pairs", dest="second_pair", nargs="+",
                   default=[])
    p.add_argument("-c", type=int, default=200)
    p.add_argument("-k", type=int, default=31)
    p.add_argument("-i", "--individual-records", dest="individual",
                   action="store_true")
    p.add_argument("--min-spacing", dest="min_spacing_kmer", type=int,
                   default=30)
    p.add_argument("-o", "--output-file", dest="out_file_name", default=None)
    p.add_argument("--log-reassignments", dest="log_reassignments",
                   action="store_true")
    p.add_argument("-p", "--pseudotax", dest="pseudotax",
                   action="store_true")
    p.add_argument("--ratio", action="store_true")
    p.add_argument("--mme", action="store_true")
    p.add_argument("--mle", action="store_true")
    p.add_argument("--nb", action="store_true")
    p.add_argument("--no-ci", dest="no_ci", action="store_true")
    p.add_argument("--no-adjust", dest="no_adj", action="store_true")
    p.add_argument("--mean-coverage", dest="mean_coverage",
                   action="store_true")
    p.add_argument("--tpu", action="store_true",
                   help="run the containment join on the attached JAX "
                   "device (TPU); output is bit-identical to the host "
                   "engine")
    p.add_argument("--profile-trace", dest="profile_trace", default=None,
                   metavar="DIR",
                   help="write a jax.profiler trace of the run to DIR")
    p.add_argument("--serve", action="store_true",
                   help="serving mode: load the database (and build the "
                   "--tpu device index) once, then read sample paths from "
                   "stdin — one per line, two whitespace-separated paths "
                   "for a read pair — emitting each sample's TSV rows "
                   "immediately; EOF ends the loop")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="multi-host mode: jax.distributed coordinator "
                   "address. Run the SAME command on every host with "
                   "--num-processes/--process-id; the database-scale "
                   "device index shards its chunks across processes and "
                   "process 0 writes the TSV")
    p.add_argument("--num-processes", dest="num_processes", type=int,
                   default=None, help=argparse.SUPPRESS)
    p.add_argument("--process-id", dest="process_id", type=int,
                   default=None, help=argparse.SUPPRESS)
    return p


def _add_inspect(sub):
    p = sub.add_parser("inspect",
                       help="Inspect sketched .syldb and .sylsp files.")
    p.add_argument("files", nargs="*")
    p.add_argument("-o", "--output-file", dest="out_file_name", default=None)
    return p


def build_parser():
    ap = argparse.ArgumentParser(
        prog="sylph",
        description="TPU-native ultrafast genome ANI queries and taxonomic "
        "profiling for metagenomic shotgun samples.")
    sub = ap.add_subparsers(dest="mode")
    _add_sketch(sub)
    _add_contain(sub, "profile", "Species-level taxonomic profiling with "
                 "abundances and ANIs.")
    _add_contain(sub, "query", "Coverage-adjusted ANI querying between "
                 "databases and samples.")
    ap._sub_map = dict(sub.choices)       # for intermixed parsing in main()
    _add_inspect(sub)
    return ap


def _contain_options(a) -> ContainOptions:
    estimator = "ratio"
    if a.ratio:
        estimator = "ratio"
    elif a.mme:
        estimator = "mme"
    elif a.nb:
        estimator = "nb"
    elif a.mle:
        estimator = "mle"
    return ContainOptions(
        files=a.files, file_list=a.file_list,
        min_count_correct=a.min_count_correct,
        min_number_kmers=a.min_number_kmers, minimum_ani=a.minimum_ani,
        threads=a.threads, sample_threads=a.sample_threads,
        estimate_unknown=a.estimate_unknown, seq_id=a.seq_id,
        redundant_ani=a.redundant_ani, reads=a.reads,
        first_pair=a.first_pair, second_pair=a.second_pair, c=a.c, k=a.k,
        individual=a.individual, min_spacing_kmer=a.min_spacing_kmer,
        out_file_name=a.out_file_name,
        log_reassignments=a.log_reassignments, pseudotax=a.pseudotax,
        estimator=estimator, no_ci=a.no_ci, no_adj=a.no_adj,
        mean_coverage=a.mean_coverage, tpu=a.tpu,
        profile_trace=a.profile_trace)


def _tune_allocator() -> None:
    """Re-exec once with glibc malloc tuned for streaming ingest.

    The ingest pipeline cycles multi-MB buffers (decode blocks, code
    arrays) across threads; stock glibc hands each thread its own arena
    and mmap/munmaps large blocks, so every block is first-touch-faulted
    again — ruinous on VMs that throttle fresh faults (ballooned /
    snapshot-restored guests fault at tens of MB/s). One shared arena
    with no trim keeps the pages hot. glibc only reads these at process
    start, hence the exec. Opt out with SYLPH_NO_MALLOC_TUNE=1.
    """
    if os.environ.get("SYLPH_NO_MALLOC_TUNE") or \
            os.environ.get("MALLOC_MMAP_THRESHOLD_") is not None or \
            not sys.platform.startswith("linux"):
        return
    env = dict(os.environ,
               MALLOC_MMAP_THRESHOLD_="17179869184",
               MALLOC_TRIM_THRESHOLD_="-1",
               MALLOC_ARENA_MAX="1")
    try:
        os.execve(sys.executable, [sys.executable, "-m", "sylph_tpu"]
                  + list(sys.argv[1:]), env)
    except OSError:                      # exec denied: run untuned
        os.environ["SYLPH_NO_MALLOC_TUNE"] = "1"


def main(argv=None) -> int:
    if argv is None:
        _tune_allocator()
    argv = list(sys.argv[1:] if argv is None else argv)
    ap = build_parser()
    if not argv:
        ap.print_help(sys.stderr)
        return 2
    if argv[0] in ap._sub_map:
        # clap (the reference CLI) accepts flags interleaved between
        # positionals (`profile db.syldb -u sample.sylsp`); plain argparse
        # subparser parsing rejects positionals after an optional, so parse
        # the subcommand's argv intermixed (src/cmdline.rs clap semantics)
        args = ap._sub_map[argv[0]].parse_intermixed_args(argv[1:])
        args.mode = argv[0]
    else:
        args = ap.parse_args(argv)
    if args.mode is None:
        ap.print_help(sys.stderr)
        return 2
    plat = os.environ.get("SYLPH_JAX_PLATFORMS")
    if plat:
        # explicit platform override that survives sitecustomize hooks
        # which force their own jax_platforms after import (some managed
        # images do); lets tests/ops pin --tpu runs to "cpu" etc.
        try:
            import jax
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    try:
        if args.mode == "sketch":
            _setup_logging(args.trace, args.debug)
            sketch(SketchOptions(
                files=args.files, db_out_name=args.db_out_name,
                sample_output_dir=args.sample_output_dir,
                individual=args.individual, reads=args.reads,
                genomes=args.genomes, list_sequence=args.list_sequence,
                list_reads=args.list_reads, list_genomes=args.list_genomes,
                list_first_pair=args.list_first_pair,
                list_second_pair=args.list_second_pair,
                list_sample_names=args.list_sample_names,
                sample_names=args.sample_names, k=args.k, c=args.c,
                threads=args.threads, max_ram=args.max_ram,
                no_dedup=args.no_dedup, no_pseudotax=args.no_pseudotax,
                min_spacing_kmer=args.min_spacing_kmer, fpr=args.fpr,
                first_pair=args.first_pair, second_pair=args.second_pair,
                tpu=args.tpu))
        elif args.mode in ("profile", "query"):
            _setup_logging(args.trace, args.debug)
            if args.coordinator:
                # multi-host session: every host runs this same command;
                # the grange engine auto-splits chunk ownership by
                # process (engine/device_exec.py) and non-zero processes
                # suppress the (identical) TSV
                import jax
                jax.distributed.initialize(
                    coordinator_address=args.coordinator,
                    num_processes=args.num_processes,
                    process_id=args.process_id)
            if args.serve:
                from .engine.runner import serve
                serve(_contain_options(args),
                      pseudotax=(args.mode == "profile"))
            else:
                contain(_contain_options(args),
                        pseudotax=(args.mode == "profile"))
        elif args.mode == "inspect":
            _setup_logging()
            if not args.files:
                ap.parse_args(["inspect", "--help"])
                return 2
            inspect(InspectOptions(files=args.files,
                                   out_file_name=args.out_file_name))
    except SystemExit as e:
        return int(e.code or 0)
    except BrokenPipeError:
        return 0
    return 0


if __name__ == "__main__":
    sys.exit(main())
