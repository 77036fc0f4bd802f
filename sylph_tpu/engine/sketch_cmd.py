"""`sketch` subcommand orchestration.

Behavioral spec: sylph ``sketch`` (src/sketch.rs:276-479): input routing by
extension, list files, sample renaming, outputs
``<dir>/<basename>[.paired].sylsp`` per read input and one
``<out>.syldb`` for all genomes.
"""

import logging
import os
from dataclasses import dataclass, field
from typing import List, Optional

from ..constants import (DEFAULT_C, DEFAULT_FPR, DEFAULT_K,
                         DEFAULT_MIN_SPACING, QUERY_FILE_SUFFIX,
                         SAMPLE_FILE_SUFFIX)
from ..core.sketch_genomes import sketch_genome, sketch_genome_individual
from ..core.sketch_reads import sketch_pair_sequences, sketch_sequences
from ..io import sylformat
from ..io.fastx import is_fasta, is_fastq

log = logging.getLogger("sylph")


def _vmem_gb() -> Optional[float]:
    """Current process virtual memory in GB (Linux /proc)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmSize:"):
                    return int(line.split()[1]) / (1024.0 * 1024.0)
    except OSError:
        pass
    return None


def check_ram_and_block(max_ram: Optional[int], context: str) -> None:
    """Backpressure while over the --ram-barrier budget
    (sylph check_vram_and_block, src/sketch.rs:27-51): sleep until virtual
    memory drops below the barrier, logging every ~30s."""
    if max_ram is None:
        return
    import time as _time
    waited = 0.0
    while True:
        gb = _vmem_gb()
        if gb is None or gb < float(max_ram):
            return
        if waited % 30.0 < 1.0:
            log.info("Sketching paused before %s: virtual memory %.1f GB "
                     ">= barrier %d GB...", context, gb, max_ram)
        _time.sleep(1.0)
        waited += 1.0


@dataclass
class SketchOptions:
    """Mirrors SketchArgs (sylph src/cmdline.rs:28-83)."""
    files: List[str] = field(default_factory=list)
    db_out_name: str = "database"
    sample_output_dir: str = "./"
    individual: bool = False
    reads: Optional[List[str]] = None
    genomes: Optional[List[str]] = None
    list_sequence: Optional[str] = None
    list_reads: Optional[str] = None
    list_genomes: Optional[str] = None
    list_first_pair: Optional[str] = None
    list_second_pair: Optional[str] = None
    list_sample_names: Optional[str] = None
    sample_names: Optional[List[str]] = None
    k: int = DEFAULT_K
    c: int = DEFAULT_C
    threads: int = 3
    max_ram: Optional[int] = None
    no_dedup: bool = False
    no_pseudotax: bool = False
    min_spacing_kmer: int = DEFAULT_MIN_SPACING
    fpr: float = DEFAULT_FPR
    first_pair: List[str] = field(default_factory=list)
    second_pair: List[str] = field(default_factory=list)
    tpu: bool = False          # device-accelerated read seeding


def _parse_line_file(path: str, vec: List[str]):
    with open(path) as f:
        for line in f:
            vec.append(line.rstrip("\n"))


def _check_args_valid(o: SketchOptions):
    """src/sketch.rs:123-162."""
    if (not o.files and o.list_sequence is None and not o.first_pair
            and not o.second_pair and o.genomes is None and o.reads is None
            and o.list_genomes is None and o.list_reads is None
            and o.list_first_pair is None and o.list_second_pair is None):
        log.error("No input sequences found; see sylph sketch -h for help. "
                  "Exiting.")
        raise SystemExit(1)
    if o.fpr < 0.0 or o.fpr >= 1.0:
        log.error("Invalid FPR for sketching. Must be in [0,1).")
        raise SystemExit(1)


def sketch(o: SketchOptions):
    from ..utils.threads import set_thread_budget
    set_thread_budget(o.threads)
    read_inputs: List[str] = []
    genome_inputs: List[str] = []
    first_pairs: List[str] = []
    second_pairs: List[str] = []

    _check_args_valid(o)

    # ambiguous files (src/sketch.rs:164-189)
    all_files: List[str] = []
    if o.list_sequence is not None:
        _parse_line_file(o.list_sequence, all_files)
    all_files.extend(o.files)
    for f in all_files:
        if is_fastq(f):
            read_inputs.append(f)
        elif is_fasta(f):
            genome_inputs.append(f)
        else:
            log.warning("%s does not have a fasta/fastq/gzip type "
                        "extension; skipping", f)

    # explicit reads/genomes (src/sketch.rs:191-216)
    if o.genomes:
        genome_inputs.extend(o.genomes)
    if o.reads:
        read_inputs.extend(o.reads)
    if o.list_reads is not None:
        _parse_line_file(o.list_reads, read_inputs)
    if o.list_genomes is not None:
        _parse_line_file(o.list_genomes, genome_inputs)

    # paired (src/sketch.rs:218-250)
    if len(o.first_pair) != len(o.second_pair):
        log.error("Different number of paired sequences. Exiting.")
        raise SystemExit(1)
    first_pairs.extend(o.first_pair)
    second_pairs.extend(o.second_pair)
    if o.list_first_pair is not None:
        _parse_line_file(o.list_first_pair, first_pairs)
    if o.list_second_pair is not None:
        _parse_line_file(o.list_second_pair, second_pairs)
    if len(first_pairs) != len(second_pairs):
        log.error("Different number of paired sequences. Exiting.")
        raise SystemExit(1)

    # sample names (src/sketch.rs:260-293)
    sample_names: Optional[List[str]] = None
    if o.list_sample_names is not None:
        sample_names = []
        _parse_line_file(o.list_sample_names, sample_names)
    elif o.sample_names is not None:
        sample_names = list(o.sample_names)
    if sample_names is not None and \
            len(sample_names) != len(first_pairs) + len(read_inputs):
        log.error("Sample name length is not equal to the number of reads. "
                  "Exiting")
        raise SystemExit(1)

    if o.max_ram is not None and o.max_ram < 7:
        log.error("Max ram must be >= 7. Exiting.")
        raise SystemExit(1)

    if not genome_inputs and o.db_out_name != "database":
        log.warning("-o is set but no genomes are present. -o only applies "
                    "to genomes; see -d for reads")

    # Host parallelism over files mirrors the reference's three rayon
    # par_iter fan-outs (src/sketch.rs:313, 371, 428). The parse/dedup hot
    # paths are native C (GIL-released), so threads genuinely overlap.
    pool_workers = max(1, o.threads)

    def _pmap(fn, items):
        if pool_workers == 1 or len(items) <= 1:
            return [fn(x) for x in items]
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=pool_workers) as ex:
            return list(ex.map(fn, items))

    if first_pairs and second_pairs:
        log.info("Sketching paired sequences...")

        def do_pair(item):
            i, (f1, f2) = item
            name = sample_names[i] if sample_names is not None else None
            return name, sketch_pair_sequences(f1, f2, o.c, o.k, name,
                                               o.no_dedup, o.fpr,
                                               device=o.tpu)

        for name, sk in _pmap(do_pair,
                              list(enumerate(zip(first_pairs,
                                                 second_pairs)))):
            if sk is None:
                continue
            os.makedirs(o.sample_output_dir, exist_ok=True)
            sketch_name = name if name is not None else sk.file_name
            out = os.path.join(o.sample_output_dir,
                               os.path.basename(sketch_name)
                               + ".paired" + SAMPLE_FILE_SUFFIX)
            sylformat.write_sylsp(out, sk)
            log.info("Sketching %s complete.", out)

    if read_inputs:
        log.info("Sketching non-paired sequences...")

        def do_single(item):
            i, rf = item
            check_ram_and_block(o.max_ram, rf)
            name = (sample_names[i + len(first_pairs)]
                    if sample_names is not None else None)
            return name, sketch_sequences(rf, o.c, o.k, name, o.no_dedup,
                                          device=o.tpu)

        for name, sk in _pmap(do_single, list(enumerate(read_inputs))):
            if sk is None:
                continue
            os.makedirs(o.sample_output_dir, exist_ok=True)
            sketch_name = name if name is not None else sk.file_name
            out = os.path.join(o.sample_output_dir,
                               os.path.basename(sketch_name)
                               + SAMPLE_FILE_SUFFIX)
            sylformat.write_sylsp(out, sk)
            log.info("Sketching %s complete.", out)

    if genome_inputs:
        log.info("Sketching genomes...")
        out_path = o.db_out_name + QUERY_FILE_SUFFIX
        parent = os.path.dirname(out_path)
        if parent:
            os.makedirs(parent, exist_ok=True)

        def do_genome(gf):
            check_ram_and_block(o.max_ram, gf)
            if o.individual:
                return sketch_genome_individual(
                    o.c, o.k, gf, o.min_spacing_kmer, not o.no_pseudotax,
                    device=o.tpu)
            g = sketch_genome(o.c, o.k, gf, o.min_spacing_kmer,
                              not o.no_pseudotax, device=o.tpu)
            return [g] if g is not None else []

        all_sketches = []
        done = 0
        for batch in _pmap(do_genome, genome_inputs):
            all_sketches.extend(batch)
            done += 1
            if done % 100 == 0:
                log.info("%d genomes processed.", done)
        if not all_sketches:
            log.warning("No valid genomes to sketch; %s is not output",
                        out_path)
        else:
            sylformat.write_syldb(out_path, all_sketches)
            log.info("Wrote all genome sketches to %s", out_path)

    log.info("Finished.")
