"""Genome sketching: FracMinHash + duplicate elimination + spacing filter.

Behavioral spec: sylph src/sketch.rs:481-622. Per genome:
  1. extract (contig, end_pos, hash) for all surviving k-mers,
  2. drop ALL copies of any hash that occurs more than once,
  3. greedy spacing filter: keep a k-mer iff it is the first kept, on a new
     contig, or ends more than ``min_spacing`` bases after the last kept one;
     spacing-rejected k-mers are retained separately for profile reassignment.
The extraction is vectorized; only the (inherently sequential) greedy scan
runs as a loop over the ~1/c survivors.
"""

import logging
from typing import List, Optional

import numpy as np

from ..io.fastx import FastxParseError, parse_fastx
from ..kmer.seeding import fmh_seeds_positions_np
from .types import GenomeSketch

log = logging.getLogger("sylph")


def _spacing_filter(contigs: np.ndarray, positions: np.ndarray,
                    hashes: np.ndarray, min_spacing: int, pseudotax: bool,
                    per_contig: bool):
    """Duplicate-hash drop + greedy spacing scan
    (sylph src/sketch.rs:590-614; individual mode :510-531).

    Inputs are in (contig, position) order — the reference sorts to get
    there; vectorized extraction already produces that order.
    """
    if hashes.size == 0:
        empty = np.empty(0, np.uint64)
        return empty, (np.empty(0, np.uint64) if pseudotax else None)
    uniq, counts = np.unique(hashes, return_counts=True)
    dup = uniq[counts > 1]
    keep_mask = ~np.isin(hashes, dup)
    h = hashes[keep_mask]
    p = positions[keep_mask]
    cg = contigs[keep_mask]

    from .native_core import spacing_scan_native
    native = spacing_scan_native(cg, p, min_spacing, per_contig, pseudotax)
    if native is not None:
        kept, tracked = native
        return h[kept], (h[tracked] if pseudotax else None)

    kept = np.zeros(h.shape[0], dtype=bool)
    tracked = np.zeros(h.shape[0], dtype=bool)
    last_pos = 0
    last_contig = 0
    for i in range(h.shape[0]):
        pos = p[i]
        if (last_pos == 0
                or (not per_contig and last_contig != cg[i])
                or pos - last_pos > min_spacing):
            kept[i] = True
            last_contig = cg[i]
            last_pos = pos
        elif pseudotax:
            tracked[i] = True
    return h[kept], (h[tracked] if pseudotax else None)


def _extract_positions(px, c: int, k: int, device: bool):
    """(contigs, end_positions, hashes) over all records, device or host."""
    if device:
        from ..engine.device_sketch import (device_available,
                                            genome_survivor_positions,
                                            ingest_on_device)
        if ingest_on_device():
            return genome_survivor_positions(px, c, k)
        if not device_available():
            log.warning("--tpu requested but no JAX device available; "
                        "using the host seeding path.")
    from .native_core import seed_positions_native
    native = seed_positions_native(px.codes, px.starts, px.ends, c, k)
    if native is not None:
        return native
    all_h, all_p, all_c = [], [], []
    for i in range(px.n_records):
        h, p = fmh_seeds_positions_np(px.record_codes(i), c, k)
        all_h.append(h)
        all_p.append(p)
        all_c.append(np.full(h.shape[0], i, dtype=np.int64))
    hashes = np.concatenate(all_h) if all_h else np.empty(0, np.uint64)
    positions = np.concatenate(all_p) if all_p else np.empty(0, np.int64)
    contigs = np.concatenate(all_c) if all_c else np.empty(0, np.int64)
    return contigs, positions, hashes


def sketch_genome(c: int, k: int, ref_file: str, min_spacing: int,
                  pseudotax: bool,
                  device: bool = False) -> Optional[GenomeSketch]:
    """Whole-file genome sketch (sylph src/sketch.rs:550-622)."""
    try:
        px = parse_fastx(ref_file)
    except (FastxParseError, OSError):
        log.warning("%s is not a valid fasta/fastq file; skipping.", ref_file)
        return None

    contigs, positions, hashes = _extract_positions(px, c, k, device)

    kmers, tracked = _spacing_filter(contigs, positions, hashes, min_spacing,
                                     pseudotax, per_contig=False)
    return GenomeSketch(
        genome_kmers=kmers,
        pseudotax_tracked_nonused_kmers=tracked,
        file_name=ref_file,
        first_contig_name=px.names[0] if px.names else "",
        c=c, k=k,
        gn_size=int(px.lengths.sum()),
        min_spacing=min_spacing,
    )


def sketch_genome_individual(c: int, k: int, ref_file: str, min_spacing: int,
                             pseudotax: bool,
                             device: bool = False) -> List[GenomeSketch]:
    """One sketch per record (sylph src/sketch.rs:481-548).

    Note the individual-mode spacing scan does not reset on contig change
    (single contig per sketch) — condition src/sketch.rs:524."""
    try:
        px = parse_fastx(ref_file)
    except (FastxParseError, OSError):
        log.warning("%s is not a valid fasta/fastq file; skipping.", ref_file)
        return []
    all_cg, all_pos, all_h = _extract_positions(px, c, k, device)
    out = []
    for i in range(px.n_records):
        m = all_cg == i
        h, p = all_h[m], all_pos[m]
        contigs = np.zeros(h.shape[0], dtype=np.int64)
        kmers, tracked = _spacing_filter(contigs, p, h, min_spacing,
                                         pseudotax, per_contig=True)
        out.append(GenomeSketch(
            genome_kmers=kmers,
            pseudotax_tracked_nonused_kmers=tracked,
            file_name=ref_file,
            first_contig_name=px.names[i] if px.names else "",
            c=c, k=k,
            gn_size=int(px.lengths[i]),
            min_spacing=min_spacing,
        ))
    return out
