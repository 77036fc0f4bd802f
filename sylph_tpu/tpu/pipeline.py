"""End-to-end device profiling step, single-chip and sharded.

The flagship compute path: 2-bit packed read batches -> FracMinHash seeding
-> fixed-capacity compaction (row-sort) -> sort-merge containment join of
the genome index -> per-genome coverage histograms -> batched ANI/lambda
statistics. Built exclusively from TPU-fast primitives (dense elementwise,
sorts, segmented scans); no per-element gathers in the hot path.

Single-chip it is one jitted function; multi-chip it runs under shard_map
over a ('dp', 'ip') mesh:

  dp (data parallel):   read batches sharded over devices for seeding +
                        compaction; the compacted sample hashes (~1/c of
                        bases — tiny) are all_gathered over 'dp' (ICI).
  ip (index parallel):  the genome k-mer index sharded over the FULL device
                        grid ('dp' x 'ip') in HBM — the analog of tensor
                        parallelism for the database dimension; every device
                        merge-joins the full sample against its index shard
                        and per-genome histograms merge with one psum.

This replaces the reference's rayon threads + one shared hashmap
(sylph src/contain.rs:266-307): collectives ride ICI, the index never
leaves HBM, and every phase is a static-shape XLA program.
"""

import functools
import os
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import u64
from .containment import SENTINEL, compact_rows, merge_join_hist
from .seeding import seed_hashes
from .stats import GenomeStats, stats_from_histograms

DEFAULT_BUCKETS = 256  # multiplicities clamp here; stats need median < 30
_ROW = 512             # compaction row width

# transposed fused seed kernel (sublane rolls: kernel-only 2.57 ms vs
# 3.01 ms/batch on v5e) — opt-in via SYLPH_SEED_T=1 until on-chip parity
# and the transpose-included cost are verified on real hardware
_USE_TRANSPOSED_SEED = os.environ.get("SYLPH_SEED_T", "0") == "1"


def compaction_cap(c: int, row: int = _ROW) -> int:
    """Per-row survivor capacity: ~4x the FracMinHash expectation."""
    return min(row, 4 * row // c + 8)


def _seed(bases, lengths, *, c: int, k: int):
    """Seeding dispatch: fused Pallas kernel on TPU when the layout allows
    (L % 128 == 0), XLA log-doubling otherwise/on CPU. Both emit the same
    (hash_hi, hash_lo, keep) modulo trailing always-masked columns."""
    N, L = bases.shape
    if jax.default_backend() != "cpu" and L % 128 == 0:
        from .pallas_seeding import BLOCK_ROWS, seed_hashes_pallas
        if N % BLOCK_ROWS == 0 or N < BLOCK_ROWS:
            return seed_hashes_pallas(bases, lengths, c=c, k=k)
    return seed_hashes(bases, lengths, c=c, k=k)


def _sketch_compact(bases, lengths, *, c: int, k: int):
    """Read batch -> compacted survivor (hi, lo), sentinel-padded.

    Production path on TPU: the TRANSPOSED fused butterfly kernel
    (seed_pack_pallas_t): one XLA transpose puts reads on the lane axis so
    every neighbor access and the whole compaction network run as sublane
    rolls (~5x cheaper than 256-lane rolls on v5e, scripts/kbench.py).
    Output is [cap_rows, N] (read-per-column) — all consumers flatten and
    sort, so the layout change is invisible downstream. Falls back to the
    lane-major fused kernel, then to seed + row-sort, when the layout
    doesn't fit (CPU, k <= 16, L % 128 != 0, c too dense for the 128-lane
    capacity, or c == 1 whose hashes collide with the sentinel)."""
    N, L = bases.shape
    cap = min(128, 4 * L // c + 8)
    if (jax.default_backend() != "cpu" and L % 128 == 0 and 16 < k <= 31
            and c >= 2 and 4 * L // c + 8 <= 128):
        from .pallas_seeding import (BLOCK_ROWS, seed_pack_pallas,
                                     seed_pack_pallas_t)
        if _USE_TRANSPOSED_SEED and (N % 512 == 0 or N < 512):
            return seed_pack_pallas_t(bases.astype(jnp.uint32).T,
                                      lengths, c=c, k=k)
        if N % BLOCK_ROWS == 0 or N < BLOCK_ROWS:
            # the kernel widens u8 on load: no upcast pass, 4x less
            # input HBM traffic
            chi, clo = seed_pack_pallas(bases, lengths, c=c, k=k)
            return chi[:, :cap], clo[:, :cap]
    if bases.dtype != jnp.uint32:
        bases = bases.astype(jnp.uint32)
    hhi, hlo, keep = _seed(bases, lengths, c=c, k=k)
    W = L - k + 1                       # drop structurally-dead columns
    if hhi.shape[1] > W:
        hhi, hlo, keep = hhi[:, :W], hlo[:, :W], keep[:, :W]
    return compact_rows(hhi, hlo, keep, _ROW, compaction_cap(c))


class HostIndex(NamedTuple):
    """Host-side flattened genome index, ready to shard onto devices."""
    hi: np.ndarray          # [M] uint32
    lo: np.ndarray          # [M] uint32
    genome_ids: np.ndarray  # [M] int32; padding rows get id n_genomes
    n_kmers: np.ndarray     # [G] int32
    n_genomes: int


def build_host_index(kmer_arrays: List[np.ndarray],
                     pad_multiple: int = 8) -> HostIndex:
    """Flatten per-genome u64 sketch k-mer arrays into one probe list.

    No ordering is required (the merge join sorts); genomes stay contiguous.
    Padded to a multiple of `pad_multiple` so the M axis can shard evenly;
    pad rows carry genome_id == G and fall out of the histograms.
    """
    G = len(kmer_arrays)
    sizes = np.array([a.size for a in kmer_arrays], dtype=np.int32)
    total = int(sizes.sum())
    M = max(pad_multiple, -(-total // pad_multiple) * pad_multiple)
    all_kmers = (np.concatenate(kmer_arrays).astype(np.uint64)
                 if total else np.empty(0, np.uint64))
    hi, lo = u64.from_u64_np(all_kmers)
    out_hi = np.zeros(M, np.uint32)
    out_lo = np.zeros(M, np.uint32)
    gids = np.full(M, G, np.int32)
    out_hi[:total] = hi
    out_lo[:total] = lo
    gids[:total] = np.repeat(np.arange(G, dtype=np.int32), sizes)
    return HostIndex(out_hi, out_lo, gids, sizes, G)


def pack_reads(seqs: List[bytes], length: int,
               pad_multiple: int = 8) -> Tuple[np.ndarray, np.ndarray]:
    """Pad/stack raw DNA byte strings into a [N, L] 2-bit code batch."""
    from ..kmer.hashing import BYTE_TO_SEQ_NP
    n = len(seqs)
    N = max(pad_multiple, -(-n // pad_multiple) * pad_multiple)
    bases = np.zeros((N, length), np.uint32)
    lengths = np.zeros(N, np.int32)
    for i, s in enumerate(seqs):
        arr = np.frombuffer(bytes(s[:length]), dtype=np.uint8)
        bases[i, :arr.size] = BYTE_TO_SEQ_NP[arr]
        lengths[i] = arr.size
    return bases, lengths


def pack_bases_u32(codes: np.ndarray) -> np.ndarray:
    """[N, L] 2-bit codes -> [N, L/16] uint32 words (16 bases, LSB-first).

    The framework's wire format for read batches: 0.25 B/base over
    PCIe/DCN; the fused Pallas kernel unpacks in VMEM.
    """
    N, L = codes.shape
    if L % 16 != 0:
        raise ValueError(f"L must be a multiple of 16, got {L}")
    w = codes.astype(np.uint32).reshape(N, L // 16, 16)
    out = np.zeros((N, L // 16), np.uint32)
    for j in range(16):
        out |= w[:, :, j] << np.uint32(2 * j)
    return out


def unpack_bases(packed):
    """[N, L/16] uint32 words -> [N, L] 2-bit codes (device-side)."""
    N, W = packed.shape
    rep = jnp.repeat(packed, 16, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (N, W * 16), 1)
    return (rep >> ((lane & np.uint32(15)) << np.uint32(1))) & np.uint32(3)


@functools.partial(jax.jit, static_argnames=("c", "k"))
def sketch_batch_packed(packed, lengths, *, c: int, k: int):
    """sketch_batch over the 2-bit packed wire format ([N, L/16] uint32).

    The packed words cross PCIe/DCN at 0.25 B/base; one XLA unpack pass in
    HBM feeds the fused kernel."""
    chi, clo = _sketch_compact(unpack_bases(packed), lengths, c=c, k=k)
    n = jnp.sum((chi != SENTINEL[0]).astype(jnp.int32))
    return chi, clo, n


@functools.partial(jax.jit, static_argnames=("c", "k"))
def sketch_batch(bases, lengths, *, c: int, k: int):
    """Streaming phase: one read batch -> compacted surviving hash pairs.

    Returns ((hi, lo) [R, cap] sentinel-padded, n_survivors i32). Batches
    accumulate on device; finish_profile() consumes them all at once — each
    genome k-mer joins once per sample, not once per batch, matching the
    reference's whole-sample kmer_counts map (sylph src/sketch.rs:930-939).
    """
    chi, clo = _sketch_compact(bases, lengths, c=c, k=k)
    n = jnp.sum((chi != SENTINEL[0]).astype(jnp.int32))
    return chi, clo, n


@functools.partial(jax.jit, static_argnames=(
    "k", "n_genomes", "n_buckets", "min_ani"))
def finish_profile(all_hi, all_lo, idx_hi, idx_lo, gids, n_kmers, *,
                   k: int, n_genomes: int, n_buckets: int = DEFAULT_BUCKETS,
                   min_ani: float = 0.95):
    """Containment phase: stacked sample hash chunks -> (hist, stats)."""
    hist = merge_join_hist(idx_hi, idx_lo, gids,
                           all_hi.reshape(-1), all_lo.reshape(-1),
                           n_genomes=n_genomes, n_buckets=n_buckets)
    st = stats_from_histograms(hist, n_kmers, k=k, min_ani=min_ani)
    return hist, st


@functools.partial(jax.jit, static_argnames=(
    "c", "k", "n_genomes", "n_buckets", "min_ani"))
def profile_step(bases, lengths, idx_hi, idx_lo, gids, n_kmers, *,
                 c: int, k: int, n_genomes: int,
                 n_buckets: int = DEFAULT_BUCKETS,
                 min_ani: float = 0.95) -> Tuple[jnp.ndarray, GenomeStats]:
    """Single-chip one-shot profile forward: read batch -> (hist, stats)."""
    chi, clo = _sketch_compact(bases, lengths, c=c, k=k)
    hist = merge_join_hist(idx_hi, idx_lo, gids,
                           chi.reshape(-1), clo.reshape(-1),
                           n_genomes=n_genomes, n_buckets=n_buckets)
    st = stats_from_histograms(hist, n_kmers, k=k, min_ani=min_ani)
    return hist, st


@functools.partial(jax.jit, static_argnames=(
    "k", "n_genomes", "n_buckets", "min_ani"))
def finish_profile_batched(smp_hi, smp_lo, idx_hi, idx_lo, gids, n_kmers, *,
                           k: int, n_genomes: int,
                           n_buckets: int = DEFAULT_BUCKETS,
                           min_ani: float = 0.95):
    """Multi-sample containment: [S, T] sample hash tables -> per-sample
    (hist [S, G, H], stats with [S, G] leaves).

    vmaps the merge join over the sample axis with the index broadcast —
    BASELINE.json's 'multi-sample batched data-parallel' configuration on
    one chip (combine with shard_map for a mesh).
    """
    join = jax.vmap(
        lambda shi, slo: merge_join_hist(
            idx_hi, idx_lo, gids, shi, slo,
            n_genomes=n_genomes, n_buckets=n_buckets))
    hist = join(smp_hi.reshape(smp_hi.shape[0], -1),
                smp_lo.reshape(smp_lo.shape[0], -1))
    st = jax.vmap(
        lambda h: stats_from_histograms(h, n_kmers, k=k, min_ani=min_ani)
    )(hist)
    return hist, st


def condense_stream(hi, lo, live_fraction: float,
                    target_density: float = 0.75, interpret: bool = False):
    """Repack a sparse sentinel-padded hash stream until reasonably dense.

    live_fraction: caller's estimate of the stream's live share (e.g.
    survivors / slots). Each round packs rows of 1024 lanes into a capacity
    of expectation + 6 sigma + 16 (rounded up to 128 lanes) — overflow
    probability per row is ~1e-9, so the chain is effectively lossless.
    No-op on CPU or when already dense. Order is preserved.
    """
    if jax.default_backend() == "cpu" and not interpret:
        return hi, lo
    from .bucket_fill import repack2_flat
    density = live_fraction
    while density < target_density and hi.size > 4 * 1024:
        # widest flat window whose capacity stays well under its width:
        # one wide pass replaces the lane-roll chain (rows of 1024) that
        # needed 3 passes from seed density to the 0.75 stop
        row = 1024
        while row < 32768 and row * 2 * density < 2048 \
                and hi.size > 4 * row * 2:
            row *= 2
        exp = row * density
        cap = 256 * int(np.ceil((exp + 6.0 * np.sqrt(exp) + 16) / 256))
        if cap >= row:
            break
        hi, lo = repack2_flat(hi, lo, row=row, cap=cap,
                              interpret=interpret)
        density = density * row / cap
    return hi, lo


def make_mesh(n_devices: int = None, dp: int = None,
              devices=None) -> Mesh:
    """A ('dp', 'ip') mesh over the first n_devices jax devices.

    Falls back to the CPU backend (honoring
    --xla_force_host_platform_device_count) when the default platform has
    fewer devices than requested — the single-real-chip dev box case.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if devices is None and len(devs) < n_devices:
        devs = jax.devices("cpu")
    if len(devs) < n_devices:
        raise ValueError(f"need {n_devices} devices, have {len(devs)}")
    devs = devs[:n_devices]
    if dp is None:
        dp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    ip = n_devices // dp
    if dp * ip != n_devices:
        raise ValueError(f"cannot factor {n_devices} devices into "
                         f"dp={dp} x ip={ip}")
    return Mesh(np.asarray(devs).reshape(dp, ip), ("dp", "ip"))


def make_sharded_profile_step(mesh: Mesh, *, c: int, k: int, n_genomes: int,
                              n_buckets: int = DEFAULT_BUCKETS,
                              min_ani: float = 0.95):
    """Build the jitted multi-chip profile step over `mesh`.

    Returns (fn, shardings): fn(bases, lengths, idx_hi, idx_lo, gids,
    n_kmers) -> (hist [G, H] replicated, GenomeStats replicated). Reads
    shard over 'dp'; the index shards over the full ('dp','ip') grid;
    compacted sample hashes all_gather over 'dp' and histograms psum over
    the grid — both collectives ride ICI.
    """
    def step(bases, lengths, idx_hi, idx_lo, gids, n_kmers):
        chi, clo = _sketch_compact(bases, lengths, c=c, k=k)
        # condense the sparse per-read stream locally before it crosses
        # ICI: ~8x less all_gather traffic at c=200. Expected live share =
        # total survivors / total slots (valid for either compaction shape).
        N, L = bases.shape
        live = (N * (L - k + 1) / c) / max(chi.size, 1)
        chi, clo = condense_stream(chi, clo, live)
        flat_hi = chi.reshape(-1)
        flat_lo = clo.reshape(-1)
        smp_hi = jax.lax.all_gather(flat_hi, "dp", tiled=True)
        smp_lo = jax.lax.all_gather(flat_lo, "dp", tiled=True)
        hist_local = merge_join_hist(idx_hi, idx_lo, gids, smp_hi, smp_lo,
                                     n_genomes=n_genomes,
                                     n_buckets=n_buckets)
        hist = jax.lax.psum(hist_local, ("dp", "ip"))
        st = stats_from_histograms(hist, n_kmers, k=k, min_ani=min_ani)
        return hist, st

    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", None), P("dp"), P(("dp", "ip")), P(("dp", "ip")),
                  P(("dp", "ip")), P()),
        out_specs=(P(), GenomeStats(*([P()] * len(GenomeStats._fields)))),
        check_vma=False)
    fn = jax.jit(sharded)

    shardings = {
        "bases": NamedSharding(mesh, P("dp", None)),
        "lengths": NamedSharding(mesh, P("dp")),
        "idx": NamedSharding(mesh, P(("dp", "ip"))),
        "replicated": NamedSharding(mesh, P()),
    }
    return fn, shardings
