"""Device (TPU) read-seeding for `sylph sketch --tpu`.

The per-base rolling-hash loop is the sketching hot path (sylph's AVX2
kernel, src/avx2_seeding.rs). Here reads are packed into fixed-length 2-bit
batches, the Pallas/XLA seeding kernel emits survivor hashes per read
(position order preserved), and the host-side dedup fold (native C) then
runs unchanged — so sketches are bit-identical to the host engine.

Reads longer than the largest bucket fall back to the numpy path; results
merge by read id, preserving file order.
"""


import logging
from typing import Dict, List

import numpy as np

from ..io.fastx import ParsedFastx
from ..kmer.seeding import fmh_seeds_np

log = logging.getLogger("sylph")

_BUCKETS = (128, 256, 512)     # padded lengths (Pallas wants L % 128 == 0)
_MAX_BATCH = 1 << 16           # reads per device call


def _compact_by_position(hhi, hlo, keep, cap):
    """Per-row compaction that PRESERVES position order (compact_rows sorts
    by hash value — fine for the containment join, wrong for the
    order-dependent dedup fold). Key = window lane for survivors."""
    import jax
    import jax.numpy as jnp
    R, W = hhi.shape
    lanes = jax.lax.broadcasted_iota(jnp.uint32, (R, W), 1)
    key = jnp.where(keep, lanes, jnp.uint32(0xFFFFFFFF))
    sk, shi, slo = jax.lax.sort((key, hhi, hlo), dimension=1, num_keys=1)
    live = sk[:, :cap] != jnp.uint32(0xFFFFFFFF)
    sent = jnp.uint32(0xFFFFFFFF)
    return (jnp.where(live, shi[:, :cap], sent),
            jnp.where(live, slo[:, :cap], sent))


def device_available() -> bool:
    try:
        import jax
        return len(jax.devices()) > 0
    except Exception:
        return False


def read_survivor_hashes(px: ParsedFastx, c: int, k: int) -> Dict[int, list]:
    """{read_id: [u64 hash, ...]} of FracMinHash survivors, position order.

    Equivalent to running fmh_seeds per read (sylph src/seeding.rs:86-146);
    the extraction runs on the JAX device in length-bucketed batches.
    """
    import jax

    from ..tpu.containment import SENTINEL
    from ..tpu.pipeline import _seed
    from ..tpu.u64 import to_u64_np

    lengths = px.lengths
    n = px.n_records
    out: Dict[int, list] = {}

    def flush(bucket_len: int, rids: List[int]):
        if not rids:
            return
        nb = len(rids)
        pad_n = -(-nb // 8) * 8
        bases = np.zeros((pad_n, bucket_len), np.uint32)
        lens = np.zeros(pad_n, np.int32)
        for row, rid in enumerate(rids):
            s, e = px.starts[rid], px.ends[rid]
            bases[row, :e - s] = px.codes[s:e]
            lens[row] = e - s
        hhi, hlo, keep = _seed(jax.numpy.asarray(bases),
                               jax.numpy.asarray(lens), c=c, k=k)
        W = bases.shape[1] - k + 1
        hhi, hlo, keep = hhi[:, :W], hlo[:, :W], keep[:, :W]
        # per-READ compaction so read boundaries survive the transfer;
        # 8x-expectation capacity so parity loss is astronomically unlikely
        cap = min(W, 8 * W // c + 24)
        chi, clo = jax.jit(_compact_by_position, static_argnums=3)(
            hhi, hlo, keep, cap)
        chi = np.asarray(chi)
        clo = np.asarray(clo)
        for row, rid in enumerate(rids):
            live = chi[row] != SENTINEL[0]
            if live.any():
                out[rid] = to_u64_np(chi[row][live], clo[row][live]).tolist()

    pending: Dict[int, List[int]] = {b: [] for b in _BUCKETS}
    for rid in range(n):
        ln = int(lengths[rid])
        if ln < k:
            continue
        for b in _BUCKETS:
            if ln <= b:
                pending[b].append(rid)
                if len(pending[b]) >= _MAX_BATCH:
                    flush(b, pending[b])
                    pending[b] = []
                break
        else:
            # long read: host path (genome-style blocked scan)
            h = fmh_seeds_np(px.record_codes(rid), c, k)
            if h.size:
                out[rid] = h.tolist()
    for b in _BUCKETS:
        flush(b, pending[b])
        pending[b] = []
    # the dedup fold's decision sequence is order-dependent: restore file
    # order (buckets emit out of order)
    return dict(sorted(out.items()))
