"""Worker for the multi-process (simulated multi-host) scaling test.

Each process owns 4 virtual CPU devices; jax.distributed joins them into an
8-device cluster (2 'hosts' over gRPC — the DCN stand-in). The sharded
profile step then runs over a global ('dp', 'ip') mesh, exactly as it would
across real TPU hosts. Usage:
    python multiproc_worker.py <coordinator> <num_procs> <proc_id> <out>
"""

import os
import sys

# importable without an installed package (fresh boxes run from the repo)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=4")


def grange_main(pid: int, n_procs: int, out_path: str):
    """Multi-host grange: each process owns a round-robin chunk subset of
    the same deterministic database-scale index, computes its PARTIAL
    [G, H] histogram on its local devices, and the histograms merge with
    a real cross-process collective (merge_process_hists). Process 0
    writes the merged result for the oracle comparison."""
    import jax
    import numpy as np

    from sylph_tpu.tpu.grange import (GRangeEngine, build_grange_index,
                                      merge_process_hists)

    rng = np.random.default_rng(3)
    G, c = 40, 20
    thr = ((1 << 64) - 1) // c
    chunk_slots = 1 << 14
    m = chunk_slots * 4
    kmers = rng.integers(0, thr, size=m, dtype=np.uint64)
    ndup = m // 8      # strain-duplication slab -> heavy-run CSR engaged
    kmers[:ndup] = rng.choice(kmers[ndup:ndup + 64], size=ndup)
    gids = rng.integers(0, G, size=m).astype(np.int32)
    gidx = build_grange_index(kmers, gids, G, chunk_slots=chunk_slots,
                              target_mean=256, ci_cap=256, heavy_run=8)
    assert len(gidx.chunk_hi) >= n_procs

    t = 6_000
    sk = np.unique(np.concatenate([
        rng.choice(kmers, size=t // 2),
        rng.integers(0, thr, size=t // 2, dtype=np.uint64)]))
    sc = rng.integers(1, 100, size=sk.size).astype(np.uint32)

    eng = GRangeEngine(gidx, devices=jax.local_devices(),
                       process_span=(pid, n_procs))
    partial = eng.partial_hists(sk, sc)
    merged = merge_process_hists(partial)
    if pid == 0:
        np.save(out_path, merged)


def cli_main(pid: int, n_procs: int, out_path: str, fixture_dir: str):
    """Full CLI pipeline (contain --tpu) across processes: both processes
    run the identical profile of the same fixtures; the grange engine
    (GRANGE_MIN patched down so the tiny db takes the database-scale
    regime, chunk_slots patched so chunks split across processes) owns a
    chunk subset per process and merges histograms over gRPC. Process 0
    writes its TSV for comparison with single-process runs."""
    import functools
    import io
    import os

    import sylph_tpu.tpu.grange as gr
    from sylph_tpu.engine.device_exec import DeviceContainment
    from sylph_tpu.engine.runner import ContainOptions, contain

    DeviceContainment.GRANGE_MIN = 1 << 12
    gr.build_grange_index = functools.partial(gr.build_grange_index,
                                              chunk_slots=1 << 13)
    db = os.path.join(fixture_dir, "db.syldb")
    smp = os.path.join(fixture_dir, "sample.sylsp")
    out = io.StringIO()
    contain(ContainOptions(files=[db, smp], tpu=True, threads=2),
            pseudotax=True, out=out)
    if pid == 0:
        with open(out_path, "w") as f:
            f.write(out.getvalue())
    else:
        # non-zero process: the gating in contain() should have produced
        # the same rows internally but written nothing; record the fact
        # that this process produced NO output for the test to assert
        with open(out_path + f".p{pid}", "w") as f:
            f.write(out.getvalue())


def main():
    coord, n_procs, pid, out_path = sys.argv[1:5]
    mode = sys.argv[5] if len(sys.argv) > 5 else "profile"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=int(n_procs),
                               process_id=int(pid))
    if mode == "grange":
        grange_main(int(pid), int(n_procs), out_path)
        jax.distributed.shutdown()
        return
    if mode == "cli":
        cli_main(int(pid), int(n_procs), out_path, sys.argv[6])
        jax.distributed.shutdown()
        return
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sylph_tpu.tpu.pipeline import (build_host_index, make_mesh,
                                        make_sharded_profile_step)

    assert len(jax.devices()) == 4 * int(n_procs)
    mesh = make_mesh(len(jax.devices()), dp=int(n_procs))

    rng = np.random.default_rng(0)
    c, k, G = 20, 31, 4
    N, L = 32, 64
    bases = rng.integers(0, 4, size=(N, L)).astype(np.uint32)
    lengths = np.full(N, L, np.int32)
    thr = ((1 << 64) - 1) // c
    genomes = [rng.integers(0, thr, size=100, dtype=np.uint64)
               for _ in range(G)]
    idx = build_host_index(genomes, pad_multiple=len(jax.devices()) * 8)

    fn, _ = make_sharded_profile_step(mesh, c=c, k=k, n_genomes=G,
                                      n_buckets=32, min_ani=0.0)

    def put(arr, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(arr.shape, sh,
                                            lambda i: arr[i])

    args = (put(bases, P("dp", None)), put(lengths, P("dp")),
            put(idx.hi, P(("dp", "ip"))), put(idx.lo, P(("dp", "ip"))),
            put(idx.genome_ids, P(("dp", "ip"))), put(idx.n_kmers, P()))
    hist, st = fn(*args)
    # hist is replicated (out_spec P()): every process holds a full copy
    local = np.asarray(hist.addressable_shards[0].data)
    if int(pid) == 0:
        np.save(out_path, local)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
