"""sylph_tpu — TPU-native metagenomic FracMinHash sketching & profiling engine.

A brand-new JAX/XLA/Pallas implementation with the capabilities of sylph
(bluenote-1577/sylph, Nature Biotechnology 2024): FracMinHash k-mer sketching
of reads and genome databases, containment-ANI querying with zero-truncated
Poisson coverage correction, and species-level taxonomic profiling.

Architecture (TPU-first, not a port):
  - kmer/    exact 64-bit k-mer hashing + FracMinHash seeding (numpy oracle)
  - io/      FASTX parsing, 2-bit packing, bincode-compatible .syldb/.sylsp
  - core/    sketch construction (reads w/ dedup, genomes w/ spacing filter)
  - stats/   coverage statistics: lambda estimators, Poisson outlier cut,
             wyrand bootstrap CIs (all f64, histogram-based)
  - engine/  containment + profiling orchestration
  - tpu/     device kernels: uint32-pair 64-bit arithmetic, vectorized
             FracMinHash extraction, sharded containment over a device mesh

Reference behavior is documented per-function with sylph file:line citations.
"""

__version__ = "0.1.0"
