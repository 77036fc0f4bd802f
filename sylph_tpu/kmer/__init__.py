from .hashing import mm_hash64_py, rev_hash64_py, mm_hash64_np, BYTE_TO_SEQ_NP
from .seeding import fmh_seeds_np, fmh_seeds_positions_np, fmh_threshold
