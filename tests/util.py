"""Shared test helpers."""

import numpy as np


def golden_long_seq(n=300):
    """Replicates the deterministic LCG sequence from gen_golden.cpp."""
    s = 0x9E3779B97F4A7C15
    out = []
    bases = "ACGT"
    for _ in range(n):
        s = (s * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        out.append(bases[(s >> 33) & 3])
    return "".join(out)


def np_bloom_insert(size, hashes_u64):
    """Tiny numpy reference model of the byte-level bit array."""
    arr = np.zeros(size // 8, dtype=np.uint8)
    for hv in np.asarray(hashes_u64, dtype=np.uint64).reshape(-1):
        pos = int(hv) % size
        arr[pos // 8] |= 1 << (pos % 8)
    return arr
