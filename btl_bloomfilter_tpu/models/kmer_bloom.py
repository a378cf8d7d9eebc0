"""KmerBloomFilter: a Bloom filter that hashes sequences internally.

Mirrors /root/reference/KmerBloomFilter.hpp (a BloomFilter subclass whose
insert/contains take raw k-mer strings and hash via NTC64 + NTE64
derivation, KmerBloomFilter.hpp:47-74) and the whole-sequence helper
insertSeq (/root/reference/BloomFilterUtil.h:9-17).

In the TPU design there is no subclass: the state *is* a
models.bloom.BloomFilter; these are sequence-level wrappers that fuse
hashing and filter access in one jitted graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nthash, nthash_tables
from . import bloom


def _hash_kernel_eligible(bf: bloom.BloomFilter, codes) -> bool:
    """Route through the fused ntHash scan kernel (kernels/nthash_scan):
    hashing, Barrett mod, and the invalid-window sentinel all happen in
    one VMEM pass, skipping every intermediate HBM plane of the XLA
    prefix-scan path."""
    return (jax.default_backend() != "cpu" and codes.ndim == 2
            and 1 < bf.kmer_size <= 128 and bf.size < (1 << 32)
            and codes.shape[-1] >= bf.kmer_size)


def insert_seq(bf: bloom.BloomFilter, codes,
               use_hash_kernel: bool | None = None) -> bloom.BloomFilter:
    """Insert every valid k-mer window of a sequence (or batch of equal-
    length sequences) into the filter. Equivalent to insertSeq
    (BloomFilterUtil.h:9-17): ntHashIterator drained into insert."""
    codes = jnp.asarray(codes)
    if use_hash_kernel is None:
        use_hash_kernel = _hash_kernel_eligible(bf, codes)
    if use_hash_kernel:
        from ..kernels import nthash_scan
        pos, _strand, _valid = nthash_scan.positions_planes_kernel(
            codes, bf.kmer_size, bf.hash_num, bf.size)
        return bloom.insert_sentinel_positions(bf, pos)
    frames = nthash.hash_frames(codes, bf.kmer_size, bf.hash_num)
    return bloom.insert(bf, frames.hashes, frames.valid)


def contains_seq(bf: bloom.BloomFilter, codes,
                 use_hash_kernel: bool | None = None):
    """Membership of every window. Returns (contains bool[..., W],
    valid bool[..., W]); invalid windows are reported False."""
    codes = jnp.asarray(codes)
    if use_hash_kernel is None:
        use_hash_kernel = _hash_kernel_eligible(bf, codes)
    if use_hash_kernel:
        from ..kernels import nthash_scan
        pos, _strand, valid = nthash_scan.positions_planes_kernel(
            codes, bf.kmer_size, bf.hash_num, bf.size)
        return bloom.contains_sentinel_positions(bf, pos), valid
    frames = nthash.hash_frames(codes, bf.kmer_size, bf.hash_num)
    hit = bloom.contains(bf, frames.hashes)
    return hit & frames.valid, frames.valid


def insert_kmers(bf: bloom.BloomFilter, kmer_codes) -> bloom.BloomFilter:
    """Insert a batch of fixed-length k-mers: codes[..., k]. Equivalent to
    KmerBloomFilter::insert(const char*) (KmerBloomFilter.hpp:63-74) per
    k-mer. K-mers containing non-ACGT hash through seed 0 exactly as the
    reference's NTC64-on-char* path does for 'N'."""
    kmer_codes = jnp.asarray(kmer_codes)
    frames = nthash.hash_kmers(kmer_codes, bf.kmer_size, bf.hash_num)
    return bloom.insert(bf, frames.hashes)


def contains_kmers(bf: bloom.BloomFilter, kmer_codes):
    """Membership for a batch of fixed-length k-mers (codes[..., k])."""
    kmer_codes = jnp.asarray(kmer_codes)
    frames = nthash.hash_kmers(kmer_codes, bf.kmer_size, bf.hash_num)
    return bloom.contains(bf, frames.hashes)


# Convenience string-level API (host-side encoding) ------------------------

def insert_string(bf: bloom.BloomFilter, seq: str) -> bloom.BloomFilter:
    return insert_seq(bf, nthash_tables.encode_seq(seq))


def contains_string(bf: bloom.BloomFilter, kmer: str):
    codes = nthash_tables.encode_seq(kmer)
    return contains_kmers(bf, codes)
