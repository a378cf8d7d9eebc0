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


def insert_seq(bf: bloom.BloomFilter, codes) -> bloom.BloomFilter:
    """Insert every valid k-mer window of a sequence (or batch of equal-
    length sequences) into the filter. Equivalent to insertSeq
    (BloomFilterUtil.h:9-17): ntHashIterator drained into insert."""
    codes = jnp.asarray(codes)
    frames = nthash.hash_frames(codes, bf.kmer_size, bf.hash_num)
    return bloom.insert(bf, frames.hashes, frames.valid)


def contains_seq(bf: bloom.BloomFilter, codes):
    """Membership of every window. Returns (contains bool[..., W],
    valid bool[..., W]); invalid windows are reported False."""
    codes = jnp.asarray(codes)
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
