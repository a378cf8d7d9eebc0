"""Blocked Bloom filter — the TPU-native flagship variant.

Not in the reference (new capability): all h bits of a k-mer live in one
512-bit block, so a membership test costs ONE 16-word row gather instead
of h scattered word gathers. On TPU, XLA charges gathers per *index*
(measured ~15 ns/row regardless of row width), which makes the blocked
layout ~4x faster to query than the classic layout at equal h; inserts
reuse the classic sorted-scatter path. This is the same cache-line-blocking
idea production CPU/GPU Bloom filters use, mapped to TPU gather economics.

Derivation: block = canonical_hash mod nblocks; the h in-block bit offsets
come from the ntHash multiply-shift-XOR stream (ops.nthash.derive_hashes),
using 9 low bits of each derived hash. The false-positive rate is the
block-local one: slightly above the classic filter at equal size (standard
blocked-Bloom tradeoff; see docs/PERFORMANCE.md).

Serialization uses its own magic (``BTLTpuBlockedBloom_v1``); this format
intentionally does not exist in the C++ reference.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nthash, u64
from ..ops.u64 import U64
from . import bloom

BLOCK_BITS = 512
WORDS_PER_BLOCK = BLOCK_BITS // 32

MAGIC = "BTLTpuBlockedBloom_v1"


@partial(jax.tree_util.register_dataclass,
         data_fields=["rows"],
         meta_fields=["size", "hash_num", "kmer_size"])
@dataclasses.dataclass
class BlockedBloomFilter:
    rows: jax.Array        # uint32[nblocks, 16]
    size: int              # total bits (multiple of 512)
    hash_num: int
    kmer_size: int

    @property
    def nblocks(self) -> int:
        return self.size // BLOCK_BITS

    @property
    def size_in_bytes(self) -> int:
        return self.size // 8


def create(size: int, hash_num: int, kmer_size: int) -> BlockedBloomFilter:
    if size % BLOCK_BITS:
        raise ValueError(f"size must be a multiple of {BLOCK_BITS}")
    return BlockedBloomFilter(
        rows=jnp.zeros((size // BLOCK_BITS, WORDS_PER_BLOCK), jnp.uint32),
        size=size, hash_num=hash_num, kmer_size=kmer_size)


def _block_and_bits(bf: BlockedBloomFilter, canon: U64):
    """block index [...] plus h in-block bit offsets [..., h]."""
    block = u64.mod_to_index(canon, bf.nblocks)
    derived = nthash.derive_hashes(canon, bf.kmer_size, bf.hash_num + 1)
    # skip slot 0 (the base hash selects the block); use 9 low bits of the
    # h derived hashes for in-block offsets
    bits = derived.lo[..., 1:] & jnp.uint32(BLOCK_BITS - 1)
    return block.astype(jnp.uint32), bits


def insert(bf: BlockedBloomFilter, canon: U64, valid=None
           ) -> BlockedBloomFilter:
    """Insert canonical hashes (U64[...]). Positions become global bit
    positions and ride the classic dedupe-sort + scatter path."""
    block, bits = _block_and_bits(bf, canon)
    pos = (block[..., None] * jnp.uint32(BLOCK_BITS) + bits).reshape(-1)
    if valid is not None:
        v = jnp.broadcast_to(jnp.asarray(valid)[..., None],
                             bits.shape).reshape(-1)
        pos = jnp.where(v, pos, jnp.uint32(0xFFFFFFFF))
    pos_s = jax.lax.sort((pos,), is_stable=False)[0]
    keep = jnp.ones(pos_s.shape, bool).at[1:].set(pos_s[1:] != pos_s[:-1])
    keep = keep & (pos_s != jnp.uint32(0xFFFFFFFF))
    nwords = bf.nblocks * WORDS_PER_BLOCK
    flat = bf.rows.reshape(-1)
    delta = bloom.sorted_delta_words(pos_s, keep, nwords)
    return dataclasses.replace(
        bf, rows=(flat | delta).reshape(bf.rows.shape))


def contains(bf: BlockedBloomFilter, canon: U64) -> jax.Array:
    """Membership for canonical hashes (U64[...]): one row gather each,
    then the probed word per hash is picked with 16 lane-selects on
    [..., h]-shaped arrays (measured 24.6 ms vs 30.2 ms per 1M-kmer step
    for a materialized [..., h, 16] one-hot mask row)."""
    block, bits = _block_and_bits(bf, canon)
    got = bf.rows[block.astype(jnp.int32)]          # [..., 16] row gather
    word = (bits >> 5).astype(jnp.int32)            # [..., h]
    sel = jnp.zeros(bits.shape, jnp.uint32)
    for ww in range(WORDS_PER_BLOCK):
        sel = jnp.where(word == ww, got[..., ww:ww + 1], sel)
    hit = ((sel >> (bits & 31)) & jnp.uint32(1)) == 1
    return jnp.all(hit, axis=-1)


def insert_frames(bf: BlockedBloomFilter, frames) -> BlockedBloomFilter:
    canon = U64(frames.hashes.hi[..., 0], frames.hashes.lo[..., 0])
    return insert(bf, canon, frames.valid)


def contains_frames(bf: BlockedBloomFilter, frames) -> jax.Array:
    canon = U64(frames.hashes.hi[..., 0], frames.hashes.lo[..., 0])
    return contains(bf, canon) & frames.valid


def fpr(bf: BlockedBloomFilter, n_inserted: int) -> float:
    """Expected block-local FPR after n insertions (Putze et al. style:
    Poisson over per-block load)."""
    lam = n_inserted * BLOCK_BITS / bf.size
    total, p = 0.0, math.exp(-lam)
    for i in range(0, int(lam + 10 * math.sqrt(lam + 1)) + 1):
        local = (1.0 - (1.0 - 1.0 / BLOCK_BITS) ** (i * bf.hash_num)) \
            ** bf.hash_num
        total += p * local
        p *= lam / (i + 1)
    return total


# --- serialization (native format, not in the reference) ------------------

def store(bf: BlockedBloomFilter, path: str) -> None:
    from ..io import bf_format

    header = bf_format._header_bytes(MAGIC, [
        "BlockBits", "KmerSize", "HashNum", "BloomFilterSize",
        "BloomFilterSizeInBytes"], {
        "BlockBits": BLOCK_BITS, "KmerSize": bf.kmer_size,
        "HashNum": bf.hash_num, "BloomFilterSize": bf.size,
        "BloomFilterSizeInBytes": bf.size_in_bytes})
    with open(path, "wb") as f:
        f.write(header)
        f.write(np.asarray(bf.rows, dtype="<u4").tobytes())


def load(path: str) -> BlockedBloomFilter:
    from ..io import bf_format

    with open(path, "rb") as f:
        data = f.read()
    fields, off = bf_format.parse_header(data, MAGIC)
    size = int(fields["BloomFilterSize"])
    rows = np.frombuffer(data, dtype="<u4", count=size // 32,
                         offset=off).reshape(-1, WORDS_PER_BLOCK)
    return BlockedBloomFilter(rows=jnp.asarray(rows.copy()), size=size,
                              hash_num=int(fields["HashNum"]),
                              kmer_size=int(fields["KmerSize"]))
