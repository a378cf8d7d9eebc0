"""Distributed Bloom filters over a device mesh.

Brand-new design (the reference is single-process shared-memory only;
SURVEY.md §2). Two strategies, both pure shard_map programs over the 1-D
mesh axis:

  * **Replicated / data-parallel** (`dp_insert_seq`): every chip holds the
    full bit array, hashes its own shard of the read batch, builds a local
    delta, and partial filters merge with a bitwise-OR allreduce. Right
    when the filter fits in one chip's HBM. Bit-OR commutes, so the result
    is identical to a serial build.

  * **Sharded** (`ShardedBloom*`): the bit array is split into P contiguous
    shards. Each chip hashes locally, buckets positions by owning shard,
    exchanges them with one `all_to_all`, and scatter-ORs its received
    positions locally. Queries route positions the same way and return the
    gathered bits with a second `all_to_all`. Right when the filter exceeds
    one chip's HBM; collectives ride ICI.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import bloom
from ..ops import nthash, u64
from ..ops.u64 import U64
from . import collectives
from .mesh import AXIS


# ---------------------------------------------------------------------------
# replicated (data-parallel) build
# ---------------------------------------------------------------------------

def dp_insert_seq(mesh: Mesh, bf: bloom.BloomFilter, codes) -> bloom.BloomFilter:
    """Data-parallel sequence insertion: ``codes`` is [B, L] with B divisible
    by the mesh size; the filter is replicated and merged via OR-allreduce.
    """

    def local(words, codes_shard):
        frames = nthash.hash_frames(codes_shard, bf.kmer_size, bf.hash_num)
        zero = dataclasses.replace(bf, words=jnp.zeros_like(words))
        delta = bloom.insert(zero, frames.hashes, frames.valid).words
        merged = collectives.or_allreduce_rsag(delta)
        return words | merged

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P(AXIS)),
                           out_specs=P(), check_vma=False))
    new_words = fn(bf.words, jnp.asarray(codes))
    return dataclasses.replace(bf, words=new_words)


def dp_contains_seq(mesh: Mesh, bf: bloom.BloomFilter, codes):
    """Data-parallel query: batch sharded, filter replicated."""

    def local(words, codes_shard):
        f = nthash.hash_frames(codes_shard, bf.kmer_size, bf.hash_num)
        rep = dataclasses.replace(bf, words=words)
        return bloom.contains(rep, f.hashes) & f.valid, f.valid

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P(AXIS)),
                           out_specs=(P(AXIS), P(AXIS)), check_vma=False))
    return fn(bf.words, jnp.asarray(codes))


# ---------------------------------------------------------------------------
# sharded filter
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["words"],
         meta_fields=["size", "hash_num", "kmer_size", "num_shards"])
@dataclasses.dataclass
class ShardedBloomFilter:
    """Bit array split into ``num_shards`` contiguous shards.

    ``words`` is uint32[num_shards, words_per_shard]; place it with
    ``mesh_lib.sharded(mesh)`` so shard i lives on device i."""

    words: jax.Array
    size: int
    hash_num: int
    kmer_size: int
    num_shards: int

    @property
    def shard_bits(self) -> int:
        return self.size // self.num_shards


def create_sharded(mesh: Mesh, size: int, hash_num: int, kmer_size: int
                   ) -> ShardedBloomFilter:
    p = mesh.devices.size
    if size % (p * 32) != 0:
        raise ValueError(f"size must be a multiple of 32*num_shards ({p*32})")
    words = jnp.zeros((p, size // p // 32), jnp.uint32)
    words = jax.device_put(words, NamedSharding(mesh, P(AXIS)))
    return ShardedBloomFilter(words=words, size=size, hash_num=hash_num,
                              kmer_size=kmer_size, num_shards=p)


def _route(positions: jax.Array, valid: jax.Array, shard_bits: int, p: int,
           cap: int):
    """Bucket positions by owning shard into a [p, cap] send buffer.

    Returns (sendbuf, order, slot, owner, overflow) where sendbuf uses
    0xFFFFFFFF as the padding sentinel. positions uint32 [N] are *global*
    bit positions (routing requires size <= 2**32 bits)."""
    n = positions.shape[0]
    sentinel = jnp.uint32(0xFFFFFFFF)
    pos = jnp.where(valid, positions.astype(jnp.uint32), sentinel)
    owner = jnp.minimum(pos // jnp.uint32(shard_bits), jnp.uint32(p - 1))
    owner = jnp.where(valid, owner, jnp.uint32(p))  # invalid sorts last
    order = jnp.argsort(owner)
    owner_s = owner[order]
    pos_s = pos[order]
    counts = jnp.bincount(owner_s.astype(jnp.int32), length=p + 1)[:p]
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype),
                              jnp.cumsum(counts)[:-1]])
    slot = jnp.arange(n) - starts[jnp.minimum(owner_s, p - 1)]
    sendbuf = jnp.full((p, cap), sentinel)
    ok = (owner_s < p) & (slot < cap)
    dest_row = jnp.where(ok, owner_s.astype(jnp.int32), p)
    dest_col = jnp.where(ok, slot.astype(jnp.int32), 0)
    sendbuf = sendbuf.at[dest_row, dest_col].set(
        jnp.where(ok, pos_s, sentinel), mode="drop")
    overflow = jnp.sum(jnp.maximum(counts - cap, 0))
    return sendbuf, order, slot, owner_s, overflow


def sharded_insert_frames(mesh: Mesh, sbf: ShardedBloomFilter, hashes: U64,
                          valid=None, cap: int | None = None):
    """Insert frames (hashes U64[B, W, h] with B divisible by mesh size).

    Returns (new_filter, overflow_count). overflow_count > 0 means ``cap``
    was too small and some positions were dropped — callers should size
    cap >= ~2 * positions_per_device / num_shards or pass cap=None (exact,
    worst-case buffer)."""
    p = sbf.num_shards
    shard_bits = sbf.shard_bits
    h = hashes.hi.shape[-1]

    def local(words, hi, lo, v):
        n = hi.size
        flat = U64(hi.reshape(-1), lo.reshape(-1))
        r = u64.mod_const(flat, sbf.size)
        pos = r.lo  # size < 2**32 per current routing (checked below)
        vv = jnp.broadcast_to(v[..., None], hi.shape).reshape(-1)
        c = n if cap is None else cap
        sendbuf, _, _, _, overflow = _route(pos, vv, shard_bits, p, c)
        recv = lax.all_to_all(sendbuf, AXIS, split_axis=0, concat_axis=0)
        recv = recv.reshape(-1)  # all positions destined to me (global)
        my_rank = lax.axis_index(AXIS)
        base = (my_rank.astype(jnp.uint32)) * jnp.uint32(shard_bits)
        sent = jnp.uint32(0xFFFFFFFF)
        ok = recv != sent
        local_pos = jnp.where(ok, recv - base, sent)
        # dedupe by sorting positions so scatter-add == scatter-OR
        pos_s = jnp.sort(local_pos)
        keep = jnp.ones(pos_s.shape, bool).at[1:].set(pos_s[1:] != pos_s[:-1])
        keep = keep & (pos_s != sent)
        delta = bloom.sorted_delta_words(pos_s, keep, words.shape[-1])
        return (words[0] | delta)[None], overflow[None]

    if sbf.size > (1 << 32):
        raise NotImplementedError("sharded routing currently requires "
                                  "size <= 2**32 bits")
    if valid is None:
        valid = jnp.ones(hashes.hi.shape[:-1], bool)
    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                           out_specs=(P(AXIS), P(AXIS))))
    words, overflow = fn(sbf.words, hashes.hi, hashes.lo,
                         jnp.asarray(valid))
    return dataclasses.replace(sbf, words=words), jnp.sum(overflow)


def sharded_contains_frames(mesh: Mesh, sbf: ShardedBloomFilter, hashes: U64,
                            cap: int | None = None):
    """Query frames against the sharded filter; returns bool[B, W]."""
    p = sbf.num_shards
    shard_bits = sbf.shard_bits

    def local(words, hi, lo):
        shape = hi.shape
        n = hi.size
        flat = U64(hi.reshape(-1), lo.reshape(-1))
        r = u64.mod_const(flat, sbf.size)
        pos = r.lo
        vv = jnp.ones((n,), bool)
        c = n if cap is None else cap
        sendbuf, order, slot, owner_s, _ = _route(pos, vv, shard_bits, p, c)
        recv = lax.all_to_all(sendbuf, AXIS, split_axis=0, concat_axis=0)
        my_rank = lax.axis_index(AXIS)
        base = my_rank.astype(jnp.uint32) * jnp.uint32(shard_bits)
        local_pos = (recv - base).reshape(-1)
        ok = (recv != jnp.uint32(0xFFFFFFFF)).reshape(-1)
        word = jnp.where(ok, (local_pos >> 5).astype(jnp.int32), 0)
        got = words[0][word]
        hit = ((got >> (local_pos & 31)) & 1).astype(jnp.uint32)
        # route each bit result back to the shard that asked for it
        back = lax.all_to_all(hit.reshape(p, c), AXIS, split_axis=0,
                              concat_axis=0)
        # back[j, s] = bit result for my send slot s to shard j
        mine = back[jnp.minimum(owner_s, p - 1).astype(jnp.int32),
                    jnp.clip(slot, 0, c - 1).astype(jnp.int32)]
        unsorted = jnp.zeros((n,), jnp.uint32).at[order].set(mine)
        hits = unsorted.reshape(shape)
        return jnp.all(hits == 1, axis=-1)

    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                           out_specs=P(AXIS)))
    return fn(sbf.words, hashes.hi, hashes.lo)
