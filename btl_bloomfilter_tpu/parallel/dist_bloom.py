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
    if size // p >= (1 << 32):
        raise ValueError("per-shard size must stay below 2**32 bits so "
                         "local offsets fit one uint32 limb; add shards")
    words = jnp.zeros((p, size // p // 32), jnp.uint32)
    words = jax.device_put(words, NamedSharding(mesh, P(AXIS)))
    return ShardedBloomFilter(words=words, size=size, hash_num=hash_num,
                              kmer_size=kmer_size, num_shards=p)


def _default_cap(n: int, p: int) -> int:
    """Send-buffer slots per destination shard: ~2x the expected per-shard
    load of a uniform hash stream (rounded up to 8), clamped to n. The
    multi-round repair loop below makes any cap exact; this choice just
    makes repair rounds statistically absent."""
    c = 2 * ((n + p - 1) // p)
    c = min(n, ((c + 7) // 8) * 8)
    return max(c, 1)


def route_prepare(payload: jax.Array, owner: jax.Array, p: int):
    """Owner-sort a uint32 payload for round-based routing.

    ``owner`` is each entry's destination shard in [0, p), or p for
    entries to drop (they sort last and are never sent). Returns
    (payload_s, owner_s, slot, order, counts): payload sorted by owner,
    each entry's within-owner slot, the sort permutation, and per-owner
    counts."""
    n = payload.shape[0]
    order = jnp.argsort(owner)
    owner_s = owner[order]
    payload_s = payload[order]
    counts = jnp.bincount(owner_s.astype(jnp.int32), length=p + 1)[:p]
    starts = jnp.concatenate([jnp.zeros(1, counts.dtype),
                              jnp.cumsum(counts)[:-1]])
    slot = jnp.arange(n) - starts[jnp.minimum(owner_s, p - 1)]
    return payload_s, owner_s, slot, order, counts


def _route_local_sorted(r: U64, valid: jax.Array, shard_bits: int, p: int):
    """Owner-sort global positions (U64 limb pair) for round-based
    routing, decomposed as (owner, LOCAL offset): local offsets fit one
    uint32 limb whenever ``shard_bits < 2**32``, so sharded filters scale
    to p * (2**32 - 32) bits — the reference's size_t addressing
    (BloomFilter.hpp:190-192) with the 32-bit-per-limb layout. Routing
    local offsets also removes the per-receiver base subtraction. Invalid
    positions get owner p (dropped); see route_prepare."""
    owner64, local64 = u64.divmod_const(r, shard_bits)
    owner = jnp.minimum(owner64.lo, jnp.uint32(p - 1))
    owner = jnp.where(valid, owner, jnp.uint32(p))  # invalid sorts last
    return route_prepare(local64.lo, owner, p)


def _round_sendbuf(pos_s, owner_s, slot, p: int, cap: int, rnd):
    """Send buffer [p, cap] for repair round ``rnd`` (round 0 carries slots
    [0, cap), round r slots [r*cap, (r+1)*cap))."""
    sentinel = jnp.uint32(0xFFFFFFFF)
    lo = rnd * cap
    ok = (owner_s < p) & (slot >= lo) & (slot < lo + cap)
    dest_row = jnp.where(ok, owner_s.astype(jnp.int32), p)
    dest_col = jnp.where(ok, (slot - lo).astype(jnp.int32), 0)
    return jnp.full((p, cap), sentinel).at[dest_row, dest_col].set(
        jnp.where(ok, pos_s, sentinel), mode="drop")


def sharded_insert_frames(mesh: Mesh, sbf: ShardedBloomFilter, hashes: U64,
                          valid=None, cap: int | None = None):
    """Insert frames (hashes U64[B, W, h] with B divisible by mesh size).

    Returns (new_filter, rerouted_count). The result is always exact: if a
    destination shard receives more than ``cap`` positions, the remainder is
    delivered in extra all_to_all rounds (a lax.while_loop that runs until
    every device's deepest send queue drains). rerouted_count reports how
    many positions needed extra rounds — statistically zero at the default
    cap (~2x the expected per-shard load)."""
    p = sbf.num_shards
    shard_bits = sbf.shard_bits

    def local(words, hi, lo, v):
        n = hi.size
        flat = U64(hi.reshape(-1), lo.reshape(-1))
        r = u64.mod_const(flat, sbf.size)
        vv = jnp.broadcast_to(v[..., None], hi.shape).reshape(-1)
        c = _default_cap(n, p) if cap is None else min(cap, n)
        pos_s, owner_s, slot, _, counts = _route_local_sorted(
            r, vv, shard_bits, p)
        sent = jnp.uint32(0xFFFFFFFF)

        def apply_round(words_flat, rnd):
            buf = _round_sendbuf(pos_s, owner_s, slot, p, c, rnd)
            # received entries are LOCAL bit offsets within my shard
            local_pos = lax.all_to_all(buf, AXIS, split_axis=0,
                                       concat_axis=0).reshape(-1)
            # dedupe by sorting positions so scatter-add == scatter-OR
            ps = lax.sort((local_pos,), is_stable=False)[0]
            keep = jnp.ones(ps.shape, bool).at[1:].set(ps[1:] != ps[:-1])
            keep = keep & (ps != sent)
            return words_flat | bloom.sorted_delta_words(ps, keep,
                                                         words.shape[-1])

        w = apply_round(words[0], 0)
        # exact repair: any shard whose send queue is deeper than cap gets
        # the remainder in later rounds (all devices loop in lockstep)
        max_count = lax.pmax(jnp.max(counts), AXIS)
        w = lax.while_loop(
            lambda st: st[0] * c < max_count,
            lambda st: (st[0] + 1, apply_round(st[1], st[0])),
            (jnp.int32(1), w))[1]
        rerouted = jnp.sum(jnp.maximum(counts - c, 0))
        return w[None], rerouted[None]

    if sbf.shard_bits >= (1 << 32):
        raise NotImplementedError("sharded routing requires per-shard "
                                  "size < 2**32 bits (add shards)")
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
    """Query frames against the sharded filter; returns bool[B, W].

    Exact for any ``cap``: positions that do not fit a round's send buffer
    are answered in extra all_to_all rounds (never silently dropped), so the
    Bloom contract — no false negatives — holds (BloomFilter.hpp:237-262)."""
    p = sbf.num_shards
    shard_bits = sbf.shard_bits
    if shard_bits >= (1 << 32):
        raise NotImplementedError("sharded routing requires per-shard "
                                  "size < 2**32 bits (add shards)")

    def local(words, hi, lo):
        shape = hi.shape
        n = hi.size
        flat = U64(hi.reshape(-1), lo.reshape(-1))
        r = u64.mod_const(flat, sbf.size)
        vv = jnp.ones((n,), bool)
        c = _default_cap(n, p) if cap is None else min(cap, n)
        pos_s, owner_s, slot, order, counts = _route_local_sorted(
            r, vv, shard_bits, p)
        sent = jnp.uint32(0xFFFFFFFF)

        def apply_round(acc, rnd):
            buf = _round_sendbuf(pos_s, owner_s, slot, p, c, rnd)
            # received entries are LOCAL bit offsets within my shard
            recv = lax.all_to_all(buf, AXIS, split_axis=0, concat_axis=0)
            local_pos = recv.reshape(-1)
            ok = (recv != sent).reshape(-1)
            word = jnp.where(ok, (local_pos >> 5).astype(jnp.int32), 0)
            got = words[0][word]
            hit = ((got >> (local_pos & 31)) & 1).astype(jnp.uint32)
            # route each bit result back to the shard that asked for it
            back = lax.all_to_all(hit.reshape(p, c), AXIS, split_axis=0,
                                  concat_axis=0)
            # back[j, s] = bit result for my round-``rnd`` slot s to shard j
            active = (owner_s < p) & (slot >= rnd * c) & (slot < (rnd + 1) * c)
            mine = back[jnp.where(active, owner_s, 0).astype(jnp.int32),
                        jnp.where(active, slot - rnd * c, 0).astype(jnp.int32)]
            return jnp.where(active, mine, acc)

        acc = apply_round(jnp.zeros((n,), jnp.uint32), 0)
        max_count = lax.pmax(jnp.max(counts), AXIS)
        acc = lax.while_loop(
            lambda st: st[0] * c < max_count,
            lambda st: (st[0] + 1, apply_round(st[1], st[0])),
            (jnp.int32(1), acc))[1]
        unsorted = jnp.zeros((n,), jnp.uint32).at[order].set(acc)
        hits = unsorted.reshape(shape)
        return jnp.all(hits == 1, axis=-1)

    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                           out_specs=P(AXIS)))
    return fn(sbf.words, hashes.hi, hashes.lo)
