"""Distributed counting Bloom filter (data-parallel incrementAll).

The reference's incrementAll (CountingBloomFilter.hpp:165-183) is a
saturating per-counter increment — commutative, so it distributes exactly:
each chip scatter-adds its shard's occurrence counts into a wide (uint32)
local histogram, histograms merge with a psum, and the saturating apply
produces counters identical to any sequential insertion order.

Conservative update (incrementMin) is order-dependent and does NOT admit an
exact distributed merge; use models.counting.insert on a single stream for
bit-exact parity, or accept the documented approximation of applying
per-shard conservative updates then taking elementwise max.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models import counting as counting_mod
from ..ops import nthash, u64
from ..ops.u64 import U64
from .mesh import AXIS


def dp_insert_all_seq(mesh: Mesh, cbf: counting_mod.CountingBloomFilter,
                      codes) -> counting_mod.CountingBloomFilter:
    """Data-parallel incrementAll over a [B, L] code batch (B divisible by
    the mesh size); exact."""

    k, h, size = cbf.kmer_size, cbf.hash_num, cbf.size

    def local(counters, codes_shard):
        f = nthash.hash_frames(codes_shard, k, h)
        pos = u64.mod_to_index(
            U64(f.hashes.hi.reshape(-1), f.hashes.lo.reshape(-1)), size
        ).astype(jnp.int32)
        v = jnp.broadcast_to(f.valid[..., None],
                             f.hashes.hi.shape).reshape(-1)
        occ = jnp.zeros((size,), jnp.uint32).at[pos].add(
            v.astype(jnp.uint32), mode="drop")
        total = lax.psum(occ, AXIS)
        wide = counters.astype(jnp.uint32) + total
        return jnp.minimum(wide, jnp.uint32(cbf.counter_max)).astype(
            counters.dtype)

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P(AXIS)),
                           out_specs=P(), check_vma=False))
    counters = fn(cbf.counters, jnp.asarray(codes))
    return dataclasses.replace(cbf, counters=counters)


def dp_contains_seq(mesh: Mesh, cbf: counting_mod.CountingBloomFilter,
                    codes):
    """Data-parallel membership: batch sharded, counters replicated."""
    k, h = cbf.kmer_size, cbf.hash_num

    def local(counters, codes_shard):
        f = nthash.hash_frames(codes_shard, k, h)
        rep = dataclasses.replace(cbf, counters=counters)
        return counting_mod.contains(rep, f.hashes) & f.valid, f.valid

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=(P(), P(AXIS)),
                           out_specs=(P(AXIS), P(AXIS)), check_vma=False))
    return fn(cbf.counters, jnp.asarray(codes))
