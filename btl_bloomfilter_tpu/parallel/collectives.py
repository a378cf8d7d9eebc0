"""Collectives XLA does not provide natively: bitwise-OR and saturating-add
allreduce.

XLA exposes add/min/max allreduce (psum etc.) but no bitwise-OR, and the
reference's merge concept — N workers hammering one shared bit array with
atomic ORs (BloomFilter.hpp:177) — needs exactly an OR-allreduce when each
chip holds a partial filter. These run *inside shard_map* over the mesh
axis.

Two implementations:
  * ``or_allreduce_butterfly`` — recursive-doubling: log2(P) rounds of
    ppermute + local OR, each moving the full array. Lowest latency; traffic
    log2(P) x size per device.
  * ``or_allreduce_rsag`` — Rabenseifner: reduce-scatter by halving
    (log2(P) rounds, round r moves size/2^r) then all-gather. Traffic
    ~2 x size per device; the bandwidth-optimal choice for big filters.

Saturating-add merge for counting filters is exact as a wide psum + clamp:
per-increment freezing commutes with summation because counts are monotone.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .mesh import AXIS


def _axis_size(axis_name):
    return lax.axis_size(axis_name)


def or_allreduce_butterfly(x: jax.Array, axis_name: str = AXIS) -> jax.Array:
    """Bitwise-OR allreduce by recursive doubling (inside shard_map)."""
    p = _axis_size(axis_name)
    if p & (p - 1):
        # non-power-of-two: fall back to gather+reduce
        gathered = lax.all_gather(x, axis_name)
        return jax.tree_util.tree_reduce(
            lambda a, b: a | b, list(gathered))
    step = 1
    while step < p:
        # partner = rank XOR step: a permutation, expressible as ppermute
        perm = [(r, r ^ step) for r in range(p)]
        other = lax.ppermute(x, axis_name, perm)
        x = x | other
        step <<= 1
    return x


def or_allreduce_rsag(x: jax.Array, axis_name: str = AXIS) -> jax.Array:
    """Bandwidth-optimal OR-allreduce: halving reduce-scatter + all-gather.

    Requires power-of-two axis size and len(x) divisible by the axis size.
    """
    p = _axis_size(axis_name)
    n = x.shape[0]
    if p & (p - 1) or n % p:
        return or_allreduce_butterfly(x, axis_name)
    rank = lax.axis_index(axis_name)

    # reduce-scatter by recursive halving. Chunk widths are static python
    # ints (n/2, n/4, ...); only the chunk *offset* is traced.
    step = p // 2
    width = n
    lo = jnp.int32(0)
    buf = x
    while step >= 1:
        half = width // 2
        # partner differs in this bit; lower-ranked half keeps the low chunk
        perm = [(r, r ^ step) for r in range(p)]
        upper = (rank & step) != 0
        mine_lo = jnp.where(upper, lo + half, lo)
        send_lo = jnp.where(upper, lo, lo + half)
        send = lax.dynamic_slice_in_dim(buf, send_lo, half)
        recv = lax.ppermute(send, axis_name, perm)
        keep = lax.dynamic_slice_in_dim(buf, mine_lo, half)
        buf = lax.dynamic_update_slice_in_dim(buf, keep | recv, mine_lo, 0)
        lo = mine_lo
        width = half
        step //= 2

    # all-gather by recursive doubling (exchange owned chunks back)
    step = 1
    while step < p:
        perm = [(r, r ^ step) for r in range(p)]
        upper = (rank & step) != 0
        send = lax.dynamic_slice_in_dim(buf, lo, width)
        recv = lax.ppermute(send, axis_name, perm)
        other_lo = jnp.where(upper, lo - width, lo + width)
        buf = lax.dynamic_update_slice_in_dim(buf, recv, other_lo, 0)
        lo = jnp.where(upper, lo - width, lo)
        width *= 2
        step <<= 1
    return buf


def saturating_add_allreduce(counts: jax.Array, cap: int,
                             axis_name: str = AXIS) -> jax.Array:
    """Allreduce of per-device occurrence counts with a saturation cap.

    counts must be wide enough (uint32) that the un-clamped sum cannot wrap.
    """
    total = lax.psum(counts, axis_name)
    return jnp.minimum(total, jnp.asarray(cap, counts.dtype))
