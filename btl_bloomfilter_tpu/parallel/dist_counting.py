"""Distributed counting Bloom filters over a device mesh.

Two axes of scale-out for /root/reference/CountingBloomFilter.hpp, both
brand-new designs (the reference is single-process shared memory):

* **Data-parallel incrementAll** (`dp_insert_all_seq`): the reference's
  incrementAll (CountingBloomFilter.hpp:165-183) is a saturating
  per-counter increment — commutative, so it distributes exactly: each
  chip scatter-adds its shard's occurrence counts into a wide (uint32)
  local histogram, histograms merge with a psum, and the saturating apply
  produces counters identical to any sequential insertion order.

* **Sharded counter plane** (`ShardedCountingBloomFilter`): the counter
  array is split into P contiguous range shards for filters that exceed
  one chip's HBM. incrementAll routes occurrence counts to owners with
  the same exact multi-round all_to_all as the sharded Bloom build;
  queries route positions out and counter values back.

* **Exact distributed conservative update** (`sharded_insert`):
  incrementMin (CountingBloomFilter.hpp:135-162) is order-dependent, but
  a batch only ever reads and writes the counters it touches. So: build
  the (replicated) table of unique touched positions, fetch their values
  from the owner shards with one psum, run the single-device batched-exact
  decomposition (models.counting.insert_positions — group collapse +
  entangled replay) against that compact table on every device, and
  write each updated entry back to its owner. Bit-identical to the
  sequential stream on the concatenated counters, while the counter plane
  itself stays sharded.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
        ).astype(jnp.uint32)
        v = jnp.broadcast_to(f.valid[..., None],
                             f.hashes.hi.shape).reshape(-1)
        if cbf.is_u64:
            occ = jnp.zeros((size,), jnp.uint32).at[pos].add(
                v.astype(jnp.uint32), mode="drop")
            total = lax.psum(occ, AXIS)
            # dual-plane exact u64 add (models.counting.insert_all)
            lo0, hi0 = counters[0], counters[1]
            lo = lo0 + total
            carry = (lo < lo0).astype(jnp.uint32)
            hi = hi0 + carry
            ov = (carry == 1) & (hi0 == jnp.uint32(0xFFFFFFFF))
            lo = jnp.where(ov, jnp.uint32(0xFFFFFFFF), lo)
            hi = jnp.where(ov, jnp.uint32(0xFFFFFFFF), hi)
            return jnp.stack([lo, hi])
        # lane-major occurrence counts fold into the packed words
        per = cbf.counters_per_word
        occ_lm = counting_mod._occ_lane_major(pos, v.astype(jnp.uint32),
                                              per, cbf.nwords)
        total = lax.psum(occ_lm, AXIS)
        return counting_mod._fold_occ(counters, total, cbf.counter_max,
                                      per)

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


# ---------------------------------------------------------------------------
# sharded counter plane
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["counters"],
         meta_fields=["size", "hash_num", "kmer_size", "count_threshold",
                      "counter_width"])
@dataclasses.dataclass
class ShardedCountingBloomFilter:
    """Counter array split into ``num_shards`` contiguous range shards:
    shard s owns counters [s*size/p, (s+1)*size/p). Place ``counters``
    with NamedSharding(mesh, P(AXIS)) so shard i lives on device i."""

    counters: jax.Array        # [p, size // p], dtype per counter_width;
    #                            width 8: [p, 2, size // p] uint32 planes
    #                            (row 0 = low limbs, row 1 = high limbs)
    size: int                  # total number of counters
    hash_num: int
    kmer_size: int
    count_threshold: int
    counter_width: int

    @property
    def num_shards(self) -> int:
        return self.counters.shape[0]

    @property
    def shard_size(self) -> int:
        return self.size // self.counters.shape[0]

    @property
    def is_u64(self) -> bool:
        return self.counter_width == 8

    @property
    def counter_max(self) -> int:
        return (1 << (8 * min(self.counter_width, 4))) - 1


def create_sharded(mesh: Mesh, size_in_bytes: int, hash_num: int,
                   kmer_size: int, count_threshold: int,
                   counter_width: int = 1) -> ShardedCountingBloomFilter:
    """Sharded analog of counting.create: sizeInBytes rounds up to a
    multiple of 8 (CountingBloomFilter.hpp:31-50) and of the shard
    count so every shard holds the same number of counters."""
    p = mesh.devices.size
    size_in_bytes += -size_in_bytes % (8 * p)
    size = size_in_bytes // counter_width
    if size // p >= (1 << 32):
        raise ValueError("per-shard size must stay below 2**32 counters "
                         "so local offsets fit one uint32 limb; add "
                         "shards")
    # shards stay per-counter-dtype planes (the routing works on counter
    # indices; the single-device filter packs words instead — see
    # models/counting.py storage note). Width 8 shards are dual uint32
    # planes (the counting filter's u64 pattern).
    if counter_width == 8:
        counters = jax.device_put(jnp.zeros((p, 2, size // p), jnp.uint32),
                                  NamedSharding(mesh, P(AXIS)))
        return ShardedCountingBloomFilter(
            counters=counters, size=size, hash_num=hash_num,
            kmer_size=kmer_size, count_threshold=count_threshold,
            counter_width=counter_width)
    dt = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}[counter_width]
    counters = jax.device_put(jnp.zeros((p, size // p), dt),
                              NamedSharding(mesh, P(AXIS)))
    return ShardedCountingBloomFilter(
        counters=counters, size=size, hash_num=hash_num,
        kmer_size=kmer_size, count_threshold=count_threshold,
        counter_width=counter_width)


def _flat_positions(hashes: U64, size: int):
    flat = U64(hashes.hi.reshape(-1), hashes.lo.reshape(-1))
    return u64.mod_to_index(flat, size).astype(jnp.uint32)


def _route_local(hashes: U64, size: int, shard_size: int, p: int,
                 valid=None):
    """Global counter index mod ``size`` decomposed as (owner, LOCAL
    offset) limbs — filters scale to p * (2**32 - 1) counters (the
    reference's size_t addressing, CountingBloomFilter.hpp:117-132) as
    long as each shard stays below 2**32. Invalid entries get owner p."""
    flat = U64(hashes.hi.reshape(-1), hashes.lo.reshape(-1))
    r = u64.mod_const(flat, size)
    owner64, local64 = u64.divmod_const(r, shard_size)
    owner = jnp.minimum(owner64.lo, jnp.uint32(p - 1))
    if valid is not None:
        owner = jnp.where(valid, owner, jnp.uint32(p))
    return local64.lo, owner


def sharded_insert_all(mesh: Mesh, scbf: ShardedCountingBloomFilter,
                       hashes: U64, valid=None, cap: int | None = None
                       ) -> ShardedCountingBloomFilter:
    """Sharded incrementAll (CountingBloomFilter.hpp:165-183): hashes
    U64[..., h] with the leading axis sharded over the mesh; occurrence
    counts route to the owning shard with the exact multi-round
    all_to_all (saturating adds compose across rounds: min(min(c+a,M)+b,M)
    == min(c+a+b,M) for non-negative a, b)."""
    from .dist_bloom import _default_cap, _round_sendbuf, route_prepare
    p = scbf.counters.shape[0]
    shard_size = scbf.shard_size
    cmax = scbf.counter_max

    def local(counters, hi, lo, v):
        n = hi.size
        vv = jnp.broadcast_to(v[..., None], hi.shape).reshape(-1)
        lpos_all, owner = _route_local(U64(hi, lo), scbf.size, shard_size,
                                       p, vv)
        c = _default_cap(n, p) if cap is None else min(cap, n)
        pay_s, own_s, slot, _, counts = route_prepare(lpos_all, owner, p)
        sent = jnp.uint32(0xFFFFFFFF)

        def apply_round(cs, rnd):
            buf = _round_sendbuf(pay_s, own_s, slot, p, c, rnd)
            # received entries are LOCAL counter offsets within my shard
            recv = lax.all_to_all(buf, AXIS, split_axis=0,
                                  concat_axis=0).reshape(-1)
            ok = recv != sent
            lpos = jnp.where(ok, recv, jnp.uint32(shard_size))
            occ = jnp.zeros((shard_size,), jnp.uint32).at[lpos].add(
                ok.astype(jnp.uint32), mode="drop")
            if scbf.is_u64:
                # dual-plane saturating u64 add (counting.insert_all)
                lo0, hi0 = cs[0], cs[1]
                lo2 = lo0 + occ
                carry = (lo2 < lo0).astype(jnp.uint32)
                hi2 = hi0 + carry
                ov = (carry == 1) & (hi0 == jnp.uint32(0xFFFFFFFF))
                lo2 = jnp.where(ov, jnp.uint32(0xFFFFFFFF), lo2)
                hi2 = jnp.where(ov, jnp.uint32(0xFFFFFFFF), hi2)
                return jnp.stack([lo2, hi2])
            wide = cs.astype(jnp.uint32) + occ
            return jnp.minimum(wide, jnp.uint32(cmax)).astype(cs.dtype)

        cs = apply_round(counters[0], 0)
        max_count = lax.pmax(jnp.max(counts), AXIS)
        cs = lax.while_loop(
            lambda st: st[0] * c < max_count,
            lambda st: (st[0] + 1, apply_round(st[1], st[0])),
            (jnp.int32(1), cs))[1]
        return cs[None]

    if valid is None:
        valid = jnp.ones(hashes.hi.shape[:-1], bool)
    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                           out_specs=P(AXIS)))
    counters = fn(scbf.counters, hashes.hi, hashes.lo, jnp.asarray(valid))
    return dataclasses.replace(scbf, counters=counters)


def sharded_min_count(mesh: Mesh, scbf: ShardedCountingBloomFilter,
                      hashes: U64, cap: int | None = None):
    """Sharded minimum-counter query (CountingBloomFilter.hpp:54-64):
    positions route to owners, counter values route back; returns
    uint32[...] of min counts per frame (width 8: uint32[2, ...] with
    row 0 = low limbs, row 1 = high limbs)."""
    from .dist_bloom import _default_cap, _round_sendbuf, route_prepare
    p = scbf.counters.shape[0]
    shard_size = scbf.shard_size
    is_u64 = scbf.is_u64

    def local(counters, hi, lo):
        shape = hi.shape
        n = hi.size
        lpos_all, owner = _route_local(U64(hi, lo), scbf.size, shard_size,
                                       p)
        c = _default_cap(n, p) if cap is None else min(cap, n)
        pay_s, own_s, slot, order, counts = route_prepare(lpos_all, owner,
                                                          p)
        sent = jnp.uint32(0xFFFFFFFF)

        def route_back(vals, rnd, acc):
            back = lax.all_to_all(vals.reshape(p, c), AXIS, split_axis=0,
                                  concat_axis=0)
            active = (own_s < p) & (slot >= rnd * c) & (slot < (rnd + 1) * c)
            row = jnp.where(active, own_s, 0).astype(jnp.int32)
            col = jnp.where(active, slot - rnd * c, 0).astype(jnp.int32)
            return jnp.where(active, back[row, col], acc)

        def apply_round(acc, rnd):
            buf = _round_sendbuf(pay_s, own_s, slot, p, c, rnd)
            # received entries are LOCAL counter offsets within my shard
            recv = lax.all_to_all(buf, AXIS, split_axis=0,
                                  concat_axis=0).reshape(-1)
            ok = recv != sent
            lpos = jnp.where(ok, recv, jnp.uint32(0))
            if is_u64:
                acc_lo, acc_hi = acc
                return (route_back(counters[0][0][lpos], rnd, acc_lo),
                        route_back(counters[0][1][lpos], rnd, acc_hi))
            vals = counters[0][lpos].astype(jnp.uint32)
            return route_back(vals, rnd, acc)

        zero = jnp.zeros((n,), jnp.uint32)
        acc = apply_round((zero, zero) if is_u64 else zero, 0)
        max_count = lax.pmax(jnp.max(counts), AXIS)
        acc = lax.while_loop(
            lambda st: st[0] * c < max_count,
            lambda st: (st[0] + 1, apply_round(st[1], st[0])),
            (jnp.int32(1), acc))[1]
        if is_u64:
            un_lo = jnp.zeros((n,), jnp.uint32).at[order].set(acc[0])
            un_hi = jnp.zeros((n,), jnp.uint32).at[order].set(acc[1])
            mv = U64(un_hi.reshape(shape), un_lo.reshape(shape))
            h = shape[-1]
            mn = U64(mv.hi[..., 0], mv.lo[..., 0])
            for j in range(1, h):
                mn = u64.min_(mn, U64(mv.hi[..., j], mv.lo[..., j]))
            return jnp.stack([mn.lo, mn.hi])
        unsorted = jnp.zeros((n,), jnp.uint32).at[order].set(acc)
        return jnp.min(unsorted.reshape(shape), axis=-1)

    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(AXIS), P(AXIS), P(AXIS)),
                           out_specs=P(AXIS) if not is_u64 else P(None, AXIS)))
    return fn(scbf.counters, hashes.hi, hashes.lo)


def sharded_contains(mesh: Mesh, scbf: ShardedCountingBloomFilter,
                     hashes: U64, cap: int | None = None):
    """Sharded membership (CountingBloomFilter.hpp:190-196)."""
    mc = sharded_min_count(mesh, scbf, hashes, cap)
    if scbf.is_u64:
        # threshold < 2**32: any high limb means the count clears it
        return (mc[1] > 0) | (mc[0] >= jnp.uint32(scbf.count_threshold))
    return mc >= jnp.uint32(scbf.count_threshold)


def sharded_insert(mesh: Mesh, scbf: ShardedCountingBloomFilter,
                   hashes: U64, valid=None,
                   max_entangled: int | None = None
                   ) -> ShardedCountingBloomFilter:
    """Exact distributed conservative update (incrementMin,
    CountingBloomFilter.hpp:135-162) over sharded counters.

    hashes is U64[B, W, h] with B sharded over the mesh. A conservative
    batch only reads/writes the counters it addresses, so:

      1. all_gather the batch's positions (every device sees the full
         stream in order);
      2. build the table of unique touched positions (sort + keep-mask;
         the table index of each frame slot comes from unsorting the
         cumsum-unique id);
      3. fetch table values from owner shards with ONE psum (each entry
         has exactly one owner; non-owners contribute 0);
      4. run the single-device batched-exact decomposition
         (counting.insert_positions) against the compact table —
         replicated, every device computes the identical result;
      5. write each updated entry back to its owner's shard.

    Bit-identical to models.counting.insert on the concatenated counter
    plane (asserted in tests/test_parallel.py)."""
    p = scbf.counters.shape[0]
    shard_size = scbf.shard_size
    h = hashes.hi.shape[-1]

    def local(counters, hi, lo, v):
        r_l = u64.mod_const(U64(hi.reshape(-1), lo.reshape(-1)), scbf.size)
        v_l = jnp.broadcast_to(v[..., None],
                               hi.shape[:-1] + (1,)).reshape(-1)
        # 1. replicate the full stream (order = device order = stream
        # order); global counter indices stay a (hi, lo) limb pair so the
        # plane scales past 2**32 counters
        pos_hi = lax.all_gather(r_l.hi.reshape(-1, h), AXIS, axis=0,
                                tiled=True)
        pos_lo = lax.all_gather(r_l.lo.reshape(-1, h), AXIS, axis=0,
                                tiled=True)
        vv = lax.all_gather(v_l, AXIS, axis=0, tiled=True)
        n = pos_hi.shape[0]
        T = n * h
        sent = jnp.uint32(0xFFFFFFFF)
        flat_hi = jnp.where(vv[:, None], pos_hi, sent).reshape(-1)
        flat_lo = jnp.where(vv[:, None], pos_lo, sent).reshape(-1)

        # 2. unique table + per-slot table ids (2-key limb sort)
        pidx = jnp.arange(T, dtype=jnp.int32)
        hi_s, lo_s, pidx_s = lax.sort((flat_hi, flat_lo, pidx), num_keys=2)
        keep = jnp.ones((T,), bool).at[1:].set(
            (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]))
        uid_s = (jnp.cumsum(keep.astype(jnp.uint32)) - 1)
        _, uid = lax.sort((pidx_s, uid_s), num_keys=1)   # unsort
        tdest = jnp.where(keep, uid_s, jnp.uint32(T)).astype(jnp.int32)
        tpos_hi = jnp.full((T,), sent).at[tdest].set(hi_s, mode="drop")
        tpos_lo = jnp.full((T,), sent).at[tdest].set(lo_s, mode="drop")

        # 3. fetch table values from owners (one psum per plane)
        my = lax.axis_index(AXIS).astype(jnp.uint32)
        owner64, local64 = u64.divmod_const(U64(tpos_hi, tpos_lo),
                                            shard_size)
        mine = (owner64.lo == my) & (owner64.hi == 0)    # sent -> >= p
        lpos = jnp.where(mine, local64.lo, jnp.uint32(0))
        dest = jnp.where(mine, lpos, jnp.uint32(shard_size))
        if scbf.is_u64:
            t_lo = lax.psum(jnp.where(mine, counters[0][0][lpos], 0), AXIS)
            t_hi = lax.psum(jnp.where(mine, counters[0][1][lpos], 0), AXIS)
            # 4. replicated exact dual-plane decomposition on the table
            new_lo, new_hi = counting_mod.insert_positions_u64(
                t_lo, t_hi, uid.reshape(n, h), vv, T, max_entangled)
            # 5. write back my entries
            cs_lo = counters[0][0].at[dest].set(
                jnp.where(mine, new_lo, 0), mode="drop")
            cs_hi = counters[0][1].at[dest].set(
                jnp.where(mine, new_hi, 0), mode="drop")
            return jnp.stack([cs_lo, cs_hi])[None]
        vals = jnp.where(mine, counters[0][lpos].astype(jnp.uint32), 0)
        table = lax.psum(vals, AXIS)

        # 4. replicated exact decomposition on the compact uint32 table
        # (per_word=1: one uint32-addressed counter per word; the width's
        # counter_max keeps increment/freeze semantics exact).
        # use_kernel=False: the Mosaic kernels have no hardware equality
        # check under shard_map (CI is CPU; chip_check is single-device),
        # and the compact table is small enough that XLA is fine here.
        new_table = counting_mod.insert_positions(
            table, uid.reshape(n, h), vv, scbf.counter_max, T, 1,
            max_entangled, use_kernel=False)

        # 5. write back my entries
        cs = counters[0].at[dest].set(
            jnp.where(mine, new_table, 0).astype(counters.dtype),
            mode="drop")
        return cs[None]

    if valid is None:
        valid = jnp.ones(hashes.hi.shape[:-1], bool)
    # check_vma off: the psum'd table is axis-invariant while the gathered
    # stream stays marked varying, so the (replicated, deterministic) scan
    # would trip the varying-manual-axes check on its carry.
    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                           out_specs=P(AXIS), check_vma=False))
    counters = fn(scbf.counters, hashes.hi, hashes.lo, jnp.asarray(valid))
    return dataclasses.replace(scbf, counters=counters)
