"""Sharded multi-index Bloom filter (MIBF) over a device mesh.

Brand-new scale-out design — the reference MIBF is single-process shared
memory (/root/reference/MIBloomFilter.hpp, MIBFConstructSupport.hpp); this
layer lets the bit vector, rank structure, and ID array exceed one chip's
HBM by splitting them into P contiguous shards:

  * **bit vector**: shard s owns bits [s*shard_bits, (s+1)*shard_bits).
    Because global size may exceed 2**32, positions are computed as u64
    and split into (owner, local) BEFORE routing, so the all_to_all
    payload stays one uint32 plane (local < shard_bits < 2**32). This
    lifts the single-device 2**32-bit cap: total capacity is P * 2**32.
  * **rank**: each shard keeps local exclusive cumulative popcounts; the
    global rank of a position is shard_rank_base[owner] + local_rank.
    Rank bases are tiny and replicated.
  * **ID array**: rank-aligned sharding — the IDs for ranks in shard s's
    range live on shard s (padded to the max shard population), so a rank
    lookup never leaves the shard that answered the bit-vector query:
    query routing is ONE all_to_all out and ONE back.
  * **construction**: phase 1 (insertBV) routes positions exactly like the
    sharded Bloom build; phase 3 (insertMIBF reservoir) needs no
    communication at all — each shard selects the unique values whose
    positions it owns and runs the shared order-exact reservoir_core on
    its local rank space (a rank group never spans shards). Phase 4
    (saturation rescue) is mesh-resident: global ranks come from the
    routed lookup, a compact table of the touched data/count entries is
    fetched from owner shards with one psum, the batched-exact
    decomposition runs replicated, and entries write back to their
    owners — per-shard state never leaves the devices.

Exactness contract: every operation here is bit-identical to the
single-device models.mibf/mibf_construct pipeline on the concatenated
state (asserted by tests/test_parallel.py and __graft_entry__).
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

from ..models import mibf as mibf_mod
from ..models import mibf_construct as construct
from ..ops import u64
from ..ops.u64 import U64
from .dist_bloom import _default_cap, _round_sendbuf, route_prepare
from .mesh import AXIS


@partial(jax.tree_util.register_dataclass,
         data_fields=["bv_words", "cum_ranks", "data", "counts",
                      "rank_base"],
         meta_fields=["size", "hash_num", "kmer_size", "d_size", "d_sizes",
                      "data_width", "num_shards"])
@dataclasses.dataclass
class ShardedMIBF:
    bv_words: jax.Array     # uint32[p, nwords_per_shard]
    cum_ranks: jax.Array    # uint32[p, nwords_per_shard] (local, exclusive)
    data: jax.Array         # [p, d_max] IDs, rank-aligned to the bit shards
    counts: jax.Array       # [p, d_max] phase-3 occurrence counters
    rank_base: jax.Array    # uint32[p] global rank base per shard (replicated)
    size: int               # total bit-vector length in bits
    hash_num: int
    kmer_size: int
    d_size: int             # global population (sum of d_sizes)
    d_sizes: tuple          # per-shard population
    data_width: int
    num_shards: int

    @property
    def shard_bits(self) -> int:
        return self.size // self.num_shards

    @property
    def s_mask(self) -> int:
        return 1 << (8 * self.data_width - 1)

    @property
    def s_anti_mask(self) -> int:
        return self.s_mask - 1  # (T)~s_mask, MIBloomFilter.hpp:36-42


# ---------------------------------------------------------------------------
# owner/local split (u64-safe: sizes up to p * 2**32 bits)
# ---------------------------------------------------------------------------

def _owner_local(hashes: U64, size: int, shard_bits: int, p: int, valid):
    """Global position -> (owner int32 in [0,p] with p = drop, local u32)."""
    flat = U64(hashes.hi.reshape(-1), hashes.lo.reshape(-1))
    pos = u64.mod_const(flat, size)
    owner, local = u64.divmod_const(pos, shard_bits)
    own = owner.lo          # < p: size is a multiple of p * 32
    local = local.lo        # < shard_bits < 2**32
    if valid is not None:
        v = jnp.broadcast_to(jnp.asarray(valid)[..., None],
                             hashes.hi.shape).reshape(-1)
        own = jnp.where(v, own, jnp.uint32(p))
    return own, local


# ---------------------------------------------------------------------------
# phase 1: sharded bit-vector build
# ---------------------------------------------------------------------------

def create_bv(mesh: Mesh, expected_entries: int, k: int, hash_num: int,
              occupancy: float = 0.5):
    """Sharded analog of MIBFConstructSupport's ctor
    (MIBFConstructSupport.hpp:36-46): size from calc_optimalSize, rounded
    up so every shard holds a whole number of words."""
    p = mesh.devices.size
    size = mibf_mod.calc_optimal_size(expected_entries, hash_num, occupancy)
    size += -size % (p * 32)
    words = jnp.zeros((p, size // p // 32), jnp.uint32)
    words = jax.device_put(words, NamedSharding(mesh, P(AXIS)))
    return words, size


def insert_bv(mesh: Mesh, bv_words: jax.Array, size: int, hashes: U64,
              valid=None, cap: int | None = None) -> jax.Array:
    """Phase 1 (insertBV, MIBFConstructSupport.hpp:75-87): hash batch is
    sharded over the mesh; positions route to owning shards with the same
    exact multi-round all_to_all as the sharded Bloom build."""
    p = bv_words.shape[0]
    shard_bits = size // p

    def local(words, hi, lo, v):
        n = hi.size
        own, lpos = _owner_local(U64(hi, lo), size, shard_bits, p, v)
        c = _default_cap(n, p) if cap is None else min(cap, n)
        pay_s, own_s, slot, _, counts = route_prepare(lpos, own, p)
        sent = jnp.uint32(0xFFFFFFFF)

        def apply_round(w, rnd):
            buf = _round_sendbuf(pay_s, own_s, slot, p, c, rnd)
            recv = lax.all_to_all(buf, AXIS, split_axis=0,
                                  concat_axis=0).reshape(-1)
            ps = lax.sort((recv,), is_stable=False)[0]
            keep = jnp.ones(ps.shape, bool).at[1:].set(ps[1:] != ps[:-1])
            keep = keep & (ps != sent)
            from ..models import bloom as bloom_mod
            return w | bloom_mod.sorted_delta_words(ps, keep,
                                                    words.shape[-1])

        w = apply_round(words[0], 0)
        max_count = lax.pmax(jnp.max(counts), AXIS)
        w = lax.while_loop(
            lambda st: st[0] * c < max_count,
            lambda st: (st[0] + 1, apply_round(st[1], st[0])),
            (jnp.int32(1), w))[1]
        return w[None]

    if valid is None:
        valid = jnp.ones(hashes.hi.shape[:-1], bool)
    fn = jax.jit(shard_map(local, mesh=mesh,
                           in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                           out_specs=P(AXIS)))
    return fn(bv_words, hashes.hi, hashes.lo, jnp.asarray(valid))


# ---------------------------------------------------------------------------
# phase 2: freeze (rank structure + empty sharded ID array)
# ---------------------------------------------------------------------------

def freeze(mesh: Mesh, bv_words: jax.Array, size: int, hash_num: int,
           kmer_size: int, data_width: int = 2) -> ShardedMIBF:
    """Sharded getEmptyMIBF (MIBFConstructSupport.hpp:92-99 /
    MIBloomFilter.hpp:122-147): local exclusive popcount cumsums + global
    rank bases. One tiny host readback fixes the per-shard populations
    (static shapes for the rank-aligned data shards)."""
    p = bv_words.shape[0]

    def local(w):
        pops = lax.population_count(w[0]).astype(jnp.uint32)
        cum = jnp.cumsum(pops) - pops
        return cum[None], jnp.sum(pops)[None]

    fn = jax.jit(shard_map(local, mesh=mesh, in_specs=P(AXIS),
                           out_specs=(P(AXIS), P(AXIS))))
    cum, pops = fn(bv_words)
    pops_np = np.asarray(pops).astype(np.int64)
    bases = np.concatenate([[0], np.cumsum(pops_np)[:-1]]).astype(np.uint32)
    d_sizes = tuple(int(x) for x in pops_np)
    d_max = max(1, int(pops_np.max()))
    dt = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}[data_width]
    data = jax.device_put(jnp.zeros((p, d_max), dt),
                          NamedSharding(mesh, P(AXIS)))
    counts = jax.device_put(jnp.zeros((p, d_max), dt),
                            NamedSharding(mesh, P(AXIS)))
    return ShardedMIBF(
        bv_words=bv_words, cum_ranks=cum, data=data, counts=counts,
        rank_base=jnp.asarray(bases), size=size, hash_num=hash_num,
        kmer_size=kmer_size, d_size=int(pops_np.sum()), d_sizes=d_sizes,
        data_width=data_width, num_shards=p)


# ---------------------------------------------------------------------------
# phase 3: reservoir ID insertion (no communication)
# ---------------------------------------------------------------------------

def insert_mibf(mesh: Mesh, m: ShardedMIBF, hashes: U64, id_value: int,
                valid=None) -> ShardedMIBF:
    """Phase 3 (insertMIBF, MIBFConstructSupport.hpp:109-130) for one
    sequence's hash set, replicated to every shard: each shard filters the
    value-sorted unique hashes to the positions it owns and runs the
    shared reservoir_core on its local rank space. A rank group lives
    entirely on one shard, so the result is bit-identical to the
    single-device pass."""
    p = m.num_shards
    shard_bits = m.shard_bits
    d_max = m.data.shape[1]

    hi_s, lo_s, keep = construct._unique_sorted_u64(hashes, valid)

    def local(bv, cum, data, counts, hi, lo, kp):
        own, lpos = _owner_local(U64(hi, lo), m.size, shard_bits, p, None)
        my = lax.axis_index(AXIS).astype(jnp.uint32)
        mine = kp & (own == my)
        word = (lpos >> 5).astype(jnp.int32)
        wv = bv[0][word]
        before = wv & ((jnp.uint32(1) << (lpos & 31)) - 1)
        lrank = (cum[0][word] + lax.population_count(before)).astype(
            jnp.int32)
        lrank = jnp.where(mine, lrank, jnp.int32(d_max))
        d, c = construct.reservoir_core(
            data[0], counts[0], lrank, hi, lo, mine, id_value,
            d_max, m.data_width)
        return d[None], c[None]

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P()),
        out_specs=(P(AXIS), P(AXIS))))
    data, counts = fn(m.bv_words, m.cum_ranks, m.data, m.counts,
                      hi_s, lo_s, keep)
    return dataclasses.replace(m, data=data, counts=counts)


# ---------------------------------------------------------------------------
# phase 4: saturation rescue (gather -> exact sequential pass -> re-shard)
# ---------------------------------------------------------------------------

def insert_saturation(mesh: Mesh, m: ShardedMIBF, hashes: U64,
                      id_value: int, valid=None,
                      max_entangled: int | None = None) -> ShardedMIBF:
    """Phase 4 (setSatIfMissing, MIBFConstructSupport.hpp:168-214),
    mesh-resident: neither the bit vector nor the full ID/count planes
    ever leave the devices.

    A saturation batch only reads and writes the data/count entries at
    the ranks it addresses, so (the counting-filter sharded_insert
    pattern applied to phase 4):

      1. per-frame GLOBAL ranks come from the routed rank lookup
         (:func:`at_rank_data` — one all_to_all out, one back);
      2. the batch's rank rows are all_gathered (stream order);
      3. the compact table of unique touched ranks is built replicated;
         each entry's value is fetched from its owner shard with ONE psum
         (rank-aligned shards: owner s holds ranks [base[s],
         base[s]+pop_s));
      4. the batched-exact phase-4 decomposition (group collapse +
         entangled replay, models.mibf_construct.saturation_ranks) runs
         on the compact table, replicated — every device computes the
         identical result;
      5. each updated entry writes back to its owner's shard.

    Bit-identical to the single-device pass on the concatenated planes
    (asserted in tests/test_parallel.py)."""
    p = m.num_shards
    d_max = m.data.shape[1]
    h = hashes.hi.shape[-1]
    grank, _hit, _raw = at_rank_data(mesh, m, hashes)

    def local(data, counts, base, rk_l, v_l):
        rk = lax.all_gather(rk_l.reshape(-1, h), AXIS, axis=0, tiled=True)
        vv = lax.all_gather(v_l.reshape(-1), AXIS, axis=0, tiled=True)
        n = rk.shape[0]
        T = n * h
        sent = jnp.uint32(0xFFFFFFFF)
        flat = jnp.where(vv[:, None], rk.astype(jnp.uint32), sent).reshape(-1)

        # unique table + per-slot table ids (see dist_counting.sharded_insert)
        pidx = jnp.arange(T, dtype=jnp.int32)
        flat_s, pidx_s = lax.sort((flat, pidx), num_keys=1)
        keep = jnp.ones((T,), bool).at[1:].set(flat_s[1:] != flat_s[:-1])
        uid_s = jnp.cumsum(keep.astype(jnp.uint32)) - 1
        _, uid = lax.sort((pidx_s, uid_s), num_keys=1)    # unsort
        trank = jnp.full((T,), sent).at[
            jnp.where(keep, uid_s, jnp.uint32(T)).astype(jnp.int32)].set(
            flat_s, mode="drop")                          # table -> rank

        # fetch table entries from owners (one psum per plane)
        my = lax.axis_index(AXIS)
        my_base = base[my]
        owner = jnp.searchsorted(base, trank, side="right") - 1
        owner = jnp.where(trank >= jnp.uint32(m.d_size), jnp.int32(p),
                          owner.astype(jnp.int32))
        mine = owner == my
        lidx = jnp.where(mine, (trank - my_base).astype(jnp.int32), 0)
        lidx = jnp.minimum(lidx, d_max - 1)
        tdata = lax.psum(
            jnp.where(mine, data[0][lidx].astype(jnp.uint32), 0), AXIS
        ).astype(data.dtype)
        tcounts = lax.psum(
            jnp.where(mine, counts[0][lidx].astype(jnp.uint32), 0), AXIS
        ).astype(counts.dtype)

        # replicated exact phase-4 decomposition on the compact table
        new_d, new_c = construct.saturation_ranks(
            tdata, tcounts, uid.reshape(n, h).astype(jnp.int32), vv, T,
            m.data_width, id_value, max_entangled)

        # write back my entries
        dest = jnp.where(mine, lidx, jnp.int32(d_max))
        d_out = data[0].at[dest].set(
            jnp.where(mine, new_d, 0).astype(data.dtype), mode="drop")
        c_out = counts[0].at[dest].set(
            jnp.where(mine, new_c, 0).astype(counts.dtype), mode="drop")
        return d_out[None], c_out[None]

    if valid is None:
        valid = jnp.ones(hashes.hi.shape[:-1], bool)
    # check_vma off: the psum'd table is axis-invariant while the gathered
    # stream stays marked varying (same rationale as
    # dist_counting.sharded_insert).
    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS)), check_vma=False))
    data, counts = fn(m.data, m.counts, m.rank_base, grank,
                      jnp.asarray(valid))
    return dataclasses.replace(m, data=data, counts=counts)


def saturate(mesh: Mesh, m: ShardedMIBF, hashes: U64) -> ShardedMIBF:
    """Batched MIBloomFilter::saturate (MIBloomFilter.hpp:440-446): OR the
    saturation bit at every addressed rank; positions route to owners, the
    OR happens locally, no reply needed."""
    p = m.num_shards
    shard_bits = m.shard_bits
    d_max = m.data.shape[1]
    smask = m.s_mask

    def local(bv, cum, data, hi, lo):
        n = hi.size
        own, lpos = _owner_local(U64(hi, lo), m.size, shard_bits, p, None)
        c = _default_cap(n, p)
        pay_s, own_s, slot, _, counts = route_prepare(lpos, own, p)
        sent = jnp.uint32(0xFFFFFFFF)

        def apply_round(d, rnd):
            buf = _round_sendbuf(pay_s, own_s, slot, p, c, rnd)
            recv = lax.all_to_all(buf, AXIS, split_axis=0,
                                  concat_axis=0).reshape(-1)
            ok = recv != sent
            word = jnp.where(ok, (recv >> 5).astype(jnp.int32), 0)
            wv = bv[0][word]
            before = wv & ((jnp.uint32(1) << (recv & 31)) - 1)
            lrank = (cum[0][word]
                     + lax.population_count(before)).astype(jnp.int32)
            lrank = jnp.where(ok, lrank, jnp.int32(d_max))
            sat = jnp.zeros((d_max,), data.dtype).at[lrank].max(
                jnp.where(ok, jnp.asarray(smask, data.dtype), 0),
                mode="drop")
            return d | sat

        d = apply_round(data[0], 0)
        max_count = lax.pmax(jnp.max(counts), AXIS)
        d = lax.while_loop(
            lambda st: st[0] * c < max_count,
            lambda st: (st[0] + 1, apply_round(st[1], st[0])),
            (jnp.int32(1), d))[1]
        return d[None]

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=P(AXIS)))
    data = fn(m.bv_words, m.cum_ranks, m.data, hashes.hi, hashes.lo)
    return dataclasses.replace(m, data=data)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def at_rank_data(mesh: Mesh, m: ShardedMIBF, hashes: U64,
                 cap: int | None = None):
    """Sharded at_rank + getData (MIBloomFilter.hpp:478-515 + :646-655):
    hashes U64[..., h] with the leading axis sharded over the mesh;
    returns (rank int32, hit bool, raw uint32) of the same shape. ONE
    all_to_all out (local positions) and ONE back per plane — the ID for
    a rank lives on the shard that owns the rank's bit range. Exact for
    any cap via the multi-round repair loop."""
    p = m.num_shards
    shard_bits = m.shard_bits
    d_max = m.data.shape[1]

    def local(bv, cum, data, base, hi, lo):
        shape = hi.shape
        n = hi.size
        own, lpos = _owner_local(U64(hi.reshape(-1), lo.reshape(-1)),
                                 m.size, shard_bits, p, None)
        c = _default_cap(n, p) if cap is None else min(cap, n)
        pay_s, own_s, slot, order, counts = route_prepare(lpos, own, p)
        sent = jnp.uint32(0xFFFFFFFF)
        my = lax.axis_index(AXIS)
        my_base = base[my]

        def apply_round(acc, rnd):
            acc_pr, acc_raw = acc
            buf = _round_sendbuf(pay_s, own_s, slot, p, c, rnd)
            recv = lax.all_to_all(buf, AXIS, split_axis=0,
                                  concat_axis=0).reshape(-1)
            ok = recv != sent
            word = jnp.where(ok, (recv >> 5).astype(jnp.int32), 0)
            wv = bv[0][word]
            bit = recv & 31
            before = wv & ((jnp.uint32(1) << bit) - 1)
            lrank = cum[0][word] + lax.population_count(before)
            grank = my_base + lrank
            hit = jnp.where(ok, (wv >> bit) & 1, 0)
            raw = jnp.where(
                hit == 1,
                data[0][jnp.minimum(lrank, jnp.uint32(d_max - 1)).astype(
                    jnp.int32)].astype(jnp.uint32),
                jnp.uint32(0))
            packed = (grank << 1) | hit   # d_size < 2**31
            back_pr = lax.all_to_all(packed.reshape(p, c), AXIS,
                                     split_axis=0, concat_axis=0)
            back_raw = lax.all_to_all(raw.reshape(p, c), AXIS,
                                      split_axis=0, concat_axis=0)
            active = (own_s < p) & (slot >= rnd * c) & (slot < (rnd + 1) * c)
            row = jnp.where(active, own_s, 0).astype(jnp.int32)
            col = jnp.where(active, slot - rnd * c, 0).astype(jnp.int32)
            return (jnp.where(active, back_pr[row, col], acc_pr),
                    jnp.where(active, back_raw[row, col], acc_raw))

        zero = jnp.zeros((n,), jnp.uint32)
        acc = apply_round((zero, zero), 0)
        max_count = lax.pmax(jnp.max(counts), AXIS)
        acc = lax.while_loop(
            lambda st: st[0] * c < max_count,
            lambda st: (st[0] + 1, apply_round(st[1], st[0])),
            (jnp.int32(1), acc))[1]
        pr, raw = acc
        inv = jnp.zeros((n,), jnp.uint32).at[order].set(pr)
        raw_u = jnp.zeros((n,), jnp.uint32).at[order].set(raw)
        rank = (inv >> 1).astype(jnp.int32).reshape(shape)
        hit = ((inv & 1) == 1).reshape(shape)
        return rank, hit, raw_u.reshape(shape)

    fn = jax.jit(shard_map(
        local, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P(AXIS))))
    return fn(m.bv_words, m.cum_ranks, m.data, m.rank_base,
              hashes.hi, hashes.lo)


# ---------------------------------------------------------------------------
# conversions (tests / IO / phase 4)
# ---------------------------------------------------------------------------

def to_single(m: ShardedMIBF):
    """Gather the sharded state into a single-device models.mibf filter +
    counts (host-side; used by phase 4, serialization, and the exactness
    tests)."""
    bv = jnp.asarray(np.asarray(m.bv_words).reshape(-1))
    single = mibf_mod.freeze(bv, m.size, m.hash_num, m.kmer_size,
                             data_width=m.data_width)
    data_np = np.asarray(m.data)
    counts_np = np.asarray(m.counts)
    d = np.concatenate([data_np[s, :m.d_sizes[s]]
                        for s in range(m.num_shards)])
    c = np.concatenate([counts_np[s, :m.d_sizes[s]]
                        for s in range(m.num_shards)])
    single = dataclasses.replace(single, data=jnp.asarray(d))
    return single, jnp.asarray(c)


# ---------------------------------------------------------------------------
# classification against a sharded MIBF (MIBFQuerySupport.hpp:94-130)
# ---------------------------------------------------------------------------

def prep_frames(mesh: Mesh, m: ShardedMIBF, hashes: U64, valid,
                max_miss: int):
    """Sharded twin of models.mibf_query.prep_frames: the per-frame
    bit-test + rank + ID gathers run against the SHARDED filter via
    :func:`at_rank_data` (one all_to_all out, one back). hashes is
    U64[R, W, h] with R divisible by the mesh size; returns
    (raw, hit, usable, misses), each sharded over R."""
    _, hit, raw = at_rank_data(mesh, m, hashes)
    misses = jnp.sum((~hit).astype(jnp.int32), axis=-1)
    usable = jnp.asarray(valid) & (misses <= max_miss)
    return raw, hit, usable, misses


@dataclasses.dataclass
class ShardedMIBFQuerySupport:
    """Read classification against a ShardedMIBF — the scale-out twin of
    models.mibf_query.MIBFQuerySupport (same ctor params,
    MIBFQuerySupport.hpp:33-59). The rank/ID gathers route through the
    mesh; the per-read frame scan (order-dependent bookkeeping) and the
    host-side candidate ranking reuse the single-device engine unchanged,
    so ranked QueryResults are identical to classifying against the
    equivalent single-device filter."""

    mesh: Mesh
    m: ShardedMIBF
    per_frame_prob: "list[float]"
    extra_count: float
    extra_frame_limit: int
    max_miss: int
    min_count: int
    best_hit_agree: bool
    sat_count: int = 0
    eval_count: int = 0

    _jit_cache: dict = dataclasses.field(default_factory=dict)

    def _scan_and_summarize(self, raw, hit, usable, misses, min_count_vec,
                            frame_eval=None):
        from ..models import mibf_query as mq
        num_ids = len(self.per_frame_prob)
        st_mode = bool(getattr(self.m, "sseeds", ()) or ())
        key = (raw.shape, num_ids, frame_eval is not None)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(partial(mq.query_frames_batch, num_ids=num_ids,
                                 extra_frame_limit=self.extra_frame_limit,
                                 st_mode=st_mode))
            self._jit_cache[key] = fn
        # query_scan only reads s_mask/s_anti_mask from the filter pytree;
        # the sharded arrays are dead inputs XLA removes
        if frame_eval is None:
            out = fn(self.m, raw, hit, usable, misses,
                     jnp.asarray(min_count_vec, jnp.int32))
        else:
            out = fn(self.m, raw, hit, usable, misses,
                     jnp.asarray(min_count_vec, jnp.int32),
                     frame_eval=jnp.asarray(frame_eval))
        out = jax.device_get(out)        # one host transfer for the dict
        counts = out["counts"]
        cands = out["candidates"]
        bests = out["best"]
        self.sat_count = int(np.sum(out["sat_count"]))
        self.eval_count = int(np.sum(out["eval_count"]))
        return [mq.summarize(counts[r], cands[r], bests[r],
                             self.per_frame_prob, self.min_count,
                             self.extra_count, self.best_hit_agree)
                for r in range(raw.shape[0])]

    def query_many(self, hashes: U64, valid, min_count_vec):
        """Batched multi-read query (hashes U64[R, W, h], R divisible by
        the mesh size): gathers against the sharded filter, then the exact
        per-read engine. Returns one ranked QueryResult list per read."""
        raw, hit, usable, misses = prep_frames(self.mesh, self.m, hashes,
                                               valid, self.max_miss)
        return self._scan_and_summarize(raw, hit, usable, misses,
                                        min_count_vec,
                                        frame_eval=jnp.asarray(valid))

    def query_paired_many(self, hashes1: U64, valid1, hashes2: U64, valid2,
                          min_count_vec):
        """Batched paired-end query (MIBFQuerySupport.hpp:111-130) against
        the sharded filter: both ends' gathers ride the mesh, the
        interleave runs on device, the scans are vmapped."""
        from ..models import mibf_query as mq
        fr1 = prep_frames(self.mesh, self.m, hashes1, valid1, self.max_miss)
        fr2 = prep_frames(self.mesh, self.m, hashes2, valid2, self.max_miss)
        raw, hit, usable, misses, live = mq.interleave_paired_frames(
            fr1, fr2, valid1, valid2)
        return self._scan_and_summarize(raw, hit, usable, misses,
                                        min_count_vec, frame_eval=live)
