"""Multi-index Bloom filter (MIBF): rank/select ID lookup on TPU.

Replicates /root/reference/MIBloomFilter.hpp. The reference stores the
top-level bit vector as an sdsl interleaved bit vector with a rank support
structure; here rank is a precomputed per-word exclusive cumulative popcount
plus an in-word masked popcount — one gather + one popcount per query, fully
batched. The ID array ("data") is indexed by rank exactly as the reference's
``m_data[rank]`` (MIBloomFilter.hpp:144-146).

Value-bit layout parity (MIBloomFilter.hpp:36-44): the top bit of each data
value is the saturation flag ``s_mask``, the next bit the strand flag
``s_strand``; the rest is the ID.

Data widths 1/2/4 store the ID array in the matching unsigned dtype; the
uint64 instantiation (``MIBloomFilter<uint64_t>``, data_width=8) stores it
DUAL-PLANE as ``uint32[2, d_size]`` (row 0 = low limbs, row 1 = high limbs
— the same pattern as the counting filter's u64 counters), with s_mask at
bit 63 and s_strand at bit 62 living in the high plane. Width-8 value
results come back as :class:`~..ops.u64.U64` pairs.

The bit vector is frozen after construction (phase 2 of the construct
pipeline); ``freeze`` computes the rank acceleration structure once.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u64
from ..ops.u64 import U64

_DTYPES = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32}

BLOCKSIZE = 512  # sdsl interleaving block, MIBloomFilter.hpp:44

# width-8 (uint64 T) high-plane bit constants: s_mask/s_strand at bits
# 63/62 == bits 31/30 of the high limb (MIBloomFilter.hpp:36-44)
SAT_HI = 0x80000000
STRAND_HI = 0x40000000
ANTI_HI = 0x7FFFFFFF     # ~s_mask, high limb
ID_HI = 0x3FFFFFFF       # s_strand - 1, high limb


def _sat_u64(hi: jax.Array, lo: jax.Array) -> jax.Array:
    """value > s_mask for width-8 values (the reference's saturation test
    ``m_data[i] > s_mask``, MIBloomFilter.hpp:452-469) on dual planes."""
    sh = jnp.uint32(SAT_HI)
    return (hi > sh) | ((hi == sh) & (lo > 0))


@partial(jax.tree_util.register_dataclass,
         data_fields=["bv_words", "cum_ranks", "data"],
         meta_fields=["size", "hash_num", "kmer_size", "d_size",
                      "data_width", "sseeds"])
@dataclasses.dataclass
class MIBloomFilter:
    bv_words: jax.Array    # uint32[ceil(size/32)] frozen bit vector
    cum_ranks: jax.Array   # uint32[nwords] exclusive cumulative popcounts
    data: jax.Array        # ID array [d_size], dtype per data_width
    size: int              # bit-vector length in bits
    hash_num: int
    kmer_size: int
    d_size: int            # population count == len(data)
    data_width: int        # sizeof(T) in bytes: 1, 2 or 4
    sseeds: Tuple[str, ...] = ()

    # --- bit-layout constants (MIBloomFilter.hpp:36-44) -------------------
    @property
    def s_mask(self) -> int:
        return 1 << (8 * self.data_width - 1)

    @property
    def s_anti_mask(self) -> int:
        return self.s_mask - 1  # (T)~s_mask

    @property
    def s_strand(self) -> int:
        return 1 << (8 * self.data_width - 2)

    @property
    def s_id_mask(self) -> int:
        return self.s_strand - 1


def calc_optimal_size(entries: int, hash_num: int, occupancy: float) -> int:
    """Occupancy-based sizing (MIBloomFilter.hpp:84-88)."""
    non64 = int(-float(entries) * hash_num / math.log(1.0 - occupancy))
    return non64 + (64 - non64 % 64)


def parse_seed_string(spaced_seeds: Sequence[str]):
    """MIBloomFilter::parseSeedString (MIBloomFilter.hpp:49-61)."""
    return [[j for j, ch in enumerate(s) if ch == "0"] for s in spaced_seeds]


def calc_prob_single_frame(occupancy: float, hash_num: int, freq: float,
                           allowed_misses: int) -> float:
    """Per-frame random-match probability (MIBloomFilter.hpp:65-77)."""
    total = 0.0
    for i in range(hash_num - allowed_misses, hash_num + 1):
        prob = math.comb(hash_num, i)
        prob *= occupancy ** i
        prob *= (1.0 - occupancy) ** (hash_num - i)
        prob *= 1.0 - (1.0 - freq) ** i
        total += prob
    return total


# ---------------------------------------------------------------------------
# construction from a frozen bit vector
# ---------------------------------------------------------------------------

@jax.jit
def _freeze_rank(bv_words: jax.Array):
    pops = jax.lax.population_count(bv_words).astype(jnp.uint32)
    return jnp.cumsum(pops) - pops, jnp.sum(pops)


def freeze(bv_words: jax.Array, size: int, hash_num: int, kmer_size: int,
           data_width: int = 2, sseeds: Sequence[str] = ()) -> MIBloomFilter:
    """Build the rank structure and empty ID array from a populated bit
    vector — the analog of the MIBloomFilter(bv) constructor
    (MIBloomFilter.hpp:122-147)."""
    # one fused dispatch + one scalar readback (eager ops cost ~100 ms
    # each over the remote-TPU tunnel; the un-jitted version measured
    # 2.2 s of the 2.6 s 4-phase build — bench/mibf_stages.py r5)
    cum, total = _freeze_rank(bv_words)
    d_size = int(total)
    if data_width == 8:
        data = jnp.zeros((2, d_size), jnp.uint32)   # [lo, hi] planes
    else:
        data = jnp.zeros(d_size, _DTYPES[data_width])
    return MIBloomFilter(bv_words=bv_words, cum_ranks=cum, data=data,
                         size=size, hash_num=hash_num, kmer_size=kmer_size,
                         d_size=d_size, data_width=data_width,
                         sseeds=tuple(sseeds))


# ---------------------------------------------------------------------------
# rank queries
# ---------------------------------------------------------------------------

def positions(mibf: MIBloomFilter, hashes: U64) -> jax.Array:
    if mibf.size > (1 << 32):
        raise ValueError("MIBF larger than 2**32 bits not supported")
    return u64.mod_to_index(hashes, mibf.size)


def rank_of_positions(mibf: MIBloomFilter, pos: jax.Array):
    """(rank, hit) for bit positions: rank = #1s strictly before pos
    (sdsl rank semantics, used at MIBloomFilter.hpp:527)."""
    word = (pos >> 5).astype(jnp.int32)
    bit = pos & 31
    w = mibf.bv_words[word]
    before = w & ((jnp.uint32(1) << bit) - 1)
    rank = mibf.cum_ranks[word] + jax.lax.population_count(before)
    hit = ((w >> bit) & 1) == 1
    return rank.astype(jnp.int32), hit


def _kernel_eligible(mibf: MIBloomFilter) -> bool:
    """Route rank queries through the Mosaic windowed gather kernel when
    the bit vector spans at least one kernel window, positions fit one
    limb, and we are on a TPU backend (same gating as bloom.contains)."""
    from ..kernels import scatter_or as _so
    return (mibf.size < (1 << 32) and mibf.d_size < (1 << 31)
            and mibf.bv_words.shape[0] >= _so.WIN_WORDS
            and jax.default_backend() != "cpu")


def rank_of_positions_kernel(mibf: MIBloomFilter, pos_flat: jax.Array):
    """Windowed-gather rank lookup for flat uint32 positions.

    Classification's hot gathers — the bv word and its exclusive
    cumulative popcount — are both indexed by ``pos >> 5``, so one sort
    of the positions feeds one dual-array kernel pass that DMAs each
    window of both arrays once and reuses the one-hot selectors. The
    un-sort packs (rank << 1 | hit) into a single payload word (ranks
    fit 31 bits per _kernel_eligible). Returns (rank int32[n],
    hit bool[n], overflow_count); the caller must fall back to
    :func:`rank_of_positions` when overflow_count > 0."""
    from ..kernels import gather_words as _gw
    n = pos_flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pos_s, idx_s = jax.lax.sort((pos_flat, idx), num_keys=1,
                                is_stable=False)
    w_s, c_s, over = _gw.gather_words_pair_sorted(
        mibf.bv_words, mibf.cum_ranks, pos_s)
    bit = pos_s & 31
    before = w_s & ((jnp.uint32(1) << bit) - 1)
    rank_s = c_s + jax.lax.population_count(before)
    hit_s = (w_s >> bit) & 1
    packed_s = (rank_s << 1) | hit_s
    _, packed = jax.lax.sort((idx_s, packed_s), num_keys=1,
                             is_stable=False)
    return (packed >> 1).astype(jnp.int32), (packed & 1) == 1, over


def _data_u32_words(mibf: MIBloomFilter) -> jax.Array:
    """Pack the ID array into little-endian uint32 words for the windowed
    gather kernel via a trailing-axis bitcast (uintN[k, per] -> uint32[k]
    little-endian — exactly the packed-word layout). The 1-D strided
    slice+shift formulation this replaces measured 31.8 of the 43.6 ms
    rank+data kernel at the classify bench geometry (strided sub-word
    access fights the TPU tiled layout; bench/prep_probe.py r5)."""
    per = 4 // mibf.data_width
    if per == 1:
        return mibf.data.astype(jnp.uint32)
    d = mibf.data
    pad = -mibf.d_size % per
    if pad:
        d = jnp.concatenate([d, jnp.zeros(pad, d.dtype)])
    return jax.lax.bitcast_convert_type(d.reshape(-1, per), jnp.uint32)


def rank_data_of_positions_kernel(mibf: MIBloomFilter, pos_flat: jax.Array):
    """Fused rank + ID lookup for flat uint32 positions — the full
    classification gather chain in one sorted pass.

    The three hot gathers (bv word, exclusive cumulative popcount,
    ``data[rank]`` — MIBloomFilter.hpp:504-515 + 646-655) all ride ONE
    sort: the first two are indexed by ``pos >> 5`` and share the
    dual-array kernel pass; ranks of sorted positions are themselves
    non-decreasing, so ``data`` (bitcast to uint32 words) is gathered by
    a second sorted kernel pass with no extra sort. The un-sort carries
    the packed (rank << 1 | hit) word and the raw ID word together.

    The ID plane is only routed through the kernel when the sorted
    position stream is dense enough that a chunk's ranks fit one window
    (expected span <= WIN_WORDS/4, the same safety factor the bv gather
    relies on); sparser streams gather ``data`` with the XLA gather in
    the sorted domain, still riding the shared sort/un-sort.

    Returns (rank int32[n], hit bool[n], raw uint32[n], overflow_count);
    raw is 0 at missing slots and still carries the saturation/strand
    bits. Callers must fall back to the XLA gathers when
    overflow_count > 0."""
    from ..kernels import gather_words as _gw
    from ..kernels.scatter_or import CHUNK, WIN_WORDS
    n = pos_flat.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    pos_s, idx_s = jax.lax.sort((pos_flat, idx), num_keys=1,
                                is_stable=False)
    w_s, c_s, over = _gw.gather_words_pair_sorted(
        mibf.bv_words, mibf.cum_ranks, pos_s)
    bit = pos_s & 31
    before = w_s & ((jnp.uint32(1) << bit) - 1)
    rank_s = c_s + jax.lax.population_count(before)
    hit_s = (w_s >> bit) & 1
    bits = 8 * mibf.data_width
    # missed slots can carry rank == d_size (one past the data array);
    # clamp keeps the stream sorted and in-bounds — raw is masked by hit
    rank_c = jnp.minimum(rank_s, jnp.uint32(mibf.d_size - 1))
    data_words = -(-mibf.d_size * mibf.data_width) // 4
    if n * WIN_WORDS >= 4 * CHUNK * data_words:
        dpos_s = rank_c * jnp.uint32(bits)  # bit position of data[rank]
        dw_s, over2 = _gw.gather_words_sorted(_data_u32_words(mibf), dpos_s)
        over = over + over2
        elmask = jnp.uint32((1 << bits) - 1) if bits < 32 \
            else jnp.uint32(0xFFFFFFFF)
        val_s = (dw_s >> (dpos_s & 31)) & elmask
    else:
        val_s = mibf.data[rank_c].astype(jnp.uint32)
    raw_s = jnp.where(hit_s == 1, val_s, jnp.uint32(0))
    packed_s = (rank_s << 1) | hit_s
    _, packed, raw = jax.lax.sort((idx_s, packed_s, raw_s), num_keys=1,
                                  is_stable=False)
    return ((packed >> 1).astype(jnp.int32), (packed & 1) == 1, raw, over)


def at_rank_data(mibf: MIBloomFilter, hashes: U64,
                 use_kernel: bool | None = None):
    """at_rank + getData in one pass: for hashes U64[..., h] returns
    (rank int32[..., h], hit bool[..., h], raw uint32[..., h]) where raw
    is ``data[rank]`` (saturation/strand bits included, 0 where the bit
    vector missed). On TPU, large filters route all three gathers through
    the Mosaic windowed gather kernel (one position sort feeds a
    dual-array pass over bv/cum_ranks and a sorted pass over data)."""
    pos = positions(mibf, hashes)

    if mibf.data_width == 8:
        # dual-plane u64 IDs: raw comes back as a U64 pair (the windowed
        # data-gather kernel is single-plane; ranks may still ride the
        # rank kernel via at_rank)
        rank, hit = at_rank(mibf, hashes, use_kernel=use_kernel)
        z = jnp.uint32(0)
        raw = U64(jnp.where(hit, mibf.data[1][rank], z),
                  jnp.where(hit, mibf.data[0][rank], z))
        return rank, hit, raw

    def fallback():
        rank, hit = rank_of_positions(mibf, pos)
        raw = jnp.where(hit, mibf.data[rank].astype(jnp.uint32),
                        jnp.uint32(0))
        return rank, hit, raw

    if use_kernel is None:
        use_kernel = (_kernel_eligible(mibf)
                      and mibf.d_size * 8 * mibf.data_width < (1 << 32)
                      and pos.size >= (1 << 18))
    if not use_kernel:
        return fallback()
    rank_k, hit_k, raw_k, over = rank_data_of_positions_kernel(
        mibf, pos.reshape(-1))
    rank_k = rank_k.reshape(pos.shape)
    hit_k = hit_k.reshape(pos.shape)
    raw_k = raw_k.reshape(pos.shape)
    return jax.lax.cond(over > 0, fallback,
                        lambda: (rank_k, hit_k, raw_k))


def rank_of_positions_auto(mibf: MIBloomFilter, pos: jax.Array,
                           use_kernel: bool | None = None):
    """(rank, hit) for bit positions with auto kernel routing: on TPU,
    large filters and batches route the two rank gathers through the
    Mosaic windowed gather kernel (window-overflow batches recompute via
    the XLA gather). Shared by atRank and the construct phases' rank
    lookups (insertMIBF/setSatIfMissing, MIBFConstructSupport.hpp:121,
    :179)."""
    if use_kernel is None:
        # kernel wins well below 1M positions (see at_rank_data note;
        # re-measured r5 after the bitcast data packing)
        use_kernel = _kernel_eligible(mibf) and pos.size >= (1 << 18)
    if not use_kernel:
        return rank_of_positions(mibf, pos)
    rank_k, hit_k, over = rank_of_positions_kernel(mibf, pos.reshape(-1))
    rank_k = rank_k.reshape(pos.shape)
    hit_k = hit_k.reshape(pos.shape)
    return jax.lax.cond(
        over > 0,
        lambda: rank_of_positions(mibf, pos),
        lambda: (rank_k, hit_k))


def at_rank(mibf: MIBloomFilter, hashes: U64,
            use_kernel: bool | None = None):
    """Batch equivalent of atRank (MIBloomFilter.hpp:478-515): for hashes
    U64[..., h] returns (rank int32[..., h], hit bool[..., h]).

    On TPU, large filters route the two rank gathers through the Mosaic
    windowed gather kernel; ``use_kernel`` forces the choice (None =
    auto). Window-overflow batches recompute via the XLA gather."""
    pos = positions(mibf, hashes)
    return rank_of_positions_auto(mibf, pos, use_kernel=use_kernel)


def get_data(mibf: MIBloomFilter, rank: jax.Array) -> jax.Array:
    return mibf.data[rank]


def at(mibf: MIBloomFilter, hashes: U64, max_miss: int = 0):
    """Batch equivalent of `at` (MIBloomFilter.hpp:448-472): returns
    (values[..., h], ok[...], frame_saturated[...]) where ok marks frames
    with <= max_miss missing positions; values at missing slots are 0 and
    saturation bits are stripped. Width-8 filters return values as a
    :class:`U64` pair."""
    rank, hit = at_rank(mibf, hashes)
    misses = jnp.sum((~hit).astype(jnp.int32), axis=-1)
    ok = misses <= max_miss
    if mibf.data_width == 8:
        z = jnp.uint32(0)
        lo = jnp.where(hit, mibf.data[0][rank], z)
        hi = jnp.where(hit, mibf.data[1][rank], z)
        sat = _sat_u64(hi, lo)
        vals = U64(jnp.where(sat, hi & jnp.uint32(ANTI_HI), hi), lo)
        frame_saturated = jnp.all(hit & sat, axis=-1)
        return vals, ok, frame_saturated
    raw = jnp.where(hit, get_data(mibf, rank), 0)
    smask = jnp.asarray(mibf.s_mask, mibf.data.dtype)
    anti = jnp.asarray(mibf.s_anti_mask, mibf.data.dtype)
    sat = raw > smask
    vals = jnp.where(sat, raw & anti, raw)
    # reference semantics: any miss or any non-saturated present value
    # clears the frame's saturated flag (MIBloomFilter.hpp:452-469)
    frame_saturated = jnp.all(hit & sat, axis=-1)
    return vals, ok, frame_saturated


# ---------------------------------------------------------------------------
# data mutation (batched)
# ---------------------------------------------------------------------------

def saturate(mibf: MIBloomFilter, hashes: U64) -> MIBloomFilter:
    """OR the saturation bit at every addressed rank
    (MIBloomFilter.hpp:440-446). Positions are assumed present in the bv
    (construction invariant)."""
    rank, _ = at_rank(mibf, hashes)
    flat = rank.reshape(-1)
    # scatter-OR of a single repeated mask: max works because the mask is
    # the top bit — data | s_mask == max(data, data | s_mask) is NOT true in
    # general, so build a bit delta then OR.
    hasbit = jnp.zeros(mibf.d_size, bool).at[flat].set(True, mode="drop")
    if mibf.data_width == 8:
        hi = jnp.where(hasbit, mibf.data[1] | jnp.uint32(SAT_HI),
                       mibf.data[1])
        return dataclasses.replace(
            mibf, data=jnp.stack([mibf.data[0], hi]))
    smask = jnp.asarray(mibf.s_mask, mibf.data.dtype)
    data = jnp.where(hasbit, mibf.data | smask, mibf.data)
    return dataclasses.replace(mibf, data=data)


def set_data(mibf: MIBloomFilter, rank: jax.Array, ids: jax.Array
             ) -> MIBloomFilter:
    """Overwrite IDs at ranks, preserving the saturation bit
    (setData, MIBloomFilter.hpp:625-634). Later duplicates win.
    Width-8 filters take ``ids`` as a U64 pair (or uint32 low limbs)."""
    if mibf.data_width == 8:
        if isinstance(ids, U64):
            ids_lo, ids_hi = ids.lo, ids.hi
        else:
            ids_lo = jnp.asarray(ids, jnp.uint32)
            ids_hi = jnp.zeros_like(ids_lo)
        keep_sat = mibf.data[1] & jnp.uint32(SAT_HI)
        lo = mibf.data[0].at[rank].set(ids_lo, mode="drop")
        hi = mibf.data[1].at[rank].set(ids_hi, mode="drop")
        touched = jnp.zeros(mibf.d_size, bool).at[rank].set(
            True, mode="drop")
        hi = jnp.where(touched, hi | keep_sat, hi)
        return dataclasses.replace(mibf, data=jnp.stack([lo, hi]))
    smask = jnp.asarray(mibf.s_mask, mibf.data.dtype)
    keep_sat = mibf.data & smask
    newvals = ids.astype(mibf.data.dtype)
    data = mibf.data.at[rank].set(newvals, mode="drop")
    # re-apply preserved saturation bits at touched ranks
    touched = jnp.zeros(mibf.d_size, bool).at[rank].set(True, mode="drop")
    data = jnp.where(touched, data | keep_sat, data)
    return dataclasses.replace(mibf, data=data)


# ---------------------------------------------------------------------------
# statistics (MIBloomFilter.hpp:539-620, 664-707)
# ---------------------------------------------------------------------------

def get_pop(mibf: MIBloomFilter) -> int:
    return mibf.d_size


def get_pop_non_zero(mibf: MIBloomFilter) -> jax.Array:
    if mibf.data_width == 8:
        return jnp.sum(((mibf.data[0] | mibf.data[1]) != 0)
                       .astype(jnp.uint32))
    return jnp.sum((mibf.data != 0).astype(jnp.uint32))


def get_pop_saturated(mibf: MIBloomFilter) -> jax.Array:
    if mibf.data_width == 8:
        return jnp.sum(_sat_u64(mibf.data[1], mibf.data[0])
                       .astype(jnp.uint32))
    smask = jnp.asarray(mibf.s_mask, mibf.data.dtype)
    return jnp.sum((mibf.data > smask).astype(jnp.uint32))


def _hist_bins_u64(lo: jax.Array, hi_stripped: jax.Array,
                   num_ids: int) -> jax.Array:
    """Histogram bin indices for width-8 IDs: entries whose stripped value
    does not fit the [0, num_ids) table land out of range (drop mode),
    exactly as the reference's ``counts[id]`` would index past a table
    sized for small IDs."""
    oob = (hi_stripped != 0) | (lo >= jnp.uint32(num_ids))
    return jnp.where(oob, jnp.uint32(num_ids), lo).astype(jnp.int32)


def get_id_counts(mibf: MIBloomFilter, num_ids: int):
    """Histogram of stored IDs (getIDCounts, MIBloomFilter.hpp:539-551).
    Returns (counts[num_ids], saturated_count)."""
    if mibf.data_width == 8:
        lo, hi = mibf.data[0], mibf.data[1]
        sat = _sat_u64(hi, lo)
        hs = jnp.where(sat, hi & jnp.uint32(ANTI_HI), hi)
        ids = _hist_bins_u64(lo, hs, num_ids)
        counts = jnp.zeros(num_ids, jnp.uint32).at[ids].add(1, mode="drop")
        return counts, jnp.sum(sat.astype(jnp.uint32))
    smask = jnp.asarray(mibf.s_mask, mibf.data.dtype)
    anti = jnp.asarray(mibf.s_anti_mask, mibf.data.dtype)
    sat = mibf.data > smask
    ids = jnp.where(sat, mibf.data & anti, mibf.data).astype(jnp.int32)
    counts = jnp.zeros(num_ids, jnp.uint32).at[ids].add(1, mode="drop")
    return counts, jnp.sum(sat.astype(jnp.uint32))


def get_id_counts_strand(mibf: MIBloomFilter, num_ids: int):
    """getIDCountsStrand (MIBloomFilter.hpp:557-569): strips strand bit for
    saturated entries via s_idMask, strand via s_antiStrand otherwise."""
    if mibf.data_width == 8:
        lo, hi = mibf.data[0], mibf.data[1]
        sat = _sat_u64(hi, lo)
        hs = jnp.where(sat, hi & jnp.uint32(ID_HI),
                       hi & jnp.uint32(~STRAND_HI & 0xFFFFFFFF))
        ids = _hist_bins_u64(lo, hs, num_ids)
        counts = jnp.zeros(num_ids, jnp.uint32).at[ids].add(1, mode="drop")
        return counts, jnp.sum(sat.astype(jnp.uint32))
    smask = jnp.asarray(mibf.s_mask, mibf.data.dtype)
    idm = jnp.asarray(mibf.s_id_mask, mibf.data.dtype)
    width_mask = (1 << (8 * mibf.data_width)) - 1
    antistrand = jnp.asarray(~mibf.s_strand & width_mask, mibf.data.dtype)
    sat = mibf.data > smask
    ids = jnp.where(sat, mibf.data & idm,
                    mibf.data & antistrand).astype(jnp.int32)
    counts = jnp.zeros(num_ids, jnp.uint32).at[ids].add(1, mode="drop")
    return counts, jnp.sum(sat.astype(jnp.uint32))


def calc_frame_probs(mibf: MIBloomFilter, num_ids: int, allowed_miss: int):
    """calcFrameProbs (MIBloomFilter.hpp:664-679): per-ID frame match
    probabilities. Returns (frame_probs list, saturation proportion)."""
    occupancy = mibf.d_size / mibf.size
    counts, sat = get_id_counts(mibf, num_ids)
    counts = np.asarray(counts)
    total = int(counts[1:].sum())
    sat_prop = float(sat) / total if total else 0.0
    probs = [0.0] * num_ids
    for i in range(1, num_ids):
        probs[i] = calc_prob_single_frame(
            occupancy, mibf.hash_num, counts[i] / total if total else 0.0,
            allowed_miss)
    return probs, sat_prop


def calc_frame_probs_strand(mibf: MIBloomFilter, num_ids: int,
                            allowed_miss: int):
    """calcFrameProbsStrand (MIBloomFilter.hpp:683-707): like
    calc_frame_probs but counting IDs with getIDCountsStrand, and — a
    reference quirk — normalizing by the sum over the WHOLE count table
    (index 0 included), not just IDs >= 1."""
    occupancy = mibf.d_size / mibf.size
    counts, sat = get_id_counts_strand(mibf, num_ids)
    counts = np.asarray(counts)
    total = int(counts.sum())
    sat_prop = float(sat) / total if total else 0.0
    probs = [0.0] * num_ids
    for i in range(1, num_ids):
        probs[i] = calc_prob_single_frame(
            occupancy, mibf.hash_num, counts[i] / total if total else 0.0,
            allowed_miss)
    return probs, sat_prop
