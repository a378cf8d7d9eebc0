"""MIBF construction: the 4-phase pipeline of MIBFConstructSupport plus the
single-pass random-order insert of MIBloomFilter::insert.

Reference: /root/reference/MIBFConstructSupport.hpp.

Phase 1  populate a plain bit vector from hash frames      (insertBV :75-87)
Phase 2  freeze into an MIBF with rank structure           (getEmptyMIBF :92-99)
Phase 3  per-ID reservoir-sampled ID insertion             (insertMIBF :109-130)
Phase 4  saturation pass with ID-mutation rescue           (insertSaturation
                                                            /setSatIfMissing :132-214)

Determinism note: the reference iterates a google::dense_hash_set of hash
values in phase 3 — an implementation-defined order that additionally
varies run-to-run under OpenMP. This implementation defines the processing
order as *sorted by hash value*, which is deterministic and reproducible;
the per-event reservoir arithmetic (count bump + ``std::hash<T>(v ^ id) %
count == count-1`` acceptance, MIBFConstructSupport.hpp:122-128) is
mirrored exactly, vectorized as a segmented last-accepted-wins reduction
per rank.

Phase 4 mirrors the reference's exact quirks: ``seenSet`` and
``replacementIDs`` are constructed pre-filled with h zeros
(MIBFConstructSupport.hpp:173-175), so ID 0 always qualifies as
"duplicated" — reproduced faithfully.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u64
from ..ops.u64 import U64
from .counting import _blocked_scan
from ..utils import stdcpp
from . import bloom as bloom_mod
from . import mibf as mibf_mod
from .mibf import MIBloomFilter


@partial(jax.tree_util.register_dataclass,
         data_fields=["bv_words"],
         meta_fields=["filter_size", "kmer_size", "hash_num", "occupancy",
                      "sseeds"])
@dataclasses.dataclass
class BitVectorState:
    """Phase-1 state: the raw bit vector being populated."""

    bv_words: jax.Array
    filter_size: int
    kmer_size: int
    hash_num: int
    occupancy: float
    sseeds: tuple


def create(expected_entries: int, k: int, hash_num: int,
           occupancy: float = 0.5,
           spaced_seeds: Sequence[str] = ()) -> BitVectorState:
    """MIBFConstructSupport ctor (MIBFConstructSupport.hpp:36-46)."""
    size = mibf_mod.calc_optimal_size(expected_entries, hash_num, occupancy)
    nwords = (size + 31) // 32
    return BitVectorState(bv_words=jnp.zeros(nwords, jnp.uint32),
                          filter_size=size, kmer_size=k, hash_num=hash_num,
                          occupancy=occupancy, sseeds=tuple(spaced_seeds))


def _scatter_or_bits(words: jax.Array, pos: jax.Array, valid: jax.Array,
                     size: int | None = None,
                     use_kernel: bool | None = None):
    """Phase-1 scatter-OR, kernel-routed: rides the same in-place RMW
    ring scatter as the Bloom insert (bloom.insert_sentinel_positions;
    VERDICT r4 next #1) — on TPU the filter slots stream through VMEM
    once instead of paying the XLA serial scatter + full-array OR."""
    sent = jnp.uint32(0xFFFFFFFF)
    p = jnp.where(valid, pos.astype(jnp.uint32), sent)
    bfw = bloom_mod.BloomFilter(
        words=words, size=size if size is not None else words.shape[0] * 32,
        hash_num=0, kmer_size=0)
    return bloom_mod.insert_sentinel_positions(
        bfw, p, use_kernel=use_kernel).words


def insert_bv(state: BitVectorState, hashes: U64, valid=None,
              use_kernel: bool | None = None) -> BitVectorState:
    """Phase 1: scatter-OR all frame positions into the bit vector
    (insertBV, MIBFConstructSupport.hpp:75-87)."""
    pos = u64.mod_to_index(hashes, state.filter_size)
    if valid is None:
        v = jnp.ones(pos.shape, bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid)[..., None], pos.shape)
    return dataclasses.replace(
        state, bv_words=_scatter_or_bits(state.bv_words, pos, v,
                                         size=state.filter_size,
                                         use_kernel=use_kernel))


def insert_bv_colli(state: BitVectorState, hashes: U64, valid=None):
    """Phase-1 variant counting k-mers whose h positions were all already
    set (insertBVColli, MIBFConstructSupport.hpp:55-73), batched-exact.

    The stream-order dependence has a closed form: frame i collides iff
    every one of its h bits was set at its turn, i.e. the bit was set in
    the initial vector OR first written by a strictly earlier frame (a
    frame checks all slots against the pre-write words, so its own writes
    never count). First-writer indices come from one (position, frame)
    sort — no per-frame scan. Bit-identical to
    :func:`insert_bv_colli_sequential` (asserted in tests/test_mibf.py)."""
    pos = u64.mod_to_index(hashes, state.filter_size)
    h = pos.shape[-1]
    flat_pos = pos.reshape(-1, h)
    n = flat_pos.shape[0]
    if valid is None:
        v = jnp.ones(n, bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid),
                             hashes.hi.shape[:-1]).reshape(-1)

    sent = jnp.uint32(0xFFFFFFFF)
    pf = jnp.where(v[:, None], flat_pos.astype(jnp.uint32), sent)
    flat = pf.reshape(-1)
    fidx = jnp.repeat(jnp.arange(n, dtype=jnp.int32), h)
    sidx = jnp.arange(n * h, dtype=jnp.int32)
    p_s, f_s, s_s = jax.lax.sort((flat, fidx, sidx), num_keys=2,
                                 is_stable=False)
    idx = jnp.arange(n * h, dtype=jnp.int32)
    is_start = jnp.ones(n * h, bool).at[1:].set(p_s[1:] != p_s[:-1])
    run_start = _blocked_scan(jnp.maximum, jnp.where(is_start, idx, 0), 0)
    first_f = f_s[run_start]              # first frame writing this position
    written_earlier = first_f < f_s
    # un-permute the 1-bit flag with the packed-key trick
    packed = jax.lax.sort(((s_s.astype(jnp.uint32) << 1)
                           | written_earlier.astype(jnp.uint32),),
                          is_stable=False)[0]
    we = ((packed & 1) == 1).reshape(n, h)

    word = (flat_pos >> 5).astype(jnp.int32)
    bit = flat_pos & 31
    initial = ((state.bv_words[word] >> bit) & 1) == 1
    colli = v & jnp.all(initial | we, axis=-1)
    count = jnp.sum(colli.astype(jnp.int32))
    words = _scatter_or_bits(state.bv_words, flat_pos,
                             jnp.broadcast_to(v[:, None], flat_pos.shape),
                             size=state.filter_size)
    return dataclasses.replace(state, bv_words=words), count


def insert_bv_colli_sequential(state: BitVectorState, hashes: U64,
                               valid=None):
    """Transparent per-frame mirror of insertBVColli
    (MIBFConstructSupport.hpp:55-73) as a lax.scan; kept as the oracle for
    the batched path."""
    pos = u64.mod_to_index(hashes, state.filter_size)
    h = pos.shape[-1]
    flat = pos.reshape(-1, h)
    if valid is None:
        v = jnp.ones(flat.shape[0], bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid),
                             hashes.hi.shape[:-1]).reshape(-1)

    def step(carry, inp):
        words, count = carry
        p, ok = inp
        word = (p >> 5).astype(jnp.int32)
        bit = p & 31
        cur = words[word]
        already = ((cur >> bit) & 1) == 1
        colli = jnp.all(already)
        # combine masks of slots sharing a word: a duplicate-index scatter
        # must write identical values to be well-defined
        maskbit = jnp.uint32(1) << bit
        same = word[None, :] == word[:, None]
        comb = cur
        for j in range(h):
            comb = comb | jnp.where(same[:, j], maskbit[j], 0)
        newwords = words.at[word].set(jnp.where(ok, comb, cur))
        count = count + jnp.where(ok & colli, 1, 0)
        return (newwords, count), None

    (words, count), _ = jax.lax.scan(
        step, (state.bv_words, jnp.int32(0)), (flat, v))
    return dataclasses.replace(state, bv_words=words), count


def get_empty_mibf(state: BitVectorState, data_width: int = 2):
    """Phase 2: freeze the bit vector into an MIBF + zeroed occurrence
    counters (getEmptyMIBF, MIBFConstructSupport.hpp:92-99)."""
    m = mibf_mod.freeze(state.bv_words, state.filter_size, state.hash_num,
                        state.kmer_size, data_width=data_width,
                        sseeds=state.sseeds)
    counts = jnp.zeros(m.d_size, m.data.dtype)
    return m, counts


def _unique_sorted_u64(hashes: U64, valid):
    """Flatten, mask, sort, and dedupe hash values. Returns
    (hi, lo, keep_mask) sorted ascending with sentinels (max u64) last."""
    hi = hashes.hi.reshape(-1)
    lo = hashes.lo.reshape(-1)
    if valid is not None:
        v = jnp.broadcast_to(jnp.asarray(valid)[..., None],
                             hashes.hi.shape).reshape(-1)
        hi = jnp.where(v, hi, jnp.uint32(0xFFFFFFFF))
        lo = jnp.where(v, lo, jnp.uint32(0xFFFFFFFF))
    hi_s, lo_s = jax.lax.sort((hi, lo), num_keys=2, is_stable=False)
    first = jnp.ones(hi_s.shape, bool)
    neq = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
    keep = first.at[1:].set(neq)
    # note: a genuine hash value of 2**64-1 would collide with the sentinel;
    # astronomically unlikely and at worst drops one insertion event
    sent = (hi_s == jnp.uint32(0xFFFFFFFF)) & (lo_s == jnp.uint32(0xFFFFFFFF))
    return hi_s, lo_s, keep & ~sent


def insert_mibf(m: MIBloomFilter, counts: jax.Array, hashes: U64, id_value: int,
                valid=None, use_kernel: bool | None = None):
    """Phase 3: single-value reservoir sampling of ``id_value`` over the
    unique hash values of one sequence (insertMIBF,
    MIBFConstructSupport.hpp:109-130), processed in sorted-value order.

    For each unique value v (in order): count = ++counts[rank(v)];
    accept iff std::hash<T>(v ^ id) % count == count - 1; accepted values
    overwrite data[rank] (last acceptance per rank wins).
    Returns (mibf, counts).
    """
    hi_s, lo_s, keep = _unique_sorted_u64(hashes, valid)
    pos = mibf_mod.positions(m, U64(hi_s, lo_s))
    rank, _hit = mibf_mod.rank_of_positions_auto(m, pos,
                                                 use_kernel=use_kernel)
    data, counts = reservoir_core(m.data, counts, rank, hi_s, lo_s, keep,
                                  id_value, m.d_size, m.data_width)
    return dataclasses.replace(m, data=data), counts


def reservoir_core(data: jax.Array, counts: jax.Array, rank: jax.Array,
                   hi_s: jax.Array, lo_s: jax.Array, keep: jax.Array,
                   id_value, d_size: int, data_width: int):
    """The order-exact reservoir arithmetic of insertMIBF
    (MIBFConstructSupport.hpp:120-129) over value-sorted unique hashes
    with precomputed ranks; shared by the single-device and sharded
    (parallel/dist_mibf.py) paths. ``rank`` entries of masked values must
    already be the d_size sentinel. Returns (data, counts).

    ``id_value`` may be a scalar (one sequence) or an int32 array aligned
    with the input elements (the multi-sequence batch of
    :func:`insert_mibf_many`: elements must arrive id-major, each id's
    values sorted — the stable rank sort then reproduces the sequential
    per-id processing order inside every rank group)."""
    width_bits = 8 * data_width
    n = hi_s.shape[0]
    rank = jnp.where(keep, rank, jnp.int32(d_size))  # sentinel rank
    id_is_vec = hasattr(id_value, "shape") and getattr(
        id_value, "ndim", 0) > 0

    # order by (rank, value): values are already sorted, so a stable sort
    # on rank preserves value order within each rank group. ONE stable
    # sort with payload operands — the argsort + five x[order] gathers
    # it replaces were five 4.1M-element XLA random gathers (~60 ms
    # each on chip; bench/mibf_stages.py r5)
    if id_is_vec:
        rank_o, hi_o, lo_o, keep8, id_o = jax.lax.sort(
            (rank, hi_s, lo_s, keep.astype(jnp.uint8),
             jnp.asarray(id_value, jnp.int32)),
            num_keys=1, is_stable=True)
    else:
        rank_o, hi_o, lo_o, keep8 = jax.lax.sort(
            (rank, hi_s, lo_s, keep.astype(jnp.uint8)),
            num_keys=1, is_stable=True)
        id_o = id_value
    keep_o = keep8 == 1

    # within-group index: i - start_of_group
    idx = jnp.arange(n)
    is_start = jnp.ones(n, bool).at[1:].set(rank_o[1:] != rank_o[:-1])
    group_start = _blocked_scan(jnp.maximum,
                                jnp.where(is_start, idx, 0), 0)
    within = idx - group_start

    c0 = counts[jnp.clip(rank_o, 0, max(d_size - 1, 0))].astype(jnp.uint32)
    c0 = jnp.where(keep_o, c0, 0)
    if width_bits >= 64:
        # uint64 T: the occurrence count wraps mod 2**64 in the reference
        # — unreachable here (counts are uint32, wrap at 2**32, itself
        # beyond any realistic per-rank occurrence total)
        count_val = c0 + within.astype(jnp.uint32) + 1
    else:
        count_val = (c0 + within.astype(jnp.uint32) + 1) & jnp.uint32(
            (1 << width_bits) - 1)

    # std::hash<T>(v ^ id): identity after truncation to T
    # (MIBFConstructSupport.hpp:122-125; libstdc++ integral hash).
    # For widths <= 4 IDs are T-width (< 2**32) so only the low limb is
    # affected; width 8 XORs and reduces the full 64-bit value.
    # id_value may be a python int or a traced scalar.
    safe_count = jnp.maximum(count_val, 1)
    if width_bits >= 64:
        if id_is_vec:
            raise NotImplementedError(
                "width-8 reservoir takes one id per call")
        idi = int(id_value)
        vx = U64(hi_o ^ jnp.uint32((idi >> 32) & 0xFFFFFFFF),
                 lo_o ^ jnp.uint32(idi & 0xFFFFFFFF))
        hmod = u64.mod_u32(vx, safe_count)
    else:
        id32 = jnp.asarray(id_o, jnp.uint32)
        vx_lo = lo_o ^ id32
        if width_bits >= 32:
            hval = vx_lo  # T is uint32: low limb
        else:
            hval = vx_lo & jnp.uint32((1 << width_bits) - 1)
        hmod = hval % safe_count
    accepted = keep_o & (count_val != 0) & (hmod == (count_val - 1))

    # last accepted within each group wins (later setData overwrites):
    # an element is the winner iff it is accepted and no LATER element of
    # its group is accepted — gather-free via one reverse blocked scan
    # (next accepted index at-or-after i+1 vs the group's end; the
    # segment_max + two gathers this replaces were 4.1M random lookups)
    is_end = jnp.ones(n, bool).at[:-1].set(rank_o[1:] != rank_o[:-1])
    run_end = _blocked_scan(jnp.minimum, jnp.where(is_end, idx, n - 1),
                            n - 1, reverse=True)
    next_acc = _blocked_scan(jnp.minimum, jnp.where(accepted, idx, n), n,
                             reverse=True)
    next_acc_after = jnp.concatenate(
        [next_acc[1:], jnp.full((1,), n, next_acc.dtype)])
    winner = accepted & (next_acc_after > run_end)

    ranks_to_set = jnp.where(winner, rank_o, jnp.int32(d_size))
    # setData semantics: overwrite ID, preserve saturation bit
    # (MIBloomFilter.hpp:625-634); later duplicates win.
    # Widths <= 4 write via a WINNER PLANE built with a monotone sorted
    # scatter-add (rank_o ascends; each rank receives at most one
    # nonzero): a sentinel-masked .set here is an unsorted random
    # scatter, measured ~70 ns/index on chip — ~300 of the 388 ms
    # phase-3 pass at the bench scale (bench/mibf_stages.py r5).
    if width_bits < 64:
        # 0 = no winner (id 2**32-1 would wrap, but it is not a valid ID
        # at any width <= 4: its top bit is the saturation flag)
        idp1 = jnp.asarray(id_o, jnp.uint32) + 1
        win_plane = jnp.zeros(d_size + 1, jnp.uint32).at[rank_o].add(
            jnp.where(winner, idp1, 0), indices_are_sorted=True,
            mode="drop")[:d_size]
        smask = jnp.asarray((1 << (width_bits - 1)),
                            jnp.uint32).astype(data.dtype)
        won = win_plane > 0
        new_id = (win_plane - 1).astype(data.dtype)
        data = jnp.where(won, new_id | (data & smask), data)
        nranks = data.shape[0]
        add = jnp.zeros(nranks + 1, jnp.uint32).at[rank_o].add(
            keep_o.astype(jnp.uint32), indices_are_sorted=True,
            mode="drop")[:nranks]
        counts = (counts.astype(jnp.uint32) + add).astype(counts.dtype)
        return data, counts
    # width 8: dual-plane writes (the rare instantiation keeps the
    # simple masked scatters)
    idi = int(id_value)
    id_lo = jnp.uint32(idi & 0xFFFFFFFF)
    id_hi = jnp.uint32((idi >> 32) & 0xFFFFFFFF)
    keep_sat = data[1] & jnp.uint32(mibf_mod.SAT_HI)
    lo = data[0].at[ranks_to_set].set(id_lo, mode="drop")
    hi = data[1].at[ranks_to_set].set(id_hi, mode="drop")
    touched = jnp.zeros(lo.shape[0], bool).at[ranks_to_set].set(
        True, mode="drop")
    hi = jnp.where(touched, hi | keep_sat, hi)
    data = jnp.stack([lo, hi])
    nranks = lo.shape[0]

    # counts[rank] += group_size for each touched rank (wraps in T)
    add = jnp.zeros(nranks, jnp.uint32).at[rank_o].add(
        keep_o.astype(jnp.uint32), mode="drop", indices_are_sorted=True)
    counts = (counts.astype(jnp.uint32) + add).astype(counts.dtype)
    return data, counts


def insert_mibf_many(m: MIBloomFilter, counts: jax.Array, hashes: U64,
                     ids, valid=None, use_kernel: bool | None = None):
    """Phase 3 for a whole BATCH of sequences in one dispatch: hashes
    U64[G, W, h] with per-sequence ids int32[G] (stream order = ascending
    G), valid bool[G, W]. Bit-identical to calling :func:`insert_mibf`
    per sequence in order: each sequence's unique values process in
    sorted order, and rank groups interleave sequences in id-major order
    (the stable rank sort preserves the concatenation order, which IS
    the sequential processing order).

    One unique-sort per sequence (batched), ONE rank lookup and ONE
    reservoir pass over the concatenated stream — the 63-call scan at
    the bench geometry measured 365 ms (5.8 ms/ref of fixed per-call
    sort/gather/scatter cost, bench/mibf_stages.py r5); this path does
    the same work in a single set of full-size passes."""
    G = hashes.hi.shape[0]
    flat_shape = (G, -1)
    hi2 = hashes.hi.reshape(G, -1)
    lo2 = hashes.lo.reshape(G, -1)
    if valid is not None:
        v2 = jnp.broadcast_to(jnp.asarray(valid)[..., None],
                              hashes.hi.shape).reshape(G, -1)
        hi2 = jnp.where(v2, hi2, jnp.uint32(0xFFFFFFFF))
        lo2 = jnp.where(v2, lo2, jnp.uint32(0xFFFFFFFF))
    # per-sequence value sort + dedupe (batched along G)
    hi_s, lo_s = jax.lax.sort((hi2, lo2), num_keys=2, is_stable=False,
                              dimension=-1)
    first = jnp.ones(hi_s.shape, bool)
    neq = (hi_s[:, 1:] != hi_s[:, :-1]) | (lo_s[:, 1:] != lo_s[:, :-1])
    keep = first.at[:, 1:].set(neq)
    sent = (hi_s == jnp.uint32(0xFFFFFFFF)) & \
        (lo_s == jnp.uint32(0xFFFFFFFF))
    keep = keep & ~sent
    idvec = jnp.repeat(jnp.asarray(ids, jnp.int32), hi_s.shape[1])

    hi_f = hi_s.reshape(-1)
    lo_f = lo_s.reshape(-1)
    keep_f = keep.reshape(-1)
    pos = mibf_mod.positions(m, U64(hi_f, lo_f))
    rank, _hit = mibf_mod.rank_of_positions_auto(m, pos,
                                                 use_kernel=use_kernel)
    data, counts = reservoir_core(m.data, counts, rank, hi_f, lo_f,
                                  keep_f, idvec, m.d_size, m.data_width)
    return dataclasses.replace(m, data=data), counts


def _phase4_ranks(m: MIBloomFilter, hashes: U64, valid):
    """Per-frame rank rows for phase 4 (ranks never change during the
    pass: only data/counts mutate, the bit vector is frozen)."""
    h = hashes.hi.shape[-1]
    pos = mibf_mod.positions(m, hashes).reshape(-1, h)
    rank, _hit = mibf_mod.rank_of_positions_auto(m, pos)
    if valid is None:
        v = jnp.ones(pos.shape[0], bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid),
                             hashes.hi.shape[:-1]).reshape(-1)
    return rank.reshape(-1, h), v


def _phase4_step_fn(d_size: int, data_width: int, id_value):
    """One setSatIfMissing frame (MIBFConstructSupport.hpp:168-214) on
    precomputed rank rows; carry = (data, counts). Shared by the
    sequential mirror and the entangled replay of the batched path."""
    width_bits = 8 * data_width
    s_mask = 1 << (width_bits - 1)
    s_anti = s_mask - 1

    def step(carry, inp):
        data, cnts = carry
        smask = jnp.asarray(s_mask, data.dtype)
        anti = jnp.asarray(s_anti, data.dtype)
        idv = jnp.asarray(id_value, data.dtype)
        rk, ok = inp
        h = rk.shape[0]
        rk = jnp.clip(rk, 0, max(d_size - 1, 0))
        results = data[rk]
        cur = results & anti                 # [h]
        value_found = jnp.any(cur == idv)

        # seenSet pre-filled with h zeros => cur==0 is always "seen";
        # otherwise seen iff an earlier slot holds the same value
        iota = jnp.arange(h)
        same_earlier = (cur[None, :] == cur[:, None]) & \
            (iota[None, :] < iota[:, None])
        in_seen = (cur == 0) | jnp.any(same_earlier, axis=1)
        # replacementIDs = pre-filled zeros + values appended when seen
        dup_vals_mask = in_seen  # slots whose value went into replacementIDs
        # membership: cur_i in replacementIDs iff cur_i==0 (pre-fill) or
        # some slot j with dup_vals_mask[j] and cur[j]==cur[i]
        in_repl = (cur == 0) | jnp.any(
            dup_vals_mask[None, :] & (cur[None, :] == cur[:, None]), axis=1)

        slot_counts = cnts[rk].astype(jnp.uint32)
        # running strict max, first occurrence wins; qualifying slots only
        qual = in_repl & (slot_counts > 0)
        score = jnp.where(qual, slot_counts, 0)
        best = jnp.max(score)
        has_repl = best > 0
        first_best = jnp.argmax(score == best)  # first index achieving max
        repl_rank = rk[first_best]

        do_mutate = ok & ~value_found & has_repl
        do_saturate = ok & ~value_found & ~has_repl

        new_id = jnp.where(
            data[repl_rank] > smask, idv | smask, idv)
        data = data.at[repl_rank].set(
            jnp.where(do_mutate, new_id, data[repl_rank]))
        cnts = cnts.at[repl_rank].add(
            jnp.where(do_mutate, 1, 0).astype(cnts.dtype))

        satvals = jnp.where(do_saturate, data[rk] | smask, data[rk])
        data = data.at[rk].set(satvals)
        return (data, cnts), None

    return step


def _phase4_step_fn_u64(d_size: int, id_value):
    """Width-8 (uint64 T) twin of :func:`_phase4_step_fn` on dual uint32
    data planes (setSatIfMissing, MIBFConstructSupport.hpp:168-214);
    carry = (data uint32[2, d_size], counts uint32[d_size])."""
    idi = int(id_value)
    sat_hi = jnp.uint32(mibf_mod.SAT_HI)
    anti_hi = jnp.uint32(mibf_mod.ANTI_HI)

    def step(carry, inp):
        data, cnts = carry
        idv_lo = jnp.uint32(idi & 0xFFFFFFFF)
        idv_hi = jnp.uint32((idi >> 32) & 0xFFFFFFFF)
        rk, ok = inp
        h = rk.shape[0]
        rk = jnp.clip(rk, 0, max(d_size - 1, 0))
        lo = data[0][rk]
        hi = data[1][rk]
        cur_lo = lo
        cur_hi = hi & anti_hi
        value_found = jnp.any((cur_lo == idv_lo) & (cur_hi == idv_hi))

        iota = jnp.arange(h)
        eq = (cur_lo[None, :] == cur_lo[:, None]) & \
            (cur_hi[None, :] == cur_hi[:, None])
        is_zero = (cur_lo | cur_hi) == 0
        same_earlier = eq & (iota[None, :] < iota[:, None])
        in_seen = is_zero | jnp.any(same_earlier, axis=1)
        in_repl = is_zero | jnp.any(
            in_seen[None, :] & eq, axis=1)

        slot_counts = cnts[rk].astype(jnp.uint32)
        qual = in_repl & (slot_counts > 0)
        score = jnp.where(qual, slot_counts, 0)
        best = jnp.max(score)
        has_repl = best > 0
        first_best = jnp.argmax(score == best)
        repl_rank = rk[first_best]

        do_mutate = ok & ~value_found & has_repl
        do_saturate = ok & ~value_found & ~has_repl

        old_sat = mibf_mod._sat_u64(data[1][repl_rank], data[0][repl_rank])
        new_hi = jnp.where(old_sat, idv_hi | sat_hi, idv_hi)
        dlo = data[0].at[repl_rank].set(
            jnp.where(do_mutate, idv_lo, data[0][repl_rank]))
        dhi = data[1].at[repl_rank].set(
            jnp.where(do_mutate, new_hi, data[1][repl_rank]))
        cnts = cnts.at[repl_rank].add(
            jnp.where(do_mutate, 1, 0).astype(cnts.dtype))

        sat_hi_vals = jnp.where(do_saturate, dhi[rk] | sat_hi, dhi[rk])
        dhi = dhi.at[rk].set(sat_hi_vals)
        return (jnp.stack([dlo, dhi]), cnts), None

    return step


def insert_saturation_sequential(m: MIBloomFilter, counts: jax.Array,
                                 hashes: U64, id_value: int, valid=None):
    """Phase 4: per-frame saturation with ID-mutation rescue
    (setSatIfMissing, MIBFConstructSupport.hpp:168-214), sequential over
    frames via lax.scan. Kept as the oracle for the batched
    :func:`insert_saturation`. Returns (mibf, counts)."""
    rk, v = _phase4_ranks(m, hashes, valid)
    if m.data_width == 8:
        step = _phase4_step_fn_u64(m.d_size, id_value)
    else:
        step = _phase4_step_fn(m.d_size, m.data_width, id_value)
    (data, counts), _ = jax.lax.scan(step, (m.data, counts), (rk, v))
    return dataclasses.replace(m, data=data), counts


def saturation_ranks(data: jax.Array, counts: jax.Array, rk: jax.Array,
                     v: jax.Array, d_size: int, data_width: int,
                     id_value, max_entangled: int | None = None,
                     domain_size: int | None = None):
    """Rank-level core of the batched phase 4 (setSatIfMissing,
    MIBFConstructSupport.hpp:168-214): apply one saturation pass of
    ``id_value`` over frames ``rk`` (int32[n, h] ranks < d_size, invalid
    frames masked by ``v`` bool[n]) to the (data, counts) planes,
    bit-identical to stream order. Shared by the single-device path and
    the mesh-resident distributed path (parallel/dist_mibf.py), which
    runs it on a compacted table of the touched ranks only. Widths
    1/2/4 only (width 8 routes through the sequential u64 scan in
    :func:`insert_saturation`).

    Decomposition (the counting-filter group-collapse applied to phase 4):

      1. frames with identical ordered rank tuples form a group; only the
         FIRST occurrence acts (a mutate makes id_value present -> later
         occurrences see value_found; a saturate is idempotent), so an
         untangled group applies its representative once, vectorized;
      2. groups sharing a rank with another group ("entangled") are
         order-dependent and replay with the sequential scan;
      3. more entangled frames than ``max_entangled`` (default n/8,
         min 256) -> the whole batch runs through the scan (still exact).
    """
    n, h = rk.shape
    width_bits = 8 * data_width
    s_mask = 1 << (width_bits - 1)
    sentr = jnp.int32(d_size)
    rk = jnp.where(v[:, None], rk, sentr)
    step = _phase4_step_fn(d_size, data_width, id_value)

    # --- 1. group by ordered rank tuple ----------------------------------
    order0 = jnp.arange(n, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        tuple(rk[:, j] for j in range(h)) + (order0,), num_keys=h)
    ks = jnp.stack(sorted_ops[:h], axis=1)             # [n, h] sorted rows
    frame_of = sorted_ops[h]                           # original frame idx
    new_grp = jnp.ones((n,), bool).at[1:].set(
        jnp.any(ks[1:] != ks[:-1], axis=1))

    gid = _blocked_scan(jnp.add, new_grp.astype(jnp.int32), 0) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jnp.where(new_grp, idx, 0)
    run_start = _blocked_scan(jnp.maximum, run_start, 0)
    is_last = jnp.ones((n,), bool).at[:-1].set(new_grp[1:])
    run_end = jnp.where(is_last, idx, n - 1)
    run_end = _blocked_scan(jnp.minimum, run_end, n - 1, reverse=True)

    # --- 2. entanglement: ranks shared across groups ----------------------
    pair_rank = ks.reshape(-1)                         # [n*h], gid-major
    pair_gid = jnp.repeat(gid, h)
    pidx = jnp.arange(n * h, dtype=jnp.uint32)
    pr_s, pg_s, pi_s = jax.lax.sort((pair_rank, pair_gid, pidx), num_keys=1)
    shared_prev = jnp.zeros((n * h,), bool).at[1:].set(
        (pr_s[1:] == pr_s[:-1]) & (pg_s[1:] != pg_s[:-1])
        & (pr_s[1:] != sentr))
    shared = shared_prev | jnp.concatenate(
        [shared_prev[1:], jnp.zeros(1, bool)])
    packed = jnp.sort((pi_s << 1) | shared.astype(jnp.uint32))
    frame_shared = jnp.any((packed & 1).reshape(n, h) == 1, axis=1)
    last_shared = _blocked_scan(jnp.maximum,
                                jnp.where(frame_shared, idx, -1), -1)
    next_shared = _blocked_scan(jnp.minimum,
                                jnp.where(frame_shared, idx, n), n,
                                reverse=True)
    entangled_s = (last_shared >= run_start) | (next_shared <= run_end)

    live_s = ks[:, 0] != sentr
    entangled_s = entangled_s & live_s

    # --- 3. vectorized application of untangled representatives ----------
    rep = new_grp & live_s & ~entangled_s
    rk_rep = rk[frame_of]                              # original slot order
    data0, counts0 = data, counts
    data, counts = _phase4_vectorized(
        data0, counts0, rk_rep, rep, d_size, s_mask, id_value)

    # --- 4. sequential replay of entangled frames in stream order --------
    if max_entangled is not None:
        cap = max_entangled
    else:
        # expected shared-rank pairs across the batch; collisions are
        # driven by the HASH-POSITION domain (the bit-vector size), NOT
        # the rank space — at ~1 slot/rank occupancy the d_size-based
        # estimate degenerated to cap == n and the replay re-processed
        # the whole batch (bench/mibf_stages.py r5). The replay scan
        # runs cap PADDED steps, so the buffer sizes to the expectation
        # with a 2x + 64 margin, falling back to the exact full scan on
        # overflow.
        dom = domain_size if domain_size is not None else d_size
        expected = (n * h) ** 2 // (2 * max(dom, 1))
        cap = max(64, 2 * expected + 64)
    cap = min(cap, n)
    n_ent = jnp.sum(entangled_s.astype(jnp.int32))
    ent_key = jnp.where(entangled_s, frame_of, jnp.int32(n))
    ent_sorted = jax.lax.sort(ent_key)[:cap]
    ent_rk = rk[jnp.minimum(ent_sorted, n - 1)]
    ent_ok = ent_sorted < n

    def replay(dc):
        out, _ = jax.lax.scan(step, dc, (ent_rk, ent_ok))
        return out

    data, counts = jax.lax.cond(n_ent > 0, replay, lambda dc: dc,
                                (data, counts))

    # too many entangled frames for the buffer: redo everything serially
    def full_sequential(_):
        out, _ = jax.lax.scan(step, (data0, counts0), (rk, v))
        return out

    data, counts = jax.lax.cond(n_ent > cap, full_sequential,
                                lambda _: (data, counts), None)
    return data, counts


def _phase4_vectorized(data, cnts, rk_rows, apply_mask, d_size: int,
                       s_mask: int, id_value):
    """Apply one setSatIfMissing step to every masked row of ``rk_rows``
    at once; rows must touch pairwise-disjoint rank sets (guaranteed by
    the untangled-group selection). ``id_value`` may be a scalar or a
    per-row vector (the multi-sequence batch)."""
    s_anti = s_mask - 1
    smask = jnp.asarray(s_mask, data.dtype)
    anti = jnp.asarray(s_anti, data.dtype)
    idv = jnp.asarray(id_value, data.dtype)
    g, h = rk_rows.shape
    idv_col = idv[:, None] if idv.ndim else idv

    safe_rk = jnp.where(apply_mask[:, None], rk_rows, 0).astype(jnp.int32)
    safe_rk = jnp.clip(safe_rk, 0, max(d_size - 1, 0))
    results = data[safe_rk]                            # [G, h]
    cur = results & anti
    value_found = jnp.any(cur == idv_col, axis=-1)

    iota = jnp.arange(h)
    earlier = iota[None, :] < iota[:, None]            # [i, j]: j before i
    eq = cur[:, :, None] == cur[:, None, :]            # [G, i, j]
    in_seen = (cur == 0) | jnp.any(eq & earlier[None], axis=-1)
    in_repl = (cur == 0) | jnp.any(eq & in_seen[:, None, :], axis=-1)

    slot_counts = cnts[safe_rk].astype(jnp.uint32)
    qual = in_repl & (slot_counts > 0)
    score = jnp.where(qual, slot_counts, 0)
    best = jnp.max(score, axis=-1)
    has_repl = best > 0
    first_best = jnp.argmax(score == best[:, None], axis=-1)
    repl_rank = jnp.take_along_axis(safe_rk, first_best[:, None],
                                    axis=1)[:, 0]
    old_repl = jnp.take_along_axis(results, first_best[:, None],
                                   axis=1)[:, 0]

    do_mutate = apply_mask & ~value_found & has_repl
    do_saturate = apply_mask & ~value_found & ~has_repl

    new_id = jnp.where(old_repl > smask, idv | smask, idv)
    dest_m = jnp.where(do_mutate, repl_rank, jnp.int32(d_size))
    data = data.at[dest_m].set(new_id, mode="drop")
    cnts = cnts.at[dest_m].add(jnp.asarray(1, cnts.dtype), mode="drop")

    dest_s = jnp.where(do_saturate[:, None], safe_rk, jnp.int32(d_size))
    data = data.at[dest_s].set(results | smask, mode="drop")
    return data, cnts


def saturation_ranks_many(data: jax.Array, counts: jax.Array,
                          rk: jax.Array, v: jax.Array, ids: jax.Array,
                          d_size: int, data_width: int,
                          max_entangled: int | None = None,
                          domain_size: int | None = None):
    """Batched phase 4 over frames carrying PER-FRAME ids (the
    multi-sequence build): same group-collapse as
    :func:`saturation_ranks` with the id joining the group key (frames
    of different ids are never interchangeable), and the entangled
    replay depth-SCHEDULED like the counting filter's
    (counting._replay_schedule): same-depth frames are pairwise
    rank-disjoint, so each depth applies as ONE vectorized
    setSatIfMissing instead of a per-frame scan step. Bit-identical to
    processing the frames one at a time in stream order."""
    from . import counting as counting_mod

    n, h = rk.shape
    width_bits = 8 * data_width
    s_mask = 1 << (width_bits - 1)
    sentr = jnp.int32(d_size)
    rk = jnp.where(v[:, None], rk, sentr)
    ids = jnp.asarray(ids, jnp.int32)

    # --- group by (ordered rank tuple, id) -------------------------------
    order0 = jnp.arange(n, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        tuple(rk[:, j] for j in range(h)) + (ids, order0),
        num_keys=h + 1)
    ks = jnp.stack(sorted_ops[:h], axis=1)
    gids_sorted = sorted_ops[h]
    frame_of = sorted_ops[h + 1]
    new_grp = jnp.ones((n,), bool).at[1:].set(
        jnp.any(ks[1:] != ks[:-1], axis=1)
        | (gids_sorted[1:] != gids_sorted[:-1]))

    gid = _blocked_scan(jnp.add, new_grp.astype(jnp.int32), 0) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = _blocked_scan(jnp.maximum, jnp.where(new_grp, idx, 0), 0)
    is_last = jnp.ones((n,), bool).at[:-1].set(new_grp[1:])
    run_end = _blocked_scan(jnp.minimum, jnp.where(is_last, idx, n - 1),
                            n - 1, reverse=True)

    # --- entanglement: ranks shared across groups ------------------------
    pair_rank = ks.reshape(-1)
    pair_gid = jnp.repeat(gid, h)
    pidx = jnp.arange(n * h, dtype=jnp.uint32)
    pr_s, pg_s, pi_s = jax.lax.sort((pair_rank, pair_gid, pidx),
                                    num_keys=1)
    shared_prev = jnp.zeros((n * h,), bool).at[1:].set(
        (pr_s[1:] == pr_s[:-1]) & (pg_s[1:] != pg_s[:-1])
        & (pr_s[1:] != sentr))
    shared = shared_prev | jnp.concatenate(
        [shared_prev[1:], jnp.zeros(1, bool)])
    packed = jnp.sort((pi_s << 1) | shared.astype(jnp.uint32))
    frame_shared = jnp.any((packed & 1).reshape(n, h) == 1, axis=1)
    last_shared = _blocked_scan(jnp.maximum,
                                jnp.where(frame_shared, idx, -1), -1)
    next_shared = _blocked_scan(jnp.minimum,
                                jnp.where(frame_shared, idx, n), n,
                                reverse=True)
    entangled_s = (last_shared >= run_start) | (next_shared <= run_end)
    live_s = ks[:, 0] != sentr
    entangled_s = entangled_s & live_s

    # --- vectorized untangled representatives ----------------------------
    rep = new_grp & live_s & ~entangled_s
    data0, counts0 = data, counts
    data, counts = _phase4_vectorized(
        data0, counts0, rk[frame_of], rep, d_size, s_mask, ids[frame_of])

    # --- depth-scheduled replay of entangled frames ----------------------
    if max_entangled is not None:
        cap = max_entangled
    else:
        # collision statistics live in the hash-position domain (see
        # saturation_ranks)
        dom = domain_size if domain_size is not None else d_size
        expected = (n * h) ** 2 // (2 * max(dom, 1))
        cap = max(64, 2 * expected + 64)
    cap = min(cap, n)
    n_ent = jnp.sum(entangled_s.astype(jnp.int32))
    ent_key = jnp.where(entangled_s, frame_of, jnp.int32(n))
    ent_sorted = jax.lax.sort(ent_key)[:cap]
    safe_src = jnp.minimum(ent_sorted, n - 1)
    ent_rk = rk[safe_src]
    ent_id = ids[safe_src]
    ent_ok = ent_sorted < n
    ent_rk = jnp.where(ent_ok[:, None], ent_rk, sentr)

    def replay(dc):
        d, c = dc
        depth, max_depth, sched_ok = counting_mod._replay_schedule(
            ent_rk.astype(jnp.uint32), n_ent, jnp.uint32(d_size))

        def rounds(dc):
            def rbody(st):
                r, d, c = st
                on = depth == r
                d2, c2 = _phase4_vectorized(d, c, ent_rk, on & ent_ok,
                                            d_size, s_mask, ent_id)
                return r + 1, d2, c2

            _, d2, c2 = jax.lax.while_loop(
                lambda st: st[0] <= max_depth, rbody,
                (jnp.int32(1),) + dc)
            return d2, c2

        def seq(dc):
            step = _phase4_step_fn_vec(d_size, data_width)
            stop = jnp.minimum(n_ent, jnp.int32(cap))

            def body(st):
                i, d, c = st
                rkf = jax.lax.dynamic_index_in_dim(ent_rk, i, axis=0,
                                                   keepdims=False)
                idf = jax.lax.dynamic_index_in_dim(ent_id, i, axis=0,
                                                   keepdims=False)
                (d2, c2), _ = step((d, c), (rkf, jnp.bool_(True), idf))
                return i + 1, d2, c2

            _, d2, c2 = jax.lax.while_loop(lambda st: st[0] < stop, body,
                                           (jnp.int32(0),) + dc)
            return d2, c2

        return jax.lax.cond(sched_ok, rounds, seq, (d, c))

    data, counts = jax.lax.cond(n_ent > 0, replay, lambda dc: dc,
                                (data, counts))

    # cap overflow: redo everything sequentially (exact)
    def full_sequential(_):
        step = _phase4_step_fn_vec(d_size, data_width)
        out, _ = jax.lax.scan(step, (data0, counts0), (rk, v, ids))
        return out

    return jax.lax.cond(n_ent > cap, full_sequential,
                        lambda _: (data, counts), None)


def _phase4_step_fn_vec(d_size: int, data_width: int):
    """Per-frame setSatIfMissing step taking the id as a scanned input
    (the multi-sequence sequential fallback)."""
    def step(carry, inp):
        rk, ok, idv = inp
        base = _phase4_step_fn(d_size, data_width, idv)
        return base(carry, (rk, ok))
    return step


def insert_saturation_many(m: MIBloomFilter, counts: jax.Array,
                           hashes: U64, ids, valid=None,
                           max_entangled: int | None = None,
                           use_kernel: bool | None = None):
    """Phase 4 for a whole batch of sequences in one dispatch: hashes
    U64[G, W, h], per-sequence ids int32[G], valid bool[G, W]; stream
    order = ascending (G, W). Bit-identical to per-sequence
    :func:`insert_saturation` calls in id order (asserted in
    tests/test_mibf.py)."""
    G, W = hashes.hi.shape[0], hashes.hi.shape[1]
    h = hashes.hi.shape[-1]
    pos = mibf_mod.positions(m, hashes).reshape(-1, h)
    rank, _hit = mibf_mod.rank_of_positions_auto(m, pos,
                                                 use_kernel=use_kernel)
    if valid is None:
        v = jnp.ones((G * W,), bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid), (G, W)).reshape(-1)
    idvec = jnp.repeat(jnp.asarray(ids, jnp.int32), W)
    data, counts = saturation_ranks_many(
        m.data, counts, rank.reshape(-1, h), v, idvec, m.d_size,
        m.data_width, max_entangled, domain_size=m.size)
    return dataclasses.replace(m, data=data), counts


def insert_saturation(m: MIBloomFilter, counts: jax.Array, hashes: U64,
                      id_value: int, valid=None,
                      max_entangled: int | None = None):
    """Phase 4 (setSatIfMissing, MIBFConstructSupport.hpp:168-214),
    batched-exact: group collapse + entangled replay (see
    :func:`saturation_ranks`), bit-identical to the per-frame scan mirror
    :func:`insert_saturation_sequential`. Returns (mibf, counts).

    Width-8 filters run the sequential mirror (the rare uint64-ID
    instantiation trades the batched fast path for the dual-plane exact
    scan)."""
    if m.data_width == 8:
        return insert_saturation_sequential(m, counts, hashes, id_value,
                                            valid)
    rk, v = _phase4_ranks(m, hashes, valid)
    if rk.shape[0] <= 2:
        return insert_saturation_sequential(m, counts, hashes, id_value,
                                            valid)
    data, counts = saturation_ranks(m.data, counts, rk, v, m.d_size,
                                    m.data_width, id_value, max_entangled,
                                    domain_size=m.size)
    return dataclasses.replace(m, data=data), counts


# ---------------------------------------------------------------------------
# MIBloomFilter::insert — the single-pass random-order path
# ---------------------------------------------------------------------------

def insert_random_order(m: MIBloomFilter, hashes_np: np.ndarray,
                        id_value: int, max_count: int,
                        strand: np.ndarray | None = None):
    """Host-side exact mirror of MIBloomFilter::insert
    (MIBloomFilter.hpp:312-438): per-frame random-order non-overwriting
    insertion with minstd_rand+std::shuffle slot ordering and saturation
    fallback. ``hashes_np`` is uint64 [n_frames, h]. Returns (mibf,
    per-frame success bool array).

    This path is sequential and data-dependent by construction (the
    reference uses it for incremental single-k-mer inserts); it runs on
    host against materialized arrays. All data widths including 8
    (uint64 T) are supported — width 8 reassembles/splits the dual
    uint32 planes around a uint64 host array.
    """
    if m.data_width == 8:
        planes = np.asarray(m.data)
        data = (planes[0].astype(np.uint64)
                | (planes[1].astype(np.uint64) << np.uint64(32)))
    else:
        data = np.asarray(m.data).copy()
    bv = np.asarray(m.bv_words)
    cum = np.asarray(m.cum_ranks)
    width = 8 * m.data_width
    s_mask = m.s_mask
    s_anti = m.s_anti_mask
    s_strand_bit = m.s_strand

    def rank_of(posv):
        word = posv >> 5
        before = int(bv[word]) & ((1 << (posv & 31)) - 1)
        return int(cum[word]) + bin(before).count("1")

    results = []
    strand_dir = bool(max_count % 2)
    for fi, row in enumerate(np.asarray(hashes_np, dtype=np.uint64)):
        count = 0
        hash_order = []
        saturated = True
        rand_value = id_value
        vals = []
        for i, hv in enumerate(row):
            posv = int(hv) % m.size
            rk = rank_of(posv)
            if strand is not None:
                value = (id_value | s_strand_bit) if (
                    strand_dir ^ bool(strand[fi][i])) else id_value
            else:
                value = id_value
            vals.append((rk, value))
            old = int(data[rk])
            oldv = old & s_anti if old > s_mask else old
            if old <= s_mask:
                saturated = False
            if oldv == value:
                count += 1
            else:
                hash_order.append(i)
            if count >= max_count:
                results.append(True)
                break
            rand_value ^= int(hv)
        else:
            g = stdcpp.MinstdRand(rand_value)
            hash_order = stdcpp.shuffle(hash_order, g)
            inserted = False
            for i in hash_order:
                rk, value = vals[i]
                old = int(data[rk])
                if old == 0:
                    data[rk] = value
                    old_after = 0
                else:
                    old_after = old
                if old_after > s_mask:
                    old_after &= s_anti
                else:
                    saturated = False
                if old_after == 0:
                    count += 1
                if count >= max_count:
                    results.append(True)
                    inserted = True
                    break
            if not inserted:
                if count == 0:
                    if not saturated:
                        assert max_count == 1, (
                            "spaced seed is probably not symmetric")
                        for hv in row:
                            rk = rank_of(int(hv) % m.size)
                            data[rk] |= s_mask
                    results.append(False)
                else:
                    results.append(True)
    if m.data_width == 8:
        out = np.stack([(data & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                        (data >> np.uint64(32)).astype(np.uint32)])
        m = dataclasses.replace(m, data=jnp.asarray(out))
    else:
        m = dataclasses.replace(m, data=jnp.asarray(data))
    return m, np.array(results, dtype=bool)


# ---------------------------------------------------------------------------
# MIBloomFilter::insert — device-side batch path (lax.scan, no host sync)
# ---------------------------------------------------------------------------

_MINSTD_MOD = 2147483647
_MINSTD_MULT = 48271


def _minstd_next_dev(x: jax.Array) -> jax.Array:
    """One std::minstd_rand step on a traced uint32 state (utils.stdcpp
    mirror, golden-verified against libstdc++)."""
    prod = u64.mul_const(U64(jnp.zeros_like(x), x), _MINSTD_MULT)
    return u64.mod_const(prod, _MINSTD_MOD).lo


def _uniform_int_dev(x: jax.Array, a: int, b: int):
    """libstdc++ uniform_int_distribution over a static range [a, b] with
    a traced engine state (rejection loop as lax.while_loop)."""
    urngrange = _MINSTD_MOD - 2
    uerange = b - a + 1
    scaling = urngrange // uerange
    past = jnp.uint32(uerange * scaling)

    def draw(x):
        x2 = _minstd_next_dev(x)
        return x2, x2 - jnp.uint32(1)

    x, ret = draw(x)
    x, ret = jax.lax.while_loop(lambda c: c[1] >= past,
                                lambda c: draw(c[0]), (x, ret))
    return x, (ret // jnp.uint32(scaling)).astype(jnp.int32) + a


def _gen_two_uniform_ints_dev(x: jax.Array, b0: int, b1: int):
    x, v = _uniform_int_dev(x, 0, b0 * b1 - 1)
    return x, v // b1, v % b1


def _shuffle_dev(x: jax.Array, vec: jax.Array, n: int):
    """std::shuffle of vec's first ``n`` (static) entries with a traced
    minstd state; mirrors utils.stdcpp.shuffle (bits/stl_algo.h's
    two-swaps-per-draw path, valid while urngrange/n >= n)."""
    if n <= 1:
        return x, vec
    assert (_MINSTD_MOD - 2) // n >= n

    def swap(v, i, j):
        vi, vj = v[i], v[j]
        return v.at[i].set(vj).at[j].set(vi)

    i = 1
    if n % 2 == 0:
        x, j = _uniform_int_dev(x, 0, 1)
        vec = swap(vec, 1, j)
        i = 2
    while i < n:
        sr = i + 1
        x, p0, p1 = _gen_two_uniform_ints_dev(x, sr, sr + 1)
        vec = swap(vec, i, p0)
        i += 1
        if i == n:
            break
        vec = swap(vec, i, p1)
        i += 1
    return x, vec


def insert_random_order_device(m: MIBloomFilter, hashes: U64, id_value: int,
                               max_count: int, strand=None, valid=None):
    """Device-resident MIBloomFilter::insert (MIBloomFilter.hpp:312-438):
    per-frame random-order non-overwriting insertion with the exact
    minstd_rand + std::shuffle slot ordering and saturation fallback, as a
    lax.scan over frames (bit-identical to the host mirror
    insert_random_order, which is itself golden-verified). Supports the
    strand-aware overload (MIBloomFilter.hpp:312-373) via ``strand``
    bool[..., h]. Returns (mibf, success bool[...]). Widths 1/2/4 only
    (width 8 uses the host mirror)."""
    if m.data_width == 8:
        raise NotImplementedError(
            "width-8 random-order insert: use the host mirror "
            "insert_random_order (dual-plane device scan not implemented)")
    h = hashes.hi.shape[-1]
    pos = mibf_mod.positions(m, hashes).reshape(-1, h)
    n = pos.shape[0]
    hi = hashes.hi.reshape(-1, h)
    lo = hashes.lo.reshape(-1, h)
    if strand is None:
        st = jnp.zeros((n, h), bool)
    else:
        st = jnp.asarray(strand).reshape(-1, h)
    if valid is None:
        v = jnp.ones((n,), bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid),
                             hashes.hi.shape[:-1]).reshape(-1)

    dtype = m.data.dtype
    smask = jnp.asarray(m.s_mask, dtype)
    anti = jnp.asarray(m.s_anti_mask, dtype)
    idv = jnp.asarray(id_value, dtype)
    sstrand = jnp.asarray(m.s_strand, dtype)
    strand_dir = bool(max_count % 2)
    use_strand = strand is not None
    bv_words = m.bv_words
    cum = m.cum_ranks

    branches = [partial(_shuffle_dev, n=nn)
                for nn in range(h + 1)]

    def step(data, inp):
        p, hi_r, lo_r, st_r, ok = inp
        word = (p >> 5).astype(jnp.int32)
        before = bv_words[word] & ((jnp.uint32(1) << (p & 31)) - 1)
        rk = (cum[word] + jax.lax.population_count(before)).astype(jnp.int32)
        if use_strand:
            vals = jnp.where(jnp.logical_xor(strand_dir, st_r),
                             idv | sstrand, idv)
        else:
            vals = jnp.broadcast_to(idv, (h,))

        # phase A: count already-set slots, collect disagreeing slots
        count = jnp.int32(0)
        saturated = jnp.asarray(True)
        done = ~ok
        in_order = jnp.zeros((h,), bool)
        r_hi = jnp.zeros((), jnp.uint32)
        r_lo = jnp.asarray(np.uint32(id_value & 0xFFFFFFFF))
        r_hi = r_hi + jnp.uint32((id_value >> 32) & 0xFFFFFFFF)
        for i in range(h):
            active = ~done
            old = data[rk[i]]
            oldv = jnp.where(old > smask, old & anti, old)
            saturated = saturated & jnp.where(active, old > smask, True)
            eq = oldv == vals[i]
            count = count + jnp.where(active & eq, 1, 0)
            in_order = in_order.at[i].set(active & ~eq)
            done = done | (count >= max_count)
            live = ~done
            r_hi = jnp.where(live, r_hi ^ hi_r[i], r_hi)
            r_lo = jnp.where(live, r_lo ^ lo_r[i], r_lo)
        early = done & ok

        # phase B: shuffle the disagreeing slots, insert in that order
        L = jnp.sum(in_order.astype(jnp.int32))
        order = jnp.argsort(~in_order, stable=True).astype(jnp.int32)
        seed = u64.mod_const(U64(r_hi, r_lo), _MINSTD_MOD).lo
        seed = jnp.where(seed == 0, jnp.uint32(1), seed)
        _, order = jax.lax.switch(L, branches, seed, order)

        for j in range(h):
            slot = order[j]
            alive = ok & (j < L) & ~done
            rkj = rk[slot]
            old = data[rkj]
            do_set = alive & (old == 0)
            data = data.at[rkj].set(jnp.where(do_set, vals[slot], old))
            saturated = saturated & jnp.where(alive, old > smask, True)
            count = count + jnp.where(alive & (old == 0), 1, 0)
            done = done | (count >= max_count)

        # saturation fallback (count == 0 and not saturated => saturate;
        # the reference asserts max == 1 on this path)
        need_sat = ok & (count == 0) & ~saturated
        satv = jnp.where(need_sat, data[rk] | smask, data[rk])
        data = data.at[rk].set(satv)
        success = ok & (count > 0)
        return data, success | early

    data, success = jax.lax.scan(
        step, m.data, (pos, hi, lo, st, v))
    return dataclasses.replace(m, data=data), \
        success.reshape(hashes.hi.shape[:-1])
