"""MIBF read-classification engine (MIBFQuerySupport equivalent).

Replicates /root/reference/MIBFQuerySupport.hpp: streaming per-frame ID
statistics (7 counters per candidate ID), candidate promotion, the
extra-frame early exit, and the final stderr-equivalence ranking.

TPU-native split:
  * the heavy per-frame work (bit tests, rank gathers, ID gathers) is
    batched over all frames of a read at once;
  * the order-dependent bookkeeping (seen-set dedupe, candidate promotion,
    early exit — MIBFQuerySupport.hpp:430-518) has TWO implementations:
    ``query_scan`` — a transparent ``lax.scan`` over frames with the
    dense per-ID count table as carry (the oracle; 384 ms/batch and
    linear in num_ids at the bench geometry) — and the dispatch-path
    ``query_frames_batch``, an exact two-pass decomposition (per-slot
    running counts from one in-read sort + segmented prefix scans; only
    the O(R)-scalar best/early-exit state stays sequential; ~31 ms and
    flat in num_ids). Bit-equality between them is asserted on
    adversarial tables in tests/test_mibf_query.py;
  * the final candidate ranking (summarizeCandiates,
    MIBFQuerySupport.hpp:555-596) runs host-side on the tiny count table.

The reference's ``readCount`` reset trick (MIBFQuerySupport.hpp:447-453)
avoids clearing the count table between reads; here the scan simply starts
from a zero table per read, which is equivalent.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.u64 import U64
from . import mibf as mibf_mod
from .mibf import MIBloomFilter

# count-table columns
_COUNT, _NONSAT, _TOTAL, _TOTALNONSAT, _NONSATFRAME, _SOLID = range(6)


@dataclasses.dataclass
class QueryResult:
    """Mirrors MIBFQuerySupport::QueryResult (MIBFQuerySupport.hpp:61-71)."""

    id: int
    count: int
    non_sat_count: int
    total_count: int
    total_non_sat_count: int
    non_sat_frame_count: int
    solid_count: int
    frame_prob: float


def _compare_std_err(a, b):
    """compareStdErr (MIBFQuerySupport.hpp:296-304): 'roughly equal' within
    sqrt standard errors. Device version in float32 (counts are small
    integers, exactly representable)."""
    af = a.astype(jnp.float32)
    bf = b.astype(jnp.float32)
    sa = jnp.sqrt(af)
    sb = jnp.sqrt(bf)
    return jnp.where(af > bf, (af - sa) <= (bf + sb), (bf - sb) <= (af + sa))


def _compare_std_err_host(a: float, b: float) -> bool:
    sa, sb = math.sqrt(a), math.sqrt(b)
    if a > b:
        return (a - sa) <= (b + sb)
    return (b - sb) <= (a + sa)


def query_scan(m: MIBloomFilter, frame_raw: jax.Array, frame_hit: jax.Array,
               frame_valid: jax.Array, frame_misses: jax.Array,
               min_count: jax.Array, num_ids: int, extra_frame_limit: int,
               frame_eval: jax.Array | None = None, st_mode: bool = False):
    """Run the sequential per-frame bookkeeping over one read's frames.

    frame_raw   uint32 [W, h]  data[rank] values (0 where not hit), with
                               saturation/strand bits — pre-gathered by
                               mibf.at_rank_data so the scan itself touches
                               no large array
    frame_hit   bool  [W, h]   bit-vector hits per slot
    frame_valid bool  [W]      frame enters the engine (iterator-yielded
                               AND within max_miss)
    frame_misses int32 [W]     misses per frame (0 for plain k-mer path)
    min_count   int32 [num_ids] per-ID promotion threshold
    frame_eval  bool [W]       frames adding +1 to evalCount: the nt path
                               bumps per ITERATOR-YIELDED frame even when
                               the frame misses (MIBFQuerySupport.hpp:415),
                               the st path has no per-frame bump (:397-406,
                               only per-hit bumps inside updatesCounts).
                               Default: frame_valid (nt) / none (st).
    st_mode     bool           spaced-seed path (selects the frame_eval
                               default).

    Returns dict of arrays: counts [num_ids, 6], candidate mask [num_ids],
    best counts [6], sat_count, eval_count.
    """
    h = frame_raw.shape[-1]
    dtype = jnp.int32
    smask = jnp.asarray(m.s_mask, jnp.uint32)
    anti = jnp.asarray(m.s_anti_mask, jnp.uint32)
    if frame_eval is None:
        frame_eval = jnp.zeros_like(frame_valid) if st_mode \
            else frame_valid

    def step(carry, inp):
        counts, cand, best, second_best, extra_frame, stopped, satc, evalc = carry
        raw, hit, valid, misses, ev = inp

        active = valid & ~stopped

        sat = raw > smask
        stripped = jnp.where(sat, raw & anti, raw).astype(dtype)

        # seen-set: first occurrence of each RAW value among hit slots
        iota = jnp.arange(h)
        earlier = iota[None, :] < iota[:, None]          # [i, j]: j < i
        same_raw_earlier = (raw[None, :] == raw[:, None]) & earlier & \
            hit[None, :]
        first_raw = hit & ~jnp.any(same_raw_earlier, axis=1)

        def upd(mask_):
            return jnp.zeros((num_ids,), dtype).at[
                jnp.where(mask_, stripped, num_ids)].add(1, mode="drop")

        inc_total = upd(hit & active)
        inc_totalnonsat = upd(hit & active & ~sat)

        # count/nonSatCount increments (MIBFQuerySupport.hpp:457-471): a
        # saturated first-seen raw bumps count only if its *stripped* value
        # was not already pushed to the seen-set by an earlier slot
        stripped_u32 = stripped.astype(jnp.uint32)
        earlier_pushed_eq_stripped = jnp.any(
            first_raw[None, :] & (raw[None, :] == stripped_u32[:, None]) &
            earlier, axis=1)
        inc_count_sat = first_raw & sat & ~earlier_pushed_eq_stripped
        inc_count_nonsat = first_raw & ~sat
        inc_count = upd((inc_count_sat | inc_count_nonsat) & active)
        inc_nonsat = upd(inc_count_nonsat & active)

        frame_has_sat = jnp.any(hit & sat)

        # nonSatFrame / solid bumps when no slot in the frame was saturated
        no_sat = ~frame_has_sat
        inc_nsf = upd(first_raw & active & no_sat)
        inc_solid = upd(first_raw & active & no_sat & (misses == 0))

        delta = jnp.stack([inc_count, inc_nonsat, inc_total, inc_totalnonsat,
                           inc_nsf, inc_solid], axis=1)
        counts = counts + jnp.where(active, delta, 0)

        # candidate promotion (MIBFQuerySupport.hpp:485-508), processed
        # sequentially over the frame's seen-set entries exactly like the
        # reference (a promotion affects later entries via candidate
        # existence and running best counts). For a saturated raw whose
        # stripped version also appears in the seen-set, the entry is
        # skipped (:487-492).
        stripped_also_seen = jnp.any(
            first_raw[None, :] & (raw[None, :] == stripped_u32[:, None]) &
            (iota[None, :] != iota[:, None]) & sat[:, None] &
            ~sat[None, :], axis=1)
        consider = first_raw & active & ~(sat & stripped_also_seen)
        for i in range(h):
            cid = jnp.clip(stripped[i], 0, num_ids - 1)
            c = counts[cid]
            has_cand = jnp.any(cand)
            ok = consider[i] & (
                (c[_COUNT] >= min_count[cid]) |
                (has_cand & (c[_COUNT] >= best[_COUNT])))
            cand = cand.at[cid].set(cand[cid] | ok)
            # updateMaxCounts (MIBFQuerySupport.hpp:520-542)
            nsf = c[_NONSATFRAME]
            best_nsf = best[_NONSATFRAME]
            best = best.at[_NONSATFRAME].set(
                jnp.where(ok & (nsf > best_nsf), nsf, best_nsf))
            second_best = jnp.where(
                ok & ~(nsf > best_nsf) & (nsf > second_best), nsf,
                second_best)
            for col in (_COUNT, _NONSAT, _SOLID, _TOTAL, _TOTALNONSAT):
                best = best.at[col].set(
                    jnp.where(ok & (c[col] > best[col]), c[col], best[col]))

        satc = satc + jnp.where(active & frame_has_sat, 1, 0)
        evalc = (evalc + jnp.where(ev & ~stopped, 1, 0)
                 + jnp.where(active, jnp.sum(hit.astype(dtype)), 0))

        # early-exit bookkeeping (MIBFQuerySupport.hpp:509-517); note the
        # reference compares totalNonSatCount against
        # secondBestNonSatFrameCount — mirrored as-is
        reset = _compare_std_err(best[_TOTALNONSAT], second_best)
        extra_frame = jnp.where(active & reset, 0, extra_frame)
        leading = best[_NONSATFRAME] > second_best
        hit_limit = leading & (extra_frame_limit < extra_frame)
        extra_frame = extra_frame + jnp.where(active & leading, 1, 0)
        stopped = stopped | (active & hit_limit)

        return (counts, cand, best, second_best, extra_frame, stopped,
                satc, evalc), None

    init = (jnp.zeros((num_ids, 6), dtype), jnp.zeros(num_ids, bool),
            jnp.zeros(6, dtype), jnp.int32(0), jnp.int32(0),
            jnp.asarray(False), jnp.int32(0), jnp.int32(0))
    (counts, cand, best, second_best, _extra, _stopped, satc, evalc), _ = \
        jax.lax.scan(step, init, (frame_raw, frame_hit, frame_valid,
                                  frame_misses, frame_eval))
    return {"counts": counts, "candidates": cand, "best": best,
            "sat_count": satc, "eval_count": evalc}


def prep_frames(m: MIBloomFilter, hashes: U64, valid, max_miss: int):
    """hashes U64[..., h] -> (raw, hit, usable, misses): the per-frame
    bit-test + rank + ID gathers plus the iterator-validity mask. Pure;
    meant to be jitted together with the scan so the whole classification
    runs in one dispatch (all three gathers ride the Mosaic windowed
    gather kernel on TPU via mibf.at_rank_data)."""
    _, hit, raw = mibf_mod.at_rank_data(m, hashes)
    misses = jnp.sum((~hit).astype(jnp.int32), axis=-1)
    usable = jnp.asarray(valid) & (misses <= max_miss)
    return raw, hit, usable, misses


def query_device(m: MIBloomFilter, hashes: U64, valid, min_count: jax.Array,
                 max_miss: int, num_ids: int, extra_frame_limit: int,
                 st_mode: bool = False):
    """Single-read classification, hashes U64[W, h] -> count tables.
    One jittable graph: rank/ID gathers + the sequential frame scan."""
    raw, hit, usable, misses = prep_frames(m, hashes, valid, max_miss)
    ev = None if st_mode else jnp.asarray(valid)
    out = query_frames_batch(
        m, raw[None], hit[None], usable[None], misses[None], min_count,
        num_ids, extra_frame_limit,
        frame_eval=None if ev is None else ev[None], st_mode=st_mode)
    return {k: v[0] for k, v in out.items()}


def query_device_batch(m: MIBloomFilter, hashes: U64, valid,
                       min_count: jax.Array, max_miss: int, num_ids: int,
                       extra_frame_limit: int, st_mode: bool = False):
    """Batched classification, hashes U64[R, W, h]: the rank/ID gathers
    run over all R*W*h positions in one kernel pass; the per-read scans
    are vmapped."""
    raw, hit, usable, misses = prep_frames(m, hashes, valid, max_miss)
    ev = None if st_mode else jnp.asarray(valid)
    return query_frames_batch(m, raw, hit, usable, misses, min_count,
                              num_ids, extra_frame_limit, frame_eval=ev,
                              st_mode=st_mode)


def interleave_paired_frames(fr1, fr2, valid1, valid2):
    """Device-side paired-end frame interleave (MIBFQuerySupport.hpp:111-130).

    The reference alternates iterators while both have frames and drains
    the survivor afterwards. Closed form over valid-frame ordinals: with
    n1/n2 valid frames and m = min(n1, n2), interleave slot k takes read 1
    iff (k < 2m and k even) or (k >= 2m and n1 >= n2), at within-read
    valid-ordinal k//2 (both alive) or k - m (drain). Everything is
    computed with sorts/gathers inside jit — no host sync.

    fr1/fr2 are tuples (raw, hit, usable, misses) shaped [R, W, h] /
    [R, W]; valid marks iterator-yielded frames. Returns interleaved
    (raw, hit, usable, misses, live) with W1+W2 slots per read pair
    (dead slots masked invalid); ``live`` marks slots carrying a yielded
    frame — the per-frame evalCount bumps of the nt path."""
    raw1, hit1, u1, mi1 = fr1
    raw2, hit2, u2, mi2 = fr2
    v1 = jnp.asarray(valid1)
    v2 = jnp.asarray(valid2)
    R, W1 = v1.shape
    W2 = v2.shape[1]
    K = W1 + W2
    n1 = jnp.sum(v1, axis=1).astype(jnp.int32)          # [R]
    n2 = jnp.sum(v2, axis=1).astype(jnp.int32)
    mmin = jnp.minimum(n1, n2)[:, None]                  # [R, 1]
    k = jnp.arange(K, dtype=jnp.int32)[None, :]          # [1, K]
    both = k < 2 * mmin
    from1 = jnp.where(both, k % 2 == 0, (n1 >= n2)[:, None])
    ordinal = jnp.where(both, k // 2, k - mmin)
    live = k < (n1 + n2)[:, None]

    # j-th valid frame's index: stable argsort puts valid indices first
    ord1 = jnp.argsort(~v1, axis=1, stable=True)         # [R, W1]
    ord2 = jnp.argsort(~v2, axis=1, stable=True)
    i1 = jnp.take_along_axis(ord1, jnp.clip(ordinal, 0, W1 - 1), axis=1)
    i2 = jnp.take_along_axis(ord2, jnp.clip(ordinal, 0, W2 - 1), axis=1)

    def pick(a1, a2):
        x1 = jnp.take_along_axis(a1, i1, axis=1)
        x2 = jnp.take_along_axis(a2, i2, axis=1)
        return jnp.where(from1, x1, x2)

    def pick3(a1, a2):
        x1 = jnp.take_along_axis(a1, i1[..., None], axis=1)
        x2 = jnp.take_along_axis(a2, i2[..., None], axis=1)
        return jnp.where(from1[..., None], x1, x2)

    raw = pick3(raw1, raw2)
    hit = pick3(hit1, hit2)
    usable = pick(u1, u2) & live
    misses = jnp.where(live, pick(mi1, mi2), jnp.int32(0))
    return raw, hit, usable, misses, live


def query_paired_device_batch(m: MIBloomFilter, hashes1: U64, valid1,
                              hashes2: U64, valid2, min_count: jax.Array,
                              max_miss: int, num_ids: int,
                              extra_frame_limit: int, st_mode: bool = False):
    """Batched paired-end classification, hashes U64[R, W, h] per end:
    rank/ID gathers for both ends ride one fused dispatch, the interleave
    is computed on device, and the per-pair scans are vmapped."""
    fr1 = prep_frames(m, hashes1, valid1, max_miss)
    fr2 = prep_frames(m, hashes2, valid2, max_miss)
    raw, hit, usable, misses, live = interleave_paired_frames(
        fr1, fr2, valid1, valid2)
    ev = None if st_mode else live
    return query_frames_batch(m, raw, hit, usable, misses, min_count,
                              num_ids, extra_frame_limit, frame_eval=ev,
                              st_mode=st_mode)


def query_scan_batch(m: MIBloomFilter, frame_raw: jax.Array,
                     frame_hit: jax.Array, frame_valid: jax.Array,
                     frame_misses: jax.Array, min_count: jax.Array,
                     num_ids: int, extra_frame_limit: int,
                     frame_eval: jax.Array | None = None,
                     st_mode: bool = False):
    """vmap of :func:`query_scan` over a batch of reads (leading R axis on
    the frame arrays). One dispatch classifies R reads; count tables are
    [R, num_ids, 6]. Semantics per read are identical to the sequential
    engine (the scan carry is per-read)."""
    if frame_eval is None:
        frame_eval = jnp.zeros_like(frame_valid) if st_mode \
            else frame_valid
    # frame_eval rides as a kwarg: vmap maps keyword args over axis 0
    return jax.vmap(
        functools.partial(query_scan, num_ids=num_ids,
                          extra_frame_limit=extra_frame_limit,
                          st_mode=st_mode),
        in_axes=(None, 0, 0, 0, 0, None))(
        m, frame_raw, frame_hit, frame_valid, frame_misses, min_count,
        frame_eval=frame_eval)


# ---------------------------------------------------------------------------
# two-pass vectorized engine (fast path; exact twin of query_scan)
# ---------------------------------------------------------------------------

def _bscan(op, x, fill, reverse=False):
    """Batched inclusive Hillis-Steele scan along the LAST axis."""
    n = x.shape[-1]
    d = 1
    while d < n:
        pad_shape = x.shape[:-1] + (d,)
        pad = jnp.full(pad_shape, fill, x.dtype)
        if reverse:
            shifted = jnp.concatenate([x[..., d:], pad], axis=-1)
        else:
            shifted = jnp.concatenate([pad, x[..., :-d]], axis=-1)
        x = op(x, shifted)
        d *= 2
    return x


def query_frames_batch(m: MIBloomFilter, frame_raw: jax.Array,
                       frame_hit: jax.Array, frame_valid: jax.Array,
                       frame_misses: jax.Array, min_count: jax.Array,
                       num_ids: int, extra_frame_limit: int,
                       frame_eval: jax.Array | None = None,
                       st_mode: bool = False, chunk: int = 16,
                       _measure: str | None = None):
    """Exact twin of :func:`query_scan_batch` without the per-frame dense
    count-table carry (VERDICT r4 next #1/#5: the W-step scan over a
    [R, num_ids, 6] carry measured 388 of the 600 ms classify step and
    scales linearly in num_ids).

    Three phases, per read (batched over R):

      A. per-slot flags (seen-set firsts, saturation quirks) — pure
         [R, W, h] vector ops, identical formulas to query_scan;
      B. per-slot RUNNING count values: slots sort by (clipped id, slot)
         within each read (one batched 2-operand sort over W*h = a few
         thousand elements, NOT a scan over frames), contributions
         prefix-sum inside id segments (batched log-depth scans), and
         each slot picks the prefix at its own frame's last same-id slot
         — the exact value the sequential engine would read from
         counts[id] after its frame's update. Out-of-range ids alias the
         clipped id's counts with zero contribution, matching the
         reference engine's clip-guarded read;
      C. the genuinely sequential state — bestCounts, second-best,
         extra-frame early exit, candidate existence — is a scan with an
         O(R) carry (no count table), ``chunk`` frames unrolled per
         step. Promotion events and per-frame active flags come back as
         outputs.

    The dense counts/candidates tables are rebuilt afterwards from the
    sorted domain (early-exited reads take the prefix at their stop
    frame — eligible slots are a PREFIX of each id segment because
    segments are frame-ordered). Returns the same dict as
    query_scan_batch.
    """
    R, W, h = frame_raw.shape
    dtype = jnp.int32
    fbits = max(1, (W * h - 1).bit_length())
    if (num_ids << fbits) > (1 << 32) or W >= (1 << 16):
        # sort keys / packed count payloads would overflow uint32
        return query_scan_batch(m, frame_raw, frame_hit, frame_valid,
                                frame_misses, min_count, num_ids,
                                extra_frame_limit, frame_eval=frame_eval,
                                st_mode=st_mode)
    if frame_eval is None:
        frame_eval = jnp.zeros_like(frame_valid) if st_mode \
            else frame_valid
    smask = jnp.asarray(m.s_mask, jnp.uint32)
    anti = jnp.asarray(m.s_anti_mask, jnp.uint32)
    raw, hit = frame_raw, frame_hit
    valid = frame_valid
    misses = frame_misses

    # --- pass A: per-slot flags (same formulas as query_scan.step) -------
    sat = raw > smask
    stripped = jnp.where(sat, raw & anti, raw).astype(dtype)
    iota = jnp.arange(h)
    earlier = iota[None, :] < iota[:, None]               # [i, j]: j < i
    same_raw_earlier = (raw[..., None, :] == raw[..., :, None]) & \
        earlier & hit[..., None, :]
    first_raw = hit & ~jnp.any(same_raw_earlier, axis=-1)
    stripped_u32 = stripped.astype(jnp.uint32)
    earlier_pushed_eq_stripped = jnp.any(
        first_raw[..., None, :] &
        (raw[..., None, :] == stripped_u32[..., :, None]) & earlier,
        axis=-1)
    inc_count_sat = first_raw & sat & ~earlier_pushed_eq_stripped
    inc_count_nonsat = first_raw & ~sat
    frame_has_sat = jnp.any(hit & sat, axis=-1)           # [R, W]
    no_sat = ~frame_has_sat[..., None]
    v3 = valid[..., None]
    contrib = jnp.stack([
        (inc_count_sat | inc_count_nonsat) & v3,          # _COUNT
        inc_count_nonsat & v3,                            # _NONSAT
        hit & v3,                                         # _TOTAL
        hit & ~sat & v3,                                  # _TOTALNONSAT
        first_raw & v3 & no_sat,                          # _NONSATFRAME
        first_raw & v3 & no_sat & (misses[..., None] == 0),  # _SOLID
    ], axis=-1).astype(jnp.uint32)                        # [R, W, h, 6]
    stripped_also_seen = jnp.any(
        first_raw[..., None, :] &
        (raw[..., None, :] == stripped_u32[..., :, None]) &
        (iota[None, :] != iota[:, None]) & sat[..., :, None] &
        ~sat[..., None, :], axis=-1)
    consider_pre = first_raw & v3 & ~(sat & stripped_also_seen)

    # out-of-range ids contribute nothing (the reference upd() drop) but
    # alias the CLIPPED id's running counts in the promotion read
    in_range = (stripped >= 0) & (stripped < num_ids)
    cid_promo = jnp.clip(stripped, 0, num_ids - 1)
    contrib = jnp.where(in_range[..., None], contrib, 0)

    # --- pass B: per-slot running counts via one in-read sort ------------
    n = W * h
    f_idx = jnp.arange(n, dtype=jnp.uint32)               # t*h + i
    key = ((cid_promo.reshape(R, n).astype(jnp.uint32) << fbits) | f_idx)
    pack6 = jnp.zeros((R, W, h), jnp.uint32)
    for c in range(6):
        pack6 = pack6 | (contrib[..., c] << jnp.uint32(c))
    key_s, pk_s = jax.lax.sort((key, pack6.reshape(R, n)), num_keys=1,
                               is_stable=False, dimension=-1)
    cid_s = (key_s >> fbits).astype(dtype)
    f_s = (key_s & jnp.uint32((1 << fbits) - 1)).astype(dtype)
    t_s = f_s // h
    seg_start = jnp.ones((R, n), bool).at[:, 1:].set(
        cid_s[:, 1:] != cid_s[:, :-1])

    pref = []
    for c in range(6):
        vc = ((pk_s >> jnp.uint32(c)) & 1).astype(dtype)
        cs = _bscan(jnp.add, vc, 0)
        # segment-local inclusive prefix: subtract the exclusive prefix
        # at the segment start, propagated forward (the read-wide cumsum
        # is monotone, so a running max carries it — no gather)
        base = _bscan(jnp.maximum, jnp.where(seg_start, cs - vc, 0), 0)
        pref.append(cs - base)
    pref = jnp.stack(pref, axis=-1)                       # [R, n, 6]

    # frame-end prefix: last slot of this (id, frame) run is at most h-1
    # ahead inside the segment
    fe = pref
    for d in range(1, h):
        same = jnp.zeros((R, n), bool).at[:, :-d].set(
            (cid_s[:, d:] == cid_s[:, :-d]) & (t_s[:, d:] == t_s[:, :-d]))
        nxt = jnp.concatenate(
            [pref[:, d:], jnp.zeros((R, d, 6), dtype)], axis=1)
        fe = jnp.where(same[..., None], jnp.maximum(fe, nxt), fe)

    # un-sort the 6 frame-end values back to slot order (counts < 2**16:
    # two values pack per u32 payload)
    p0 = (fe[..., 0].astype(jnp.uint32)
          | (fe[..., 1].astype(jnp.uint32) << 16))
    p1 = (fe[..., 2].astype(jnp.uint32)
          | (fe[..., 3].astype(jnp.uint32) << 16))
    p2 = (fe[..., 4].astype(jnp.uint32)
          | (fe[..., 5].astype(jnp.uint32) << 16))
    # the min_count threshold per slot also rides the un-sort: gathering
    # min_count[cid] with the SORTED ids is cache-local (runs of equal
    # indices), unlike the same gather in slot order
    mc_s = min_count[cid_s].astype(jnp.uint32)
    _, q0, q1, q2, q3 = jax.lax.sort(
        (f_s.astype(jnp.uint32), p0, p1, p2, mc_s),
        num_keys=1, is_stable=False, dimension=-1)
    mask16 = jnp.uint32(0xFFFF)

    def unpk(q, sh):
        return ((q >> jnp.uint32(sh)) & mask16).astype(dtype)

    c6 = jnp.stack([unpk(q0, 0), unpk(q0, 16), unpk(q1, 0), unpk(q1, 16),
                    unpk(q2, 0), unpk(q2, 16)],
                   axis=-1).reshape(R, W, h, 6)
    mc_slot = q3.astype(dtype).reshape(R, W, h)
    if _measure == "ab":                     # bench-only stage boundary
        return {"c6": c6, "pref": pref}

    # --- pass C: sequential small-carry scan over frame chunks -----------
    pad_w = -W % chunk
    def padf(x, fill=0):
        if pad_w == 0:
            return x
        return jnp.concatenate(
            [x, jnp.full((R, pad_w) + x.shape[2:], fill, x.dtype)],
            axis=1)

    if _measure == "mc":                     # bench-only stage boundary
        return {"mc_slot": mc_slot}
    hitsum = jnp.sum(hit.astype(dtype), axis=-1)          # [R, W]
    nchunks = (W + pad_w) // chunk

    def resh(x):
        return padf(x).reshape(R, nchunks, chunk, *x.shape[2:]) \
            .swapaxes(0, 1)

    xs = (resh(c6), resh(consider_pre), resh(mc_slot),
          resh(valid), resh(frame_has_sat), resh(frame_eval),
          resh(hitsum))

    efl = jnp.int32(extra_frame_limit)

    def cstep(carry, inp):
        best, second, extra, stopped, has_cand, satc, evalc = carry
        c6c, conc, mcc, vc, fhs, evc, hsc = inp
        oks = []
        actives = []
        for j in range(chunk):
            active = vc[:, j] & ~stopped
            actives.append(active)
            for i in range(h):
                c = c6c[:, j, i, :]                       # [R, 6]
                ok = conc[:, j, i] & active & (
                    (c[:, _COUNT] >= mcc[:, j, i]) |
                    (has_cand & (c[:, _COUNT] >= best[:, _COUNT])))
                has_cand = has_cand | ok
                oks.append(ok)
                # every best column update is "max if promoted" (the
                # explicit compares of updateMaxCounts reduce to max);
                # second-best reads the PRE-update best NSF
                nsf = c[:, _NONSATFRAME]
                bn = best[:, _NONSATFRAME]
                second = jnp.where(ok & ~(nsf > bn) & (nsf > second),
                                   nsf, second)
                best = jnp.where(ok[:, None], jnp.maximum(best, c), best)
            satc = satc + jnp.where(active & fhs[:, j], 1, 0)
            evalc = (evalc + jnp.where(evc[:, j] & ~stopped, 1, 0)
                     + jnp.where(active, hsc[:, j], 0))
            reset = _compare_std_err(best[:, _TOTALNONSAT], second)
            extra = jnp.where(active & reset, 0, extra)
            leading = best[:, _NONSATFRAME] > second
            hit_limit = leading & (efl < extra)
            extra = extra + jnp.where(active & leading, 1, 0)
            stopped = stopped | (active & hit_limit)
        return (best, second, extra, stopped, has_cand, satc, evalc), \
            (jnp.stack(oks, axis=1), jnp.stack(actives, axis=1))

    init = (jnp.zeros((R, 6), dtype), jnp.zeros((R,), dtype),
            jnp.zeros((R,), dtype), jnp.zeros((R,), bool),
            jnp.zeros((R,), bool), jnp.zeros((R,), dtype),
            jnp.zeros((R,), dtype))
    (best, second, extra, stopped, has_cand, satc, evalc), \
        (oks, actives) = jax.lax.scan(cstep, init, xs)
    # oks: [nchunks, R, chunk*h]; actives: [nchunks, R, chunk]
    ok_slots = oks.swapaxes(0, 1).reshape(R, nchunks * chunk, h)[:, :W]
    active_frames = actives.swapaxes(0, 1).reshape(
        R, nchunks * chunk)[:, :W]
    if _measure == "c":                      # bench-only stage boundary
        return {"best": best, "ok": ok_slots, "af": active_frames}

    # --- dense tables (counts at the stop frame; candidate mask) ---------
    # eligible slots are a prefix of each id segment (frame-ordered), so
    # the segment total under early exit is the prefix at the last
    # eligible slot
    stop_frame = jnp.where(
        jnp.any(active_frames, axis=-1),
        (W - 1) - jnp.argmax(active_frames[:, ::-1], axis=-1),
        -1)                                               # [R]
    elig = t_s <= stop_frame[:, None]                     # sorted domain
    # respect per-frame validity: contributions of invalid frames are
    # zero already; frames after stop are excluded by elig
    seg_end = jnp.ones((R, n), bool).at[:, :-1].set(
        cid_s[:, :-1] != cid_s[:, 1:])
    last_elig = jnp.zeros((R, n), bool)
    # a slot is the segment's last eligible iff eligible and (next slot
    # is a different segment or ineligible)
    nxt_diff = seg_end
    nxt_inelig = jnp.zeros((R, n), bool).at[:, :-1].set(~elig[:, 1:])
    last_elig = elig & (nxt_diff | nxt_inelig)
    # scatter-update count is the cost (TPU scatters are ~100 ns/update
    # latency-bound regardless of sortedness — a full-width formulation
    # measured ~200 ms at num_ids=16384): COMPACT the one-entry-per-
    # segment updates to the front of each read with one more batched
    # sort, then scatter only min(num_ids, W*h) columns (a read cannot
    # touch more distinct ids than that)
    kmax = min(num_ids, n)
    ckey = jnp.where(last_elig, cid_s.astype(jnp.uint32),
                     jnp.uint32(0xFFFFFFFF))
    pr0 = (pref[..., 0].astype(jnp.uint32)
           | (pref[..., 1].astype(jnp.uint32) << 16))
    pr1 = (pref[..., 2].astype(jnp.uint32)
           | (pref[..., 3].astype(jnp.uint32) << 16))
    pr2 = (pref[..., 4].astype(jnp.uint32)
           | (pref[..., 5].astype(jnp.uint32) << 16))
    ck_s, cr0, cr1, cr2 = jax.lax.sort((ckey, pr0, pr1, pr2),
                                       num_keys=1, is_stable=False,
                                       dimension=-1)
    ck_s = ck_s[:, :kmax]
    vals = jnp.stack([unpk(cr0[:, :kmax], 0), unpk(cr0[:, :kmax], 16),
                      unpk(cr1[:, :kmax], 0), unpk(cr1[:, :kmax], 16),
                      unpk(cr2[:, :kmax], 0), unpk(cr2[:, :kmax], 16)],
                     axis=-1)
    ridk = jnp.broadcast_to(jnp.arange(R, dtype=dtype)[:, None],
                            (R, kmax))
    real = ck_s != jnp.uint32(0xFFFFFFFF)
    flat_ids = jnp.where(real, ridk * num_ids + ck_s.astype(dtype),
                         jnp.int32(R * num_ids))
    counts = jnp.zeros((R * num_ids, 6), dtype).at[
        flat_ids.reshape(-1)].add(
        jnp.where(real[..., None], vals, 0).reshape(-1, 6),
        mode="drop").reshape(R, num_ids, 6)
    okkey = jnp.where(ok_slots, cid_promo.astype(jnp.uint32),
                      jnp.uint32(0xFFFFFFFF)).reshape(R, n)
    ok_all = jax.lax.sort((okkey,), is_stable=False, dimension=-1)[0]
    # dedupe BEFORE slicing: a cid promoted many times must not flood
    # the kmax window (distinct promoted cids <= num_ids by definition)
    is_first = jnp.ones((R, n), bool).at[:, 1:].set(
        ok_all[:, 1:] != ok_all[:, :-1])
    ok_dedup = jnp.where(is_first, ok_all, jnp.uint32(0xFFFFFFFF))
    ok_s = jax.lax.sort((ok_dedup,), is_stable=False,
                        dimension=-1)[0][:, :kmax]
    okreal = ok_s != jnp.uint32(0xFFFFFFFF)
    cand_ids = jnp.where(okreal, ridk * num_ids + ok_s.astype(dtype),
                         jnp.int32(R * num_ids))
    cand = jnp.zeros((R * num_ids,), bool).at[cand_ids.reshape(-1)].max(
        okreal.reshape(-1), mode="drop").reshape(R, num_ids)
    return {"counts": counts, "candidates": cand, "best": best,
            "sat_count": satc, "eval_count": evalc}


# ---------------------------------------------------------------------------
# host-side summarize (MIBFQuerySupport.hpp:555-596)
# ---------------------------------------------------------------------------

def _sort_key(r: QueryResult):
    return (-r.non_sat_frame_count, -r.count, -r.solid_count,
            -r.non_sat_count, -r.total_non_sat_count, -r.total_count,
            r.frame_prob)


def _is_valid(c: np.ndarray, best: np.ndarray) -> bool:
    """isValid: OR of six stderr comparisons (MIBFQuerySupport.hpp:333-342)."""
    pairs = [(_COUNT, _COUNT), (_TOTALNONSAT, _TOTALNONSAT),
             (_NONSATFRAME, _NONSATFRAME), (_SOLID, _SOLID),
             (_NONSAT, _NONSAT), (_TOTAL, _TOTAL)]
    return any(_compare_std_err_host(float(best[b]), float(c[a]))
               for a, b in pairs)


def _roughly_equal_or_larger(a: QueryResult, b: QueryResult,
                             extra_count: float) -> bool:
    """isRoughlyEqualOrLarger (MIBFQuerySupport.hpp:347-356)."""
    def cmp(x, y):
        sx = math.sqrt(x) * extra_count
        sy = math.sqrt(y) * extra_count
        return (x - sx) <= (y + sy)
    return (cmp(a.count, b.count) and
            cmp(a.total_non_sat_count, b.total_non_sat_count) and
            cmp(a.non_sat_frame_count, b.non_sat_frame_count) and
            cmp(a.solid_count, b.solid_count) and
            cmp(a.non_sat_count, b.non_sat_count) and
            cmp(a.total_count, b.total_count))


def _check_count_agreement(b: QueryResult, a: QueryResult) -> bool:
    """checkCountAgreement (MIBFQuerySupport.hpp:358-364)."""
    return (b.non_sat_frame_count >= a.non_sat_frame_count and
            b.count >= a.count and b.solid_count >= a.solid_count and
            b.non_sat_count >= a.non_sat_count and
            b.total_non_sat_count >= a.total_non_sat_count and
            b.total_count >= a.total_count)


def summarize(counts: np.ndarray, candidates: np.ndarray, best: np.ndarray,
              per_frame_prob: Sequence[float], min_count: int,
              extra_count: float, best_hit_agree: bool) -> List[QueryResult]:
    """Candidate ranking + equivalence cut + best-hit-agreement veto."""
    results: List[QueryResult] = []
    cand_ids = np.nonzero(candidates)[0]
    if cand_ids.size == 0 or min_count > best[_NONSATFRAME]:
        return results
    signif = []
    for cid in cand_ids:
        c = counts[cid]
        if _is_valid(c, best):
            signif.append(QueryResult(
                id=int(cid), count=int(c[_COUNT]),
                non_sat_count=int(c[_NONSAT]), total_count=int(c[_TOTAL]),
                total_non_sat_count=int(c[_TOTALNONSAT]),
                non_sat_frame_count=int(c[_NONSATFRAME]),
                solid_count=int(c[_SOLID]),
                frame_prob=float(per_frame_prob[cid])))
    if len(signif) > 1:
        signif.sort(key=_sort_key)
        for cand in signif:
            if _roughly_equal_or_larger(signif[0], cand, extra_count):
                results.append(cand)
        if best_hit_agree and len(results) >= 2 and \
                not _check_count_agreement(results[0], results[1]):
            results = []
    elif signif:
        results.append(signif[0])
    return results


# ---------------------------------------------------------------------------
# high-level per-read query
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MIBFQuerySupport:
    """Per-thread query engine mirroring the reference ctor params
    (MIBFQuerySupport.hpp:33-59)."""

    m: MIBloomFilter
    per_frame_prob: Sequence[float]
    extra_count: float
    extra_frame_limit: int
    max_miss: int
    min_count: int
    best_hit_agree: bool
    sat_count: int = 0
    eval_count: int = 0

    _jit_cache: dict = dataclasses.field(default_factory=dict)

    def _run(self, frame_raw, frame_hit, frame_valid, frame_misses,
             min_count_vec):
        num_ids = len(self.per_frame_prob)
        key = (frame_raw.shape, num_ids)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                query_scan, num_ids=num_ids,
                extra_frame_limit=self.extra_frame_limit))
            self._jit_cache[key] = fn
        out = fn(self.m, frame_raw, frame_hit, frame_valid,
                 frame_misses, jnp.asarray(min_count_vec, jnp.int32))
        self.sat_count = int(out["sat_count"])
        self.eval_count = int(out["eval_count"])
        return summarize(np.asarray(out["counts"]),
                         np.asarray(out["candidates"]),
                         np.asarray(out["best"]), self.per_frame_prob,
                         self.min_count, self.extra_count,
                         self.best_hit_agree)

    def _prep(self, hashes: U64, valid):
        _, hit, raw = mibf_mod.at_rank_data(self.m, hashes)
        misses = jnp.sum((~hit).astype(jnp.int32), axis=-1)
        if self.max_miss == 0:
            usable = jnp.asarray(valid) & (misses == 0)
        else:
            usable = jnp.asarray(valid) & (misses <= self.max_miss)
        return raw, hit, usable, misses

    def query(self, hashes: U64, valid, min_count_vec) -> List[QueryResult]:
        """Single-read query (MIBFQuerySupport.hpp:94-109). hashes is
        U64[W, h]; valid marks iterator-yielded frames. The rank gathers
        and the frame scan run as one jitted dispatch."""
        num_ids = len(self.per_frame_prob)
        key = ("single", hashes.hi.shape, num_ids)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                query_device, max_miss=self.max_miss, num_ids=num_ids,
                extra_frame_limit=self.extra_frame_limit,
                st_mode=bool(self.m.sseeds)))
            self._jit_cache[key] = fn
        out = jax.device_get(fn(self.m, hashes, jnp.asarray(valid),
                                 jnp.asarray(min_count_vec, jnp.int32)))
        self.sat_count = int(out["sat_count"])
        self.eval_count = int(out["eval_count"])
        return summarize(out["counts"], out["candidates"], out["best"],
                         self.per_frame_prob, self.min_count,
                         self.extra_count, self.best_hit_agree)

    def query_many(self, hashes: U64, valid, min_count_vec
                   ) -> List[List[QueryResult]]:
        """Batched multi-read query: hashes U64[R, W, h], valid bool[R, W].
        One device dispatch hashes->ranks->engine for all R reads
        (per-read semantics identical to :meth:`query`); the candidate
        ranking runs host-side per read. Returns one result list per
        read."""
        num_ids = len(self.per_frame_prob)
        key = ("batch", hashes.hi.shape, num_ids)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                query_device_batch, max_miss=self.max_miss,
                num_ids=num_ids,
                extra_frame_limit=self.extra_frame_limit,
                st_mode=bool(self.m.sseeds)))
            self._jit_cache[key] = fn
        # ONE host transfer for the whole result dict: each np.asarray
        # is a separate ~ms round trip on the remote-TPU platform
        out = jax.device_get(fn(self.m, hashes, jnp.asarray(valid),
                                jnp.asarray(min_count_vec, jnp.int32)))
        counts = out["counts"]
        cands = out["candidates"]
        bests = out["best"]
        self.sat_count = int(np.sum(out["sat_count"]))
        self.eval_count = int(np.sum(out["eval_count"]))
        return [summarize(counts[r], cands[r], bests[r],
                          self.per_frame_prob, self.min_count,
                          self.extra_count, self.best_hit_agree)
                for r in range(hashes.hi.shape[0])]

    def query_paired(self, hashes1: U64, valid1, hashes2: U64, valid2,
                     min_count_vec) -> List[QueryResult]:
        """Paired-end query (MIBFQuerySupport.hpp:111-130): frames of the
        two reads interleaved, falling back to whichever read still has
        frames. The interleave runs on device (no per-pair host sync)."""
        return self.query_paired_many(
            U64(hashes1.hi[None], hashes1.lo[None]),
            jnp.asarray(valid1)[None],
            U64(hashes2.hi[None], hashes2.lo[None]),
            jnp.asarray(valid2)[None], min_count_vec)[0]

    def query_paired_many(self, hashes1: U64, valid1, hashes2: U64, valid2,
                          min_count_vec) -> List[List[QueryResult]]:
        """Batched paired-end query: hashes U64[R, W, h] per end. One
        device dispatch (gathers + device-side interleave + vmapped
        scans) classifies all R pairs; candidate ranking runs host-side
        per pair."""
        num_ids = len(self.per_frame_prob)
        key = ("paired", hashes1.hi.shape, hashes2.hi.shape, num_ids)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(
                query_paired_device_batch, max_miss=self.max_miss,
                num_ids=num_ids,
                extra_frame_limit=self.extra_frame_limit,
                st_mode=bool(self.m.sseeds)))
            self._jit_cache[key] = fn
        out = jax.device_get(fn(self.m, hashes1, jnp.asarray(valid1),
                                 hashes2, jnp.asarray(valid2),
                                 jnp.asarray(min_count_vec, jnp.int32)))
        counts = out["counts"]
        cands = out["candidates"]
        bests = out["best"]
        self.sat_count = int(np.sum(out["sat_count"]))
        self.eval_count = int(np.sum(out["eval_count"]))
        return [summarize(counts[r], cands[r], bests[r],
                          self.per_frame_prob, self.min_count,
                          self.extra_count, self.best_hit_agree)
                for r in range(hashes1.hi.shape[0])]

    def get_match_signature(self, hashes: U64, valid):
        """Batched getMatchSignature (MIBFQuerySupport.hpp:158-217): the
        per-frame debug signature. Returns (match_pos int array,
        evaluated_frames int, ids uint32[n_match, h], sat bool[n_match,
        h]) where match rows follow window order. A frame matches when
        its misses are within max_miss for spaced-seed filters
        (atRank(..., m_maxMiss)) or when every position hits for plain
        k-mer filters; per-slot entries are (value & s_antiMask,
        saturated) for hit slots and (0, False) for missed ones."""
        _, hit, raw = mibf_mod.at_rank_data(self.m, hashes)
        v = np.asarray(jnp.asarray(valid))
        misses = np.asarray(jnp.sum((~hit).astype(jnp.int32), axis=-1))
        if self.m.sseeds:
            match = v & (misses <= self.max_miss)
        else:
            match = v & (misses == 0)
        anti = np.uint32(self.m.s_anti_mask)
        smask = np.uint32(self.m.s_mask)
        raw_np = np.asarray(raw)
        hit_np = np.asarray(hit)
        ids = np.where(hit_np, raw_np & anti, 0).astype(np.uint32)
        sat = hit_np & (raw_np > smask)
        match_pos = np.nonzero(match)[0]
        evaluated = int(v.sum())
        return match_pos, evaluated, ids[match_pos], sat[match_pos]
