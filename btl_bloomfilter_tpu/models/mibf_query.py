"""MIBF read-classification engine (MIBFQuerySupport equivalent).

Replicates /root/reference/MIBFQuerySupport.hpp: streaming per-frame ID
statistics (7 counters per candidate ID), candidate promotion, the
extra-frame early exit, and the final stderr-equivalence ranking.

TPU-native split:
  * the heavy per-frame work (bit tests, rank gathers, ID gathers) is
    batched over all frames of a read at once;
  * the order-dependent bookkeeping (seen-set dedupe, candidate promotion,
    early exit — MIBFQuerySupport.hpp:430-518) runs as a ``lax.scan`` over
    frames, with the per-ID count table as carry — semantics identical to
    the sequential loop, including stopping (frames after the early exit
    contribute nothing);
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
    return query_scan(m, raw, hit, usable, misses, min_count,
                      num_ids, extra_frame_limit, frame_eval=ev,
                      st_mode=st_mode)


def query_device_batch(m: MIBloomFilter, hashes: U64, valid,
                       min_count: jax.Array, max_miss: int, num_ids: int,
                       extra_frame_limit: int, st_mode: bool = False):
    """Batched classification, hashes U64[R, W, h]: the rank/ID gathers
    run over all R*W*h positions in one kernel pass; the per-read scans
    are vmapped."""
    raw, hit, usable, misses = prep_frames(m, hashes, valid, max_miss)
    ev = None if st_mode else jnp.asarray(valid)
    return query_scan_batch(m, raw, hit, usable, misses, min_count,
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
    return query_scan_batch(m, raw, hit, usable, misses, min_count,
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
        out = fn(self.m, hashes, jnp.asarray(valid),
                 jnp.asarray(min_count_vec, jnp.int32))
        self.sat_count = int(out["sat_count"])
        self.eval_count = int(out["eval_count"])
        return summarize(np.asarray(out["counts"]),
                         np.asarray(out["candidates"]),
                         np.asarray(out["best"]), self.per_frame_prob,
                         self.min_count, self.extra_count,
                         self.best_hit_agree)

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
        out = fn(self.m, hashes, jnp.asarray(valid),
                 jnp.asarray(min_count_vec, jnp.int32))
        counts = np.asarray(out["counts"])
        cands = np.asarray(out["candidates"])
        bests = np.asarray(out["best"])
        self.sat_count = int(np.sum(np.asarray(out["sat_count"])))
        self.eval_count = int(np.sum(np.asarray(out["eval_count"])))
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
        out = fn(self.m, hashes1, jnp.asarray(valid1), hashes2,
                 jnp.asarray(valid2), jnp.asarray(min_count_vec, jnp.int32))
        counts = np.asarray(out["counts"])
        cands = np.asarray(out["candidates"])
        bests = np.asarray(out["best"])
        self.sat_count = int(np.sum(np.asarray(out["sat_count"])))
        self.eval_count = int(np.sum(np.asarray(out["eval_count"])))
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
