"""MIBF classification engine vs a sequential python mirror of
MIBFQuerySupport (/root/reference/MIBFQuerySupport.hpp)."""

import math

import numpy as np
import jax.numpy as jnp

from btl_bloomfilter_tpu.models import mibf, mibf_construct, mibf_query
from btl_bloomfilter_tpu.ops import u64


def rand_hashes(n, h, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, size=(n, h), dtype=np.uint64)


class PyQuery:
    """Line-by-line mirror of updatesCounts/updateMaxCounts/summarize."""

    def __init__(self, size, h, data, cum, per_frame_prob, extra_count,
                 extra_frame_limit, min_count, best_hit_agree, s_mask,
                 bits=None):
        self.size = size
        self.h = h
        self.data = data
        self.cum = cum
        self.pfp = per_frame_prob
        self.extra_count = extra_count
        self.efl = extra_frame_limit
        self.min_count_member = min_count
        self.bha = best_hit_agree
        self.s_mask = s_mask
        self.s_anti = s_mask - 1
        self.bits = bits               # bool[size]; None = every bit set
        self.eval_count = 0
        self.sat_frames = 0

    def rank(self, pos):
        return int(self.cum[pos])

    @staticmethod
    def cse(a, b):
        sa, sb = math.sqrt(a), math.sqrt(b)
        if a > b:
            return (a - sa) <= (b + sb)
        return (b - sb) <= (a + sa)

    def query(self, frames, min_count, max_miss=0, st_mode=False):
        """Sequential mirror of the query loop + updatesCounts, including
        the miss-tolerant path (MIBFQuerySupport.hpp:430-518: only HIT
        slots are read, solid bumps only at misses==0) and the two
        evalCount conventions (nt: +1 per yielded frame even on a miss,
        :415; st: per-hit bumps only, :397-406)."""
        numid = len(self.pfp)
        counts = [dict(count=0, nonSat=0, total=0, totalNonSat=0,
                       nsf=0, solid=0) for _ in range(numid)]
        cands = []
        best = dict(count=0, nonSat=0, total=0, totalNonSat=0, nsf=0, solid=0)
        second = 0
        extra = 0
        self.eval_count = 0
        self.sat_frames = 0
        for row in frames:
            if not st_mode:
                self.eval_count += 1
            pos = [int(hv) % self.size for hv in row]
            hits = [True if self.bits is None else bool(self.bits[p])
                    for p in pos]
            misses = sum(1 for x in hits if not x)
            if misses > max_miss:
                continue
            rk = [self.rank(p) for p, hv in zip(pos, hits) if hv]
            raws = [int(self.data[r]) for r in rk]
            self.eval_count += len(raws)
            seen = []
            sat_count = 0
            for raw in raws:
                saturated = raw > self.s_mask
                result = raw & self.s_anti if saturated else raw
                if saturated:
                    sat_count += 1
                else:
                    counts[result]["totalNonSat"] += 1
                counts[result]["total"] += 1
                if raw not in seen:
                    if saturated:
                        if result not in seen:
                            counts[result]["count"] += 1
                    else:
                        counts[result]["nonSat"] += 1
                        counts[result]["count"] += 1
                    seen.append(raw)
            if sat_count == 0:
                for raw in seen:
                    counts[raw]["nsf"] += 1
                    if misses == 0:
                        counts[raw]["solid"] += 1
            else:
                self.sat_frames += 1
            for raw in seen:
                result = raw
                if result > self.s_mask:
                    if (result & self.s_anti) in seen:
                        continue
                    result &= self.s_anti
                c = counts[result]
                ok = False
                if c["count"] >= min_count[result]:
                    ok = True
                elif cands and c["count"] >= best["count"]:
                    ok = True
                if ok:
                    if result not in cands:
                        cands.append(result)
                    # updateMaxCounts
                    if c["nsf"] > best["nsf"]:
                        best["nsf"] = c["nsf"]
                    elif c["nsf"] > second:
                        second = c["nsf"]
                    for k1, k2 in [("count", "count"), ("nonSat", "nonSat"),
                                   ("solid", "solid"), ("total", "total"),
                                   ("totalNonSat", "totalNonSat")]:
                        if c[k1] > best[k2]:
                            best[k2] = c[k1]
            if self.cse(best["totalNonSat"], second):
                extra = 0
            if best["nsf"] > second:
                stop = self.efl < extra
                extra += 1
                if stop:
                    break
        return counts, cands, best


def build_filter(size=2048, h=4, seed=1, n=150):
    hashes = rand_hashes(n, h, seed)
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=11, hash_num=h, occupancy=0.5, sseeds=())
    st = mibf_construct.insert_bv(st, u64.from_numpy(hashes))
    m, counts = mibf_construct.get_empty_mibf(st)
    # assign IDs in three groups + saturate a few frames
    for idv, lo in [(1, 0), (2, 50), (3, 100)]:
        m, counts = mibf_construct.insert_mibf(
            m, counts, u64.from_numpy(hashes[lo: lo + 50]), idv)
    m = mibf.saturate(m, u64.from_numpy(hashes[45:55]))
    return m, hashes


def run_both(m, hashes, frames_idx, min_count_val=2, efl=10**6,
             best_hit_agree=False):
    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0, extra_frame_limit=efl,
        max_miss=0, min_count=1, best_hit_agree=best_hit_agree)
    frames = hashes[frames_idx]
    valid = np.ones(len(frames), bool)
    mc = np.full(num_ids, min_count_val, np.int32)
    res = qs.query(u64.from_numpy(frames), valid, mc)

    bits = np.unpackbits(np.asarray(m.bv_words).view(np.uint8),
                         bitorder="little")[: m.size]
    py = PyQuery(m.size, m.hash_num, np.asarray(m.data).astype(np.int64),
                 np.concatenate([[0], np.cumsum(bits)]),
                 pfp, 2.0, efl, 1, best_hit_agree, m.s_mask,
                 bits=bits.astype(bool))
    pycounts, pycands, pybest = py.query(frames, mc.tolist())
    assert qs.eval_count == py.eval_count
    assert qs.sat_count == py.sat_frames
    return res, pycounts, pycands, pybest, qs


def test_query_counts_match_model():
    m, hashes = build_filter()
    res, pycounts, pycands, pybest, qs = run_both(
        m, hashes, list(range(0, 150, 3)))
    # rebuild comparable structures from the framework's result list
    ids = {r.id: r for r in res}
    # model-side summarize
    from btl_bloomfilter_tpu.models.mibf_query import (
        QueryResult, summarize, _COUNT)
    counts_arr = np.zeros((5, 6), np.int32)
    for i, c in enumerate(pycounts):
        counts_arr[i] = [c["count"], c["nonSat"], c["total"],
                         c["totalNonSat"], c["nsf"], c["solid"]]
    cand_arr = np.zeros(5, bool)
    cand_arr[pycands] = True
    best_arr = np.array([pybest["count"], pybest["nonSat"], pybest["total"],
                         pybest["totalNonSat"], pybest["nsf"],
                         pybest["solid"]], np.int32)
    expect = summarize(counts_arr, cand_arr, best_arr,
                       [0.0] + [0.1] * 4, 1, 2.0, False)
    assert [r.id for r in res] == [r.id for r in expect]
    for a, b in zip(res, expect):
        assert dataclasses_equal(a, b)


def dataclasses_equal(a, b):
    return (a.id, a.count, a.non_sat_count, a.total_count,
            a.total_non_sat_count, a.non_sat_frame_count, a.solid_count) == \
           (b.id, b.count, b.non_sat_count, b.total_count,
            b.total_non_sat_count, b.non_sat_frame_count, b.solid_count)


def test_query_early_exit_matches_model():
    m, hashes = build_filter()
    # tiny extra frame limit forces the early exit path
    res, pycounts, pycands, pybest, qs = run_both(
        m, hashes, list(range(0, 50)), min_count_val=1, efl=3)
    from btl_bloomfilter_tpu.models.mibf_query import summarize
    counts_arr = np.zeros((5, 6), np.int32)
    for i, c in enumerate(pycounts):
        counts_arr[i] = [c["count"], c["nonSat"], c["total"],
                         c["totalNonSat"], c["nsf"], c["solid"]]
    cand_arr = np.zeros(5, bool)
    cand_arr[pycands] = True
    best_arr = np.array([pybest["count"], pybest["nonSat"], pybest["total"],
                         pybest["totalNonSat"], pybest["nsf"],
                         pybest["solid"]], np.int32)
    expect = summarize(counts_arr, cand_arr, best_arr, [0.0] + [0.1] * 4,
                       1, 2.0, False)
    assert [r.id for r in res] == [r.id for r in expect]


def test_query_identifies_correct_group():
    m, hashes = build_filter()
    # frames drawn purely from group 2's sequence should classify as id 2
    res, *_ = run_both(m, hashes, list(range(60, 95)), min_count_val=1)
    assert res and res[0].id == 2


def test_paired_query_runs():
    m, hashes = build_filter()
    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0,
        extra_frame_limit=10**6, max_miss=0, min_count=1,
        best_hit_agree=False)
    mc = np.full(num_ids, 1, np.int32)
    res = qs.query_paired(
        u64.from_numpy(hashes[100:120]), np.ones(20, bool),
        u64.from_numpy(hashes[120:150]), np.ones(30, bool), mc)
    assert res and res[0].id == 3


def test_query_many_matches_per_read():
    m, hashes = build_filter()
    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0, extra_frame_limit=10**6,
        max_miss=0, min_count=1, best_hit_agree=False)
    mc = np.full(num_ids, 1, np.int32)

    # three "reads" with different frame subsets + one all-invalid dummy
    reads = [list(range(0, 50)), list(range(60, 95)), list(range(100, 150))]
    W = 50
    R = len(reads) + 1
    hi = np.zeros((R, W), np.uint32)
    lo = np.zeros((R, W), np.uint32)
    valid = np.zeros((R, W), bool)
    h = m.hash_num
    frames_u64 = []
    for r, idxs in enumerate(reads):
        fr = hashes[idxs]
        valid[r, : len(idxs)] = True
        frames_u64.append(fr)
    maxw = W
    hi4 = np.zeros((R, maxw, h), np.uint32)
    lo4 = np.zeros((R, maxw, h), np.uint32)
    for r, fr in enumerate(frames_u64):
        u = u64.from_numpy(fr)
        hi4[r, : fr.shape[0]] = np.asarray(u.hi)
        lo4[r, : fr.shape[0]] = np.asarray(u.lo)
    batched = u64.U64(jnp.asarray(hi4), jnp.asarray(lo4))

    got = qs.query_many(batched, jnp.asarray(valid), mc)
    assert len(got) == R
    assert got[-1] == []  # dummy read classifies to nothing
    for r, idxs in enumerate(reads):
        one = qs.query(u64.from_numpy(hashes[idxs]),
                       np.ones(len(idxs), bool), mc)
        # per-read query uses W=len(idxs); batched pads with invalid frames
        assert [q.id for q in one] == [q.id for q in got[r]]
        for a, b in zip(one, got[r]):
            assert dataclasses_equal(a, b)


def _py_interleave(frames1, frames2):
    """Host mirror of the reference's paired iterator alternation
    (MIBFQuerySupport.hpp:120-125)."""
    out, i, j, fc = [], 0, 0, 0
    while i < len(frames1) or j < len(frames2):
        use1 = (fc % 2 == 0 and i < len(frames1)) or j >= len(frames2)
        if use1:
            out.append(frames1[i]); i += 1
        else:
            out.append(frames2[j]); j += 1
        fc += 1
    return out


def test_paired_query_matches_interleaved_mirror():
    m, hashes = build_filter()
    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0, extra_frame_limit=10**6,
        max_miss=0, min_count=1, best_hit_agree=False)
    mc = np.full(num_ids, 1, np.int32)

    # unequal frame counts + some invalid frames on both ends
    v1 = np.ones(20, bool); v1[[3, 7]] = False
    v2 = np.ones(31, bool); v2[[0, 10, 30]] = False
    res = qs.query_paired(u64.from_numpy(hashes[100:120]), v1,
                          u64.from_numpy(hashes[119:150]), v2, mc)

    # the equivalent single stream: interleave of the VALID frames only
    f1 = [hashes[100:120][i] for i in range(20) if v1[i]]
    f2 = [hashes[119:150][i] for i in range(31) if v2[i]]
    inter = np.stack(_py_interleave(f1, f2))
    res2 = qs.query(u64.from_numpy(inter), np.ones(len(inter), bool), mc)
    assert [ (r.id, r.count, r.non_sat_count, r.total_count)
             for r in res ] == [
           (r.id, r.count, r.non_sat_count, r.total_count) for r in res2]


def test_query_paired_many_matches_sequential_paired():
    m, hashes = build_filter()
    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0, extra_frame_limit=10**6,
        max_miss=0, min_count=1, best_hit_agree=False)
    mc = np.full(num_ids, 1, np.int32)
    rng = np.random.default_rng(5)

    R, W1, W2 = 3, 12, 15
    h1 = np.stack([hashes[rng.integers(0, 150, W1)] for _ in range(R)])
    h2 = np.stack([hashes[rng.integers(0, 150, W2)] for _ in range(R)])
    v1 = rng.random((R, W1)) < 0.8
    v2 = rng.random((R, W2)) < 0.8

    batched = qs.query_paired_many(u64.from_numpy(h1), v1,
                                   u64.from_numpy(h2), v2, mc)
    for r in range(R):
        single = qs.query_paired(u64.from_numpy(h1[r]), v1[r],
                                 u64.from_numpy(h2[r]), v2[r], mc)
        assert [(x.id, x.count, x.total_count) for x in batched[r]] == \
               [(x.id, x.count, x.total_count) for x in single]


def test_get_match_signature():
    m, hashes = build_filter()
    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0, extra_frame_limit=10**6,
        max_miss=0, min_count=1, best_hit_agree=False)
    sub = hashes[40:80]
    valid = np.ones(40, bool); valid[5] = False
    pos, evaluated, ids, sat = qs.get_match_signature(
        u64.from_numpy(sub), valid)
    assert evaluated == 39
    # numpy mirror: a frame matches iff every position's bit is set
    cum = np.asarray(m.cum_ranks)
    bv = np.asarray(m.bv_words)
    data = np.asarray(m.data)
    expect_pos = []
    for i in range(40):
        if not valid[i]:
            continue
        ok, vals, sats = True, [], []
        for hv in sub[i]:
            p = int(hv) % m.size
            w, b = p >> 5, p & 31
            hit = (bv[w] >> b) & 1
            if not hit:
                ok = False
                break
            r = int(cum[w]) + bin(bv[w] & ((1 << b) - 1)).count("1")
            raw = int(data[r])
            sats.append(raw > m.s_mask)
            vals.append(raw & m.s_anti_mask)
        if ok:
            expect_pos.append((i, vals, sats))
    assert list(pos) == [e[0] for e in expect_pos]
    for row, (_, vals, sats) in zip(range(len(expect_pos)), expect_pos):
        assert list(ids[row]) == vals
        assert list(sat[row]) == sats


def test_calc_frame_probs_strand_matches_mirror():
    m, _ = build_filter()
    num_ids = 5
    probs, sat_prop = mibf.calc_frame_probs_strand(m, num_ids, 0)
    counts, satc = mibf.get_id_counts_strand(m, num_ids)
    counts = np.asarray(counts)
    total = int(counts.sum())   # strand variant sums the WHOLE table
    occ = m.d_size / m.size
    assert sat_prop == (float(satc) / total if total else 0.0)
    for i in range(1, num_ids):
        assert probs[i] == mibf.calc_prob_single_frame(
            occ, m.hash_num, counts[i] / total, 0)


# ---------------------------------------------------------------------------
# miss-tolerant / spaced-seed / strand-carrying classification
# (VERDICT r4 next #4; MIBFQuerySupport.hpp:430-518 st path)
# ---------------------------------------------------------------------------

def _expect_from_mirror(pycounts, pycands, pybest, num_ids, pfp,
                        min_count=1, extra_count=2.0, best_hit_agree=False):
    from btl_bloomfilter_tpu.models.mibf_query import summarize
    counts_arr = np.zeros((num_ids, 6), np.int32)
    for i, c in enumerate(pycounts):
        counts_arr[i] = [c["count"], c["nonSat"], c["total"],
                         c["totalNonSat"], c["nsf"], c["solid"]]
    cand_arr = np.zeros(num_ids, bool)
    cand_arr[pycands] = True
    best_arr = np.array([pybest["count"], pybest["nonSat"], pybest["total"],
                         pybest["totalNonSat"], pybest["nsf"],
                         pybest["solid"]], np.int32)
    return summarize(counts_arr, cand_arr, best_arr, pfp, min_count,
                     extra_count, best_hit_agree)


def _mirror_for(m, pfp, efl=10**6):
    bits = np.unpackbits(np.asarray(m.bv_words).view(np.uint8),
                         bitorder="little")[: m.size]
    return PyQuery(m.size, m.hash_num, np.asarray(m.data).astype(np.int64),
                   np.concatenate([[0], np.cumsum(bits)]),
                   pfp, 2.0, efl, 1, False, m.s_mask,
                   bits=bits.astype(bool))


def test_query_with_misses_nt_eval_parity():
    """nt path: frames with MISSING positions are skipped but still bump
    evalCount by 1 (MIBFQuerySupport.hpp:415); counts unaffected."""
    m, hashes = build_filter()
    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0, extra_frame_limit=10**6,
        max_miss=0, min_count=1, best_hit_agree=False)
    mc = np.full(num_ids, 1, np.int32)
    # mix inserted frames with random (mostly missing) frames
    alien = rand_hashes(10, m.hash_num, seed=999)
    frames = np.concatenate([hashes[0:20], alien, hashes[60:80]])
    valid = np.ones(len(frames), bool)
    valid[3] = False                      # one not-yielded frame
    res = qs.query(u64.from_numpy(frames), valid, mc)

    py = _mirror_for(m, pfp)
    pycounts, pycands, pybest = py.query(
        [f for f, v in zip(frames, valid) if v], mc.tolist(),
        max_miss=0, st_mode=False)
    assert qs.eval_count == py.eval_count
    assert qs.sat_count == py.sat_frames
    expect = _expect_from_mirror(pycounts, pycands, pybest, num_ids, pfp)
    assert [r.id for r in res] == [r.id for r in expect]
    for a, b in zip(res, expect):
        assert dataclasses_equal(a, b)


def _build_spaced_filter(seed_strings, m2=2, nrefs=3, L=90, seed=7,
                         size=4096):
    """End-to-end spaced-seed MIBF: hash real sequences with
    seeds.spaced_hash_frames, run the 4-phase construct."""
    from btl_bloomfilter_tpu.ops import seeds as seeds_mod

    rng = np.random.default_rng(seed)
    k = len(seed_strings[0])
    h = len(seed_strings) * m2
    refs = [rng.integers(0, 4, size=L, dtype=np.uint8)
            for _ in range(nrefs)]
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=k, hash_num=h, occupancy=0.5,
        sseeds=tuple(seed_strings))
    frames = [seeds_mod.spaced_hash_frames(r, seed_strings, m2)
              for r in refs]
    for fr in frames:
        st = mibf_construct.insert_bv(st, fr.hashes, valid=fr.valid)
    m, counts = mibf_construct.get_empty_mibf(st)
    for i, fr in enumerate(frames):
        m, counts = mibf_construct.insert_mibf(m, counts, fr.hashes, i + 1,
                                               valid=fr.valid)
    for i, fr in enumerate(frames):
        m, counts = mibf_construct.insert_saturation(m, counts, fr.hashes,
                                                     i + 1, valid=fr.valid)
    return m, refs


def _mutate(codes, positions, rng):
    out = codes.copy()
    for p in positions:
        out[p] = (out[p] + rng.integers(1, 4)) % 4
    return out


import pytest


@pytest.mark.parametrize("max_miss", [1, 2])
def test_spaced_seed_classification_max_miss(max_miss):
    """Spaced-seed MIBF built end-to-end; mutated reads classified with
    max_miss > 0 must match the mirror fed the same hit masks — the
    solid/nsf gating on misses==0 and the st-path eval convention
    included (MIBFQuerySupport.hpp:397-406, :474-484)."""
    from btl_bloomfilter_tpu.ops import seeds as seeds_mod

    seed_strings = ["110110111011011", "110110111011011"[::-1]]
    m, refs = _build_spaced_filter(seed_strings)
    assert m.sseeds  # st engine
    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0, extra_frame_limit=10**6,
        max_miss=max_miss, min_count=1, best_hit_agree=False)
    mc = np.full(num_ids, 1, np.int32)

    rng = np.random.default_rng(max_miss * 11 + 1)
    # a read from ref 2 with two point mutations -> frames with misses
    read = _mutate(refs[1][10:70], [20, 37], rng)
    fr = seeds_mod.spaced_hash_frames(read, seed_strings, m2=2)
    res = qs.query(fr.hashes, fr.valid, mc)

    frames_np = fr.hashes.astype_numpy()
    v = np.asarray(fr.valid)
    py = _mirror_for(m, pfp)
    pycounts, pycands, pybest = py.query(
        [frames_np[i] for i in range(len(v)) if v[i]], mc.tolist(),
        max_miss=max_miss, st_mode=True)
    assert qs.eval_count == py.eval_count
    assert qs.sat_count == py.sat_frames
    # the mirror must have seen partial frames for this test to bite
    expect = _expect_from_mirror(pycounts, pycands, pybest, num_ids, pfp)
    assert [r.id for r in res] == [r.id for r in expect]
    for a, b in zip(res, expect):
        assert dataclasses_equal(a, b)
    assert res and res[0].id == 2
    # solid < nsf iff some frames carried misses
    r0 = res[0]
    assert r0.solid_count <= r0.non_sat_frame_count


def test_spaced_seed_mirror_sees_nonzero_misses():
    """Guard: the max_miss test above actually exercises misses != 0
    (frames with 1..max_miss missing slots enter the engine)."""
    from btl_bloomfilter_tpu.ops import seeds as seeds_mod

    seed_strings = ["110110111011011", "110110111011011"[::-1]]
    m, refs = _build_spaced_filter(seed_strings)
    rng = np.random.default_rng(12)
    read = _mutate(refs[1][10:70], [20, 37], rng)
    fr = seeds_mod.spaced_hash_frames(read, seed_strings, m2=2)
    bits = np.unpackbits(np.asarray(m.bv_words).view(np.uint8),
                         bitorder="little")[: m.size].astype(bool)
    frames_np = fr.hashes.astype_numpy()
    v = np.asarray(fr.valid)
    miss_counts = []
    for i in range(len(v)):
        if not v[i]:
            continue
        miss_counts.append(sum(
            0 if bits[int(hv) % m.size] else 1 for hv in frames_np[i]))
    assert any(0 < c <= 2 for c in miss_counts), miss_counts


def test_strand_carrying_classification():
    """Frames whose stored values carry the strand bit (insert with
    strand, MIBloomFilter.hpp:312-373) classify as distinct table entries
    (id | s_strand) — engine vs mirror, width-1 filter (s_strand=64)."""
    size, h = 2048, 3
    hashes = rand_hashes(90, h, seed=21)
    rng = np.random.default_rng(3)
    strand = rng.random((90, h)) < 0.5
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=11, hash_num=h, occupancy=0.5, sseeds=())
    st = mibf_construct.insert_bv(st, u64.from_numpy(hashes))
    m, counts = mibf_construct.get_empty_mibf(st, data_width=1)
    for idv, lo in [(1, 0), (2, 30), (3, 60)]:
        m, ok = mibf_construct.insert_random_order(
            m, hashes[lo: lo + 30], idv, 1, strand=strand[lo: lo + 30])
    assert m.s_strand == 64
    num_ids = 70      # covers id | s_strand = 64..67
    pfp = [0.0] + [0.1] * (num_ids - 1)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0, extra_frame_limit=10**6,
        max_miss=0, min_count=1, best_hit_agree=False)
    mc = np.full(num_ids, 1, np.int32)
    frames = hashes[30:60]
    res = qs.query(u64.from_numpy(frames), np.ones(30, bool), mc)

    py = _mirror_for(m, pfp)
    pycounts, pycands, pybest = py.query(frames, mc.tolist())
    assert qs.eval_count == py.eval_count
    expect = _expect_from_mirror(pycounts, pycands, pybest, num_ids, pfp)
    assert [r.id for r in res] == [r.id for r in expect]
    for a, b in zip(res, expect):
        assert dataclasses_equal(a, b)
    # strand-carrying entries really exist in the stored data ...
    data = np.asarray(m.data)
    assert (data >= 64).any() and ((data > 0) & (data < 64)).any()
    # ... and were counted as DISTINCT table entries (id | s_strand)
    strand_total = sum(pycounts[i]["total"] for i in range(64, num_ids))
    plain_total = sum(pycounts[i]["total"] for i in range(1, 64))
    assert strand_total > 0 and plain_total > 0


# ---------------------------------------------------------------------------
# two-pass fast engine == reference scan engine (exact)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed,R,W,h,num_ids,efl,satfrac,missfrac,oor", [
    (1, 3, 40, 4, 8, 10**6, 0.2, 0.0, False),
    (2, 4, 57, 3, 8, 3, 0.3, 0.2, False),       # early exit + misses
    (3, 2, 33, 4, 5, 0, 0.5, 0.3, True),        # tiny efl + out-of-range
    (4, 5, 64, 2, 16, 7, 0.0, 0.0, False),
    (5, 1, 128, 4, 64, 10**6, 0.1, 0.1, False),
])
def test_fast_engine_matches_scan(seed, R, W, h, num_ids, efl, satfrac,
                                  missfrac, oor):
    """query_frames_batch (two-pass vectorized) must produce the exact
    same dict as query_scan_batch on adversarial frame tables: saturated
    values, duplicate raws within frames, misses, invalid frames, early
    exits, and out-of-range ids aliasing the clipped id's counts."""
    from btl_bloomfilter_tpu.models.mibf_query import (
        query_frames_batch, query_scan_batch)

    rng = np.random.default_rng(seed)
    m, _ = build_filter(size=1024, h=h, n=50, seed=seed)
    smask = m.s_mask
    ids = rng.integers(0, num_ids, size=(R, W, h)).astype(np.uint32)
    if oor:
        alien = rng.random((R, W, h)) < 0.15
        ids = np.where(alien, ids + np.uint32(num_ids + 3), ids)
    sat = rng.random((R, W, h)) < satfrac
    raw = np.where(sat, ids | np.uint32(smask), ids)
    # duplicate raws inside some frames
    dup = rng.random((R, W)) < 0.3
    raw[dup, 1] = raw[dup, 0]
    hit = rng.random((R, W, h)) >= missfrac
    raw = np.where(hit, raw, 0)
    misses = (~hit).sum(axis=-1).astype(np.int32)
    valid = rng.random((R, W)) < 0.9
    usable = valid & (misses <= 1)
    mc = rng.integers(1, 4, size=num_ids).astype(np.int32)
    ev = valid

    args = (m, jnp.asarray(raw), jnp.asarray(hit), jnp.asarray(usable),
            jnp.asarray(misses), jnp.asarray(mc), num_ids, efl)
    a = query_scan_batch(*args, frame_eval=jnp.asarray(ev))
    for chunk in (1, 4, 16):
        b = query_frames_batch(*args, frame_eval=jnp.asarray(ev),
                               chunk=chunk)
        for k in ("counts", "candidates", "best", "sat_count",
                  "eval_count"):
            np.testing.assert_array_equal(
                np.asarray(a[k]), np.asarray(b[k]), err_msg=f"{k}")
