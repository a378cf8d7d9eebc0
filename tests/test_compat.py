"""OO compatibility facade: reference-API names against golden files and
the reference test scenarios (Tests/Unit/*.cpp fixtures)."""

import numpy as np

from btl_bloomfilter_tpu import compat
from btl_bloomfilter_tpu.ops import nthash, nthash_tables


def hash_rows(seq, k, h):
    f = nthash.hash_frames(nthash_tables.encode_seq(seq), k, h)
    valid = np.asarray(f.valid)
    return f.hashes.astype_numpy()[valid]


def test_bloom_unit_fixture(tmp_path):
    """Mirrors Tests/Unit/BloomFilterTests.cpp:69-144 (scaled-down size)."""
    seq = "ACGTAC"
    bloom = compat.BloomFilter(10**6, 5, 4)
    rows = hash_rows(seq, 4, 5)
    for row in rows:
        bloom.insert(row)
    for row in rows:
        assert bloom.contains(row)
    p = str(tmp_path / "u.bf")
    bloom.storeFilter(p)
    loaded = compat.BloomFilter(p)
    assert loaded.getFilterSize() == 10**6
    assert loaded.sizeInBytes() == 125000
    for row in rows:
        assert loaded.contains(row)


def test_counting_unit_fixture(tmp_path):
    """Mirrors Tests/Unit/CountingBloomFilterTests.cpp:70-231."""
    seq = "ACGTACACTGGACTGAGTCT"
    for width in (1, 8):
        cbf = compat.CountingBloomFilter(100001, 5, 8, 1,
                                         counter_width=width)
        # size rounding: 100001 -> 100008 bytes
        assert cbf.sizeInBytes() == 100008
        rows = hash_rows(seq, 8, 5)
        for row in rows:
            cbf.insert(row)
        for row in rows:
            assert cbf.contains(row)
            assert cbf.minCount(row) >= 1
        p = str(tmp_path / f"c{width}.bf")
        cbf.storeFilter(p)
        loaded = compat.CountingBloomFilter(p, 1)
        for row in rows:
            assert loaded.contains(row)


def test_kmer_bloom_string_api(tmp_path):
    kbf = compat.KmerBloomFilter(8000, 3, 5)
    kbf.insert("TAGAA")            # single k-mer (KmerBloomFilter.hpp:63)
    compat.insertSeq(kbf, "CCCAAAGACCC")   # whole sequence
    assert kbf.contains("TAGAA")
    assert kbf.contains("CCCAA")
    assert not kbf.contains("GGGGG")


def test_insert_and_check():
    bloom = compat.BloomFilter(512, 2, 4)
    assert not bloom.insertAndCheck([1, 2])
    assert bloom.insertAndCheck([1, 2])


def test_fpr_helpers():
    b = compat.BloomFilter(1000, 0.01, 0, 5)
    assert b.getHashNum() == 6  # calcOptiHashNum(0.01)
    assert compat.calcApproxFPR(10000, 100, 3) > 0
    assert compat.calcRedunancyFPR(10000, 100, 3) > 0


# ---------------------------------------------------------------------------
# MIBF stack facade (MIBloomFilter / MIBFConstructSupport / MIBFQuerySupport)
# ---------------------------------------------------------------------------

def test_mibf_facade_full_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    hashes = rng.integers(0, 1 << 64, size=(100, 4), dtype=np.uint64)

    cs = compat.MIBFConstructSupport(200, 11, 4, 0.5)
    cs.insertBV(hashes[:50])
    assert cs.insertBVColli(hashes[50:]) >= 0
    m = cs.getEmptyMIBF()
    cs.insertMIBF(m, hashes[:50], 1)
    cs.insertMIBF(m, hashes[50:], 2)
    cs.insertSaturation(m, hashes[:50], 1)
    assert m.getPop() > 0
    assert m.getPopNonZero() > 0

    vals, ok, sat = m.at(hashes[0])
    assert ok and len(vals) == 4
    hit, ranks = m.atRank(hashes[0])
    assert hit
    assert m.getData(int(ranks[0])) in (1, 2) or m.getData(int(ranks[0])) > 0
    rk = m.getRankPos(int(hashes[0][0]))
    assert rk == ranks[0]

    probs, satp = m.calcFrameProbs(3, 0)
    probs2, satp2 = m.calcFrameProbsStrand(3, 0)
    assert len(probs) == len(probs2) == 3

    qs = compat.MIBFQuerySupport(m, [0.0, 0.1, 0.1], 2, 10**6, 0, 1, False)
    res = qs.query(hashes[:50], np.ones(3, np.int32))
    assert res and res[0].id == 1
    res2 = qs.queryPaired(hashes[50:70], hashes[70:100],
                          np.ones(3, np.int32))
    assert res2 and res2[0].id == 2
    pos, ev, ids, sat_pat = qs.getMatchSignature(hashes[:30])
    assert ev == 30 and len(pos) == 30  # all frames were inserted

    # calcSat on the facade (MIBFQuerySupport.hpp:544-553; VERDICT r4 #8)
    assert qs.calcSat(10, 0.2, 0) == 0.0
    from btl_bloomfilter_tpu.utils import binomial
    assert qs.calcSat(10, 0.2, 3) == binomial.calc_sat(10, 0.2, 3)

    # store/load round trip + random-order insert entry point
    p = str(tmp_path / "facade.mibf")
    m.store(p)
    m2 = compat.MIBloomFilter(p)
    assert m2.getPop() == m.getPop()
    assert m2.getKmerSize() == 11 and m2.getHashNum() == 4
    m2.insert(hashes[0], 3, 1)   # must not raise; may saturate
    m2.saturate(hashes[1])
    assert m2.getPopSaturated() > 0
