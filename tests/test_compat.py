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
