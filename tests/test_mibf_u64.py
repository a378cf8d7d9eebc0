"""Width-8 (uint64 T) MIBF: dual-plane data vs the PyMIBF sequential
model with width_bits=64 (VERDICT r4 next #7; MIBloomFilter.hpp:36-44
derives s_mask/s_strand from sizeof(T) — the uint64 instantiation puts
them at bits 63/62).

The python model runs on arbitrary-precision ints, so the SAME
line-by-line mirror used for widths 1/2/4 validates the dual uint32
plane arithmetic, including IDs above 2**32.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from btl_bloomfilter_tpu.models import mibf, mibf_construct
from btl_bloomfilter_tpu.ops import u64

from test_mibf import PyMIBF, rand_hashes

BIG_ID = (37 << 40) | 12345            # an ID that needs the high plane


def build_pair64(size=4096, h=4, n=200, seed=1):
    hashes = rand_hashes(n, h, seed)
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=11, hash_num=h, occupancy=0.5, sseeds=())
    st = mibf_construct.insert_bv(st, u64.from_numpy(hashes))
    py = PyMIBF(size, h, width_bits=64)
    py.insert_bv(hashes)
    return st, py, hashes


def data_as_u64(m):
    planes = np.asarray(m.data)
    return (planes[0].astype(np.uint64)
            | (planes[1].astype(np.uint64) << np.uint64(32)))


def test_freeze_width8_shapes():
    st, py, _ = build_pair64()
    py.freeze()
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    assert m.data_width == 8
    assert m.data.shape == (2, py.d_size)
    assert m.data.dtype == jnp.uint32
    assert counts.shape == (py.d_size,)


def test_insert_mibf_width8_matches_model():
    st, py, _ = build_pair64()
    py.freeze()
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    for idv, seed in [(3, 11), (BIG_ID, 12), (9, 13)]:
        m_hashes = rand_hashes(200, 4, 1)[seed % 100: seed % 100 + 40]
        m, counts = mibf_construct.insert_mibf(
            m, counts, u64.from_numpy(m_hashes), idv)
        py.insert_mibf(m_hashes, idv)
    np.testing.assert_array_equal(
        data_as_u64(m), py.data.astype(np.uint64))
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int64),
                                  py.counts)


def test_insert_saturation_width8_matches_model():
    st, py, _ = build_pair64()
    py.freeze()
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    base = rand_hashes(200, 4, 1)
    ids = [(3, 0), (BIG_ID, 40), (9, 80)]
    for idv, lo in ids:
        m, counts = mibf_construct.insert_mibf(
            m, counts, u64.from_numpy(base[lo: lo + 40]), idv)
        py.insert_mibf(base[lo: lo + 40], idv)
    for idv, lo in ids + [(7, 100)]:
        m, counts = mibf_construct.insert_saturation(
            m, counts, u64.from_numpy(base[lo: lo + 40]), idv)
        py.set_sat_if_missing(base[lo: lo + 40], idv)
    np.testing.assert_array_equal(
        data_as_u64(m), py.data.astype(np.uint64))
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int64),
                                  py.counts)


def test_at_and_saturate_width8():
    st, py, hashes = build_pair64(n=50)
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    m, counts = mibf_construct.insert_mibf(
        m, counts, u64.from_numpy(hashes), BIG_ID)
    vals, ok, fsat = mibf.at(m, u64.from_numpy(hashes))
    assert np.asarray(ok).all()
    assert not np.asarray(fsat).any()
    got = (np.asarray(vals.lo).astype(np.uint64)
           | (np.asarray(vals.hi).astype(np.uint64) << np.uint64(32)))
    assert (got == np.uint64(BIG_ID)).any()

    m2 = mibf.saturate(m, u64.from_numpy(hashes[:5]))
    vals2, ok2, fsat2 = mibf.at(m2, u64.from_numpy(hashes[:5]))
    assert np.asarray(fsat2).all()
    # values are returned with the saturation bit stripped
    np.testing.assert_array_equal(np.asarray(vals2.lo),
                                  np.asarray(vals.lo)[:5])
    np.testing.assert_array_equal(np.asarray(vals2.hi),
                                  np.asarray(vals.hi)[:5])
    assert int(mibf.get_pop_saturated(m2)) > 0
    assert int(mibf.get_pop_saturated(m)) == 0


def test_at_rank_data_width8():
    st, py, hashes = build_pair64(n=40)
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    m, counts = mibf_construct.insert_mibf(
        m, counts, u64.from_numpy(hashes), 5)
    rank, hit, raw = mibf.at_rank_data(m, u64.from_numpy(hashes))
    assert np.asarray(hit).all()
    planes = np.asarray(m.data)
    np.testing.assert_array_equal(np.asarray(raw.lo),
                                  planes[0][np.asarray(rank)])
    np.testing.assert_array_equal(np.asarray(raw.hi),
                                  planes[1][np.asarray(rank)])


def test_set_data_width8():
    st, py, hashes = build_pair64(n=30)
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    m = mibf.saturate(m, u64.from_numpy(hashes[:3]))
    rank, hit = mibf.at_rank(m, u64.from_numpy(hashes[:3]))
    rk = np.asarray(rank).reshape(-1)
    ids = u64.from_numpy(
        np.full(rk.shape, BIG_ID, np.uint64))
    m2 = mibf.set_data(m, jnp.asarray(rk), ids)
    vals = data_as_u64(m2)
    # IDs written, saturation preserved
    assert (vals[rk] == np.uint64(BIG_ID | (1 << 63))).all()


def test_id_counts_width8():
    st, py, hashes = build_pair64(n=60, h=3, seed=9)
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    m, counts = mibf_construct.insert_mibf(m, counts,
                                           u64.from_numpy(hashes), 2)
    cts, sat = mibf.get_id_counts(m, 8)
    assert int(sat) == 0
    total_set = int(np.asarray(cts)[2])
    assert total_set > 0
    assert int(np.asarray(cts)[0]) == m.d_size - total_set
    # a big ID lands out of the [0, num_ids) table (drop), but the zero
    # count shrinks accordingly via get_pop_non_zero
    m2, counts = mibf_construct.insert_mibf(m, counts,
                                            u64.from_numpy(hashes), BIG_ID)
    cts2, _ = mibf.get_id_counts(m2, 8)
    assert int(np.asarray(cts2)[:8].sum()) <= m.d_size


def test_mibf_store_load_roundtrip_width8(tmp_path):
    from btl_bloomfilter_tpu.io import mibf_format

    st, py, hashes = build_pair64(n=80, h=3, seed=5)
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    m, counts = mibf_construct.insert_mibf(m, counts,
                                           u64.from_numpy(hashes), BIG_ID)
    m = mibf.saturate(m, u64.from_numpy(hashes[:4]))
    p = str(tmp_path / "f8.mibf")
    mibf_format.store_mibf(m, p)
    m2 = mibf_format.load_mibf(p, data_width=8)
    assert (m2.size, m2.hash_num, m2.kmer_size, m2.d_size) == \
           (m.size, m.hash_num, m.kmer_size, m.d_size)
    np.testing.assert_array_equal(np.asarray(m2.data), np.asarray(m.data))
    # byte-stable restore
    p2 = str(tmp_path / "g8.mibf")
    mibf_format.store_mibf(m2, p2)
    assert open(p, "rb").read() == open(p2, "rb").read()
    # the raw byte stream is the little-endian uint64 value stream
    body = open(p, "rb").read()[32:]
    vals = np.frombuffer(body, dtype="<u8")
    np.testing.assert_array_equal(vals, data_as_u64(m))


def test_insert_random_order_width8_host():
    st, py, hashes = build_pair64(n=30, h=3)
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    m, success = mibf_construct.insert_random_order(
        m, hashes[:30], BIG_ID, 1)
    assert success.all()
    vals = data_as_u64(m)
    # every frame has the ID in at least one slot
    rank, hit = mibf.at_rank(m, u64.from_numpy(hashes[:30]))
    got = vals[np.asarray(rank)]
    assert ((got == np.uint64(BIG_ID)).any(axis=-1)).all()


def test_insert_random_order_device_width8_raises():
    st, py, hashes = build_pair64(n=4, h=3)
    m, counts = mibf_construct.get_empty_mibf(st, data_width=8)
    with pytest.raises(NotImplementedError):
        mibf_construct.insert_random_order_device(
            m, u64.from_numpy(hashes[:4]), 1, 1)


def test_mod_u32_random():
    """u64 % traced-u32 helper vs python ints (reservoir arithmetic)."""
    rng = np.random.default_rng(77)
    v = rng.integers(0, 1 << 64, size=512, dtype=np.uint64)
    c = rng.integers(1, 1 << 31, size=512, dtype=np.uint32)
    got = np.asarray(u64.mod_u32(u64.from_numpy(v), jnp.asarray(c)))
    want = (v % c.astype(np.uint64)).astype(np.uint32)
    np.testing.assert_array_equal(got, want)
