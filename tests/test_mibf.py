"""MIBF core + construction vs a transparent sequential python model.

No C++ oracle exists for the MIBF (the reference's MIBF headers need
sdsl-lite, absent here, and the reference repo itself ships no MIBF tests —
SURVEY.md §4). The python model below mirrors the reference algorithms
line-by-line (including the pre-filled-zeros quirks of setSatIfMissing) and
the vectorized TPU implementation is checked against it.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from btl_bloomfilter_tpu.models import mibf, mibf_construct
from btl_bloomfilter_tpu.ops import u64
from btl_bloomfilter_tpu.utils import stdcpp

RNG = np.random.default_rng(0x31)


def rand_hashes(n, h, seed=1):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << 64, size=(n, h), dtype=np.uint64)


# ---------------------------------------------------------------------------
# python reference model
# ---------------------------------------------------------------------------

class PyMIBF:
    """Sequential mirror of MIBloomFilter + MIBFConstructSupport."""

    def __init__(self, size, h, width_bits=16):
        self.size = size
        self.h = h
        self.width = width_bits
        self.bits = np.zeros(size, dtype=bool)
        self.s_mask = 1 << (width_bits - 1)
        self.s_anti = self.s_mask - 1
        self.frozen = False

    def insert_bv(self, hashes):
        for row in hashes:
            for hv in row:
                self.bits[int(hv) % self.size] = True

    def freeze(self):
        self.cum = np.concatenate([[0], np.cumsum(self.bits)])
        self.d_size = int(self.bits.sum())
        # object dtype: exact python-int arithmetic at every width
        # (width_bits=64 masks overflow int64)
        self.data = np.zeros(self.d_size, dtype=object)
        self.counts = np.zeros(self.d_size, dtype=object)
        self.frozen = True

    def rank(self, pos):
        return int(self.cum[pos])

    def insert_mibf(self, hashes, idv):
        # unique values in sorted order (framework's documented order)
        vals = sorted({int(hv) for row in hashes for hv in row})
        for v in vals:
            rk = self.rank(v % self.size)
            self.counts[rk] += 1
            count = self.counts[rk] & ((1 << self.width) - 1)
            hval = (v ^ idv) & ((1 << self.width) - 1)
            if count and hval % count == count - 1:
                sat = self.data[rk] & self.s_mask
                self.data[rk] = idv | sat

    def set_sat_if_missing(self, hashes, idv):
        for row in hashes:
            rk = [self.rank(int(hv) % self.size) for hv in row]
            results = [int(self.data[r]) for r in rk]
            seen = [0] * self.h
            repl = [0] * self.h
            found = False
            for r in results:
                cur = r & self.s_anti
                if cur == idv:
                    found = True
                    break
                if cur in seen:
                    repl.append(cur)
                else:
                    seen.append(cur)
            if found:
                continue
            repl_pos = None
            min_count = 0
            for i in range(self.h):
                cur = results[i] & self.s_anti
                if cur in repl:
                    if min_count < self.counts[rk[i]]:
                        min_count = self.counts[rk[i]]
                        repl_pos = rk[i]
            if repl_pos is not None:
                sat = self.data[repl_pos] & self.s_mask
                self.data[repl_pos] = idv | sat
                self.counts[repl_pos] += 1
            else:
                for r in rk:
                    self.data[r] |= self.s_mask


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def build_pair(size=4096, h=4, n=200, seed=1):
    hashes = rand_hashes(n, h, seed)
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=11, hash_num=h, occupancy=0.5, sseeds=())
    st = mibf_construct.insert_bv(st, u64.from_numpy(hashes))
    py = PyMIBF(size, h)
    py.insert_bv(hashes)
    return st, py, hashes


def test_insert_bv_matches_model():
    st, py, _ = build_pair()
    words = np.asarray(st.bv_words)
    got = np.unpackbits(words.view(np.uint8), bitorder="little")
    np.testing.assert_array_equal(got[: py.size], py.bits)


def test_freeze_and_rank():
    st, py, hashes = build_pair()
    py.freeze()
    m, counts = mibf_construct.get_empty_mibf(st)
    assert m.d_size == py.d_size
    pos = (hashes.reshape(-1) % np.uint64(py.size)).astype(np.int64)
    rank, hit = mibf.rank_of_positions(m, jnp.asarray(pos.astype(np.uint32)))
    np.testing.assert_array_equal(np.asarray(rank),
                                  [py.rank(p) for p in pos])
    assert np.asarray(hit).all()  # all positions were inserted


def test_insert_mibf_matches_model():
    st, py, _ = build_pair()
    py.freeze()
    m, counts = mibf_construct.get_empty_mibf(st)
    for idv, seed in [(3, 11), (5, 12), (9, 13)]:
        seq_hashes = rand_hashes(40, 4, seed)
        # only values already in the bv can be inserted; reuse bv hashes
        m_hashes = rand_hashes(200, 4, 1)[seed % 100: seed % 100 + 40]
        m, counts = mibf_construct.insert_mibf(
            m, counts, u64.from_numpy(m_hashes), idv)
        py.insert_mibf(m_hashes, idv)
    np.testing.assert_array_equal(np.asarray(m.data).astype(np.int64), py.data)
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int64),
                                  py.counts)


def test_insert_saturation_matches_model():
    st, py, _ = build_pair()
    py.freeze()
    m, counts = mibf_construct.get_empty_mibf(st)
    base = rand_hashes(200, 4, 1)
    for idv, lo in [(3, 0), (5, 40), (9, 80)]:
        m, counts = mibf_construct.insert_mibf(
            m, counts, u64.from_numpy(base[lo: lo + 40]), idv)
        py.insert_mibf(base[lo: lo + 40], idv)
    for idv, lo in [(3, 0), (5, 40), (9, 80), (7, 100)]:
        m, counts = mibf_construct.insert_saturation(
            m, counts, u64.from_numpy(base[lo: lo + 40]), idv)
        py.set_sat_if_missing(base[lo: lo + 40], idv)
    np.testing.assert_array_equal(np.asarray(m.data).astype(np.int64), py.data)
    np.testing.assert_array_equal(np.asarray(counts).astype(np.int64),
                                  py.counts)


def test_at_and_saturate():
    st, py, hashes = build_pair(n=50)
    m, counts = mibf_construct.get_empty_mibf(st)
    m, counts = mibf_construct.insert_mibf(
        m, counts, u64.from_numpy(hashes), 7)
    vals, ok, fsat = mibf.at(m, u64.from_numpy(hashes))
    assert np.asarray(ok).all()
    assert not np.asarray(fsat).any()
    m2 = mibf.saturate(m, u64.from_numpy(hashes[:5]))
    vals2, ok2, fsat2 = mibf.at(m2, u64.from_numpy(hashes[:5]))
    assert np.asarray(fsat2).all()
    np.testing.assert_array_equal(np.asarray(vals2), np.asarray(vals)[:5])


def test_insert_random_order_roundtrip():
    st, py, hashes = build_pair(n=30, h=3)
    m, counts = mibf_construct.get_empty_mibf(st)
    m, success = mibf_construct.insert_random_order(m, hashes[:30], 5, 1)
    assert success.all()
    vals, ok, _ = mibf.at(m, u64.from_numpy(hashes[:30]))
    # with max=1 each frame must contain the ID in at least one slot
    assert ((np.asarray(vals) == 5).any(axis=-1)).all()


def test_id_counts():
    st, py, hashes = build_pair(n=60, h=3, seed=9)
    m, counts = mibf_construct.get_empty_mibf(st)
    m, counts = mibf_construct.insert_mibf(m, counts,
                                           u64.from_numpy(hashes), 2)
    cts, sat = mibf.get_id_counts(m, 8)
    assert int(sat) == 0
    total_set = int(np.asarray(cts)[2])
    assert total_set > 0
    assert int(np.asarray(cts)[0]) == m.d_size - total_set


def test_mibf_store_load_roundtrip(tmp_path):
    from btl_bloomfilter_tpu.io import mibf_format

    st, py, hashes = build_pair(n=80, h=3, seed=5)
    m, counts = mibf_construct.get_empty_mibf(st)
    m, counts = mibf_construct.insert_mibf(m, counts,
                                           u64.from_numpy(hashes), 6)
    m = mibf.saturate(m, u64.from_numpy(hashes[:4]))
    p = str(tmp_path / "f.mibf")
    mibf_format.store_mibf(m, p)
    m2 = mibf_format.load_mibf(p)
    assert (m2.size, m2.hash_num, m2.kmer_size, m2.d_size) == \
           (m.size, m.hash_num, m.kmer_size, m.d_size)
    np.testing.assert_array_equal(np.asarray(m2.bv_words),
                                  np.asarray(m.bv_words))
    np.testing.assert_array_equal(np.asarray(m2.data), np.asarray(m.data))
    np.testing.assert_array_equal(np.asarray(m2.cum_ranks),
                                  np.asarray(m.cum_ranks))
    # store again: byte-stable
    p2 = str(tmp_path / "g.mibf")
    mibf_format.store_mibf(m2, p2)
    assert open(p, "rb").read() == open(p2, "rb").read()
    assert open(p + ".sdsl", "rb").read() == open(p2 + ".sdsl", "rb").read()


def test_mibf_store_with_seeds(tmp_path):
    from btl_bloomfilter_tpu.io import mibf_format

    hashes = rand_hashes(40, 2, 8)
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(2048 // 32, jnp.uint32), filter_size=2048,
        kmer_size=9, hash_num=2, occupancy=0.5,
        sseeds=("110110111", "111010011"))
    st = mibf_construct.insert_bv(st, u64.from_numpy(hashes))
    m, counts = mibf_construct.get_empty_mibf(st)
    p = str(tmp_path / "s.mibf")
    mibf_format.store_mibf(m, p)
    m2 = mibf_format.load_mibf(p)
    assert tuple(m2.sseeds) == ("110110111", "111010011")
    # header layout: hlen must be 32 + 2*9
    import struct
    raw = open(p, "rb").read()
    magic, hlen, dsz, nh, km, ver = struct.unpack_from("<8sIQIII", raw, 0)
    assert magic == b"MIBLOOMF" and hlen == 32 + 18 and ver == 1


def test_insert_bv_colli():
    size, h = 2048, 3
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=9, hash_num=h, occupancy=0.5, sseeds=())
    hashes = rand_hashes(50, h, 21)
    dup = np.concatenate([hashes, hashes[:10]])  # re-inserted frames collide
    st2, count = mibf_construct.insert_bv_colli(st, u64.from_numpy(dup))
    # python model
    bits = np.zeros(size, bool)
    expect = 0
    for row in dup:
        pos = (row % np.uint64(size)).astype(int)
        if bits[pos].all():
            expect += 1
        bits[pos] = True
    assert int(count) == expect
    got = np.unpackbits(np.asarray(st2.bv_words).view(np.uint8),
                        bitorder="little")[:size]
    np.testing.assert_array_equal(got, bits)


@pytest.mark.parametrize("maxc,use_strand,dup,h,size", [
    (1, False, False, 4, 4096),   # dense: saturation fallback exercised
    (1, True, False, 3, 4096),    # strand + fallback (legal at max==1)
    (2, False, True, 4, 4096),    # dense collisions, strandless
    (3, False, True, 5, 4096),
    # strand with max>1 needs a collision-free filter: a cross-frame
    # position collision with opposite strand values reaches the
    # reference's count==0 assert (MIBloomFilter.hpp:431), i.e. UB input
    (2, True, True, 4, 1 << 20),
    (3, True, True, 5, 1 << 20),
])
def test_insert_random_order_device_matches_host(maxc, use_strand, dup, h,
                                                 size):
    """insert_random_order_device (lax.scan, traced minstd/std::shuffle)
    must be bit-identical to the golden-verified host mirror, including
    the strand-aware overload (MIBloomFilter.hpp:312-373)."""
    import dataclasses as _dc
    rng = np.random.default_rng(42 + maxc)
    hashes = rng.integers(0, 1 << 64, size=(40, h), dtype=np.uint64)
    # strand is a function of the k-mer (canonical-strand bit), so
    # duplicate frames must carry identical strand rows
    strand = rng.random(hashes.shape) < 0.5 if use_strand else None
    if dup:
        idx = rng.integers(0, 40, size=80)
        hashes = hashes[idx]
        if strand is not None:
            strand = strand[idx]

    state = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=5, hash_num=h, occupancy=0.5, sseeds=())
    state = mibf_construct.insert_bv(state, u64.from_numpy(hashes))
    m0, _ = mibf_construct.get_empty_mibf(state, data_width=2)
    d0 = np.asarray(m0.data).copy()
    if maxc == 1:
        # exercise the count==0 saturation fallback (only legal at max==1,
        # MIBloomFilter.hpp:430-434) plus saturated-entry stripping
        d0[rng.integers(0, len(d0), size=len(d0) // 3)] = 5
        d0[rng.integers(0, len(d0), size=len(d0) // 7)] = 0x8005
    m0 = _dc.replace(m0, data=jnp.asarray(d0))

    ma, sa = mibf_construct.insert_random_order(m0, hashes, 5, maxc,
                                                strand=strand)
    mb, sb = mibf_construct.insert_random_order_device(
        m0, u64.from_numpy(hashes), 5, maxc,
        strand=None if strand is None else jnp.asarray(strand))
    np.testing.assert_array_equal(np.asarray(ma.data), np.asarray(mb.data))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_sdsl_rank_samples_roundtrip_and_validation():
    from btl_bloomfilter_tpu.io import sdsl as sdsl_io

    rng = np.random.default_rng(4)
    size_bits = 5000  # multiple superblocks + a partial one
    bits = rng.integers(0, 1 << 32, size=(size_bits + 31) // 32,
                        dtype=np.uint32)
    buf = sdsl_io.serialize_bit_vector_il(bits, size_bits)
    back, sz = sdsl_io.deserialize_bit_vector_il(buf)
    assert sz == size_bits
    mask_last = (1 << (size_bits % 32)) - 1
    expect = bits.copy()
    expect[-1] &= mask_last
    got = back.copy()
    got[-1] &= mask_last
    np.testing.assert_array_equal(got, expect)
    # serialization is deterministic
    assert buf == sdsl_io.serialize_bit_vector_il(bits, size_bits)
    # samples are present and validated: corrupting one must be caught
    bad = bytearray(buf)
    bad[-4] ^= 0xFF
    with pytest.raises(ValueError):
        sdsl_io.deserialize_bit_vector_il(bytes(bad))


def _sdsl_variant(buf, trailing=False, sample_pad=0):
    """Rebuild an .sdsl byte buffer in one of the 2x2 convention variants
    the loader must tolerate (docs/PARITY.md deviations 1): an optional
    trailing total-rank word after the interleaved blocks, and a
    zero-padded (or truncated, sample_pad < 0) rank-sample vector."""
    import struct

    size_bits = struct.unpack_from("<Q", buf, 0)[0]
    data_bits = struct.unpack_from("<Q", buf, 8)[0]
    nwords = data_bits // 64
    il = np.frombuffer(buf, dtype="<u8", count=nwords, offset=16)
    off = 16 + nwords * 8
    sample_bits = struct.unpack_from("<Q", buf, off)[0]
    nsamples = sample_bits // 64
    samples = np.frombuffer(buf, dtype="<u8", count=nsamples,
                            offset=off + 8)

    wpb = sdsl_words_per_block()
    blocks = il.reshape(-1, wpb + 1)
    if trailing:
        total = int(blocks[-1, 0]) + int(
            np.unpackbits(blocks[-1, 1:].astype("<u8").view(np.uint8)).sum())
        il = np.concatenate([il, np.asarray([total], dtype="<u8")])
    if sample_pad > 0:
        samples = np.concatenate(
            [samples, np.zeros(sample_pad, dtype="<u8")])
    elif sample_pad < 0:
        samples = samples[:sample_pad]

    out = bytearray()
    out += struct.pack("<Q", size_bits)
    out += struct.pack("<Q", 64 * il.shape[0])
    out += il.tobytes()
    out += struct.pack("<Q", 64 * samples.shape[0])
    out += samples.tobytes()
    return bytes(out)


def sdsl_words_per_block():
    from btl_bloomfilter_tpu.io import sdsl as sdsl_io
    return sdsl_io._WORDS_PER_BLOCK


@pytest.mark.parametrize("trailing,sample_pad,convention", [
    (False, 0, "bfs-tree"),
    (True, 0, "bfs-tree"),
    (False, 3, "zero-padded"),
    (True, -1, "truncated"),
])
def test_sdsl_loader_convention_tolerance(trailing, sample_pad, convention):
    """All 2x2 convention variants of a genuine-layout .sdsl load to the
    same bit vector, and the loader reports which variant it read
    (VERDICT r3 next #7; MIBloomFilter.hpp:294-297)."""
    from btl_bloomfilter_tpu.io import sdsl as sdsl_io

    rng = np.random.default_rng(9)
    size_bits = 4096
    bits = rng.integers(0, 1 << 32, size=size_bits // 32, dtype=np.uint32)
    base = sdsl_io.serialize_bit_vector_il(bits, size_bits)
    var = _sdsl_variant(base, trailing=trailing, sample_pad=sample_pad)
    back, sz, info = sdsl_io.deserialize_bit_vector_il(var, with_info=True)
    assert sz == size_bits
    np.testing.assert_array_equal(back, bits)
    assert info["trailing_total_rank"] == trailing
    assert info["sample_convention"] == convention

    # a WRONG trailing word is still rejected
    import struct

    bad = bytearray(_sdsl_variant(base, trailing=True))
    data_bits = struct.unpack_from("<Q", bad, 8)[0]
    toff = 16 + (data_bits // 64 - 1) * 8
    struct.pack_into("<Q", bad, toff,
                     struct.unpack_from("<Q", bad, toff)[0] + 1)
    with pytest.raises(ValueError):
        sdsl_io.deserialize_bit_vector_il(bytes(bad))


def test_sdsl_loader_rejects_cut_short_sample_tree():
    """A rank-sample vector shorter than tree-size-minus-one is a
    corrupt/cut-short file, not a convention variant (ADVICE r4):
    only the exact one-fewer length is accepted as 'truncated'."""
    from btl_bloomfilter_tpu.io import sdsl as sdsl_io

    rng = np.random.default_rng(11)
    size_bits = 8192
    bits = rng.integers(0, 1 << 32, size=size_bits // 32, dtype=np.uint32)
    base = sdsl_io.serialize_bit_vector_il(bits, size_bits)
    with pytest.raises(ValueError, match="truncated or corrupt"):
        sdsl_io.deserialize_bit_vector_il(
            _sdsl_variant(base, sample_pad=-2))


def test_insert_bv_colli_batched_matches_sequential():
    """The batched insertBVColli must be bit-identical to the scan
    mirror on duplicate-heavy streams with invalid frames mixed in."""
    size, h = 1024, 3  # small => heavy cross-frame bit sharing
    rng = np.random.default_rng(31)
    hashes = rand_hashes(120, h, 31)
    # interleave duplicates at varying distances
    stream = np.concatenate([hashes[:40], hashes[10:50], hashes,
                             hashes[::3]])
    valid = rng.random(len(stream)) < 0.85

    def fresh():
        return mibf_construct.BitVectorState(
            bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
            kmer_size=9, hash_num=h, occupancy=0.5, sseeds=())

    st1, c1 = mibf_construct.insert_bv_colli_sequential(
        fresh(), u64.from_numpy(stream), jnp.asarray(valid))
    st2, c2 = mibf_construct.insert_bv_colli(
        fresh(), u64.from_numpy(stream), jnp.asarray(valid))
    assert int(c1) == int(c2)
    np.testing.assert_array_equal(np.asarray(st1.bv_words),
                                  np.asarray(st2.bv_words))


@pytest.mark.parametrize("max_entangled", [None, 2])
def test_insert_saturation_batched_matches_sequential(max_entangled):
    """Batched phase 4 (group collapse + entangled replay) must be
    bit-identical to the per-frame scan on a stream mixing duplicates,
    mutate rescues, saturations, and invalid frames; max_entangled=2
    forces the full-sequential fallback."""
    st, py, _ = build_pair(size=2048, h=4, n=150)
    base = rand_hashes(150, 4, 1)
    m0, counts0 = mibf_construct.get_empty_mibf(st)
    for idv, lo in [(3, 0), (5, 40), (9, 80)]:
        m0, counts0 = mibf_construct.insert_mibf(
            m0, counts0, u64.from_numpy(base[lo: lo + 40]), idv)

    rng = np.random.default_rng(7)
    # duplicates + overlapping windows => entangled groups; id 7 is absent
    # from construction so both mutate and saturate branches fire
    stream = np.concatenate([base[90:130], base[100:140], base[90:110]])
    valid = rng.random(len(stream)) < 0.9

    m1, c1 = mibf_construct.insert_saturation_sequential(
        m0, counts0, u64.from_numpy(stream), 7, jnp.asarray(valid))
    m2, c2 = mibf_construct.insert_saturation(
        m0, counts0, u64.from_numpy(stream), 7, jnp.asarray(valid),
        max_entangled=max_entangled)
    np.testing.assert_array_equal(np.asarray(m1.data), np.asarray(m2.data))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    # sanity: the pass really did something on both branches
    assert (np.asarray(m2.data) != np.asarray(m0.data)).any()


def test_insert_mibf_many_matches_sequential_calls():
    """The one-dispatch multi-sequence phase 3 must equal per-sequence
    insert_mibf calls in id order — including rank groups shared across
    sequences (the order-dependent reservoir interleaving)."""
    size, h = 512, 3              # small => heavy cross-sequence sharing
    rng = np.random.default_rng(77)
    G, W = 5, 40
    hashes = rng.integers(0, 1 << 64, size=(G, W, h), dtype=np.uint64)
    hashes[1, :10] = hashes[0, :10]          # shared values across ids
    valid = rng.random((G, W)) < 0.9
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=11, hash_num=h, occupancy=0.5, sseeds=())
    for g in range(G):
        st = mibf_construct.insert_bv(st, u64.from_numpy(hashes[g]),
                                      valid=valid[g])
    ids = np.arange(1, G + 1, dtype=np.int32)

    m1, c1 = mibf_construct.get_empty_mibf(st)
    for g in range(G):
        m1, c1 = mibf_construct.insert_mibf(
            m1, c1, u64.from_numpy(hashes[g]), int(ids[g]),
            valid=valid[g])

    m2, c2 = mibf_construct.get_empty_mibf(st)
    m2, c2 = mibf_construct.insert_mibf_many(
        m2, c2, u64.from_numpy(hashes), ids, valid=valid)

    np.testing.assert_array_equal(np.asarray(m1.data), np.asarray(m2.data))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


@pytest.mark.parametrize("max_entangled", [None, 8])
def test_insert_saturation_many_matches_sequential_calls(max_entangled):
    """One-dispatch multi-sequence phase 4 (per-frame ids, depth-
    scheduled replay) == per-sequence insert_saturation calls in id
    order, on streams with heavy cross-sequence rank sharing, duplicate
    frames, and invalid frames (small max_entangled forces the
    full-sequential fallback)."""
    size, h = 512, 3
    rng = np.random.default_rng(41)
    G, W = 5, 30
    hashes = rng.integers(0, 1 << 64, size=(G, W, h), dtype=np.uint64)
    hashes[2, :8] = hashes[0, :8]            # cross-id shared frames
    hashes[3, 5] = hashes[3, 4]              # duplicate frame same id
    valid = rng.random((G, W)) < 0.9
    st = mibf_construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=11, hash_num=h, occupancy=0.5, sseeds=())
    for g in range(G):
        st = mibf_construct.insert_bv(st, u64.from_numpy(hashes[g]),
                                      valid=valid[g])
    ids = np.arange(1, G + 1, dtype=np.int32)

    def phase3(m, c):
        for g in range(G):
            m, c = mibf_construct.insert_mibf(
                m, c, u64.from_numpy(hashes[g]), int(ids[g]),
                valid=valid[g])
        return m, c

    m1, c1 = phase3(*mibf_construct.get_empty_mibf(st))
    for g in range(G):
        m1, c1 = mibf_construct.insert_saturation(
            m1, c1, u64.from_numpy(hashes[g]), int(ids[g]),
            valid=valid[g])

    m2, c2 = phase3(*mibf_construct.get_empty_mibf(st))
    m2, c2 = mibf_construct.insert_saturation_many(
        m2, c2, u64.from_numpy(hashes), ids, valid=valid,
        max_entangled=max_entangled)

    np.testing.assert_array_equal(np.asarray(m1.data), np.asarray(m2.data))
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
