"""BloomFilter / CountingBloomFilter semantics + byte-exact .bf files."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btl_bloomfilter_tpu.io import bf_format
from btl_bloomfilter_tpu.models import bloom, counting, kmer_bloom
from btl_bloomfilter_tpu.ops import nthash, nthash_tables, u64

from util import golden_long_seq, np_bloom_insert

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
README_SEQ = "TAGAATCACCCAAAGA"
UNIT_SEQ = "ACGTAC"
CBF_SEQ = "ACGTACACTGGACTGAGTCT"


def golden_bytes(name):
    with open(os.path.join(GOLDEN_DIR, name), "rb") as f:
        return f.read()


def build_bloom(seq, size, h, k, **kw):
    bf = bloom.create(size, h, k, **kw)
    return kmer_bloom.insert_string(bf, seq)


# ---------------------------------------------------------------------------
# BloomFilter
# ---------------------------------------------------------------------------

def test_bf_readme_bytes_exact(tmp_path):
    bf = build_bloom(README_SEQ, 1000, 4, 5)
    path = tmp_path / "out.bf"
    bf_format.store_bloom(bf, str(path))
    assert path.read_bytes() == golden_bytes("bf_readme.bf")


def test_bf_entries_bytes_exact(tmp_path):
    bf = build_bloom(UNIT_SEQ, 512, 3, 4, n_entry=7, t_entry=11)
    path = tmp_path / "out.bf"
    bf_format.store_bloom(bf, str(path))
    assert path.read_bytes() == golden_bytes("bf_entries.bf")


def test_bf_load_golden_and_query(tmp_path):
    p = tmp_path / "g.bf"
    p.write_bytes(golden_bytes("bf_readme.bf"))
    bf = bf_format.load_bloom(str(p))
    assert (bf.size, bf.hash_num, bf.kmer_size) == (1000, 4, 5)
    hits, valid = kmer_bloom.contains_seq(
        bf, nthash_tables.encode_seq(README_SEQ))
    assert np.asarray(valid).all()
    assert np.asarray(hits).all()
    # negative control: a sequence with no inserted k-mers
    hits2, _ = kmer_bloom.contains_seq(
        bf, nthash_tables.encode_seq("GGGGGGGGGGGG"))
    assert not np.asarray(hits2).all()


def test_bf_store_load_roundtrip(tmp_path):
    bf = build_bloom(golden_long_seq(200), 4096, 5, 21, dfpr=0.25,
                     n_entry=3, t_entry=9)
    p = tmp_path / "rt.bf"
    bf_format.store_bloom(bf, str(p))
    bf2 = bf_format.load_bloom(str(p))
    np.testing.assert_array_equal(np.asarray(bf.words), np.asarray(bf2.words))
    assert bf2.dfpr == 0.25 and bf2.n_entry == 3 and bf2.t_entry == 9


def test_bf_insert_matches_numpy_model():
    rng = np.random.default_rng(3)
    hashes = rng.integers(0, 1 << 64, size=(200, 3), dtype=np.uint64)
    bf = bloom.create(1000, 3, 5)
    bf = bloom.insert(bf, u64.from_numpy(hashes))
    expect = np_bloom_insert(1000, hashes)
    got = bf_format.words_to_bytes(np.asarray(bf.words), 125)
    assert got == expect.tobytes()
    # contains: every inserted frame hits
    assert np.asarray(bloom.contains(bf, u64.from_numpy(hashes))).all()


def test_bf_insert_valid_mask():
    hashes = np.arange(1, 41, dtype=np.uint64).reshape(10, 4) * np.uint64(0x9E3779B1)
    valid = np.zeros(10, bool)
    valid[::2] = True
    bf = bloom.create(64 * 8, 4, 5)
    bf = bloom.insert(bf, u64.from_numpy(hashes), valid)
    expect = np_bloom_insert(64 * 8, hashes[valid])
    assert bf_format.words_to_bytes(np.asarray(bf.words), 64) == expect.tobytes()


def test_bf_insert_and_check():
    hashes = np.array([[1, 2, 3]], dtype=np.uint64)
    bf = bloom.create(800, 3, 5)
    bf, found = bloom.insert_and_check(bf, u64.from_numpy(hashes))
    assert not np.asarray(found)[0]
    bf, found = bloom.insert_and_check(bf, u64.from_numpy(hashes))
    assert np.asarray(found)[0]


def test_bf_pop_and_fpr():
    bf = build_bloom(README_SEQ, 1000, 4, 5)
    pop = int(bloom.get_pop(bf))
    raw = np.unpackbits(
        np.frombuffer(bf_format.words_to_bytes(np.asarray(bf.words), 125),
                      dtype=np.uint8))
    assert pop == int(raw.sum())
    fpr = float(bloom.get_fpr(bf))
    assert abs(fpr - (pop / 1000.0) ** 4) < 1e-9


def test_bf_size_must_be_multiple_of_8():
    with pytest.raises(ValueError):
        bloom.create(1001, 4, 5)


def test_bf_sizing_math():
    # mirrors writeBloom_rolling.cpp:100-103 / BloomFilter.hpp:406-419
    assert bloom.calc_optimal_size(1000, 0.0001, 0 or 13) % 64 == 0
    assert bloom.calc_opti_hash_num(0.0001) == 13


# ---------------------------------------------------------------------------
# CountingBloomFilter
# ---------------------------------------------------------------------------

def insert_stream(cbf, seq):
    codes = nthash_tables.encode_seq(seq)
    frames = nthash.hash_frames(codes, cbf.kmer_size, cbf.hash_num)
    return counting.insert(cbf, frames.hashes, frames.valid)


def test_cbf_small_bytes_exact(tmp_path):
    cbf = counting.create(1000, 5, 8, 1, counter_width=1)
    for _ in range(3):
        cbf = insert_stream(cbf, CBF_SEQ)
    p = tmp_path / "out.bf"
    bf_format.store_counting(cbf, str(p))
    assert p.read_bytes() == golden_bytes("cbf_small.bf")


def test_cbf_round_bytes_exact(tmp_path):
    cbf = counting.create(1001, 4, 6, 2, counter_width=1)
    assert cbf.size_in_bytes == 1008
    cbf = insert_stream(cbf, golden_long_seq(300)[:100])
    p = tmp_path / "out.bf"
    bf_format.store_counting(cbf, str(p))
    assert p.read_bytes() == golden_bytes("cbf_round.bf")


def test_cbf64_bytes_exact(tmp_path):
    cbf = counting.create(4096, 3, 5, 1, counter_width=8)
    cbf = insert_stream(cbf, golden_long_seq(300)[:120])
    p = tmp_path / "out.bf"
    bf_format.store_counting(cbf, str(p))
    assert p.read_bytes() == golden_bytes("cbf64_small.bf")


def test_cbf_load_golden_and_query(tmp_path):
    p = tmp_path / "g.bf"
    p.write_bytes(golden_bytes("cbf_small.bf"))
    cbf = bf_format.load_counting(str(p), count_threshold=2)
    assert (cbf.size, cbf.hash_num, cbf.kmer_size) == (1000, 5, 8)
    codes = nthash_tables.encode_seq(CBF_SEQ)
    frames = nthash.hash_frames(codes, 8, 5)
    counts = np.asarray(counting.min_count(cbf, frames.hashes))
    # every k-mer was inserted 3 times
    assert (counts == 3).all()
    assert np.asarray(counting.contains(cbf, frames.hashes)).all()


def test_cbf_conservative_update_semantics():
    """Conservative update increments only the minimum counters, in stream
    order; verified against a step-by-step numpy model of incrementMin."""
    rng = np.random.default_rng(11)
    size = 97  # prime => plenty of collisions
    h = 4
    hashes = rng.integers(0, 1 << 64, size=(60, h), dtype=np.uint64)

    model = np.zeros(size, dtype=np.uint8)
    for row in hashes:
        pos = (row % size).astype(int)
        mn = model[pos].min()
        if mn == 0xFF:
            continue
        model[pos] = np.where(model[pos] == mn, mn + 1, model[pos])

    cbf = counting.create(size, h, 5, 1, counter_width=1)
    # size 97 -> rounds to 104 bytes => 104 counters; rebuild model at 104
    size = cbf.size
    model = np.zeros(size, dtype=np.uint8)
    for row in hashes:
        pos = (row % size).astype(int)
        mn = model[pos].min()
        if mn == 0xFF:
            continue
        model[pos] = np.where(model[pos] == mn, mn + 1, model[pos])
    cbf = counting.insert(cbf, u64.from_numpy(hashes))
    np.testing.assert_array_equal(counting.to_numpy(cbf), model)


def test_cbf_overflow_freeze():
    size = 8
    h = 2
    cbf = counting.create(size, h, 4, 1, counter_width=1)
    hashes = np.zeros((300, h), dtype=np.uint64)  # all map to pos 0
    cbf = counting.insert(cbf, u64.from_numpy(hashes))
    assert int(counting.to_numpy(cbf)[0]) == 255  # frozen at max


def test_cbf_increment_all():
    rng = np.random.default_rng(5)
    h = 3
    cbf = counting.create(64, h, 4, 1, counter_width=1)
    hashes = rng.integers(0, 1 << 64, size=(40, h), dtype=np.uint64)
    cbf = counting.insert_all(cbf, u64.from_numpy(hashes))
    model = np.zeros(cbf.size, dtype=np.int64)
    for hv in hashes.reshape(-1):
        model[int(hv) % cbf.size] += 1
    np.testing.assert_array_equal(counting.to_numpy(cbf),
                                  np.minimum(model, 255).astype(np.uint8))


def test_cbf_popcounts():
    cbf = counting.create(64, 2, 4, 2, counter_width=1)
    hashes = np.array([[0, 1], [0, 1], [2, 3]], dtype=np.uint64)
    cbf = counting.insert_all(cbf, u64.from_numpy(hashes))
    assert int(counting.pop_count(cbf)) == 4
    assert int(counting.filtered_pop_count(cbf)) == 2


def test_bf_insert_and_check_sequential():
    """In-batch duplicate must report found=True (sequential semantics)."""
    hashes = np.array([[5, 9], [5, 9], [7, 11]], dtype=np.uint64)
    bf = bloom.create(4096, 2, 4)
    bf, found = bloom.insert_and_check_sequential(bf, u64.from_numpy(hashes))
    assert list(np.asarray(found)) == [False, True, False]
    # resulting filter identical to the batched insert
    bf2 = bloom.insert(bloom.create(4096, 2, 4), u64.from_numpy(hashes))
    np.testing.assert_array_equal(np.asarray(bf.words), np.asarray(bf2.words))


# ---------------------------------------------------------------------------
# batched conservative update == sequential mirror (bit-identical)
# ---------------------------------------------------------------------------

def _rand_hashes(n, h, seed):
    r = np.random.default_rng(seed)
    return u64.U64(
        jnp.asarray(r.integers(0, 1 << 32, size=(n, h), dtype=np.uint32)),
        jnp.asarray(r.integers(0, 1 << 32, size=(n, h), dtype=np.uint32)))


@pytest.mark.parametrize("n,h,size_bytes,repeat,width,seed", [
    (500, 3, 4096, 1, 1, 1),    # sparse random, few collisions
    (400, 3, 256, 1, 1, 2),     # dense -> heavy entanglement
    (300, 4, 2048, 8, 1, 3),    # high-multiplicity groups (coverage-like)
    (64, 2, 64, 30, 1, 4),      # tiny filter: entanglement + u8 freeze
    (200, 3, 1024, 4, 8, 5),    # u64-width counters
])
def test_conservative_update_batched_matches_sequential(
        n, h, size_bytes, repeat, width, seed):
    hs = _rand_hashes(n, h, seed)
    if repeat > 1:
        ridx = np.tile(np.arange(n), repeat)
        np.random.default_rng(seed + 100).shuffle(ridx)
        hs = u64.U64(hs.hi[ridx], hs.lo[ridx])
    valid = jnp.asarray(
        np.random.default_rng(seed + 7).random(hs.hi.shape[0]) < 0.9)
    cbf0 = counting.create(size_bytes, h, 5, 1, counter_width=width)
    a = counting.insert_sequential(cbf0, hs, valid)
    b = counting.insert(cbf0, hs, valid)
    np.testing.assert_array_equal(np.asarray(a.counters),
                                  np.asarray(b.counters))


@pytest.mark.parametrize("n,h,size_bytes,repeat,width,seed", [
    (500, 3, 4096, 1, 1, 1),    # u8: packed-unsort branch
    (400, 3, 256, 1, 1, 2),     # dense -> heavy entanglement
    (300, 4, 2048, 8, 1, 3),    # high-multiplicity groups
    (64, 2, 64, 30, 1, 4),      # tiny filter: entanglement + u8 freeze
    (300, 3, 4096, 2, 2, 5),    # u16: payload-unsort branch
    (250, 3, 8192, 2, 4, 6),    # u32: payload-unsort, 3-byte deltas
])
def test_conservative_update_kernel_path_matches_sequential(
        n, h, size_bytes, repeat, width, seed):
    """The kernel-routed closed form (windowed gather + weighted
    scatter-add, interpret mode) must stay bit-identical to stream
    order."""
    hs = _rand_hashes(n, h, seed)
    if repeat > 1:
        ridx = np.tile(np.arange(n), repeat)
        np.random.default_rng(seed + 100).shuffle(ridx)
        hs = u64.U64(hs.hi[ridx], hs.lo[ridx])
    valid = jnp.asarray(
        np.random.default_rng(seed + 7).random(hs.hi.shape[0]) < 0.9)
    cbf0 = counting.create(size_bytes, h, 5, 1, counter_width=width)
    a = counting.insert_sequential(cbf0, hs, valid)
    b = counting.insert(cbf0, hs, valid, use_kernel=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.counters),
                                  np.asarray(b.counters))


@pytest.mark.parametrize("n,h,size_bytes,repeat,width,seed", [
    (500, 3, 4096, 1, 1, 1),    # sparse random, few collisions
    (400, 3, 256, 1, 1, 2),     # dense -> heavy entanglement
    (300, 4, 2048, 3, 1, 3),    # duplicate frames -> replay remainder
    (64, 2, 64, 8, 1, 4),       # tiny filter: entanglement + u8 freeze
    (300, 3, 4096, 2, 2, 5),    # u16
])
@pytest.mark.parametrize("use_kernel", [False, True])
def test_conservative_update_ungrouped_matches_sequential(
        n, h, size_bytes, repeat, width, seed, use_kernel):
    """The tier-1 decompose (group_duplicates=False: no group-by-multiset
    sort, duplicates replay) must stay bit-identical to stream order on
    the same streams as the grouped tier, XLA and kernel paths."""
    hs = _rand_hashes(n, h, seed)
    if repeat > 1:
        ridx = np.tile(np.arange(n), repeat)
        np.random.default_rng(seed + 100).shuffle(ridx)
        hs = u64.U64(hs.hi[ridx], hs.lo[ridx])
    valid = jnp.asarray(
        np.random.default_rng(seed + 7).random(hs.hi.shape[0]) < 0.9)
    cbf0 = counting.create(size_bytes, h, 5, 1, counter_width=width)
    a = counting.insert_sequential(cbf0, hs, valid)
    b = counting.insert(cbf0, hs, valid, use_kernel=use_kernel,
                        interpret=use_kernel, group_duplicates=False)
    np.testing.assert_array_equal(np.asarray(a.counters),
                                  np.asarray(b.counters))


def test_conservative_update_kernel_gather_overflow_fallback():
    """Positions spanning many windows per chunk overflow the gather
    window; the kernel path must then recompute via the XLA closed form
    (still exact)."""
    from btl_bloomfilter_tpu.kernels import scatter_or as so

    # 8 windows of u8 counters, 600 frames spread uniformly -> every
    # chunk spans far beyond one window
    size = so.WIN_WORDS * 8 * 4
    hs = _rand_hashes(600, 3, 21)
    cbf0 = counting.create(size, 3, 5, 1, counter_width=1)
    a = counting.insert_sequential(cbf0, hs)
    b = counting.insert(cbf0, hs, use_kernel=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(a.counters),
                                  np.asarray(b.counters))


def test_conservative_update_entangled_overflow_fallback():
    """When more frames are entangled than the replay buffer holds, the
    whole batch must be recomputed sequentially (still exact)."""
    hs = _rand_hashes(300, 3, 11)
    cbf0 = counting.create(128, 3, 5, 1, counter_width=1)
    a = counting.insert_sequential(cbf0, hs)
    b = counting.insert(cbf0, hs, max_entangled=16)
    np.testing.assert_array_equal(np.asarray(a.counters),
                                  np.asarray(b.counters))


# ---------------------------------------------------------------------------
# true uint64 counters: exact past 2**32-1 (dual uint32 planes)
# ---------------------------------------------------------------------------

def _cbf64_with_values(values, h, threshold=1):
    """Width-8 filter whose counter plane is seeded from a numpy uint64
    array (via the serialization path, which is itself under test)."""
    vals = np.asarray(values, dtype="<u8")
    return counting.from_bytes(
        vals.tobytes(), size=len(vals), hash_num=h, kmer_size=5,
        count_threshold=threshold, counter_width=8)


def _cbf64_model(cbf):
    arr = np.asarray(cbf.counters)
    return arr[0].astype(np.uint64) | (arr[1].astype(np.uint64) << np.uint64(32))


def test_cbf64_conservative_update_crosses_2_32():
    h = 2
    base = np.array([(1 << 32) - 1, (1 << 32) - 1, (1 << 33) + 5,
                     7, 0, (1 << 40), 3, 12], dtype=np.uint64)
    cbf = _cbf64_with_values(base, h)
    # frames touching the boundary counters: min of {2^32-1, 2^32-1} -> both
    # increment to exactly 2^32 (carry into the high plane)
    hashes = np.array([[0, 1], [0, 1], [2, 5], [4, 3]], dtype=np.uint64)
    model = base.copy()
    for row in hashes:
        pos = (row % np.uint64(cbf.size)).astype(int)
        mn = model[pos].min()
        if mn == np.uint64(0xFFFFFFFFFFFFFFFF):
            continue
        model[pos] = np.where(model[pos] == mn, mn + np.uint64(1),
                              model[pos])
    a = counting.insert_sequential(cbf, u64.from_numpy(hashes))
    b = counting.insert(cbf, u64.from_numpy(hashes))
    np.testing.assert_array_equal(_cbf64_model(a), model)
    np.testing.assert_array_equal(_cbf64_model(b), model)
    assert model[0] == (1 << 32) + 1  # really crossed the boundary


def test_cbf64_increment_all_carry_and_freeze():
    h = 1
    base = np.array([(1 << 32) - 3, (1 << 48), 0, 5,
                     0xFFFFFFFFFFFFFFFF, 1, 2, 3], dtype=np.uint64)
    cbf = _cbf64_with_values(base, h)
    # 10 occurrences of counter 0 -> crosses into the high plane
    hashes = np.concatenate([np.zeros((10, 1), np.uint64),
                             np.full((4, 1), 1, np.uint64)])
    cbf2 = counting.insert_all(cbf, u64.from_numpy(hashes))
    got = _cbf64_model(cbf2)
    assert got[0] == (1 << 32) + 7
    assert got[1] == (1 << 48) + 4
    assert got[4] == 0xFFFFFFFFFFFFFFFF  # saturated stays put
    # conservative path freezes at 2**64-1 (no wraparound)
    h4 = np.full((3, 1), 4, np.uint64)
    cbf3 = counting.insert(cbf, u64.from_numpy(h4))
    assert _cbf64_model(cbf3)[4] == 0xFFFFFFFFFFFFFFFF


def test_cbf64_min_count_contains_and_roundtrip(tmp_path):
    h = 2
    base = np.array([(1 << 35), (1 << 35) + 9, 6, (1 << 32),
                     0, 0, 1, 2], dtype=np.uint64)
    thr = (1 << 34)
    cbf = _cbf64_with_values(base, h, threshold=thr)
    hashes = np.array([[0, 1], [2, 3], [1, 3]], dtype=np.uint64)
    mc = counting.min_count(cbf, u64.from_numpy(hashes))
    got = np.asarray(mc.lo).astype(np.uint64) | (
        np.asarray(mc.hi).astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, [1 << 35, 6, 1 << 32])
    hits = np.asarray(counting.contains(cbf, u64.from_numpy(hashes)))
    np.testing.assert_array_equal(hits, [True, False, False])
    assert int(counting.pop_count(cbf)) == 6
    # >= 2**34: the two 2**35-scale counters only (2**32 < threshold)
    assert int(counting.filtered_pop_count(cbf)) == 2

    # serialization round-trips the high words exactly
    p = tmp_path / "u64.bf"
    bf_format.store_counting(cbf, str(p))
    back = bf_format.load_counting(str(p), count_threshold=thr)
    assert back.counter_width == 8
    np.testing.assert_array_equal(_cbf64_model(back), base)
    raw = np.frombuffer(p.read_bytes()[-8 * cbf.size:], dtype="<u8")
    np.testing.assert_array_equal(raw, base)


@pytest.mark.parametrize("n", [1, 7, 1000, 1024, 1025, 5000, 262145])
def test_blocked_scan_matches_numpy(n):
    """The two-level Hillis-Steele scan (the associative_scan replacement
    that keeps TPU compiles tractable — docs/PERFORMANCE.md) must match
    numpy accumulate for add/max forward and min reverse."""
    rng = np.random.default_rng(n)
    x = rng.integers(-1000, 1000, size=n).astype(np.int32)
    jx = jnp.asarray(x)
    np.testing.assert_array_equal(
        np.asarray(counting._blocked_scan(jnp.add, jx, 0)), np.cumsum(x))
    np.testing.assert_array_equal(
        np.asarray(counting._blocked_scan(jnp.maximum, jx, -(1 << 31))),
        np.maximum.accumulate(x))
    np.testing.assert_array_equal(
        np.asarray(counting._blocked_scan(jnp.minimum, jx, (1 << 31) - 1,
                                          reverse=True)),
        np.minimum.accumulate(x[::-1])[::-1])


# ---------------------------------------------------------------------------
# round-scheduled entangled replay (counting._replay_schedule)
# ---------------------------------------------------------------------------

def _np_conservative(pos, v, size, dtype=np.uint8):
    """Stream-order numpy oracle of incrementMin
    (CountingBloomFilter.hpp:135-162)."""
    ref = np.zeros(size, dtype)
    top = np.iinfo(dtype).max
    for p, ok in zip(pos, v):
        if not ok:
            continue
        cur = ref[p]
        m = cur.min()
        if m == top:          # overflow freeze
            continue
        upd = cur.copy()
        upd[cur == m] = m + 1
        ref[p] = upd
        # duplicate indices in p write the same value twice (the
        # reference's second CAS fails after the first increments),
        # so last-write-wins matches the single-increment semantics
    return ref


@pytest.mark.parametrize("chain_len", [5, 20, 40])
def test_replay_round_scheduler_chains(chain_len):
    """Dependency chains through shared positions: the round scheduler
    must respect stream order along each chain; chains longer than the
    scheduler's iteration bound (32) must fall back to the sequential
    replay. Also covers an in-frame duplicate position entangled with the
    chain head (no self-edge deadlock)."""
    size = 512
    pos = np.array([[i, i + 1, 200 + (i % 100)] for i in range(chain_len)],
                   np.uint32)
    pos = np.vstack([pos, np.array([[0, 0, 400]], np.uint32)])
    v = np.ones(len(pos), bool)
    v[2] = False                      # one masked frame inside the chain
    ref = _np_conservative(pos, v, size)
    got = counting.insert_positions(
        jnp.zeros(size // 4, jnp.uint32), jnp.asarray(pos),
        jnp.asarray(v), 255, size, 4)
    got_counters = np.frombuffer(
        np.asarray(got).astype("<u4").tobytes(), dtype="<u1")
    np.testing.assert_array_equal(got_counters, ref)


def test_replay_round_scheduler_chains_u64():
    """u64 twin of the chain test (dual uint32 planes)."""
    size = 256
    pos = np.array([[i, i + 1, 100 + i] for i in range(12)], np.uint32)
    v = np.ones(len(pos), bool)
    ref = _np_conservative(pos, v, size, np.uint64)
    lo, hi = counting.insert_positions_u64(
        jnp.zeros(size, jnp.uint32), jnp.zeros(size, jnp.uint32),
        jnp.asarray(pos), jnp.asarray(v), size)
    got = np.asarray(lo).astype(np.uint64) | (
        np.asarray(hi).astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, ref)
