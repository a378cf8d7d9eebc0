"""Interpret-mode tests for the Mosaic windowed gather kernel."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btl_bloomfilter_tpu.kernels import gather_words, scatter_or
from btl_bloomfilter_tpu.models import bloom
from btl_bloomfilter_tpu.ops.u64 import U64


def expected_windows(pos, nwords_padded):
    """Replicate the wrapper's per-chunk window bases in numpy; return the
    in-window mask per position."""
    C, W = scatter_or.CHUNK, scatter_or.WIN_WORDS
    wlo = 128
    npad = -len(pos) % C
    p = np.concatenate([pos, np.full(npad, 0xFFFFFFFF, np.uint32)])
    first = p[::C]
    base = np.where(first == 0xFFFFFFFF, 0,
                    first >> np.uint32(5)).astype(np.int64)
    base = np.minimum(base & ~np.int64(wlo - 1), nwords_padded - W)
    base = np.maximum(base, 0)
    local = (p.astype(np.int64) >> 5) - np.repeat(base, C)
    in_win = (p != 0xFFFFFFFF) & (local >= 0) & (local < W)
    return in_win[:len(pos)]


@pytest.mark.parametrize("n,size_bits,seed", [
    (2000, scatter_or.WIN_WORDS * 32 * 4, 0),        # uniform, few chunks
    (5000, scatter_or.WIN_WORDS * 32, 1),            # one window span
    (700, scatter_or.WIN_WORDS * 32 * 8, 2),         # sparse (overflows)
    (900, scatter_or.WIN_WORDS * 32 + 64 * 37, 3),   # unaligned word count
    (300, 64 * 11, 4),                               # tiny filter (padded)
])
def test_gather_matches_xla(n, size_bits, seed):
    rng = np.random.default_rng(seed)
    nwords = (size_bits + 31) // 32
    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords,
                                     dtype=np.uint32))
    pos = np.sort(rng.integers(0, size_bits, size=n, dtype=np.uint32))
    # duplicates allowed for a gather
    pos[10:14] = pos[9]
    pos = np.sort(pos)

    nwords_padded = nwords + max(-nwords % 128,
                                 scatter_or.WIN_WORDS - nwords)
    nwords_padded += -nwords_padded % 128
    in_win = expected_windows(pos, nwords_padded)
    expect = np.where(in_win, np.asarray(words)[pos >> 5], 0)

    vals, over = gather_words.gather_words_sorted(
        words, jnp.asarray(pos), interpret=True)
    assert int(over) == int((~in_win).sum())
    np.testing.assert_array_equal(np.asarray(vals), expect)


def test_gather_sentinels_yield_zero():
    nwords = scatter_or.WIN_WORDS
    words = jnp.asarray(
        np.random.default_rng(0).integers(1, 1 << 32, size=nwords,
                                          dtype=np.uint32))
    pos = np.full(1500, 0xFFFFFFFF, np.uint32)
    pos[:10] = np.arange(10, dtype=np.uint32) * 32
    vals, over = gather_words.gather_words_sorted(
        words, jnp.asarray(pos), interpret=True)
    assert int(over) == 0
    np.testing.assert_array_equal(np.asarray(vals[:10]),
                                  np.asarray(words)[:10])
    assert (np.asarray(vals[10:]) == 0).all()


def test_gather_overflow_detected():
    # two clusters farther apart than one window inside one chunk
    nwords = scatter_or.WIN_WORDS * 8
    size_bits = nwords * 32
    pos = np.concatenate([
        np.arange(100, dtype=np.uint32),
        np.full(100, size_bits - 64, np.uint32),
    ])
    words = jnp.ones(nwords, jnp.uint32)
    vals, over = gather_words.gather_words_sorted(
        words, jnp.asarray(np.sort(pos)), interpret=True)
    assert int(over) > 0


def test_mibf_at_rank_kernel_matches_xla_path():
    from btl_bloomfilter_tpu.models import mibf

    rng = np.random.default_rng(7)
    size = scatter_or.WIN_WORDS * 32  # smallest kernel-eligible bv
    nwords = size // 32
    bv = jnp.asarray(rng.integers(0, 1 << 32, size=nwords, dtype=np.uint32))
    m = mibf.freeze(bv, size, hash_num=4, kmer_size=21, data_width=2)
    hashes = U64(
        jnp.asarray(rng.integers(0, 1 << 32, size=(20, 9, 4),
                                 dtype=np.uint32)),
        jnp.asarray(rng.integers(0, 1 << 32, size=(20, 9, 4),
                                 dtype=np.uint32)))

    rank_ref, hit_ref = mibf.at_rank(m, hashes, use_kernel=False)
    orig = gather_words.gather_words_pair_sorted
    try:
        gather_words.gather_words_pair_sorted = functools.partial(
            orig, interpret=True)
        rank_k, hit_k = mibf.at_rank(m, hashes, use_kernel=True)
    finally:
        gather_words.gather_words_pair_sorted = orig
    np.testing.assert_array_equal(np.asarray(hit_ref), np.asarray(hit_k))
    np.testing.assert_array_equal(np.asarray(rank_ref), np.asarray(rank_k))


def test_gather_pair_matches_two_singles():
    rng = np.random.default_rng(13)
    nwords = scatter_or.WIN_WORDS + 64 * 5   # unaligned word count
    size_bits = nwords * 32
    wa = jnp.asarray(rng.integers(0, 1 << 32, size=nwords, dtype=np.uint32))
    wb = jnp.asarray(rng.integers(0, 1 << 32, size=nwords, dtype=np.uint32))
    pos = np.sort(rng.integers(0, size_bits, size=3000, dtype=np.uint32))
    va, vb, over = gather_words.gather_words_pair_sorted(
        wa, wb, jnp.asarray(pos), interpret=True)
    ra, over_a = gather_words.gather_words_sorted(
        wa, jnp.asarray(pos), interpret=True)
    rb, over_b = gather_words.gather_words_sorted(
        wb, jnp.asarray(pos), interpret=True)
    assert int(over) == int(over_a) == int(over_b)
    np.testing.assert_array_equal(np.asarray(va), np.asarray(ra))
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(rb))


@pytest.mark.parametrize("width", [1, 2, 4])
def test_counting_min_count_kernel_matches_xla_path(width):
    from btl_bloomfilter_tpu.models import counting

    rng = np.random.default_rng(11)
    per = {1: 4, 2: 2, 4: 1}[width]
    size_bytes = scatter_or.WIN_WORDS * 4 * per * width  # one window of words
    cbf = counting.create(size_bytes, 5, 8, 1, counter_width=width)
    maxv = min(cbf.counter_max, 200)
    np_dt = {1: "<u1", 2: "<u2", 4: "<u4"}[width]
    vals = rng.integers(0, maxv, size=cbf.size).astype(np_dt)
    cbf = counting.from_bytes(
        vals.tobytes(), size=cbf.size, hash_num=cbf.hash_num,
        kmer_size=cbf.kmer_size, count_threshold=cbf.count_threshold,
        counter_width=width)
    hashes = U64(
        jnp.asarray(rng.integers(0, 1 << 32, size=(37, 5),
                                 dtype=np.uint32)),
        jnp.asarray(rng.integers(0, 1 << 32, size=(37, 5),
                                 dtype=np.uint32)))

    ref = counting.min_count(cbf, hashes, use_kernel=False)
    orig = gather_words.gather_words_sorted
    try:
        gather_words.gather_words_sorted = functools.partial(
            orig, interpret=True)
        got = counting.min_count(cbf, hashes, use_kernel=True)
    finally:
        gather_words.gather_words_sorted = orig
    assert got.dtype == ref.dtype
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_counting_min_count_u64_ignores_kernel_flag():
    """Dual-plane u64 filters take the XLA dual gather regardless of
    use_kernel (no packed uint32 view exists); results are exact 64-bit
    limb pairs, incl. high words past 2**32."""
    from btl_bloomfilter_tpu.models import counting

    rng = np.random.default_rng(12)
    vals = rng.integers(0, 1 << 40, size=64, dtype=np.uint64)
    cbf = counting.from_bytes(
        vals.astype("<u8").tobytes(), size=64, hash_num=3, kmer_size=8,
        count_threshold=1, counter_width=8)
    hashes = U64(
        jnp.asarray(rng.integers(0, 1 << 32, size=(23, 3),
                                 dtype=np.uint32)),
        jnp.asarray(rng.integers(0, 1 << 32, size=(23, 3),
                                 dtype=np.uint32)))
    a = counting.min_count(cbf, hashes, use_kernel=False)
    b = counting.min_count(cbf, hashes, use_kernel=True)
    np.testing.assert_array_equal(np.asarray(a.lo), np.asarray(b.lo))
    np.testing.assert_array_equal(np.asarray(a.hi), np.asarray(b.hi))
    pos = np.stack([(h % np.uint64(64)).astype(int)
                    for h in (np.asarray(hashes.hi, np.uint64) << np.uint64(32))
                    | np.asarray(hashes.lo, np.uint64)])
    model = vals[pos].min(axis=-1)
    got = np.asarray(a.lo).astype(np.uint64) | (
        np.asarray(a.hi).astype(np.uint64) << np.uint64(32))
    np.testing.assert_array_equal(got, model)


def test_contains_kernel_path_matches_xla_path():
    rng = np.random.default_rng(5)
    size = scatter_or.WIN_WORDS * 32  # smallest kernel-eligible filter
    bf = bloom.create(size, 4, 31)
    hashes = U64(
        jnp.asarray(rng.integers(0, 1 << 32, size=(48, 6, 4),
                                 dtype=np.uint32)),
        jnp.asarray(rng.integers(0, 1 << 32, size=(48, 6, 4),
                                 dtype=np.uint32)))
    bf = bloom.insert(bf, U64(hashes.hi[:24], hashes.lo[:24]),
                      use_kernel=False)

    ref = bloom.contains(bf, hashes, use_kernel=False)
    orig = gather_words.gather_words_sorted
    try:
        gather_words.gather_words_sorted = functools.partial(
            orig, interpret=True)
        got = bloom.contains(bf, hashes, use_kernel=True)
    finally:
        gather_words.gather_words_sorted = orig
    assert bool(jnp.all(ref[:24]))
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))
