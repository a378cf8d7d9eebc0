"""Ring-buffered scatter-OR kernel (kernels/scatter_ring.py) vs the XLA
scatter path, in interpret mode.

This is the DEFAULT TPU insert kernel behind bloom.insert (the TPU
replacement for the reference's atomic scatter-OR,
/root/reference/BloomFilter.hpp:185-194), so it gets the full scatter_or
test matrix plus ring-specific adversarial cases: window gaps larger than
the ring, chunk windows that advance by more than S slots, trailing
all-sentinel chunks, unaligned word counts, and the bloom-level overflow
fallback."""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from btl_bloomfilter_tpu.kernels import scatter_ring
from btl_bloomfilter_tpu.models import bloom
from btl_bloomfilter_tpu.ops.u64 import U64

SENT = np.uint32(0xFFFFFFFF)
WIN_BITS = scatter_ring.NWIN * scatter_ring.SLOT_WORDS * 32
SLOT_BITS = scatter_ring.SLOT_WORDS * 32


def xla_reference(words, pos_sorted):
    keep = jnp.ones(pos_sorted.shape, bool).at[1:].set(
        pos_sorted[1:] != pos_sorted[:-1])
    keep = keep & (pos_sorted != jnp.uint32(SENT))
    return words | bloom.sorted_delta_words(pos_sorted, keep, words.shape[0])


def dedup_sorted(pos, pad_to=None):
    pos = np.sort(pos)
    keep = np.ones(len(pos), bool)
    keep[1:] = pos[1:] != pos[:-1]
    n = pad_to if pad_to is not None else len(pos)
    out = np.full(n, SENT, np.uint32)
    out[: keep.sum()] = pos[keep]
    return out


KERNELS = [scatter_ring.scatter_or_sorted,
           scatter_ring.scatter_or_sorted_inplace]


def run_and_check(words, pos, pos_for_base=None, expect_overflow=None,
                  kernel=None):
    """Run the kernel(s) in interpret mode; assert equality with the XLA
    scatter (directly when no overflow, after the idempotent re-apply
    when overflow fired, mirroring bloom.insert's fallback)."""
    if kernel is None:
        over = None
        for k in KERNELS:
            over = run_and_check(words, pos, pos_for_base, expect_overflow,
                                 kernel=k)
        return over
    expect = np.asarray(xla_reference(words, jnp.asarray(pos)))
    got, overflow = kernel(
        words, jnp.asarray(pos),
        pos_for_base=None if pos_for_base is None else jnp.asarray(
            pos_for_base),
        interpret=True)
    if expect_overflow is not None:
        assert (int(overflow) > 0) == expect_overflow, int(overflow)
    if int(overflow) == 0:
        np.testing.assert_array_equal(np.asarray(got), expect)
    else:
        got2 = xla_reference(got, jnp.asarray(pos))
        np.testing.assert_array_equal(np.asarray(got2), expect)
    return int(overflow)


@pytest.mark.parametrize("n,size_bits,seed", [
    (2000, WIN_BITS * 4, 0),          # uniform over 4 windows, 2 chunks
    (5000, WIN_BITS, 1),              # everything inside one window span
    (700, WIN_BITS * 8, 2),           # sparse
    (900, WIN_BITS + 64 * 37, 3),     # unaligned word count (padded)
    (300, 64 * 11, 4),                # tiny filter (padded up to a window)
    (4096, WIN_BITS * 2 + 64 * 5, 5),  # exactly chunk-multiple n, unaligned
])
def test_ring_matches_xla(n, size_bits, seed):
    rng = np.random.default_rng(seed)
    pos = dedup_sorted(rng.integers(0, size_bits, size=n, dtype=np.uint32))
    nwords = (size_bits + 31) // 32
    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords,
                                     dtype=np.uint32))
    run_and_check(words, pos)


def test_ring_interleaved_sentinels_with_base_array():
    """Production insert path: duplicates become sentinels *in place* (the
    array is no longer monotone) and window bases come from the pre-dedupe
    sorted array via pos_for_base."""
    rng = np.random.default_rng(7)
    size_bits = WIN_BITS  # one window covers the filter -> no overflow
    nwords = size_bits // 32
    raw = rng.integers(0, size_bits, size=4096, dtype=np.uint32)
    raw[50:60] = raw[49]                      # duplicate run
    raw[1024:1030] = raw[1023]                # duplicate run across a chunk
    pos_s = np.sort(raw)
    keep = np.ones(len(pos_s), bool)
    keep[1:] = pos_s[1:] != pos_s[:-1]
    pos_d = np.where(keep, pos_s, SENT).astype(np.uint32)

    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords,
                                     dtype=np.uint32))
    expect = np.asarray(
        words | bloom.sorted_delta_words(jnp.asarray(pos_s),
                                         jnp.asarray(keep), nwords))
    for kernel in KERNELS:
        got, overflow = kernel(
            words, jnp.asarray(pos_d), pos_for_base=jnp.asarray(pos_s),
            interpret=True)
        assert int(overflow) == 0
        np.testing.assert_array_equal(np.asarray(got), expect)


def test_ring_gap_larger_than_ring():
    """Consecutive chunks whose windows jump by far more than S slots: the
    flush loop must skip the untouched gap slots (st[_LO] jumps to s0) and
    the zero loop must not wrap stale buffers in."""
    S, NWIN = scatter_ring.S, scatter_ring.NWIN
    gap_slots = 3 * S + NWIN + 5
    nslots = 3 * gap_slots + NWIN + 2
    nwords = nslots * scatter_ring.SLOT_WORDS
    rng = np.random.default_rng(11)
    deduped, predupe = [], []
    for i in range(3):
        # each cluster fills exactly one chunk and spans <= 1 slot, so its
        # window always covers it; dedupe in place (sentinels stay put)
        base = i * gap_slots * SLOT_BITS
        chunk = np.sort(rng.integers(base, base + SLOT_BITS,
                                     size=scatter_ring.CHUNK,
                                     dtype=np.uint32))
        predupe.append(chunk)
        keep = np.ones(len(chunk), bool)
        keep[1:] = chunk[1:] != chunk[:-1]
        deduped.append(np.where(keep, chunk, SENT).astype(np.uint32))
    pos_d = np.concatenate(deduped)
    pos_base = np.concatenate(predupe)
    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords,
                                     dtype=np.uint32))
    run_and_check(words, pos_d, pos_for_base=pos_base,
                  expect_overflow=False)


def test_ring_advance_by_more_than_s_slots_within_stream():
    """Every chunk's window starts >S slots after the previous one, so no
    slot is ever shared between chunks and all S ring buffers recycle."""
    S = scatter_ring.S
    nchunks = 4
    stride_slots = S + 3
    nslots = nchunks * stride_slots + scatter_ring.NWIN
    nwords = nslots * scatter_ring.SLOT_WORDS
    rng = np.random.default_rng(13)
    deduped, predupe = [], []
    for i in range(nchunks):
        base = i * stride_slots * SLOT_BITS
        chunk = np.sort(rng.integers(base, base + SLOT_BITS,
                                     size=scatter_ring.CHUNK,
                                     dtype=np.uint32))
        predupe.append(chunk)
        # dedupe within the chunk, keeping in-place sentinels so chunk
        # boundaries stay exactly CHUNK apart
        keep = np.ones(len(chunk), bool)
        keep[1:] = chunk[1:] != chunk[:-1]
        deduped.append(np.where(keep, chunk, SENT).astype(np.uint32))
    pos_d = np.concatenate(deduped)
    pos_base = np.concatenate(predupe)  # pre-dedupe sorted array
    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords,
                                     dtype=np.uint32))
    expect = np.asarray(xla_reference(words, jnp.asarray(pos_d)))
    for kernel in KERNELS:
        got, overflow = kernel(
            words, jnp.asarray(pos_d), pos_for_base=jnp.asarray(pos_base),
            interpret=True)
        assert int(overflow) == 0
        np.testing.assert_array_equal(np.asarray(got), expect)


def test_ring_trailing_all_sentinel_chunks():
    """Heavy sentinel padding: the last chunks contain no live position;
    their window slot inherits the running max and the tail flush must
    still write every resident slot exactly once."""
    rng = np.random.default_rng(17)
    size_bits = WIN_BITS * 2
    # live positions fit one window span so the single live chunk cannot
    # overflow; everything after it is sentinel-only chunks
    live = rng.integers(0, WIN_BITS, size=500, dtype=np.uint32)
    pos = dedup_sorted(live, pad_to=4 * scatter_ring.CHUNK)
    words = jnp.asarray(rng.integers(0, 1 << 32, size=size_bits // 32,
                                     dtype=np.uint32))
    run_and_check(words, pos, expect_overflow=False)


def test_ring_leading_all_sentinel_chunk():
    """A batch whose first chunk is entirely sentinels (valid=False head):
    s0 for that chunk is 0 by construction."""
    rng = np.random.default_rng(19)
    size_bits = WIN_BITS * 2
    live = np.sort(rng.integers(size_bits // 2, size_bits, size=800,
                                dtype=np.uint32))
    keep = np.ones(len(live), bool)
    keep[1:] = live[1:] != live[:-1]
    live = live[keep]
    pos = np.full(2 * scatter_ring.CHUNK, SENT, np.uint32)
    pos[scatter_ring.CHUNK: scatter_ring.CHUNK + len(live)] = live
    pos[scatter_ring.CHUNK + len(live):] = SENT
    # pos is sorted except sentinels lead; the production contract is
    # sorted-with-sentinels-last, so emulate via pos_for_base trick:
    # sentinels first sort as 0xFFFFFFFF LAST normally -- here we check
    # the kernel handles an all-sentinel chunk mid-contract by sorting.
    pos = np.sort(pos)
    pos = dedup_sorted(pos[pos != SENT], pad_to=2 * scatter_ring.CHUNK)
    words = jnp.asarray(rng.integers(0, 1 << 32, size=size_bits // 32,
                                     dtype=np.uint32))
    run_and_check(words, pos, expect_overflow=False)


def test_ring_overflow_detected():
    """Positions clustered far apart inside one chunk overflow the window;
    the idempotent XLA re-apply completes the job."""
    nwords = scatter_ring.NWIN * scatter_ring.SLOT_WORDS * 8
    size_bits = nwords * 32
    pos = np.concatenate([
        np.arange(100, dtype=np.uint32),
        np.arange(size_bits - 100, size_bits, dtype=np.uint32),
    ])
    pos = dedup_sorted(pos)
    words = jnp.zeros(nwords, jnp.uint32)
    over = run_and_check(words, pos, expect_overflow=True)
    assert over > 0


def test_bloom_insert_ring_path_and_overflow_fallback():
    """bloom.insert(use_kernel=True) through scatter_ring in interpret
    mode equals the XLA path, both on a uniform batch (no overflow) and on
    a batch engineered to overflow the window (fallback cond fires)."""
    rng = np.random.default_rng(23)
    size = WIN_BITS * 8
    bf = bloom.create(size, 4, 31)

    def patched_insert(bf, hashes, valid):
        # bloom.insert's kernel path calls scatter_or_sorted_inplace
        orig = scatter_ring.scatter_or_sorted_inplace
        try:
            scatter_ring.scatter_or_sorted_inplace = functools.partial(
                orig, interpret=True)
            return bloom.insert(bf, hashes, valid, use_kernel=True)
        finally:
            scatter_ring.scatter_or_sorted_inplace = orig

    # uniform batch: 2048 positions over 8 windows -> chunk span ~4 windows
    # of bits each... large spread WILL overflow; make a tight batch first
    lo = jnp.asarray(np.sort(rng.integers(0, WIN_BITS // 2, size=(2048,),
                                          dtype=np.uint32)).reshape(64, 8, 4))
    hashes = U64(jnp.zeros((64, 8, 4), jnp.uint32), lo)
    valid = jnp.asarray(rng.random((64, 8)) < 0.9)
    ref = bloom.insert(bf, hashes, valid, use_kernel=False)
    got = patched_insert(bf, hashes, valid)
    np.testing.assert_array_equal(np.asarray(ref.words),
                                  np.asarray(got.words))

    # overflow batch: positions spread across the whole filter in each
    # chunk -> guaranteed window overflow -> fallback branch
    lo2 = jnp.asarray(rng.integers(0, size, size=(64, 8, 4),
                                   dtype=np.uint32))
    hashes2 = U64(jnp.zeros((64, 8, 4), jnp.uint32), lo2)
    ref2 = bloom.insert(bf, hashes2, valid, use_kernel=False)
    got2 = patched_insert(bf, hashes2, valid)
    np.testing.assert_array_equal(np.asarray(ref2.words),
                                  np.asarray(got2.words))
