"""Pipelined static-window scatter-OR kernel vs the XLA path (interpret)."""

import functools

import numpy as np
import jax.numpy as jnp
import pytest

from btl_bloomfilter_tpu.kernels import scatter_windows as sw
from btl_bloomfilter_tpu.models import bloom


def xla_reference(words, pos_sorted):
    keep = jnp.ones(pos_sorted.shape, bool).at[1:].set(
        pos_sorted[1:] != pos_sorted[:-1])
    keep = keep & (pos_sorted != jnp.uint32(0xFFFFFFFF))
    return words | bloom.sorted_delta_words(pos_sorted, keep, words.shape[0])


@pytest.mark.parametrize("n,size_bits,seed", [
    (4000, sw.WIN_WORDS * 32 * 4, 0),      # multi-window uniform
    (5000, sw.WIN_WORDS * 32, 1),          # dense single window
    (700, sw.WIN_WORDS * 32 * 8, 2),       # sparse
    (900, sw.WIN_WORDS * 32 + 64 * 37, 3),  # unaligned word count
    (300, 64 * 11, 4),                     # tiny filter (padded up)
])
def test_window_kernel_matches_xla(n, size_bits, seed):
    rng = np.random.default_rng(seed)
    pos = np.sort(rng.integers(0, size_bits, size=n, dtype=np.uint32))
    nwords = size_bits // 32
    slots = sw.slots_needed(n, nwords)
    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords,
                                     dtype=np.uint32))
    expect = np.asarray(xla_reference(words, jnp.asarray(pos)))
    got, overflow = sw.scatter_or_windows(words, jnp.asarray(pos),
                                          slots=slots, interpret=True)
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_window_kernel_duplicate_runs_and_sentinels():
    rng = np.random.default_rng(7)
    size_bits = sw.WIN_WORDS * 32 * 2
    nwords = size_bits // 32
    raw = rng.integers(0, size_bits, size=4000, dtype=np.uint32)
    raw[50:80] = raw[49]       # duplicate run
    raw[2000:2010] = raw[1999]
    pos = np.sort(raw)
    pos = np.concatenate([pos, np.full(96, 0xFFFFFFFF, np.uint32)])
    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords,
                                     dtype=np.uint32))
    expect = np.asarray(xla_reference(words, jnp.asarray(pos)))
    got, overflow = sw.scatter_or_windows(words, jnp.asarray(pos),
                                          slots=4, interpret=True)
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_window_kernel_overflow_detected():
    # a window receiving more positions than slots*CHUNK must flag overflow
    size_bits = sw.WIN_WORDS * 32 * 8
    nwords = size_bits // 32
    pos = np.sort(np.arange(4 * sw.CHUNK, dtype=np.uint32) % 512)
    got, overflow = sw.scatter_or_windows(jnp.zeros(nwords, jnp.uint32),
                                          jnp.asarray(pos), slots=3,
                                          interpret=True)
    assert bool(overflow)


def test_insert_window_kernel_path_matches_xla_path():
    """bloom.insert(use_kernel=True, interpret via CPU) == use_kernel=False."""
    rng = np.random.default_rng(3)
    size = sw.WIN_WORDS * 32
    bf = bloom.create(size, 4, 31)
    from btl_bloomfilter_tpu.ops.u64 import U64
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=(64, 8, 4),
                                  dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(64, 8, 4),
                                  dtype=np.uint32))
    hashes = U64(hi, lo)
    valid = jnp.asarray(rng.random((64, 8)) < 0.9)

    ref = bloom.insert(bf, hashes, valid, use_kernel=False)
    orig = sw.scatter_or_windows
    try:
        sw.scatter_or_windows = functools.partial(orig, interpret=True)
        got = bloom.insert(bf, hashes, valid, use_kernel=True)
    finally:
        sw.scatter_or_windows = orig
    np.testing.assert_array_equal(np.asarray(ref.words), np.asarray(got.words))
