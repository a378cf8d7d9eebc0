"""MXU-histogram scatter kernel vs the XLA scatter path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from btl_bloomfilter_tpu.kernels import scatter_or


from btl_bloomfilter_tpu.models import bloom


def xla_reference(words, pos_sorted):
    keep = jnp.ones(pos_sorted.shape, bool).at[1:].set(
        pos_sorted[1:] != pos_sorted[:-1])
    keep = keep & (pos_sorted != jnp.uint32(0xFFFFFFFF))
    return words | bloom.sorted_delta_words(pos_sorted, keep, words.shape[0])


def dedup_sorted(pos):
    pos = np.sort(pos)
    keep = np.ones(len(pos), bool)
    keep[1:] = pos[1:] != pos[:-1]
    out = np.full(len(pos), 0xFFFFFFFF, np.uint32)
    out[: keep.sum()] = pos[keep]
    return out


@pytest.mark.parametrize("n,size_bits,seed", [
    (2000, scatter_or.WIN_WORDS * 32 * 4, 0),   # uniform, few chunks
    (5000, scatter_or.WIN_WORDS * 32, 1),       # all within one window span
    (700, scatter_or.WIN_WORDS * 32 * 8, 2),    # sparse
    (900, scatter_or.WIN_WORDS * 32 + 64 * 37, 3),   # unaligned word count
    (300, 64 * 11, 4),                          # tiny filter (padded up)
])
def test_kernel_matches_xla(n, size_bits, seed):
    rng = np.random.default_rng(seed)
    pos = dedup_sorted(rng.integers(0, size_bits, size=n, dtype=np.uint32))
    nwords = size_bits // 32
    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords, dtype=np.uint32))

    expect = np.asarray(xla_reference(words, jnp.asarray(pos)))
    got, overflow = scatter_or.scatter_or_sorted(words, jnp.asarray(pos),
                                                 interpret=True)
    if int(overflow) == 0:
        np.testing.assert_array_equal(np.asarray(got), expect)
    else:
        # overflow fallback: re-applying everything must reach the target
        got2 = xla_reference(got, jnp.asarray(pos))
        np.testing.assert_array_equal(np.asarray(got2), expect)


def test_kernel_interleaved_sentinels_with_base_array():
    """Production insert path: duplicates become sentinels *in place* (the
    array is no longer monotone), and window bases come from the pre-dedupe
    sorted array via pos_for_base."""
    rng = np.random.default_rng(7)
    # one window covers the whole filter -> deterministically no overflow
    size_bits = scatter_or.WIN_WORDS * 32
    nwords = size_bits // 32
    raw = rng.integers(0, size_bits, size=4096, dtype=np.uint32)
    raw[50:60] = raw[49]  # force duplicate runs
    pos_s = np.sort(raw)
    keep = np.ones(len(pos_s), bool)
    keep[1:] = pos_s[1:] != pos_s[:-1]
    pos_d = np.where(keep, pos_s, np.uint32(0xFFFFFFFF)).astype(np.uint32)

    words = jnp.asarray(rng.integers(0, 1 << 32, size=nwords, dtype=np.uint32))
    expect = np.asarray(
        words | bloom.sorted_delta_words(jnp.asarray(pos_s),
                                         jnp.asarray(keep), nwords))
    got, overflow = scatter_or.scatter_or_sorted(
        words, jnp.asarray(pos_d), pos_for_base=jnp.asarray(pos_s),
        interpret=True)
    assert int(overflow) == 0
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_kernel_overflow_detected():
    # adversarial: positions clustered far apart inside one chunk
    nwords = scatter_or.WIN_WORDS * 8
    size_bits = nwords * 32
    pos = np.concatenate([
        np.arange(100, dtype=np.uint32),                      # low cluster
        np.arange(size_bits - 100, size_bits, dtype=np.uint32),  # high
    ])
    pos = dedup_sorted(pos)
    words = jnp.zeros(nwords, jnp.uint32)
    got, overflow = scatter_or.scatter_or_sorted(words, jnp.asarray(pos),
                                                 interpret=True)
    assert int(overflow) > 0
    # fallback completes the job
    final = xla_reference(got, jnp.asarray(pos))
    expect = np.asarray(xla_reference(words, jnp.asarray(pos)))
    np.testing.assert_array_equal(np.asarray(final), expect)


def test_insert_kernel_path_matches_xla_path():
    """bloom.insert(use_kernel=True, interpret via CPU) == use_kernel=False.

    bloom.insert routes through scatter_ring.scatter_or_sorted_inplace
    (the default TPU insert kernel); patch THAT entry point, not the
    superseded scatter_or / delta-ring variants."""
    import functools
    from btl_bloomfilter_tpu.kernels import scatter_ring
    rng = np.random.default_rng(3)
    size = scatter_ring.NWIN * scatter_ring.SLOT_WORDS * 32
    bf = bloom.create(size, 4, 31)
    from btl_bloomfilter_tpu.ops.u64 import U64
    hi = jnp.asarray(rng.integers(0, 1 << 32, size=(64, 8, 4),
                                  dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 1 << 32, size=(64, 8, 4),
                                  dtype=np.uint32))
    hashes = U64(hi, lo)
    valid = jnp.asarray(rng.random((64, 8)) < 0.9)

    ref = bloom.insert(bf, hashes, valid, use_kernel=False)
    orig = scatter_ring.scatter_or_sorted_inplace
    try:
        scatter_ring.scatter_or_sorted_inplace = functools.partial(
            orig, interpret=True)
        got = bloom.insert(bf, hashes, valid, use_kernel=True)
    finally:
        scatter_ring.scatter_or_sorted_inplace = orig
    np.testing.assert_array_equal(np.asarray(ref.words), np.asarray(got.words))
