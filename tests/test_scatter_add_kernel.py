"""Interpret-mode tests for the Mosaic saturating histogram-add kernel."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from btl_bloomfilter_tpu.kernels import scatter_add, scatter_or
from btl_bloomfilter_tpu.models import counting
from btl_bloomfilter_tpu.ops import u64


def np_reference(counters, idx, counter_max):
    out = counters.astype(np.uint64)
    np.add.at(out, idx, 1)
    return np.minimum(out, counter_max).astype(counters.dtype)


@pytest.mark.parametrize("width,n,ncounters,seed", [
    (1, 5000, scatter_or.WIN_WORDS * 4, 0),       # u8, one window span
    (2, 4000, scatter_or.WIN_WORDS * 2, 1),       # u16, one window span
    (4, 3000, scatter_or.WIN_WORDS, 2),           # u32, one window span
    (1, 2000, scatter_or.WIN_WORDS * 4 + 64, 3),  # unaligned count
])
def test_kernel_matches_numpy(width, n, ncounters, seed):
    rng = np.random.default_rng(seed)
    dtype = {1: np.uint8, 2: np.uint16, 4: np.uint32}[width]
    counter_max = (1 << (8 * width)) - 1
    counters = rng.integers(0, min(counter_max, 250), size=ncounters
                            ).astype(dtype)
    # heavy duplicates to exercise saturation
    idx = rng.integers(0, ncounters, size=n, dtype=np.uint32)
    idx[:300] = idx[0]
    counters[idx[0]] = counter_max - 5   # will saturate
    expect = np_reference(counters, idx, counter_max)

    per_word = 4 // width
    if per_word > 1:
        words = jnp.asarray(counters.reshape(-1, per_word)).view(None) \
            if False else jax.lax.bitcast_convert_type(
                jnp.asarray(counters).reshape(-1, per_word), jnp.uint32)
    else:
        words = jnp.asarray(counters)
    pos_s = jnp.asarray(np.sort(idx))
    got_w, ovf = scatter_add.scatter_add_sorted(
        words, pos_s, per_word, counter_max, interpret=True)
    assert (np.asarray(ovf) == 0xFFFFFFFF).all()  # single window: no ovf
    if per_word > 1:
        got = np.asarray(jax.lax.bitcast_convert_type(
            got_w, jnp.asarray(counters).dtype)).reshape(-1)
    else:
        got = np.asarray(got_w)
    np.testing.assert_array_equal(got, expect)


def test_kernel_overflow_emitted():
    ncounters = scatter_or.WIN_WORDS * 8
    idx = np.concatenate([
        np.arange(100, dtype=np.uint32),
        np.full(50, ncounters - 3, np.uint32),
    ])
    counters = jnp.zeros(ncounters, jnp.uint32)
    got, ovf = scatter_add.scatter_add_sorted(
        counters, jnp.asarray(np.sort(idx)), 1, 0xFFFFFFFF,
        interpret=True)
    ovf = np.asarray(ovf)
    live = ovf[ovf != 0xFFFFFFFF]
    assert len(live) > 0
    # re-applying the overflow indices reproduces the full histogram
    full = np.zeros(ncounters, np.uint64)
    np.add.at(full, idx, 1)
    out = np.asarray(got).astype(np.uint64)
    np.add.at(out, live, 1)
    np.testing.assert_array_equal(out, full)


def np_weighted_reference(counters, idx, vals, counter_max):
    out = counters.astype(np.uint64)
    np.add.at(out, idx, vals.astype(np.uint64))
    return np.minimum(out, counter_max).astype(counters.dtype)


@pytest.mark.parametrize("width,n,ncounters,seed", [
    (1, 5000, scatter_or.WIN_WORDS * 4, 0),       # u8, one window span
    (2, 4000, scatter_or.WIN_WORDS * 2, 1),       # u16, one window span
    (4, 3000, scatter_or.WIN_WORDS, 2),           # u32, one window span
    (1, 2000, scatter_or.WIN_WORDS * 4 + 64, 3),  # unaligned count
])
def test_weighted_kernel_matches_numpy(width, n, ncounters, seed):
    rng = np.random.default_rng(seed)
    dtype = {1: np.uint8, 2: np.uint16, 4: np.uint32}[width]
    counter_max = (1 << (8 * width)) - 1
    counters = rng.integers(0, min(counter_max, 250),
                            size=ncounters).astype(dtype)
    idx = rng.integers(0, ncounters, size=n, dtype=np.uint32)
    idx[:300] = idx[0]                        # duplicates sum
    vmax = min(counter_max, (1 << 24) - 1)
    vals = rng.integers(0, min(vmax, 300), size=n, dtype=np.uint32)
    vals[1000:1200] = 0                       # zero increments are no-ops
    counters[idx[0]] = counter_max - 5        # will saturate
    expect = np_weighted_reference(counters, idx, vals, counter_max)

    per_word = 4 // width
    if per_word > 1:
        words = jax.lax.bitcast_convert_type(
            jnp.asarray(counters).reshape(-1, per_word), jnp.uint32)
    else:
        words = jnp.asarray(counters)
    order = np.argsort(idx)
    got_w, ovf = scatter_add.scatter_add_weighted_sorted(
        words, jnp.asarray(idx[order]), jnp.asarray(vals[order]),
        per_word, counter_max, interpret=True)
    assert (np.asarray(ovf) == 0xFFFFFFFF).all()  # single window: no ovf
    if per_word > 1:
        got = np.asarray(jax.lax.bitcast_convert_type(
            got_w, jnp.asarray(counters).dtype)).reshape(-1)
    else:
        got = np.asarray(got_w)
    np.testing.assert_array_equal(got, expect)


def test_weighted_kernel_overflow_emitted():
    ncounters = scatter_or.WIN_WORDS * 8
    idx = np.concatenate([
        np.arange(100, dtype=np.uint32),
        np.full(50, ncounters - 3, np.uint32),
    ])
    vals = np.arange(1, len(idx) + 1, dtype=np.uint32)
    order = np.argsort(idx, kind="stable")
    counters = jnp.zeros(ncounters, jnp.uint32)
    got, ovf = scatter_add.scatter_add_weighted_sorted(
        counters, jnp.asarray(idx[order]), jnp.asarray(vals[order]), 1,
        0xFFFFFFFF, interpret=True)
    ovf = np.asarray(ovf)
    live = ovf != 0xFFFFFFFF
    assert live.sum() > 0
    # re-applying the overflow (position, value) pairs -> full histogram
    full = np.zeros(ncounters, np.uint64)
    np.add.at(full, idx, vals.astype(np.uint64))
    out = np.asarray(got).astype(np.uint64)
    np.add.at(out, ovf[live], vals[order][live].astype(np.uint64))
    np.testing.assert_array_equal(out, full)


@pytest.mark.parametrize("width", [1, 2, 4, 8])
def test_insert_all_kernel_path_matches_xla(width):
    rng = np.random.default_rng(7)
    per_word = {1: 4, 2: 2, 4: 1, 8: 1}[width]
    size_bytes = scatter_or.WIN_WORDS * 4 * per_word * width
    cbf = counting.create(size_bytes, 4, 15, 1, counter_width=width)
    hashes = u64.U64(
        jnp.asarray(rng.integers(0, 1 << 32, size=(80, 6, 4),
                                 dtype=np.uint32)),
        jnp.asarray(rng.integers(0, 1 << 32, size=(80, 6, 4),
                                 dtype=np.uint32)))
    # duplicate frames to force repeated counters
    hashes = u64.U64(hashes.hi.at[40:].set(hashes.hi[:40]),
                     hashes.lo.at[40:].set(hashes.lo[:40]))
    valid = jnp.asarray(rng.random((80, 6)) < 0.9)

    ref = counting.insert_all(cbf, hashes, valid, use_kernel=False)
    orig = scatter_add.scatter_add_sorted
    try:
        scatter_add.scatter_add_sorted = functools.partial(
            orig, interpret=True)
        got = counting.insert_all(cbf, hashes, valid, use_kernel=True)
    finally:
        scatter_add.scatter_add_sorted = orig
    np.testing.assert_array_equal(np.asarray(ref.counters),
                                  np.asarray(got.counters))
