"""Fused ntHash scan kernel (kernels/nthash_scan.py) vs the XLA
prefix-scan path (itself golden-verified against the compiled reference
in test_nthash_golden.py), in interpret mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from btl_bloomfilter_tpu.kernels import nthash_scan
from btl_bloomfilter_tpu.ops import nthash


def check(codes, k, h):
    ref = nthash.hash_frames(jnp.asarray(codes), k, h)
    hashes, strand, valid = nthash_scan.hash_frames_planes_kernel(
        jnp.asarray(codes), k, h, interpret=True)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(strand),
                                  np.asarray(ref.strand))
    np.testing.assert_array_equal(
        np.asarray(hashes.hi), np.moveaxis(np.asarray(ref.hashes.hi), -1, 0))
    np.testing.assert_array_equal(
        np.asarray(hashes.lo), np.moveaxis(np.asarray(ref.hashes.lo), -1, 0))


@pytest.mark.parametrize("B,L,k,h,nfrac,seed", [
    (8, 300, 31, 4, 0.1, 0),     # L not a multiple of 128, with Ns
    (8, 256, 31, 4, 0.0, 1),     # L exactly block-multiple
    (16, 130, 5, 3, 0.3, 2),     # tiny k, N-heavy
    (8, 128, 128, 2, 0.0, 3),    # k == LANES (max supported), W == 1
    (8, 64, 33, 5, 0.05, 4),     # single partial block, k > 31 rotations
    (8, 200, 2, 1, 0.2, 5),      # minimum k, h == 1 (no derivation)
    (24, 977, 64, 4, 0.02, 6),   # B not a power of two, k == 64
])
def test_kernel_matches_xla(B, L, k, h, nfrac, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    nmask = rng.random((B, L)) < nfrac
    codes = np.where(nmask, np.uint8(4), codes)
    check(codes, k, h)


def test_kernel_all_n_rows():
    """Rows that are entirely N must yield valid=False everywhere and
    still not disturb neighbouring rows' prefixes."""
    rng = np.random.default_rng(9)
    codes = rng.integers(0, 4, size=(8, 300), dtype=np.uint8)
    codes[3] = 4
    codes[6] = 4
    check(codes, 21, 3)


def test_kernel_rejects_oversized_k():
    with pytest.raises(ValueError):
        nthash_scan.hash_frames_planes_kernel(
            jnp.zeros((8, 300), jnp.uint8), 129, 4, interpret=True)


@pytest.mark.parametrize("size", [1 << 20, 1000, (1 << 32) - 64])
def test_positions_mode_matches_xla(size):
    rng = np.random.default_rng(13)
    B, L, k, h = 8, 300, 31, 4
    codes = rng.integers(0, 4, size=(B, L), dtype=np.uint8)
    codes[rng.random((B, L)) < 0.05] = 4
    ref = nthash.hash_frames(jnp.asarray(codes), k, h)
    from btl_bloomfilter_tpu.ops import u64 as u64_ops
    r = u64_ops.mod_const(
        u64_ops.U64(ref.hashes.hi, ref.hashes.lo), size)
    expect = np.where(np.asarray(ref.valid)[..., None],
                      np.asarray(r.lo), np.uint32(0xFFFFFFFF))
    pos, strand, valid = nthash_scan.positions_planes_kernel(
        jnp.asarray(codes), k, h, size, interpret=True)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.moveaxis(np.asarray(pos), 0, -1),
                                  expect)


def test_positions_mode_rejects_2_32():
    with pytest.raises(ValueError):
        nthash_scan.positions_planes_kernel(
            jnp.zeros((8, 200), jnp.uint8), 31, 4, 1 << 32,
            interpret=True)


def test_insert_contains_seq_kernel_routes_match_xla():
    """kmer_bloom.insert_seq / contains_seq routed through the fused hash
    kernel (interpret) must produce the identical filter and hits as the
    XLA hash path."""
    import functools
    from btl_bloomfilter_tpu.models import bloom, kmer_bloom
    from btl_bloomfilter_tpu.kernels import nthash_scan as ns

    rng = np.random.default_rng(21)
    codes = rng.integers(0, 4, size=(8, 200), dtype=np.uint8)
    codes[rng.random(codes.shape) < 0.05] = 4
    bf0 = bloom.create(1 << 14, 4, 31)

    ref = kmer_bloom.insert_seq(bf0, codes, use_hash_kernel=False)
    orig = ns.positions_planes_kernel
    try:
        ns.positions_planes_kernel = functools.partial(orig, interpret=True)
        got = kmer_bloom.insert_seq(bf0, codes, use_hash_kernel=True)
        hit_k, valid_k = kmer_bloom.contains_seq(ref, codes,
                                                 use_hash_kernel=True)
    finally:
        ns.positions_planes_kernel = orig
    np.testing.assert_array_equal(np.asarray(ref.words),
                                  np.asarray(got.words))
    hit_x, valid_x = kmer_bloom.contains_seq(ref, codes,
                                             use_hash_kernel=False)
    np.testing.assert_array_equal(np.asarray(valid_k), np.asarray(valid_x))
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_x))
    assert np.asarray(hit_k)[np.asarray(valid_k)].all()
