"""Blocked Bloom filter (TPU-native flagship variant)."""

import numpy as np
import jax.numpy as jnp

from btl_bloomfilter_tpu.models import blocked
from btl_bloomfilter_tpu.ops import nthash, nthash_tables, u64

from util import golden_long_seq


def frames_of(seq, k=21, h=4):
    return nthash.hash_frames(nthash_tables.encode_seq(seq), k, h)


def test_insert_contains_roundtrip():
    bf = blocked.create(1 << 16, 4, 21)
    f = frames_of(golden_long_seq(300))
    bf = blocked.insert_frames(bf, f)
    hits = blocked.contains_frames(bf, f)
    assert np.asarray(hits)[np.asarray(f.valid)].all()
    # negative control
    f2 = frames_of("G" * 80 + "C" * 80)
    hits2 = blocked.contains_frames(bf, f2)
    assert not np.asarray(hits2).all()


def test_bits_within_one_block():
    bf = blocked.create(1 << 16, 4, 21)
    canon = u64.from_numpy(np.array([12345678901234567], dtype=np.uint64))
    block, bits = blocked._block_and_bits(bf, canon)
    assert (np.asarray(bits) < 512).all()
    bf2 = blocked.insert(bf, canon)
    rows = np.asarray(bf2.rows)
    touched = np.nonzero(rows.any(axis=1))[0]
    assert len(touched) == 1  # all bits landed in a single block
    assert touched[0] == int(np.asarray(block)[0])


def test_contains_word_boundary_bits():
    """The lane-select probe must hit bits at word boundaries (0, 31, 32,
    511) of the block — exercised by a hand-built single-block filter."""
    bf = blocked.create(1 << 14, 4, 21)
    canon = u64.from_numpy(np.array([987654321987654321], dtype=np.uint64))
    block, bits = blocked._block_and_bits(bf, canon)
    b = int(np.asarray(block)[0])
    rows = np.zeros((bf.nblocks, 16), np.uint32)
    for bit in np.asarray(bits)[0]:
        rows[b, bit >> 5] |= np.uint32(1) << (bit & 31)
    bf = blocked.BlockedBloomFilter(rows=jnp.asarray(rows), size=bf.size,
                                    hash_num=4, kmer_size=21)
    assert bool(np.asarray(blocked.contains(bf, canon))[0])
    # clearing any one probed bit must turn the query negative
    bit0 = int(np.asarray(bits)[0][0])
    rows[b, bit0 >> 5] &= ~(np.uint32(1) << (bit0 & 31))
    bf2 = blocked.BlockedBloomFilter(rows=jnp.asarray(rows), size=bf.size,
                                     hash_num=4, kmer_size=21)
    assert not bool(np.asarray(blocked.contains(bf2, canon))[0])


def test_valid_mask():
    bf = blocked.create(1 << 14, 3, 9)
    f = frames_of("ACGTNNACGTACGTTGCANCGTACG", k=9, h=3)
    bf = blocked.insert_frames(bf, f)
    # nothing from invalid windows may be inserted: rebuild with only the
    # valid canon hashes and compare
    canon = u64.U64(f.hashes.hi[..., 0], f.hashes.lo[..., 0])
    valid = np.asarray(f.valid)
    keep = u64.from_numpy(canon.astype_numpy()[valid])
    bf2 = blocked.insert(blocked.create(1 << 14, 3, 9), keep)
    np.testing.assert_array_equal(np.asarray(bf.rows), np.asarray(bf2.rows))


def test_store_load(tmp_path):
    bf = blocked.create(1 << 14, 4, 15)
    f = frames_of(golden_long_seq(120), k=15)
    bf = blocked.insert_frames(bf, f)
    p = str(tmp_path / "b.bbf")
    blocked.store(bf, p)
    bf2 = blocked.load(p)
    np.testing.assert_array_equal(np.asarray(bf.rows), np.asarray(bf2.rows))
    assert (bf2.size, bf2.hash_num, bf2.kmer_size) == (1 << 14, 4, 15)


def test_fpr_estimate_reasonable():
    est = blocked.fpr(blocked.create(1 << 20, 4, 21), n_inserted=30000)
    assert 0 < est < 0.05
