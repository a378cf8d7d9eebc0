"""Bit-exactness of the prefix-scan ntHash against the compiled C++ reference.

Golden vectors are produced by tests/golden/gen_golden.cpp, which drains a
reference ntHashIterator over a set of sequences/configs. The scan-based
hasher must reproduce the exact (position, hash-values) stream.
"""

import json
import os

import numpy as np
import pytest

from btl_bloomfilter_tpu.ops import nthash, nthash_tables

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_jsonl(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return [json.loads(line) for line in f if line.strip()]


NTHASH_CASES = load_jsonl("nthash_golden.jsonl")


@pytest.mark.parametrize("case", NTHASH_CASES,
                         ids=[f"k{c['k']}h{c['h']}L{len(c['seq'])}" for c in NTHASH_CASES])
def test_nthash_matches_reference(case):
    seq, k, h = case["seq"], case["k"], case["h"]
    golden = {f["pos"]: f["hashes"] for f in case["frames"]}

    if len(seq) < k:
        assert not golden
        return

    codes = nthash_tables.encode_seq(seq)
    import functools
    import jax
    frames = jax.jit(functools.partial(nthash.hash_frames, k=k, h=h))(codes)
    valid = np.asarray(frames.valid)
    hashes = frames.hashes.astype_numpy()  # [W, h]

    got_positions = set(np.nonzero(valid)[0].tolist())
    assert got_positions == set(golden.keys()), (
        f"valid-window positions disagree: extra={got_positions - set(golden)} "
        f"missing={set(golden) - got_positions}")

    for pos, expect in golden.items():
        np.testing.assert_array_equal(
            hashes[pos], np.array(expect, dtype=np.uint64),
            err_msg=f"hash mismatch at pos {pos}")


def test_kmer_chain_matches_reference():
    """KmerBloomFilter's NTC64+NTE64 chain == hash_kmers on a single k-mer."""
    for case in load_jsonl("kmer_golden.jsonl"):
        kmer, k, h = case["kmer"], case["k"], case["h"]
        codes = nthash_tables.encode_seq(kmer)
        frames = nthash.hash_kmers(codes, k, h)
        np.testing.assert_array_equal(
            frames.hashes.astype_numpy(),
            np.array(case["hashes"], dtype=np.uint64),
            err_msg=f"kmer {kmer}")


def test_batched_hashing_matches_unbatched():
    """Leading batch dimensions must not change per-sequence results."""
    rng = np.random.default_rng(7)
    batch = rng.integers(0, 4, size=(4, 50), dtype=np.uint8)
    k, h = 9, 3
    frames = nthash.hash_frames(batch, k, h)
    all_hashes = frames.hashes.astype_numpy()
    for i in range(batch.shape[0]):
        single = nthash.hash_frames(batch[i], k, h)
        np.testing.assert_array_equal(all_hashes[i], single.hashes.astype_numpy())
        np.testing.assert_array_equal(np.asarray(frames.valid)[i],
                                      np.asarray(single.valid))
