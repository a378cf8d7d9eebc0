"""Spaced-seed hashing bit-exactness vs the compiled C++ reference."""

import functools
import json
import os

import jax
import numpy as np
import pytest

from btl_bloomfilter_tpu.ops import nthash_tables, seeds

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_jsonl(name):
    with open(os.path.join(GOLDEN_DIR, name)) as f:
        return [json.loads(line) for line in f if line.strip()]


ST_CASES = load_jsonl("sthash_golden.jsonl")
SS_CASES = load_jsonl("sshash_golden.jsonl")


@pytest.mark.parametrize(
    "case", ST_CASES,
    ids=[f"k{c['k']}m{c['m']}x{c['m2']}L{len(c['seq'])}" for c in ST_CASES])
def test_sthash_matches_reference(case):
    codes = nthash_tables.encode_seq(case["seq"])
    fn = jax.jit(functools.partial(seeds.spaced_hash_frames,
                                   seed_strings=tuple(case["seeds"]),
                                   m2=case["m2"]))
    frames = fn(codes)
    valid = np.asarray(frames.valid)
    hashes = frames.hashes.astype_numpy()
    strand = np.asarray(frames.strand)

    golden = {f["pos"]: f for f in case["frames"]}
    got_positions = set(np.nonzero(valid)[0].tolist())
    assert got_positions == set(golden.keys())
    for pos, f in golden.items():
        np.testing.assert_array_equal(
            hashes[pos], np.array(f["hashes"], dtype=np.uint64),
            err_msg=f"hashes at pos {pos}")
        np.testing.assert_array_equal(
            strand[pos].astype(int), np.array(f["strand"]),
            err_msg=f"strand at pos {pos}")


@pytest.mark.parametrize(
    "case", SS_CASES,
    ids=[f"k{c['k']}L{len(c['seq'])}-{c['seed']}" for c in SS_CASES])
def test_sshash_matches_reference(case):
    codes = nthash_tables.encode_seq(case["seq"])
    fn = jax.jit(functools.partial(seeds.single_spaced_hash,
                                   seed_string=case["seed"]))
    sval = fn(codes).astype_numpy()
    golden = {f["pos"]: f["sval"] for f in case["frames"]}
    # ssHashIterator yields every window position
    assert set(golden.keys()) == set(range(len(sval)))
    for pos, expect in golden.items():
        assert int(sval[pos]) == expect, f"pos {pos}"
