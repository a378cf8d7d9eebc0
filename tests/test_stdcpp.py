"""libstdc++ mirror exactness: minstd_rand + std::shuffle golden parity."""

import json
import os

import pytest

from btl_bloomfilter_tpu.utils import stdcpp

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

with open(os.path.join(GOLDEN_DIR, "shuffle_golden.jsonl")) as f:
    CASES = [json.loads(line) for line in f if line.strip()]


@pytest.mark.parametrize("case", CASES,
                         ids=[f"s{c['seed']}n{c['n']}" for c in CASES])
def test_shuffle_matches_libstdcpp(case):
    g = stdcpp.MinstdRand(case["seed"])
    perm = stdcpp.shuffle(list(range(case["n"])), g)
    assert perm == case["perm"], f"perm mismatch: {perm} vs {case['perm']}"
    # engine state after the shuffle must match too. Note: gen_golden.cpp
    # passes g(),g(),g() as printf args, which gcc evaluates right-to-left,
    # so the recorded list is reversed.
    assert [g(), g(), g()] == case["next"][::-1]


def test_std_hash_identity():
    assert stdcpp.std_hash_integral(0xDEADBEEFCAFEBABE, 64) == 0xDEADBEEFCAFEBABE
    assert stdcpp.std_hash_integral(0xDEADBEEFCAFEBABE, 16) == 0xBABE
    assert stdcpp.std_hash_integral(0x1FF, 8) == 0xFF
