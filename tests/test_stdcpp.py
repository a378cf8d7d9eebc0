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


def test_binomial_cdf():
    from btl_bloomfilter_tpu.utils import binomial
    # cross-check against direct summation
    import math
    for n, p in [(10, 0.3), (50, 0.05), (100, 0.9)]:
        for k in [0, 1, n // 2, n - 1, n]:
            direct = sum(math.comb(n, i) * p**i * (1 - p) ** (n - i)
                         for i in range(0, k + 1))
            got = binomial.binomial_cdf(k, n, p)
            assert abs(got - direct) < 1e-10, (n, p, k, got, direct)
    assert binomial.calc_sat(10, 0.2, 0) == 0.0
    assert 0 < binomial.calc_sat(10, 0.2, 3) < 1
