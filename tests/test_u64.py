"""Exhaustive randomized tests of the uint32-pair u64 arithmetic layer."""

import numpy as np
import pytest

from btl_bloomfilter_tpu.ops import u64


RNG = np.random.default_rng(0xBF)


def rand_u64(n, special=True):
    vals = RNG.integers(0, 1 << 64, size=n, dtype=np.uint64)
    if special and n >= 8:
        vals[:8] = [0, 1, 2, 0xFFFFFFFF, 0x100000000, 0xFFFFFFFFFFFFFFFF,
                    0x8000000000000000, 0x00000001FFFFFFFF]
    return vals


def to_np(v):
    return v.astype_numpy()


def test_roundtrip():
    a = rand_u64(1000)
    assert (to_np(u64.from_numpy(a)) == a).all()


def test_bitwise():
    a, b = rand_u64(500), rand_u64(500, special=False)
    A, B = u64.from_numpy(a), u64.from_numpy(b)
    assert (to_np(u64.xor(A, B)) == (a ^ b)).all()
    assert (to_np(u64.or_(A, B)) == (a | b)).all()
    assert (to_np(u64.and_(A, B)) == (a & b)).all()
    assert (to_np(u64.not_(A)) == ~a).all()


def test_shifts_all_amounts():
    a = rand_u64(300)
    A = u64.from_numpy(a)
    for s in range(64):
        np.testing.assert_array_equal(to_np(u64.shl(A, s)), a << np.uint64(s),
                                      err_msg=f"shl {s}")
        np.testing.assert_array_equal(to_np(u64.shr(A, s)), a >> np.uint64(s),
                                      err_msg=f"shr {s}")


def test_shifts_vector_amounts():
    a = rand_u64(640)
    s = np.arange(640) % 64
    A = u64.from_numpy(a)
    np.testing.assert_array_equal(to_np(u64.shl(A, s)), a << s.astype(np.uint64))
    np.testing.assert_array_equal(to_np(u64.shr(A, s)), a >> s.astype(np.uint64))


def test_rol():
    a = rand_u64(128)
    A = u64.from_numpy(a)
    for s in [0, 1, 31, 32, 33, 63]:
        expect = (a << np.uint64(s)) | (a >> np.uint64((64 - s) % 64)) if s else a
        np.testing.assert_array_equal(to_np(u64.rol(A, s)), expect)


def test_addsub():
    a, b = rand_u64(500), rand_u64(500)
    A, B = u64.from_numpy(a), u64.from_numpy(b)
    np.testing.assert_array_equal(to_np(u64.add(A, B)), a + b)
    np.testing.assert_array_equal(to_np(u64.sub(A, B)), a - b)


def test_mul():
    a, b = rand_u64(500), rand_u64(500)
    A, B = u64.from_numpy(a), u64.from_numpy(b)
    np.testing.assert_array_equal(to_np(u64.mul(A, B)), a * b)


def test_mulhi():
    a, b = rand_u64(500), rand_u64(500)
    A, B = u64.from_numpy(a), u64.from_numpy(b)
    expect = np.array([(int(x) * int(y)) >> 64 for x, y in zip(a, b)],
                      dtype=np.uint64)
    np.testing.assert_array_equal(to_np(u64.mulhi(A, B)), expect)


def test_compare():
    a, b = rand_u64(500), rand_u64(500)
    b[:100] = a[:100]  # force equality cases
    A, B = u64.from_numpy(a), u64.from_numpy(b)
    np.testing.assert_array_equal(np.asarray(u64.lt(A, B)), a < b)
    np.testing.assert_array_equal(np.asarray(u64.eq(A, B)), a == b)
    np.testing.assert_array_equal(to_np(u64.min_(A, B)), np.minimum(a, b))


@pytest.mark.parametrize("m", [
    1, 2, 3, 5, 7, 8, 64, 100, 1000, 1001, 4096, 100008,
    19200, 2**31 - 1, 2**32, 2**32 + 1, 10**9, 10**9 + 7,
    2**33, 2**48 - 59, 2**63 - 25, 2**64 - 59,
])
def test_mod_const(m):
    a = rand_u64(2000)
    # include values near multiples of m to hit the correction branch
    near = (np.arange(1, 50, dtype=np.uint64) * np.uint64(m % (1 << 64) or 1))
    a[:49] = near - np.uint64(1)
    A = u64.from_numpy(a)
    expect = (a.astype(object) % m).astype(np.uint64)
    np.testing.assert_array_equal(to_np(u64.mod_const(A, m)), expect,
                                  err_msg=f"mod {m}")


def test_mod_to_index_small():
    a = rand_u64(100)
    r = u64.mod_to_index(u64.from_numpy(a), 1000)
    np.testing.assert_array_equal(np.asarray(r, dtype=np.uint64),
                                  a % np.uint64(1000))
