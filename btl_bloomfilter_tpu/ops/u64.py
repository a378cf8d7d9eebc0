"""64-bit unsigned integer arithmetic as pairs of uint32 arrays.

TPUs have no native 64-bit integer datapath; XLA emulates ``u64`` slowly.
This module implements the exact uint64 semantics the ntHash family needs
(wrap-around multiply, shifts, rotates, unsigned compare, modulo by a static
divisor) directly on ``uint32`` limb pairs, which map 1:1 onto the TPU VPU.

All operations are elementwise over arbitrarily-shaped arrays and are
jit/vmap/scan-safe. ``U64`` is a registered pytree.

Reference semantics being mirrored (for parity tests, not copied):
  - wrap-around ``uint64`` multiply and ``>>``/``<<``/``^`` used by the
    multi-hash derivation (/root/reference/vendor/nthash.hpp:537-542)
  - unsigned ``<`` used for canonical-strand selection (nthash.hpp:464)
  - ``%`` by the filter size used for bit addressing
    (/root/reference/BloomFilter.hpp:176)
"""

from __future__ import annotations

import dataclasses
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

_U32 = jnp.uint32
_MASK32 = np.uint32(0xFFFFFFFF)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class U64:
    """A uint64 value (or array) stored as two uint32 limbs."""

    hi: jax.Array
    lo: jax.Array

    def tree_flatten(self):
        return (self.hi, self.lo), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def shape(self):
        return jnp.shape(self.lo)

    def __getitem__(self, idx):
        return U64(self.hi[idx], self.lo[idx])

    def reshape(self, *shape):
        return U64(self.hi.reshape(*shape), self.lo.reshape(*shape))

    def astype_numpy(self) -> np.ndarray:
        """Materialize to a host-side numpy uint64 array."""
        hi = np.asarray(self.hi, dtype=np.uint64)
        lo = np.asarray(self.lo, dtype=np.uint64)
        return (hi << np.uint64(32)) | lo


def u32(x) -> jax.Array:
    return jnp.asarray(x, dtype=_U32)


def from_u64_int(value: int) -> U64:
    """Build a scalar U64 from a python int (taken mod 2**64)."""
    value &= (1 << 64) - 1
    return U64(u32(value >> 32), u32(value & 0xFFFFFFFF))


def from_numpy(arr) -> U64:
    """Build a U64 from a numpy uint64 (or python-int) array."""
    a = np.asarray(arr, dtype=np.uint64)
    return U64(u32(a >> np.uint64(32)), u32(a & np.uint64(0xFFFFFFFF)))


def full_like(v: U64, value: int) -> U64:
    value &= (1 << 64) - 1
    return U64(
        jnp.full_like(v.hi, np.uint32(value >> 32)),
        jnp.full_like(v.lo, np.uint32(value & 0xFFFFFFFF)),
    )


def zeros(shape, ) -> U64:
    return U64(jnp.zeros(shape, _U32), jnp.zeros(shape, _U32))


def broadcast_to(v: U64, shape) -> U64:
    return U64(jnp.broadcast_to(v.hi, shape), jnp.broadcast_to(v.lo, shape))


# ---------------------------------------------------------------------------
# bitwise ops
# ---------------------------------------------------------------------------

def xor(a: U64, b: U64) -> U64:
    return U64(a.hi ^ b.hi, a.lo ^ b.lo)


def or_(a: U64, b: U64) -> U64:
    return U64(a.hi | b.hi, a.lo | b.lo)


def and_(a: U64, b: U64) -> U64:
    return U64(a.hi & b.hi, a.lo & b.lo)


def and_const(a: U64, mask: int) -> U64:
    mask &= (1 << 64) - 1
    return U64(a.hi & np.uint32(mask >> 32), a.lo & np.uint32(mask & 0xFFFFFFFF))


def not_(a: U64) -> U64:
    return U64(~a.hi, ~a.lo)


# ---------------------------------------------------------------------------
# shifts (shift amount may be a traced array; must satisfy 0 <= s <= 63)
# ---------------------------------------------------------------------------

def shl(v: U64, s) -> U64:
    s = u32(s)
    big = s >= 32
    sm = s & 31  # equals s for s<32 and s-32 for 32<=s<64
    carry = jnp.where(sm == 0, u32(0), v.lo >> ((32 - sm) & 31))
    hi_small = (v.hi << sm) | carry
    lo_small = v.lo << sm
    return U64(jnp.where(big, v.lo << sm, hi_small), jnp.where(big, u32(0), lo_small))


def shr(v: U64, s) -> U64:
    s = u32(s)
    big = s >= 32
    sm = s & 31
    carry = jnp.where(sm == 0, u32(0), v.hi << ((32 - sm) & 31))
    lo_small = (v.lo >> sm) | carry
    hi_small = v.hi >> sm
    return U64(jnp.where(big, u32(0), hi_small), jnp.where(big, v.hi >> sm, lo_small))


def rol(v: U64, s) -> U64:
    """Rotate left by s (0 <= s <= 63)."""
    s = u32(s)
    return or_(shl(v, s), shr(v, (64 - s) & 63))


# ---------------------------------------------------------------------------
# arithmetic
# ---------------------------------------------------------------------------

def add(a: U64, b: U64) -> U64:
    lo = a.lo + b.lo
    carry = (lo < a.lo).astype(_U32)
    return U64(a.hi + b.hi + carry, lo)


def sub(a: U64, b: U64) -> U64:
    lo = a.lo - b.lo
    borrow = (a.lo < b.lo).astype(_U32)
    return U64(a.hi - b.hi - borrow, lo)


def _mul32(a: jax.Array, b: jax.Array):
    """32x32 -> 64 multiply, returns (hi32, lo32). Inputs uint32."""
    a0 = a & 0xFFFF
    a1 = a >> 16
    b0 = b & 0xFFFF
    b1 = b >> 16
    ll = a0 * b0
    lh = a0 * b1
    hl = a1 * b0
    hh = a1 * b1
    mid = (ll >> 16) + (lh & 0xFFFF) + (hl & 0xFFFF)
    lo = (mid << 16) | (ll & 0xFFFF)
    hi = hh + (lh >> 16) + (hl >> 16) + (mid >> 16)
    return hi, lo


def mul(a: U64, b: U64) -> U64:
    """Low 64 bits of a*b (uint64 wrap-around multiply)."""
    hi, lo = _mul32(a.lo, b.lo)
    hi = hi + a.lo * b.hi + a.hi * b.lo
    return U64(hi, lo)


def mulhi(a: U64, b: U64) -> U64:
    """High 64 bits of the 128-bit product a*b."""
    h00, l00 = _mul32(a.lo, b.lo)
    h01, l01 = _mul32(a.lo, b.hi)
    h10, l10 = _mul32(a.hi, b.lo)
    h11, l11 = _mul32(a.hi, b.hi)
    # bits 32..63 column: h00 + l01 + l10 (carries feed bits 64..)
    t = h00 + l01
    c = (t < h00).astype(_U32)
    t2 = t + l10
    c += (t2 < t).astype(_U32)
    # bits 64..95 column: l11 + h01 + h10 + c
    m = l11 + h01
    c2 = (m < l11).astype(_U32)
    m2 = m + h10
    c2 += (m2 < m).astype(_U32)
    m3 = m2 + c
    c2 += (m3 < m2).astype(_U32)
    # bits 96..127 column
    top = h11 + c2
    return U64(top, m3)


def mul_const(a: U64, c: int) -> U64:
    return mul(a, full_like(a, c))


# ---------------------------------------------------------------------------
# comparisons
# ---------------------------------------------------------------------------

def lt(a: U64, b: U64) -> jax.Array:
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo < b.lo))


def le(a: U64, b: U64) -> jax.Array:
    return (a.hi < b.hi) | ((a.hi == b.hi) & (a.lo <= b.lo))


def ge(a: U64, b: U64) -> jax.Array:
    return ~lt(a, b)


def eq(a: U64, b: U64) -> jax.Array:
    return (a.hi == b.hi) & (a.lo == b.lo)


def select(pred: jax.Array, a: U64, b: U64) -> U64:
    return U64(jnp.where(pred, a.hi, b.hi), jnp.where(pred, a.lo, b.lo))


def min_(a: U64, b: U64) -> U64:
    return select(lt(a, b), a, b)


# ---------------------------------------------------------------------------
# modulo by a static (python-int) divisor, exact uint64 semantics
# ---------------------------------------------------------------------------

def mod_const(v: U64, m: int) -> U64:
    """v % m with exact uint64 semantics; m is a static python int >= 1.

    Uses a Barrett-style magic multiply: with p = m.bit_length() and
    M = floor(2**(63+p) / m) (< 2**64 for non-power-of-two m), the estimate
    q = mulhi(v, M) >> (p-1) satisfies q in {floor(v/m)-1, floor(v/m)}, so a
    single conditional correction yields the exact remainder.
    """
    if m <= 0:
        raise ValueError("modulus must be positive")
    if m == 1:
        return full_like(v, 0)
    if (m & (m - 1)) == 0:  # power of two
        return and_const(v, m - 1)
    p = m.bit_length()
    magic = ((1 << (63 + p)) // m)
    q = shr(mulhi(v, from_u64_int(magic)), p - 1)
    r = sub(v, mul_const(q, m))
    m64 = full_like(v, m)
    return select(ge(r, m64), sub(r, m64), r)


def divmod_const(v: U64, m: int):
    """(v // m, v %% m) with exact uint64 semantics; m static >= 1.

    Same Barrett construction as mod_const; exposed for shard routing
    (owner = pos // shard_bits, local = pos %% shard_bits)."""
    if m <= 0:
        raise ValueError("modulus must be positive")
    if m == 1:
        return v, full_like(v, 0)
    if (m & (m - 1)) == 0:  # power of two
        return shr(v, m.bit_length() - 1), and_const(v, m - 1)
    p = m.bit_length()
    magic = ((1 << (63 + p)) // m)
    q = shr(mulhi(v, from_u64_int(magic)), p - 1)
    r = sub(v, mul_const(q, m))
    m64 = full_like(v, m)
    over = ge(r, m64)
    one = full_like(v, 1)
    q = select(over, add(q, one), q)
    r = select(over, sub(r, m64), r)
    return q, r


def mod_u32(v: U64, c: jax.Array) -> jax.Array:
    """v % c for a TRACED uint32 divisor, 1 <= c < 2**31 (elementwise).

    Folds the high limb with one 32-bit `%`, then absorbs the low limb's
    32 bits by shift-subtract (r stays < c < 2**31, so the shift never
    overflows uint32). Used by the width-8 MIBF reservoir arithmetic,
    whose acceptance test is ``std::hash<uint64_t>(v ^ id) % count``
    with a data-dependent count (MIBFConstructSupport.hpp:122-128)."""
    c = c.astype(jnp.uint32)
    r = v.hi % c
    for i in range(31, -1, -1):
        b = (v.lo >> jnp.uint32(i)) & jnp.uint32(1)
        r = (r << jnp.uint32(1)) | b
        r = jnp.where(r >= c, r - c, r)
    return r


def mod_to_index(v: U64, m: int) -> jax.Array:
    """v % m returned as a int32/uint32-addressable index.

    Requires m <= 2**32 so the result fits one limb (callers with larger
    filters keep positions as U64 and split word/bit indices themselves).
    """
    r = mod_const(v, m)
    return r.lo if m <= (1 << 32) else r
