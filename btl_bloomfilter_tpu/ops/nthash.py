"""Data-parallel ntHash: every k-mer window of a sequence hashed at once.

The C++ reference computes hashes with an inherently *sequential* rolling
recurrence — each window's hash is derived from the previous window's
(/root/reference/vendor/nthash.hpp:442-457, driven by
/root/reference/vendor/ntHashIterator.hpp:59-86). That recurrence is the
wrong shape for a TPU. This module reformulates ntHash as a closed-form
prefix-scan:

    the forward hash of the window at position p is
        fh(p) = srol^{p+k-1}( P(p+k) xor P(p) )
    where P is the exclusive prefix-XOR of g(t) = srol^{-t}( seed(s[t]) )
    and srol is ntHash's split rotation (independent rotation of the low-33
    and high-31 bit fields; the rol1+swapbits033 composite of
    nthash.hpp:350-380). Likewise for the reverse-complement hash with
    rh(p) = srol^{-p}( Q(p+k) xor Q(p) ),  g_r(t) = srol^{t}( rcseed(s[t]) ).

This makes the whole sequence hashable in O(log L) depth with
``jax.lax.associative_scan`` — fully vectorized, no sequential dependence,
and bit-exact against the reference (verified by golden-vector tests).

N-handling parity: the reference iterator never yields a window containing a
non-ACGT base (ntHashIterator.hpp:59-86). Here every window is hashed and a
``valid`` mask marks N-free windows; downstream ops mask on it. The set of
(position, hashes) pairs for valid windows is identical to the iterator's.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import u64
from .u64 import U64
from . import nthash_tables as T

_SEED_HI = (T.SEEDS >> np.uint64(32)).astype(np.uint32)
_SEED_LO = (T.SEEDS & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RCSEED_HI = (T.RC_SEEDS >> np.uint64(32)).astype(np.uint32)
_RCSEED_LO = (T.RC_SEEDS & np.uint64(0xFFFFFFFF)).astype(np.uint32)


def srol_pow(v: U64, t33, t31) -> U64:
    """Apply srol**t given precomputed amounts t33 = t mod 33, t31 = t mod 31.

    The low 33 bits and high 31 bits rotate independently; amounts may be
    traced arrays (elementwise) or python ints.
    """
    t33 = jnp.asarray(t33, jnp.uint32)
    t31 = jnp.asarray(t31, jnp.uint32)
    # low 33-bit field lives in (hi bit 0, lo)
    l = U64(v.hi & 1, v.lo)
    r = u64.or_(u64.shl(l, t33), u64.shr(l, 33 - t33))
    # high 31-bit field
    h31 = v.hi >> 1
    r31 = ((h31 << t31) | (h31 >> (31 - t31))) & np.uint32(0x7FFFFFFF)
    return U64((r31 << 1) | (r.hi & 1), r.lo)


def srol_pow_static(v: U64, t: int) -> U64:
    return srol_pow(v, t % 33, t % 31)


def _exclusive_xor_scan(g: U64) -> U64:
    """Exclusive prefix-XOR along the last axis; output length L+1."""
    incl = jax.lax.associative_scan(u64.xor, g, axis=-1)
    zshape = g.lo.shape[:-1] + (1,)
    z = jnp.zeros(zshape, jnp.uint32)
    return U64(jnp.concatenate([z, incl.hi], axis=-1),
               jnp.concatenate([z, incl.lo], axis=-1))


def base_seeds(codes: jax.Array) -> U64:
    """Per-position forward seeds seed(s[t])."""
    c = codes.astype(jnp.int32)
    return U64(jnp.asarray(_SEED_HI)[c], jnp.asarray(_SEED_LO)[c])


def rc_seeds(codes: jax.Array) -> U64:
    """Per-position reverse-complement seeds rcseed(s[t])."""
    c = codes.astype(jnp.int32)
    return U64(jnp.asarray(_RCSEED_HI)[c], jnp.asarray(_RCSEED_LO)[c])


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["fh", "rh", "valid"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class StrandHashes:
    """Forward/reverse strand hashes for every window of a sequence.

    Shapes: ``fh``/``rh`` are U64 of shape [..., W]; ``valid`` is bool[..., W]
    with W = L - k + 1 windows.
    """

    fh: U64
    rh: U64
    valid: jax.Array


def strand_hashes(codes: jax.Array, k: int) -> StrandHashes:
    """Compute fh/rh for every window via the prefix-XOR formulation."""
    L = codes.shape[-1]
    if L < k:
        raise ValueError(f"sequence length {L} < k={k}")
    W = L - k + 1
    t = np.arange(L)

    sf = base_seeds(codes)
    sr = rc_seeds(codes)
    gf = srol_pow(sf, (-t) % 33, (-t) % 31)
    gr = srol_pow(sr, t % 33, t % 31)
    P = _exclusive_xor_scan(gf)
    Q = _exclusive_xor_scan(gr)

    p = np.arange(W)
    fh_pre = u64.xor(P[..., k:], P[..., :W])
    rh_pre = u64.xor(Q[..., k:], Q[..., :W])
    fh = srol_pow(fh_pre, (p + k - 1) % 33, (p + k - 1) % 31)
    rh = srol_pow(rh_pre, (-p) % 33, (-p) % 31)

    # valid = window contains no N
    is_n = (codes.astype(jnp.int32) >= T.CODE_N).astype(jnp.int32)
    cnt = jnp.cumsum(is_n, axis=-1)
    zero = jnp.zeros(cnt.shape[:-1] + (1,), jnp.int32)
    cnt = jnp.concatenate([zero, cnt], axis=-1)
    valid = (cnt[..., k:] - cnt[..., :W]) == 0
    return StrandHashes(fh=fh, rh=rh, valid=valid)


def derive_hashes(base: U64, k: int, h: int) -> U64:
    """Expand a canonical base hash into h hashes via the multiply-shift-XOR
    derivation (nthash.hpp:537-542). Output shape [..., h] stacked on a new
    trailing axis; slot 0 is the base hash itself."""
    muls = T.multihash_multipliers(k, h)
    his = [base.hi]
    los = [base.lo]
    for i in range(h - 1):
        tv = u64.mul_const(base, int(muls[i]))
        tv = u64.xor(tv, u64.shr(tv, T.MULTI_SHIFT))
        his.append(tv.hi)
        los.append(tv.lo)
    return U64(jnp.stack(his, axis=-1), jnp.stack(los, axis=-1))


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["hashes", "strand", "valid"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class NtHashFrames:
    """All-window multi-hash output equivalent to draining an
    ntHashIterator (for valid positions)."""

    hashes: U64          # [..., W, h]
    strand: jax.Array    # bool [..., W]; True when reverse strand is canonical
    valid: jax.Array     # bool [..., W]


def hash_frames(codes: jax.Array, k: int, h: int) -> NtHashFrames:
    """Canonical multi-hash of every window: the batch equivalent of
    NTMC64 (nthash.hpp:667-692) over all positions at once."""
    sh = strand_hashes(codes, k)
    strand = u64.lt(sh.rh, sh.fh)           # canonical tie-break: rh < fh
    canon = u64.select(strand, sh.rh, sh.fh)
    hashes = derive_hashes(canon, k, h)
    return NtHashFrames(hashes=hashes, strand=strand, valid=sh.valid)


def hash_kmers(codes: jax.Array, k: int, h: int) -> NtHashFrames:
    """Hash a batch of fixed-length k-mers: codes shaped [..., k]; returns
    frames with the window axis squeezed (hashes [..., h])."""
    f = hash_frames(codes, k, h)
    return NtHashFrames(
        hashes=U64(f.hashes.hi[..., 0, :], f.hashes.lo[..., 0, :]),
        strand=f.strand[..., 0],
        valid=f.valid[..., 0],
    )
