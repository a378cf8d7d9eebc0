"""Spaced-seed ntHash: batched stHash/ssHash equivalents.

A spaced seed is a k-length string of '1'/'0'; positions marked '0' are
masked out of the hash. ntHash implements masking as an XOR of the rotated
per-base seed at each masked offset (maskHash / NTMSM64,
/root/reference/vendor/nthash.hpp:737-747, 820-878). Because the rotation
amount for relative offset i is *static* ((k-1-i) for the forward strand, i
for the reverse), the whole mask is a handful of statically-rotated,
shifted-slice XORs over the per-position seed arrays — fully vectorized
over windows.

``spaced_hash_frames`` reproduces stHashIterator (multi-seed, multi-hash per
seed, strand flags; /root/reference/vendor/stHashIterator.hpp) and
``single_spaced_hash`` reproduces ssHashIterator
(/root/reference/vendor/ssHashIterator.hpp) — including the reference's
idiosyncratic base-case/sliding split, which is golden-verified.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import nthash, nthash_tables as T, u64
from .u64 import U64


def parse_seed_strings(seeds: Sequence[str]) -> List[List[int]]:
    """'1'/'0' strings -> per-seed list of masked (non-'1') offsets.
    Mirrors stHashIterator::parseSeed (stHashIterator.hpp:23-33) /
    MIBloomFilter::parseSeedString (MIBloomFilter.hpp:49-61)."""
    return [[j for j, ch in enumerate(s) if ch != "1"] for s in seeds]


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["hashes", "strand", "valid"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class SpacedFrames:
    """Per-window spaced-seed hashes.

    hashes: U64[..., W, m*m2] laid out seed-major like the reference
    (stHashIterator.hpp:157-160: [seed1hash1..seed1hash_m2, seed2hash1, ...]).
    strand: bool[..., W, m*m2] (True = reverse strand canonical).
    valid:  bool[..., W].
    """

    hashes: U64
    strand: jax.Array
    valid: jax.Array


def _masked_strand_vals(codes, sh: nthash.StrandHashes, k: int,
                        zero_offsets: Sequence[int]):
    """Apply one spaced seed's mask to fh/rh for every window."""
    W = sh.fh.lo.shape[-1]
    fs, rs = sh.fh, sh.rh
    sf = nthash.base_seeds(codes)
    sr = nthash.rc_seeds(codes)
    for i in zero_offsets:
        # forward mask term: srol^(k-1-i)(seed(s[p+i])) (nthash.hpp:842)
        rf = nthash.srol_pow_static(sf[..., i:i + W], k - 1 - i)
        # reverse mask term: srol^(i)(rcseed(s[p+i])) (nthash.hpp:843)
        rr = nthash.srol_pow_static(sr[..., i:i + W], i)
        fs = u64.xor(fs, rf)
        rs = u64.xor(rs, rr)
    return fs, rs


def spaced_hash_frames(codes, seed_strings: Sequence[str], m2: int = 1
                       ) -> SpacedFrames:
    """Batch equivalent of draining an stHashIterator: m seeds x m2 hashes
    per seed for every valid window."""
    codes = jnp.asarray(codes)
    k = len(seed_strings[0])
    for s in seed_strings:
        if len(s) != k:
            raise ValueError("spaced seeds must share one length")
    zeros = parse_seed_strings(seed_strings)
    sh = nthash.strand_hashes(codes, k)

    his, los, strands = [], [], []
    for z in zeros:
        fs, rs = _masked_strand_vals(codes, sh, k, z)
        st = u64.lt(rs, fs)                       # nthash.hpp:845
        base = u64.select(st, rs, fs)
        derived = nthash.derive_hashes(base, k, m2)  # [..., W, m2]
        his.append(derived.hi)
        los.append(derived.lo)
        strands.append(jnp.broadcast_to(st[..., None], derived.hi.shape))
    hashes = U64(jnp.concatenate(his, axis=-1), jnp.concatenate(los, axis=-1))
    strand = jnp.concatenate(strands, axis=-1)
    return SpacedFrames(hashes=hashes, strand=strand, valid=sh.valid)


def single_spaced_hash(codes, seed_string: str) -> U64:
    """Batch equivalent of draining an ssHashIterator: one spaced-seed value
    per window (U64[..., W]).

    Replicates the reference's exact behavior, which differs between the
    base window and slid windows (ssHashIterator.hpp:44-62):
      * window 0 uses NTS64's base recurrence (nthash.hpp:750-761), whose
        result only masks offset k-1 (if seed[k-1]=='0');
      * windows p>=1 use the sliding NTS64 (nthash.hpp:764-772), which masks
        every '0' offset with rotation amount k (not k-1-i).
    There is no N-skip: every window position is produced.
    """
    codes = jnp.asarray(codes)
    k = len(seed_string)
    zeros = [j for j, ch in enumerate(seed_string) if ch != "1"]
    sh = nthash.strand_hashes(codes, k)
    fh = sh.fh
    W = fh.lo.shape[-1]

    # sliding formula for all windows
    sval = fh
    sf = nthash.base_seeds(codes)
    for i in zeros:
        term = nthash.srol_pow_static(sf[..., i:i + W], k)
        sval = u64.xor(sval, term)

    # base-case formula for window 0
    if seed_string[k - 1] == "1":
        base0 = U64(fh.hi[..., 0], fh.lo[..., 0])
    else:
        last = U64(sf.hi[..., k - 1], sf.lo[..., k - 1])
        base0 = u64.xor(U64(fh.hi[..., 0], fh.lo[..., 0]), last)
    hi = sval.hi.at[..., 0].set(base0.hi)
    lo = sval.lo.at[..., 0].set(base0.lo)
    return U64(hi, lo)
