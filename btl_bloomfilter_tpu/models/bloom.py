"""TPU-native Bloom filter: a pure-functional bit array in HBM.

Replicates the semantics of the reference BloomFilter
(/root/reference/BloomFilter.hpp) with a design the XLA compiler can fuse:

  * the filter state is a ``uint32`` word array (bit p -> word p>>5,
    bit p&31). The serialized little-endian bytes of this layout are exactly
    the reference's byte array (byte p>>3, LSB-first mask 1<<(p&7),
    BloomFilter.hpp:30), so store/load is byte-identical.
  * ``insert`` is a batched scatter: positions are deduplicated with a sort
    (so a plain scatter-add of single-bit masks equals a scatter-OR), then
    OR-ed into the existing words. This replaces the reference's per-bit
    ``__sync_or_and_fetch`` loop (BloomFilter.hpp:185-194) — commutative
    bit-OR means any evaluation order gives the identical filter.
  * ``contains`` is a batched gather + AND-reduce (BloomFilter.hpp:252-262).

All functions are pure; ``insert`` returns a new filter pytree (XLA reuses
the buffer via donation under jit).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u64
from ..ops.u64 import U64

_WORD_BITS = 32


@partial(jax.tree_util.register_dataclass,
         data_fields=["words"],
         meta_fields=["size", "hash_num", "kmer_size", "dfpr", "n_entry",
                      "t_entry"])
@dataclasses.dataclass
class BloomFilter:
    """Bit-array Bloom filter state (a pytree; metadata is static)."""

    words: jax.Array      # uint32[ceil(size/32)]
    size: int             # filter size in bits
    hash_num: int
    kmer_size: int
    dfpr: float = 0.0
    n_entry: int = 0
    t_entry: int = 0

    @property
    def size_in_bytes(self) -> int:
        return self.size // 8


def create(size: int, hash_num: int, kmer_size: int, *, dfpr: float = 0.0,
           n_entry: int = 0, t_entry: int = 0) -> BloomFilter:
    """De-novo filter. ``size`` (bits) must be a multiple of 8, mirroring
    initSize (BloomFilter.hpp:389-399)."""
    if size % 8 != 0:
        raise ValueError(f"filter size {size} is not a multiple of 8")
    nwords = (size + _WORD_BITS - 1) // _WORD_BITS
    return BloomFilter(words=jnp.zeros(nwords, jnp.uint32), size=size,
                       hash_num=hash_num, kmer_size=kmer_size, dfpr=dfpr,
                       n_entry=n_entry, t_entry=t_entry)


def calc_optimal_size(entries: int, fpr: float, hash_num: int) -> int:
    """Sizing math of BloomFilter.hpp:406-413 (rounds up to a multiple
    of 64)."""
    non64 = int(-float(entries) * float(hash_num) /
                math.log(1.0 - math.pow(fpr, 1.0 / float(hash_num))))
    return non64 + (64 - non64 % 64)


def calc_opti_hash_num(fpr: float) -> int:
    """BloomFilter.hpp:419."""
    return int(-math.log(fpr) / math.log(2))


def create_from_fpr(expected_entries: int, fpr: float, hash_num: int,
                    kmer_size: int) -> BloomFilter:
    """FPR-sized constructor (BloomFilter.hpp:83-99)."""
    if hash_num == 0:
        hash_num = calc_opti_hash_num(fpr)
    size = calc_optimal_size(expected_entries, fpr, hash_num)
    return create(size, hash_num, kmer_size, dfpr=fpr)


# ---------------------------------------------------------------------------
# position arithmetic
# ---------------------------------------------------------------------------

def bit_positions(hashes: U64, size: int):
    """hash % size -> (word_index int32, bit_mask uint32, sort_key).

    Supports sizes up to 2**37 bits (word index must fit 32 bits)."""
    if size > (1 << 37):
        raise ValueError("per-device filter larger than 2**37 bits")
    r = u64.mod_const(hashes, size)
    word = ((r.hi << 27) | (r.lo >> 5)).astype(jnp.int32)
    mask = jnp.uint32(1) << (r.lo & 31)
    return word, mask, r


def _dedupe_mask_sorted(hi: jax.Array, lo: jax.Array):
    """Sort positions lexicographically; return (hi, lo, keep) where keep
    marks the first occurrence of each distinct position."""
    hi_s, lo_s = jax.lax.sort((hi, lo), num_keys=2, is_stable=False)
    first = jnp.ones(hi_s.shape, bool)
    neq = (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])
    keep = first.at[1:].set(neq)
    return hi_s, lo_s, keep


def sorted_delta_words(pos_s: jax.Array, keep: jax.Array,
                       nwords: int) -> jax.Array:
    """Bit-delta words from SORTED uint32 positions with a keep mask.

    The word-index array handed to the scatter must be *genuinely*
    monotone when promising ``indices_are_sorted=True``: the TPU backend's
    sorted-scatter lowering silently drops most updates if dropped slots
    are redirected to an out-of-bounds index interleaved mid-array
    (measured: 250K of 4.1M bits survived). So duplicates/sentinels keep
    their position-derived word (monotone since pos_s is sorted) and
    contribute a zero mask instead — adding 0 is a no-op even when a
    sentinel's word (0x07FFFFFF) happens to be in bounds."""
    word = (pos_s >> 5).astype(jnp.int32)
    mask = jnp.where(keep, jnp.uint32(1) << (pos_s & 31), jnp.uint32(0))
    return jnp.zeros(nwords, jnp.uint32).at[word].add(
        mask, mode="drop", indices_are_sorted=True)


# ---------------------------------------------------------------------------
# core ops
# ---------------------------------------------------------------------------

def _kernel_eligible(bf: BloomFilter) -> bool:
    """Use the Mosaic MXU scatter kernel when the filter is big enough for
    the window walk, positions fit one limb, and we are on a TPU backend
    (Pallas Mosaic does not lower on CPU outside interpret mode)."""
    from ..kernels import scatter_ring as _sr
    nwords = bf.words.shape[0]
    # below one window the XLA scatter is cheap and the kernel's fixed
    # costs (window DMA per chunk) cannot win
    return (bf.size < (1 << 32) and nwords >= _sr.NWIN * _sr.SLOT_WORDS
            and jax.default_backend() != "cpu")


def insert(bf: BloomFilter, hashes: U64, valid=None,
           use_kernel: bool | None = None) -> BloomFilter:
    """Insert a batch of frames. ``hashes`` is U64[..., h]; ``valid`` is an
    optional bool mask broadcastable to hashes.shape[:-1] (frames with
    valid=False contribute nothing, mirroring the iterator's N-skip).

    On TPU, large filters route through the Mosaic MXU-histogram scatter
    kernel (kernels/scatter_or.py, ~1.75x the XLA scatter end-to-end);
    ``use_kernel`` forces the choice (None = auto)."""
    flat = U64(hashes.hi.reshape(-1), hashes.lo.reshape(-1))
    r = u64.mod_const(flat, bf.size)
    nwords = bf.words.shape[0]
    if valid is not None:
        v = jnp.broadcast_to(jnp.asarray(valid)[..., None],
                             hashes.hi.shape).reshape(-1)
    else:
        v = None

    # fast path: positions fit one limb -> single-key sort. (At exactly
    # size == 2**32 the 0xFFFFFFFF sentinel would collide with a real
    # position; the 2-key path below handles that edge.)
    if bf.size < (1 << 32):
        pos = r.lo
        if v is not None:
            pos = jnp.where(v, pos, jnp.uint32(0xFFFFFFFF))
        return insert_sentinel_positions(bf, pos, use_kernel=use_kernel)
    else:
        if v is not None:
            oob_hi = jnp.uint32((bf.size >> 32) + 1)
            r = U64(jnp.where(v, r.hi, oob_hi), r.lo)
        hi_s, lo_s, keep = _dedupe_mask_sorted(r.hi, r.lo)
        # keep the word-index array monotone (see sorted_delta_words):
        # invalid frames carry oob_hi > any valid hi, so they sort to the
        # tail and map to nwords there without breaking monotonicity;
        # duplicates keep their position-derived word with a zero mask.
        wordu = (hi_s << 27) | (lo_s >> 5)
        word = jnp.where(hi_s > jnp.uint32(bf.size >> 32), jnp.int32(nwords),
                         wordu.astype(jnp.int32))
        mask = jnp.where(keep, jnp.uint32(1) << (lo_s & 31), jnp.uint32(0))
        delta = jnp.zeros(nwords, jnp.uint32).at[word].add(
            mask, mode="drop", indices_are_sorted=True)
    return dataclasses.replace(bf, words=bf.words | delta)


def insert_sentinel_positions(bf: BloomFilter, pos: jax.Array,
                              use_kernel: bool | None = None
                              ) -> BloomFilter:
    """Insert bit positions already reduced mod size (uint32, any shape),
    with 0xFFFFFFFF marking slots to skip — the array the fused hash
    kernel emits (kernels/nthash_scan positions mode). Requires
    size < 2**32 (the sentinel must stay out of range)."""
    if bf.size >= (1 << 32):
        raise ValueError("sentinel-position insert requires size < 2**32")
    sent = jnp.uint32(0xFFFFFFFF)
    nwords = bf.words.shape[0]
    # single-key value sort: unstable lowering is ~2.5x faster on TPU
    # than the stable default (docs/PERFORMANCE.md sort table)
    pos_s = jax.lax.sort((pos.reshape(-1),), is_stable=False)[0]
    keep = jnp.ones(pos_s.shape, bool).at[1:].set(pos_s[1:] != pos_s[:-1])
    keep = keep & (pos_s != sent)
    if use_kernel is None:
        use_kernel = _kernel_eligible(bf)
    if use_kernel:
        from ..kernels import scatter_ring as _sr
        pos_d = jnp.where(keep, pos_s, sent)
        # in-place RMW ring: filter slots stream through VMEM once (no
        # delta array, no separate OR pass); OR is idempotent so the
        # overflow fallback re-applies over the partial in-place result
        out, over = _sr.scatter_or_sorted_inplace(bf.words, pos_d,
                                                  pos_for_base=pos_s)
        # rare window-overflow fallback: re-apply the (idempotent)
        # whole batch through the XLA scatter
        out = jax.lax.cond(
            over > 0,
            lambda w: w | sorted_delta_words(pos_s, keep, nwords),
            lambda w: w, out)
        return dataclasses.replace(bf, words=out)
    delta = sorted_delta_words(pos_s, keep, nwords)
    return dataclasses.replace(bf, words=bf.words | delta)


def contains_sentinel_positions(bf: BloomFilter, pos: jax.Array,
                                use_kernel: bool | None = None) -> jax.Array:
    """Membership for position planes pos uint32[h, ...] already reduced
    mod size, where invalid windows carry 0xFFFFFFFF in every slot (the
    fused hash kernel's positions mode). Returns hit bool[...] with
    invalid windows False. Requires size < 2**32."""
    if bf.size >= (1 << 32):
        raise ValueError("sentinel-position query requires size < 2**32")
    sent = jnp.uint32(0xFFFFFFFF)
    valid_w = pos[0] != sent
    safe = jnp.where(pos == sent, jnp.uint32(0), pos)
    word = (safe >> 5).astype(jnp.int32)
    mask = jnp.uint32(1) << (safe & 31)
    if use_kernel is None:
        use_kernel = _kernel_eligible(bf)
    if use_kernel:
        from ..kernels import gather_words as _gw
        flat = safe.reshape(-1)
        n = flat.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        pos_s, idx_s = jax.lax.sort((flat, idx), num_keys=1,
                                    is_stable=False)
        vals_s, over = _gw.gather_words_sorted(bf.words, pos_s)
        bit_s = (vals_s >> (pos_s & 31)) & 1
        bit = jax.lax.sort(((idx_s.astype(jnp.uint32) << 1) | bit_s,),
                           is_stable=False)[0] & 1
        hit_k = jnp.all(bit.reshape(pos.shape) == 1, axis=0)
        hit = jax.lax.cond(
            over > 0,
            lambda: jnp.all((bf.words[word] & mask) == mask, axis=0),
            lambda: hit_k)
        return hit & valid_w
    got = bf.words[word]
    return jnp.all((got & mask) == mask, axis=0) & valid_w


def contains(bf: BloomFilter, hashes: U64,
             use_kernel: bool | None = None) -> jax.Array:
    """Membership test for a batch of frames: hashes U64[..., h] ->
    bool[...]. Equivalent to BloomFilter.hpp:252-262 (all h bits set).

    On TPU, large filters route through the Mosaic windowed gather kernel
    (kernels/gather_words.py): sort positions carrying their flat index,
    gather words window-wise on the MXU, then un-sort the extracted bits
    with a second (packed single-key) sort. ``use_kernel`` forces the
    choice (None = auto)."""
    word, mask, r = bit_positions(hashes, bf.size)
    if use_kernel is None:
        use_kernel = _kernel_eligible(bf)
    if use_kernel and bf.size < (1 << 32):
        from ..kernels import gather_words as _gw
        pos = r.lo.reshape(-1)
        n = pos.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        pos_s, idx_s = jax.lax.sort((pos, idx), num_keys=1,
                                    is_stable=False)
        vals_s, over = _gw.gather_words_sorted(bf.words, pos_s)
        bit_s = (vals_s >> (pos_s & 31)) & 1
        # un-sort: pack (index, bit) into one key so the sort is single-op
        bit = jax.lax.sort(((idx_s.astype(jnp.uint32) << 1) | bit_s,),
                           is_stable=False)[0] & 1
        hit_k = jnp.all(bit.reshape(hashes.hi.shape) == 1, axis=-1)
        # rare window-overflow fallback: recompute via the XLA gather
        return jax.lax.cond(
            over > 0,
            lambda: jnp.all((bf.words[word] & mask) == mask, axis=-1),
            lambda: hit_k)
    got = bf.words[word]
    hit = (got & mask) == mask
    return jnp.all(hit, axis=-1)


def insert_and_check(bf: BloomFilter, hashes: U64, valid=None):
    """Batched insertAndCheck (BloomFilter.hpp:200-213): returns
    (new_filter, found) where ``found`` reports membership *before this
    batch*. Note: the reference's sequential semantics would report True for
    a later duplicate of a k-mer inserted earlier in the same batch; callers
    needing that ordering should insert in smaller batches."""
    found = contains(bf, hashes)
    return insert(bf, hashes, valid), found


def insert_and_check_sequential(bf: BloomFilter, hashes: U64, valid=None):
    """Sequentially-exact insertAndCheck (BloomFilter.hpp:200-213): each
    frame reports whether all its bits were already set at *its own* insert
    time, so a duplicate later in the batch reports True. Runs as a
    lax.scan; use the batched ``insert_and_check`` when in-batch duplicate
    ordering does not matter."""
    h = hashes.hi.shape[-1]
    r = u64.mod_const(U64(hashes.hi.reshape(-1, h),
                          hashes.lo.reshape(-1, h)), bf.size)
    if bf.size > (1 << 32):
        raise NotImplementedError("sequential check requires size <= 2**32")
    pos = r.lo
    if valid is None:
        v = jnp.ones(pos.shape[0], bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid),
                             hashes.hi.shape[:-1]).reshape(-1)

    def step(words, inp):
        p, ok = inp
        word = (p >> 5).astype(jnp.int32)
        bit = p & 31
        cur = words[word]
        found = jnp.all(((cur >> bit) & 1) == 1)
        # combine masks of slots sharing a word so the duplicate-index
        # scatter writes identical values
        maskbit = jnp.uint32(1) << bit
        same = word[None, :] == word[:, None]
        comb = cur
        for j in range(h):
            comb = comb | jnp.where(same[:, j], maskbit[j], 0)
        newwords = words.at[word].set(jnp.where(ok, comb, cur))
        return newwords, found & ok

    words, found = jax.lax.scan(step, bf.words, (pos, v))
    return dataclasses.replace(bf, words=words), \
        found.reshape(hashes.hi.shape[:-1])


def get_pop(bf: BloomFilter) -> jax.Array:
    """Number of set bits (BloomFilter.hpp:316-323)."""
    return jnp.sum(jax.lax.population_count(bf.words).astype(jnp.uint32))


def get_fpr(bf: BloomFilter) -> jax.Array:
    """Popcount-based measured FPR (BloomFilter.hpp:346-350)."""
    pop = get_pop(bf).astype(jnp.float32)
    return jnp.power(pop / jnp.float32(bf.size), jnp.float32(bf.hash_num))


def calc_fpr_num_inserted(bf: BloomFilter, num: int) -> float:
    """BloomFilter.hpp:425-429."""
    return math.pow(1.0 - math.pow(1.0 - 1.0 / float(bf.size),
                                   float(num) * bf.hash_num),
                    float(bf.hash_num))


def get_fpr_num_ele(bf: BloomFilter) -> float:
    assert bf.n_entry > 0
    return calc_fpr_num_inserted(bf, bf.n_entry)


def get_redundancy_fpr(bf: BloomFilter) -> float:
    """BloomFilter.hpp:333-341."""
    assert bf.n_entry > 0
    total = math.log(calc_fpr_num_inserted(bf, 1))
    for i in range(2, bf.n_entry):
        total = math.log(math.exp(total) + calc_fpr_num_inserted(bf, i))
    return math.exp(total) / bf.n_entry
