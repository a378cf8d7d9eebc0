"""TPU-native counting Bloom filter with conservative-update semantics.

Replicates /root/reference/CountingBloomFilter.hpp:

  * membership = (min of the h counters) >= count_threshold
    (CountingBloomFilter.hpp:190-196)
  * ``insert`` = conservative update: increment every counter currently
    equal to the minimum, freezing (no wraparound) once a counter reaches
    the dtype max (incrementMin, CountingBloomFilter.hpp:135-162)
  * ``insert_all`` = increment all h counters with per-counter overflow
    freeze (incrementAll, CountingBloomFilter.hpp:165-183)

Storage is TPU-first: counter widths 1/2/4 bytes live PACKED in a
``uint32`` word array (``per = 4/width`` counters per word, little-endian
lanes), so the serialized bytes of the word array are exactly the
reference's little-endian counter array AND the windowed Mosaic kernels
(gather / saturating scatter-add) operate on the filter words with no
repacking. A per-counter-dtype representation was measured catastrophic
on TPU: the strided u8<->u32 pack/unpack of a 2^30-counter plane costs
24 s / 5.7 s per step (bench/pack_probe.py) because stride-4 byte access
fights the (32, 128) tiled layout, while lane extraction from words is
pure vector shifts. Use :func:`to_numpy` for a per-counter host view.

Width 8 (the reference's ``CountingBloomFilter<uint64_t>``) is stored as
TWO uint32 planes (``counters[0]`` = low words, ``counters[1]`` = high
words) with exact uint64 arithmetic throughout, so counter values and
serialization stay exact past 2**32-1.

Conservative update is order-dependent across k-mers; ``insert`` is a
batched decomposition (group collapse + entangled replay) that is
bit-identical to stream order, with the hot closed form routed through
the windowed Mosaic kernels on TPU (see :func:`insert_positions`).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u64
from ..ops.u64 import U64

_NP_LE = {1: "<u1", 2: "<u2", 4: "<u4"}
_PER_WORD = {1: 4, 2: 2, 4: 1, 8: 1}
_SUB_SHIFT = {4: 2, 2: 1, 1: 0}  # log2(counters per word)


@partial(jax.tree_util.register_dataclass,
         data_fields=["counters"],
         meta_fields=["size", "hash_num", "kmer_size", "count_threshold",
                      "counter_width", "bits_per_counter"])
@dataclasses.dataclass
class CountingBloomFilter:
    counters: jax.Array        # widths 1/2/4: uint32[nwords] packed words
    #                            (little-endian lanes); width 8:
    #                            uint32[2, size] dual planes
    size: int                  # number of counters
    hash_num: int
    kmer_size: int
    count_threshold: int
    counter_width: int         # sizeof(T) in bytes: 1, 2, 4 or 8
    bits_per_counter: int = 8  # header field; the reference hardcodes 8

    @property
    def size_in_bytes(self) -> int:
        return self.size * self.counter_width

    @property
    def is_u64(self) -> bool:
        return self.counter_width == 8

    @property
    def counter_max(self) -> int:
        return (1 << (8 * self.counter_width)) - 1

    @property
    def counters_per_word(self) -> int:
        return _PER_WORD[self.counter_width]

    @property
    def nwords(self) -> int:
        return self.size // self.counters_per_word

    def counter_bytes(self) -> bytes:
        if self.counter_width == 8:
            arr = np.asarray(self.counters)
            out = np.empty((self.size, 2), dtype="<u4")
            out[:, 0] = arr[0]          # low words
            out[:, 1] = arr[1]          # high words
            return out.tobytes()
        # little-endian words == little-endian counter stream, byte-exact
        return np.asarray(self.counters).astype("<u4").tobytes()


def create(size_in_bytes: int, hash_num: int, kmer_size: int,
           count_threshold: int, counter_width: int = 1) -> CountingBloomFilter:
    """Constructor parity with CountingBloomFilter.hpp:31-50: sizeInBytes is
    rounded up to a multiple of 8; size = sizeInBytes / sizeof(T)."""
    if counter_width not in _PER_WORD:
        raise ValueError(f"unsupported counter width {counter_width}")
    rem = size_in_bytes % 8
    if rem:
        size_in_bytes += 8 - rem
    size = size_in_bytes // counter_width
    if counter_width == 8:
        arr = jnp.zeros((2, size), jnp.uint32)
    else:
        arr = jnp.zeros(size * counter_width // 4, jnp.uint32)
    return CountingBloomFilter(
        counters=arr, size=size, hash_num=hash_num, kmer_size=kmer_size,
        count_threshold=count_threshold, counter_width=counter_width)


def from_bytes(buf: bytes, *, size: int, hash_num: int, kmer_size: int,
               count_threshold: int, counter_width: int,
               bits_per_counter: int = 8) -> CountingBloomFilter:
    if counter_width == 8:
        raw = np.frombuffer(buf, dtype="<u8", count=size)
        arr = np.stack([(raw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                        (raw >> np.uint64(32)).astype(np.uint32)])
    else:
        arr = np.frombuffer(buf, dtype="<u4",
                            count=size * counter_width // 4).copy()
    return CountingBloomFilter(
        counters=jnp.asarray(arr), size=size, hash_num=hash_num,
        kmer_size=kmer_size, count_threshold=count_threshold,
        counter_width=counter_width, bits_per_counter=bits_per_counter)


def to_numpy(cbf: CountingBloomFilter) -> np.ndarray:
    """Host-side per-counter view (uint8/16/32/64 numpy array) — the
    byte stream the reference's ``m_filter`` holds. Test/debug helper;
    device code reads lanes from the packed words instead."""
    if cbf.is_u64:
        arr = np.asarray(cbf.counters)
        return arr[0].astype(np.uint64) | (
            arr[1].astype(np.uint64) << np.uint64(32))
    return np.frombuffer(cbf.counter_bytes(),
                         dtype=_NP_LE[cbf.counter_width]).copy()


# ---------------------------------------------------------------------------
# positions / lane arithmetic
# ---------------------------------------------------------------------------

def _positions(cbf: CountingBloomFilter, hashes: U64) -> jax.Array:
    if cbf.size > (1 << 32):
        raise ValueError("counting filter larger than 2**32 counters")
    return u64.mod_to_index(hashes, cbf.size).astype(jnp.uint32)


def _extract_lane(w: jax.Array, pos: jax.Array, per: int) -> jax.Array:
    """Counter value from its packed uint32 word: little-endian sub-word
    lanes, ``per`` counters per word; ``pos`` is the counter index."""
    bits = 32 // per
    if per == 1:
        return w
    sub = pos & jnp.uint32(per - 1)
    return (w >> (sub * jnp.uint32(bits))) & jnp.uint32((1 << bits) - 1)


def _lane_shift(pos: jax.Array, per: int) -> jax.Array:
    return (pos & jnp.uint32(per - 1)) * jnp.uint32(32 // per)


def _gather_lane_xla(words: jax.Array, pos: jax.Array, per: int):
    """cur = counters[pos] via an XLA word gather + lane extract."""
    w = words[pos >> jnp.uint32(_SUB_SHIFT[per])]
    return _extract_lane(w, pos, per)


def _hs_scan_rows(op, r: jax.Array, identity) -> jax.Array:
    """Inclusive Hillis-Steele scan along the LAST axis: log2(width)
    shift-and-combine steps built from CONTIGUOUS pads/slices only.

    ``jax.lax.associative_scan`` recurses over odds/evens — STRIDED
    slices at every level, which the TPU tiled layout punishes at both
    compile time and runtime (a plain flat max scan at 6.2M elements
    took >12 min to COMPILE on the remote toolchain; even reshaped to
    [rows, 1024] the strided inner levels stayed pathological)."""
    width = r.shape[-1]
    d = 1
    while d < width:
        pad = jnp.full(r.shape[:-1] + (d,), identity, r.dtype)
        shifted = jnp.concatenate(
            [pad, jax.lax.slice_in_dim(r, 0, width - d, axis=-1)], axis=-1)
        r = op(r, shifted)
        d *= 2
    return r


def _blocked_scan(op, x: jax.Array, identity, reverse: bool = False
                  ) -> jax.Array:
    """Inclusive 1-D scan as a two-level blocked decomposition: a
    Hillis-Steele scan within 1024-element rows, then a small
    Hillis-Steele scan over the row carries (see _hs_scan_rows for why
    not ``associative_scan``)."""
    if reverse:
        return _blocked_scan(op, x[::-1], identity)[::-1]
    n0 = x.shape[0]
    B = 1024
    pad = -n0 % B
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), identity, x.dtype)])
    if x.shape[0] <= B:
        return _hs_scan_rows(op, x, identity)[:n0]
    r = x.reshape(-1, B)
    within = _hs_scan_rows(op, r, identity)
    carry = _hs_scan_rows(op, within[:, -1], identity)
    pre = jnp.concatenate([jnp.full((1,), identity, x.dtype), carry[:-1]])
    return op(within, pre[:, None]).reshape(-1)[:n0]


def _earlier_dup_mask(p: jax.Array) -> jax.Array:
    """True where an EARLIER slot of the same frame holds the same
    position (duplicate counters within one hash frame must update once;
    the reference's CAS loop has the same effect,
    CountingBloomFilter.hpp:150-155). p is uint32[..., h], h static."""
    h = p.shape[-1]
    dup = jnp.zeros(p.shape, bool)
    for j in range(1, h):
        e = p[..., 0] == p[..., j]
        for k in range(1, j):
            e = e | (p[..., k] == p[..., j])
        dup = dup.at[..., j].set(e)
    return dup


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _window_density_ok(n_positions: int, nwords: int) -> bool:
    """Sorted-chunk window coverage check for the Mosaic kernels: a CHUNK
    of sorted uniform positions spans ~CHUNK * nwords / n words, and the
    kernels' fixed window must cover ~1.4x that (the chunk span is a sum
    of ~1024 exponential gaps, std/mean ~3%, so 1.4x is a ~13-sigma
    margin; the counting bench geometry sits at 1.48x and measured zero
    overflows, the Bloom bench at 1.97x). Below this density chunks
    overflow their windows and every batch would pay the kernel AND the
    XLA fallback — measured at the 2^30-counter uint8 config with 4.13M
    positions: kernel path 222 ms vs plain XLA 204 ms
    (bench/counting_probe.py, round 4)."""
    from ..kernels import scatter_or as _so
    return 5 * n_positions * _so.WIN_WORDS >= 7 * _so.CHUNK * nwords


def _gather_kernel_eligible(cbf: CountingBloomFilter) -> bool:
    """Use the Mosaic windowed gather kernel for counter reads when the
    word array spans at least one kernel window and counter indices fit
    uint32 (the kernel addresses WORDS — index >> sub_shift — so even
    filters whose bit positions exceed 32 bits qualify). Dual-plane u64
    filters take the XLA gather (two planes)."""
    from ..kernels import scatter_or as _so
    if cbf.is_u64:
        return False
    return (cbf.size < (1 << 32) and cbf.nwords >= _so.WIN_WORDS
            and jax.default_backend() != "cpu")


def gather_counters_kernel(cbf: CountingBloomFilter, pos: jax.Array,
                           interpret: bool = False):
    """Gather counters[pos] through the windowed gather kernel: address
    each counter by INDEX (the kernel maps index -> word via the sub-word
    shift), sort/gather/un-sort. Returns (counts uint32[pos.shape],
    overflow_count)."""
    from ..kernels import gather_words as _gw
    per = cbf.counters_per_word
    flat = pos.reshape(-1).astype(jnp.uint32)
    idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
    p_s, idx_s = jax.lax.sort((flat, idx), num_keys=1, is_stable=False)
    # only pass interpret when set, so tests can monkeypatch a default
    kw = {"interpret": True} if interpret else {}
    w_s, over = _gw.gather_words_sorted(cbf.counters, p_s,
                                        shift=_SUB_SHIFT[per], **kw)
    v_s = _extract_lane(w_s, p_s, per)
    if per == 4 and flat.shape[0] <= (1 << 23):
        # 8-bit counters: pack (index, value) into one key so the un-sort
        # is a single-operand unstable sort (~2 ms cheaper than a payload
        # sort at bench scale; docs/PERFORMANCE.md sort table)
        packed = jax.lax.sort(
            ((idx_s.astype(jnp.uint32) << 8) | v_s,), is_stable=False)[0]
        v = packed & jnp.uint32(0xFF)
    else:
        _, v = jax.lax.sort((idx_s, v_s), num_keys=1, is_stable=False)
    return v.reshape(pos.shape), over


def _min_count_u64(cbf: CountingBloomFilter, pos: jax.Array) -> U64:
    """64-bit minimum of the h counters per frame (dual-plane layout)."""
    lo = cbf.counters[0][pos]
    hi = cbf.counters[1][pos]
    h = pos.shape[-1]
    m = U64(hi[..., 0], lo[..., 0])
    for j in range(1, h):
        m = u64.min_(m, U64(hi[..., j], lo[..., j]))
    return m


def min_count(cbf: CountingBloomFilter, hashes: U64,
              use_kernel: bool | None = None):
    """Minimum of the h counters per frame (CountingBloomFilter.hpp:54-64).
    hashes U64[..., h] -> uint32 counts[...] (a U64 limb pair for uint64
    filters).

    On TPU, large filters route the counter gathers through the Mosaic
    windowed gather kernel; ``use_kernel`` forces the choice (None =
    auto). Window-overflow batches recompute via the XLA gather."""
    pos = _positions(cbf, hashes)
    if cbf.is_u64:
        return _min_count_u64(cbf, pos)
    per = cbf.counters_per_word
    if use_kernel is None:
        # same fixed-cost crossover as mibf.at_rank (bench/mibf_probe.py),
        # plus window-coverage density (see _window_density_ok)
        use_kernel = (_gather_kernel_eligible(cbf)
                      and pos.size >= (1 << 21)
                      and _window_density_ok(pos.size, cbf.nwords))
    if not use_kernel:
        return jnp.min(_gather_lane_xla(cbf.counters, pos, per), axis=-1)
    vals, over = gather_counters_kernel(cbf, pos)
    mn_k = jnp.min(vals, axis=-1)
    return jax.lax.cond(
        over > 0,
        lambda: jnp.min(_gather_lane_xla(cbf.counters, pos, per), axis=-1),
        lambda: mn_k)


def contains(cbf: CountingBloomFilter, hashes: U64,
             use_kernel: bool | None = None) -> jax.Array:
    mc = min_count(cbf, hashes, use_kernel)
    if cbf.is_u64:
        thr = u64.from_u64_int(int(cbf.count_threshold))
        return u64.ge(mc, u64.broadcast_to(thr, mc.hi.shape))
    return mc >= jnp.uint32(cbf.count_threshold)


# ---------------------------------------------------------------------------
# inserts
# ---------------------------------------------------------------------------

def insert_sequential(cbf: CountingBloomFilter, hashes: U64,
                      valid=None) -> CountingBloomFilter:
    """Conservative update as a per-frame ``lax.scan`` — the transparent
    mirror of the reference's incrementMin loop
    (CountingBloomFilter.hpp:135-162). Exact but O(n) sequential device
    steps; use :func:`insert` (bit-identical, batched) for throughput.
    """
    h = hashes.hi.shape[-1]
    pos = _positions(cbf, hashes).reshape(-1, h)
    n = pos.shape[0]
    if valid is None:
        v = jnp.ones((n,), bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid), hashes.hi.shape[:-1]).reshape(-1)

    if cbf.is_u64:
        def step64(planes, inp):
            lo_pl, hi_pl = planes
            p, ok = inp
            clo = lo_pl[p]
            chi = hi_pl[p]
            mn = U64(chi[0], clo[0])
            for j in range(1, h):
                mn = u64.min_(mn, U64(chi[j], clo[j]))
            new = u64.add(mn, u64.broadcast_to(u64.from_u64_int(1), ()))
            frozen = u64.lt(new, mn)               # wraparound => freeze
            do = ok & ~frozen
            iseq = (clo == mn.lo) & (chi == mn.hi)
            upd_lo = jnp.where(do & iseq, new.lo, clo)
            upd_hi = jnp.where(do & iseq, new.hi, chi)
            return (lo_pl.at[p].set(upd_lo), hi_pl.at[p].set(upd_hi)), None

        (lo_pl, hi_pl), _ = jax.lax.scan(
            step64, (cbf.counters[0], cbf.counters[1]), (pos, v))
        return dataclasses.replace(cbf,
                                   counters=jnp.stack([lo_pl, hi_pl]))

    per = cbf.counters_per_word
    words, _ = jax.lax.scan(
        _make_word_step(per, cbf.counter_max), cbf.counters, (pos, v))
    return dataclasses.replace(cbf, counters=words)


def _make_word_step(per: int, counter_max: int):
    """One conservative-update step on the packed word array: gather the
    frame's words, extract lanes, increment-the-minimum with freeze, and
    ADD the per-lane deltas back (duplicate word indices across a frame's
    lanes accumulate; duplicate positions are deduped)."""
    shift = jnp.uint32(_SUB_SHIFT[per])
    cmax = jnp.uint32(counter_max)

    def step(words, inp):
        p, ok = inp                              # p uint32[h]
        w = words[p >> shift]
        cur = _extract_lane(w, p, per)
        mn = jnp.min(cur)
        do = ok & (mn < cmax)                    # mn == cmax => freeze
        dup = _earlier_dup_mask(p[None])[0]
        delta = jnp.where(do & ~dup & (cur == mn), jnp.uint32(1),
                          jnp.uint32(0))
        return words.at[p >> shift].add(delta << _lane_shift(p, per)), None

    return step


def insert(cbf: CountingBloomFilter, hashes: U64, valid=None,
           max_entangled: int | None = None,
           use_kernel: bool | None = None,
           interpret: bool = False,
           group_duplicates: bool = True) -> CountingBloomFilter:
    """Batched conservative update, bit-identical to processing frames one
    at a time in stream order (incrementMin,
    CountingBloomFilter.hpp:135-162).

    Decomposition (all-vectorized, no per-frame scan for typical streams):

      1. frames with identical position MULTISETS form a group (the update
         depends only on positions); a group of c consecutive-or-not
         occurrences has the closed form max(cur, min(cur) + inc) as long
         as the group shares no position with any other group;
      2. groups that DO share a position ("entangled") are order-dependent
         — those frames (usually a vanishing fraction: cross-k-mer hash
         collisions) are compacted and replayed with the sequential scan.

    ``max_entangled`` bounds the compacted replay buffer (default n/8,
    min 256); if more frames are entangled than that, the whole batch is
    processed by the sequential mirror instead (still exact). On TPU the
    closed form routes through the windowed Mosaic kernels;
    ``use_kernel`` forces the choice (None = auto).

    ``group_duplicates=False`` selects the tier-1 decompose (no
    group-by-multiset sort; see _conservative_decompose): exact for any
    stream and faster on LOW-duplication streams, but duplicate frames
    fill the replay buffer, so keep the default for coverage-like input
    where the same k-mer recurs many times per batch.
    """
    h = hashes.hi.shape[-1]
    pos = _positions(cbf, hashes).reshape(-1, h)
    n = pos.shape[0]
    if valid is None:
        v = jnp.ones((n,), bool)
    else:
        v = jnp.broadcast_to(jnp.asarray(valid),
                             hashes.hi.shape[:-1]).reshape(-1)
    if n <= 2:
        return insert_sequential(cbf, hashes, valid)
    if cbf.is_u64:
        lo, hi = insert_positions_u64(cbf.counters[0], cbf.counters[1],
                                      pos, v, cbf.size, max_entangled)
        return dataclasses.replace(cbf, counters=jnp.stack([lo, hi]))
    words = insert_positions(cbf.counters, pos, v, cbf.counter_max,
                             cbf.size, cbf.counters_per_word,
                             max_entangled, use_kernel=use_kernel,
                             interpret=interpret, group=group_duplicates)
    return dataclasses.replace(cbf, counters=words)


def _conservative_decompose(pos: jax.Array, v: jax.Array,
                            max_entangled: int | None, size: int,
                            words: jax.Array | None = None,
                            per_word: int | None = None,
                            interpret: bool = False,
                            group: bool = True):
    """Shared decomposition of the batched conservative update: group
    frames by identical position multiset, split untangled groups (no
    position shared with another group) from entangled ones, and compact
    the entangled frames in stream order. Pure position logic —
    independent of the counter representation.

    When ``words``/``per_word`` are given (the TPU kernel closed form),
    the current counter value of every frame position is additionally
    gathered through the windowed gather kernel, fused into the
    entanglement pair sort: the pair sort already orders every position,
    and the gathered value rides the same packed un-permute sort that
    returns the per-pair flags — no extra sort passes. Adds result keys
    ``cur`` (uint32[n, h], aligned with ``ks``) and ``gather_over``.

    Entangled frames whose EVERY position has them as the stream-FIRST
    user ("depth-1") have no earlier conflicting writer, so they join the
    batched closed form with c=1 (``closed``/``closed_c``) instead of the
    sequential replay — only the remainder (typically half the entangled
    set) is compacted. The stream-first test is exact: a frame can only
    conflict with earlier frames through a shared position, and shared
    positions of entangled frames are used exclusively by entangled
    frames (an untangled group shares its positions with nobody).

    ``group=False`` skips the group-by-multiset sort entirely (tier-1
    decompose): every frame is its own group with c=1, and the
    entanglement pair sort alone classifies frames — a frame whose every
    slot is the stream-first user of its position joins the closed form
    (the depth-1 argument, which never needed grouping), everything else
    replays. Exact for ANY stream; duplicate frames land in the replay
    remainder instead of collapsing into groups, so the grouped tier
    remains the right choice for high-multiplicity (coverage-like)
    streams while tier-1 drops one full n-row h-key sort + one pair-sort
    operand on low-duplication streams (the bench's random reads)."""
    n, h = pos.shape
    sent = jnp.uint32(0xFFFFFFFF)  # > any position (size <= 2**32-1)
    pos = jnp.where(v[:, None], pos.astype(jnp.uint32), sent)

    # --- 1. group by identical position multiset -------------------------
    key = jnp.sort(pos, axis=-1)                       # [n, h] frame key
    order0 = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.arange(n, dtype=jnp.int32)
    if group:
        sorted_ops = jax.lax.sort(
            tuple(key[:, j] for j in range(h)) + (order0,), num_keys=h,
            is_stable=False)
        ks = jnp.stack(sorted_ops[:h], axis=1)         # [n, h] sorted keys
        frame_of = sorted_ops[h]                       # original frame idx
        new_grp = jnp.ones((n,), bool).at[1:].set(
            jnp.any(ks[1:] != ks[:-1], axis=1))

        # run id and run length per sorted row (blocked log-depth scans, no
        # scatter; see _blocked_scan for the flat-scan compile pathology)
        gid = _blocked_scan(jnp.add, new_grp.astype(jnp.int32), 0) - 1
        run_start = jnp.where(new_grp, idx, 0)
        run_start = _blocked_scan(jnp.maximum, run_start, 0)
        is_last = jnp.ones((n,), bool).at[:-1].set(new_grp[1:])
        run_end = jnp.where(is_last, idx, n - 1)
        run_end = _blocked_scan(jnp.minimum, run_end, n - 1, reverse=True)
        run_len = run_end - run_start + 1
    else:
        ks = key                                       # original order
        frame_of = order0
        new_grp = jnp.ones((n,), bool)
        run_len = jnp.ones((n,), jnp.int32)

    # --- 2. entanglement + stream-first flags per position run -----------
    # pairs sort by (position, STREAM index): the stream-first user of
    # every position run is simply the run start — no segmented scans
    # (a tuple associative_scan at this scale was a compile-time
    # pathology on the remote TPU toolchain: >10 min for one scan)
    pair_pos = ks.reshape(-1)                          # [n*h], gid-major
    pair_stream = jnp.repeat(frame_of, h).astype(jnp.uint32)
    pidx = jnp.arange(n * h, dtype=jnp.uint32)
    if group:
        pair_gid = jnp.repeat(gid, h)
        pp_s, ps_s, pg_s, pi_s = jax.lax.sort(
            (pair_pos, pair_stream, pair_gid, pidx), num_keys=2,
            is_stable=False)
    else:
        # ungrouped: gid == stream, one fewer 24.8M-word sort operand
        pp_s, ps_s, pi_s = jax.lax.sort(
            (pair_pos, pair_stream, pidx), num_keys=2, is_stable=False)
        pg_s = ps_s
    shared_prev = jnp.zeros((n * h,), bool).at[1:].set(
        (pp_s[1:] == pp_s[:-1]) & (pg_s[1:] != pg_s[:-1])
        & (pp_s[1:] != sent))
    shared = shared_prev | jnp.concatenate(
        [shared_prev[1:], jnp.zeros(1, bool)])
    # NOTE: within a multi-gid run, gids interleave by stream, but every
    # maximal same-gid stretch borders a different gid somewhere, so
    # every involved group still gets >= 1 marked pair (the group-wide
    # propagation below does the rest).
    first = jnp.ones((n * h,), bool).at[1:].set(pp_s[1:] != pp_s[:-1])
    # (an in-frame duplicate position yields one non-first pair, sending
    # that frame to the remainder instead of depth-1 — conservative,
    # still exact)

    cur = None
    gather_over = None
    flags = (first.astype(jnp.uint32) << 1) | shared.astype(jnp.uint32)
    if words is None:
        # un-permute the 2-bit flags with the packed-key trick
        packed = jax.lax.sort(((pi_s << 2) | flags,), is_stable=False)[0]
        pr = packed.reshape(n, h)
        frame_shared = jnp.any((pr & 1) == 1, axis=1)
        frame_first = jnp.all((pr & 2) == 2, axis=1)
    else:
        from ..kernels import gather_words as _gw
        w_s, gather_over = _gw.gather_words_sorted(
            words, pp_s, interpret=interpret, shift=_SUB_SHIFT[per_word])
        v_s = _extract_lane(w_s, pp_s, per_word)
        if per_word == 4 and n * h <= (1 << 22):
            # 8-bit counters: value + flags ride one packed key
            packed = jax.lax.sort(
                ((pi_s << 10) | (flags << 8) | v_s,), is_stable=False)[0]
            pr = packed.reshape(n, h)
            frame_shared = jnp.any(((pr >> 8) & 1) == 1, axis=1)
            frame_first = jnp.all(((pr >> 9) & 1) == 1, axis=1)
            cur = pr & jnp.uint32(0xFF)
        else:
            # flags ride the key's low bits, value is the payload
            k_s, v2_s = jax.lax.sort(((pi_s << 2) | flags, v_s),
                                     num_keys=1, is_stable=False)
            kr = k_s.reshape(n, h)
            frame_shared = jnp.any((kr & 1) == 1, axis=1)
            frame_first = jnp.all((kr & 2) == 2, axis=1)
            cur = v2_s.reshape(n, h)
    # group-wide flag: any shared frame inside the run marks the whole run
    if group:
        last_shared = _blocked_scan(jnp.maximum,
                                    jnp.where(frame_shared, idx, -1), -1)
        next_shared = _blocked_scan(jnp.minimum,
                                    jnp.where(frame_shared, idx, n), n,
                                    reverse=True)
        entangled_s = (last_shared >= run_start) | (next_shared <= run_end)
    else:
        entangled_s = frame_shared

    live_s = ks[:, 0] != sent                            # frame is valid
    entangled_s = entangled_s & live_s
    rep = new_grp & live_s & ~entangled_s
    depth1 = entangled_s & frame_first       # stream-first at EVERY slot
    remainder = entangled_s & ~depth1

    # closed-form rows: untangled representatives (c = run occurrences)
    # plus depth-1 entangled occurrences (c = 1); pairwise position-
    # disjoint by construction
    closed = rep | depth1
    closed_c = jnp.where(rep, run_len, 1)

    # --- compact REMAINDER frames, ordered by original stream position ---
    if max_entangled is not None:
        cap = max_entangled
    else:
        # expected remainder ~ collision pairs = (n*h)**2 / (2*size) (the
        # stream-first halves of the pairs fold into the closed form);
        # 1.25x margin + slack is ~60 sigma of the Poisson count at bench
        # scale, and the replay's per-round masked gathers scale with cap.
        # Frames demoted from the depth-1 fold by an in-frame duplicate
        # position (~ n*h*(h-1)/(2*size) of them) land in the remainder
        # too — counted in the margin so the fold-in assumption holds.
        expected = (n * h) ** 2 // (2 * max(size, 1))
        in_frame_dup = (n * h * (h - 1)) // (2 * max(size, 1))
        cap = max(256, expected + expected // 4 + in_frame_dup + 1024)
    cap = min(cap, n)
    n_ent = jnp.sum(remainder.astype(jnp.int32))
    ent_key = jnp.where(remainder, frame_of, jnp.int32(n))
    ent_sorted = jax.lax.sort(ent_key, is_stable=False)[:cap]
    ent_pos = pos[jnp.minimum(ent_sorted, n - 1)]
    ent_ok = ent_sorted < n
    return dict(pos=pos, sent=sent, ks=ks, closed=closed,
                closed_c=closed_c, cap=cap, n_ent=n_ent, ent_pos=ent_pos,
                ent_ok=ent_ok, cur=cur, gather_over=gather_over)


def _replay_schedule(ent_pos: jax.Array, n_ent, sent, max_rounds=32):
    """Round assignment for the entangled replay.

    depth[i] (1-based) such that any two entangled frames sharing a
    counter position get strictly increasing depths in stream order
    (frames are compacted in stream order, so index order = stream
    order). Frames of equal depth are pairwise position-disjoint, so one
    depth applies as ONE batched conservative step — sequential stepping
    is only needed when a dependency chain exceeds ``max_rounds``
    (returns ok=False; caller falls back to the per-frame loop).

    Computed by iterating the per-position predecessor constraint
    depth[i] >= depth[previous user of p] + 1 to fixpoint (chain length
    iterations; typical collision-driven streams converge in 2-3)."""
    cap, h = ent_pos.shape
    live = jnp.arange(cap, dtype=jnp.int32) < n_ent
    pp = jnp.where(live[:, None], ent_pos, sent).reshape(-1)
    fi = jnp.repeat(jnp.arange(cap, dtype=jnp.int32), h)
    pi = jnp.arange(cap * h, dtype=jnp.int32)
    pp_s, fi_s, pi_s = jax.lax.sort((pp, fi, pi), num_keys=2)
    prev_frame = jnp.concatenate([jnp.zeros(1, jnp.int32), fi_s[:-1]])
    # no self-edges: a frame's own duplicate positions impose no order
    prev_ok = jnp.zeros(cap * h, bool).at[1:].set(
        (pp_s[1:] == pp_s[:-1]) & (pp_s[1:] != sent)
        & (fi_s[1:] != fi_s[:-1]))

    def body(st):
        depth, _, it = st
        dprev = jnp.where(prev_ok, depth[prev_frame], 0)
        # un-permute position-major constraints to frame-major slots with
        # the packed-key trick (a serial scatter here costs ~15 ns/element
        # per iteration at bench scale; the 1-key sort is ~10x cheaper)
        need_cap = jnp.minimum(dprev + 1,
                               jnp.int32(max_rounds + 1)).astype(jnp.uint32)
        if cap * h < (1 << 26):
            # packed-key trick: 6 depth bits below the slot index; the
            # static guard keeps the shift inside uint32 (a larger cap
            # falls through to the payload sort below)
            packed = jax.lax.sort(
                ((pi_s.astype(jnp.uint32) << 6) | need_cap,),
                is_stable=False)[0]
            need = (packed & 63).astype(jnp.int32)
        else:
            _, need_u = jax.lax.sort((pi_s, need_cap), num_keys=1)
            need = need_u.astype(jnp.int32)
        need_f = jnp.max(need.reshape(cap, h), axis=1)
        new = jnp.where(live, jnp.maximum(depth, need_f), 0)
        return new, jnp.any(new != depth), it + 1

    depth, changed, _ = jax.lax.while_loop(
        lambda st: st[1] & (st[2] < max_rounds), body,
        (live.astype(jnp.int32), jnp.bool_(True), jnp.int32(0)))
    return depth, jnp.max(depth), ~changed


def _closed_form_add(words: jax.Array, cur: jax.Array, ks: jax.Array,
                     closed_c: jax.Array, closed: jax.Array,
                     counter_max: int, per: int) -> jax.Array:
    """XLA closed form for the batched rows on the packed words: after c
    repeats of a frame, every counter is max(cur, mn + inc) with
    inc = min(c, cmax - mn) (incrementMin's freeze rule,
    CountingBloomFilter.hpp:146-149). Applied as a scatter-ADD of
    delta = max(0, target - cur): closed rows (untangled representatives
    + depth-1 entangled) are position-disjoint and within-frame
    duplicates are zeroed, so each counter receives at most one delta,
    and lane deltas of the same word compose without carries."""
    n, h = ks.shape
    shift = jnp.uint32(_SUB_SHIFT[per])
    cmax = jnp.uint32(counter_max)
    safe = jnp.where(closed[:, None], ks, 0)
    mn = jnp.min(cur, axis=1)
    inc = jnp.minimum(closed_c.astype(jnp.uint32), cmax - mn)
    target = mn + inc
    dup = jnp.zeros((n, h), bool).at[:, 1:].set(ks[:, 1:] == ks[:, :-1])
    eff = closed[:, None] & ~dup
    tb = jnp.broadcast_to(target[:, None], (n, h))
    delta = jnp.where(eff & (cur < tb), tb - cur, jnp.uint32(0))
    return words.at[safe >> shift].add(delta << _lane_shift(safe, per))


def insert_positions(words: jax.Array, pos: jax.Array, v: jax.Array,
                     counter_max: int, size: int, per_word: int,
                     max_entangled: int | None = None,
                     use_kernel: bool | None = None,
                     interpret: bool = False,
                     group: bool = True) -> jax.Array:
    """Position-level core of :func:`insert` (the group-collapse +
    entangled-replay decomposition): conservative-update the PACKED word
    array (uint32[size // per_word], ``per_word`` counters per word;
    per_word=1 means one uint32-addressed counter per word — the layout
    the sharded distributed table path uses, parallel/dist_counting.py)
    with frames ``pos`` (uint32[n, h] counter indices < size, invalid
    frames masked by ``v`` bool[n]), bit-identical to stream order.

    On TPU, large filters route the closed form through the windowed
    Mosaic kernels (fused gather + weighted saturating scatter-add);
    ``use_kernel`` forces the choice (None = auto)."""
    n, h = pos.shape
    if use_kernel is None:
        from ..kernels import scatter_or as _so
        use_kernel = (jax.default_backend() != "cpu"
                      and size < (1 << 32)
                      and words.shape[0] >= _so.WIN_WORDS
                      # uint32 counters: the weighted kernel's 3-byte
                      # deltas bound run lengths (<= n) below 2**24
                      and (per_word > 1 or n < (1 << 24))
                      and _window_density_ok(n * h, words.shape[0]))
    if use_kernel:
        return _insert_positions_kernel(words, pos, v, counter_max, size,
                                        max_entangled, per_word, interpret,
                                        group=group)
    d = _conservative_decompose(pos, v, max_entangled, size, group=group)
    words0 = words
    cur = _gather_lane_xla(words0,
                           jnp.where(d["closed"][:, None], d["ks"], 0),
                           per_word)
    words = _closed_form_add(words0, cur, d["ks"], d["closed_c"],
                             d["closed"], counter_max, per_word)
    return _apply_entangled_replay(words, words0, d, v, counter_max,
                                   per_word)


def _insert_positions_kernel(words: jax.Array, pos: jax.Array,
                             v: jax.Array, counter_max: int, size: int,
                             max_entangled: int | None, per: int,
                             interpret: bool,
                             group: bool = True) -> jax.Array:
    """Closed form for untangled groups routed through the windowed Mosaic
    kernels instead of XLA's serial per-element gather/scatter
    (docs/PERFORMANCE.md "Conservative-update counting"). Pipeline:

      1. decompose with the fused kernel gather (current values ``cur``
         ride the entanglement pair sort),
      2. per-representative target = min(cur) + min(run_len, cmax - min),
      3. one (position, delta) sort + the weighted scatter-add kernel
         (kernels/scatter_add.scatter_add_weighted_sorted).

    Window-overflow fallbacks stay exact: a gather overflow recomputes
    ``cur`` via the XLA word gather; a scatter overflow re-applies the
    missed (position, delta) pairs as XLA lane adds."""
    from ..kernels import scatter_add as _sa
    n, h = pos.shape
    sent = jnp.uint32(0xFFFFFFFF)
    shift = jnp.uint32(_SUB_SHIFT[per])
    words0 = words
    d = _conservative_decompose(pos, v, max_entangled, size, words=words0,
                                per_word=per, interpret=interpret,
                                group=group)
    ks, closed, closed_c = d["ks"], d["closed"], d["closed_c"]

    cur = jax.lax.cond(
        d["gather_over"] > 0,
        lambda: _gather_lane_xla(words0,
                                 jnp.where(closed[:, None], ks, 0), per),
        lambda: d["cur"])

    mn = jnp.min(cur, axis=1)                          # [n] uint32
    cmax = jnp.uint32(counter_max)
    inc = jnp.minimum(closed_c.astype(jnp.uint32), cmax - mn)
    target = mn + inc
    dup = jnp.zeros((n, h), bool).at[:, 1:].set(ks[:, 1:] == ks[:, :-1])
    eff = closed[:, None] & ~dup                       # rows that write
    tb = jnp.broadcast_to(target[:, None], (n, h))
    delta = jnp.where(eff & (cur < tb), tb - cur, jnp.uint32(0))
    dpos = jnp.where(eff, ks, sent)
    dp_s, dv_s = jax.lax.sort((dpos.reshape(-1), delta.reshape(-1)),
                              num_keys=1, is_stable=False)

    words2, ovf = _sa.scatter_add_weighted_sorted(
        words0, dp_s, dv_s, per, counter_max, interpret=interpret)

    def reapply(w):
        # missed (position, delta) pairs; each counter receives at most
        # one delta (bounded by cmax - cur), so lane adds are exact
        vals = jnp.where(ovf != sent, dv_s, jnp.uint32(0))
        return w.at[ovf >> shift].add(vals << _lane_shift(ovf, per),
                                      mode="drop")

    words = jax.lax.cond(jnp.any(ovf != sent), reapply, lambda w: w,
                         words2)
    return _apply_entangled_replay(words, words0, d, v, counter_max, per)


def _apply_entangled_replay(words: jax.Array, words0: jax.Array, d: dict,
                            v: jax.Array, counter_max: int,
                            per: int) -> jax.Array:
    """Steps 4-5 shared by the XLA and kernel closed forms: sequential
    replay of entangled frames in stream order, plus the full-sequential
    fallback when the entangled compaction buffer overflowed. All updates
    are per-lane ADDs on the packed words (rounds are position-disjoint;
    lane deltas of one word compose without carries)."""
    shift = jnp.uint32(_SUB_SHIFT[per])
    cmax = jnp.uint32(counter_max)
    step = _make_word_step(per, counter_max)

    def replay(ws):
        depth, max_depth, sched_ok = _replay_schedule(
            d["ent_pos"], d["n_ent"], d["sent"])
        p = d["ent_pos"]                                 # [cap, h] uint32
        dupm = _earlier_dup_mask(p)

        def rounds(ws):
            # one batched conservative step per depth round (frames of a
            # round are pairwise position-disjoint by construction)
            def rbody(st):
                r, ws = st
                on = depth == r
                safe = jnp.where(on[:, None], p, 0)
                w = ws[safe >> shift]
                cur = _extract_lane(w, safe, per)        # [cap, h]
                mn = jnp.min(cur, axis=1)
                do = on & (mn < cmax)
                delta = jnp.where(
                    do[:, None] & ~dupm & (cur == mn[:, None]),
                    jnp.uint32(1), jnp.uint32(0))
                return r + 1, ws.at[safe >> shift].add(
                    delta << _lane_shift(safe, per))

            return jax.lax.while_loop(lambda st: st[0] <= max_depth,
                                      rbody, (jnp.int32(1), ws))[1]

        def seq(ws):
            # dependency chain longer than the scheduler bound: exact
            # per-frame replay with a dynamic trip count
            stop = jnp.minimum(d["n_ent"], jnp.int32(d["cap"]))

            def body(st):
                i, ws = st
                pf = jax.lax.dynamic_index_in_dim(p, i, axis=0,
                                                  keepdims=False)
                ws2, _ = step(ws, (pf, jnp.bool_(True)))
                return i + 1, ws2

            return jax.lax.while_loop(lambda st: st[0] < stop, body,
                                      (jnp.int32(0), ws))[1]

        return jax.lax.cond(sched_ok, rounds, seq, ws)

    words = jax.lax.cond(d["n_ent"] > 0, replay, lambda ws: ws, words)

    # too many entangled frames for the buffer: redo everything serially
    def full_sequential(_):
        out, _ = jax.lax.scan(
            step, words0,
            (d["pos"], v & (d["pos"][:, 0] != d["sent"])))
        return out

    return jax.lax.cond(d["n_ent"] > d["cap"], full_sequential,
                        lambda _: words, None)


def insert_positions_u64(lo: jax.Array, hi: jax.Array, pos: jax.Array,
                         v: jax.Array, size: int,
                         max_entangled: int | None = None):
    """uint64 twin of :func:`insert_positions` on the dual uint32 planes:
    the same group-collapse + entangled-replay decomposition with exact
    64-bit min/increment/freeze arithmetic. Returns (lo, hi)."""
    d = _conservative_decompose(pos, v, max_entangled, size)
    n, h = pos.shape
    lo0, hi0 = lo, hi

    # --- closed form for the batched rows (untangled reps + depth-1) -----
    # after c updates every counter is max64(cur, mn + inc) with
    # inc = min(c, (2**64-1) - mn)
    closed = d["closed"]
    ks = d["ks"]
    safe_ks = jnp.where(closed[:, None], ks, 0).astype(jnp.int32)
    clo = lo0[safe_ks]
    chi = hi0[safe_ks]
    mn = U64(chi[:, 0], clo[:, 0])
    for j in range(1, h):
        mn = u64.min_(mn, U64(chi[:, j], clo[:, j]))
    c64 = U64(jnp.zeros_like(mn.hi), d["closed_c"].astype(jnp.uint32))
    headroom = u64.sub(u64.full_like(mn, (1 << 64) - 1), mn)
    inc = u64.select(u64.lt(c64, headroom), c64, headroom)
    target = u64.add(mn, inc)
    t_hi = jnp.broadcast_to(target.hi[:, None], chi.shape)
    t_lo = jnp.broadcast_to(target.lo[:, None], clo.shape)
    takes = u64.lt(U64(chi, clo), U64(t_hi, t_lo))
    upd_lo = jnp.where(takes, t_lo, clo)
    upd_hi = jnp.where(takes, t_hi, chi)
    dest = jnp.where(closed[:, None], safe_ks, size)
    lo = lo0.at[dest].set(upd_lo, mode="drop")
    hi = hi0.at[dest].set(upd_hi, mode="drop")

    # --- sequential replay of entangled frames ---------------------------
    def step(planes, inp):
        lo_pl, hi_pl = planes
        p, ok = inp
        p32 = p.astype(jnp.int32)
        flo = lo_pl[p32]
        fhi = hi_pl[p32]
        m = U64(fhi[0], flo[0])
        for j in range(1, h):
            m = u64.min_(m, U64(fhi[j], flo[j]))
        new = u64.add(m, u64.broadcast_to(u64.from_u64_int(1), ()))
        frozen = u64.lt(new, m)
        do = ok & ~frozen
        iseq = (flo == m.lo) & (fhi == m.hi)
        nlo = jnp.where(do & iseq, new.lo, flo)
        nhi = jnp.where(do & iseq, new.hi, fhi)
        return (lo_pl.at[p32].set(nlo), hi_pl.at[p32].set(nhi)), None

    def replay(planes):
        depth, max_depth, sched_ok = _replay_schedule(
            d["ent_pos"], d["n_ent"], d["sent"])
        p32 = d["ent_pos"].astype(jnp.int32)

        def rounds(planes):
            def rbody(st):
                r, lo_pl, hi_pl = st
                on = depth == r
                safe = jnp.where(on[:, None], p32, 0)
                flo = lo_pl[safe]                        # [cap, h]
                fhi = hi_pl[safe]
                m = U64(fhi[:, 0], flo[:, 0])
                for j in range(1, h):
                    m = u64.min_(m, U64(fhi[:, j], flo[:, j]))
                new = u64.add(m, U64(jnp.zeros_like(m.hi),
                                     jnp.ones_like(m.lo)))
                frozen = u64.lt(new, m)
                do = on & ~frozen
                iseq = (flo == m.lo[:, None]) & (fhi == m.hi[:, None])
                sel = do[:, None] & iseq
                nlo = jnp.where(sel,
                                jnp.broadcast_to(new.lo[:, None],
                                                 flo.shape), flo)
                nhi = jnp.where(sel,
                                jnp.broadcast_to(new.hi[:, None],
                                                 fhi.shape), fhi)
                dest = jnp.where(do[:, None], safe, jnp.int32(size))
                return (r + 1, lo_pl.at[dest].set(nlo, mode="drop"),
                        hi_pl.at[dest].set(nhi, mode="drop"))

            out = jax.lax.while_loop(lambda st: st[0] <= max_depth, rbody,
                                     (jnp.int32(1),) + planes)
            return out[1], out[2]

        def seq(planes):
            stop = jnp.minimum(d["n_ent"], jnp.int32(d["cap"]))

            def body(st):
                i, pl = st
                pf = jax.lax.dynamic_index_in_dim(d["ent_pos"], i, axis=0,
                                                  keepdims=False)
                pl2, _ = step(pl, (pf, jnp.bool_(True)))
                return i + 1, pl2

            return jax.lax.while_loop(lambda st: st[0] < stop, body,
                                      (jnp.int32(0), planes))[1]

        return jax.lax.cond(sched_ok, rounds, seq, planes)

    lo, hi = jax.lax.cond(d["n_ent"] > 0, replay, lambda pl: pl, (lo, hi))

    def full_sequential(_):
        out, _ = jax.lax.scan(
            step, (lo0, hi0),
            (d["pos"], v & (d["pos"][:, 0] != d["sent"])))
        return out

    lo, hi = jax.lax.cond(d["n_ent"] > d["cap"], full_sequential,
                          lambda _: (lo, hi), None)
    return lo, hi


def insert_and_check(cbf: CountingBloomFilter, hashes: U64, valid=None):
    """Batched insertAndCheck (CountingBloomFilter.hpp:206-214): membership
    is evaluated against the pre-batch state."""
    found = contains(cbf, hashes)
    return insert(cbf, hashes, valid), found


def _kernel_eligible(cbf: CountingBloomFilter) -> bool:
    from ..kernels import scatter_or as _so
    if cbf.is_u64:
        return False
    return (cbf.size < (1 << 31) and cbf.nwords >= _so.WIN_WORDS
            and jax.default_backend() != "cpu")


def _occ_lane_major(pos: jax.Array, counts: jax.Array, per: int,
                    nwords: int) -> jax.Array:
    """Per-counter occurrence counts laid out LANE-MAJOR: occ[j, w] is
    the count for counter w*per + j. Lane-major rows are contiguous, so
    folding them into the packed words is pure vector arithmetic — a
    flat per-counter array would need stride-``per`` access, which the
    TPU tiled layout punishes (bench/pack_probe.py: 24 s per step)."""
    lane = (pos & jnp.uint32(per - 1)).astype(jnp.uint32)
    word = pos >> jnp.uint32(_SUB_SHIFT[per])
    return jnp.zeros((per, nwords), jnp.uint32).at[lane, word].add(
        counts, mode="drop")


def _fold_occ(words: jax.Array, occ_lm: jax.Array, counter_max: int,
              per: int) -> jax.Array:
    """Saturating per-lane add of lane-major occurrence counts."""
    bits = 32 // per
    cmax = jnp.uint32(counter_max)
    mask = jnp.uint32((1 << bits) - 1) if per > 1 else jnp.uint32(0xFFFFFFFF)
    out = jnp.uint32(0)
    for j in range(per):
        pl = (words >> jnp.uint32(bits * j)) & mask
        wide = pl + occ_lm[j]
        wrapped = wide < pl                      # only possible at per==1
        pl = jnp.where(wrapped, cmax, jnp.minimum(wide, cmax))
        out = out | (pl << jnp.uint32(bits * j))
    return out


def insert_all(cbf: CountingBloomFilter, hashes: U64, valid=None,
               use_kernel: bool | None = None) -> CountingBloomFilter:
    """Vectorized incrementAll (CountingBloomFilter.hpp:165-183): every
    counter addressed by every frame is incremented once per occurrence,
    saturating at the counter max. Order-independent => single scatter-add.

    On TPU, large filters route through the Mosaic saturating histogram
    kernel (kernels/scatter_add.py) directly on the packed words;
    window-overflow indices are re-applied through the XLA lane-major
    path under a lax.cond. ``use_kernel`` forces the choice (None =
    auto)."""
    pos = _positions(cbf, hashes).reshape(-1)
    if valid is not None:
        v = jnp.broadcast_to(jnp.asarray(valid)[..., None],
                             hashes.hi.shape).reshape(-1)
    else:
        v = None
    if cbf.is_u64:
        ones = jnp.ones(pos.shape, jnp.uint32) if v is None \
            else v.astype(jnp.uint32)
        occ = jnp.zeros((cbf.size,), jnp.uint32).at[pos].add(
            ones, mode="drop")
        lo0, hi0 = cbf.counters[0], cbf.counters[1]
        lo = lo0 + occ
        carry = (lo < lo0).astype(jnp.uint32)
        hi = hi0 + carry
        # saturate at 2**64-1 on the (unreachable) 64-bit wrap
        ov = (carry == 1) & (hi0 == jnp.uint32(0xFFFFFFFF))
        lo = jnp.where(ov, jnp.uint32(0xFFFFFFFF), lo)
        hi = jnp.where(ov, jnp.uint32(0xFFFFFFFF), hi)
        return dataclasses.replace(cbf, counters=jnp.stack([lo, hi]))
    per = cbf.counters_per_word
    if use_kernel is None:
        use_kernel = _kernel_eligible(cbf)
    if use_kernel:
        from ..kernels import scatter_add as _sa
        sent = jnp.uint32(0xFFFFFFFF)
        p = pos
        if v is not None:
            p = jnp.where(v, p, sent)
        p_s = jax.lax.sort((p,), is_stable=False)[0]
        words, ovf = _sa.scatter_add_sorted(
            cbf.counters, p_s, per, cbf.counter_max)

        def reapply(w):
            # sentinel entries (0xFFFFFFFF) map out of bounds -> dropped
            occ_lm = _occ_lane_major(ovf, jnp.ones(ovf.shape, jnp.uint32),
                                     per, cbf.nwords)
            return _fold_occ(w, occ_lm, cbf.counter_max, per)

        words = jax.lax.cond(jnp.any(ovf != sent), reapply,
                             lambda w: w, words)
        return dataclasses.replace(cbf, counters=words)
    ones = jnp.ones(pos.shape, jnp.uint32) if v is None \
        else v.astype(jnp.uint32)
    occ_lm = _occ_lane_major(pos, ones, per, cbf.nwords)
    words = _fold_occ(cbf.counters, occ_lm, cbf.counter_max, per)
    return dataclasses.replace(cbf, counters=words)


# ---------------------------------------------------------------------------
# stats
# ---------------------------------------------------------------------------

def _lane_reduce(cbf: CountingBloomFilter, pred) -> jax.Array:
    """Sum of pred(lane) over all counters (lane-wise vector ops on the
    packed words, no unpacking)."""
    per = cbf.counters_per_word
    bits = 32 // per
    mask = jnp.uint32((1 << bits) - 1) if per > 1 else jnp.uint32(0xFFFFFFFF)
    total = jnp.uint32(0)
    for j in range(per):
        lane = (cbf.counters >> jnp.uint32(bits * j)) & mask
        total = total + jnp.sum(pred(lane).astype(jnp.uint32))
    return total


def pop_count(cbf: CountingBloomFilter) -> jax.Array:
    """Non-zero counters (CountingBloomFilter.hpp:217-228)."""
    if cbf.is_u64:
        return jnp.sum(((cbf.counters[0] | cbf.counters[1]) != 0)
                       .astype(jnp.uint32))
    return _lane_reduce(cbf, lambda lane: lane != 0)


def filtered_pop_count(cbf: CountingBloomFilter) -> jax.Array:
    """Counters >= threshold (CountingBloomFilter.hpp:231-242)."""
    if cbf.is_u64:
        thr = u64.broadcast_to(u64.from_u64_int(int(cbf.count_threshold)),
                               cbf.counters[0].shape)
        ge = u64.ge(U64(cbf.counters[1], cbf.counters[0]), thr)
        return jnp.sum(ge.astype(jnp.uint32))
    thr = jnp.uint32(cbf.count_threshold)
    return _lane_reduce(cbf, lambda lane: lane >= thr)


def fpr(cbf: CountingBloomFilter) -> jax.Array:
    return jnp.power(pop_count(cbf).astype(jnp.float32) / cbf.size,
                     jnp.float32(cbf.hash_num))


def filtered_fpr(cbf: CountingBloomFilter) -> jax.Array:
    return jnp.power(filtered_pop_count(cbf).astype(jnp.float32) / cbf.size,
                     jnp.float32(cbf.hash_num))
