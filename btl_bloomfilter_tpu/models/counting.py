"""TPU-native counting Bloom filter with conservative-update semantics.

Replicates /root/reference/CountingBloomFilter.hpp:

  * membership = (min of the h counters) >= count_threshold
    (CountingBloomFilter.hpp:190-196)
  * ``insert`` = conservative update: increment every counter currently
    equal to the minimum, freezing (no wraparound) once a counter reaches
    the dtype max (incrementMin, CountingBloomFilter.hpp:135-162)
  * ``insert_all`` = increment all h counters with per-counter overflow
    freeze (incrementAll, CountingBloomFilter.hpp:165-183)

Conservative update is order-dependent across k-mers, so the exact-parity
path (`insert`) runs as a ``lax.scan`` over frames — each step is a tiny
gather/compare/scatter that XLA keeps on-chip. The vectorized
``insert_all`` path (saturating scatter-add) is order-independent and runs
at full scatter throughput.

Counter widths 1/2/4 bytes are stored natively; width 8 (the reference's
``CountingBloomFilter<uint64_t>``) is stored as TWO uint32 planes
(``counters[0]`` = low words, ``counters[1]`` = high words — a minor-dim-2
layout would pad to 128 TPU lanes) with exact uint64 arithmetic
throughout: min/compare/increment/saturation all operate on the limb
pairs, so counter values and serialization stay exact past 2**32-1.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import u64
from ..ops.u64 import U64

_DTYPES = {1: jnp.uint8, 2: jnp.uint16, 4: jnp.uint32, 8: jnp.uint32}
_NP_LE = {1: "<u1", 2: "<u2", 4: "<u4"}


@partial(jax.tree_util.register_dataclass,
         data_fields=["counters"],
         meta_fields=["size", "hash_num", "kmer_size", "count_threshold",
                      "counter_width", "bits_per_counter"])
@dataclasses.dataclass
class CountingBloomFilter:
    counters: jax.Array        # [size], dtype per counter_width
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

    def counter_bytes(self) -> bytes:
        arr = np.asarray(self.counters)
        if self.counter_width == 8:
            out = np.empty((self.size, 2), dtype="<u4")
            out[:, 0] = arr[0]          # low words
            out[:, 1] = arr[1]          # high words
            return out.tobytes()
        return arr.astype(_NP_LE[self.counter_width]).tobytes()


def create(size_in_bytes: int, hash_num: int, kmer_size: int,
           count_threshold: int, counter_width: int = 1) -> CountingBloomFilter:
    """Constructor parity with CountingBloomFilter.hpp:31-50: sizeInBytes is
    rounded up to a multiple of 8; size = sizeInBytes / sizeof(T)."""
    if counter_width not in _DTYPES:
        raise ValueError(f"unsupported counter width {counter_width}")
    rem = size_in_bytes % 8
    if rem:
        size_in_bytes += 8 - rem
    size = size_in_bytes // counter_width
    shape = (2, size) if counter_width == 8 else (size,)
    return CountingBloomFilter(
        counters=jnp.zeros(shape, _DTYPES[counter_width]), size=size,
        hash_num=hash_num, kmer_size=kmer_size,
        count_threshold=count_threshold, counter_width=counter_width)


def from_bytes(buf: bytes, *, size: int, hash_num: int, kmer_size: int,
               count_threshold: int, counter_width: int,
               bits_per_counter: int = 8) -> CountingBloomFilter:
    if counter_width == 8:
        raw = np.frombuffer(buf, dtype="<u8", count=size)
        arr = np.stack([(raw & np.uint64(0xFFFFFFFF)).astype(np.uint32),
                        (raw >> np.uint64(32)).astype(np.uint32)])
    else:
        arr = np.frombuffer(buf, dtype=_NP_LE[counter_width], count=size).copy()
    return CountingBloomFilter(
        counters=jnp.asarray(arr), size=size, hash_num=hash_num,
        kmer_size=kmer_size, count_threshold=count_threshold,
        counter_width=counter_width, bits_per_counter=bits_per_counter)


# ---------------------------------------------------------------------------
# positions
# ---------------------------------------------------------------------------

def _positions(cbf: CountingBloomFilter, hashes: U64) -> jax.Array:
    if cbf.size > (1 << 32):
        raise ValueError("counting filter larger than 2**32 counters")
    return u64.mod_to_index(hashes, cbf.size).astype(jnp.int32)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _gather_kernel_eligible(cbf: CountingBloomFilter) -> bool:
    """Use the Mosaic windowed gather kernel for counter reads when the
    packed uint32 view spans at least one kernel window and counter bit
    positions fit uint32 (nwords*32 <= 2**32). Dual-plane u64 filters
    take the XLA gather (two planes, no packed view)."""
    from ..kernels import scatter_or as _so
    if cbf.is_u64:
        return False
    nwords = cbf.size // _counters_per_word(cbf)
    return (nwords <= (1 << 27) and nwords >= _so.WIN_WORDS
            and jax.default_backend() != "cpu")


def gather_counters_kernel(cbf: CountingBloomFilter, pos: jax.Array):
    """Gather counters[pos] through the windowed gather kernel: bitcast
    the counter plane to uint32 words, address each counter by its bit
    position (sub-word counters ride the same lane-extract the Bloom
    query uses), sort/gather/un-sort. Returns (counts uint32[pos.shape],
    overflow_count)."""
    from ..kernels import gather_words as _gw
    per = _counters_per_word(cbf)
    bits = 32 // per
    flat = pos.reshape(-1).astype(jnp.uint32) * jnp.uint32(bits)
    idx = jnp.arange(flat.shape[0], dtype=jnp.int32)
    p_s, idx_s = jax.lax.sort((flat, idx), num_keys=1, is_stable=False)
    w_s, over = _gw.gather_words_sorted(_as_u32_words(cbf), p_s)
    elmask = jnp.uint32((1 << bits) - 1 if bits < 32 else 0xFFFFFFFF)
    v_s = (w_s >> (p_s & 31)) & elmask
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
    hashes U64[..., h] -> counts[...] (a U64 limb pair for uint64 filters).

    On TPU, large filters route the counter gathers through the Mosaic
    windowed gather kernel; ``use_kernel`` forces the choice (None =
    auto). Window-overflow batches recompute via the XLA gather."""
    pos = _positions(cbf, hashes)
    if cbf.is_u64:
        return _min_count_u64(cbf, pos)
    if use_kernel is None:
        # same fixed-cost crossover as mibf.at_rank (bench/mibf_probe.py)
        use_kernel = _gather_kernel_eligible(cbf) and pos.size >= (1 << 21)
    if not use_kernel:
        return jnp.min(cbf.counters[pos], axis=-1)
    vals, over = gather_counters_kernel(cbf, pos)
    mn_k = jnp.min(vals, axis=-1).astype(cbf.counters.dtype)
    return jax.lax.cond(
        over > 0,
        lambda: jnp.min(cbf.counters[pos], axis=-1),
        lambda: mn_k)


def contains(cbf: CountingBloomFilter, hashes: U64,
             use_kernel: bool | None = None) -> jax.Array:
    mc = min_count(cbf, hashes, use_kernel)
    if cbf.is_u64:
        thr = u64.from_u64_int(int(cbf.count_threshold))
        return u64.ge(mc, u64.broadcast_to(thr, mc.hi.shape))
    return mc >= jnp.asarray(cbf.count_threshold, cbf.counters.dtype)


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

    dtype = cbf.counters.dtype

    def step(counters, inp):
        p, ok = inp
        cur = counters[p]                          # [h]
        mn = jnp.min(cur)
        new = (mn + jnp.asarray(1, dtype)).astype(dtype)
        frozen = new < mn                          # wraparound => freeze
        do = ok & ~frozen
        upd = jnp.where(do & (cur == mn), new, cur)
        return counters.at[p].set(upd), None

    counters, _ = jax.lax.scan(step, cbf.counters, (pos, v))
    return dataclasses.replace(cbf, counters=counters)


def _group_closed_form(counters, pos, c, dtype, counter_max, apply_mask,
                       size):
    """Closed form for ``c`` conservative updates of ONE frame (position
    multiset ``pos`` [n, h]): each update increments the current minimum
    set by one, so after c updates every counter is max(cur, mn + inc) with
    inc = min(c, counter_max - mn) (the freeze rule stops increments once
    the minimum hits the dtype max — incrementMin's overflow check,
    CountingBloomFilter.hpp:146-149). Rows with apply_mask False write
    nothing."""
    safe_pos = jnp.where(apply_mask[:, None], pos, 0).astype(jnp.int32)
    cur = counters[safe_pos]
    mn32 = jnp.min(cur, axis=-1).astype(jnp.uint32)
    cmax = jnp.asarray(counter_max, jnp.uint32)
    inc = jnp.minimum(c.astype(jnp.uint32), cmax - mn32)
    target = (mn32 + inc).astype(dtype)
    upd = jnp.maximum(cur, target[:, None])
    dest = jnp.where(apply_mask[:, None], safe_pos, size)  # drop when masked
    return counters.at[dest].set(upd, mode="drop")


def insert(cbf: CountingBloomFilter, hashes: U64, valid=None,
           max_entangled: int | None = None) -> CountingBloomFilter:
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
    processed by the sequential mirror instead (still exact).
    """
    h = hashes.hi.shape[-1]
    pos = _positions(cbf, hashes).reshape(-1, h).astype(jnp.uint32)
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
    counters = insert_positions(cbf.counters, pos, v, cbf.counter_max,
                                cbf.size, max_entangled)
    return dataclasses.replace(cbf, counters=counters)


def _conservative_decompose(pos: jax.Array, v: jax.Array,
                            max_entangled: int | None, size: int):
    """Shared decomposition of the batched conservative update: group
    frames by identical position multiset, split untangled groups (no
    position shared with another group) from entangled ones, and compact
    the entangled frames in stream order. Pure position logic —
    independent of the counter representation."""
    n, h = pos.shape
    sent = jnp.uint32(0xFFFFFFFF)  # > any position (size <= 2**32-1)
    pos = jnp.where(v[:, None], pos.astype(jnp.uint32), sent)

    # --- 1. group by identical position multiset -------------------------
    key = jnp.sort(pos, axis=-1)                       # [n, h] frame key
    order0 = jnp.arange(n, dtype=jnp.int32)
    sorted_ops = jax.lax.sort(
        tuple(key[:, j] for j in range(h)) + (order0,), num_keys=h)
    ks = jnp.stack(sorted_ops[:h], axis=1)             # [n, h] sorted keys
    frame_of = sorted_ops[h]                           # original frame idx
    new_grp = jnp.ones((n,), bool).at[1:].set(
        jnp.any(ks[1:] != ks[:-1], axis=1))

    # run id and run length per sorted row (log-depth scans, no scatter)
    gid = jnp.cumsum(new_grp.astype(jnp.int32)) - 1
    idx = jnp.arange(n, dtype=jnp.int32)
    run_start = jnp.where(new_grp, idx, 0)
    run_start = jax.lax.associative_scan(jnp.maximum, run_start)
    is_last = jnp.ones((n,), bool).at[:-1].set(new_grp[1:])
    run_end = jnp.where(is_last, idx, n - 1)
    run_end = jax.lax.associative_scan(jnp.minimum, run_end, reverse=True)
    run_len = run_end - run_start + 1

    # --- 2. entanglement: positions shared across groups -----------------
    pair_pos = ks.reshape(-1)                          # [n*h], gid-major
    pair_gid = jnp.repeat(gid, h)
    pidx = jnp.arange(n * h, dtype=jnp.uint32)
    pp_s, pg_s, pi_s = jax.lax.sort((pair_pos, pair_gid, pidx), num_keys=1)
    shared_prev = jnp.zeros((n * h,), bool).at[1:].set(
        (pp_s[1:] == pp_s[:-1]) & (pg_s[1:] != pg_s[:-1])
        & (pp_s[1:] != sent))
    shared = shared_prev | jnp.concatenate(
        [shared_prev[1:], jnp.zeros(1, bool)])
    # un-permute the 1-bit flag with the packed-key trick
    packed = jnp.sort((pi_s << 1) | shared.astype(jnp.uint32))
    frame_shared = jnp.any((packed & 1).reshape(n, h) == 1, axis=1)
    # group-wide flag: any shared frame inside the run marks the whole run
    last_shared = jax.lax.associative_scan(
        jnp.maximum, jnp.where(frame_shared, idx, -1))
    next_shared = jax.lax.associative_scan(
        jnp.minimum, jnp.where(frame_shared, idx, n), reverse=True)
    entangled_s = (last_shared >= run_start) | (next_shared <= run_end)

    live_s = ks[:, 0] != sent                            # frame is valid
    entangled_s = entangled_s & live_s
    rep = new_grp & live_s & ~entangled_s

    # --- compact entangled frames, ordered by original stream position ---
    if max_entangled is not None:
        cap = max_entangled
    else:
        # expected entangled frames ~ 2 * collision pairs
        #   = (n*h)**2 / size; 2x margin + slack (Poisson concentration
        # makes overrun vanishingly unlikely at these counts)
        expected = (n * h) ** 2 // max(size, 1)
        cap = max(256, 2 * expected + 1024)
    cap = min(cap, n)
    n_ent = jnp.sum(entangled_s.astype(jnp.int32))
    ent_key = jnp.where(entangled_s, frame_of, jnp.int32(n))
    ent_sorted = jax.lax.sort(ent_key)[:cap]
    ent_pos = pos[jnp.minimum(ent_sorted, n - 1)]
    ent_ok = ent_sorted < n
    return dict(pos=pos, sent=sent, ks=ks, run_len=run_len, rep=rep,
                cap=cap, n_ent=n_ent, ent_pos=ent_pos, ent_ok=ent_ok)


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
        # un-permute position-major constraints to frame-major slots
        # (pi_s is a permutation -> unique_indices)
        need = jnp.zeros(cap * h, jnp.int32).at[pi_s].set(
            dprev + 1, unique_indices=True)
        need_f = jnp.max(need.reshape(cap, h), axis=1)
        new = jnp.where(live, jnp.maximum(depth, need_f), 0)
        return new, jnp.any(new != depth), it + 1

    depth, changed, _ = jax.lax.while_loop(
        lambda st: st[1] & (st[2] < max_rounds), body,
        (live.astype(jnp.int32), jnp.bool_(True), jnp.int32(0)))
    return depth, jnp.max(depth), ~changed


def insert_positions(counters: jax.Array, pos: jax.Array, v: jax.Array,
                     counter_max: int, size: int,
                     max_entangled: int | None = None) -> jax.Array:
    """Position-level core of :func:`insert` (the group-collapse +
    entangled-replay decomposition): conservative-update ``counters``
    (uint array[size]) with frames ``pos`` (uint32[n, h] indices < size,
    invalid frames masked by ``v`` bool[n]), bit-identical to stream
    order. Shared by the single-device path and the sharded distributed
    path (parallel/dist_counting.py), which runs it on a compacted table
    of the touched counters only."""
    d = _conservative_decompose(pos, v, max_entangled, size)

    # --- 3. closed form for untangled groups (their representatives) -----
    counters0 = counters
    counters = _group_closed_form(counters0, d["ks"], d["run_len"],
                                  counters0.dtype, counter_max,
                                  d["rep"], size)

    # --- 4. sequential replay of entangled frames in stream order --------
    dtype = counters0.dtype

    def step(cs, inp):
        p, ok = inp
        p32 = p.astype(jnp.int32)
        curf = cs[p32]
        m = jnp.min(curf)
        new = (m + jnp.asarray(1, dtype)).astype(dtype)
        frozen = new < m
        do = ok & ~frozen
        upd = jnp.where(do & (curf == m), new, curf)
        return cs.at[p32].set(jnp.where(do, upd, curf)), None

    def replay(cs):
        depth, max_depth, sched_ok = _replay_schedule(
            d["ent_pos"], d["n_ent"], d["sent"])
        p32 = d["ent_pos"].astype(jnp.int32)

        def rounds(cs):
            # one batched conservative step per depth round (frames of a
            # round are pairwise position-disjoint by construction)
            def rbody(st):
                r, cs = st
                on = depth == r
                safe = jnp.where(on[:, None], p32, 0)
                cur = cs[safe]                           # [cap, h]
                mn = jnp.min(cur, axis=1)
                new = (mn + jnp.asarray(1, dtype)).astype(dtype)
                frozen = new < mn
                do = on & ~frozen
                upd = jnp.where(do[:, None] & (cur == mn[:, None]),
                                jnp.broadcast_to(new[:, None], cur.shape),
                                cur)
                dest = jnp.where(do[:, None], safe, jnp.int32(size))
                return r + 1, cs.at[dest].set(upd, mode="drop")

            return jax.lax.while_loop(lambda st: st[0] <= max_depth,
                                      rbody, (jnp.int32(1), cs))[1]

        def seq(cs):
            # dependency chain longer than the scheduler bound: exact
            # per-frame replay with a dynamic trip count
            stop = jnp.minimum(d["n_ent"], jnp.int32(d["cap"]))

            def body(st):
                i, cs = st
                pf = jax.lax.dynamic_index_in_dim(d["ent_pos"], i, axis=0,
                                                  keepdims=False)
                cs2, _ = step(cs, (pf, jnp.bool_(True)))
                return i + 1, cs2

            return jax.lax.while_loop(lambda st: st[0] < stop, body,
                                      (jnp.int32(0), cs))[1]

        return jax.lax.cond(sched_ok, rounds, seq, cs)

    counters = jax.lax.cond(d["n_ent"] > 0, replay, lambda cs: cs, counters)

    # too many entangled frames for the buffer: redo everything serially
    def full_sequential(_):
        out, _ = jax.lax.scan(
            step, counters0,
            (d["pos"], v & (d["pos"][:, 0] != d["sent"])))
        return out

    counters = jax.lax.cond(d["n_ent"] > d["cap"], full_sequential,
                            lambda _: counters, None)
    return counters


def insert_positions_u64(lo: jax.Array, hi: jax.Array, pos: jax.Array,
                         v: jax.Array, size: int,
                         max_entangled: int | None = None):
    """uint64 twin of :func:`insert_positions` on the dual uint32 planes:
    the same group-collapse + entangled-replay decomposition with exact
    64-bit min/increment/freeze arithmetic. Returns (lo, hi)."""
    d = _conservative_decompose(pos, v, max_entangled, size)
    n, h = pos.shape
    lo0, hi0 = lo, hi

    # --- closed form for untangled groups --------------------------------
    # after c updates every counter is max64(cur, mn + inc) with
    # inc = min(c, (2**64-1) - mn)
    rep = d["rep"]
    ks = d["ks"]
    safe_ks = jnp.where(rep[:, None], ks, 0).astype(jnp.int32)
    clo = lo0[safe_ks]
    chi = hi0[safe_ks]
    mn = U64(chi[:, 0], clo[:, 0])
    for j in range(1, h):
        mn = u64.min_(mn, U64(chi[:, j], clo[:, j]))
    c64 = U64(jnp.zeros_like(mn.hi), d["run_len"].astype(jnp.uint32))
    headroom = u64.sub(u64.full_like(mn, (1 << 64) - 1), mn)
    inc = u64.select(u64.lt(c64, headroom), c64, headroom)
    target = u64.add(mn, inc)
    t_hi = jnp.broadcast_to(target.hi[:, None], chi.shape)
    t_lo = jnp.broadcast_to(target.lo[:, None], clo.shape)
    takes = u64.lt(U64(chi, clo), U64(t_hi, t_lo))
    upd_lo = jnp.where(takes, t_lo, clo)
    upd_hi = jnp.where(takes, t_hi, chi)
    dest = jnp.where(rep[:, None], safe_ks, size)
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


def _counters_per_word(cbf: CountingBloomFilter) -> int:
    return {1: 4, 2: 2, 4: 1, 8: 1}[cbf.counter_width]


def _as_u32_words(cbf: CountingBloomFilter) -> jax.Array:
    """Pack the counter plane into little-endian uint32 words.

    Built from 1-D strided slices + shifts: a ``reshape(-1, per)`` bitcast
    materializes a [nwords, per] temp whose minor dim the TPU tiles to 128
    lanes — a 32x padding blow-up (16 GB for a 128 MB uint8 plane,
    measured)."""
    per = _counters_per_word(cbf)
    if per == 1:
        return cbf.counters
    bits = 32 // per
    c = cbf.counters.astype(jnp.uint32)
    w = c[0::per]
    for j in range(1, per):
        w = w | (c[j::per] << jnp.uint32(bits * j))
    return w


def _from_u32_words(words: jax.Array, cbf: CountingBloomFilter) -> jax.Array:
    """Unpack uint32 words back to the counter plane (1-D strided writes;
    see _as_u32_words for why not a bitcast+reshape)."""
    per = _counters_per_word(cbf)
    if per == 1:
        return words
    bits = 32 // per
    mask = jnp.uint32((1 << bits) - 1)
    out = jnp.empty(cbf.size, cbf.counters.dtype)
    for j in range(per):
        out = out.at[j::per].set(
            ((words >> jnp.uint32(bits * j)) & mask).astype(
                cbf.counters.dtype))
    return out


def _kernel_eligible(cbf: CountingBloomFilter) -> bool:
    from ..kernels import scatter_or as _so
    if cbf.is_u64:
        return False
    nwords = cbf.size // _counters_per_word(cbf)
    return (cbf.size < (1 << 31) and nwords >= _so.WIN_WORDS
            and jax.default_backend() != "cpu")


def insert_all(cbf: CountingBloomFilter, hashes: U64, valid=None,
               use_kernel: bool | None = None) -> CountingBloomFilter:
    """Vectorized incrementAll (CountingBloomFilter.hpp:165-183): every
    counter addressed by every frame is incremented once per occurrence,
    saturating at the counter max. Order-independent => single scatter-add.

    On TPU, large filters route through the Mosaic saturating histogram
    kernel (kernels/scatter_add.py): counter indices are sorted and
    histogrammed window-wise on the MXU into the packed uint32 view of
    the counter array; window-overflow indices are re-applied through
    the XLA scatter-add under a lax.cond. ``use_kernel`` forces the
    choice (None = auto)."""
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
    if use_kernel is None:
        use_kernel = _kernel_eligible(cbf)
    if use_kernel:
        from ..kernels import scatter_add as _sa
        sent = jnp.uint32(0xFFFFFFFF)
        p = pos.astype(jnp.uint32)
        if v is not None:
            p = jnp.where(v, p, sent)
        p_s = jax.lax.sort((p,), is_stable=False)[0]
        words, ovf = _sa.scatter_add_sorted(
            _as_u32_words(cbf), p_s, _counters_per_word(cbf),
            cbf.counter_max)
        counters = _from_u32_words(words, cbf)

        def reapply(cs):
            # index with uint32: the 0xFFFFFFFF sentinel stays out of
            # bounds and is dropped (an int32 cast would wrap -1 to the
            # last counter)
            occ = jnp.zeros((cbf.size,), jnp.uint32).at[ovf].add(
                1, mode="drop")
            wide = jnp.minimum(cs.astype(jnp.uint32) + occ,
                               jnp.uint32(cbf.counter_max))
            return wide.astype(cs.dtype)

        counters = jax.lax.cond(jnp.any(ovf != sent), reapply,
                                lambda cs: cs, counters)
        return dataclasses.replace(cbf, counters=counters)
    ones = jnp.ones(pos.shape, jnp.uint32) if v is None \
        else v.astype(jnp.uint32)
    occ = jnp.zeros((cbf.size,), jnp.uint32).at[pos].add(ones, mode="drop")
    wide = cbf.counters.astype(jnp.uint32) + occ  # may exceed counter max
    # counts can't overflow uint32 here unless batch >= 2**32 entries
    clamped = jnp.minimum(wide, jnp.uint32(cbf.counter_max))
    return dataclasses.replace(cbf, counters=clamped.astype(cbf.counters.dtype))


# ---------------------------------------------------------------------------
# stats
# ---------------------------------------------------------------------------

def pop_count(cbf: CountingBloomFilter) -> jax.Array:
    """Non-zero counters (CountingBloomFilter.hpp:217-228)."""
    if cbf.is_u64:
        return jnp.sum(((cbf.counters[0] | cbf.counters[1]) != 0)
                       .astype(jnp.uint32))
    return jnp.sum((cbf.counters != 0).astype(jnp.uint32))


def filtered_pop_count(cbf: CountingBloomFilter) -> jax.Array:
    """Counters >= threshold (CountingBloomFilter.hpp:231-242)."""
    if cbf.is_u64:
        thr = u64.broadcast_to(u64.from_u64_int(int(cbf.count_threshold)),
                               cbf.counters[0].shape)
        ge = u64.ge(U64(cbf.counters[1], cbf.counters[0]), thr)
        return jnp.sum(ge.astype(jnp.uint32))
    thr = jnp.asarray(cbf.count_threshold, cbf.counters.dtype)
    return jnp.sum((cbf.counters >= thr).astype(jnp.uint32))


def fpr(cbf: CountingBloomFilter) -> jax.Array:
    return jnp.power(pop_count(cbf).astype(jnp.float32) / cbf.size,
                     jnp.float32(cbf.hash_num))


def filtered_fpr(cbf: CountingBloomFilter) -> jax.Array:
    return jnp.power(filtered_pop_count(cbf).astype(jnp.float32) / cbf.size,
                     jnp.float32(cbf.hash_num))
