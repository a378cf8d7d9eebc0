"""Mosaic kernel: ring-buffered bit-scatter-OR (delta accumulation).

Successor to kernels/scatter_or.py for the insert hot path. The original
kernel read-modify-writes a 64 KB window per chunk through HBM: every grid
step must wait for the previous step's window write before its own read
(consecutive windows overlap), so the whole DMA schedule serializes with
compute — measured ~3 ms of stall per 4.1M-position step
(docs/PERFORMANCE.md).

This kernel removes the HBM round-trip from the loop entirely. The filter
is viewed as aligned *slots* of SLOT_ROWS x 128 words. A VMEM ring of S
slot buffers tracks the current window; because positions are sorted, the
window only moves forward:

  per chunk c (window = NWIN aligned slots starting at slot s0[c]):
    1. flush slots that fell behind s0[c]: async-write their accumulated
       delta to the HBM delta array (each touched slot written exactly
       once; untouched gap slots are skipped)
    2. zero newly entered slot buffers (draining outstanding flush writes
       first so a buffer is never zeroed mid-DMA)
    3. MXU one-hot histogram of the chunk -> delta[NWIN*SLOT_ROWS, 128]
       (same bf16 half-mask trick as scatter_or.py), OR-ed into the ring

The HBM delta array is aliased to a zeros input, so untouched slots stay
zero; the caller ORs it into the filter words (one fused XLA pass). Flush
writes are fire-and-forget — the only waits are the drain before buffer
reuse (typically issued a full chunk earlier and already complete) — so
DMA overlaps compute instead of fencing it.

Same contract as scatter_or.scatter_or_sorted: positions SORTED and
DEDUPED (sentinel 0xFFFFFFFF padding); positions outside their chunk's
window are counted in the overflow output and the caller re-applies the
batch via the XLA scatter (windows guarantee (NWIN-1)*SLOT_WORDS = 16384
words of coverage, 2x the expected span of a uniform stream at the
densest supported load).

Replaces the per-bit __sync_or_and_fetch loop of the reference
(/root/reference/BloomFilter.hpp:185-194) at TPU batch scale.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 1024                  # positions per grid step
SLOT_ROWS = 32                # rows (of 128 words) per aligned slot
SLOT_WORDS = SLOT_ROWS * 128  # 4096 words per slot
NWIN = 4                      # window = NWIN consecutive slots
S = 8                         # ring depth in slots (must be >= NWIN + 1)
WROWS = NWIN * SLOT_ROWS      # delta rows per chunk (160)
_WLO = 128
_SENT = np.uint32(0xFFFFFFFF)

# state slots in the SMEM scratch
_LO, _ZHI = 0, 1

# in-place (RMW) variant: deeper ring so slot reads prefetch ahead of the
# window, and a chunk lookahead into the scalar-prefetched window schedule
S_RMW = 16                    # ring depth in slots (>= NWIN + lookahead)
PF = 4                        # chunks of read lookahead via s0s
_RHI = 1                      # st[1]: next slot to load (RMW variant)


def _kernel(s0s_ref, pos_ref, zeros_hbm, delta_hbm, over_ref,
            ring, st, wpend, wsem):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    s0 = s0s_ref[c]
    del zeros_hbm  # aliased to delta_hbm; untouched slots stay zero

    @pl.when(c == 0)
    def _init():
        st[_LO] = s0
        st[_ZHI] = s0
        for b in range(S):
            wpend[b] = 0

    def _flush_one(slot_id):
        buf = slot_id % S
        pltpu.make_async_copy(
            ring.at[pl.ds(buf * SLOT_ROWS, SLOT_ROWS), :],
            delta_hbm.at[pl.ds(slot_id * SLOT_ROWS, SLOT_ROWS), :],
            wsem.at[buf]).start()
        wpend[buf] = 1

    def _wait_buf(buf):
        # reconstruct an equal-sized copy descriptor just to wait on this
        # buffer's semaphore (waits are per-buffer so a fresh slot never
        # blocks on writes issued this same step)
        @pl.when(wpend[buf] == 1)
        def _():
            pltpu.make_async_copy(
                ring.at[pl.ds(0, SLOT_ROWS), :],
                delta_hbm.at[pl.ds(0, SLOT_ROWS), :],
                wsem.at[buf]).wait()
            wpend[buf] = 0

    # 1. flush resident slots that fell behind the new window
    nf = jnp.minimum(s0, st[_ZHI])

    def fbody(lo, _):
        _flush_one(lo)
        return lo + 1, 0
    lo, _ = lax.while_loop(lambda a: a[0] < nf,
                           lambda a: fbody(*a), (st[_LO], 0))
    st[_LO] = jnp.maximum(lo, s0)           # jump over untouched gap slots
    zhi0 = jnp.maximum(st[_ZHI], s0)

    # 2. zero newly entered slot buffers, waiting (per buffer) only for a
    # still-in-flight flush write FROM that buffer — issued S-NWIN slots
    # ago in steady state, i.e. long complete
    def zbody(z, _):
        buf = z % S
        _wait_buf(buf)
        ring[pl.ds(buf * SLOT_ROWS, SLOT_ROWS), :] = jnp.zeros(
            (SLOT_ROWS, _WLO), jnp.uint32)
        return z + 1, 0
    zhi, _ = lax.while_loop(lambda a: a[0] < s0 + NWIN,
                            lambda a: zbody(*a), (zhi0, 0))
    st[_ZHI] = zhi

    # 3. one-hot histogram of this chunk (see scatter_or.py for the
    # lane-major / bf16-half-mask rationale; both carry over unchanged).
    # (16-bit compares would halve the vreg count but Mosaic has no
    # 16-bit iota on this hardware.)
    pos = pos_ref[...]
    live = pos != _SENT
    word = (pos >> 5).astype(jnp.int32)
    local = word - s0 * SLOT_WORDS
    in_win = live & (local >= 0) & (local < NWIN * SLOT_WORDS)
    over_ref[c] = jnp.sum((live & ~in_win).astype(jnp.int32))

    lw = jnp.where(in_win, local, -1)
    hi = lw // _WLO
    lo_lane = jnp.where(in_win, local % _WLO, -1)
    mask = jnp.uint32(1) << (pos & 31)
    m_lo = (mask & 0xFFFF).astype(jnp.int32).astype(jnp.bfloat16)
    m_hi = (mask >> 16).astype(jnp.int32).astype(jnp.bfloat16)

    iota_hi = lax.broadcasted_iota(jnp.int32, (WROWS, CHUNK), 0)
    at = (hi[None, :] == iota_hi).astype(jnp.bfloat16)         # [WROWS, C]
    iota_lo = lax.broadcasted_iota(jnp.int32, (_WLO, CHUNK), 0)
    bt = (lo_lane[None, :] == iota_lo).astype(jnp.bfloat16)    # [WLO, C]

    dims = (((1,), (1,)), ((), ()))
    p_lo = lax.dot_general(at, bt * m_lo[None, :], dims,
                           preferred_element_type=jnp.float32)
    p_hi = lax.dot_general(at, bt * m_hi[None, :], dims,
                           preferred_element_type=jnp.float32)
    delta = (p_lo.astype(jnp.int32).astype(jnp.uint32)
             | (p_hi.astype(jnp.int32).astype(jnp.uint32) << 16))

    # 4. OR the delta into the ring, slot by slot (static unroll)
    for i in range(NWIN):
        buf = ((s0 + i) % S) * SLOT_ROWS
        blk = ring[pl.ds(buf, SLOT_ROWS), :]
        ring[pl.ds(buf, SLOT_ROWS), :] = (
            blk | delta[i * SLOT_ROWS:(i + 1) * SLOT_ROWS, :])

    # 5. final step: flush everything still resident, then drain every
    # outstanding write
    @pl.when(c == nc - 1)
    def _tail():
        def tbody(t, _):
            _flush_one(t)
            return t + 1, 0
        tlo, _ = lax.while_loop(lambda a: a[0] < st[_ZHI],
                                lambda a: tbody(*a), (st[_LO], 0))
        st[_LO] = tlo
        for b in range(S):
            _wait_buf(b)


def scatter_or_sorted(words: jax.Array, pos_sorted: jax.Array,
                      pos_for_base: jax.Array | None = None,
                      interpret: bool = False):
    """OR deduped, SORTED bit positions into `words` (uint32[nwords]).

    Drop-in replacement for scatter_or.scatter_or_sorted with the
    ring-buffered delta schedule. Returns (new_words, overflow_count);
    caller must re-apply the batch via the XLA path when overflow > 0.
    """
    n = pos_sorted.shape[0]
    nchunks = pl.cdiv(n, CHUNK)
    npad = nchunks * CHUNK - n
    if pos_for_base is None:
        pos_for_base = pos_sorted
    if npad:
        pos_sorted = jnp.concatenate(
            [pos_sorted, jnp.full(npad, _SENT, jnp.uint32)])
        pos_for_base = jnp.concatenate(
            [pos_for_base, jnp.full(npad, _SENT, jnp.uint32)])
    nwords_orig = words.shape[0]
    wpad = max(-nwords_orig % SLOT_WORDS, NWIN * SLOT_WORDS - nwords_orig)
    if wpad > 0:
        wpad += -(nwords_orig + wpad) % SLOT_WORDS
        words = jnp.concatenate([words, jnp.zeros(wpad, jnp.uint32)])
    nwords = words.shape[0]
    nslots = nwords // SLOT_WORDS

    # per-chunk aligned window start slot. Trailing all-sentinel chunks
    # inherit the previous chunk's slot via the running max so the slot
    # sequence stays non-decreasing (the ring only moves forward).
    first = pos_for_base[:: CHUNK]
    s0 = jnp.where(first == _SENT, 0,
                   (first >> 5) // SLOT_WORDS).astype(jnp.int32)
    s0 = jax.lax.associative_scan(jnp.maximum, s0)
    s0 = jnp.clip(s0, 0, nslots - NWIN)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(int(nchunks),),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c, s0s: (c,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # zeros (HBM, aliased)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),      # delta (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-chunk overflow
        ),
        scratch_shapes=[
            pltpu.VMEM((S * SLOT_ROWS, _WLO), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((S,), jnp.int32),
            pltpu.SemaphoreType.DMA((S,)),
        ],
    )
    delta, over = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nwords // _WLO, _WLO), jnp.uint32),
            jax.ShapeDtypeStruct((int(nchunks),), jnp.int32),
        ),
        input_output_aliases={2: 0},   # zeros arg -> delta output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(s0, pos_sorted,
      jnp.zeros((nwords // _WLO, _WLO), jnp.uint32))
    out = (words | delta.reshape(nwords))[:nwords_orig]
    return out, jnp.sum(over)


# ---------------------------------------------------------------------------
# in-place (read-modify-write) variant
# ---------------------------------------------------------------------------

def _kernel_rmw(s0s_ref, pos_ref, words_in, words_hbm, over_ref,
                ring, st, rpend, wpend, rsem, wsem,
                *, slot_rows, nwin, s, pf):
    """Same window walk as _kernel, but the ring holds the *actual filter
    slots*: each slot is DMA-read from HBM when the window (or the pf-chunk
    lookahead into the prefetched s0s schedule) reaches it, OR-accumulated
    in VMEM, and written back exactly once when the window moves past. This
    removes the full-size delta array and the separate `words | delta` XLA
    pass (~3x the filter size of HBM traffic per step).

    Geometry is parametric (chunk size via pos_ref block, slot_rows, nwin
    window slots, ring depth s, lookahead pf) — the MXU histogram cost is
    proportional to nwin*slot_rows, so smaller chunks with proportionally
    smaller windows do linearly less matmul work per position."""
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    s0 = s0s_ref[c]
    chunk = pos_ref.shape[-1]
    slot_words = slot_rows * _WLO
    wrows = nwin * slot_rows
    del words_in  # aliased to words_hbm (read and written in place)

    @pl.when(c == 0)
    def _init():
        st[_LO] = s0
        st[_RHI] = s0
        for b in range(s):
            rpend[b] = 0
            wpend[b] = 0

    def _wait_read(buf):
        @pl.when(rpend[buf] == 1)
        def _():
            pltpu.make_async_copy(
                words_hbm.at[pl.ds(0, slot_rows), :],
                ring.at[pl.ds(0, slot_rows), :],
                rsem.at[buf]).wait()
            rpend[buf] = 0

    def _flush_one(slot_id):
        buf = slot_id % s
        # a prefetched slot the window skipped may still have its read in
        # flight; never write back a partially loaded buffer
        _wait_read(buf)
        pltpu.make_async_copy(
            ring.at[pl.ds(buf * slot_rows, slot_rows), :],
            words_hbm.at[pl.ds(slot_id * slot_rows, slot_rows), :],
            wsem.at[buf]).start()
        wpend[buf] = 1

    def _load_one(slot_id):
        buf = slot_id % s
        # the buffer's previous occupant (slot_id - s, already flushed
        # because slot_id < LO + s) must finish its write-back before the
        # read overwrites the buffer
        @pl.when(wpend[buf] == 1)
        def _():
            pltpu.make_async_copy(
                ring.at[pl.ds(0, slot_rows), :],
                words_hbm.at[pl.ds(0, slot_rows), :],
                wsem.at[buf]).wait()
            wpend[buf] = 0
        pltpu.make_async_copy(
            words_hbm.at[pl.ds(slot_id * slot_rows, slot_rows), :],
            ring.at[pl.ds(buf * slot_rows, slot_rows), :],
            rsem.at[buf]).start()
        rpend[buf] = 1

    # 1. flush resident slots that fell behind the new window (jumping
    # over never-loaded gap slots)
    nf = jnp.minimum(s0, st[_RHI])

    def fbody(lo, _):
        _flush_one(lo)
        return lo + 1, 0
    lo, _ = lax.while_loop(lambda a: a[0] < nf,
                           lambda a: fbody(*a), (st[_LO], 0))
    st[_LO] = jnp.maximum(lo, s0)
    rhi0 = jnp.maximum(st[_RHI], s0)

    # 2. issue reads up to the lookahead target (future windows are known
    # from the prefetched schedule); ring capacity caps the lookahead
    cf = jnp.minimum(c + pf, nc - 1)
    tgt = jnp.maximum(s0 + nwin, s0s_ref[cf] + nwin)
    tgt = jnp.minimum(tgt, st[_LO] + s)

    def lbody(z, _):
        _load_one(z)
        return z + 1, 0
    rhi, _ = lax.while_loop(lambda a: a[0] < tgt,
                            lambda a: lbody(*a), (rhi0, 0))
    st[_RHI] = rhi

    # 3. the current window's slots must be resident before the OR below
    # (their reads were normally issued pf chunks ago and are complete)
    for i in range(nwin):
        _wait_read((s0 + i) % s)

    # 4. one-hot histogram of this chunk (identical to _kernel)
    pos = pos_ref[...]
    live = pos != _SENT
    word = (pos >> 5).astype(jnp.int32)
    local = word - s0 * slot_words
    in_win = live & (local >= 0) & (local < nwin * slot_words)
    over_ref[c] = jnp.sum((live & ~in_win).astype(jnp.int32))

    lw = jnp.where(in_win, local, -1)
    hi = lw // _WLO
    lo_lane = jnp.where(in_win, local % _WLO, -1)
    mask = jnp.uint32(1) << (pos & 31)
    m_lo = (mask & 0xFFFF).astype(jnp.int32).astype(jnp.bfloat16)
    m_hi = (mask >> 16).astype(jnp.int32).astype(jnp.bfloat16)

    iota_hi = lax.broadcasted_iota(jnp.int32, (wrows, chunk), 0)
    at = (hi[None, :] == iota_hi).astype(jnp.bfloat16)         # [wrows, C]
    iota_lo = lax.broadcasted_iota(jnp.int32, (_WLO, chunk), 0)
    bt = (lo_lane[None, :] == iota_lo).astype(jnp.bfloat16)    # [WLO, C]

    dims = (((1,), (1,)), ((), ()))
    p_lo = lax.dot_general(at, bt * m_lo[None, :], dims,
                           preferred_element_type=jnp.float32)
    p_hi = lax.dot_general(at, bt * m_hi[None, :], dims,
                           preferred_element_type=jnp.float32)
    delta = (p_lo.astype(jnp.int32).astype(jnp.uint32)
             | (p_hi.astype(jnp.int32).astype(jnp.uint32) << 16))

    # 5. OR the delta into the resident slots
    for i in range(nwin):
        buf = ((s0 + i) % s) * slot_rows
        blk = ring[pl.ds(buf, slot_rows), :]
        ring[pl.ds(buf, slot_rows), :] = (
            blk | delta[i * slot_rows:(i + 1) * slot_rows, :])

    # 6. final step: flush everything resident, then drain every write
    @pl.when(c == nc - 1)
    def _tail():
        def tbody(t, _):
            _flush_one(t)
            return t + 1, 0
        tlo, _ = lax.while_loop(lambda a: a[0] < st[_RHI],
                                lambda a: tbody(*a), (st[_LO], 0))
        st[_LO] = tlo
        for b in range(s):
            @pl.when(wpend[b] == 1)
            def _():
                pltpu.make_async_copy(
                    ring.at[pl.ds(0, slot_rows), :],
                    words_hbm.at[pl.ds(0, slot_rows), :],
                    wsem.at[b]).wait()
                wpend[b] = 0


def scatter_or_sorted_inplace(words: jax.Array, pos_sorted: jax.Array,
                              pos_for_base: jax.Array | None = None,
                              interpret: bool = False,
                              chunk: int = CHUNK,
                              slot_rows: int = SLOT_ROWS,
                              nwin: int = NWIN,
                              s: int = S_RMW,
                              pf: int = PF):
    """OR deduped, SORTED bit positions directly into `words` (the input
    buffer is aliased to the output — callers should treat it as consumed).

    Same contract and return as :func:`scatter_or_sorted`, but the filter
    words are read-modify-written in place through the VMEM ring instead of
    accumulating a separate delta array, saving ~3 filter-sizes of HBM
    traffic per step. Returns (new_words, overflow_count); caller must
    re-apply the batch via the XLA path when overflow > 0 (OR is
    idempotent, so re-applying over the partial in-place result is exact).

    Geometry knobs (chunk/slot_rows/nwin/s/pf) trade window coverage
    against per-position matmul work; defaults match the module constants.
    """
    import functools as _ft

    slot_words = slot_rows * _WLO
    n = pos_sorted.shape[0]
    nchunks = pl.cdiv(n, chunk)
    npad = nchunks * chunk - n
    if pos_for_base is None:
        pos_for_base = pos_sorted
    if npad:
        pos_sorted = jnp.concatenate(
            [pos_sorted, jnp.full(npad, _SENT, jnp.uint32)])
        pos_for_base = jnp.concatenate(
            [pos_for_base, jnp.full(npad, _SENT, jnp.uint32)])
    nwords_orig = words.shape[0]
    wpad = max(-nwords_orig % slot_words, nwin * slot_words - nwords_orig)
    if wpad > 0:
        wpad += -(nwords_orig + wpad) % slot_words
        words = jnp.concatenate([words, jnp.zeros(wpad, jnp.uint32)])
    nwords = words.shape[0]
    nslots = nwords // slot_words

    first = pos_for_base[:: chunk]
    s0 = jnp.where(first == _SENT, 0,
                   (first >> 5) // slot_words).astype(jnp.int32)
    s0 = jax.lax.associative_scan(jnp.maximum, s0)
    s0 = jnp.clip(s0, 0, nslots - nwin)

    if chunk % 1024:
        # XLA tiles 1-D u32 operands at 1024; smaller blocks fail Mosaic
        # layout verification (and (1, chunk) 2-D blocks fail the 8-sublane
        # minimum), so the chunk size must stay a multiple of 1024
        raise ValueError("chunk must be a multiple of 1024")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(int(nchunks),),
        in_specs=[
            pl.BlockSpec((chunk,), lambda c, s0s: (c,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # words (HBM, aliased)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),      # words out (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-chunk overflow
        ),
        scratch_shapes=[
            pltpu.VMEM((s * slot_rows, _WLO), jnp.uint32),
            pltpu.SMEM((2,), jnp.int32),
            pltpu.SMEM((s,), jnp.int32),
            pltpu.SMEM((s,), jnp.int32),
            pltpu.SemaphoreType.DMA((s,)),
            pltpu.SemaphoreType.DMA((s,)),
        ],
    )
    out, over = pl.pallas_call(
        _ft.partial(_kernel_rmw, slot_rows=slot_rows, nwin=nwin, s=s,
                    pf=pf),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nwords // _WLO, _WLO), jnp.uint32),
            jax.ShapeDtypeStruct((int(nchunks),), jnp.int32),
        ),
        input_output_aliases={2: 0},   # words arg -> words output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(s0, pos_sorted, words.reshape(nwords // _WLO, _WLO))
    return out.reshape(nwords)[:nwords_orig], jnp.sum(over)
