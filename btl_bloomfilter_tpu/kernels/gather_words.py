"""Mosaic kernel: gather filter words at sorted bit positions via the MXU.

The query-side twin of kernels/scatter_or.py. XLA lowers gather on TPU to a
~serial per-element loop (~15 ns/element measured, docs/PERFORMANCE.md);
for the Bloom `contains` hot path that is ~63 ms per 4.1M positions. This
kernel walks SORTED positions in chunks, DMAs one 64 KB window of the word
array into VMEM per chunk, and selects each position's word with one-hot
matmuls instead of scalar loads:

    row_c[lo]  = sum_hi onehot_hi[c, hi] * win[hi, lo]      (MXU)
    word_c     = sum_lo onehot_lo[c, lo] * row_c[lo]        (VPU reduce)

Window words are split into four 8-bit quarters: the TPU MXU computes f32
matmuls as single-pass bf16 by default, which is exact only for integer
operands below 2**8 (bf16 has an 8-bit significand). One-hot entries and
byte values are bf16-exact, and the f32 accumulator sums a single nonzero
product per output, so four quarter-matmuls reconstruct the exact word.
(Measured on hardware: a 16-bit-half split silently truncates and loses
~3% of set bits.)

Positions must be SORTED (duplicates are fine for a gather); padding is
the 0xFFFFFFFF sentinel, which yields word 0. Positions falling outside a
chunk's window are counted in the overflow output and yield word 0; the
caller re-runs the batch through the XLA gather when overflow > 0 (rare:
windows are ~4x the expected chunk span of a uniform hash stream).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scatter_or import CHUNK, WIN_WORDS, _SENT, _WHI, _WLO


def _make_kernel(shift: int):
    """Gather kernel factory. ``shift`` maps a position to its word index
    (5 for bit positions; the packed-counter sub-index log2 for counter
    indices — word addressing keeps counter indices < 2**32 usable even
    when their BIT positions would overflow 32 bits, e.g. 2**30 uint8
    counters)."""
    return functools.partial(_kernel, shift)


def _kernel(shift, bases_ref, pos_ref, words_hbm, out_ref, over_ref,
            win, sem_in):
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    base = bases_ref[c]                       # word base, multiple of 128
    cur = c % 2
    nxt = (c + 1) % 2

    # double-buffered window DMA: the window schedule (bases) is scalar-
    # prefetched, so chunk c+1's read is issued during chunk c's compute;
    # the wait below normally returns immediately
    @pl.when(c == 0)
    def _first():
        pltpu.make_async_copy(
            words_hbm.at[pl.ds(base // _WLO, _WHI), :],
            win.at[cur], sem_in.at[cur]).start()

    @pl.when(c + 1 < nc)
    def _prefetch():
        pltpu.make_async_copy(
            words_hbm.at[pl.ds(bases_ref[c + 1] // _WLO, _WHI), :],
            win.at[nxt], sem_in.at[nxt]).start()

    pos = pos_ref[...]                        # [CHUNK] uint32, sorted
    live = pos != _SENT
    word = (pos >> shift).astype(jnp.int32)
    local = word - base                       # window-relative word index
    in_win = live & (local >= 0) & (local < WIN_WORDS)
    over_ref[c] = jnp.sum((live & ~in_win).astype(jnp.int32))

    lw = jnp.where(in_win, local, 0)          # safe index for the one-hots
    hi = lw // _WLO                           # [CHUNK] in [0, _WHI)
    lo = lw % _WLO

    # lane-major one-hots ([W, C] with positions along lanes): [None, :]
    # broadcasts along sublanes for free, where a [:, None] minor-dim
    # insert would relayout lane->sublane (measured ~2x the kernel cost)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (_WHI, CHUNK), 0)
    at = (hi[None, :] == iota_hi).astype(jnp.bfloat16)        # [WHI, C]
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_WLO, CHUNK), 0)
    bt = (lo[None, :] == iota_lo).astype(jnp.float32)         # [WLO, C]

    pltpu.make_async_copy(
        words_hbm.at[pl.ds(0, _WHI), :], win.at[cur], sem_in.at[cur]).wait()
    w = win[cur]
    # row-select on the MXU (contract the WHI sublanes of both operands),
    # then lane-select as an elementwise product + sublane reduce — every
    # operand stays lane-major, no relayouts
    dims = (((0,), (0,)), ((), ()))
    val = jnp.uint32(0)
    for q in range(4):
        # Mosaic lacks uint32<->float casts; bytes fit int32. Explicit
        # bf16 operands force single-pass MXU matmuls (f32 inputs get a
        # slower multi-pass lowering); bytes and one-hots are bf16-exact
        # and the MXU accumulates in f32, so the result is exact.
        w_q = ((w >> (8 * q)) & jnp.uint32(0xFF)
               ).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
        u_q = jax.lax.dot_general(w_q, at, dims,
                                  preferred_element_type=jnp.float32)
        v_q = jnp.sum(u_q * bt, axis=0).astype(jnp.int32)      # [CHUNK]
        val = val | (v_q.astype(jnp.uint32) << (8 * q))
    out_ref[...] = jnp.where(in_win, val, jnp.uint32(0))


def _kernel2(bases_ref, pos_ref, wa_hbm, wb_hbm, outa_ref, outb_ref,
             over_ref, wina, winb, sem_a, sem_b):
    """Two-array variant: gather the same word index from two equally-sized
    arrays in one window walk (MIBF rank queries read the bv word and its
    cumulative popcount at the same index). The sort, window DMA schedule,
    and one-hot selector matmul operands are all shared."""
    c = pl.program_id(0)
    nc = pl.num_programs(0)
    base = bases_ref[c]
    cur = c % 2
    nxt = (c + 1) % 2

    @pl.when(c == 0)
    def _first():
        row0 = base // _WLO
        pltpu.make_async_copy(wa_hbm.at[pl.ds(row0, _WHI), :],
                              wina.at[cur], sem_a.at[cur]).start()
        pltpu.make_async_copy(wb_hbm.at[pl.ds(row0, _WHI), :],
                              winb.at[cur], sem_b.at[cur]).start()

    @pl.when(c + 1 < nc)
    def _prefetch():
        row1 = bases_ref[c + 1] // _WLO
        pltpu.make_async_copy(wa_hbm.at[pl.ds(row1, _WHI), :],
                              wina.at[nxt], sem_a.at[nxt]).start()
        pltpu.make_async_copy(wb_hbm.at[pl.ds(row1, _WHI), :],
                              winb.at[nxt], sem_b.at[nxt]).start()

    pos = pos_ref[...]
    live = pos != _SENT
    word = (pos >> 5).astype(jnp.int32)
    local = word - base
    in_win = live & (local >= 0) & (local < WIN_WORDS)
    over_ref[c] = jnp.sum((live & ~in_win).astype(jnp.int32))

    lw = jnp.where(in_win, local, 0)
    hi = lw // _WLO
    lo = lw % _WLO

    # lane-major one-hots; see _kernel for the relayout rationale
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (_WHI, CHUNK), 0)
    at = (hi[None, :] == iota_hi).astype(jnp.bfloat16)        # [WHI, C]
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_WLO, CHUNK), 0)
    bt = (lo[None, :] == iota_lo).astype(jnp.float32)         # [WLO, C]

    dims = (((0,), (0,)), ((), ()))

    def extract(w):
        val = jnp.uint32(0)
        for q in range(4):
            w_q = ((w >> (8 * q)) & jnp.uint32(0xFF)
                   ).astype(jnp.int32).astype(jnp.float32
                                              ).astype(jnp.bfloat16)
            u_q = jax.lax.dot_general(w_q, at, dims,
                                      preferred_element_type=jnp.float32)
            v_q = jnp.sum(u_q * bt, axis=0).astype(jnp.int32)
            val = val | (v_q.astype(jnp.uint32) << (8 * q))
        return jnp.where(in_win, val, jnp.uint32(0))

    pltpu.make_async_copy(
        wa_hbm.at[pl.ds(0, _WHI), :], wina.at[cur], sem_a.at[cur]).wait()
    outa_ref[...] = extract(wina[cur])
    pltpu.make_async_copy(
        wb_hbm.at[pl.ds(0, _WHI), :], winb.at[cur], sem_b.at[cur]).wait()
    outb_ref[...] = extract(winb[cur])


def gather_words_pair_sorted(words_a: jax.Array, words_b: jax.Array,
                             pos_sorted: jax.Array,
                             interpret: bool = False):
    """Gather `words_a[pos >> 5]` and `words_b[pos >> 5]` for SORTED uint32
    bit positions in one kernel pass. Same contract as
    :func:`gather_words_sorted`; the two arrays must have equal length."""
    assert words_a.shape == words_b.shape
    n = pos_sorted.shape[0]
    nchunks = pl.cdiv(n, CHUNK)
    npad = nchunks * CHUNK - n
    if npad:
        pos_sorted = jnp.concatenate(
            [pos_sorted, jnp.full(npad, _SENT, jnp.uint32)])
    nwords_orig = words_a.shape[0]
    wpad = max(-nwords_orig % _WLO, WIN_WORDS - nwords_orig)
    if wpad > 0:
        wpad += -(nwords_orig + wpad) % _WLO
        zpad = jnp.zeros(wpad, jnp.uint32)
        words_a = jnp.concatenate([words_a, zpad])
        words_b = jnp.concatenate([words_b, zpad])
    nwords = words_a.shape[0]

    first = pos_sorted[:: CHUNK]
    base = jnp.where(first == _SENT, 0, (first >> 5)).astype(jnp.int32)
    base = jnp.minimum(base & ~jnp.int32(_WLO - 1), nwords - WIN_WORDS)
    base = jnp.maximum(base, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(int(nchunks),),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c, bases: (c,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # words_a (HBM)
            pl.BlockSpec(memory_space=pl.ANY),     # words_b (HBM)
        ],
        out_specs=(
            pl.BlockSpec((CHUNK,), lambda c, bases: (c,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CHUNK,), lambda c, bases: (c,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-chunk overflow
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _WHI, _WLO), jnp.uint32),
            pltpu.VMEM((2, _WHI, _WLO), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    va, vb, over = pl.pallas_call(
        _kernel2,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((int(nchunks) * CHUNK,), jnp.uint32),
            jax.ShapeDtypeStruct((int(nchunks) * CHUNK,), jnp.uint32),
            jax.ShapeDtypeStruct((int(nchunks),), jnp.int32),
        ),
        interpret=interpret,
    )(base, pos_sorted,
      words_a.reshape(nwords // _WLO, _WLO),
      words_b.reshape(nwords // _WLO, _WLO))
    return va[:n], vb[:n], jnp.sum(over)


def gather_words_sorted(words: jax.Array, pos_sorted: jax.Array,
                        interpret: bool = False, shift: int = 5):
    """Gather `words[pos >> shift]` for SORTED uint32 positions.

    The default ``shift=5`` treats positions as BIT positions into the
    uint32 word array (the Bloom query). Packed-counter callers pass the
    counter index directly with ``shift = log2(counters per word)`` so
    filters whose bit positions exceed 32 bits still address words
    exactly (models/counting.py).

    Returns (vals uint32[n], overflow_count). `words` of any length is
    accepted (padded to the lane multiple / minimum window size).
    Sentinel (0xFFFFFFFF) and window-overflow positions yield 0; the
    caller must re-run via the XLA gather when overflow_count > 0.
    """
    n = pos_sorted.shape[0]
    nchunks = pl.cdiv(n, CHUNK)
    npad = nchunks * CHUNK - n
    if npad:
        pos_sorted = jnp.concatenate(
            [pos_sorted, jnp.full(npad, _SENT, jnp.uint32)])
    nwords_orig = words.shape[0]
    wpad = max(-nwords_orig % _WLO, WIN_WORDS - nwords_orig)
    if wpad > 0:
        wpad += -(nwords_orig + wpad) % _WLO
        words = jnp.concatenate([words, jnp.zeros(wpad, jnp.uint32)])
    nwords = words.shape[0]

    first = pos_sorted[:: CHUNK]
    base = jnp.where(first == _SENT, 0, (first >> shift)).astype(jnp.int32)
    base = jnp.minimum(base & ~jnp.int32(_WLO - 1), nwords - WIN_WORDS)
    base = jnp.maximum(base, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(int(nchunks),),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c, bases: (c,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),     # words (HBM)
        ],
        out_specs=(
            pl.BlockSpec((CHUNK,), lambda c, bases: (c,),
                         memory_space=pltpu.VMEM),  # gathered words
            pl.BlockSpec(memory_space=pltpu.SMEM),  # per-chunk overflow
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _WHI, _WLO), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    vals, over = pl.pallas_call(
        _make_kernel(shift),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((int(nchunks) * CHUNK,), jnp.uint32),
            jax.ShapeDtypeStruct((int(nchunks),), jnp.int32),
        ),
        interpret=interpret,
    )(base, pos_sorted, words.reshape(nwords // _WLO, _WLO))
    return vals[:n], jnp.sum(over)
