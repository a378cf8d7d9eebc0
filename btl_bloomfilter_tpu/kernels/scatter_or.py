"""Mosaic kernel: bit-scatter-OR of sorted positions via MXU histograms.

XLA lowers scatter to a ~serial per-element loop (~6-9 ns/element measured,
docs/PERFORMANCE.md). This kernel instead factors each word index inside a
sliding window as (hi, lo) and computes the window's delta as a one-hot
matmul on the MXU:

    delta2d[hi, lo] = sum_c onehot_hi[c, hi] * (onehot_lo[c, lo] * m_c)
                    = A^T @ B

Positions must be SORTED and DEDUPLICATED (the caller's sort pipeline
already guarantees both; padding entries are the 0xFFFFFFFF sentinel).
Each grid step owns one chunk of C positions whose window base (the
64-word-aligned word of its first live position) is scalar-prefetched.
Positions that overflow a chunk's window are counted and returned; the
caller re-applies them through the XLA scatter path (rare: windows are
4x the expected span of a uniform hash stream).

Masks are split into 16-bit halves so f32 accumulation is exact: bits in
a window word are distinct after dedupe, so each half-sum < 2**16 < 2**24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# chunk of positions per grid step / window size in words
CHUNK = 1024              # XLA tiles 1-D u32 operands at 1024
WIN_WORDS = 16384         # 128-word aligned window (64 KB)
_WLO = 128                # lane dimension (TPU tiling requires 128)
_WHI = WIN_WORDS // _WLO  # 64
_SENT = np.uint32(0xFFFFFFFF)


def _kernel(bases_ref, pos_ref, words_hbm, out_hbm, over_ref,
            win, sem_in, sem_out):
    c = pl.program_id(0)
    base = bases_ref[c]                       # word base, multiple of 64

    # read the current window from the (aliased) output buffer so each grid
    # step observes previous steps' writes (read-modify-write; grid steps
    # run sequentially on the core)
    del words_hbm  # same buffer as out_hbm via input_output_aliases
    row = base // _WLO
    read = pltpu.make_async_copy(
        out_hbm.at[pl.ds(row, _WHI), :], win, sem_in)
    read.start()

    pos = pos_ref[...]                        # [CHUNK] uint32, sorted
    live = pos != _SENT
    word = (pos >> 5).astype(jnp.int32)
    local = word - base                       # window-relative word index
    in_win = live & (local >= 0) & (local < WIN_WORDS)
    over_ref[c] = jnp.sum((live & ~in_win).astype(jnp.int32))

    lw = jnp.where(in_win, local, -1)
    hi = lw // _WLO                           # [CHUNK] in [0, _WHI)
    lo = jnp.where(in_win, local % _WLO, -1)
    mask = jnp.uint32(1) << (pos & 31)
    # 16-bit halves are powers of two -> exact in bf16 (8-bit significand);
    # Mosaic lacks uint32<->float casts so go through int32
    m_lo = (mask & 0xFFFF).astype(jnp.int32).astype(jnp.bfloat16)
    m_hi = (mask >> 16).astype(jnp.int32).astype(jnp.bfloat16)

    # lane-major one-hots: hi/lo are 1-D lane vectors, so [None, :]
    # broadcasts along sublanes for free (a [:, None] minor-dim insert
    # would relayout lane->sublane, measured ~2x whole-kernel cost)
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (_WHI, CHUNK), 0)
    at = (hi[None, :] == iota_hi).astype(jnp.bfloat16)        # [WHI, C]
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_WLO, CHUNK), 0)
    bt = (lo[None, :] == iota_lo).astype(jnp.bfloat16)        # [WLO, C]

    # two half-matmuls contracting the position axis (lanes of both
    # operands); bf16 x bf16 -> f32 accumulation is exact here: each output
    # word-half receives a sum of distinct bits < 2**16
    dims = (((1,), (1,)), ((), ()))
    p_lo = jax.lax.dot_general(at, bt * m_lo[None, :], dims,
                               preferred_element_type=jnp.float32)
    p_hi = jax.lax.dot_general(at, bt * m_hi[None, :], dims,
                               preferred_element_type=jnp.float32)
    plo = p_lo.astype(jnp.int32).astype(jnp.uint32)
    phi = p_hi.astype(jnp.int32).astype(jnp.uint32)
    delta = plo | (phi << 16)                 # [WHI, WLO]

    read.wait()
    win[...] = win[...] | delta

    write = pltpu.make_async_copy(
        win, out_hbm.at[pl.ds(row, _WHI), :], sem_out)
    write.start()
    write.wait()


def scatter_or_sorted(words: jax.Array, pos_sorted: jax.Array,
                      pos_for_base: jax.Array | None = None,
                      interpret: bool = False):
    """OR deduped, sorted bit positions into `words` (uint32[nwords]).

    Returns (new_words, overflow_count). `words` of any length is accepted
    (padded internally to the lane multiple / minimum window size).
    Positions use 0xFFFFFFFF as padding sentinel.
    `pos_for_base` (optional) supplies the array chunk window bases are
    derived from: pass the sorted positions *before* duplicates were
    replaced with sentinels, so a chunk whose first slot is a sentinel
    still gets a base <= all its live positions. Caller must re-apply
    `overflow_count` > 0 batches via the XLA path.
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
    # pad the word array to the lane multiple / minimum window size (bit
    # positions are < 32*nwords_orig, so padding words never receive bits)
    wpad = max(-nwords_orig % _WLO, WIN_WORDS - nwords_orig)
    if wpad > 0:
        wpad += -(nwords_orig + wpad) % _WLO
        words = jnp.concatenate([words, jnp.zeros(wpad, jnp.uint32)])
    nwords = words.shape[0]

    # per-chunk window base: 64-aligned word of the first live position,
    # clamped so the window stays in bounds
    first = pos_for_base[:: CHUNK]
    base = jnp.where(first == _SENT, 0, (first >> 5)).astype(jnp.int32)
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
            pl.BlockSpec(memory_space=pl.ANY),     # updated words (HBM)
            pl.BlockSpec(memory_space=pltpu.SMEM),    # per-chunk overflow
        ),
        scratch_shapes=[
            pltpu.VMEM((_WHI, _WLO), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, over = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nwords // _WLO, _WLO), jnp.uint32),
            jax.ShapeDtypeStruct((int(nchunks),), jnp.int32),
        ),
        input_output_aliases={2: 0},   # words arg -> updated words output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(base, pos_sorted, words.reshape(nwords // _WLO, _WLO))
    return out.reshape(nwords)[:nwords_orig], jnp.sum(over)
