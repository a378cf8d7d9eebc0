"""Pipelined static-window scatter-OR: the Bloom insert hot loop on the MXU.

Replaces the reference's per-bit atomic-OR loop
(/root/reference/BloomFilter.hpp:185-194) with a streaming TPU design:

  * the filter is cut into fixed windows of ``WIN_WORDS`` words; the grid
    iterates windows, and Pallas auto-pipelines (double-buffers) the window
    read, the window write, and the position-chunk reads — there is no
    read-modify-write chain between grid steps, so DMA latency is hidden.
  * positions are SORTED (the caller's dedupe-free sort), so the chunks
    covering window w form a contiguous range; ``SLOTS`` chunk-sized blocks
    starting at a scalar-prefetched chunk index cover it.
  * the window's bit-delta is built as TWO bf16 one-hot matmuls on the MXU
    (mask split into 16-bit halves):

        delta2d[hi, lo] = sum_c onehot_hi[c, hi] * (onehot_lo[c, lo] * m_c)

    bf16 is exact here: one-hot entries are 0/1 and mask halves are powers
    of two (8-bit-significand-representable); accumulation is f32 and each
    output half receives a sum of distinct bits < 2**16.
  * duplicates are dropped in-kernel by an adjacent-compare on the sorted
    stream (all copies of a window's position are always loaded together,
    see _chunk_ranges), so the caller does not pre-compute a keep mask.

Windows whose positions span more than SLOTS chunks (pathologically skewed
streams) are detected by an XLA prepass; the caller falls back to the XLA
scatter for the whole batch in that case (rare: a uniform hash stream's
per-window occupancy is tightly concentrated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_WORDS = 16384          # words per window (64 KB block)
_WLO = 128                 # lane dimension
_WHI = WIN_WORDS // _WLO   # 128 sublane rows
CHUNK = 1024               # positions per chunk block
SLOTS = 4                  # chunk blocks loaded per window
_SENT = np.uint32(0xFFFFFFFF)


def slots_needed(n_positions: int, nwords: int,
                 win_words: int = WIN_WORDS, chunk: int = CHUNK) -> int:
    """Chunk blocks required per window for a uniform stream of
    ``n_positions`` over ``nwords`` words, with 2x skew headroom."""
    nwin = max(1, -(-nwords // win_words))
    ppw = -(-n_positions // nwin)
    return -(-2 * ppw // chunk) + 2


def _kernel(idx_ref, *refs, slots: int):
    pos_refs = refs[:slots]
    words_ref, out_ref = refs[slots], refs[slots + 1]
    w = pl.program_id(0)
    base_word = w * WIN_WORDS

    pos = jnp.concatenate([r[...] for r in pos_refs])   # [SLOTS*CHUNK] u32
    # slot index clipping at the array tail can load the same chunk into
    # two slots; mask out the duplicate slots so bits are not double-added
    slot_ok = jnp.concatenate(
        [jnp.broadcast_to(
            jnp.asarray(True) if s == 0
            else idx_ref[s, w] != idx_ref[s - 1, w], (CHUNK,))
         for s in range(slots)])
    # in-kernel dedupe: drop positions equal to their predecessor in the
    # sorted stream (the first element's true predecessor is never an
    # equal in-window position — see module docstring)
    prev = jnp.concatenate([pos[0:1], pos[:-1]])
    n = pos.shape[0]
    first = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape(n) == 0
    keep = ((pos != prev) | first) & slot_ok

    word = (pos >> 5).astype(jnp.int32)
    local = word - base_word
    in_win = keep & (local >= 0) & (local < WIN_WORDS) & (pos != _SENT)
    hi = jnp.where(in_win, local // _WLO, -1)
    lo = jnp.where(in_win, local % _WLO, -1)
    mask = jnp.uint32(1) << (pos & 31)
    # 16-bit halves: powers of two, exact in bf16; Mosaic lacks u32->float
    # and only reshapes 32-bit vectors, so go 2-D while still int32
    m_lo = (mask & 0xFFFF).astype(jnp.int32)[:, None].astype(jnp.bfloat16)
    m_hi = (mask >> 16).astype(jnp.int32)[:, None].astype(jnp.bfloat16)

    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n, _WHI), 1)
    a = (hi[:, None] == iota_hi).astype(jnp.bfloat16)            # [n, WHI]
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (n, _WLO), 1)
    onehot_lo = (lo[:, None] == iota_lo).astype(jnp.bfloat16)    # [n, WLO]

    dims = (((0,), (0,)), ((), ()))
    p_lo = jax.lax.dot_general(a, onehot_lo * m_lo, dims,
                               preferred_element_type=jnp.float32)
    p_hi = jax.lax.dot_general(a, onehot_lo * m_hi, dims,
                               preferred_element_type=jnp.float32)
    delta = (p_lo.astype(jnp.int32).astype(jnp.uint32)
             | (p_hi.astype(jnp.int32).astype(jnp.uint32) << 16))

    out_ref[...] = words_ref[...] | delta


def _chunk_ranges(pos_sorted: jax.Array, nwin: int, nchunks: int):
    """Per-window covering chunk range from the sorted stream.

    Returns (cs, spans): cs[w] = first chunk whose last position reaches
    window w (clipped), spans[w] = number of chunks window w's positions
    touch. All comparisons in word space (fits int32)."""
    chunk_first = (pos_sorted[::CHUNK] >> 5).astype(jnp.int32)
    chunk_last = (pos_sorted[CHUNK - 1::CHUNK] >> 5).astype(jnp.int32)
    wstart = (jnp.arange(nwin, dtype=jnp.int32) * WIN_WORDS)
    # vectorized searchsorted: tiny [nwin, nchunks] compare
    cs = jnp.sum(chunk_last[None, :] < wstart[:, None], axis=1,
                 dtype=jnp.int32)
    ce = jnp.sum(chunk_first[None, :] < (wstart + WIN_WORDS)[:, None],
                 axis=1, dtype=jnp.int32) - 1
    spans = ce - cs + 1
    cs = jnp.clip(cs, 0, max(nchunks - 1, 0))
    return cs, spans


@functools.partial(jax.jit, static_argnames=("slots", "interpret"))
def scatter_or_windows(words: jax.Array, pos_sorted: jax.Array,
                       slots: int = SLOTS, interpret: bool = False):
    """OR sorted bit positions (duplicates allowed, 0xFFFFFFFF = padding)
    into ``words`` (uint32[nwords]).

    Returns (new_words, overflow: bool). overflow=True means some window's
    positions span more than ``slots`` chunks and the result is INVALID —
    the caller must recompute via the XLA scatter path. Size ``slots`` with
    :func:`slots_needed`.
    """
    n = pos_sorted.shape[0]
    nchunks = -(-n // CHUNK)
    npad = nchunks * CHUNK - n
    if npad:
        pos_sorted = jnp.concatenate(
            [pos_sorted, jnp.full(npad, _SENT, jnp.uint32)])
    nwords_orig = words.shape[0]
    wpad = -nwords_orig % WIN_WORDS
    if wpad:
        words = jnp.concatenate([words, jnp.zeros(wpad, jnp.uint32)])
    nwords = words.shape[0]
    nwin = nwords // WIN_WORDS

    cs, spans = _chunk_ranges(pos_sorted, nwin, nchunks)
    overflow = jnp.any(spans > slots)
    idx = jnp.stack([jnp.clip(cs + s, 0, nchunks - 1)
                     for s in range(slots)])          # [slots, nwin]

    def pos_spec(s):
        return pl.BlockSpec((CHUNK,), lambda w, idx: (idx[s, w],),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nwin,),
        in_specs=[pos_spec(s) for s in range(slots)] + [
            pl.BlockSpec((_WHI, _WLO), lambda w, idx: (w, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_WHI, _WLO), lambda w, idx: (w, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, slots=slots),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nwin * _WHI, _WLO), jnp.uint32),
        input_output_aliases={slots + 1: 0},
        interpret=interpret,
    )(idx, *([pos_sorted] * slots), words.reshape(nwin * _WHI, _WLO))
    return out.reshape(nwords)[:nwords_orig], overflow
