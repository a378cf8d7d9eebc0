"""Mosaic kernel: saturating histogram-add of sorted counter indices.

The counting-filter twin of kernels/scatter_or.py, accelerating the bulk
``incrementAll`` path (CountingBloomFilter.hpp:165-183 semantics: every
addressed counter +1 per occurrence, saturating at the counter max).
XLA lowers the scatter-add to a ~serial per-element loop; this kernel
walks SORTED counter indices in chunks and histograms each chunk into a
VMEM window with one-hot MXU matmuls:

    count2d[hi, lo] = sum_c onehot_hi[c, hi] * onehot_lane[c, lo]

Counters are stored packed in uint32 words (4x uint8, 2x uint16 or
1x uint32 per word). The window's packed words are unpacked into
sub-lane planes, each plane gets its own matmul (the lane one-hot is
masked by ``index % per_word == b``), the saturating add runs in int32,
and the planes are repacked. Saturating-add is associative for
non-negative increments, so per-chunk clamping equals a single final
clamp.

Positions do NOT need deduplication (duplicates are wanted: each adds 1);
they MUST be sorted; padding/invalid entries use the 0xFFFFFFFF sentinel.
Indices falling outside a chunk's window are emitted to an overflow
output (sentinel elsewhere) for the caller to re-apply via the XLA
scatter-add under a lax.cond (rare: windows are ~4x the expected chunk
span of a uniform hash stream).

One-hots are bf16-exact and per-cell sums are < 2**24, so bf16 matmul
operands with f32 accumulation are exact (see gather_words.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scatter_or import CHUNK, WIN_WORDS, _SENT, _WHI, _WLO


def _make_kernel(per_word: int, counter_max: int):
    width_bits = 32 // per_word
    lane_mask = np.uint32((1 << width_bits) - 1) if per_word > 1 \
        else np.uint32(0xFFFFFFFF)
    sub_shift = {1: 0, 2: 1, 4: 2}[per_word]

    def _kernel(bases_ref, pos_ref, words_hbm, out_hbm, ovf_ref,
                win, sem_in, sem_out):
        c = pl.program_id(0)
        base = bases_ref[c]                  # WORD base, multiple of _WLO

        del words_hbm  # aliased with out_hbm; re-read for read-modify-write
        row = base // _WLO
        read = pltpu.make_async_copy(
            out_hbm.at[pl.ds(row, _WHI), :], win, sem_in)
        read.start()

        pos = pos_ref[...]                   # [CHUNK] counter indices
        live = pos != _SENT
        word = (pos >> sub_shift).astype(jnp.int32)
        local = word - base
        in_win = live & (local >= 0) & (local < WIN_WORDS)
        ovf_ref[...] = jnp.where(live & ~in_win, pos, _SENT)

        lw = jnp.where(in_win, local, 0)
        hi = lw // _WLO
        lo = lw % _WLO
        sub = (pos & jnp.uint32(per_word - 1)).astype(jnp.int32)

        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _WHI), 1)
        a = ((hi[:, None] == iota_hi) & in_win[:, None]
             ).astype(jnp.bfloat16)                        # [C, WHI]
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, _WLO), 1)
        onehot_lo = lo[:, None] == iota_lo                 # [C, WLO]

        read.wait()
        w = win[...]
        dims = (((0,), (0,)), ((), ()))
        if per_word == 1:
            # whole-word counters: saturating add in uint32 (wrap check)
            d = jax.lax.dot_general(
                a, onehot_lo.astype(jnp.bfloat16), dims,
                preferred_element_type=jnp.float32)
            new = w + d.astype(jnp.int32).astype(jnp.uint32)
            maxu = jnp.uint32(counter_max)
            win[...] = jnp.where((new < w) | (new > maxu), maxu, new)
        else:
            maxv = jnp.int32(counter_max)
            out = jnp.uint32(0)
            for b in range(per_word):
                b_b = (onehot_lo & (sub == b)[:, None]).astype(jnp.bfloat16)
                d_b = jax.lax.dot_general(
                    a, b_b, dims, preferred_element_type=jnp.float32)
                plane = ((w >> (width_bits * b)) & lane_mask
                         ).astype(jnp.int32)
                plane = jnp.minimum(plane + d_b.astype(jnp.int32), maxv)
                out = out | (plane.astype(jnp.uint32) << (width_bits * b))
            win[...] = out

        write = pltpu.make_async_copy(
            win, out_hbm.at[pl.ds(row, _WHI), :], sem_out)
        write.start()
        write.wait()

    return _kernel


def scatter_add_sorted(words: jax.Array, pos_sorted: jax.Array,
                       per_word: int, counter_max: int,
                       interpret: bool = False):
    """Saturating +1 at SORTED counter indices into packed uint32 words.

    ``words`` is the counter array viewed as uint32 (``per_word`` counters
    per word, little-endian lanes); any length is accepted (padded
    internally). ``counter_max`` is the per-counter saturation value
    (must fit the lane width for per_word > 1).

    Returns (new_words, ovf_pos) where ovf_pos (uint32[n], 0xFFFFFFFF
    where handled) lists indices the caller must re-apply via the XLA
    scatter-add.
    """
    if per_word not in (1, 2, 4):
        raise ValueError(f"per_word must be 1, 2 or 4, got {per_word}")
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
    base = jnp.where(first == _SENT, 0,
                     (first // per_word)).astype(jnp.int32)
    base = jnp.minimum(base & ~jnp.int32(_WLO - 1), nwords - WIN_WORDS)
    base = jnp.maximum(base, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(int(nchunks),),
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda c, bases: (c,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),      # packed counters (HBM)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),      # updated counters
            pl.BlockSpec((CHUNK,), lambda c, bases: (c,),
                         memory_space=pltpu.VMEM),  # overflow indices
        ),
        scratch_shapes=[
            pltpu.VMEM((_WHI, _WLO), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, ovf = pl.pallas_call(
        _make_kernel(per_word, counter_max),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nwords // _WLO, _WLO), jnp.uint32),
            jax.ShapeDtypeStruct((int(nchunks) * CHUNK,), jnp.uint32),
        ),
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(base, pos_sorted, words.reshape(nwords // _WLO, _WLO))
    return out.reshape(nwords)[:nwords_orig], ovf[:n]
