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


def _make_weighted_kernel(per_word: int, counter_max: int, val_bytes: int):
    """Weighted variant: each SORTED counter index carries a non-negative
    increment value. The one-hot lane matrix is scaled by the value's
    bytes (one matmul per value byte per sub-lane plane): bf16 holds
    integers <= 256 exactly and the f32 accumulator sums < 2**24 per cell,
    so byte-sliced matmuls reconstruct the exact weighted histogram.

    Accelerates the conservative-update closed form
    (models/counting.insert): the per-group update
    ``counters[p] = max(counters[p], min+inc)`` rewrites as a saturating
    add of ``delta = max(0, target - counters[p])``, which is
    order-independent because untangled groups are position-disjoint
    (CountingBloomFilter.hpp:135-162 semantics via the group decomposition
    in models/counting.py)."""
    width_bits = 32 // per_word
    lane_mask = np.uint32((1 << width_bits) - 1) if per_word > 1 \
        else np.uint32(0xFFFFFFFF)
    sub_shift = {1: 0, 2: 1, 4: 2}[per_word]

    def _kernel(bases_ref, pos_ref, val_ref, words_hbm, out_hbm, ovf_ref,
                win, sem_in, sem_out):
        c = pl.program_id(0)
        base = bases_ref[c]                  # WORD base, multiple of _WLO

        del words_hbm  # aliased with out_hbm; re-read for read-modify-write
        row = base // _WLO
        read = pltpu.make_async_copy(
            out_hbm.at[pl.ds(row, _WHI), :], win, sem_in)
        read.start()

        pos = pos_ref[...]                   # [CHUNK] counter indices
        val = val_ref[...]                   # [CHUNK] uint32 increments
        live = (pos != _SENT) & (val != 0)
        word = (pos >> sub_shift).astype(jnp.int32)
        local = word - base
        in_win = live & (local >= 0) & (local < WIN_WORDS)
        ovf_ref[...] = jnp.where(live & ~in_win, pos, _SENT)

        lw = jnp.where(in_win, local, 0)
        hi = lw // _WLO
        lo = lw % _WLO
        sub = (pos & jnp.uint32(per_word - 1)).astype(jnp.int32)

        # lane-major one-hots ([W, C], positions along lanes): [None, :]
        # broadcasts along sublanes for free (see kernels/gather_words.py)
        iota_hi = jax.lax.broadcasted_iota(jnp.int32, (_WHI, CHUNK), 0)
        at = ((hi[None, :] == iota_hi) & in_win[None, :]
              ).astype(jnp.bfloat16)                       # [WHI, C]
        iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_WLO, CHUNK), 0)
        onehot_lo = lo[None, :] == iota_lo                 # [WLO, C]

        read.wait()
        w = win[...]
        dims = (((1,), (1,)), ((), ()))

        def weighted_delta(sel):
            # sum_c at[hi,c] * sel[lo,c] * val[c], byte-sliced over val
            acc = None
            for q in range(val_bytes):
                v_q = ((val >> (8 * q)) & jnp.uint32(0xFF)
                       ).astype(jnp.int32).astype(jnp.float32
                                                  ).astype(jnp.bfloat16)
                d_q = jax.lax.dot_general(
                    at, sel.astype(jnp.bfloat16) * v_q[None, :], dims,
                    preferred_element_type=jnp.float32)
                part = d_q.astype(jnp.int32) << (8 * q)
                acc = part if acc is None else acc + part
            return acc                                     # [WHI, WLO] int32

        if per_word == 1:
            d = weighted_delta(onehot_lo)
            new = w + d.astype(jnp.uint32)
            maxu = jnp.uint32(counter_max)
            win[...] = jnp.where((new < w) | (new > maxu), maxu, new)
        else:
            maxv = jnp.int32(counter_max)
            out = jnp.uint32(0)
            for b in range(per_word):
                d_b = weighted_delta(onehot_lo & (sub[None, :] == b))
                plane = ((w >> (width_bits * b)) & lane_mask
                         ).astype(jnp.int32)
                plane = jnp.minimum(plane + d_b, maxv)
                out = out | (plane.astype(jnp.uint32) << (width_bits * b))
            win[...] = out

        write = pltpu.make_async_copy(
            win, out_hbm.at[pl.ds(row, _WHI), :], sem_out)
        write.start()
        write.wait()

    return _kernel


def scatter_add_weighted_sorted(words: jax.Array, pos_sorted: jax.Array,
                                val_sorted: jax.Array, per_word: int,
                                counter_max: int, interpret: bool = False):
    """Saturating ``counters[pos] += val`` at SORTED counter indices into
    packed uint32 words (``per_word`` counters per word, little-endian
    lanes). Values are uint32 and must be < 2**24 (byte-sliced matmuls;
    the conservative-update caller's deltas are bounded by the group run
    length). Zero-valued and sentinel entries are no-ops.

    Returns (new_words, ovf_pos): ovf_pos (uint32[n], 0xFFFFFFFF where
    handled) lists indices the caller must re-apply with the matching
    ``val_sorted`` entries via the XLA path (order-aligned with the
    inputs).
    """
    if per_word not in (1, 2, 4):
        raise ValueError(f"per_word must be 1, 2 or 4, got {per_word}")
    val_bytes = {4: 1, 2: 2, 1: 3}[per_word]
    n = pos_sorted.shape[0]
    nchunks = pl.cdiv(n, CHUNK)
    npad = nchunks * CHUNK - n
    if npad:
        pos_sorted = jnp.concatenate(
            [pos_sorted, jnp.full(npad, _SENT, jnp.uint32)])
        val_sorted = jnp.concatenate(
            [val_sorted, jnp.zeros(npad, jnp.uint32)])
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
        _make_weighted_kernel(per_word, counter_max, val_bytes),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nwords // _WLO, _WLO), jnp.uint32),
            jax.ShapeDtypeStruct((int(nchunks) * CHUNK,), jnp.uint32),
        ),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(base, pos_sorted, val_sorted, words.reshape(nwords // _WLO, _WLO))
    return out.reshape(nwords)[:nwords_orig], ovf[:n]


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
    ones = jnp.ones(pos_sorted.shape, jnp.uint32)
    return scatter_add_weighted_sorted(words, pos_sorted, ones, per_word,
                                       counter_max, interpret=interpret)
