#!/usr/bin/env python3
"""Scatter-kernel experiments on the real chip.

Variants of the static-window scatter to isolate Mosaic costs:
  null  — loads pos blocks + words block, writes words back (pipeline floor)
  rowmaj — the shipped formulation ([n, W] one-hots; minor-dim inserts)
  lanemaj — transposed one-hots ([W, n], broadcasts along sublanes are free)

Usage: python bench/kernel_lab.py <variant> [slots]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from btl_bloomfilter_tpu.utils import platform as _p

_p.enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN_WORDS = 16384
_WLO = 128
_WHI = WIN_WORDS // _WLO
CHUNK = 1024
_SENT = np.uint32(0xFFFFFFFF)


def make_kernel(variant, slots):
    def kernel(idx_ref, *refs):
        pos_refs = refs[:slots]
        words_ref, out_ref = refs[slots], refs[slots + 1]
        w = pl.program_id(0)
        base_word = w * WIN_WORDS
        if variant == "null":
            acc = jnp.uint32(0)
            for r in pos_refs:
                acc = acc ^ r[0]
            out_ref[...] = words_ref[...] | (acc & 0)
            return

        pos = jnp.concatenate([r[...] for r in pos_refs])
        slot_ok = jnp.concatenate(
            [jnp.broadcast_to(
                jnp.asarray(True) if s == 0
                else idx_ref[s, w] != idx_ref[s - 1, w], (CHUNK,))
             for s in range(slots)])
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
        mlo32 = (mask & 0xFFFF).astype(jnp.int32)
        mhi32 = (mask >> 16).astype(jnp.int32)

        if variant == "rowmaj":
            m_lo = mlo32[:, None].astype(jnp.bfloat16)
            m_hi = mhi32[:, None].astype(jnp.bfloat16)
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (n, _WHI), 1)
            a = (hi[:, None] == iota_hi).astype(jnp.bfloat16)
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (n, _WLO), 1)
            onehot_lo = (lo[:, None] == iota_lo).astype(jnp.bfloat16)
            dims = (((0,), (0,)), ((), ()))
            p_lo = jax.lax.dot_general(a, onehot_lo * m_lo, dims,
                                       preferred_element_type=jnp.float32)
            p_hi = jax.lax.dot_general(a, onehot_lo * m_hi, dims,
                                       preferred_element_type=jnp.float32)
        else:  # lanemaj
            iota_hi = jax.lax.broadcasted_iota(jnp.int32, (_WHI, n), 0)
            at = (hi[None, :] == iota_hi).astype(jnp.bfloat16)   # [WHI, n]
            iota_lo = jax.lax.broadcasted_iota(jnp.int32, (_WLO, n), 0)
            bt = (lo[None, :] == iota_lo).astype(jnp.bfloat16)   # [WLO, n]
            blo = bt * mlo32[None, :].astype(jnp.bfloat16)
            bhi = bt * mhi32[None, :].astype(jnp.bfloat16)
            dims = (((1,), (1,)), ((), ()))
            p_lo = jax.lax.dot_general(at, blo, dims,
                                       preferred_element_type=jnp.float32)
            p_hi = jax.lax.dot_general(at, bhi, dims,
                                       preferred_element_type=jnp.float32)

        delta = (p_lo.astype(jnp.int32).astype(jnp.uint32)
                 | (p_hi.astype(jnp.int32).astype(jnp.uint32) << 16))
        out_ref[...] = words_ref[...] | delta
    return kernel


def build(variant, slots, nwords, nchunks):
    nwin = nwords // WIN_WORDS

    def pos_spec(s):
        return pl.BlockSpec((CHUNK,), lambda w, idx: (idx[s, w],),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nwin,),
        in_specs=[pos_spec(s) for s in range(slots)] + [
            pl.BlockSpec((_WHI, _WLO), lambda w, idx: (w, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_WHI, _WLO), lambda w, idx: (w, 0),
                               memory_space=pltpu.VMEM),
    )

    @jax.jit
    def run(idx, pos, words2d):
        return pl.pallas_call(
            make_kernel(variant, slots),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nwin * _WHI, _WLO), jnp.uint32),
            input_output_aliases={slots + 1: 0},
        )(idx, *([pos] * slots), words2d)
    return run


def main():
    variant = sys.argv[1]
    slots = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    SIZE = 1 << 30
    nwords = SIZE // 32
    N = 4 * 1024 * 1024
    rng = np.random.default_rng(0)
    pos = np.sort(rng.integers(0, SIZE, size=N, dtype=np.uint32))
    nchunks = N // CHUNK
    nwin = nwords // WIN_WORDS

    # precompute chunk->window index map on host
    chunk_last = (pos[CHUNK - 1::CHUNK] >> 5).astype(np.int64)
    wstart = np.arange(nwin, dtype=np.int64) * WIN_WORDS
    cs = np.searchsorted(chunk_last, wstart, side="left")
    idx = np.stack([np.clip(cs + s, 0, nchunks - 1)
                    for s in range(slots)]).astype(np.int32)

    run = build(variant, slots, nwords, nchunks)
    idx_j = jnp.asarray(idx)
    pos_j = jnp.asarray(pos)
    words = jnp.zeros((nwin * _WHI, _WLO), jnp.uint32)

    out = run(idx_j, pos_j, words)
    int(jnp.sum(out.ravel()[:1]))
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        out = run(idx_j, pos_j, words)
    int(jnp.sum(out.ravel()[:1]))
    dt = (time.perf_counter() - t0) / reps
    # verify popcount when computing for real
    if variant != "null":
        popc = int(jnp.sum(jax.lax.population_count(out)))
        exp = np.zeros(nwords, np.uint32)
        np.bitwise_or.at(exp, pos >> 5, np.uint32(1) << (pos & 31))
        expc = int(np.unpackbits(exp.view(np.uint8)).sum())
        print(f"popcount {popc} vs expected {expc} "
              f"{'OK' if popc == expc else 'MISMATCH'}")
    print(f"{variant} slots={slots}: {dt*1e3:.2f} ms")


if __name__ == "__main__":
    main()
