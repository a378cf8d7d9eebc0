#!/usr/bin/env python3
"""Measured prototype of Pallas grouping alternatives to the global XLA
sort (VERDICT r3 next #4).

The insert/query pipelines group hash positions with one flat unstable
XLA sort (~6.3 ms for 4.13M uint32 — docs/PERFORMANCE.md). Every radix/
bucket alternative decomposes into (a) LOCAL in-VMEM sorting and (b)
routing data between chunks and buckets, which on TPU is either more
sorting or many small DMAs. This probe MEASURES both primitives on the
real chip instead of paper-bounding them:

  1. chunk-local bitonic: a Pallas kernel that fully sorts every
     1024-element chunk in VMEM (the building block of any merge/radix
     scheme) — vectorized compare-exchange via lane/sublane rolls;
  2. DMA issue cost: a Pallas kernel issuing K strided small copies per
     grid step (the per-(chunk, bucket) write pattern every bucket-
     partition scheme needs), swept over K and copy size;
  3. the XLA flat sort at the same scale, for reference.

Decision maths: a B-bucket stable partition of N positions needs
~N/CHUNK * B small DMAs; with the measured per-DMA cost this bounds any
bucketing pass, and the chunk-local sort cost bounds the local phase.
Results land in docs/PERFORMANCE.md ("grouping prototype").
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 22          # 4.19M positions (bench scale)
CHUNK = 1024
REPS = 10


# ---------------------------------------------------------------------------
# 1. chunk-local bitonic sort (1024 elements per grid step, in VMEM)
# ---------------------------------------------------------------------------

def _flat_roll(x2d, d):
    """Roll a [8, 128]-viewed 1024-vector forward by d along the FLAT
    index, built from lane/sublane rotates (Mosaic rejects unaligned 1-D
    concats: 'Input offsets outside of the first tile')."""
    sub, lane = x2d.shape
    dl = d % lane
    ds = d // lane
    if dl:
        a = pltpu.roll(x2d, lane - dl, 1)      # lane rotate (backward dl)
        b = pltpu.roll(a, sub - 1, 0)          # next-row carry
        li = lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
        x2d = jnp.where(li < lane - dl, a, b)
    if ds:
        x2d = pltpu.roll(x2d, sub - ds, 0)
    return x2d


def _bitonic_kernel(x_ref, o_ref):
    x = x_ref[0]                        # [8, 128] uint32 = 1024 flat
    sub, lane = x.shape
    idx = (lax.broadcasted_iota(jnp.int32, x.shape, 0) * lane
           + lax.broadcasted_iota(jnp.int32, x.shape, 1))
    k = 2
    while k <= CHUNK:
        j = k // 2
        while j >= 1:
            partner = _flat_roll(x, j)          # value at index i+j
            partner_b = _flat_roll(x, CHUNK - j)  # value at index i-j
            up = (idx & j) == 0                 # i < partner index
            asc = (idx & k) == 0                # ascending block
            other = jnp.where(up, partner, partner_b)
            keep_min = up == asc
            x = jnp.where(keep_min, jnp.minimum(x, other),
                          jnp.maximum(x, other))
            j //= 2
        k *= 2
    o_ref[0] = x


def chunk_bitonic(x):
    n = x.shape[0]
    r = x.reshape(n // CHUNK, 8, 128)
    out = pl.pallas_call(
        _bitonic_kernel,
        grid=(n // CHUNK,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda c: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n // CHUNK, 8, 128), jnp.uint32),
    )(r)
    return out.reshape(n)


# ---------------------------------------------------------------------------
# 2. DMA issue cost: K small copies per grid step
# ---------------------------------------------------------------------------

def _dma_kernel(src_hbm, dst_hbm, sem, *, k, rows):
    c = pl.program_id(0)
    for i in range(k):
        # k disjoint small copies per grid step, strided so destinations
        # are scattered like bucket writes
        r = c * k + i
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(r * rows, rows), :],
            dst_hbm.at[pl.ds(r * rows, rows), :],
            sem.at[i % 8]).start()
    for i in range(k):     # one wait per issued copy
        pltpu.make_async_copy(
            src_hbm.at[pl.ds(0, rows), :],
            dst_hbm.at[pl.ds(0, rows), :],
            sem.at[i % 8]).wait()


def dma_sweep(nsteps, k, rows):
    total_rows = nsteps * k * rows
    src = jnp.zeros((total_rows, 128), jnp.uint32)

    fn = pl.pallas_call(
        functools.partial(_dma_kernel, k=k, rows=rows),
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((total_rows, 128), jnp.uint32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((8,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    return jax.jit(fn), src


def timed(label, jfn, *args):
    t0 = time.perf_counter()
    r = jfn(*args)
    jax.tree_util.tree_map(
        lambda x: int(jnp.sum(x.ravel()[:1].astype(jnp.int32))), r)
    first = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = jfn(*args)
    jax.tree_util.tree_map(
        lambda x: int(jnp.sum(x.ravel()[:1].astype(jnp.int32))), r)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{label}: {dt:.2f} ms (first {first:.1f}s)", flush=True)
    return dt


def main():
    @jax.jit
    def gen():
        i = lax.iota(jnp.uint32, N)
        return (i * jnp.uint32(0x9E3779B9)) ^ (i >> 16)

    x = gen()

    # 3. XLA flat sort reference
    timed("xla flat sort (4.19M u32)",
          jax.jit(lambda v: lax.sort((v,), is_stable=False)[0]), x)

    # 2. DMA issue cost sweep (256 grid steps)
    for k, rows in [(16, 8), (64, 2), (64, 8), (256, 2)]:
        try:
            jfn, src = dma_sweep(256, k, rows)
            dt = timed(f"dma sweep: {k} copies x {rows * 512} B per step",
                       jfn, src)
            per = dt / (256 * k) * 1e6
            print(f"  -> {per:.2f} ns per DMA", flush=True)
        except Exception as e:  # noqa: BLE001 — record, keep probing
            print(f"dma sweep {k}x{rows}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # 1. chunk-local bitonic
    try:
        jfn = jax.jit(chunk_bitonic)
        dt = timed("chunk-local bitonic (1024/chunk, 4096 chunks)", jfn, x)
        out = np.asarray(jfn(x)).reshape(-1, CHUNK)
        assert (np.diff(out.astype(np.int64), axis=1) >= 0).all(), \
            "chunk sort broken"
        print(f"  -> {dt / (N / CHUNK) * 1e3:.2f} us per 1024-chunk",
              flush=True)
    except Exception as e:  # noqa: BLE001 — record, keep probing
        print(f"chunk bitonic: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
