#!/usr/bin/env python3
"""Measure the in-VMEM Pallas bitonic block sorter vs the XLA full sort
at the counting-insert scale (VERDICT r4 next #3: 'a measured
ms/4M-element number, win or lose').

The kernel sorts 2048-key blocks locally; a FULL sort additionally needs
log2(N/2048) ~ 11 merge passes over all N elements, each at least one
read+write of the array, so full-sort time >= block_ms + 11 * stream_ms.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

import jax
import jax.numpy as jnp

from btl_bloomfilter_tpu.kernels import vmem_sort

N = 4 * 1024 * 1024


def timed(fn, *args, reps=10):
    r = fn(*args)
    int(jnp.sum(r.ravel()[:1].astype(jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    int(jnp.sum(r.ravel()[:1].astype(jnp.int32)))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 32, size=N, dtype=np.uint32))
    res = {"n": N}

    blk = jax.jit(vmem_sort.sort_blocks)
    try:
        res["pallas_block_sort_ms"] = round(timed(blk, x), 2)
        # correctness on chip
        got = np.asarray(blk(x)).reshape(-1, vmem_sort.BLOCK)
        ok = bool((np.diff(got, axis=-1) >= 0).all())
        res["pallas_block_sorted_ok"] = ok
    except Exception as e:  # noqa: BLE001
        res["pallas_block_sort_error"] = str(e)[:300]

    xla = jax.jit(lambda v: jax.lax.sort((v,), is_stable=False)[0])
    res["xla_full_sort_ms"] = round(timed(xla, x), 2)

    # one full-array read+write streaming pass (merge-pass floor)
    stream = jax.jit(lambda v: v + jnp.uint32(1))
    res["stream_pass_ms"] = round(timed(stream, x), 2)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
