#!/usr/bin/env python3
"""Pass-by-pass price of every full-width sort in the counting insert
step (VERDICT r4 next #2), at the bench geometry: 3072 reads x 2048
bases -> n = 6.2M frames, n*h = 24.8M positions, 2**30 uint8 counters.

Sorts in _insert_positions_kernel -> _conservative_decompose:
  frame4   group-by-multiset: 4-key sort of n rows + order payload
  pair4    entanglement pair sort: (pos, stream, gid, pidx) 2-key, n*h
  pair3    the same without the gid operand (tier-1 candidate)
  unperm   flags+cur un-permute: (pi<<2|flags, v) 1-key + payload, n*h
  delta    (dpos, delta) 1-key + payload, n*h
  entcomp  entangled compaction: 1-key, n
Each measured standalone (10 reps, chained readback) — NOT additive with
the full step (XLA overlaps stages), but the RATIOS identify the budget.
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

H = 4
N = 3072 * 2018          # frames at the bench geometry
NH = N * H


def timed(fn, *args, reps=10):
    out = fn(*args)
    int(jnp.sum(jax.tree_util.tree_leaves(out)[0].ravel()[:1].astype(
        jnp.int32)))
    t0 = time.perf_counter()
    r = None
    for _ in range(reps):
        r = fn(*args)
    int(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1].astype(
        jnp.int32)))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.integers(0, 1 << 30, size=(N, H), dtype=np.uint32))
    flat = jnp.asarray(rng.integers(0, 1 << 30, size=NH, dtype=np.uint32))
    pay = jnp.asarray(rng.integers(0, 1 << 32, size=NH, dtype=np.uint32))
    stream = jnp.asarray(np.repeat(np.arange(N, dtype=np.uint32), H))
    gid = stream
    pidx = jnp.arange(NH, dtype=jnp.uint32)
    order0 = jnp.arange(N, dtype=jnp.int32)
    nkey = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))

    res = {}

    @jax.jit
    def frame4(p):
        key = jnp.sort(p, axis=-1)
        return jax.lax.sort(tuple(key[:, j] for j in range(H)) + (order0,),
                            num_keys=H, is_stable=False)[H]

    res["frame4_ms"] = timed(frame4, pos)

    @jax.jit
    def pair4(fp):
        return jax.lax.sort((fp, stream, gid, pidx), num_keys=2,
                            is_stable=False)[3]

    res["pair4_ms"] = timed(pair4, flat)

    @jax.jit
    def pair3(fp):
        return jax.lax.sort((fp, stream, pidx), num_keys=2,
                            is_stable=False)[2]

    res["pair3_ms"] = timed(pair3, flat)

    @jax.jit
    def unperm(k, v):
        return jax.lax.sort((k, v), num_keys=1, is_stable=False)[1]

    res["unperm_ms"] = timed(unperm, pidx << 2, pay)
    res["delta_ms"] = timed(unperm, flat, pay)

    @jax.jit
    def onekey(k):
        return jax.lax.sort((k,), is_stable=False)[0]

    res["entcomp_ms"] = timed(onekey, nkey)
    res["onekey_nh_ms"] = timed(onekey, flat)

    # full insert step for scale
    from btl_bloomfilter_tpu.models import counting
    cbf = counting.create(1 << 30, H, 31, count_threshold=1,
                          counter_width=1)

    @jax.jit
    def full(words, p):
        return counting.insert_positions(words, p,
                                         jnp.ones((N,), bool),
                                         cbf.counter_max, cbf.size,
                                         cbf.counters_per_word)

    res["full_step_ms"] = timed(full, cbf.counters, pos, reps=5)

    @jax.jit
    def full_t1(words, p):
        return counting.insert_positions(words, p,
                                         jnp.ones((N,), bool),
                                         cbf.counter_max, cbf.size,
                                         cbf.counters_per_word,
                                         group=False)

    res["full_step_tier1_ms"] = timed(full_t1, cbf.counters, pos, reps=5)
    print(json.dumps({k: round(v, 2) for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    main()
