#!/usr/bin/env python3
"""Stage budget of the production insert step (bench.py's step): fused
hash kernel -> unstable value sort -> dedupe/sentinel mask -> RMW ring
scatter -> overflow cond. Cumulative prefixes; stage cost = diffs.

Run on the real chip:  python bench/insert_stages.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

from btl_bloomfilter_tpu.kernels import nthash_scan, scatter_ring
from btl_bloomfilter_tpu.models import bloom

K, H = 31, 4
SIZE = 1 << 30
B, L = 512, 2048
REPS = 10

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
nwords = SIZE // 32
SENT = jnp.uint32(0xFFFFFFFF)


def stage_fn(stage):
    @functools.partial(jax.jit, donate_argnums=0)
    def run(words, codes):
        pos, _s, _v = nthash_scan.positions_planes_kernel(codes, K, H, SIZE)
        if stage == 1:
            return words.at[:8].set(pos.reshape(-1)[:8])
        pos_s = jax.lax.sort((pos.reshape(-1),), is_stable=False)[0]
        if stage == 2:
            return words.at[:8].set(pos_s[:8])
        keep = jnp.ones(pos_s.shape, bool).at[1:].set(
            pos_s[1:] != pos_s[:-1])
        keep = keep & (pos_s != SENT)
        pos_d = jnp.where(keep, pos_s, SENT)
        if stage == 3:
            return words.at[:8].set(pos_d[:8])
        out, over = scatter_ring.scatter_or_sorted_inplace(
            words, pos_d, pos_for_base=pos_s)
        if stage == 4:
            return out
        return jax.lax.cond(
            over > 0,
            lambda w: w | bloom.sorted_delta_words(pos_s, keep, nwords),
            lambda w: w, out)
    return run


def timed(fn, label):
    words = jnp.zeros(nwords, jnp.uint32)
    words = fn(words, codes)
    int(jnp.sum(words[:1]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        words = fn(words, codes)
    int(jnp.sum(words[:1]))
    dt = (time.perf_counter() - t0) / REPS
    kmers = B * (L - K + 1)
    print(f"{label}: {dt*1e3:6.2f} ms/step ({kmers/dt/1e6:.1f}M kmers/s)")
    return dt


labels = {1: "hash kernel        ", 2: "+ unstable sort    ",
          3: "+ dedupe mask      ", 4: "+ RMW ring scatter ",
          5: "+ overflow cond    "}
prev = 0.0
for s in (1, 2, 3, 4, 5):
    dt = timed(stage_fn(s), labels[s])
    print(f"    stage delta: {(dt-prev)*1e3:6.2f} ms")
    prev = dt
