#!/usr/bin/env python3
"""Steady-state timing: Mosaic scatter-OR kernel vs the XLA scatter path.

Run on the real chip:  python bench/kernel_probe.py
Times the production bloom.insert (hash + mod + sort + dedupe + scatter)
with use_kernel=False (XLA `.at[].add`) and use_kernel=True (Mosaic MXU
histogram kernel) and checks the results are bit-identical.
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

from btl_bloomfilter_tpu.models import bloom
from btl_bloomfilter_tpu.ops import nthash

K, H = 31, 4
SIZE = 1 << 30
B, L = 512, 2048
REPS = 10

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
nwords = SIZE // 32


def make_step(use_kernel):
    @functools.partial(jax.jit, donate_argnums=0)
    def step(words, codes):
        frames = nthash.hash_frames(codes, K, H)
        st = bloom.BloomFilter(words=words, size=SIZE, hash_num=H,
                               kmer_size=K)
        return bloom.insert(st, frames.hashes, frames.valid,
                            use_kernel=use_kernel).words
    return step


def drain(w):
    return int(jnp.sum(w[:1]))


def timed(fn, label):
    words = jnp.zeros(nwords, jnp.uint32)
    t0 = time.perf_counter()
    words = fn(words, codes)
    drain(words)
    print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(REPS):
        words = fn(words, codes)
    drain(words)
    dt = (time.perf_counter() - t0) / REPS
    kmers = B * (L - K + 1)
    print(f"{label}: {dt*1e3:.1f} ms/step = {kmers/dt/1e6:.1f}M kmers/s")
    return words


w_x = timed(make_step(False), "xla   ")
w_k = timed(make_step(True), "kernel")
pc_x = int(jnp.sum(jax.lax.population_count(w_x).astype(jnp.uint32)))
pc_k = int(jnp.sum(jax.lax.population_count(w_k).astype(jnp.uint32)))
print(f"popcount xla={pc_x} kernel={pc_k}")
print("bit-identical:", bool(jnp.all(w_x == w_k)))
