#!/usr/bin/env python3
"""Steady-state timing: Mosaic windowed gather kernel vs the XLA gather.

Run on the real chip:  python bench/query_probe.py
Times the production bloom.contains (hash + mod + sort + kernel gather +
unsort) with use_kernel=False (XLA gather) and use_kernel=True (Mosaic
windowed MXU gather) and checks the results are identical.
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


@functools.partial(jax.jit, donate_argnums=0)
def build(words, codes):
    frames = nthash.hash_frames(codes, K, H)
    st = bloom.BloomFilter(words=words, size=SIZE, hash_num=H, kmer_size=K)
    return bloom.insert(st, frames.hashes, frames.valid).words


def make_query(use_kernel):
    @jax.jit
    def query(words, codes):
        frames = nthash.hash_frames(codes, K, H)
        st = bloom.BloomFilter(words=words, size=SIZE, hash_num=H,
                               kmer_size=K)
        return bloom.contains(st, frames.hashes, use_kernel=use_kernel) \
            & frames.valid
    return query


def drain(x):
    return int(jnp.sum(x.ravel()[:1].astype(jnp.int32)))


def timed(fn, words, label):
    t0 = time.perf_counter()
    r = fn(words, codes)
    drain(r)
    print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(words, codes)
    drain(r)
    dt = (time.perf_counter() - t0) / REPS
    kmers = B * (L - K + 1)
    print(f"{label}: {dt*1e3:.1f} ms/step = {kmers/dt/1e6:.1f}M kmers/s")
    return r


words = build(jnp.zeros(nwords, jnp.uint32), codes)
r_x = timed(make_query(False), words, "xla   ")
r_k = timed(make_query(True), words, "kernel")
nx, nk = int(jnp.sum(r_x)), int(jnp.sum(r_k))
print(f"hits xla={nx} kernel={nk} (expect all {B*(L-K+1)} since same reads)")
print("identical:", bool(jnp.all(r_x == r_k)))

# negative control: different reads should (almost) all miss
codes2 = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
m_x = int(jnp.sum(make_query(False)(words, codes2)))
m_k = int(jnp.sum(make_query(True)(words, codes2)))
print(f"negative-control hits xla={m_x} kernel={m_k} "
      f"(FP rate ~ (pop/size)^h)")
