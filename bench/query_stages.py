#!/usr/bin/env python3
"""Stage budget of the production query path (bench.py's classic_query):
fused hash kernel -> (pos, idx) sort -> windowed gather kernel -> packed
un-sort -> AND-reduce. Times cumulative prefixes so stage cost = diffs.

Run on the real chip:  python bench/query_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

from btl_bloomfilter_tpu.kernels import gather_words, nthash_scan
from btl_bloomfilter_tpu.models import bloom, kmer_bloom

K, H = 31, 4
SIZE = 1 << 30
B, L = 512, 2048
REPS = 10

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
nwords = SIZE // 32
SENT = jnp.uint32(0xFFFFFFFF)


def stage_fn(stage):
    @jax.jit
    def run(words, codes):
        pos, _strand, valid = nthash_scan.positions_planes_kernel(
            codes, K, H, SIZE)
        if stage == 1:                     # hash kernel only
            return pos.reshape(-1)[:8]
        safe = jnp.where(pos == SENT, jnp.uint32(0), pos)
        flat = safe.reshape(-1)
        n = flat.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        pos_s, idx_s = jax.lax.sort((flat, idx), num_keys=1,
                                    is_stable=False)
        if stage == 2:                     # + (pos, idx) sort
            return pos_s[:8] ^ idx_s[:8].astype(jnp.uint32)
        vals_s, over = gather_words.gather_words_sorted(words, pos_s)
        if stage == 3:                     # + windowed gather
            return vals_s[:8] + over
        bit_s = (vals_s >> (pos_s & 31)) & 1
        bit = jax.lax.sort(((idx_s.astype(jnp.uint32) << 1) | bit_s,),
                           is_stable=False)[0] & 1
        hit = jnp.all(bit.reshape(pos.shape) == 1, axis=0)
        return (hit & (pos[0] != SENT)).reshape(-1)[:8]  # full
    return run


@jax.jit
def full_api(words, codes):
    st = bloom.BloomFilter(words=words, size=SIZE, hash_num=H, kmer_size=K)
    hit, valid = kmer_bloom.contains_seq(st, codes)
    return hit


def drain(x):
    return int(jnp.sum(jnp.asarray(x).ravel()[:1].astype(jnp.int32)))


def build():
    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def b(words, codes):
        st = bloom.BloomFilter(words=words, size=SIZE, hash_num=H,
                               kmer_size=K)
        return kmer_bloom.insert_seq(st, codes).words
    return b(jnp.zeros(nwords, jnp.uint32), codes)


def timed(fn, words, label):
    r = fn(words, codes)
    drain(r)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(words, codes)
    drain(r)
    dt = (time.perf_counter() - t0) / REPS
    kmers = B * (L - K + 1)
    print(f"{label}: {dt*1e3:6.2f} ms/step ({kmers/dt/1e6:.1f}M kmers/s)")
    return dt


words = build()
labels = {1: "hash kernel            ", 2: "+ (pos,idx) sort       ",
          3: "+ windowed gather      ", 4: "+ packed unsort + AND  "}
prev = 0.0
for s in (1, 2, 3, 4):
    dt = timed(stage_fn(s), words, labels[s])
    print(f"    stage delta: {(dt-prev)*1e3:6.2f} ms")
    prev = dt
timed(full_api, words, "full contains_seq API  ")
