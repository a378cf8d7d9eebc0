#!/usr/bin/env python3
"""Timing probe: blocked-filter query variants on the real chip.

Current contains() builds a [..., h, 16] one-hot mask row per k-mer
(~12 ms of VPU work at the headline workload). Variant: select the probed
word per hash with 16 lane-selects on [..., h]-shaped arrays and test the
bit directly — no mask materialization.
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

from btl_bloomfilter_tpu.models import blocked
from btl_bloomfilter_tpu.ops import nthash
from btl_bloomfilter_tpu.ops.u64 import U64

K, H = 31, 4
SIZE = 1 << 30
B, L = 512, 2048
REPS = 10

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))


def contains_select(bf, canon):
    block, bits = blocked._block_and_bits(bf, canon)
    got = bf.rows[block.astype(jnp.int32)]          # [..., 16]
    word = (bits >> 5).astype(jnp.int32)            # [..., h]
    sel = jnp.zeros(bits.shape, jnp.uint32)
    for ww in range(blocked.WORDS_PER_BLOCK):
        sel = jnp.where(word == ww, got[..., ww:ww + 1], sel)
    hit = ((sel >> (bits & 31)) & jnp.uint32(1)) == 1
    return jnp.all(hit, axis=-1)


@jax.jit
def build(rows, codes):
    f = nthash.hash_frames(codes, K, H)
    st = blocked.BlockedBloomFilter(rows=rows, size=SIZE, hash_num=H,
                                    kmer_size=K)
    return blocked.insert_frames(st, f).rows


def make_query(fn):
    @jax.jit
    def query(rows, codes):
        f = nthash.hash_frames(codes, K, H)
        st = blocked.BlockedBloomFilter(rows=rows, size=SIZE, hash_num=H,
                                        kmer_size=K)
        canon = U64(f.hashes.hi[..., 0], f.hashes.lo[..., 0])
        return fn(st, canon) & f.valid
    return query


def drain(x):
    return int(jnp.sum(x.ravel()[:1].astype(jnp.int32)))


def timed(fn, rows, label):
    t0 = time.perf_counter()
    r = fn(rows, codes)
    drain(r)
    print(f"{label}: compile+first {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(rows, codes)
    drain(r)
    dt = (time.perf_counter() - t0) / REPS
    kmers = B * (L - K + 1)
    print(f"{label}: {dt*1e3:.1f} ms/step = {kmers/dt/1e6:.1f}M kmers/s")
    return r


rows = build(jnp.zeros((SIZE // 512, 16), jnp.uint32), codes)
r_m = timed(make_query(blocked.contains), rows, "mask-onehot")
r_s = timed(make_query(contains_select), rows, "lane-select")
print(f"hits mask={int(jnp.sum(r_m))} select={int(jnp.sum(r_s))}")
print("identical:", bool(jnp.all(r_m == r_s)))
