#!/usr/bin/env python3
"""Stage-by-stage timing of the insert/query hot path on the real chip.

Prints per-stage ms/step and derived k-mers/s so kernel work can be
attributed (hash, mod, sort, scatter, query). Run under the axon TPU
platform (the default session env)."""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

import jax
import jax.numpy as jnp

from btl_bloomfilter_tpu.models import bloom
from btl_bloomfilter_tpu.ops import nthash, u64


def drain(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return int(jnp.sum(leaf.ravel()[:1]))


def timeit(name, fn, *args, reps=10, kmers=None):
    r = fn(*args)
    drain(r)
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    drain(r)
    dt = (time.perf_counter() - t0) / reps
    rate = f"  {kmers / dt / 1e6:8.1f} M kmers/s" if kmers else ""
    print(f"{name:40s} {dt * 1e3:8.2f} ms{rate}")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1 << 30)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--l", type=int, default=2048)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--h", type=int, default=4)
    args = ap.parse_args()
    K, H, SIZE, B, L = args.k, args.h, args.size, args.b, args.l
    W = L - K + 1
    kmers = B * W

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    print(f"workload: B={B} L={L} k={K} h={H} size=2^{SIZE.bit_length()-1} "
          f"-> {kmers/1e6:.2f}M kmers, {kmers*H/1e6:.2f}M positions/step")

    @jax.jit
    def hash_only(codes):
        return nthash.hash_frames(codes, K, H)

    @jax.jit
    def hash_mod(codes):
        f = nthash.hash_frames(codes, K, H)
        r = u64.mod_const(u64.U64(f.hashes.hi.reshape(-1),
                                  f.hashes.lo.reshape(-1)), SIZE)
        return r.lo

    @jax.jit
    def hash_mod_sort(codes):
        return jnp.sort(hash_mod(codes))

    timeit("hash_frames", hash_only, codes, kmers=kmers)
    timeit("hash + mod", hash_mod, codes, kmers=kmers)
    timeit("hash + mod + sort", hash_mod_sort, codes, kmers=kmers)

    bf = bloom.create(SIZE, H, K)

    def insert_step(use_kernel):
        @functools.partial(jax.jit, donate_argnums=0)
        def step(words, codes):
            f = nthash.hash_frames(codes, K, H)
            st = bloom.BloomFilter(words=words, size=SIZE, hash_num=H,
                                   kmer_size=K)
            return bloom.insert(st, f.hashes, f.valid,
                                use_kernel=use_kernel).words
        return step

    for uk, name in [(True, "insert (window kernel)"),
                     (False, "insert (XLA scatter)")]:
        step = insert_step(uk)
        words = step(bf.words + jnp.uint32(0), codes)
        drain(words)
        t0 = time.perf_counter()
        reps = 10
        for _ in range(reps):
            words = step(words, codes)
        drain(words)
        dt = (time.perf_counter() - t0) / reps
        print(f"{name:40s} {dt * 1e3:8.2f} ms  "
              f"{kmers / dt / 1e6:8.1f} M kmers/s")
        # correctness probe: popcount must equal the XLA path's
        print(f"{'':40s} popcount={int(bloom.get_pop(bloom.BloomFilter(words=words, size=SIZE, hash_num=H, kmer_size=K)))}")

    @jax.jit
    def query_kernel(words, codes):
        f = nthash.hash_frames(codes, K, H)
        st = bloom.BloomFilter(words=words, size=SIZE, hash_num=H,
                               kmer_size=K)
        return bloom.contains(st, f.hashes) & f.valid

    @jax.jit
    def query_xla(words, codes):
        f = nthash.hash_frames(codes, K, H)
        st = bloom.BloomFilter(words=words, size=SIZE, hash_num=H,
                               kmer_size=K)
        return bloom.contains(st, f.hashes, use_kernel=False) & f.valid

    timeit("query (gather kernel)", query_kernel, words, codes, kmers=kmers)
    timeit("query (XLA gather)", query_xla, words, codes, kmers=kmers)


if __name__ == "__main__":
    main()
