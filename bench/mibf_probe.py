#!/usr/bin/env python3
"""Steady-state timing: MIBF rank gathers via the Mosaic windowed gather
kernel vs the XLA gather.

Run on the real chip:  python bench/mibf_probe.py
Times mibf.at_rank (the classification hot path: bv-word gather + cum-rank
gather + in-word popcount) and the full batched classification dispatch
(query_device_batch) with use_kernel=False and True, checking identity.
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

from btl_bloomfilter_tpu.models import mibf, mibf_query
from btl_bloomfilter_tpu.ops.u64 import U64

SIZE = 1 << 29            # bit-vector bits (occupancy 0.5)
R, W, H = 1024, 1024, 4    # reads x frames x hashes per dispatch
NUM_IDS = 64
REPS = 10

rng = np.random.default_rng(0)
nwords = SIZE // 32
bv = jnp.asarray(rng.integers(0, 1 << 32, size=nwords, dtype=np.uint32))
m = mibf.freeze(bv, SIZE, hash_num=H, kmer_size=31, data_width=2)
m = mibf.MIBloomFilter(
    bv_words=m.bv_words, cum_ranks=m.cum_ranks,
    data=jnp.asarray(rng.integers(1, NUM_IDS, size=m.d_size,
                                  dtype=np.uint16)),
    size=m.size, hash_num=m.hash_num, kmer_size=m.kmer_size,
    d_size=m.d_size, data_width=m.data_width)

hashes = U64(
    jnp.asarray(rng.integers(0, 1 << 32, size=(R, W, H), dtype=np.uint32)),
    jnp.asarray(rng.integers(0, 1 << 32, size=(R, W, H), dtype=np.uint32)))
valid = jnp.ones((R, W), bool)
mc = jnp.full(NUM_IDS, 2, jnp.int32)


def timeit(fn, *args):
    out = jax.block_until_ready(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = jax.block_until_ready(fn(*args))
    dt = (time.perf_counter() - t0) / REPS
    return out, dt


nframes = R * W
print(f"MIBF {SIZE >> 23} MiB bv, {nframes} frames x {H} hashes/dispatch")

for uk in (False, True):
    fn = jax.jit(functools.partial(mibf.at_rank, use_kernel=uk))
    (rank, hit), dt = timeit(fn, m, hashes)
    print(f"at_rank   use_kernel={uk}: {dt * 1e3:8.2f} ms  "
          f"{nframes * H / dt / 1e6:7.1f} M lookups/s")
    if uk:
        np.testing.assert_array_equal(np.asarray(rank), rank_ref)
        np.testing.assert_array_equal(np.asarray(hit), hit_ref)
        print("  kernel path identical to XLA path")
    else:
        rank_ref, hit_ref = np.asarray(rank), np.asarray(hit)

for uk in (False, True):
    def run(m_, h_, v_, mc_, uk=uk):
        _, ht, raw = mibf.at_rank_data(m_, h_, use_kernel=uk)
        misses = jnp.sum((~ht).astype(jnp.int32), axis=-1)
        usable = v_ & (misses <= 0)
        return mibf_query.query_scan_batch(m_, raw, ht, usable, misses, mc_,
                                           NUM_IDS, 10**6)
    out, dt = timeit(jax.jit(run), m, hashes, valid, mc)
    print(f"classify  use_kernel={uk}: {dt * 1e3:8.2f} ms  "
          f"{nframes / dt / 1e6:7.2f} M frames/s")
    if uk:
        np.testing.assert_array_equal(np.asarray(out["counts"]), counts_ref)
        print("  kernel classification counts identical")
    else:
        counts_ref = np.asarray(out["counts"])
