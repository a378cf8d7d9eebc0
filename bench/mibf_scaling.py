#!/usr/bin/env python3
"""Classification throughput vs num_ids (VERDICT r4 next #5).

The per-read engine carries a dense [num_ids, 6] count table through a
lax.scan over frames (models/mibf_query.query_scan) — the reference's own
choice (dense m_counts vector, MIBFQuerySupport.hpp:73-82). This probe
measures reads/s at num_ids in {64, 1024, 16384} on the real chip to
decide whether the dense carry collapses at realistic panel sizes.

Run: python bench/mibf_scaling.py [--reads 64] [--frames 512]
Prints one JSON line {"num_ids": ..., "reads_per_s": ...} per config.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

import dataclasses
import functools

import jax
import jax.numpy as jnp

from btl_bloomfilter_tpu.models import mibf, mibf_query as mq
from btl_bloomfilter_tpu.ops import nthash
from btl_bloomfilter_tpu.ops.u64 import U64

K, H = 31, 4
BV_SIZE = 1 << 28


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=64)
    ap.add_argument("--frames", type=int, default=512)
    ap.add_argument("--num-ids", type=int, nargs="*",
                    default=[64, 1024, 16384])
    args = ap.parse_args()
    R, W = args.reads, args.frames

    rng = np.random.default_rng(5)
    # sparse bv + random IDs: the engine cost does not depend on which
    # IDs win, only on num_ids and the hit pattern
    bvn = np.zeros(BV_SIZE // 32, np.uint32)
    bvn[::7] = np.uint32(1) << rng.integers(0, 32, size=bvn[::7].shape)
    L = W + K - 1
    codes = jnp.asarray(rng.integers(0, 4, size=(R, L), dtype=np.uint8))

    for num_ids in args.num_ids:
        m = mibf.freeze(jnp.asarray(bvn), BV_SIZE, H, K, data_width=4)
        m = dataclasses.replace(
            m, data=jnp.asarray(rng.integers(0, num_ids, size=m.d_size,
                                             dtype=np.uint32)))
        mc = jnp.full(num_ids, 2, jnp.int32)

        @jax.jit
        def run(codes, mc, m=m, num_ids=num_ids):
            f = nthash.hash_frames(codes, K, H)
            return mq.query_device_batch(m, f.hashes, f.valid, mc,
                                         0, num_ids, 10**6)

        out = run(codes, mc)
        int(jnp.sum(out["counts"].ravel()[:1]))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(codes, mc)
        int(jnp.sum(out["counts"].ravel()[:1]))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "num_ids": num_ids,
            "reads_per_s": round(R * reps / dt, 2),
            "frames_per_s": round(R * W * reps / dt, 1),
            "ms_per_batch": round(dt / reps * 1e3, 2)}), flush=True)


if __name__ == "__main__":
    main()
