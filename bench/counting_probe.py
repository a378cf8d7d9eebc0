#!/usr/bin/env python3
"""On-chip probe: conservative counting insert, XLA vs kernel-routed
closed form, at the headline bench geometry (2**30 uint8 counters,
512x2048 reads, k=31 h=4). Also checks bit-equality between the paths."""

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

from btl_bloomfilter_tpu.models import counting
from btl_bloomfilter_tpu.ops import nthash

K, H = 31, 4
SIZE = 1 << 30
B, L = 3072, 2048    # window-coverage density needs ~25M positions/step
REPS = 10

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
kmers = B * (L - K + 1)
cbf = counting.create(SIZE, H, K, count_threshold=1, counter_width=1)


def make_step(use_kernel):
    @functools.partial(jax.jit, donate_argnums=0)
    def step(counters, codes):
        f = nthash.hash_frames(codes, K, H)
        st = dataclasses.replace(cbf, counters=counters)
        return counting.insert(st, f.hashes, f.valid,
                               use_kernel=use_kernel).counters
    return step


def drain(c):
    return int(jnp.sum(c.ravel()[:1].astype(jnp.int32)))


def time_path(use_kernel, label):
    step = make_step(use_kernel)
    counters = jnp.zeros_like(cbf.counters)
    t0 = time.perf_counter()
    counters = step(counters, codes)
    drain(counters)
    print(f"{label}: first call {time.perf_counter() - t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    for _ in range(REPS):
        counters = step(counters, codes)
    drain(counters)
    dt = time.perf_counter() - t0
    rate = kmers * REPS / dt
    print(f"{label}: {dt / REPS * 1e3:.2f} ms/step, {rate / 1e6:.2f}M "
          "kmers/s", flush=True)
    # checksum over the final state for cross-path comparison
    s = int(jnp.sum(counters.astype(jnp.uint32)))
    nz = int(jnp.sum((counters != 0).astype(jnp.uint32)))
    print(f"{label}: sum={s} nonzero={nz}", flush=True)
    return rate, (s, nz)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("both", "kernel"):
        time_path(True, "kernel")
    if which in ("both", "xla"):
        time_path(False, "xla")
