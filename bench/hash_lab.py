#!/usr/bin/env python3
"""Fused hash-kernel cost attribution on the real chip.

Times positions_planes_kernel / hash_frames_planes_kernel variants to
split the 4.x ms step into scan / emit / derivation / output parts.

Usage: python bench/hash_lab.py
"""

import sys
import time

sys.path.insert(0, ".")
from btl_bloomfilter_tpu.utils import platform as _p

_p.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from btl_bloomfilter_tpu.kernels import nthash_scan

K = 31
SIZE = 1 << 30
B, L = 512, 2048
REPS = 10

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))


def timed(label, fn):
    r = fn(codes)
    int(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1]
                .astype(jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = fn(codes)
    int(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1]
                .astype(jnp.int32)))
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label}: {dt*1e3:6.2f} ms")
    return dt


for h in (1, 2, 4):
    timed(f"positions mode h={h}",
          jax.jit(lambda c, h=h: nthash_scan.positions_planes_kernel(
              c, K, h, SIZE)[0]))
for h in (1, 4):
    timed(f"hash mode      h={h}",
          jax.jit(lambda c, h=h: nthash_scan.hash_frames_planes_kernel(
              c, K, h)[0].lo))
