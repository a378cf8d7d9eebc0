#!/usr/bin/env python3
"""Steady-state timing: delta-accumulating ring kernel vs the in-place
(read-modify-write) ring kernel.

Run on the real chip:  python bench/ring_probe.py
Times the full production insert step (fused hash kernel + unstable sort +
ring scatter) with scatter_or_sorted (delta array + separate `words|delta`
XLA pass) against scatter_or_sorted_inplace (filter slots stream through
the VMEM ring once), and checks the resulting filters are bit-identical.
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


def make_step(kernel):
    @functools.partial(jax.jit, donate_argnums=0)
    def step(words, codes):
        pos, _strand, _valid = nthash_scan.positions_planes_kernel(
            codes, K, H, SIZE)
        sent = jnp.uint32(0xFFFFFFFF)
        pos_s = jax.lax.sort((pos.reshape(-1),), is_stable=False)[0]
        keep = jnp.ones(pos_s.shape, bool).at[1:].set(
            pos_s[1:] != pos_s[:-1])
        keep = keep & (pos_s != sent)
        pos_d = jnp.where(keep, pos_s, sent)
        out, over = kernel(words, pos_d, pos_for_base=pos_s)
        out = jax.lax.cond(
            over > 0,
            lambda w: w | bloom.sorted_delta_words(pos_s, keep, nwords),
            lambda w: w, out)
        return out
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
    print(f"{label}: {dt*1e3:.2f} ms/step = {kmers/dt/1e6:.1f}M kmers/s")
    return words


w_delta = timed(make_step(scatter_ring.scatter_or_sorted), "delta ring")
w_rmw = timed(make_step(scatter_ring.scatter_or_sorted_inplace), "rmw   ring")
pop_d = int(jnp.sum(jax.lax.population_count(w_delta).astype(jnp.uint64)))
pop_r = int(jnp.sum(jax.lax.population_count(w_rmw).astype(jnp.uint64)))
same = bool(jnp.all(w_delta == w_rmw))
print(f"popcount delta={pop_d} rmw={pop_r} identical={same}")
assert same, "RMW ring kernel diverges from the delta ring kernel"
