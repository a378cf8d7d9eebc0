#!/usr/bin/env python3
"""Geometry sweep of the RMW ring scatter kernel on the real chip.

The MXU histogram cost is ~ nwin*slot_rows (window rows) per chunk and the
per-chunk one-hot VPU cost is ~ (wrows + 128) * chunk; smaller chunks with
proportionally smaller windows do linearly less work per position, traded
against per-chunk fixed costs and more slot DMAs. Window coverage margin
(nwin-1)*slot_words / expected-chunk-span stays >= ~1.4x in all configs.

Usage: python bench/ring_geom.py
"""

import functools
import sys
import time

sys.path.insert(0, ".")
from btl_bloomfilter_tpu.utils import platform as _p

_p.enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from btl_bloomfilter_tpu.kernels import nthash_scan, scatter_ring
from btl_bloomfilter_tpu.models import bloom

K, H = 31, 4
SIZE = 1 << 30
B, L = 512, 2048
REPS = 10

rng = np.random.default_rng(0)
codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
nwords = SIZE // 32
SENT = jnp.uint32(0xFFFFFFFF)

GEOMS = [
    dict(chunk=1024, slot_rows=32, nwin=4, s=16, pf=4),   # shipped default
    dict(chunk=1024, slot_rows=16, nwin=7, s=24, pf=4),   # rows 112
    dict(chunk=1024, slot_rows=8, nwin=13, s=40, pf=4),   # rows 104
    dict(chunk=1024, slot_rows=16, nwin=6, s=24, pf=4),   # rows 96 (1.23x)
    dict(chunk=1024, slot_rows=32, nwin=3, s=12, pf=4),   # rows 96 (0.99x!)
]


def make_step(geom):
    @functools.partial(jax.jit, donate_argnums=0)
    def step(words, codes):
        pos, _s, _v = nthash_scan.positions_planes_kernel(codes, K, H, SIZE)
        pos_s = jax.lax.sort((pos.reshape(-1),), is_stable=False)[0]
        keep = jnp.ones(pos_s.shape, bool).at[1:].set(
            pos_s[1:] != pos_s[:-1])
        keep = keep & (pos_s != SENT)
        pos_d = jnp.where(keep, pos_s, SENT)
        out, over = scatter_ring.scatter_or_sorted_inplace(
            words, pos_d, pos_for_base=pos_s, **geom)
        return jax.lax.cond(
            over > 0,
            lambda w: w | bloom.sorted_delta_words(pos_s, keep, nwords),
            lambda w: w, out), over
    return step


results = []
for geom in GEOMS:
    fn = make_step(geom)
    words = jnp.zeros(nwords, jnp.uint32)
    words, over = fn(words, codes)
    int(jnp.sum(words[:1]))
    t0 = time.perf_counter()
    for _ in range(REPS):
        words, over = fn(words, codes)
    int(jnp.sum(words[:1]))
    dt = (time.perf_counter() - t0) / REPS
    kmers = B * (L - K + 1)
    pop = int(jnp.sum(jax.lax.population_count(words).astype(jnp.uint32)))
    rows = geom["nwin"] * geom["slot_rows"]
    print(f"C={geom['chunk']:5d} rows={rows:4d} s={geom['s']:3d}: "
          f"{dt*1e3:6.2f} ms/step ({kmers/dt/1e6:6.1f}M kmers/s) "
          f"over={int(over)} pop={pop}")
    results.append((dt, geom, pop))

pops = {r[2] for r in results}
print("all pops identical:", len(pops) == 1)
best = min(results)
print(f"best: {best[1]} at {best[0]*1e3:.2f} ms")
