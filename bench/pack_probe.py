#!/usr/bin/env python3
"""Micro-probe: cost of strided per-counter <-> packed-word conversion
and of the conservative-decompose stages at bench scale on the real
chip.

DECISION RECORD (round 4): the counting filter originally stored
per-counter uint8/16/32 planes and packed/unpacked around the Mosaic
kernels. Measured here on TPU v5e at the 2^30-counter uint8 config:
pack (stride-4 u8 reads) 23.9 s, unpack (stride-4 u8 writes) 5.7 s per
step — stride-``per`` byte access fights the (32, 128) tiled layout.
models/counting.py therefore stores widths 1/2/4 PACKED in uint32 words
natively (lane extraction is pure vector shifts); the strided functions
live only here, as the measurement of the rejected design."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

import jax
import jax.numpy as jnp

from btl_bloomfilter_tpu.models import counting

SIZE = 1 << 30
REPS = 5


def _pack_words_strided(counters, per):
    """REJECTED design (see module docstring): stride-``per`` reads."""
    bits = 32 // per
    c = counters.astype(jnp.uint32)
    w = c[0::per]
    for j in range(1, per):
        w = w | (c[j::per] << jnp.uint32(bits * j))
    return w


def _unpack_words_strided(words, dtype, size, per):
    """REJECTED design (see module docstring): stride-``per`` writes."""
    bits = 32 // per
    mask = jnp.uint32((1 << bits) - 1)
    out = jnp.empty(size, dtype)
    for j in range(per):
        out = out.at[j::per].set(
            ((words >> jnp.uint32(bits * j)) & mask).astype(dtype))
    return out


def timed(label, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    r = jfn(*args)
    jax.tree_util.tree_map(
        lambda x: int(jnp.sum(x.ravel()[:1].astype(jnp.int32))), r)
    print(f"{label}: first {time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(REPS):
        r = jfn(*args)
    jax.tree_util.tree_map(
        lambda x: int(jnp.sum(x.ravel()[:1].astype(jnp.int32))), r)
    print(f"{label}: {(time.perf_counter() - t0) / REPS * 1e3:.2f} ms",
          flush=True)


def main():
    # generate on-device: host->device over the remote tunnel is slow
    @jax.jit
    def gen():
        i = jax.lax.iota(jnp.uint32, SIZE)
        counters = ((i * jnp.uint32(2654435761)) >> 24).astype(jnp.uint8)
        w = jax.lax.iota(jnp.uint32, SIZE // 4) * jnp.uint32(0x9E3779B9)
        return counters, w

    counters, words = gen()
    timed("pack u8->u32", lambda c: _pack_words_strided(c, 4), counters)
    timed("unpack u32->u8",
          lambda w: _unpack_words_strided(w, jnp.uint8, SIZE, 4), words)

    n = 1 << 20

    @jax.jit
    def genpos():
        i = jax.lax.iota(jnp.uint32, n * 4)
        return ((i * jnp.uint32(0x85EBCA6B)) ^ (i >> 13)).reshape(n, 4) \
            % jnp.uint32(SIZE)

    pos = genpos()
    v = jnp.ones((n,), bool)

    def decomp(pos, v):
        d = counting._conservative_decompose(pos, v, None, SIZE)
        return d["ks"], d["rep"], d["n_ent"]

    timed("decompose (no gather)", decomp, pos, v)

    def sched(pos, v):
        d = counting._conservative_decompose(pos, v, None, SIZE)
        depth, mx, ok = counting._replay_schedule(
            d["ent_pos"], d["n_ent"], d["sent"])
        return depth, mx, ok, d["n_ent"]

    timed("decompose + replay schedule", sched, pos, v)
    r = jax.jit(sched)(pos, v)
    print("n_ent =", int(r[3]), "max_depth =", int(r[1]),
          "sched_ok =", bool(r[2]), flush=True)

    # full kernel-routed insert at bench scale for the stage delta
    # (words-native storage: 4 uint8 counters per uint32 word)
    words8 = jnp.zeros(SIZE // 4, jnp.uint32)

    def kins(ws, pos, v):
        return counting.insert_positions(ws, pos, v, 255, SIZE, 4,
                                         use_kernel=True)

    timed("kernel insert_positions", kins, words8, pos, v)


if __name__ == "__main__":
    main()
