#!/usr/bin/env python3
"""Fast-engine internals probe: pass A+B vs full, chunk sweep, num_ids
sweep — on chip at the classify bench geometry."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

import functools

import jax
import jax.numpy as jnp

from btl_bloomfilter_tpu.models import mibf, mibf_query as mq

R, W, H = 256, 2018, 4
BV_SIZE = 1 << 28


def timed(fn, *args, reps=5):
    r = fn(*args)
    int(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1].astype(
        jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    int(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1].astype(
        jnp.int32)))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    rng = np.random.default_rng(5)
    m = mibf.freeze(jnp.zeros(BV_SIZE // 32, jnp.uint32), BV_SIZE, H, 31,
                    data_width=4)
    res = {}
    for num_ids in (64, 1024, 16384):
        ids = rng.integers(0, num_ids, size=(R, W, H)).astype(np.uint32)
        sat = rng.random((R, W, H)) < 0.05
        raw = jnp.asarray(np.where(sat, ids | np.uint32(1 << 31), ids))
        hit = jnp.asarray(rng.random((R, W, H)) < 0.97)
        misses = jnp.sum((~hit).astype(jnp.int32), axis=-1)
        valid = jnp.asarray(np.ones((R, W), bool))
        usable = valid & (misses == 0)
        mc = jnp.full(num_ids, 2, jnp.int32)

        def run(raw, hit, usable, misses, mc, valid, part=None, ch=16,
                num_ids=num_ids):
            return mq.query_frames_batch(
                m, raw, hit, usable, misses, mc, num_ids, 10**6,
                frame_eval=valid, chunk=ch, _measure=part)

        for part in ("ab", "mc", "c"):
            fn = jax.jit(functools.partial(run, part=part))
            res[f"n{num_ids}_{part}_ms"] = timed(fn, raw, hit, usable,
                                                 misses, mc, valid)
        for ch in ((8, 16, 32, 64) if num_ids == 64 else (32,)):
            fn = jax.jit(functools.partial(run, ch=ch))
            res[f"n{num_ids}_full_c{ch}_ms"] = timed(
                fn, raw, hit, usable, misses, mc, valid)
        if num_ids == 64:
            old = jax.jit(functools.partial(
                mq.query_scan_batch, num_ids=num_ids,
                extra_frame_limit=10**6))
            res["n64_oldscan_ms"] = timed(old, m, raw, hit, usable,
                                          misses, mc)
        print(json.dumps({k: round(v, 2) for k, v in res.items()}),
              flush=True)


if __name__ == "__main__":
    main()
