#!/usr/bin/env python3
"""at_rank_data (classification prep) sub-stage budget on chip:
sort -> bv+cum pair gather -> data gather -> un-sort, at the classify
bench geometry (2.07M positions over a 2^28-bit populated bv)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

import dataclasses

import jax
import jax.numpy as jnp

from btl_bloomfilter_tpu.models import mibf
from btl_bloomfilter_tpu.kernels import gather_words as gw

BV_SIZE = 1 << 28
N = 256 * 2018 * 4


def timed(fn, *args, reps=10):
    r = fn(*args)
    int(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1].astype(
        jnp.int32)))
    t0 = time.perf_counter()
    for _ in range(reps):
        r = fn(*args)
    int(jnp.sum(jax.tree_util.tree_leaves(r)[0].ravel()[:1].astype(
        jnp.int32)))
    return round((time.perf_counter() - t0) / reps * 1e3, 2)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--density", type=float, default=0.25,
                    help="bit density of the bv (bench filter: ~0.0152)")
    args = ap.parse_args()
    rng = np.random.default_rng(1)
    nbits = int(BV_SIZE * args.density)
    setpos = rng.integers(0, BV_SIZE, size=nbits, dtype=np.uint64)
    bva = np.zeros(BV_SIZE // 32, np.uint32)
    np.bitwise_or.at(bva, (setpos >> 5).astype(np.int64),
                     (np.uint32(1) << (setpos & 31).astype(np.uint32)))
    m = mibf.freeze(jnp.asarray(bva), BV_SIZE, 4, 31, data_width=2)
    m = dataclasses.replace(
        m, data=jnp.asarray(rng.integers(0, 64, size=m.d_size,
                                         dtype=np.uint16)))
    pos = jnp.asarray(rng.integers(0, BV_SIZE, size=N, dtype=np.uint32))
    res = {"n": N, "d_size": m.d_size}

    res["sort_pos_idx_ms"] = timed(jax.jit(
        lambda p: jax.lax.sort((p, jnp.arange(N, dtype=jnp.int32)),
                               num_keys=1, is_stable=False)[0]), pos)

    pos_s = jax.lax.sort((pos,), is_stable=False)[0]

    res["pair_gather_ms"] = timed(jax.jit(
        lambda ps: gw.gather_words_pair_sorted(m.bv_words, m.cum_ranks,
                                               ps)[0]), pos_s)
    res["single_gather_ms"] = timed(jax.jit(
        lambda ps: gw.gather_words_sorted(m.bv_words, ps)[0]), pos_s)

    res["unsort3_ms"] = timed(jax.jit(
        lambda ps: jax.lax.sort(
            (ps, ps, ps), num_keys=1, is_stable=False)[1]), pos_s)

    res["full_rankdata_ms"] = timed(jax.jit(
        lambda p: mibf.rank_data_of_positions_kernel(m, p)[0]), pos)
    res["over_count"] = int(jax.jit(
        lambda p: mibf.rank_data_of_positions_kernel(m, p)[3])(pos))

    def kern_all(p):
        rank, hit, raw, over = mibf.rank_data_of_positions_kernel(m, p)
        return rank + hit + raw.astype(jnp.int32) + over

    res["full_rankdata_all_ms"] = timed(jax.jit(kern_all), pos)
    res["data_u32_words_ms"] = timed(jax.jit(
        lambda d: mibf._data_u32_words(
            dataclasses.replace(m, data=d))), m.data)

    def bitcast_pack(d):
        pad = (-d.shape[0]) % 2
        d2 = jnp.concatenate([d, jnp.zeros(pad, d.dtype)]) if pad else d
        return jax.lax.bitcast_convert_type(
            d2.reshape(-1, 2), jnp.uint32)

    res["data_bitcast_ms"] = timed(jax.jit(bitcast_pack), m.data)
    a = np.asarray(jax.jit(lambda d: mibf._data_u32_words(
        dataclasses.replace(m, data=d)))(m.data))
    b = np.asarray(jax.jit(bitcast_pack)(m.data))
    res["bitcast_equal"] = bool((a == b).all())

    from btl_bloomfilter_tpu.ops.u64 import U64
    R, W, H2 = 256, 2018, 4
    hview = U64(jnp.zeros((R, W, H2), jnp.uint32),
                pos[: R * W * H2].reshape(R, W, H2))

    def wrapper(hlo, uk):
        hh = U64(jnp.zeros_like(hlo), hlo)
        rank, hit, raw = mibf.at_rank_data(m, hh, use_kernel=uk)
        return rank

    import functools
    res["at_rank_data_ukTrue_ms"] = timed(
        jax.jit(functools.partial(wrapper, uk=True)), hview.lo)
    res["at_rank_data_ukNone_ms"] = timed(
        jax.jit(functools.partial(wrapper, uk=None)), hview.lo)
    res["full_rankdata_xla_ms"] = timed(jax.jit(
        lambda p: mibf.rank_of_positions(m, p)[0]), pos)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
