#!/usr/bin/env python3
"""Stage budget for the MIBF headline paths (VERDICT r4 next #1), on
chip at the bench.py pinned config. Prints one JSON line per stage.

classify: hash -> prep (rank/ID gathers) -> engine scan -> summarize
construct: phase1 (insertBV) -> freeze -> phase3 scan -> phase4 scan
"""

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
from jax import lax

from btl_bloomfilter_tpu.models import mibf as mibf_mod
from btl_bloomfilter_tpu.models import mibf_construct as construct
from btl_bloomfilter_tpu.models import mibf_query as mq
from btl_bloomfilter_tpu.ops import nthash
from btl_bloomfilter_tpu.ops.u64 import U64

K, H = 31, 4
BV_SIZE = 1 << 28
NUM_IDS = 64
NREFS = NUM_IDS - 1
REF_L = 16384
RQ, LQ = 256, 2048


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
    rng = np.random.default_rng(3)
    refs = rng.integers(0, 4, size=(NREFS, REF_L), dtype=np.uint8)
    ref_codes = jnp.asarray(refs)
    res = {}

    st0 = construct.BitVectorState(
        bv_words=jnp.zeros(BV_SIZE // 32, jnp.uint32), filter_size=BV_SIZE,
        kmer_size=K, hash_num=H, occupancy=0.5, sseeds=())

    @jax.jit
    def phase1(codes):
        f = nthash.hash_frames(codes, K, H)
        return construct.insert_bv(st0, f.hashes, f.valid).bv_words, \
            f.hashes.hi, f.hashes.lo, f.valid

    res["phase1_ms"] = timed(phase1, ref_codes)
    bv, hi, lo, valid = phase1(ref_codes)

    t0 = time.perf_counter()
    m0, counts0 = construct.get_empty_mibf(
        construct.BitVectorState(bv_words=bv, filter_size=BV_SIZE,
                                 kmer_size=K, hash_num=H, occupancy=0.5,
                                 sseeds=()))
    res["freeze_ms"] = (time.perf_counter() - t0) * 1e3
    res["d_size"] = m0.d_size

    ids = jnp.arange(1, NREFS + 1, dtype=jnp.int32)

    @jax.jit
    def phase3(data, counts, hi, lo, valid, ids):
        mm = dataclasses.replace(m0, data=data)
        mm, c = construct.insert_mibf_many(mm, counts, U64(hi, lo), ids,
                                           valid=valid)
        return mm.data, c

    res["phase3_ms"] = timed(phase3, m0.data, counts0, hi, lo, valid, ids)
    data3, counts3 = phase3(m0.data, counts0, hi, lo, valid, ids)

    # one single insert_mibf call (non-scan) for per-step cost
    @jax.jit
    def p3_one(data, counts, fhi, flo, v):
        mm = dataclasses.replace(m0, data=data)
        mm, c = construct.insert_mibf(mm, counts, U64(fhi, flo), 7,
                                      valid=v)
        return mm.data, c

    res["p3_one_ms"] = timed(p3_one, m0.data, counts0, hi[0], lo[0],
                             valid[0])

    @jax.jit
    def phase4(data, counts, hi, lo, valid, ids):
        mm = dataclasses.replace(m0, data=data)
        mm, c = construct.insert_saturation_many(mm, counts, U64(hi, lo),
                                                 ids, valid=valid)
        return mm.data, c

    res["phase4_ms"] = timed(phase4, data3, counts3, hi, lo, valid, ids)

    @jax.jit
    def p4_one(data, counts, fhi, flo, v):
        mm = dataclasses.replace(m0, data=data)
        mm, c = construct.insert_saturation(mm, counts, U64(fhi, flo), 7,
                                            valid=v)
        return mm.data, c

    res["p4_one_ms"] = timed(p4_one, data3, counts3, hi[0], lo[0],
                             valid[0])
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res.items()}), flush=True)

    # ------------------------------------------------------------------
    # classify stages
    # ------------------------------------------------------------------
    m = dataclasses.replace(m0, data=data3)
    starts = rng.integers(0, REF_L - LQ, size=RQ)
    srcs = rng.integers(0, NREFS, size=RQ)
    reads = np.stack([refs[s, o: o + LQ] for s, o in zip(srcs, starts)])
    qcodes = jnp.asarray(reads)
    mc = jnp.full(NUM_IDS, 2, jnp.int32)
    res2 = {}

    @jax.jit
    def qhash(codes):
        f = nthash.hash_frames(codes, K, H)
        return f.hashes.hi, f.hashes.lo, f.valid

    res2["hash_ms"] = timed(qhash, qcodes)
    qhi, qlo, qvalid = qhash(qcodes)

    @functools.partial(jax.jit, static_argnums=3)
    def prep(qhi, qlo, qvalid, uk):
        rank, hit, raw = mibf_mod.at_rank_data(m, U64(qhi, qlo),
                                               use_kernel=uk)
        misses = jnp.sum((~hit).astype(jnp.int32), axis=-1)
        return raw, hit, jnp.asarray(qvalid) & (misses == 0), misses

    for uk in (None, True, False):
        try:
            res2[f"prep_uk{uk}_ms"] = timed(prep, qhi, qlo, qvalid, uk)
        except Exception as e:  # noqa: BLE001
            res2[f"prep_uk{uk}_ms"] = str(e)[:60]
    raw, hit, usable, misses = prep(qhi, qlo, qvalid, None)

    @jax.jit
    def scan_only(raw, hit, usable, misses, mc, qvalid):
        return mq.query_frames_batch(m, raw, hit, usable, misses, mc,
                                     NUM_IDS, 10**6, frame_eval=qvalid)

    res2["scan_ms"] = timed(scan_only, raw, hit, usable, misses, mc,
                            qvalid)
    out = scan_only(raw, hit, usable, misses, mc, qvalid)
    counts_np = np.asarray(out["counts"])
    cands_np = np.asarray(out["candidates"])
    best_np = np.asarray(out["best"])
    pfp = [0.0] + [0.1] * (NUM_IDS - 1)
    t0 = time.perf_counter()
    for _ in range(3):
        [mq.summarize(counts_np[r], cands_np[r], best_np[r], pfp, 1, 2.0,
                      False) for r in range(RQ)]
    res2["summarize_host_ms"] = (time.perf_counter() - t0) / 3 * 1e3
    print(json.dumps({k: round(v, 2) if isinstance(v, float) else v
                      for k, v in res2.items()}), flush=True)


if __name__ == "__main__":
    main()
