#!/usr/bin/env python3
"""Standing on-chip kernel-equality check (VERDICT r3 weak #6 / next #8).

Asserts kernel-path == XLA-path ON THE REAL CHIP for every Mosaic kernel
the hot paths use, and prints ONE JSON line. Interpret-mode equivalents
run in CI (tests/); this artifact is the real-hardware complement — the
role `make check` plays for the reference (azure-pipelines.yml:1-19).

Run:  python bench/chip_check.py        (~2 min incl. first-compile)
The driver-visible record: BENCH extras reference this file's latest
line; ci.sh cannot run it (no chip on the CI mesh).

Checks:
  hash      fused ntHash scan kernel == XLA prefix-scan hash positions
  insert    ring scatter-OR kernel   == XLA sorted-delta scatter
  query     windowed gather kernel   == XLA gather
  c_insert  conservative closed form (gather+weighted-scatter kernels)
            == XLA closed form
  c_all     saturating histogram-add kernel == XLA scatter-add
  c_min     counter gather kernel    == XLA gather min-count
  mibf_rank paired bv+rank gather kernel == XLA rank path
"""

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu.utils import platform as _platform

_platform.enable_compilation_cache()

import jax
import jax.numpy as jnp

from btl_bloomfilter_tpu.models import bloom, counting, mibf
from btl_bloomfilter_tpu.ops import nthash, u64

K, H = 31, 4
SIZE = 1 << 27          # 2**27 bits / counters: small but >> one window
B, L = 64, 2048

results = {}


def check(name, a, b):
    ok = bool(jnp.array_equal(a, b))
    results[name] = ok
    print(f"  {name}: {'OK' if ok else 'MISMATCH'}", flush=True)
    return ok


def main():
    rng = np.random.default_rng(7)
    codes = jnp.asarray(rng.integers(0, 4, size=(B, L), dtype=np.uint8))
    print(f"chip_check on {jax.devices()[0]}", flush=True)

    # --- hash: fused scan kernel vs XLA hash_frames ----------------------
    from btl_bloomfilter_tpu.kernels import nthash_scan

    @jax.jit
    def hash_both(codes):
        posk, _strand, _validk = nthash_scan.positions_planes_kernel(
            codes, K, H, SIZE)
        f = nthash.hash_frames(codes, K, H)
        pos = u64.mod_to_index(f.hashes, SIZE)
        sent = jnp.uint32(0xFFFFFFFF)
        # kernel emits [h, B, W] planes with sentinel at invalid windows
        ref = jnp.where(f.valid[None], jnp.moveaxis(pos, -1, 0), sent)
        return posk, ref

    posk, ref = hash_both(codes)
    check("hash", posk, ref)

    # --- bloom insert / query -------------------------------------------
    import functools

    bf = bloom.create(SIZE, H, K)
    f = nthash.hash_frames(codes, K, H)

    def jit2(fn):
        # use_kernel must be a STATIC python bool (it picks code paths)
        return (jax.jit(functools.partial(fn, True)),
                jax.jit(functools.partial(fn, False)))

    ins_k, ins_x = jit2(
        lambda uk: bloom.insert(bf, f.hashes, f.valid, use_kernel=uk).words)
    wk, wx = ins_k(), ins_x()
    check("insert", wk, wx)
    bfb = dataclasses.replace(bf, words=wx)

    qry_k, qry_x = jit2(
        lambda uk: bloom.contains(bfb, f.hashes, use_kernel=uk))
    check("query", qry_k(), qry_x())

    # --- counting: conservative insert, incrementAll, min-count ----------
    cbf = counting.create(SIZE, H, K, count_threshold=1, counter_width=1)

    cins_k, cins_x = jit2(
        lambda uk: counting.insert(cbf, f.hashes, f.valid,
                                   use_kernel=uk).counters)
    ck, cx = cins_k(), cins_x()
    check("c_insert", ck, cx)
    cbf2 = dataclasses.replace(cbf, counters=cx)

    # tier-1 (ungrouped) decompose, the bench counting-insert path: both
    # kernel and XLA variants must match the grouped result on hardware
    ct1_k, ct1_x = jit2(
        lambda uk: counting.insert(cbf, f.hashes, f.valid, use_kernel=uk,
                                   group_duplicates=False).counters)
    check("c_insert_tier1_kernel", ct1_k(), cx)
    check("c_insert_tier1_xla", ct1_x(), cx)

    call_k, call_x = jit2(
        lambda uk: counting.insert_all(cbf2, f.hashes, f.valid,
                                       use_kernel=uk).counters)
    check("c_all", call_k(), call_x())

    cmin_k, cmin_x = jit2(
        lambda uk: counting.min_count(cbf2, f.hashes,
                                      use_kernel=uk).astype(jnp.uint32))
    check("c_min", cmin_k(), cmin_x())

    # --- MIBF rank gather -------------------------------------------------
    # sparse bv (every 11th word has one bit) keeps the ID array small
    bvn = np.zeros(SIZE // 32, np.uint32)
    bvn[::11] = np.uint32(1) << rng.integers(0, 32, size=bvn[::11].shape)
    m = mibf.freeze(jnp.asarray(bvn), SIZE, H, K, data_width=2)

    mr_k, mr_x = jit2(
        lambda uk: mibf.at_rank(m, f.hashes, use_kernel=uk))
    rk, fk = mr_k()
    rx, fx = mr_x()
    check("mibf_hit", fk, fx)
    check("mibf_rank", jnp.where(fk, rk, 0), jnp.where(fx, rx, 0))

    # --- MIBF classification data path (VERDICT r4 next #9) ---------------
    # populate the ID array and check the fused rank+data gather and one
    # full batched query, kernel vs XLA
    m = dataclasses.replace(
        m, data=jnp.asarray(rng.integers(0, 1 << 15, size=m.d_size,
                                         dtype=np.uint16)))

    mrd_k, mrd_x = jit2(
        lambda uk: mibf.at_rank_data(m, f.hashes, use_kernel=uk))
    rk2, fk2, rawk = mrd_k()
    rx2, fx2, rawx = mrd_x()
    check("mibf_rankdata_hit", fk2, fx2)
    check("mibf_rankdata_raw", rawk, rawx)

    from btl_bloomfilter_tpu.models import mibf_query as mq

    NUM_IDS = 64
    mc = jnp.full(NUM_IDS, 1, jnp.int32)
    data_small = jnp.asarray(rng.integers(0, NUM_IDS, size=m.d_size,
                                          dtype=np.uint16))
    mq_m = dataclasses.replace(m, data=data_small)

    def run_query(uk):
        rank, hit, raw = mibf.at_rank_data(mq_m, f.hashes, use_kernel=uk)
        misses = jnp.sum((~hit).astype(jnp.int32), axis=-1)
        usable = misses == 0
        # engine on a 256-frame slice: the scan semantics don't depend on
        # W, and the full-length scan costs minutes of compile here
        W = 256
        out = mq.query_scan_batch(mq_m, raw[:, :W], hit[:, :W],
                                  usable[:, :W], misses[:, :W], mc,
                                  NUM_IDS, 10**6,
                                  frame_eval=jnp.ones_like(usable[:, :W]))
        return out["counts"], out["candidates"], out["best"]

    q_k, q_x = jit2(run_query)
    ck_, cx_ = q_k(), q_x()
    check("mibf_query_counts", ck_[0], cx_[0])
    check("mibf_query_cands", ck_[1], cx_[1])
    check("mibf_query_best", ck_[2], cx_[2])

    # --- MIBF construct phase-1 scatter + phase-3 rank kernel -------------
    from btl_bloomfilter_tpu.models import mibf_construct as mcon

    st0 = mcon.BitVectorState(
        bv_words=jnp.zeros(SIZE // 32, jnp.uint32), filter_size=SIZE,
        kmer_size=K, hash_num=H, occupancy=0.5, sseeds=())
    bv_k, bv_x = jit2(
        lambda uk: mcon.insert_bv(st0, f.hashes, f.valid,
                                  use_kernel=uk).bv_words)
    bwk, bwx = bv_k(), bv_x()
    check("mibf_bv_insert", bwk, bwx)

    m3 = mibf.freeze(bwx, SIZE, H, K, data_width=2)
    cnt0 = jnp.zeros(m3.d_size, jnp.uint16)
    p3_k, p3_x = jit2(
        lambda uk: mcon.insert_mibf(m3, cnt0, f.hashes, 7, valid=f.valid,
                                    use_kernel=uk))
    (m3k, c3k), (m3x, c3x) = p3_k(), p3_x()
    check("mibf_reservoir_data", m3k.data, m3x.data)
    check("mibf_reservoir_counts", c3k, c3x)

    all_ok = all(results.values())
    print(json.dumps({"metric": "chip_kernel_equality",
                      "value": 1 if all_ok else 0, "unit": "bool",
                      "checks": results,
                      "device": str(jax.devices()[0])}))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
