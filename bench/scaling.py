#!/usr/bin/env python3
"""Weak-scaling harness: data-parallel build throughput vs mesh size.

On a pod slice this measures real ICI scaling; on a dev machine it runs
the same program over virtual CPU devices to validate the harness (the
numbers are then about correctness of the sweep, not absolute speed).

Usage:
    python bench/scaling.py [--devices 1 2 4 8] [--virtual]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def breakdown(args):
    """Per-stage timings of the sharded insert at each mesh size, plus a
    zero-collective control program (the same per-device local work with no
    communication at all).

    Stages are timed as cumulative prefixes of sharded_insert_frames'
    `local` body — separate jitted shard_map programs ending after (1) the
    owner route-sort, (2) the send-buffer build, (3) the all_to_all, and
    (4) the full insert — so stage cost = successive differences. If the
    CONTROL program (no collectives) loses the same efficiency at n=8
    virtual devices as the full program, the weak-scaling gap is host-CPU
    contention (N virtual devices share the host's cores), not the
    collective schedule. On real ICI hardware the same flag gives the true
    per-collective budget."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax, shard_map
    from jax.sharding import PartitionSpec as P

    from btl_bloomfilter_tpu.models import bloom
    from btl_bloomfilter_tpu.ops import nthash, u64
    from btl_bloomfilter_tpu.ops.u64 import U64
    from btl_bloomfilter_tpu.parallel import dist_bloom
    from btl_bloomfilter_tpu.parallel import mesh as mesh_lib
    from btl_bloomfilter_tpu.parallel.mesh import AXIS

    rng = np.random.default_rng(0)
    rows = {}
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        mesh = mesh_lib.make_mesh(n)
        B = args.reads_per_device * n
        codes = jnp.asarray(rng.integers(0, 4, size=(B, args.length),
                                         dtype=np.uint8))
        frames = nthash.hash_frames(codes, args.k, args.h)
        size = args.size - args.size % (n * 32)
        shard_bits = size // n
        sbf = dist_bloom.create_sharded(mesh, size, args.h, args.k)
        p = n

        def make(stage):
            def local(words, hi, lo, v):
                nloc = hi.size
                flat = U64(hi.reshape(-1), lo.reshape(-1))
                r = u64.mod_const(flat, size)
                vv = jnp.broadcast_to(v[..., None], hi.shape).reshape(-1)
                c = dist_bloom._default_cap(nloc, p)
                pos_s, owner_s, slot, _, counts = \
                    dist_bloom._route_local_sorted(r, vv, shard_bits, p)
                if stage == 1:
                    # fold counts in so the bincount isn't dead-code-eliminated
                    return ((pos_s ^ owner_s).at[: p].add(
                        counts.astype(jnp.uint32)))[None]
                buf = dist_bloom._round_sendbuf(pos_s, owner_s, slot, p, c,
                                                0)
                if stage == 2:
                    return buf.reshape(-1)[None, :256]
                recv = lax.all_to_all(buf, AXIS, split_axis=0,
                                      concat_axis=0).reshape(-1)
                if stage == 3:
                    return recv[None, :256]
                sent = jnp.uint32(0xFFFFFFFF)
                # received entries are LOCAL bit offsets within my shard
                ps = lax.sort((recv,), is_stable=False)[0]
                keep = jnp.ones(ps.shape, bool).at[1:].set(
                    ps[1:] != ps[:-1])
                keep = keep & (ps != sent)
                return (words[0] | bloom.sorted_delta_words(
                    ps, keep, words.shape[-1]))[None]

            return jax.jit(shard_map(
                local, mesh=mesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                out_specs=P(AXIS), check_vma=False))

        def control():
            """Per-device local work only — NO collectives: route-sort,
            sendbuf build, local dedupe sort, local scatter of the
            device's own positions."""
            def local(words, hi, lo, v):
                nloc = hi.size
                flat = U64(hi.reshape(-1), lo.reshape(-1))
                r = u64.mod_const(flat, size)
                vv = jnp.broadcast_to(v[..., None], hi.shape).reshape(-1)
                c = dist_bloom._default_cap(nloc, p)
                pos_s, owner_s, slot, _, counts = \
                    dist_bloom._route_local_sorted(r, vv, shard_bits, p)
                buf = dist_bloom._round_sendbuf(pos_s, owner_s, slot, p, c,
                                                0).reshape(-1)
                sent = jnp.uint32(0xFFFFFFFF)
                ps = lax.sort((buf,), is_stable=False)[0]
                keep = jnp.ones(ps.shape, bool).at[1:].set(
                    ps[1:] != ps[:-1])
                keep = keep & (ps != sent)
                safe = jnp.minimum(ps, jnp.uint32(shard_bits - 1))
                return (words[0] | bloom.sorted_delta_words(
                    safe, keep, words.shape[-1]))[None]

            return jax.jit(shard_map(
                local, mesh=mesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
                out_specs=P(AXIS), check_vma=False))

        valid = jnp.asarray(frames.valid)

        def timed(fn, reps=5):
            r = fn(sbf.words, frames.hashes.hi, frames.hashes.lo, valid)
            int(jnp.sum(r.reshape(-1)[:1].astype(jnp.uint32)))
            t0 = time.perf_counter()
            for _ in range(reps):
                r = fn(sbf.words, frames.hashes.hi, frames.hashes.lo,
                       valid)
            int(jnp.sum(r.reshape(-1)[:1].astype(jnp.uint32)))
            return (time.perf_counter() - t0) / reps

        t = {f"stage{s}": timed(make(s)) for s in (1, 2, 3, 4)}
        t["control"] = timed(control())
        rows[n] = t
        print(f"n={n}: route-sort {t['stage1']*1e3:7.2f} ms | "
              f"+sendbuf {(t['stage2']-t['stage1'])*1e3:7.2f} | "
              f"+all_to_all {(t['stage3']-t['stage2'])*1e3:7.2f} | "
              f"+local-scatter {(t['stage4']-t['stage3'])*1e3:7.2f} | "
              f"full {t['stage4']*1e3:7.2f} | "
              f"no-collective control {t['control']*1e3:7.2f}")
    if 1 in rows and max(rows) > 1:
        m = max(rows)
        for key in ("stage4", "control"):
            eff = rows[1][key] / rows[m][key] * 100
            print(f"weak-scaling efficiency n={m} vs n=1, {key}: "
                  f"{eff:.1f}% (per-device work constant)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--virtual", action="store_true",
                    help="use virtual CPU devices")
    ap.add_argument("--breakdown", action="store_true",
                    help="per-stage sharded-insert timings + no-collective "
                         "control (VERDICT r2 #9)")
    ap.add_argument("--size", type=int, default=1 << 24)
    ap.add_argument("--reads-per-device", type=int, default=64)
    ap.add_argument("--length", type=int, default=1024)
    ap.add_argument("-k", type=int, default=31)
    ap.add_argument("-g", dest="h", type=int, default=4)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                                   f" --xla_force_host_platform_device_count="
                                   f"{max(args.devices)}").strip()
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from btl_bloomfilter_tpu.models import bloom
    from btl_bloomfilter_tpu.parallel import dist_bloom
    from btl_bloomfilter_tpu.parallel import mesh as mesh_lib

    if args.breakdown:
        breakdown(args)
        return

    rng = np.random.default_rng(0)
    results = []
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"skip n={n}: only {len(jax.devices())} devices")
            continue
        mesh = mesh_lib.make_mesh(n)
        B = args.reads_per_device * n
        codes = jnp.asarray(rng.integers(0, 4, size=(B, args.length),
                                         dtype=np.uint8))
        bf = bloom.create(args.size, args.h, args.k)
        bf = dist_bloom.dp_insert_seq(mesh, bf, codes)  # compile+warm
        int(jnp.sum(bf.words[:1]))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            bf = dist_bloom.dp_insert_seq(mesh, bf, codes)
        int(jnp.sum(bf.words[:1]))
        dt = (time.perf_counter() - t0) / reps
        kmers = B * (args.length - args.k + 1)
        rate = kmers / dt
        results.append((n, rate))
        base = results[0][1] * n / results[0][0]
        print(f"dp      n={n}: {rate/1e6:8.2f} M kmers/s "
              f"(weak-scaling efficiency {rate/base*100:.1f}%)")

    # sharded filter: all_to_all position routing (insert + query)
    from btl_bloomfilter_tpu.ops import nthash
    sh_results = []
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        mesh = mesh_lib.make_mesh(n)
        B = args.reads_per_device * n
        codes = jnp.asarray(rng.integers(0, 4, size=(B, args.length),
                                         dtype=np.uint8))
        frames = nthash.hash_frames(codes, args.k, args.h)
        size = args.size - args.size % (n * 32)
        sbf = dist_bloom.create_sharded(mesh, size, args.h, args.k)
        sbf, _ = dist_bloom.sharded_insert_frames(mesh, sbf, frames.hashes,
                                                  frames.valid)
        got = dist_bloom.sharded_contains_frames(mesh, sbf, frames.hashes)
        int(jnp.sum(got[:1]))
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            sbf, _ = dist_bloom.sharded_insert_frames(
                mesh, sbf, frames.hashes, frames.valid)
            got = dist_bloom.sharded_contains_frames(mesh, sbf,
                                                     frames.hashes)
        int(jnp.sum(got[:1]))
        dt = (time.perf_counter() - t0) / reps
        kmers = B * (args.length - args.k + 1)
        rate = 2 * kmers / dt  # insert + query per rep
        sh_results.append((n, rate))
        base = sh_results[0][1] * n / sh_results[0][0]
        print(f"sharded n={n}: {rate/1e6:8.2f} M ops/s "
              f"(weak-scaling efficiency {rate/base*100:.1f}%)")


if __name__ == "__main__":
    main()
