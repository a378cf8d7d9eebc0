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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--virtual", action="store_true",
                    help="use virtual CPU devices")
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
