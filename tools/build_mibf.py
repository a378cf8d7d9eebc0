#!/usr/bin/env python3
"""Build a multi-index Bloom filter from a multi-FASTA: each record gets an
ID (1-based record order), enabling per-reference read classification.

The 4-phase MIBFConstructSupport pipeline
(/root/reference/MIBFConstructSupport.hpp) driven from the command line —
the reference leaves this to downstream BCGSC tools.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu import api
from btl_bloomfilter_tpu.io import fasta, mibf_format
from btl_bloomfilter_tpu.models import mibf, mibf_construct
from btl_bloomfilter_tpu.ops import nthash_tables
from btl_bloomfilter_tpu.utils import platform

platform.apply_env()
platform.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-f", dest="fasta", required=True,
                    help="reference sequences (multi-FASTA; one ID each)")
    ap.add_argument("-k", dest="k", type=int, default=25)
    ap.add_argument("-g", dest="hash_num", type=int, default=4,
                    help="hash functions per k-mer (or per spaced seed)")
    ap.add_argument("-b", dest="occupancy", type=float, default=0.5,
                    help="target bit-vector occupancy")
    ap.add_argument("-s", dest="seeds", default="",
                    help="comma-separated spaced seeds (overrides -k)")
    ap.add_argument("-o", dest="out", default="filter.mibf")
    args = ap.parse_args()

    seed_strings = tuple(s for s in args.seeds.split(",") if s)
    if seed_strings:
        args.k = len(seed_strings[0])

    records = list(fasta.read_fasta(args.fasta))
    if not records:
        sys.exit("no FASTA records found")
    total_bases = sum(len(s) for _, s in records)
    print(f"{len(records)} records, {total_bases} bases")

    t0 = time.time()
    st = mibf_construct.create(
        expected_entries=total_bases, k=args.k, hash_num=args.hash_num,
        occupancy=args.occupancy, spaced_seeds=seed_strings)
    pipe = api.MIBFConstructPipeline(st)
    encoded = [nthash_tables.encode_seq(seq) for _, seq in records]
    for codes in encoded:
        pipe.insert_bv_seq(codes)
    m = pipe.freeze()
    print(f"bit vector: {pipe.state.filter_size} bits, pop {m.d_size} "
          f"({m.d_size / pipe.state.filter_size:.3f} occupancy)")

    # phases 3+4 batched across records (stream order preserved; chunked
    # so one dispatch never pads an enormous record count to one bucket)
    CHUNK = 256
    for lo_i in range(0, len(encoded), CHUNK):
        batch = encoded[lo_i: lo_i + CHUNK]
        pipe.insert_mibf_batch(batch, range(lo_i + 1, lo_i + 1 + len(batch)))
    for lo_i in range(0, len(encoded), CHUNK):
        batch = encoded[lo_i: lo_i + CHUNK]
        pipe.insert_saturation_batch(batch,
                                     range(lo_i + 1, lo_i + 1 + len(batch)))
    m = pipe.m
    print(f"built in {time.time() - t0:.2f}s; saturated entries: "
          f"{int(mibf.get_pop_saturated(m))}")

    mibf_format.store_mibf(m, args.out)
    with open(args.out + ".ids", "w") as f:
        for i, (header, _) in enumerate(records, start=1):
            f.write(f"{i}\t{header}\n")
    print(f"wrote {args.out} (+.sdsl, +.ids)")


if __name__ == "__main__":
    main()
