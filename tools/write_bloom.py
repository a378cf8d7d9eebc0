#!/usr/bin/env python3
"""Build a Bloom filter from a FASTA file (TPU-batched).

CLI parity with the reference's writeBloom_rolling tool
(/root/reference/swig/writeBloom_rolling.cpp:68-117): -f FASTA, -k k-mer
size, -p target FPR; sizing math size = ceil(-n ln p / ln^2 2) rounded up to
a multiple of 64 and hashNum = floor((size/n) ln 2)
(writeBloom_rolling.cpp:100-103, with n = input file size in bytes).
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from btl_bloomfilter_tpu import native
from btl_bloomfilter_tpu.io import bf_format, fasta
from btl_bloomfilter_tpu.models import bloom, kmer_bloom
from btl_bloomfilter_tpu.utils import platform

platform.apply_env()
platform.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-f", dest="fasta", required=True,
                    help="sequences (multi-FASTA)")
    ap.add_argument("-k", dest="k", type=int, default=15, help="k-mer size")
    ap.add_argument("-p", dest="fpr", type=float, default=0.0001,
                    help="target false positive rate")
    ap.add_argument("-o", dest="out", default="BloomFilter.bf",
                    help="output filter path")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--pad", type=int, default=1024)
    args = ap.parse_args()

    n = os.path.getsize(args.fasta)
    size = math.ceil((-1 * n * math.log(args.fpr)) /
                     (math.log(2) * math.log(2)))
    size += 64 - (size % 64)
    hash_num = int((size // n) * math.log(2))
    print(f"***** Bloom filter specs:\nelements = {n}\nFPR = {args.fpr}\n"
          f"size (bits) = {size}\nhash functions = {hash_num}")

    bf = bloom.create(size, hash_num, args.k)
    insert = jax.jit(kmer_bloom.insert_seq, donate_argnums=0)

    t0 = time.time()
    nbatches = 0
    for codes in native.FastaReader(args.fasta, args.batch, args.pad, args.k):
        bf = insert(bf, codes)
        nbatches += 1
    jax.block_until_ready(bf.words)
    dt = time.time() - t0
    print(f"inserted {nbatches} batches in {dt:.3f}s")

    bf_format.store_bloom(bf, args.out)
    print(f"wrote {bf.size_in_bytes} byte filter to {args.out}\nDone!")


if __name__ == "__main__":
    main()
