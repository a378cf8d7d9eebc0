#!/usr/bin/env python3
"""Query a Bloom filter with every k-mer of a FASTA file (TPU-batched).

CLI parity with the reference's testBloom_rolling tool
(/root/reference/swig/testBloom_rolling.cpp): loads BloomFilter.bf and
reports hits/misses per record.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from btl_bloomfilter_tpu import native
from btl_bloomfilter_tpu.io import bf_format, fasta
from btl_bloomfilter_tpu.models import kmer_bloom
from btl_bloomfilter_tpu.utils import platform

platform.apply_env()
platform.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-f", dest="fasta", required=True)
    ap.add_argument("-b", dest="bf", default="BloomFilter.bf",
                    help="filter path")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--pad", type=int, default=1024)
    args = ap.parse_args()

    bf = bf_format.load_bloom(args.bf)
    query = jax.jit(kmer_bloom.contains_seq)

    total = hits = 0
    for codes in native.FastaReader(args.fasta, args.batch, args.pad,
                                    bf.kmer_size):
        found, valid = query(bf, codes)
        found = np.asarray(found)
        valid = np.asarray(valid)
        total += int(valid.sum())
        hits += int(found.sum())
    print(f"Found {hits} out of {total}", file=sys.stderr)


if __name__ == "__main__":
    main()
