#!/usr/bin/env python3
"""Classify reads against a multi-index Bloom filter.

Streams a FASTA of reads, runs the MIBFQuerySupport-equivalent engine per
read, and prints: read_header, best ID, best reference header, and the
7-field evidence counts.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from btl_bloomfilter_tpu import api
from btl_bloomfilter_tpu.io import fasta, mibf_format
from btl_bloomfilter_tpu.models import mibf, mibf_query
from btl_bloomfilter_tpu.ops import nthash_tables
from btl_bloomfilter_tpu.utils import platform

platform.apply_env()
platform.enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-f", dest="fasta", required=True, help="reads FASTA")
    ap.add_argument("-b", dest="mibf", default="filter.mibf")
    ap.add_argument("-m", dest="min_count", type=int, default=2,
                    help="per-ID frame-count promotion threshold")
    ap.add_argument("--max-miss", type=int, default=0)
    ap.add_argument("--extra-frame-limit", type=int, default=10**6)
    ap.add_argument("--best-hit-agree", action="store_true")
    ap.add_argument("--batch", type=int, default=64,
                    help="reads classified per device dispatch")
    args = ap.parse_args()

    m = mibf_format.load_mibf(args.mibf)
    id_names = {}
    try:
        with open(args.mibf + ".ids") as f:
            for line in f:
                i, name = line.rstrip("\n").split("\t", 1)
                id_names[int(i)] = name
    except FileNotFoundError:
        pass
    num_ids = (max(id_names) if id_names else 0) + 1
    if num_ids <= 1:
        num_ids = int(np.asarray(m.data).max()) + 1

    pfp, sat_prop = mibf.calc_frame_probs(m, num_ids, args.max_miss)
    qs = mibf_query.MIBFQuerySupport(
        m=m, per_frame_prob=pfp, extra_count=2.0,
        extra_frame_limit=args.extra_frame_limit, max_miss=args.max_miss,
        min_count=1, best_hit_agree=args.best_hit_agree)
    mc = np.full(num_ids, args.min_count, np.int32)

    k, h = m.kmer_size, m.hash_num
    hp = api.HashPipeline(k, h, tuple(m.sseeds))
    def emit(header, res):
        if not res:
            print(f"{header}\t*\tunclassified")
        else:
            r = res[0]
            name = id_names.get(r.id, str(r.id))
            print(f"{header}\t{r.id}\t{name}\tnsf={r.non_sat_frame_count}"
                  f"\tcount={r.count}\tsolid={r.solid_count}"
                  f"\tprob={r.frame_prob:.3g}")

    def flush(batch):
        if not batch:
            return
        headers, codes_list = zip(*batch)
        # pad the read axis to the fixed batch size with all-N dummy reads
        # (their frames are invalid) so each length bucket compiles once
        codes_list = list(codes_list)
        ndummy = args.batch - len(codes_list)
        if ndummy > 0:
            codes_list += [np.full(1, nthash_tables.CODE_N, np.uint8)
                           ] * ndummy
        fr = hp.frames_batch(codes_list)
        for header, res in zip(headers, qs.query_many(
                fr.hashes, np.asarray(fr.valid), mc)):
            emit(header, res)
        batch.clear()

    # batch reads (grouped by length bucket to bound padding waste) and
    # classify each batch in one device dispatch
    batch, batch_bucket = [], None
    for header, seq in fasta.read_fasta(args.fasta):
        codes = nthash_tables.encode_seq(seq)
        if len(codes) < k:
            print(f"{header}\t*\tshort")
            continue
        bucket = api.bucket_length(len(codes), max(64, k))
        if batch_bucket is not None and (bucket != batch_bucket
                                         or len(batch) >= args.batch):
            flush(batch)
            batch_bucket = None
        if batch_bucket is None:
            batch_bucket = bucket
        batch.append((header, codes))
    flush(batch)


if __name__ == "__main__":
    main()
