#!/usr/bin/env python3
"""JSON-over-pipes worker behind the Perl binding (swig/BloomFilter.pm).

The reference exports KmerBloomFilter to Perl as ``BloomFilter::
BloomFilter`` through SWIG (/root/reference/swig/BloomFilter.i:17-39).
This framework's surface is Python, so the Perl module talks to this
worker instead: one JSON request per line on stdin, one JSON reply per
line on stdout. The worker holds a table of compat.KmerBloomFilter
objects — the same facade the Python API exposes — so Perl sees the
exact SWIG method surface (insert/contains on k-mers or precomputed
hash arrays, storeFilter, getPop/getHashNum/getKmerSize/getFilterSize,
insertSeq).

Runs on CPU by default (set BTL_BRIDGE_PLATFORM=tpu on a TPU host):
the Perl surface is one-k-mer-at-a-time, which is a host-side workflow;
batch TPU throughput lives in the tools/ CLIs and the Python API.

Protocol: {"id": n, "op": str, "args": [...]} ->
          {"id": n, "ok": true, "result": ...} |
          {"id": n, "ok": false, "error": str}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_plat = os.environ.get("BTL_BRIDGE_PLATFORM", "cpu")
if _plat == "cpu":
    from btl_bloomfilter_tpu.utils import platform as _platform

    _platform.force_cpu()

from btl_bloomfilter_tpu import compat  # noqa: E402

_filters = {}
_next_id = [1]


def _new(*args):
    fid = _next_id[0]
    _next_id[0] += 1
    _filters[fid] = compat.KmerBloomFilter(*args)
    return fid


_OPS = {
    "new": _new,
    "free": lambda fid: _filters.pop(fid, None) and None,
    "insert": lambda fid, arg: _filters[fid].insert(arg),
    "insertAndCheck":
        lambda fid, arg: bool(_filters[fid].insertAndCheck(arg)),
    "contains": lambda fid, arg: bool(_filters[fid].contains(arg)),
    "storeFilter": lambda fid, path: _filters[fid].storeFilter(path),
    "getPop": lambda fid: _filters[fid].getPop(),
    "getFPR": lambda fid: _filters[fid].getFPR(),
    "getHashNum": lambda fid: _filters[fid].getHashNum(),
    "getKmerSize": lambda fid: _filters[fid].getKmerSize(),
    "getFilterSize": lambda fid: _filters[fid].getFilterSize(),
    "sizeInBytes": lambda fid: _filters[fid].sizeInBytes(),
    "insertSeq":
        lambda fid, seq, h=0, k=0: compat.insertSeq(_filters[fid], seq,
                                                    h, k),
    "ping": lambda: "pong",
}


def main():
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        try:
            result = _OPS[req["op"]](*req.get("args", []))
            reply = {"id": req["id"], "ok": True, "result": result}
        except Exception as e:  # noqa: BLE001 — surface to Perl caller
            reply = {"id": req["id"], "ok": False, "error": repr(e)}
        sys.stdout.write(json.dumps(reply) + "\n")
        sys.stdout.flush()


if __name__ == "__main__":
    main()
