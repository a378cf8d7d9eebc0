"""2-process jax.distributed smoke test (VERDICT r3 missing #4).

Launches tests/multihost_worker.py twice with a localhost coordinator:
each process contributes 2 virtual CPU devices, the 4-device global mesh
spans both processes, and the dp build's OR-allreduce crosses the
process boundary over the gloo backend. The merged filter must be
byte-identical to the single-process build — the same exactness contract
as test_parallel.py, now across real process boundaries
(parallel/multihost.py; SURVEY.md §5 distributed-backend row).
"""

import os
import socket
import subprocess
import sys

import jax
import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_build_matches_single(tmp_path):
    port = _free_port()
    out = str(tmp_path / "mh_words.bin")
    worker = os.path.join(_DIR, "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), "2", str(port), out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    # single-process reference build (this process's 8-device CPU mesh is
    # irrelevant: dp OR-merge output is replicated and order-free)
    from btl_bloomfilter_tpu.models import bloom, kmer_bloom
    from btl_bloomfilter_tpu.ops import nthash

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(8, 64), dtype=np.uint8)
    bf = bloom.create(4096, 3, 9)
    f = nthash.hash_frames(jax.numpy.asarray(codes), 9, 3)
    bf = bloom.insert(bf, f.hashes, f.valid)

    got = np.fromfile(out, dtype=np.uint32)
    np.testing.assert_array_equal(got, np.asarray(bf.words))
    assert got.any()
