"""Worker for the 2-process jax.distributed smoke test.

Launched twice by tests/test_multihost.py with a localhost coordinator;
each process brings 2 virtual CPU devices, so the global mesh spans 4
devices across 2 processes and the dp OR-allreduce rides the gloo
cross-process backend. Process 0 writes the resulting filter words to
argv[4]; the parent asserts byte-equality with the single-process build
(SURVEY.md §5 distributed-backend row).

Not a pytest module — invoked as ``python multihost_worker.py pid nproc
port outpath``.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from btl_bloomfilter_tpu.models import bloom
from btl_bloomfilter_tpu.parallel import dist_bloom
from btl_bloomfilter_tpu.parallel import mesh as mesh_lib
from btl_bloomfilter_tpu.parallel import multihost


def main():
    pid, nproc, port, outpath = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    multihost.init(f"localhost:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc
    mesh = mesh_lib.make_mesh()

    rng = np.random.default_rng(5)
    codes = rng.integers(0, 4, size=(8, 64), dtype=np.uint8)
    bf = bloom.create(4096, 3, 9)
    bf = dist_bloom.dp_insert_seq(mesh, bf, codes)

    hits, valid = dist_bloom.dp_contains_seq(mesh, bf, codes)
    # dp outputs are batch-sharded; gather this process's view for the
    # self-check (every inserted window must be found)
    local_hits = np.concatenate(
        [np.asarray(s.data) for s in hits.addressable_shards])
    local_valid = np.concatenate(
        [np.asarray(s.data) for s in valid.addressable_shards])
    assert (local_hits == local_valid).all()

    multihost.barrier()
    if multihost.is_primary():
        np.asarray(bf.words).tofile(outpath)
    multihost.barrier()


if __name__ == "__main__":
    main()
