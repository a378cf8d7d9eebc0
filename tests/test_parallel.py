"""Distribution layer on a virtual 8-device CPU mesh.

Exactness contract: any distributed build must produce bit-identical filter
words to the single-device build (OR is commutative; routing is a
permutation of the same scatter set).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax
from jax import shard_map
from jax.sharding import PartitionSpec as P

from btl_bloomfilter_tpu.models import bloom, kmer_bloom
from btl_bloomfilter_tpu.ops import nthash, u64
from btl_bloomfilter_tpu.parallel import collectives, dist_bloom
from btl_bloomfilter_tpu.parallel import mesh as mesh_lib

from util import golden_long_seq


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return mesh_lib.make_mesh(8)


def rand_codes(b, l, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, size=(b, l), dtype=np.uint8)


def test_or_allreduce_butterfly(mesh):
    rng = np.random.default_rng(1)
    x = rng.integers(0, 1 << 32, size=(8, 64), dtype=np.uint32)

    fn = shard_map(collectives.or_allreduce_butterfly, mesh=mesh,
                   in_specs=P(mesh_lib.AXIS), out_specs=P(mesh_lib.AXIS),
                   )
    # input sharded on axis0: each device gets one row [1, 64]... butterfly
    # operates on the local block; to make each device hold a distinct value
    # we reshape rows to the local shard.
    out = np.asarray(fn(x.reshape(8, 64)))
    expect = np.bitwise_or.reduce(x, axis=0)
    for r in range(8):
        np.testing.assert_array_equal(out[r], expect)


def test_or_allreduce_rsag(mesh):
    rng = np.random.default_rng(2)
    x = rng.integers(0, 1 << 32, size=(8, 128), dtype=np.uint32)

    def local(xs):
        return collectives.or_allreduce_rsag(xs[0])[None]

    fn = shard_map(local, mesh=mesh, in_specs=P(mesh_lib.AXIS),
                   out_specs=P(mesh_lib.AXIS))
    out = np.asarray(fn(x))
    expect = np.bitwise_or.reduce(x, axis=0)
    for r in range(8):
        np.testing.assert_array_equal(out[r], expect, err_msg=f"rank {r}")


def test_dp_insert_matches_single_device(mesh):
    codes = rand_codes(16, 60, seed=3)
    k, h, size = 11, 3, 8192
    bf1 = bloom.create(size, h, k)
    bf1 = kmer_bloom.insert_seq(bf1, codes)

    bf2 = bloom.create(size, h, k)
    bf2 = dist_bloom.dp_insert_seq(mesh, bf2, codes)
    np.testing.assert_array_equal(np.asarray(bf1.words), np.asarray(bf2.words))

    hits, valid = dist_bloom.dp_contains_seq(mesh, bf2, codes)
    f = nthash.hash_frames(jnp.asarray(codes), k, h)
    expect = np.asarray(bloom.contains(bf1, f.hashes) & f.valid)
    np.testing.assert_array_equal(np.asarray(hits), expect)


def test_sharded_insert_query_matches_single_device(mesh):
    codes = rand_codes(16, 60, seed=4)
    k, h, size = 11, 3, 8 * 32 * 64  # 16384 bits, multiple of 8*32
    frames = nthash.hash_frames(jnp.asarray(codes), k, h)

    bf1 = bloom.create(size, h, k)
    bf1 = bloom.insert(bf1, frames.hashes, frames.valid)

    sbf = dist_bloom.create_sharded(mesh, size, h, k)
    sbf, overflow = dist_bloom.sharded_insert_frames(mesh, sbf, frames.hashes,
                                                     frames.valid)
    assert int(overflow) == 0
    # sharded words concatenated must equal the single-device words
    np.testing.assert_array_equal(
        np.asarray(sbf.words).reshape(-1), np.asarray(bf1.words))

    got = dist_bloom.sharded_contains_frames(mesh, sbf, frames.hashes)
    expect = np.asarray(bloom.contains(bf1, frames.hashes))
    np.testing.assert_array_equal(np.asarray(got), expect)


def test_sharded_overflow_repaired_exactly(mesh):
    # a cap far too small must trigger repair rounds, not drop positions:
    # the sharded build/query must stay bit-identical to single-device
    codes = rand_codes(8, 40, seed=5)
    k, h, size = 5, 4, 8 * 32 * 8
    frames = nthash.hash_frames(jnp.asarray(codes), k, h)

    bf1 = bloom.create(size, h, k)
    bf1 = bloom.insert(bf1, frames.hashes, frames.valid)

    sbf = dist_bloom.create_sharded(mesh, size, h, k)
    sbf, rerouted = dist_bloom.sharded_insert_frames(
        mesh, sbf, frames.hashes, frames.valid, cap=2)
    assert int(rerouted) > 0  # the tiny cap really did overflow
    np.testing.assert_array_equal(
        np.asarray(sbf.words).reshape(-1), np.asarray(bf1.words))

    # query with the same tiny cap: every inserted k-mer must still be
    # found (no false negatives — the Bloom contract)
    got = dist_bloom.sharded_contains_frames(mesh, sbf, frames.hashes, cap=2)
    expect = np.asarray(bloom.contains(bf1, frames.hashes))
    np.testing.assert_array_equal(np.asarray(got), expect)
    assert np.asarray(got)[np.asarray(frames.valid)].all()


def test_sharded_default_cap_is_bounded(mesh):
    # default send buffer must be ~2x expected per-shard load, not [p, n]
    assert dist_bloom._default_cap(8000, 8) == 2000
    assert dist_bloom._default_cap(10, 8) == 8
    assert dist_bloom._default_cap(4, 8) == 4


def test_saturating_add_allreduce(mesh):
    x = np.full((8, 16), 40, dtype=np.uint32)

    def local(xs):
        return collectives.saturating_add_allreduce(xs[0], cap=255)[None]

    fn = shard_map(local, mesh=mesh, in_specs=P(mesh_lib.AXIS),
                   out_specs=P(mesh_lib.AXIS))
    out = np.asarray(fn(x))
    assert (out == 255).all()  # 8*40=320 clamped to 255


def test_dp_counting_insert_all_matches_single(mesh):
    from btl_bloomfilter_tpu.models import counting
    from btl_bloomfilter_tpu.parallel import dist_counting

    codes = rand_codes(16, 50, seed=8)
    k, h = 9, 3
    cbf1 = counting.create(256, h, k, 1, counter_width=1)
    f = nthash.hash_frames(jnp.asarray(codes), k, h)
    cbf1 = counting.insert_all(cbf1, f.hashes, f.valid)

    cbf2 = counting.create(256, h, k, 1, counter_width=1)
    cbf2 = dist_counting.dp_insert_all_seq(mesh, cbf2, codes)
    np.testing.assert_array_equal(np.asarray(cbf1.counters),
                                  np.asarray(cbf2.counters))

    hits, valid = dist_counting.dp_contains_seq(mesh, cbf2, codes)
    expect = np.asarray(counting.contains(cbf1, f.hashes) & f.valid)
    np.testing.assert_array_equal(np.asarray(hits), expect)
