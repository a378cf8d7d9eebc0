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


# ---------------------------------------------------------------------------
# sharded MIBF: bit-identical to the single-device pipeline
# ---------------------------------------------------------------------------

def _mibf_single_build(size, k, h, seqs, data_width=2, saturate=True):
    from btl_bloomfilter_tpu.models import mibf_construct as construct

    state = construct.BitVectorState(
        bv_words=jnp.zeros(size // 32, jnp.uint32), filter_size=size,
        kmer_size=k, hash_num=h, occupancy=0.5, sseeds=())
    frames = [nthash.hash_frames(jnp.asarray(c), k, h) for c in seqs]
    for f in frames:
        state = construct.insert_bv(state, f.hashes, f.valid)
    m, counts = construct.get_empty_mibf(state, data_width=data_width)
    for i, f in enumerate(frames):
        m, counts = construct.insert_mibf(m, counts, f.hashes, i + 1,
                                          f.valid)
    if saturate:
        for i, f in enumerate(frames):
            m, counts = construct.insert_saturation(m, counts, f.hashes,
                                                    i + 1, f.valid)
    return m, counts, frames


@pytest.mark.parametrize("nw_per", [64, 37])  # 37: non-power-of-2 shards
def test_sharded_mibf_build_and_query_matches_single(mesh, nw_per):
    from btl_bloomfilter_tpu.models import mibf as mibf_mod
    from btl_bloomfilter_tpu.parallel import dist_mibf

    k, h, p = 9, 3, 8
    size = p * 32 * nw_per
    seqs = [rand_codes(8, 40, seed=20 + i) for i in range(3)]
    m1, counts1, frames = _mibf_single_build(size, k, h, seqs,
                                             saturate=False)

    # sharded phases 1-3
    bvw = jax.device_put(jnp.zeros((p, nw_per), jnp.uint32),
                         mesh_lib.sharded(mesh))
    for f in frames:
        bvw = dist_mibf.insert_bv(mesh, bvw, size, f.hashes, f.valid)
    np.testing.assert_array_equal(np.asarray(bvw).reshape(-1),
                                  np.asarray(m1.bv_words))

    sm = dist_mibf.freeze(mesh, bvw, size, h, k, data_width=2)
    assert sm.d_size == m1.d_size
    for i, f in enumerate(frames):
        sm = dist_mibf.insert_mibf(mesh, sm, f.hashes, i + 1, f.valid)

    g, gcounts = dist_mibf.to_single(sm)
    np.testing.assert_array_equal(np.asarray(g.data), np.asarray(m1.data))
    np.testing.assert_array_equal(np.asarray(gcounts), np.asarray(counts1))

    # sharded phase 4 == single-device phase 4
    from btl_bloomfilter_tpu.models import mibf_construct as construct
    m1s, counts1s = m1, counts1
    sms = sm
    for i, f in enumerate(frames):
        m1s, counts1s = construct.insert_saturation(m1s, counts1s,
                                                    f.hashes, i + 1, f.valid)
        sms = dist_mibf.insert_saturation(mesh, sms, f.hashes, i + 1,
                                          f.valid)
    gs, _ = dist_mibf.to_single(sms)
    np.testing.assert_array_equal(np.asarray(gs.data), np.asarray(m1s.data))

    # sharded query: at_rank_data must agree with single-device
    qf = nthash.hash_frames(jnp.asarray(rand_codes(8, 30, seed=99)), k, h)
    r1, h1, raw1 = mibf_mod.at_rank_data(m1s, qf.hashes)
    r2, h2, raw2 = dist_mibf.at_rank_data(mesh, sms, qf.hashes)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(raw1), np.asarray(raw2))


def test_sharded_mibf_saturate_matches_single(mesh):
    from btl_bloomfilter_tpu.models import mibf as mibf_mod
    from btl_bloomfilter_tpu.parallel import dist_mibf

    k, h, p = 7, 3, 8
    size = p * 32 * 32
    seqs = [rand_codes(8, 30, seed=40 + i) for i in range(2)]
    m1, _, frames = _mibf_single_build(size, k, h, seqs, saturate=False)

    bvw = jax.device_put(jnp.zeros((p, size // p // 32), jnp.uint32),
                         mesh_lib.sharded(mesh))
    for f in frames:
        bvw = dist_mibf.insert_bv(mesh, bvw, size, f.hashes, f.valid)
    sm = dist_mibf.freeze(mesh, bvw, size, h, k, data_width=2)
    for i, f in enumerate(frames):
        sm = dist_mibf.insert_mibf(mesh, sm, f.hashes, i + 1, f.valid)
        m1, _c = __import__(
            "btl_bloomfilter_tpu.models.mibf_construct",
            fromlist=["insert_mibf"]).insert_mibf(
                m1, jnp.zeros(m1.d_size, m1.data.dtype) if i == 0 else _c0,
                f.hashes, i + 1, f.valid)
        _c0 = _c

    # saturate via frames of seq 0: sat bits must agree
    m1sat = mibf_mod.saturate(m1, frames[0].hashes)
    smsat = dist_mibf.saturate(mesh, sm, frames[0].hashes)
    g, _ = dist_mibf.to_single(smsat)
    np.testing.assert_array_equal(np.asarray(g.data), np.asarray(m1sat.data))
