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


# ---------------------------------------------------------------------------
# sharded counting filter: bit-identical to the single-device plane
# ---------------------------------------------------------------------------

def _counting_pair(mesh, size_bytes, k, h, thr=1, width=1):
    from btl_bloomfilter_tpu.models import counting
    from btl_bloomfilter_tpu.parallel import dist_counting
    cbf = counting.create(size_bytes, h, k, thr, counter_width=width)
    scbf = dist_counting.create_sharded(mesh, size_bytes, h, k, thr,
                                        counter_width=width)
    assert scbf.size == cbf.size  # choose size_bytes % (8*p) == 0
    return cbf, scbf


@pytest.mark.parametrize("cap", [None, 2])  # cap=2 forces overflow rounds
def test_sharded_counting_insert_all_matches_single(mesh, cap):
    from btl_bloomfilter_tpu.models import counting
    from btl_bloomfilter_tpu.parallel import dist_counting

    codes = rand_codes(16, 50, seed=31)
    k, h = 9, 3
    cbf, scbf = _counting_pair(mesh, 256, k, h)
    f = nthash.hash_frames(jnp.asarray(codes), k, h)

    cbf = counting.insert_all(cbf, f.hashes, f.valid)
    scbf = dist_counting.sharded_insert_all(mesh, scbf, f.hashes, f.valid,
                                            cap=cap)
    np.testing.assert_array_equal(np.asarray(scbf.counters).reshape(-1),
                                  counting.to_numpy(cbf))

    mc1 = np.asarray(counting.min_count(cbf, f.hashes))
    mc2 = np.asarray(dist_counting.sharded_min_count(mesh, scbf, f.hashes,
                                                     cap=cap))
    np.testing.assert_array_equal(mc2.astype(np.uint32),
                                  mc1.astype(np.uint32))

    c1 = np.asarray(counting.contains(cbf, f.hashes))
    c2 = np.asarray(dist_counting.sharded_contains(mesh, scbf, f.hashes,
                                                   cap=cap))
    np.testing.assert_array_equal(c2, c1)


def test_sharded_counting_insert_all_cap_overflow_saturates_exactly(mesh):
    """256 counters only (tiny), uint8 plane, a heavy stream: saturating
    adds must compose exactly across the forced repair rounds
    (min(min(c+a,M)+b,M) == min(c+a+b,M))."""
    from btl_bloomfilter_tpu.models import counting
    from btl_bloomfilter_tpu.parallel import dist_counting

    codes = rand_codes(64, 140, seed=32)
    k, h = 5, 4  # small k => heavy per-counter multiplicity
    cbf, scbf = _counting_pair(mesh, 64, k, h)
    f = nthash.hash_frames(jnp.asarray(codes), k, h)
    cbf = counting.insert_all(cbf, f.hashes, f.valid)
    scbf = dist_counting.sharded_insert_all(mesh, scbf, f.hashes, f.valid,
                                            cap=2)
    counters = np.asarray(scbf.counters).reshape(-1)
    np.testing.assert_array_equal(counters, counting.to_numpy(cbf))
    assert counters.max() == 255  # saturation really happened


def test_sharded_counting_conservative_insert_matches_single(mesh):
    from btl_bloomfilter_tpu.models import counting
    from btl_bloomfilter_tpu.parallel import dist_counting

    codes = rand_codes(16, 50, seed=33)
    k, h = 9, 3
    cbf, scbf = _counting_pair(mesh, 256, k, h)
    f = nthash.hash_frames(jnp.asarray(codes), k, h)

    cbf = counting.insert(cbf, f.hashes, f.valid)
    scbf = dist_counting.sharded_insert(mesh, scbf, f.hashes, f.valid)
    np.testing.assert_array_equal(np.asarray(scbf.counters).reshape(-1),
                                  counting.to_numpy(cbf))


def test_sharded_counting_conservative_entangled_heavy(mesh):
    """A tiny counter plane (64 counters, h=4) entangles nearly every
    frame: the replicated replay (and the full-sequential fallback when
    max_entangled is tiny) must both stay bit-identical to the
    single-device stream."""
    from btl_bloomfilter_tpu.models import counting
    from btl_bloomfilter_tpu.parallel import dist_counting

    codes = rand_codes(16, 40, seed=34)
    k, h = 5, 4
    f = nthash.hash_frames(jnp.asarray(codes), k, h)

    # sequential ground truth on the concatenated plane
    cbf0, scbf0 = _counting_pair(mesh, 64, k, h)
    ref = counting.insert_sequential(cbf0, f.hashes, f.valid)

    scbf = dist_counting.sharded_insert(mesh, scbf0, f.hashes, f.valid)
    np.testing.assert_array_equal(np.asarray(scbf.counters).reshape(-1),
                                  counting.to_numpy(ref))

    # force the full-sequential fallback inside the replicated table
    scbf2 = dist_counting.sharded_insert(mesh, scbf0, f.hashes, f.valid,
                                         max_entangled=4)
    np.testing.assert_array_equal(np.asarray(scbf2.counters).reshape(-1),
                                  counting.to_numpy(ref))


# ---------------------------------------------------------------------------
# classification against a sharded MIBF
# ---------------------------------------------------------------------------

def _query_results_equal(a, b):
    return [(r.id, r.count, r.non_sat_count, r.total_count,
             r.total_non_sat_count, r.non_sat_frame_count, r.solid_count)
            for r in a] == \
           [(r.id, r.count, r.non_sat_count, r.total_count,
             r.total_non_sat_count, r.non_sat_frame_count, r.solid_count)
            for r in b]


def test_sharded_classification_matches_single(mesh):
    """Ranked QueryResults from ShardedMIBFQuerySupport must be identical
    to MIBFQuerySupport against the equivalent single-device filter —
    including a paired-end batch (MIBFQuerySupport.hpp:94-130)."""
    from btl_bloomfilter_tpu.models import mibf_query
    from btl_bloomfilter_tpu.parallel import dist_mibf

    k, h, p = 9, 3, 8
    size = p * 32 * 64
    seqs = [rand_codes(8, 40, seed=50 + i) for i in range(3)]
    m1, counts1, frames = _mibf_single_build(size, k, h, seqs,
                                             saturate=True)

    # sharded build, phases 1-4 (phase 4 via the gather/re-shard path)
    from btl_bloomfilter_tpu.models import mibf_construct as construct
    bvw = jax.device_put(jnp.zeros((p, size // p // 32), jnp.uint32),
                         mesh_lib.sharded(mesh))
    for f in frames:
        bvw = dist_mibf.insert_bv(mesh, bvw, size, f.hashes, f.valid)
    sm = dist_mibf.freeze(mesh, bvw, size, h, k, data_width=2)
    for i, f in enumerate(frames):
        sm = dist_mibf.insert_mibf(mesh, sm, f.hashes, i + 1, f.valid)
    for i, f in enumerate(frames):
        sm = dist_mibf.insert_saturation(mesh, sm, f.hashes, i + 1, f.valid)

    num_ids = 5
    pfp = [0.0] + [0.1] * (num_ids - 1)
    mc = np.full(num_ids, 1, np.int32)
    kwargs = dict(per_frame_prob=pfp, extra_count=2.0,
                  extra_frame_limit=10**6, max_miss=0, min_count=1,
                  best_hit_agree=False)
    qs1 = mibf_query.MIBFQuerySupport(m=m1, **kwargs)
    qs2 = dist_mibf.ShardedMIBFQuerySupport(mesh=mesh, m=sm, **kwargs)

    # 8 reads (divisible by the mesh), mixed hit/miss content
    qcodes = np.concatenate([rand_codes(4, 40, seed=60),
                             seqs[1][:2], seqs[2][:2]])
    qf = nthash.hash_frames(jnp.asarray(qcodes), k, h)

    got1 = qs1.query_many(qf.hashes, qf.valid, mc)
    got2 = qs2.query_many(qf.hashes, qf.valid, mc)
    assert len(got1) == len(got2) == 8
    assert any(got1)  # at least one read classifies to something
    for a, b in zip(got1, got2):
        assert _query_results_equal(a, b)
    assert qs1.sat_count == qs2.sat_count
    assert qs1.eval_count == qs2.eval_count

    # paired-end: ends of different widths, same exactness contract
    q2codes = np.concatenate([rand_codes(4, 30, seed=61),
                              seqs[1][2:4, :30], seqs[2][2:4, :30]])
    qf2 = nthash.hash_frames(jnp.asarray(q2codes), k, h)
    p1 = qs1.query_paired_many(qf.hashes, qf.valid, qf2.hashes, qf2.valid,
                               mc)
    p2 = qs2.query_paired_many(qf.hashes, qf.valid, qf2.hashes, qf2.valid,
                               mc)
    assert any(p1)
    for a, b in zip(p1, p2):
        assert _query_results_equal(a, b)


# ---------------------------------------------------------------------------
# sharded filters beyond 2**32 addressable units (two-limb local routing)
# ---------------------------------------------------------------------------

def test_sharded_bloom_beyond_2_32_bits(mesh):
    """A sharded bit array larger than 2**32 bits must route exactly:
    local offsets are the low limb of divmod(position, shard_bits)
    (BloomFilter.hpp size_t addressing, :190-192). Verified bit-identical
    to the single-device two-limb insert path."""
    size = (1 << 32) + 256 * 32
    h, k = 3, 5
    n = 256
    rng = np.random.default_rng(33)
    vals = np.concatenate([
        rng.integers(0, 1 << 32, size=(n // 2, h), dtype=np.uint64),
        rng.integers(1 << 32, size, size=(n // 2, h), dtype=np.uint64)])
    hashes = u64.from_numpy(vals.reshape(n, 1, h))
    sbf = dist_bloom.create_sharded(mesh, size, h, k)
    sbf, overflow = dist_bloom.sharded_insert_frames(
        mesh, sbf, hashes, jnp.ones((n, 1), bool))
    got = dist_bloom.sharded_contains_frames(mesh, sbf, hashes)
    assert np.asarray(got).all()

    bf = bloom.insert(bloom.create(size, h, k), u64.from_numpy(vals))
    np.testing.assert_array_equal(np.asarray(sbf.words).reshape(-1),
                                  np.asarray(bf.words))
    assert int(bloom.get_pop(bf)) > 0

    probes = rng.integers(0, size, size=(64, h), dtype=np.uint64)
    exp = np.asarray(bloom.contains(bf, u64.from_numpy(probes)))
    got2 = dist_bloom.sharded_contains_frames(
        mesh, sbf, u64.from_numpy(probes.reshape(64, 1, h)))
    np.testing.assert_array_equal(np.asarray(got2).reshape(-1), exp)


def test_sharded_counting_beyond_2_32_counters(mesh):
    """A sharded counter plane larger than 2**32 counters: conservative
    insert, min-count and incrementAll all route via two-limb local
    offsets; verified against a python conservative-update model of the
    touched counters (CountingBloomFilter.hpp:135-162)."""
    from btl_bloomfilter_tpu.parallel import dist_counting

    size_bytes = (1 << 32) + 64
    h, k = 2, 5
    scbf = dist_counting.create_sharded(mesh, size_bytes, h, k, 1, 1)
    size = scbf.size
    assert size > (1 << 32)
    n = 64
    rng = np.random.default_rng(44)
    vals = np.concatenate([
        rng.integers(0, 1 << 32, size=(n // 2, h), dtype=np.uint64),
        rng.integers(1 << 32, size, size=(n // 2, h), dtype=np.uint64)])
    vals[n // 2: n // 2 + 8] = vals[:8]     # repeated frames
    hashes = u64.from_numpy(vals.reshape(n, 1, h))
    scbf = dist_counting.sharded_insert(mesh, scbf, hashes)

    model = {}
    for row in vals:
        pos = [int(x) % size for x in row]
        mn = min(model.get(p0, 0) for p0 in pos)
        for p0 in pos:
            if model.get(p0, 0) == mn:
                model[p0] = mn + 1
    plane = np.asarray(scbf.counters).reshape(-1)
    for p0, c in model.items():
        assert plane[p0] == c, (p0, plane[p0], c)

    mc = np.asarray(dist_counting.sharded_min_count(mesh, scbf, hashes))
    exp = [min(model[int(x) % size] for x in row) for row in vals]
    np.testing.assert_array_equal(mc.reshape(-1), exp)

    # incrementAll on top: every addressed counter +1 per occurrence
    scbf2 = dist_counting.sharded_insert_all(mesh, scbf, hashes)
    occ = {}
    for row in vals:
        for x in row:
            p0 = int(x) % size
            occ[p0] = occ.get(p0, 0) + 1
    plane2 = np.asarray(scbf2.counters).reshape(-1)
    for p0, c in occ.items():
        assert plane2[p0] == model[p0] + c, (p0, plane2[p0], model[p0], c)


def test_sharded_mibf_beyond_2_32_bits(mesh):
    """A sharded MIBF bit vector larger than 2**32 bits (the P * 2**32
    capacity lift, parallel/dist_mibf.py docstring; MIBloomFilter.hpp
    size_t sizing :84-88): build + reservoir-insert + rank/ID query all
    route via two-limb (owner, local) splits. Verified against the exact
    u64 position model: only inserted bits are set, so the global rank of
    a position equals the count of unique inserted positions strictly
    below it (VERDICT r4 next #6)."""
    from btl_bloomfilter_tpu.models import mibf_construct
    from btl_bloomfilter_tpu.parallel import dist_mibf

    size = (1 << 32) + 2048          # multiple of p * 32 = 256
    h = 3
    n = 160
    idv = 6
    rng = np.random.default_rng(55)
    vals = np.concatenate([
        rng.integers(0, 1 << 32, size=(n // 2, h), dtype=np.uint64),
        rng.integers(1 << 32, size, size=(n // 2, h), dtype=np.uint64)])
    vals[n // 2: n // 2 + 4] = vals[:4]          # repeated frames
    hashes = u64.from_numpy(vals.reshape(n, 1, h))

    bv_words = jnp.zeros((8, size // 8 // 32), jnp.uint32)
    bv_words = dist_mibf.insert_bv(mesh, bv_words, size, hashes)
    m = dist_mibf.freeze(mesh, bv_words, size, h, 11)
    assert m.size > (1 << 32)

    # exact u64 position model: rank(pos) = #unique inserted positions < pos
    pos_all = sorted({int(x) % size for x in vals.reshape(-1)})
    assert m.d_size == len(pos_all)
    pos_index = {p0: i for i, p0 in enumerate(pos_all)}

    m = dist_mibf.insert_mibf(mesh, m, hashes, idv)

    # host reservoir model in the framework's sorted-by-value order
    import collections
    counts_model = collections.Counter()
    data_model = {}
    for v in sorted({int(x) for x in vals.reshape(-1)}):
        rk = pos_index[v % size]
        counts_model[rk] += 1
        c = counts_model[rk]
        if ((v ^ idv) & 0xFFFF) % c == c - 1:    # width 2 default
            data_model[rk] = idv

    rank, hit, raw = dist_mibf.at_rank_data(mesh, m, hashes)
    assert np.asarray(hit).all()
    rk_np = np.asarray(rank).reshape(n, h)
    for i, row in enumerate(vals):
        for j, x in enumerate(row):
            assert rk_np[i, j] == pos_index[int(x) % size]
    raw_np = np.asarray(raw).reshape(n, h)
    for i, row in enumerate(vals):
        for j, x in enumerate(row):
            rk = pos_index[int(x) % size]
            assert raw_np[i, j] == data_model.get(rk, 0)

    # probes at uninserted positions miss
    probes = rng.integers(0, size, size=(32, h), dtype=np.uint64)
    inserted = {int(x) % size for x in vals.reshape(-1)}
    _, hit2, _ = dist_mibf.at_rank_data(
        mesh, m, u64.from_numpy(probes.reshape(32, 1, h)))
    hit2 = np.asarray(hit2).reshape(32, h)
    for i, row in enumerate(probes):
        for j, x in enumerate(row):
            assert hit2[i, j] == (int(x) % size in inserted)


def test_sharded_counting_u64_width8_matches_single(mesh):
    """Width-8 (uint64 T) sharded counter plane (VERDICT r4 missing #2):
    conservative insert, incrementAll, min-count and contains all match
    the single-device dual-plane u64 filter bit-for-bit."""
    from btl_bloomfilter_tpu.models import counting
    from btl_bloomfilter_tpu.parallel import dist_counting

    codes = rand_codes(16, 60, seed=71)
    k, h = 7, 3
    cbf, scbf = _counting_pair(mesh, 512, k, h, width=8)
    assert scbf.is_u64 and cbf.is_u64
    f = nthash.hash_frames(jnp.asarray(codes), k, h)

    # conservative update (incrementMin)
    cbf = counting.insert(cbf, f.hashes, f.valid)
    scbf = dist_counting.sharded_insert(mesh, scbf, f.hashes, f.valid)
    merged = np.asarray(scbf.counters)            # [p, 2, shard]
    merged64 = (merged[:, 0].astype(np.uint64)
                | (merged[:, 1].astype(np.uint64) << np.uint64(32)))
    np.testing.assert_array_equal(merged64.reshape(-1),
                                  counting.to_numpy(cbf))

    # incrementAll on top
    cbf = counting.insert_all(cbf, f.hashes, f.valid)
    scbf = dist_counting.sharded_insert_all(mesh, scbf, f.hashes, f.valid)
    merged = np.asarray(scbf.counters)
    merged64 = (merged[:, 0].astype(np.uint64)
                | (merged[:, 1].astype(np.uint64) << np.uint64(32)))
    np.testing.assert_array_equal(merged64.reshape(-1),
                                  counting.to_numpy(cbf))

    # min-count and membership
    mc1 = counting.min_count(cbf, f.hashes)
    mc2 = dist_counting.sharded_min_count(mesh, scbf, f.hashes)
    got64 = (np.asarray(mc2)[0].astype(np.uint64)
             | (np.asarray(mc2)[1].astype(np.uint64) << np.uint64(32)))
    exp64 = (np.asarray(mc1.lo).astype(np.uint64)
             | (np.asarray(mc1.hi).astype(np.uint64) << np.uint64(32)))
    np.testing.assert_array_equal(got64, exp64)

    c1 = np.asarray(counting.contains(cbf, f.hashes))
    c2 = np.asarray(dist_counting.sharded_contains(mesh, scbf, f.hashes))
    np.testing.assert_array_equal(c2, c1)
