"""Jitted pipeline layer: bucketing + equivalence with the eager path."""

import numpy as np
import jax.numpy as jnp

from btl_bloomfilter_tpu import api
from btl_bloomfilter_tpu.models import bloom, kmer_bloom, mibf_construct
from btl_bloomfilter_tpu.ops import nthash, nthash_tables

from util import golden_long_seq


def test_bucketing():
    assert api.bucket_length(5) == 64
    assert api.bucket_length(64) == 64
    assert api.bucket_length(65) == 128
    assert api.bucket_length(1000) == 1024


def test_hash_pipeline_padding_equivalence():
    seq = golden_long_seq(150)
    codes = nthash_tables.encode_seq(seq)
    hp = api.HashPipeline(k=11, h=3)
    fr = hp.frames(codes)
    direct = nthash.hash_frames(codes, 11, 3)
    W = len(codes) - 11 + 1
    valid = np.asarray(fr.valid)
    # padded windows beyond the true length must be invalid
    assert not valid[W:].any()
    np.testing.assert_array_equal(valid[:W], np.asarray(direct.valid))
    np.testing.assert_array_equal(fr.hashes.astype_numpy()[:W][valid[:W]],
                                  direct.hashes.astype_numpy()[np.asarray(direct.valid)])


def test_bloom_pipeline_matches_eager():
    rng = np.random.default_rng(0)
    batch = rng.integers(0, 4, size=(8, 100), dtype=np.uint8)
    bf = bloom.create(4096, 3, 9)
    pipe = api.BloomPipeline(bloom.create(4096, 3, 9))
    pipe.insert_batch(batch)
    bf = kmer_bloom.insert_seq(bf, batch)
    np.testing.assert_array_equal(np.asarray(pipe.bf.words),
                                  np.asarray(bf.words))
    hits, valid = pipe.query_batch(batch)
    direct_hits, _ = kmer_bloom.contains_seq(bf, batch)
    np.testing.assert_array_equal(np.asarray(hits), np.asarray(direct_hits))


def test_mibf_pipeline_matches_eager():
    from btl_bloomfilter_tpu.ops import u64

    seqs = [golden_long_seq(120), golden_long_seq(120)[10:100],
            "ACGTNNACGTACGTTGCANCGTACGTANGGGACG"]
    k, h = 9, 3

    st = mibf_construct.create(400, k, h, 0.5)
    pipe = api.MIBFConstructPipeline(
        mibf_construct.create(400, k, h, 0.5))
    for s in seqs:
        codes = nthash_tables.encode_seq(s)
        f = nthash.hash_frames(codes, k, h)
        st = mibf_construct.insert_bv(st, f.hashes, f.valid)
        pipe.insert_bv_seq(codes)
    np.testing.assert_array_equal(np.asarray(st.bv_words),
                                  np.asarray(pipe.state.bv_words))

    m, counts = mibf_construct.get_empty_mibf(st)
    pipe.freeze()
    for idv, s in enumerate(seqs, start=1):
        codes = nthash_tables.encode_seq(s)
        f = nthash.hash_frames(codes, k, h)
        m, counts = mibf_construct.insert_mibf(m, counts, f.hashes, idv,
                                               f.valid)
        pipe.insert_mibf_seq(codes, idv)
    np.testing.assert_array_equal(np.asarray(m.data), np.asarray(pipe.m.data))
    np.testing.assert_array_equal(np.asarray(counts),
                                  np.asarray(pipe.counts))

    for idv, s in enumerate(seqs, start=1):
        codes = nthash_tables.encode_seq(s)
        f = nthash.hash_frames(codes, k, h)
        m, counts = mibf_construct.insert_saturation(m, counts, f.hashes,
                                                     idv, f.valid)
        pipe.insert_saturation_seq(codes, idv)
    np.testing.assert_array_equal(np.asarray(m.data), np.asarray(pipe.m.data))
    np.testing.assert_array_equal(np.asarray(counts),
                                  np.asarray(pipe.counts))
