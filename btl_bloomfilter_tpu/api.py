"""Jitted, shape-bucketed pipelines.

Eager-mode use of the functional layer dispatches hundreds of small ops per
call — pathological on remote-TPU platforms where each op is a round trip.
This module compiles whole flows (hash -> filter op) once per *shape
bucket* (sequence lengths padded up to powers of two, padding code N so
padded windows are invalid) and reuses them across calls.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models import bloom, counting, mibf, mibf_construct
from .ops import nthash, nthash_tables, seeds
from .ops.u64 import U64


def bucket_length(n: int, minimum: int = 64) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def pad_codes(codes: np.ndarray, bucket: int) -> np.ndarray:
    out = np.full(bucket, nthash_tables.CODE_N, dtype=np.uint8)
    out[: len(codes)] = codes
    return out


class HashPipeline:
    """Caches jitted hash functions per (k, h, seeds, length-bucket)."""

    def __init__(self, k: int, h: int, seed_strings: Tuple[str, ...] = ()):
        self.k = k
        self.h = h
        self.seed_strings = tuple(seed_strings)
        self._cache: Dict[int, object] = {}

    def _fn(self, bucket: int):
        fn = self._cache.get(bucket)
        if fn is None:
            if self.seed_strings:
                # h is the TOTAL hash count = n_seeds * hashes-per-seed
                # (stHashIterator layout, stHashIterator.hpp:157-160)
                m2 = max(1, self.h // len(self.seed_strings))
                fn = jax.jit(functools.partial(
                    seeds.spaced_hash_frames,
                    seed_strings=self.seed_strings, m2=m2))
            else:
                fn = jax.jit(functools.partial(
                    nthash.hash_frames, k=self.k, h=self.h))
            self._cache[bucket] = fn
        return fn

    def frames(self, codes: np.ndarray):
        """Hash one sequence (1-D codes); returns a frames object whose
        trailing padded windows are invalid."""
        if len(codes) < self.k:
            return None
        bucket = bucket_length(len(codes), max(64, self.k))
        return self._fn(bucket)(pad_codes(np.asarray(codes), bucket))

    def frames_batch(self, codes_list):
        """Hash a batch of sequences in one dispatch: pads every read to
        the length bucket of the longest and stacks to [R, bucket]. Padded
        tails (and reads shorter than k) hash as non-ACGT, so their
        windows come back invalid."""
        bucket = bucket_length(max(len(c) for c in codes_list),
                               max(64, self.k))
        stacked = np.stack([pad_codes(np.asarray(c), bucket)
                            for c in codes_list])
        return self._fn(bucket)(stacked)


class BloomPipeline:
    """Fused hash+insert / hash+query with one compile per length bucket."""

    def __init__(self, bf: bloom.BloomFilter):
        self.bf = bf
        self._insert: Dict[int, object] = {}
        self._query: Dict[int, object] = {}

    def _insert_fn(self, bucket: int, batch: int):
        key = (bucket, batch)
        fn = self._insert.get(key)
        if fn is None:
            k, h, size = self.bf.kmer_size, self.bf.hash_num, self.bf.size

            @functools.partial(jax.jit, donate_argnums=0)
            def step(words, codes):
                f = nthash.hash_frames(codes, k, h)
                st = bloom.BloomFilter(words=words, size=size, hash_num=h,
                                       kmer_size=k)
                return bloom.insert(st, f.hashes, f.valid).words

            fn = self._insert[key] = step
        return fn

    def _query_fn(self, bucket: int, batch: int):
        key = (bucket, batch)
        fn = self._query.get(key)
        if fn is None:
            k, h, size = self.bf.kmer_size, self.bf.hash_num, self.bf.size

            @jax.jit
            def q(words, codes):
                f = nthash.hash_frames(codes, k, h)
                st = bloom.BloomFilter(words=words, size=size, hash_num=h,
                                       kmer_size=k)
                return bloom.contains(st, f.hashes) & f.valid, f.valid

            fn = self._query[key] = q
        return fn

    def insert_batch(self, codes: np.ndarray) -> None:
        codes = np.asarray(codes)
        self.bf = bloom.BloomFilter(
            words=self._insert_fn(codes.shape[1], codes.shape[0])(
                self.bf.words, jnp.asarray(codes)),
            size=self.bf.size, hash_num=self.bf.hash_num,
            kmer_size=self.bf.kmer_size, dfpr=self.bf.dfpr,
            n_entry=self.bf.n_entry, t_entry=self.bf.t_entry)

    def query_batch(self, codes: np.ndarray):
        codes = np.asarray(codes)
        return self._query_fn(codes.shape[1], codes.shape[0])(
            self.bf.words, jnp.asarray(codes))


class MIBFConstructPipeline:
    """Jitted 4-phase MIBF construction keyed by length bucket."""

    def __init__(self, state: mibf_construct.BitVectorState):
        self.state = state
        self.hash = HashPipeline(state.kmer_size, state.hash_num,
                                 state.sseeds)
        self._bv: Dict[int, object] = {}
        self._ins: Dict[Tuple[int, int], object] = {}
        self._sat: Dict[Tuple[int, int], object] = {}

    def insert_bv_seq(self, codes: np.ndarray) -> None:
        fr = self.hash.frames(codes)
        if fr is None:
            return
        bucket = fr.valid.shape[-1]
        fn = self._bv.get(bucket)
        if fn is None:
            fsize = self.state.filter_size
            kk, hh = self.state.kmer_size, self.state.hash_num
            occ, ss = self.state.occupancy, self.state.sseeds

            @functools.partial(jax.jit, donate_argnums=0)
            def step(words, hi, lo, valid):
                st = mibf_construct.BitVectorState(
                    bv_words=words, filter_size=fsize, kmer_size=kk,
                    hash_num=hh, occupancy=occ, sseeds=ss)
                return mibf_construct.insert_bv(
                    st, U64(hi, lo), valid).bv_words

            fn = self._bv[bucket] = step
        import dataclasses
        self.state = dataclasses.replace(
            self.state, bv_words=fn(self.state.bv_words, fr.hashes.hi,
                                    fr.hashes.lo, fr.valid))

    def freeze(self, data_width: int = 2):
        self.m, self.counts = mibf_construct.get_empty_mibf(
            self.state, data_width)
        return self.m

    def insert_mibf_seq(self, codes: np.ndarray, id_value: int) -> None:
        fr = self.hash.frames(codes)
        if fr is None:
            return
        bucket = fr.valid.shape[-1]
        key = (bucket, 0)
        fn = self._ins.get(key)
        if fn is None:
            m0 = self.m

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step(data, counts, hi, lo, valid, idv):
                mm = _with_data(m0, data)
                mm, cc = mibf_construct.insert_mibf(
                    mm, counts, U64(hi, lo), idv, valid)
                return mm.data, cc

            fn = self._ins[key] = step
        data, self.counts = fn(self.m.data, self.counts, fr.hashes.hi,
                               fr.hashes.lo, fr.valid,
                               jnp.uint32(int(id_value)))
        self.m = _with_data(self.m, data)

    def insert_mibf_batch(self, codes_list, ids) -> None:
        """Phase 3 for MANY sequences in one dispatch
        (mibf_construct.insert_mibf_many): bit-identical to calling
        insert_mibf_seq per sequence in id order, at a fraction of the
        per-call fixed cost. Reads shorter than k contribute nothing
        (their windows hash invalid)."""
        fr = self.hash.frames_batch(codes_list)
        key = ("many", fr.valid.shape)
        fn = self._ins.get(key)
        if fn is None:
            m0 = self.m

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step(data, counts, hi, lo, valid, idvec):
                mm = _with_data(m0, data)
                mm, cc = mibf_construct.insert_mibf_many(
                    mm, counts, U64(hi, lo), idvec, valid)
                return mm.data, cc

            fn = self._ins[key] = step
        data, self.counts = fn(self.m.data, self.counts, fr.hashes.hi,
                               fr.hashes.lo, fr.valid,
                               jnp.asarray(list(ids), jnp.int32))
        self.m = _with_data(self.m, data)

    def insert_saturation_batch(self, codes_list, ids) -> None:
        """Phase 4 for MANY sequences in one dispatch
        (mibf_construct.insert_saturation_many): bit-identical to calling
        insert_saturation_seq per sequence in id order."""
        fr = self.hash.frames_batch(codes_list)
        key = ("many", fr.valid.shape)
        fn = self._sat.get(key)
        if fn is None:
            m0 = self.m

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step(data, counts, hi, lo, valid, idvec):
                mm = _with_data(m0, data)
                mm, cc = mibf_construct.insert_saturation_many(
                    mm, counts, U64(hi, lo), idvec, valid)
                return mm.data, cc

            fn = self._sat[key] = step
        data, self.counts = fn(self.m.data, self.counts, fr.hashes.hi,
                               fr.hashes.lo, fr.valid,
                               jnp.asarray(list(ids), jnp.int32))
        self.m = _with_data(self.m, data)

    def insert_saturation_seq(self, codes: np.ndarray, id_value: int) -> None:
        fr = self.hash.frames(codes)
        if fr is None:
            return
        bucket = fr.valid.shape[-1]
        key = (bucket, 0)
        fn = self._sat.get(key)
        if fn is None:
            m0 = self.m

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def step(data, counts, hi, lo, valid, idv):
                mm = _with_data(m0, data)
                mm, cc = mibf_construct.insert_saturation(
                    mm, counts, U64(hi, lo), idv, valid)
                return mm.data, cc

            fn = self._sat[key] = step
        data, self.counts = fn(self.m.data, self.counts, fr.hashes.hi,
                               fr.hashes.lo, fr.valid,
                               jnp.uint32(int(id_value)))
        self.m = _with_data(self.m, data)


def _with_data(m: mibf.MIBloomFilter, data):
    import dataclasses
    return dataclasses.replace(m, data=data)
