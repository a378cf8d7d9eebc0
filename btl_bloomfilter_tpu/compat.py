"""Drop-in object-oriented facade mirroring the reference's class APIs.

The functional pytree modules (models/*) are the native surface of this
framework; this facade exposes them under the reference's class and method
names so code written against the C++ headers (or the Perl/SWIG binding,
which renames KmerBloomFilter to BloomFilter::BloomFilter,
/root/reference/swig/BloomFilter.i:17) ports mechanically.

Method-for-method mapping (reference file:line in docstrings). Instances
hold the pytree state internally and mutate in place; heavy work stays
jitted inside the functional layer.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

from .io import bf_format
from .models import bloom as bloom_mod
from .models import counting as counting_mod
from .models import kmer_bloom
from .ops import nthash, nthash_tables, u64


def _as_hash_array(precomputed) -> u64.U64:
    arr = np.asarray(precomputed, dtype=np.uint64)
    return u64.from_numpy(arr)


class BloomFilter:
    """Mirror of BloomFilter (/root/reference/BloomFilter.hpp)."""

    def __init__(self, *args):
        if len(args) == 1 and isinstance(args[0], str):
            # BloomFilter(path) — BloomFilter.hpp:101-105
            self._bf = bf_format.load_bloom(args[0])
        elif len(args) == 3:
            # BloomFilter(filterSize, hashNum, kmerSize) — :65-76
            size, hash_num, kmer_size = args
            self._bf = bloom_mod.create(size, hash_num, kmer_size)
        elif len(args) == 4:
            # BloomFilter(expectedElemNum, fpr, hashNum, kmerSize) — :83-99
            expected, fpr, hash_num, kmer_size = args
            self._bf = bloom_mod.create_from_fpr(expected, fpr, hash_num,
                                                 kmer_size)
        else:
            raise TypeError("bad constructor arguments")

    # insert/contains on precomputed hash arrays (BloomFilter.hpp:171-262)
    def insert(self, precomputed: Sequence[int]) -> None:
        self._bf = bloom_mod.insert(self._bf, _as_hash_array(precomputed))

    def insertAndCheck(self, precomputed: Sequence[int]) -> bool:
        self._bf, found = bloom_mod.insert_and_check(
            self._bf, _as_hash_array(precomputed))
        return bool(np.asarray(found))

    def contains(self, arg) -> bool:
        if isinstance(arg, str):
            return bool(np.asarray(kmer_bloom.contains_string(self._bf, arg)))
        return bool(np.asarray(bloom_mod.contains(self._bf,
                                                  _as_hash_array(arg))))

    # serialization (BloomFilter.hpp:107-116, 304-314)
    def storeFilter(self, path: str) -> None:
        bf_format.store_bloom(self._bf, path)

    def loadFilter(self, path: str) -> None:
        self._bf = bf_format.load_bloom(path)

    # stats/accessors (BloomFilter.hpp:316-379)
    def getPop(self) -> int:
        return int(bloom_mod.get_pop(self._bf))

    def getFPR(self) -> float:
        return float(bloom_mod.get_fpr(self._bf))

    def getFPR_numEle(self) -> float:
        return bloom_mod.get_fpr_num_ele(self._bf)

    def getRedudancyFPR(self) -> float:  # (sic — reference spelling)
        return bloom_mod.get_redundancy_fpr(self._bf)

    def getHashNum(self) -> int:
        return self._bf.hash_num

    def getKmerSize(self) -> int:
        return self._bf.kmer_size

    def getFilterSize(self) -> int:
        return self._bf.size

    def sizeInBytes(self) -> int:
        return self._bf.size_in_bytes

    def getnEntry(self) -> int:
        return self._bf.n_entry

    def gettEntry(self) -> int:
        return self._bf.t_entry

    def setnEntry(self, v: int) -> None:
        import dataclasses
        self._bf = dataclasses.replace(self._bf, n_entry=int(v))

    def settEntry(self, v: int) -> None:
        import dataclasses
        self._bf = dataclasses.replace(self._bf, t_entry=int(v))


class KmerBloomFilter(BloomFilter):
    """Mirror of KmerBloomFilter (/root/reference/KmerBloomFilter.hpp):
    hashes raw k-mer strings internally (NTC64 + NTE64 chain)."""

    def insert(self, arg) -> None:
        if isinstance(arg, str):
            if len(arg) == self._bf.kmer_size:
                self._bf = kmer_bloom.insert_kmers(
                    self._bf, nthash_tables.encode_seq(arg))
            else:
                self._bf = kmer_bloom.insert_string(self._bf, arg)
        else:
            super().insert(arg)


def insertSeq(bloom: BloomFilter, seq: str, hashNum: int = 0,
              kmerSize: int = 0) -> None:
    """Mirror of insertSeq (/root/reference/BloomFilterUtil.h:9-17)."""
    bloom._bf = kmer_bloom.insert_string(bloom._bf, seq)


def calcApproxFPR(size: int, num_entr: int, hash_num: int) -> float:
    """/root/reference/BloomFilterUtil.h:28-33."""
    import math
    return math.pow(
        1.0 - math.pow(1.0 - 1.0 / float(size), float(num_entr) * hash_num),
        float(hash_num))


def calcRedunancyFPR(size: int, num_entr: int, hash_num: int) -> float:
    """/root/reference/BloomFilterUtil.h:38-46."""
    import math
    total = math.log(calcApproxFPR(size, 1, hash_num))
    for i in range(2, num_entr):
        total = math.log(math.exp(total) + calcApproxFPR(size, i, hash_num))
    return math.exp(total) / num_entr


class CountingBloomFilter:
    """Mirror of CountingBloomFilter<T>
    (/root/reference/CountingBloomFilter.hpp); T selected by
    counter_width (bytes)."""

    def __init__(self, *args, counter_width: int = 1):
        if len(args) == 2 and isinstance(args[0], str):
            path, threshold = args
            self._cbf = bf_format.load_counting(path, threshold)
        elif len(args) == 4:
            size_in_bytes, hash_num, kmer_size, threshold = args
            self._cbf = counting_mod.create(size_in_bytes, hash_num,
                                            kmer_size, threshold,
                                            counter_width)
        else:
            raise TypeError("bad constructor arguments")

    def insert(self, hashes) -> None:
        self._cbf = counting_mod.insert(self._cbf, _as_hash_array(hashes))

    def insertAndCheck(self, hashes) -> bool:
        self._cbf, found = counting_mod.insert_and_check(
            self._cbf, _as_hash_array(hashes))
        return bool(np.asarray(found))

    def incrementAll(self, hashes) -> None:
        self._cbf = counting_mod.insert_all(self._cbf,
                                            _as_hash_array(hashes))

    def contains(self, hashes) -> bool:
        return bool(np.asarray(counting_mod.contains(
            self._cbf, _as_hash_array(hashes))))

    def minCount(self, hashes) -> int:
        mc = counting_mod.min_count(self._cbf, _as_hash_array(hashes))
        if self._cbf.is_u64:
            return (int(np.asarray(mc.hi)) << 32) | int(np.asarray(mc.lo))
        return int(np.asarray(mc))

    def __getitem__(self, i: int) -> int:
        if self._cbf.is_u64:
            return (int(np.asarray(self._cbf.counters[1, i])) << 32) | \
                int(np.asarray(self._cbf.counters[0, i]))
        per = self._cbf.counters_per_word
        bits = 32 // per
        w = int(np.asarray(self._cbf.counters[i // per]))
        return (w >> (bits * (i % per))) & ((1 << bits) - 1)

    def popCount(self) -> int:
        return int(counting_mod.pop_count(self._cbf))

    def filtered_popcount(self) -> int:
        return int(counting_mod.filtered_pop_count(self._cbf))

    def FPR(self) -> float:
        return float(counting_mod.fpr(self._cbf))

    def filtered_FPR(self) -> float:
        return float(counting_mod.filtered_fpr(self._cbf))

    def getKmerSize(self) -> int:
        return self._cbf.kmer_size

    def getHashNum(self) -> int:
        return self._cbf.hash_num

    def threshold(self) -> int:
        return self._cbf.count_threshold

    def size(self) -> int:
        return self._cbf.size

    def sizeInBytes(self) -> int:
        return self._cbf.size_in_bytes

    def storeFilter(self, path: str) -> None:
        bf_format.store_counting(self._cbf, path)

    def loadFilter(self, path: str) -> None:
        self._cbf = bf_format.load_counting(path,
                                            self._cbf.count_threshold)


# ---------------------------------------------------------------------------
# MIBF stack (MIBloomFilter.hpp / MIBFConstructSupport.hpp /
# MIBFQuerySupport.hpp)
# ---------------------------------------------------------------------------

class MIBloomFilter:
    """Mirror of MIBloomFilter<T> (/root/reference/MIBloomFilter.hpp).

    Constructors:
      MIBloomFilter(path)                       — load (.mibf + .sdsl),
                                                  MIBloomFilter.hpp:149-261
      MIBloomFilter(hashNum, kmerSize, bv, seeds=()) — freeze a populated
        bit vector (uint32 word array or BitVectorState),
        MIBloomFilter.hpp:122-147
    """

    def __init__(self, *args, data_width: int = 2, size: int | None = None,
                 sseeds: Sequence[str] = ()):
        from .io import mibf_format
        from .models import mibf as mibf_mod
        from .models import mibf_construct as construct
        self._m = None
        if len(args) == 1 and isinstance(args[0], str):
            self._m = mibf_format.load_mibf(args[0], data_width=data_width)
        elif len(args) == 3:
            hash_num, kmer_size, bv = args
            if isinstance(bv, construct.BitVectorState):
                self._m = mibf_mod.freeze(bv.bv_words, bv.filter_size,
                                          hash_num, kmer_size,
                                          data_width=data_width,
                                          sseeds=bv.sseeds or sseeds)
            else:
                import jax.numpy as jnp
                bvw = jnp.asarray(bv)
                self._m = mibf_mod.freeze(bvw, size or bvw.shape[0] * 32,
                                          hash_num, kmer_size,
                                          data_width=data_width,
                                          sseeds=sseeds)
        else:
            raise TypeError("bad constructor arguments")

    # --- inserts (MIBloomFilter.hpp:312-438) -----------------------------
    def insert(self, hashes, *args):
        """insert(hashes, val, max) or insert(hashes, strand, val, max);
        returns per-frame success (scalar bool for one frame)."""
        from .models import mibf_construct as construct
        arr = np.asarray(hashes, dtype=np.uint64)
        one = arr.ndim == 1
        if one:
            arr = arr[None]
        if len(args) == 2:
            val, mx = args
            strand = None
        else:
            strand, val, mx = args
            strand = np.asarray(strand, bool).reshape(arr.shape)
        self._m, ok = construct.insert_random_order_device(
            self._m, u64.from_numpy(arr), int(val), int(mx), strand=strand)
        ok = np.asarray(ok)
        return bool(ok[0]) if one else ok

    def saturate(self, hashes) -> None:
        """MIBloomFilter.hpp:440-446."""
        from .models import mibf as mibf_mod
        arr = np.asarray(hashes, dtype=np.uint64)
        self._m = mibf_mod.saturate(self._m, u64.from_numpy(
            arr if arr.ndim > 1 else arr[None]))

    # --- queries ----------------------------------------------------------
    def at(self, hashes, maxMiss: int = 0):
        """MIBloomFilter.hpp:448-472: returns (values, ok, saturated)."""
        from .models import mibf as mibf_mod
        arr = np.asarray(hashes, dtype=np.uint64)[None]
        vals, ok, sat = mibf_mod.at(self._m, u64.from_numpy(arr), maxMiss)
        return (np.asarray(vals)[0], bool(np.asarray(ok)[0]),
                bool(np.asarray(sat)[0]))

    def atRank(self, hashes):
        """MIBloomFilter.hpp:478-515: (hit, ranks)."""
        from .models import mibf as mibf_mod
        arr = np.asarray(hashes, dtype=np.uint64)[None]
        rank, hit = mibf_mod.at_rank(self._m, u64.from_numpy(arr))
        return bool(np.asarray(hit).all()), np.asarray(rank)[0]

    def getRankPos(self, hash_value: int) -> int:
        """MIBloomFilter.hpp:517-527."""
        from .models import mibf as mibf_mod
        pos = int(hash_value) % self._m.size
        import jax.numpy as jnp
        rank, _ = mibf_mod.rank_of_positions(
            self._m, jnp.asarray([pos], jnp.uint32))
        return int(np.asarray(rank)[0])

    def getData(self, rank) -> int:
        return int(np.asarray(self._m.data)[int(rank)])

    def setData(self, rank: int, value: int) -> None:
        """MIBloomFilter.hpp:625-634 (saturation bit preserved)."""
        from .models import mibf as mibf_mod
        import jax.numpy as jnp
        self._m = mibf_mod.set_data(
            self._m, jnp.asarray([rank], jnp.int32),
            jnp.asarray([value], self._m.data.dtype))

    # --- stats / introspection --------------------------------------------
    def getPop(self) -> int:
        return self._m.d_size

    def getPopNonZero(self) -> int:
        from .models import mibf as mibf_mod
        return int(mibf_mod.get_pop_non_zero(self._m))

    def getPopSaturated(self) -> int:
        from .models import mibf as mibf_mod
        return int(mibf_mod.get_pop_saturated(self._m))

    def getIDCounts(self, num_ids: int):
        from .models import mibf as mibf_mod
        counts, sat = mibf_mod.get_id_counts(self._m, num_ids)
        return np.asarray(counts), int(sat)

    def calcFrameProbs(self, num_ids: int, allowed_miss: int):
        from .models import mibf as mibf_mod
        return mibf_mod.calc_frame_probs(self._m, num_ids, allowed_miss)

    def calcFrameProbsStrand(self, num_ids: int, allowed_miss: int):
        from .models import mibf as mibf_mod
        return mibf_mod.calc_frame_probs_strand(self._m, num_ids,
                                                allowed_miss)

    def getKmerSize(self) -> int:
        return self._m.kmer_size

    def getHashNum(self) -> int:
        return self._m.hash_num

    def getSeedValues(self):
        return self._m.sseeds

    def size(self) -> int:
        return self._m.size

    def store(self, path: str) -> None:
        """MIBloomFilter.hpp:268-305 (writes .mibf main file + .sdsl)."""
        from .io import mibf_format
        mibf_format.store_mibf(self._m, path)


class MIBFConstructSupport:
    """Mirror of MIBFConstructSupport<T, H>
    (/root/reference/MIBFConstructSupport.hpp:36-214). The hash-iterator
    template parameter is replaced by precomputed hash arrays (uint64
    [frames, h]) — produce them with ops.nthash / ops.seeds."""

    def __init__(self, expected_entries: int, kmer_size: int, hash_num: int,
                 occupancy: float = 0.5, spaced_seeds: Sequence[str] = ()):
        from .models import mibf_construct as construct
        self._state = construct.create(expected_entries, kmer_size,
                                       hash_num, occupancy, spaced_seeds)
        self._counts = None

    def insertBV(self, hashes, valid=None) -> None:
        """Phase 1 (MIBFConstructSupport.hpp:75-87)."""
        from .models import mibf_construct as construct
        arr = np.asarray(hashes, dtype=np.uint64)
        self._state = construct.insert_bv(self._state, u64.from_numpy(arr),
                                          valid)

    def insertBVColli(self, hashes, valid=None) -> int:
        """Phase-1 variant counting fully-collided frames
        (MIBFConstructSupport.hpp:55-73)."""
        from .models import mibf_construct as construct
        arr = np.asarray(hashes, dtype=np.uint64)
        self._state, colli = construct.insert_bv_colli(
            self._state, u64.from_numpy(arr), valid)
        return int(colli)

    def getEmptyMIBF(self, data_width: int = 2) -> MIBloomFilter:
        """Phase 2 (MIBFConstructSupport.hpp:92-99)."""
        from .models import mibf_construct as construct
        wrapper = MIBloomFilter.__new__(MIBloomFilter)
        wrapper._m, self._counts = construct.get_empty_mibf(
            self._state, data_width=data_width)
        return wrapper

    def insertMIBF(self, mibf: MIBloomFilter, hashes, id_value: int,
                   valid=None) -> None:
        """Phase 3 reservoir insertion (MIBFConstructSupport.hpp:109-130)."""
        from .models import mibf_construct as construct
        arr = np.asarray(hashes, dtype=np.uint64)
        mibf._m, self._counts = construct.insert_mibf(
            mibf._m, self._counts, u64.from_numpy(arr), id_value, valid)

    def insertSaturation(self, mibf: MIBloomFilter, hashes, id_value: int,
                         valid=None) -> None:
        """Phase 4 (MIBFConstructSupport.hpp:132-141 / 168-214)."""
        from .models import mibf_construct as construct
        arr = np.asarray(hashes, dtype=np.uint64)
        mibf._m, self._counts = construct.insert_saturation(
            mibf._m, self._counts, u64.from_numpy(arr), id_value, valid)


class MIBFQuerySupport:
    """Mirror of MIBFQuerySupport<T>
    (/root/reference/MIBFQuerySupport.hpp:33-130). Reads are passed as
    precomputed hash arrays (uint64 [frames, h]) instead of iterators."""

    def __init__(self, miBF: MIBloomFilter, perFrameProb: Sequence[float],
                 extraCount: int, extraFrameLimit: int, maxMiss: int,
                 minCount: int, bestHitAgree: bool):
        from .models import mibf_query
        self._qs = mibf_query.MIBFQuerySupport(
            m=miBF._m, per_frame_prob=list(perFrameProb),
            extra_count=float(extraCount),
            extra_frame_limit=int(extraFrameLimit), max_miss=int(maxMiss),
            min_count=int(minCount), best_hit_agree=bool(bestHitAgree))

    def query(self, hashes, minCount, valid=None):
        """MIBFQuerySupport.hpp:94-109; returns ranked QueryResult list."""
        arr = np.asarray(hashes, dtype=np.uint64)
        v = np.ones(arr.shape[0], bool) if valid is None else valid
        return self._qs.query(u64.from_numpy(arr), v,
                              np.asarray(minCount, np.int32))

    def queryPaired(self, hashes1, hashes2, minCount, valid1=None,
                    valid2=None):
        """MIBFQuerySupport.hpp:111-130."""
        a1 = np.asarray(hashes1, dtype=np.uint64)
        a2 = np.asarray(hashes2, dtype=np.uint64)
        v1 = np.ones(a1.shape[0], bool) if valid1 is None else valid1
        v2 = np.ones(a2.shape[0], bool) if valid2 is None else valid2
        return self._qs.query_paired(u64.from_numpy(a1), v1,
                                     u64.from_numpy(a2), v2,
                                     np.asarray(minCount, np.int32))

    def getMatchSignature(self, hashes, valid=None):
        """MIBFQuerySupport.hpp:158-217."""
        arr = np.asarray(hashes, dtype=np.uint64)
        v = np.ones(arr.shape[0], bool) if valid is None else valid
        return self._qs.get_match_signature(u64.from_numpy(arr), v)

    def calcSat(self, evaluatedValues: int, singleEventProbSaturted: float,
                saturatedCount: int) -> float:
        """MIBFQuerySupport.hpp:544-553 (binomial CDF of the saturation
        count; the boost::math dependency lives in utils/binomial.py)."""
        from .utils import binomial
        return binomial.calc_sat(int(evaluatedValues),
                                 float(singleEventProbSaturted),
                                 int(saturatedCount))

    def getSatCount(self) -> int:
        return self._qs.sat_count

    def getEvaluatedValues(self) -> int:
        return self._qs.eval_count
