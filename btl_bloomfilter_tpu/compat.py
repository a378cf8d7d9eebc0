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
        return int(np.asarray(counting_mod.min_count(
            self._cbf, _as_hash_array(hashes))))

    def __getitem__(self, i: int) -> int:
        return int(np.asarray(self._cbf.counters[i]))

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
