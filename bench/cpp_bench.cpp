// Single-core reference baseline: ntHashIterator + BloomFilter::insert /
// contains and CountingBloomFilter<uint8_t>::insert / contains
// (conservative update, CountingBloomFilter.hpp:135-162, 190-196) over
// random reads, timed. Compiled against the read-only C++ reference
// (-I/root/reference). Prints JSON with k-mers/s for all four metrics.
#include "BloomFilter.hpp"
#include "CountingBloomFilter.hpp"
#include "vendor/ntHashIterator.hpp"
#include <chrono>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

int main(int argc, char** argv) {
    unsigned k = argc > 1 ? atoi(argv[1]) : 31;
    unsigned h = argc > 2 ? atoi(argv[2]) : 4;
    size_t size = argc > 3 ? atoll(argv[3]) : (1ull << 30);
    unsigned nreads = argc > 4 ? atoi(argv[4]) : 512;
    unsigned readlen = argc > 5 ? atoi(argv[5]) : 2048;

    std::mt19937_64 rng(42);
    const char* B = "ACGT";
    std::vector<std::string> reads(nreads);
    for (auto& s : reads) {
        s.resize(readlen);
        for (unsigned i = 0; i < readlen; ++i) s[i] = B[rng() & 3];
    }

    BloomFilter bloom(size, h, k);
    size_t kmers = 0;
    // warm pass
    for (auto& s : reads) {
        ntHashIterator itr(s, h, k);
        while (itr != itr.end()) { bloom.insert(*itr); ++itr; }
    }
    auto t0 = std::chrono::steady_clock::now();
    int reps = 5;
    for (int r = 0; r < reps; ++r)
        for (auto& s : reads) {
            ntHashIterator itr(s, h, k);
            while (itr != itr.end()) { bloom.insert(*itr); ++kmers; ++itr; }
        }
    auto t1 = std::chrono::steady_clock::now();
    double insert_s = std::chrono::duration<double>(t1 - t0).count();

    size_t hits = 0, qk = 0;
    t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r)
        for (auto& s : reads) {
            ntHashIterator itr(s, h, k);
            while (itr != itr.end()) { hits += bloom.contains(*itr); ++qk; ++itr; }
        }
    t1 = std::chrono::steady_clock::now();
    double query_s = std::chrono::duration<double>(t1 - t0).count();

    // counting filter at the same geometry: `size` COUNTERS of uint8
    // (the TPU bench's 2^30-counter uint8 config)
    CountingBloomFilter<uint8_t> cbf(size, h, k, 1);
    for (auto& s : reads) {  // warm pass
        ntHashIterator itr(s, h, k);
        while (itr != itr.end()) { cbf.insert(*itr); ++itr; }
    }
    size_t ck = 0;
    t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r)
        for (auto& s : reads) {
            ntHashIterator itr(s, h, k);
            while (itr != itr.end()) { cbf.insert(*itr); ++ck; ++itr; }
        }
    t1 = std::chrono::steady_clock::now();
    double cins_s = std::chrono::duration<double>(t1 - t0).count();

    size_t chits = 0, cqk = 0;
    t0 = std::chrono::steady_clock::now();
    for (int r = 0; r < reps; ++r)
        for (auto& s : reads) {
            ntHashIterator itr(s, h, k);
            while (itr != itr.end()) { chits += cbf.contains(*itr); ++cqk; ++itr; }
        }
    t1 = std::chrono::steady_clock::now();
    double cq_s = std::chrono::duration<double>(t1 - t0).count();

    printf("{\"insert_kmers_per_s\": %.1f, \"query_kmers_per_s\": %.1f, "
           "\"counting_insert_kmers_per_s\": %.1f, "
           "\"counting_query_kmers_per_s\": %.1f, "
           "\"kmers\": %zu, \"hits\": %zu, \"counting_hits\": %zu}\n",
           kmers / insert_s, qk / query_s, ck / cins_s, cqk / cq_s,
           kmers, hits, chits);
    return 0;
}
