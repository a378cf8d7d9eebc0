// Golden-vector generator for the TPU-native btl_bloomfilter framework.
//
// Compiles against the READ-ONLY C++ reference at /root/reference (passed via
// -I) and emits machine-readable golden files that the JAX implementation is
// tested against for bit-exactness.  This program is test infrastructure: it
// intentionally *uses* the reference as an oracle, it is not part of the
// framework itself.
//
// Outputs (into the directory given as argv[1]):
//   nthash_golden.jsonl    per-config, per-position hash values (ntHashIterator)
//   sthash_golden.jsonl    spaced-seed multi-hash values (stHashIterator)
//   sshash_golden.jsonl    single spaced-seed values (ssHashIterator)
//   kmer_golden.jsonl      KmerBloomFilter NTC64/NTE64 per-kmer hash chains
//   shuffle_golden.jsonl   std::minstd_rand + std::shuffle permutations
//   bf_readme.bf           BloomFilter file bytes for the README config
//   cbf_small.bf           CountingBloomFilter<uint8_t> file bytes
//   cbf_round.bf           CountingBloomFilter<uint8_t> with size rounding
//   cbf64_small.bf         CountingBloomFilter<uint64_t> file bytes

#include "BloomFilter.hpp"
#include "CountingBloomFilter.hpp"
#include "KmerBloomFilter.hpp"
#include "vendor/ntHashIterator.hpp"
#include "vendor/ssHashIterator.hpp"
#include "vendor/stHashIterator.hpp"

#include <cinttypes>
#include <cstdio>
#include <random>
#include <string>
#include <vector>

using std::string;
using std::vector;

static FILE* openOut(const string& dir, const char* name) {
    string p = dir + "/" + name;
    FILE* f = fopen(p.c_str(), "w");
    if (!f) { perror(p.c_str()); exit(1); }
    return f;
}

static void emitNtHash(FILE* f, const string& seq, unsigned k, unsigned h) {
    fprintf(f, "{\"seq\":\"%s\",\"k\":%u,\"h\":%u,\"frames\":[", seq.c_str(), k, h);
    bool first = true;
    ntHashIterator itr(seq, h, k);
    while (itr != itr.end()) {
        if (!first) fprintf(f, ",");
        first = false;
        fprintf(f, "{\"pos\":%zu,\"hashes\":[", itr.pos());
        for (unsigned i = 0; i < h; ++i)
            fprintf(f, "%s%" PRIu64, i ? "," : "", (*itr)[i]);
        fprintf(f, "]}");
        ++itr;
    }
    fprintf(f, "]}\n");
}

static void emitStHash(FILE* f, const string& seq, const vector<string>& seeds,
                       unsigned h2) {
    unsigned k = seeds[0].size();
    unsigned m = seeds.size();
    auto parsed = stHashIterator::parseSeed(seeds);
    fprintf(f, "{\"seq\":\"%s\",\"k\":%u,\"m\":%u,\"m2\":%u,\"seeds\":[", seq.c_str(), k, m, h2);
    for (unsigned i = 0; i < m; ++i)
        fprintf(f, "%s\"%s\"", i ? "," : "", seeds[i].c_str());
    fprintf(f, "],\"frames\":[");
    bool first = true;
    stHashIterator itr(seq, parsed, m, h2, k);
    while (itr != itr.end()) {
        if (!first) fprintf(f, ",");
        first = false;
        fprintf(f, "{\"pos\":%zu,\"hashes\":[", itr.pos());
        for (unsigned i = 0; i < m * h2; ++i)
            fprintf(f, "%s%" PRIu64, i ? "," : "", (*itr)[i]);
        fprintf(f, "],\"strand\":[");
        for (unsigned i = 0; i < m * h2; ++i)
            fprintf(f, "%s%d", i ? "," : "", itr.strandArray()[i] ? 1 : 0);
        fprintf(f, "]}");
        ++itr;
    }
    fprintf(f, "]}\n");
}

static void emitSsHash(FILE* f, const string& seq, const string& seedStr) {
    unsigned k = seedStr.size();
    vector<bool> seed(k);
    for (unsigned i = 0; i < k; ++i) seed[i] = seedStr[i] == '1';
    fprintf(f, "{\"seq\":\"%s\",\"k\":%u,\"seed\":\"%s\",\"frames\":[", seq.c_str(), k, seedStr.c_str());
    bool first = true;
    ssHashIterator itr(seq, seed, k);
    while (itr != itr.end()) {
        if (!first) fprintf(f, ",");
        first = false;
        fprintf(f, "{\"pos\":%zu,\"sval\":%" PRIu64 "}", itr.pos(), *itr);
        ++itr;
    }
    fprintf(f, "]}\n");
}

// KmerBloomFilter's hash chain: NTC64 base hash + NTE64-derived extras.
static void emitKmerChain(FILE* f, const string& kmer, unsigned h) {
    unsigned k = kmer.size();
    uint64_t base = NTC64(kmer.c_str(), k);
    fprintf(f, "{\"kmer\":\"%s\",\"k\":%u,\"h\":%u,\"hashes\":[%" PRIu64, kmer.c_str(), k, h, base);
    for (unsigned i = 1; i < h; ++i)
        fprintf(f, ",%" PRIu64, NTE64(base, k, i));
    fprintf(f, "]}\n");
}

static void emitShuffle(FILE* f, uint64_t seed, unsigned n) {
    vector<unsigned> v(n);
    for (unsigned i = 0; i < n; ++i) v[i] = i;
    std::minstd_rand g(seed);
    std::shuffle(v.begin(), v.end(), g);
    fprintf(f, "{\"seed\":%" PRIu64 ",\"n\":%u,\"perm\":[", seed, n);
    for (unsigned i = 0; i < n; ++i) fprintf(f, "%s%u", i ? "," : "", v[i]);
    // also record the next three raw draws of the engine after the shuffle
    fprintf(f, "],\"next\":[%lu,%lu,%lu]}\n", (unsigned long)g(), (unsigned long)g(), (unsigned long)g());
}

int main(int argc, char** argv) {
    if (argc < 2) { fprintf(stderr, "usage: gen_golden OUTDIR\n"); return 1; }
    string dir = argv[1];

    // ---- ntHash golden vectors -------------------------------------------
    FILE* f = openOut(dir, "nthash_golden.jsonl");
    const string readmeSeq = "TAGAATCACCCAAAGA";
    const string unitSeq = "ACGTAC";
    const string cbfSeq = "ACGTACACTGGACTGAGTCT";
    // deterministic pseudo-random long sequence (no external RNG dependency)
    string longSeq;
    { uint64_t s = 0x9E3779B97F4A7C15ull;
      const char* B = "ACGT";
      for (int i = 0; i < 300; ++i) { s = s * 6364136223846793005ull + 1442695040888963407ull; longSeq += B[(s >> 33) & 3]; } }
    string nSeq = "ACGTNNACGTACGTTGCANCGTACGTANGGG";
    string lowerSeq = "acgtACGTtgcaTTggN" + longSeq.substr(0, 40);
    string uSeq = "ACGUACGUUGCA"; // 'U' handled like 'T' by seedTab

    emitNtHash(f, readmeSeq, 5, 4);
    emitNtHash(f, unitSeq, 4, 5);
    emitNtHash(f, cbfSeq, 8, 5);
    emitNtHash(f, longSeq, 21, 3);
    emitNtHash(f, longSeq, 15, 2);
    emitNtHash(f, longSeq, 31, 4);
    emitNtHash(f, longSeq, 32, 4);
    emitNtHash(f, longSeq, 33, 4);
    emitNtHash(f, longSeq, 64, 5);
    emitNtHash(f, longSeq, 100, 2);
    emitNtHash(f, nSeq, 5, 3);
    emitNtHash(f, nSeq, 4, 2);
    emitNtHash(f, lowerSeq, 6, 2);
    emitNtHash(f, uSeq, 5, 3);
    emitNtHash(f, "ACG", 5, 2);      // seq shorter than k: no frames
    emitNtHash(f, "NNNNNNNN", 4, 2); // all-N: no frames
    fclose(f);

    // ---- spaced-seed (stHash) golden vectors -----------------------------
    f = openOut(dir, "sthash_golden.jsonl");
    vector<string> seeds9 = { "110110111", "111010011" };
    vector<string> seeds15 = { "111100000001111", "110011000110011", "101010101010101" };
    emitStHash(f, longSeq.substr(0, 60), seeds9, 1);
    emitStHash(f, longSeq.substr(0, 60), seeds9, 3);
    emitStHash(f, longSeq.substr(0, 80), seeds15, 2);
    emitStHash(f, nSeq, seeds9, 2);
    // all-1 seed should reduce to plain canonical hashing
    emitStHash(f, cbfSeq, vector<string>{ "11111111" }, 2);
    fclose(f);

    // ---- single spaced-seed (ssHash) golden vectors ----------------------
    f = openOut(dir, "sshash_golden.jsonl");
    emitSsHash(f, longSeq.substr(0, 50), "1101101");
    emitSsHash(f, longSeq.substr(0, 50), "1111111");
    emitSsHash(f, cbfSeq, "10101010");
    emitSsHash(f, nSeq, "11011");
    fclose(f);

    // ---- KmerBloomFilter hash chains -------------------------------------
    f = openOut(dir, "kmer_golden.jsonl");
    emitKmerChain(f, "TAGAA", 4);
    emitKmerChain(f, "ACGTA", 4);
    emitKmerChain(f, "ACGTACGTACGTACGTACGTA", 5);
    emitKmerChain(f, longSeq.substr(0, 64), 3);
    fclose(f);

    // ---- std::minstd_rand + std::shuffle golden --------------------------
    f = openOut(dir, "shuffle_golden.jsonl");
    uint64_t seeds[] = { 0, 1, 2, 42, 12345, 0x90b45d39fb6da1faull, 0xffffffffffffffffull,
                         2147483646ull, 2147483647ull, 0x7fffffffull };
    for (uint64_t s : seeds)
        for (unsigned n : { 1u, 2u, 3u, 4u, 5u, 7u, 8u, 16u })
            emitShuffle(f, s, n);
    fclose(f);

    // ---- BloomFilter .bf file, README config -----------------------------
    {
        BloomFilter bloom(1000, 4, 5);
        ntHashIterator itr(readmeSeq, 4, 5);
        while (itr != itr.end()) { bloom.insert(*itr); ++itr; }
        bloom.storeFilter(dir + "/bf_readme.bf");
    }
    // with nEntry/tEntry set (exercises those header fields)
    {
        BloomFilter bloom(512, 3, 4);
        bloom.setnEntry(7);
        bloom.settEntry(11);
        ntHashIterator itr(unitSeq, 3, 4);
        while (itr != itr.end()) { bloom.insert(*itr); ++itr; }
        bloom.storeFilter(dir + "/bf_entries.bf");
    }

    // ---- CountingBloomFilter .bf files -----------------------------------
    {
        CountingBloomFilter<uint8_t> cbf(1000, 5, 8, 1);
        for (int rep = 0; rep < 3; ++rep) {
            ntHashIterator itr(cbfSeq, 5, 8);
            while (itr != itr.end()) { cbf.insert(*itr); ++itr; }
        }
        cbf.storeFilter(dir + "/cbf_small.bf");
    }
    {
        // 1001 bytes -> rounds up to 1008
        CountingBloomFilter<uint8_t> cbf(1001, 4, 6, 2);
        ntHashIterator itr(longSeq.substr(0, 100), 4, 6);
        while (itr != itr.end()) { cbf.insert(*itr); ++itr; }
        cbf.storeFilter(dir + "/cbf_round.bf");
    }
    {
        CountingBloomFilter<uint64_t> cbf(4096, 3, 5, 1);
        ntHashIterator itr(longSeq.substr(0, 120), 3, 5);
        while (itr != itr.end()) { cbf.insert(*itr); ++itr; }
        cbf.storeFilter(dir + "/cbf64_small.bf");
    }

    fprintf(stderr, "golden files written to %s\n", dir.c_str());
    return 0;
}
