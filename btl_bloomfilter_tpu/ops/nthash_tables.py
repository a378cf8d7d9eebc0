"""ntHash constants, re-derived from first principles.

Only the irreducible constants of the ntHash scheme live here: the four
per-base 64-bit seeds, the multi-hash derivation constants, and the
ASCII->base-code mapping. Everything the C++ reference precomputes into
lookup tables (rotation tables ``A33r/A31l/...``, ``dimerTab``/``trimerTab``/
``tetramerTab`` — /root/reference/vendor/nthash.hpp:86-347) is instead
*computed* here, because on TPU the split rotation is a vector op, not a
table lookup.

Semantics mirrored (verified by golden tests against the compiled reference):
  - per-base seeds seedA/C/G/T/N   nthash.hpp:189-193
  - ASCII mapping incl. lowercase and 'U'=='T'   seedTab nthash.hpp:195-228
  - complement pairing A<->T, C<->G   (the ``&cpOff`` trick, nthash.hpp:180)
  - multiShift=27, multiSeed   nthash.hpp:183-186
"""

import numpy as np

# 64-bit random seeds for bases (nthash.hpp:189-193)
SEED_A = 0x3C8BFBB395C60474
SEED_C = 0x3193C18562A02B4C
SEED_G = 0x20323ED082572324
SEED_T = 0x295549F54BE24456
SEED_N = 0x0000000000000000

MULTI_SHIFT = 27                    # nthash.hpp:183
MULTI_SEED = 0x90B45D39FB6DA1FA     # nthash.hpp:186

# Base codes used throughout this framework: A=0 C=1 G=2 T=3 N=4.
CODE_A, CODE_C, CODE_G, CODE_T, CODE_N = 0, 1, 2, 3, 4
NUM_CODES = 5

SEEDS = np.array([SEED_A, SEED_C, SEED_G, SEED_T, SEED_N], dtype=np.uint64)

# complement code (N maps to N); seed of complement == seedTab[c & 7]
RC_CODE = np.array([CODE_T, CODE_G, CODE_C, CODE_A, CODE_N], dtype=np.uint8)
RC_SEEDS = SEEDS[RC_CODE]

# ASCII -> base code. Matches seedTab (nthash.hpp:195-228): upper/lowercase
# ACGT, with 'U'/'u' treated as T; everything else is N.
CODE_FROM_ASCII = np.full(256, CODE_N, dtype=np.uint8)
for ch, code in [("A", CODE_A), ("C", CODE_C), ("G", CODE_G),
                 ("T", CODE_T), ("U", CODE_T)]:
    CODE_FROM_ASCII[ord(ch)] = code
    CODE_FROM_ASCII[ord(ch.lower())] = code

ASCII_FROM_CODE = np.frombuffer(b"ACGTN", dtype=np.uint8).copy()

# Split-rotation field widths: the ntHash "srol" rotates the low 33 bits and
# the high 31 bits of the hash independently (the rol1+swapbits033 composite,
# nthash.hpp:350-380).
LOW_BITS = 33
HIGH_BITS = 31
MASK33 = (1 << 33) - 1


def split_rotate_np(v: np.ndarray, t: int) -> np.ndarray:
    """Host-side srol**t for table precomputation and tests (numpy uint64)."""
    v = np.asarray(v, dtype=np.uint64)
    t33 = t % 33
    t31 = t % 31
    l33 = v & np.uint64(MASK33)
    h31 = v >> np.uint64(33)
    r33 = ((l33 << np.uint64(t33)) | (l33 >> np.uint64(33 - t33))) & np.uint64(MASK33) if t33 else l33
    r31 = ((h31 << np.uint64(t31)) | (h31 >> np.uint64(31 - t31))) & np.uint64(0x7FFFFFFF) if t31 else h31
    return (r31 << np.uint64(33)) | r33


def multihash_multipliers(k: int, h: int) -> np.ndarray:
    """The h-1 uint64 multipliers (i ^ k*multiSeed) of the multi-hash
    derivation (nthash.hpp:530, :539, :563 ...)."""
    km = (k * MULTI_SEED) & ((1 << 64) - 1)
    return np.array([(i ^ km) & ((1 << 64) - 1) for i in range(1, h)],
                    dtype=np.uint64)


def encode_seq(seq) -> np.ndarray:
    """Encode an ASCII DNA sequence (str/bytes) to base codes (uint8)."""
    if isinstance(seq, str):
        seq = seq.encode("ascii")
    buf = np.frombuffer(bytes(seq), dtype=np.uint8)
    return CODE_FROM_ASCII[buf]
