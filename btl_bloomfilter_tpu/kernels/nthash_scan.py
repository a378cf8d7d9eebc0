"""Mosaic kernel: fused ntHash prefix-XOR scan for whole read batches.

The XLA path (ops/nthash.py) expresses ntHash as an exclusive prefix-XOR
of per-position seeds followed by windowed combines — mathematically right
for TPU, but ``jax.lax.associative_scan`` plus the follow-on rotations,
canonical select, and h-fold derivation materialize every intermediate
plane in HBM (measured ~3.8 ms for a 512x2048 batch, >10x the traffic
roofline of the op).

This kernel runs the whole pipeline in VMEM with one pass over the codes:

  grid step c (one 128-lane column block, sequential carry):
    1. per-base seeds via compare-selects (no gather), g(t) = srol^{-t}
       (seed) / srol^{t}(rcseed) with per-lane rotation amounts
    2. in-block inclusive XOR scan along lanes (7 roll-mask-xor doubling
       steps) + running carry from previous blocks -> global exclusive
       prefix P(t); same machinery with + for the non-ACGT counter
    3. windows of block c-1 combine two resident P blocks with STATIC
       lane slices: fh_pre = P[:, k:k+128] ^ P[:, :128] (k <= 128)
    4. forward/reverse rotations (srol^{p+k-1} / srol^{-p}), canonical
       min select, h-fold multiply-shift-XOR derivation, N-window
       validity — all elementwise in VMEM
    5. one output write per plane: hashes as [h, B, W] limb planes
       (h-major: a [B, W, h] layout would tile the minor dim of 4 to 128
       lanes; callers that need [..., W, h] pay one moveaxis)

Bit-exact vs the XLA path (itself golden-verified against the compiled
reference) — asserted in tests/test_nthash_kernel.py.

Replaces the sequential per-k-mer roll of the reference
(/root/reference/vendor/nthash.hpp:442-457, ntHashIterator.hpp:59-86) at
TPU batch scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops import nthash_tables as T
from ..ops import u64
from ..ops.u64 import U64

LANES = 128

_SEED_HI = tuple(int(x) for x in (T.SEEDS >> np.uint64(32)).astype(np.uint32))
_SEED_LO = tuple(int(x) for x in
                 (T.SEEDS & np.uint64(0xFFFFFFFF)).astype(np.uint32))
_RC_HI = tuple(int(x) for x in
               (T.RC_SEEDS >> np.uint64(32)).astype(np.uint32))
_RC_LO = tuple(int(x) for x in
               (T.RC_SEEDS & np.uint64(0xFFFFFFFF)).astype(np.uint32))


def _seed_select(codes, table):
    """table[codes] for a 5-entry constant table via compare-selects
    (codes int32 in [0, 4]; a real gather would serialize on TPU)."""
    out = jnp.full(codes.shape, table[4], jnp.uint32)
    for v in range(4):
        out = jnp.where(codes == v, jnp.uint32(table[v]), out)
    return out


def _srol_pow(v: U64, t33, t31) -> U64:
    """srol**t with per-element amounts (ops/nthash.srol_pow, inlined so
    the kernel has no import-cycle on ops.nthash)."""
    t33 = jnp.asarray(t33, jnp.uint32)
    t31 = jnp.asarray(t31, jnp.uint32)
    low = U64(v.hi & 1, v.lo)
    r = u64.or_(u64.shl(low, t33), u64.shr(low, 33 - t33))
    h31 = v.hi >> 1
    r31 = ((h31 << t31) | (h31 >> (31 - t31))) & np.uint32(0x7FFFFFFF)
    return U64((r31 << 1) | (r.hi & 1), r.lo)


def _lane_scan(x, lane, op):
    """Inclusive scan along the 128-lane axis via doubling rolls."""
    for j in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(x, j, axis=1)
        sh = jnp.where(lane >= j, sh, jnp.zeros_like(x))
        x = op(x, sh)
    return x


def _kernel(codes_ref, mods_ref, *refs, k, h, W, muls, mod_size):
    """mod_size None: refs = (hi, lo, strand, valid, prev, carry) — emit
    hash limb planes. mod_size set: refs = (pos, strand, valid, prev,
    carry) — emit positions (hash % mod_size, Barrett in-kernel) with the
    0xFFFFFFFF sentinel on invalid windows, ready for the insert sort.

    mods_ref carries the row-invariant per-block rotation-amount tables
    (t mod 33/31 and friends are functions of the lane position only —
    precomputed host-side instead of 8 integer mods over [B, 128] tiles
    per step; rows broadcast along sublanes for free)."""
    if mod_size is None:
        hi_ref, lo_ref, strand_ref, valid_ref, prev_ref, carry_ref = refs
    else:
        pos_ref, strand_ref, valid_ref, prev_ref, carry_ref = refs
    c = pl.program_id(1)
    B = codes_ref.shape[0]
    lane = lax.broadcasted_iota(jnp.int32, (B, LANES), 1)
    mrow = mods_ref[0]                                  # [16, 128] uint32

    @pl.when(c == 0)
    def _init():
        prev_ref[...] = jnp.zeros_like(prev_ref)
        carry_ref[...] = jnp.zeros_like(carry_ref)

    # ---- 1/2: seeds -> g -> global exclusive prefix for this block ------
    codes = codes_ref[...].astype(jnp.int32)            # [B, 128]
    neg33 = mrow[0:1, :]
    neg31 = mrow[1:2, :]
    pos33 = mrow[2:3, :]
    pos31 = mrow[3:4, :]

    gf = _srol_pow(U64(_seed_select(codes, _SEED_HI),
                       _seed_select(codes, _SEED_LO)), neg33, neg31)
    gr = _srol_pow(U64(_seed_select(codes, _RC_HI),
                       _seed_select(codes, _RC_LO)), pos33, pos31)
    is_n = (codes >= T.CODE_N).astype(jnp.uint32)

    planes_g = (gf.hi, gf.lo, gr.hi, gr.lo)
    cur_excl = []
    for i, g in enumerate(planes_g):
        incl = _lane_scan(g, lane, jnp.bitwise_xor) ^ carry_ref[i]
        cur_excl.append(incl ^ g)                       # exclusive at t
        carry_ref[i] = jnp.broadcast_to(incl[:, LANES - 1:], (B, LANES))
    incl_n = _lane_scan(is_n, lane, jnp.add) + carry_ref[4]
    cur_excl.append(incl_n - is_n)
    carry_ref[4] = jnp.broadcast_to(incl_n[:, LANES - 1:], (B, LANES))

    # ---- 3-5: emit the windows of block c-1 -----------------------------
    @pl.when(c >= 1)
    def _emit():
        ext = [jnp.concatenate([prev_ref[i], cur_excl[i]], axis=1)
               for i in range(5)]                        # [B, 256]
        fh_pre = U64(ext[0][:, k:k + LANES] ^ ext[0][:, :LANES],
                     ext[1][:, k:k + LANES] ^ ext[1][:, :LANES])
        rh_pre = U64(ext[2][:, k:k + LANES] ^ ext[2][:, :LANES],
                     ext[3][:, k:k + LANES] ^ ext[3][:, :LANES])
        n_in_win = ext[4][:, k:k + LANES] - ext[4][:, :LANES]

        fh = _srol_pow(fh_pre, mrow[4:5, :], mrow[5:6, :])
        rh = _srol_pow(rh_pre, mrow[6:7, :], mrow[7:8, :])
        strand = u64.lt(rh, fh)                          # rh < fh canonical
        canon = u64.select(strand, rh, fh)

        hs = [canon]
        for i in range(h - 1):
            tv = u64.mul_const(canon, muls[i])
            hs.append(u64.xor(tv, u64.shr(tv, T.MULTI_SHIFT)))
        valid = (n_in_win == 0) & jnp.broadcast_to(mrow[8:9, :] != 0,
                                                   n_in_win.shape)
        if mod_size is None:
            hi_ref[...] = jnp.stack([v.hi for v in hs])  # [h, B, 128]
            lo_ref[...] = jnp.stack([v.lo for v in hs])
        else:
            sent = jnp.uint32(0xFFFFFFFF)
            pos_ref[...] = jnp.stack(
                [jnp.where(valid, u64.mod_to_index(v, mod_size), sent)
                 for v in hs])
        strand_ref[...] = strand.astype(jnp.int32)
        valid_ref[...] = valid.astype(jnp.int32)

    # ---- rotate the P blocks -------------------------------------------
    for i in range(5):
        prev_ref[i] = cur_excl[i]


def hash_frames_planes_kernel(codes: jax.Array, k: int, h: int,
                              interpret: bool = False):
    """Fused ntHash of every window of ``codes`` (uint8/int [B, L]).

    Returns (hashes U64[h, B, W], strand bool[B, W], valid bool[B, W])
    with W = L - k + 1 — the plane-major twin of ops.nthash.hash_frames
    (bit-identical values). Requires 1 < k <= 128 and L >= k.
    """
    hi, lo, strand, valid, B0, W = _run(codes, k, h, None, interpret)
    return (U64(hi[:, :B0, :W], lo[:, :B0, :W]),
            strand[:B0, :W] != 0, valid[:B0, :W] != 0)


def positions_planes_kernel(codes: jax.Array, k: int, h: int, size: int,
                            interpret: bool = False):
    """Fused ntHash + bit-position derivation: positions = hash % size
    (Barrett mod in-kernel), with invalid windows already carrying the
    0xFFFFFFFF sentinel — exactly the array bloom.insert sorts. Returns
    (pos uint32[h, B, W], strand bool[B, W], valid bool[B, W]). Requires
    size <= 2**32 - 1 (the sentinel must stay out of range)."""
    if size >= (1 << 32):
        raise ValueError("positions mode requires size < 2**32")
    pos, strand, valid, B0, W = _run(codes, k, h, size, interpret)
    return pos[:, :B0, :W], strand[:B0, :W] != 0, valid[:B0, :W] != 0


@functools.lru_cache(maxsize=64)
def _mod_tables(nblocks: int, k: int, W: int):
    """Per-block [16, 128] rotation-amount/validity rows (row-invariant
    across the batch): 0-3 scan-phase srol amounts for t = c*128+lane,
    4-7 emit-phase amounts for p = (c-1)*128+lane, 8 the p < W gate."""
    t = np.arange((nblocks + 1) * LANES,
                  dtype=np.int64).reshape(nblocks + 1, LANES)
    p = t - LANES
    tab = np.zeros((nblocks + 1, 16, LANES), np.uint32)
    tab[:, 0] = (-t) % 33
    tab[:, 1] = (-t) % 31
    tab[:, 2] = t % 33
    tab[:, 3] = t % 31
    tab[:, 4] = (p + k - 1) % 33
    tab[:, 5] = (p + k - 1) % 31
    tab[:, 6] = (-p) % 33
    tab[:, 7] = (-p) % 31
    tab[:, 8] = ((p >= 0) & (p < W)).astype(np.uint32)
    return tab


def _run(codes: jax.Array, k: int, h: int, mod_size, interpret: bool):
    if not 1 < k <= LANES:
        raise ValueError(f"kernel supports 2 <= k <= {LANES}, got {k}")
    B0, L = codes.shape
    if L < k:
        raise ValueError(f"sequence length {L} < k={k}")
    W = L - k + 1
    nblocks = pl.cdiv(L, LANES)
    # one trailing all-N block: step `nblocks` emits the final window
    # block against P(t >= L) (g(N) spans XOR-transparent zeros)
    lpad = (nblocks + 1) * LANES - L
    # row tiling bounds per-step VMEM (the full 512-row batch blew the
    # 16 MB scoped-vmem stack); carries are per-row so tiles of the read
    # axis run as an independent outer grid dimension
    bt = next((t for t in (128, 64, 32, 16, 8) if B0 % t == 0), None)
    bpad = 0 if bt else -B0 % 8
    if bt is None:
        bt = 8
    B = B0 + bpad
    codes = jnp.concatenate(
        [codes.astype(jnp.int32),
         jnp.full((B0, lpad), T.CODE_N, jnp.int32)], axis=1)
    if bpad:
        codes = jnp.concatenate(
            [codes, jnp.full((bpad, codes.shape[1]), T.CODE_N, jnp.int32)])
    nbt = B // bt
    w_pad = nblocks * LANES
    muls = tuple(int(x) for x in T.multihash_multipliers(k, h))

    plane_spec = pl.BlockSpec((h, bt, LANES),
                              lambda b, c: (0, b, jnp.maximum(c - 1, 0)),
                              memory_space=pltpu.VMEM)
    flag_spec = pl.BlockSpec((bt, LANES),
                             lambda b, c: (b, jnp.maximum(c - 1, 0)),
                             memory_space=pltpu.VMEM)
    plane_shape = jax.ShapeDtypeStruct((h, B, w_pad), jnp.uint32)
    flag_shape = jax.ShapeDtypeStruct((B, w_pad), jnp.int32)
    nplanes = 2 if mod_size is None else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(int(nbt), int(nblocks) + 1),
        in_specs=[
            pl.BlockSpec((bt, LANES), lambda b, c: (b, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16, LANES), lambda b, c: (c, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(plane_spec,) * nplanes + (flag_spec, flag_spec),
        scratch_shapes=[
            pltpu.VMEM((5, bt, LANES), jnp.uint32),   # prev-block excl P
            pltpu.VMEM((5, bt, LANES), jnp.uint32),   # carry (bcast lanes)
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, k=k, h=h, W=W, muls=muls,
                          mod_size=mod_size),
        grid_spec=grid_spec,
        out_shape=(plane_shape,) * nplanes + (flag_shape, flag_shape),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(codes, jnp.asarray(_mod_tables(int(nblocks), k, W)))
    return outs + (B0, W)
