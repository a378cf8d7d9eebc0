"""In-VMEM Pallas bitonic block sorter — the measured answer to "can a
hand-written TPU sort beat XLA's?" (VERDICT r4 next #3).

Sorts BLOCKS of ``BLOCK = SUBL * 128`` uint32 keys entirely in VMEM with
vector compare-exchanges: the bitonic butterfly (partner = i ^ j) is two
circular rolls + a select per stage — lane rolls (j < 128) ride the
intra-row rotate, larger j ride sublane rolls. No HBM traffic beyond one
read + one write per element, no scalar loops.

This is deliberately the BLOCK-LOCAL phase only: a full sort of N
elements needs a further log2(N/BLOCK)-deep merge network across blocks
(each pass re-streaming all N elements). The probe (bench/vmem_sort_
probe.py) measures the block phase against the full XLA sort — if the
local phase alone cannot beat XLA's complete sort, the merge tree only
widens the gap, closing the question.

Round-4 note: two earlier formulations failed to lower ("Input offsets
outside of the first tile" on 1-D concats; a server-side compile failure
on the first [8, 128] roll variant). This version uses only
full-tile ``jnp.where`` selects and ``pltpu.roll`` with static shifts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUBL = 16
LANES = 128
BLOCK = SUBL * LANES           # 2048 keys per block


def _roll(x, shift, axis, interpret):
    shift = shift % x.shape[axis]          # pltpu.roll wants shift >= 0
    if interpret:
        return jnp.roll(x, shift, axis)
    return pltpu.roll(x, shift, axis)


def _block_kernel(x_ref, o_ref, *, interpret):
    # uint32 min/max of rolled values crashes the Mosaic backend
    # (measured: every uint32 roll+minimum kernel got HTTP 500 from the
    # remote compiler while the int32 twin lowers fine), so keys map to
    # int32 through the order-preserving sign-flip bitcast
    xu = x_ref[...]                                   # [SUBL, 128]
    x = jax.lax.bitcast_convert_type(xu ^ jnp.uint32(0x80000000),
                                     jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 0)
    idx = sub * LANES + lane

    k = 2
    while k <= BLOCK:
        j = k // 2
        while j >= 1:
            if j < LANES:
                up = _roll(x, -j, 1, interpret)       # value at lane l+j
                dn = _roll(x, j, 1, interpret)
                partner = jnp.where((lane & j) == 0, up, dn)
            else:
                js = j // LANES
                up = _roll(x, -js, 0, interpret)
                dn = _roll(x, js, 0, interpret)
                partner = jnp.where((sub & js) == 0, up, dn)
            asc = (idx & k) == 0
            low = (idx & j) == 0                      # i < i^j
            take_min = asc == low
            x = jnp.where(take_min, jnp.minimum(x, partner),
                          jnp.maximum(x, partner))
            j //= 2
        k *= 2
    o_ref[...] = jax.lax.bitcast_convert_type(
        x, jnp.uint32) ^ jnp.uint32(0x80000000)


def sort_blocks(x: jax.Array, interpret: bool = False) -> jax.Array:
    """Sort each consecutive BLOCK of ``x`` (uint32 [n], n % BLOCK == 0)
    ascending, block-locally."""
    n = x.shape[0]
    assert n % BLOCK == 0
    nblocks = n // BLOCK
    xt = x.reshape(nblocks * SUBL, LANES)
    out = pl.pallas_call(
        functools.partial(_block_kernel, interpret=interpret),
        grid=(nblocks,),
        in_specs=[pl.BlockSpec((SUBL, LANES), lambda b: (b, 0))],
        out_specs=pl.BlockSpec((SUBL, LANES), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct(xt.shape, x.dtype),
        interpret=interpret,
    )(xt)
    return out.reshape(-1)
