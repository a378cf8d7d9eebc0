"""In-VMEM bitonic block sorter (kernels/vmem_sort.py), interpret mode."""

import numpy as np
import jax.numpy as jnp

from btl_bloomfilter_tpu.kernels import vmem_sort


def test_sort_blocks_matches_numpy():
    rng = np.random.default_rng(3)
    n = vmem_sort.BLOCK * 4
    x = rng.integers(0, 1 << 32, size=n, dtype=np.uint32)
    got = np.asarray(vmem_sort.sort_blocks(jnp.asarray(x), interpret=True))
    want = np.sort(x.reshape(-1, vmem_sort.BLOCK), axis=-1).reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_sort_blocks_duplicates_and_extremes():
    rng = np.random.default_rng(4)
    n = vmem_sort.BLOCK * 2
    x = rng.integers(0, 8, size=n, dtype=np.uint32)
    x[:16] = 0xFFFFFFFF
    got = np.asarray(vmem_sort.sort_blocks(jnp.asarray(x), interpret=True))
    want = np.sort(x.reshape(-1, vmem_sort.BLOCK), axis=-1).reshape(-1)
    np.testing.assert_array_equal(got, want)
