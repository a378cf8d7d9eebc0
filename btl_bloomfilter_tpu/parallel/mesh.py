"""Device mesh helpers for the distribution layer.

The reference has no distributed layer at all (shared-memory atomics only,
SURVEY.md §2); this is new TPU-first design. One 1-D logical axis
("shards") covers both data-parallel replication and filter sharding; ICI
collectives (ppermute / all_to_all / psum) ride it.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shards"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = AXIS
    return NamedSharding(mesh, P(*spec))
