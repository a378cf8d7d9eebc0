"""Multi-host runner glue.

On a TPU pod slice each host runs the same program; ``init()`` wires
jax.distributed so ``jax.devices()`` spans the slice and the mesh in
``mesh.make_mesh()`` covers all chips. Filter state is either replicated
(OR-allreduce merges ride ICI/DCN) or sharded (all-to-all routing); the
host-side loops in tools/ are already SPMD-safe because every collective
lives inside shard_map-jitted functions.

Failure recovery follows SURVEY.md §5: there is no elastic layer (the
reference has none either); restart-from-checkpoint is the story — the
.bf/.mibf files double as checkpoints, written by any single host from the
replicated or gathered state.
"""

from __future__ import annotations

import jax


def init(coordinator_address: str | None = None,
         num_processes: int | None = None,
         process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def is_primary() -> bool:
    return jax.process_index() == 0


def barrier(name: str = "btl") -> None:
    """Cross-host barrier via a trivial collective."""
    import jax.numpy as jnp

    jax.block_until_ready(
        jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
            jnp.ones((jax.local_device_count(),))))
