"""Tracing / throughput observability (SURVEY.md §5 aux subsystem).

The reference's only instrumentation is wall-clock prints
(/root/reference/Tests/AdHoc/ParallelFilter.cpp:138-150). Here:

  * ``trace(...)`` — context manager around ``jax.profiler`` for capturing
    device traces viewable in TensorBoard/XProf;
  * ``Throughput`` — running k-mers/s counter with drain-aware timing
    (device work is forced before timestamps, since some remote platforms
    do not block in ``block_until_ready``);
  * ``roofline_bytes`` — back-of-envelope HBM traffic model for the insert
    and query loops, to report achieved vs speed-of-light bandwidth.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def drain(x) -> None:
    """Force completion of device work feeding ``x`` (1-element readback —
    reliable even where block_until_ready is a no-op)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    jnp.sum(leaf.ravel()[:1]).item()


@dataclasses.dataclass
class Throughput:
    """Running items/s counter."""

    name: str = "kmers"
    items: int = 0
    seconds: float = 0.0
    _t0: float | None = None

    def start(self):
        self._t0 = time.perf_counter()
        return self

    def stop(self, items: int, result=None):
        if result is not None:
            drain(result)
        self.seconds += time.perf_counter() - self._t0
        self.items += items
        self._t0 = None

    @property
    def rate(self) -> float:
        return self.items / self.seconds if self.seconds else 0.0

    def report(self) -> str:
        return (f"{self.name}: {self.items} in {self.seconds:.3f}s "
                f"= {self.rate / 1e6:.2f}M/s")


def roofline_bytes(n_kmers: int, hash_num: int, *, insert: bool) -> int:
    """Minimal HBM traffic for the bloom hot loop: h word gathers (+ h
    word read-modify-writes for insert) of 4 bytes each, assuming perfect
    caching of everything else."""
    per_kmer = hash_num * 4 * (3 if insert else 1)
    return n_kmers * per_kmer
