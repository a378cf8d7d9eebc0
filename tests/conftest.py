"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU hardware; unit tests run on CPU so that
multi-chip sharding paths can be exercised with
``--xla_force_host_platform_device_count=8``.
"""

import os

# Force CPU for unit tests (the session environment routes JAX to a remote
# TPU via JAX_PLATFORMS=axon; eager round-trips there are ~100ms/op).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The jaxtyping pytest plugin imports jax before this conftest runs, so the
# env var alone is too late — update the live config too (the backend itself
# is not initialized until the first array op, so this still applies).
import jax

jax.config.update("jax_platforms", "cpu")
