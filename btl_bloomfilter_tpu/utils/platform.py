"""Platform selection helpers.

The hosting environment may register an auto-prioritized TPU plugin that
overrides the ``JAX_PLATFORMS`` environment variable; the only reliable
way to pin a backend from library code is a post-import config update
(before the first array operation).
"""

from __future__ import annotations

import jax


def force_cpu(host_device_count: int | None = None) -> None:
    """Pin JAX to the CPU backend; optionally fake N host devices (for
    testing multi-chip sharding without hardware)."""
    import os

    if host_device_count is not None:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count="
                f"{host_device_count}").strip()
    jax.config.update("jax_platforms", "cpu")


def apply_env() -> None:
    """Honor ``BTL_PLATFORM=cpu`` (the hosting TPU plugin overrides the
    ``JAX_PLATFORMS`` env var, so the CLIs call this explicitly)."""
    import os

    if os.environ.get("BTL_PLATFORM", "").lower() == "cpu":
        force_cpu()


def default_backend() -> str:
    return jax.default_backend()


def enable_compilation_cache(path: str | None = None) -> None:
    """Persist compiled executables across processes (compiles over the
    remote-TPU tunnel take minutes; reruns then load from disk)."""
    import os

    path = path or os.path.expanduser("~/.cache/jax_btl_bloomfilter")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
