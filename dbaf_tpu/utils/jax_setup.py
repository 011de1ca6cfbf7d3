"""Runtime setup: persistent compilation cache + platform helpers.

On hosted/remote TPU transports, XLA compiles run server-side and cost tens
of seconds per program per process; the persistent cache makes second runs
start in seconds.  Call :func:`setup` at every entry point.
"""

from __future__ import annotations

import os
import os.path as osp

_DEFAULT_CACHE = osp.abspath(
    osp.join(osp.dirname(__file__), "..", "..", ".jax_cache")
)


def setup(cache_dir: str | None = None):
    import jax

    cache = cache_dir or os.environ.get("DBAF_JAX_CACHE", _DEFAULT_CACHE)
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def force_cpu(n_devices: int = 8):
    """Pin to the CPU backend with a virtual device mesh (tests/dryruns).

    Must run before any backend use; overrides the hosted sitecustomize's
    forced platform list.
    """
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
