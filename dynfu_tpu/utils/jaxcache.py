"""Persistent XLA compilation cache.

The TPU toolchain on this class of hosts takes minutes to compile some of the
engine's larger programs (big-K matmul + argmin graphs); a persistent on-disk
cache makes every process after the first start instantly. Enabled by the
engines, the CLI, the benchmark harness, and the test suite.

Cache location: $DYNFU_CACHE_DIR, else ~/.cache/dynfu_tpu/xla.
"""

from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache() -> str:
    """Idempotently turn on JAX's persistent compilation cache."""
    global _enabled
    import jax

    cache_dir = os.environ.get(
        "DYNFU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "dynfu_tpu", "xla"),
    )
    if not _enabled:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    return cache_dir
