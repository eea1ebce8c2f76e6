"""Process-wide switch for the Pallas TPU kernels.

The kernels (ops/knn_pallas, ops/corr_pallas, ops/warp_pallas,
solver/gram_pallas) dispatch at TRACE time via their `available()` checks.
Two situations must force the XLA formulations instead:

* `DYNFU_NO_PALLAS=1` in the environment — A/B benchmarking;
* a multi-device (GSPMD) trace — XLA's SPMD partitioner cannot partition a
  `pallas_call` over a sharded operand, so the sharded engine programs
  (dist/engine_spmd.py) trace the engine bodies under `no_pallas()`; the
  pure-XLA formulations partition cleanly (that is what
  tests/test_dist.py certifies against single-device outputs).
"""

from __future__ import annotations

import contextlib
import os

_disabled = 0


@contextlib.contextmanager
def no_pallas():
    """Force the XLA formulations for every dispatch inside the context
    (trace-time effect; nestable).

    Clears the jit trace caches at BOTH boundaries: the flag is not part
    of any inner @jax.jit cache key, so a pallas-containing jaxpr traced
    before the scope (e.g. gn.solve during single-chip frames) would
    otherwise be replayed inside a multi-device trace — and vice versa.
    Re-tracing is Python-cost only; compiled TPU executables reload from
    the persistent compilation cache."""
    global _disabled
    import jax

    if _disabled == 0:
        jax.clear_caches()
    _disabled += 1
    try:
        yield
    finally:
        _disabled -= 1
        if _disabled == 0:
            jax.clear_caches()


@contextlib.contextmanager
def force_pallas():
    """Re-enable the Pallas dispatch inside an enclosing `no_pallas()`
    scope (trace-time effect).

    Used by the kernel-path sharded engine frame (dist/engine_spmd.py):
    the GSPMD-traced stages need `no_pallas()` (the SPMD partitioner cannot
    split a pallas_call), but the shard_map sections inside the same
    program run per-device where the fused kernels ARE legal — each local
    body re-enables the dispatch for its own trace. Same cache-boundary
    contract as no_pallas (the flag is not part of inner jit cache keys)."""
    global _disabled
    import jax

    prev = _disabled
    if prev != 0:
        jax.clear_caches()
    _disabled = 0
    try:
        yield
    finally:
        _disabled = prev
        if prev != 0:
            jax.clear_caches()


def pallas_enabled() -> bool:
    """True when Pallas kernels may be used: TPU backend, not disabled by
    env or an enclosing no_pallas() scope."""
    import jax

    if _disabled or os.environ.get("DYNFU_NO_PALLAS"):
        return False
    return jax.default_backend() == "tpu"
