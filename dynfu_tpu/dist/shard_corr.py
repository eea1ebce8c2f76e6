"""shard_map + Pallas: the correspondence sweep on the multi-chip path.

Same shape as dist/shard_warp.py: the QUERIES (live vertices) are
row-sharded and each device runs the full tiered x-window 1-NN
(ops/knn.nn1_gather_xwindow — Pallas resident-point sweep + escalate +
brute rescue) against the REPLICATED point set. The point set (the warped
canonical, ~6x deduplicated) is small relative to the query set, so
replication costs one all-gather of a few MB while the sweep — the frame's
single most expensive stage — runs at full kernel speed per chip with zero
further collectives. Tier capacities are per-shard (escalate/rescue
failures are spread across shards; size them as capacity/n_devices of the
single-chip budget for the same total).
"""

from __future__ import annotations

import functools

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.partial(jax.jit, static_argnames=(
    "mesh", "window_blocks", "escalate", "rescue", "interpret"))
def _corr_sharded(mesh, queries, points, point_mask, query_mask, *,
                  window_blocks, escalate, rescue, interpret):
    from dynfu_tpu.ops import knn, pallas_config

    def local(queries, points, point_mask, query_mask):
        ctx = pallas_config.no_pallas() if interpret else _null()
        with ctx:
            return knn.nn1_gather_xwindow(
                queries, points, None, point_mask, query_mask,
                window_blocks=window_blocks, escalate=escalate,
                rescue=rescue)

    rows, repl = P("x"), P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(rows, repl, repl, rows),
        out_specs=(rows, rows),
        check_vma=False,
    )
    return fn(queries, points, point_mask, query_mask)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def nn1_xwindow_sharded(
    mesh: Mesh,
    queries,
    points,
    point_mask,
    query_mask,
    window_blocks: int = 3,
    escalate: int = 0,
    rescue: int = 0,
    interpret: bool | None = None,
):
    """Query-row-sharded tiered 1-NN over `mesh`: (vals (Q, 3), exact (Q,))
    row-sharded like the queries. Query count must divide the mesh size.

    `interpret=None` auto-selects: real Pallas kernels on TPU; on CPU the
    local sweep falls back to the XLA formulation (virtual-mesh
    validation — the Pallas interpreter inside shard_map is prohibitively
    slow at sweep sizes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = NamedSharding(mesh, P("x"))
    repl = NamedSharding(mesh, P())
    return _corr_sharded(
        mesh,
        jax.device_put(queries, rows), jax.device_put(points, repl),
        jax.device_put(point_mask, repl), jax.device_put(query_mask, rows),
        window_blocks=window_blocks, escalate=escalate, rescue=rescue,
        interpret=interpret)
