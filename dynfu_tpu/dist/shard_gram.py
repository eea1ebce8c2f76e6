"""shard_map + Pallas: the solve's Gram assembly on the multi-chip path.

Same shape as dist/shard_warp.py (the GSPMD partitioner cannot split a
pallas_call, so the kernel runs per-shard under shard_map): the data rows
(vertices) are row-sharded, each device assembles its local partial normal
equations with the fused VMEM Gram kernel (solver/gram_pallas.py), and ONE
psum reduces (A, b) — the Schur-style reduction over ICI that
BASELINE.json's scaling plan names for the Gauss-Newton stage.
"""

from __future__ import annotations

import functools

import jax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@functools.partial(jax.jit, static_argnames=("mesh", "D", "interpret"))
def _gram_sharded(mesh, data_idx, data_w, s2, delta, *, D, interpret):
    from dynfu_tpu.solver import gram_pallas

    def local(data_idx, data_w, s2, delta):
        A, b = gram_pallas.data_normal_tpu(data_idx, data_w, s2, delta, D,
                                           interpret=interpret)
        return jax.lax.psum(A, "x"), jax.lax.psum(b, "x")

    rows, repl = P("x"), P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(rows, rows, rows, rows),
        out_specs=(repl, repl),
        check_vma=False,
    )
    return fn(data_idx, data_w, s2, delta)


def data_normal_sharded(
    mesh: Mesh,
    data_idx,
    data_w,
    s2,
    delta,
    D: int,
    interpret: bool | None = None,
):
    """Row-sharded Gram assembly over `mesh`: (A (D, D), b (D, 3))
    replicated. The vertex count must divide the mesh size.

    `interpret=None` auto-selects: real kernels on TPU, interpret mode on
    CPU (virtual-mesh validation)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = NamedSharding(mesh, P("x"))
    return _gram_sharded(
        mesh,
        jax.device_put(data_idx, rows), jax.device_put(data_w, rows),
        jax.device_put(s2, rows), jax.device_put(delta, rows),
        D=D, interpret=interpret)
