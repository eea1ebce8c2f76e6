"""shard_map + Pallas: the warp kernel on the multi-chip perf path.

The GSPMD-sharded engine programs (dist/engine_spmd.py) must trace the
XLA formulations — the SPMD partitioner cannot split a `pallas_call` over
a sharded operand (ops/pallas_config.py). That is correct but leaves the
fused kernels off the multi-chip path. The explicit alternative is
`shard_map`: the warp is embarrassingly parallel over vertices (node
state is small and replicated), so each device simply runs the fused
kernel (ops/warp_pallas.py) on its local row shard — zero collectives,
full kernel performance per chip.

This module is the pattern demonstration for that path (the same shape
applies to the correspondence sweep and the Gram assembly, which each
need one psum after their local kernel). Validated on the virtual CPU
mesh with the kernel in interpret mode (tests/test_dist.py).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dynfu_tpu.ops import warp_pallas
from dynfu_tpu.warp import field as wfield


@functools.partial(jax.jit, static_argnames=("mesh", "blend", "k", "tq",
                                             "interpret"))
def _warp_sharded(mesh, points, normals, pos, dqs, w, mask, *, blend, k,
                  tq, interpret):
    def local(points, normals, pos, dqs, w, mask):
        wp, wn, _, _ = warp_pallas.warp_fused_tpu(
            points, normals, pos, dqs, w, mask, k=k, blend=blend, tq=tq,
            interpret=interpret)
        return wp, wn

    rows, repl = P("x"), P()
    fn = shard_map(
        local, mesh=mesh,
        in_specs=(rows, rows, repl, repl, repl, repl),
        out_specs=(rows, rows),
        check_vma=False,
    )
    return fn(points, normals, pos, dqs, w, mask)


def warp_points_normals_sharded(
    mesh: Mesh,
    wf: wfield.WarpField,
    points,
    normals,
    blend: str = "dqb",
    k: int = wfield.KNN,
    tq: int = 1024,
    interpret: bool | None = None,
):
    """Vertex-sharded fused warp over `mesh`: (warped, warped_normals),
    row-sharded like the inputs. Point count must divide the mesh size.

    `interpret=None` auto-selects: real kernels on TPU, interpret mode on
    CPU (virtual-mesh validation)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows = NamedSharding(mesh, P("x"))
    repl = NamedSharding(mesh, P())
    points = jax.device_put(points, rows)
    normals = jax.device_put(normals, rows)
    pos = jax.device_put(wf.pos, repl)
    dqs = jax.device_put(wf.dqs, repl)
    w = jax.device_put(wf.w, repl)
    mask = jax.device_put(wf.mask, repl)
    return _warp_sharded(mesh, points, normals, pos, dqs, w, mask,
                         blend=blend, k=k, tq=tq, interpret=interpret)
