"""Pallas TPU kernel: marching-cubes triangle-stream pack/emission.

The MC pass-2 emission writes each occupied cell's 0-5 triangles at its
exclusive-cumsum offset in the output stream. XLA lowers that as a
row-scatter whose cost scales with ROW COUNT at this chip's ~0.25 GB/s
effective scatter rate (13.3 ms for the 512-cube workload's 5*M rows;
windowed scatter-add and sort-as-scatter measured no better —
scripts/diag/ubench_mc2.py). This kernel exploits what the scatter cannot: the
offsets are MONOTONE, so each chunk of C consecutive cells owns one
CONTIGUOUS output range [offs[c0], offs[c0] + len):

  * per grid step, the chunk's 5C candidate triangle rows are packed in
    VMEM by a one-hot matmul (rank == iota contraction on the MXU — the
    chip's fast permutation primitive; a 3-way bf16 split keeps f32-exact
    coordinates);
  * the packed (5C, 9) block is DMA'd to the output at the chunk's start
    offset. Chunks beyond their valid length write stale rows, but grid
    steps execute IN ORDER on the core, so the next chunk's write starts
    exactly where the previous chunk's valid rows end and overwrites its
    garbage tail; the final tail lies beyond the consumer-visible count.

Replaces the trianglesGeneratorKernel output stage
(src/kfusion/cuda/marching_cubes.cu:181-296), which emits through a
warp-scan compaction the TPU has no analog for.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pack_kernel(start_ref, lrank_ref, tris_ref, out_ref, scratch, sem,
                 *, L):
    i = pl.program_id(0)
    # (1, 8, 5C) block — row 0 carries the data (8-sublane pad for the
    # TPU block-shape tiling rule)
    lr = lrank_ref[0, 0, :]  # (5C,) int32 local dest rank, >= L if invalid
    rows = jax.lax.broadcasted_iota(jnp.int32, (L, lr.shape[0]), 0)
    oh = (rows == lr[None, :])

    t9 = tris_ref[...]  # (5C, 9) f32
    # lane-pad to 128 in VMEM: the scratch->HBM DMA needs a 128-aligned
    # minor dim, and the MXU pads N to 128 internally anyway
    t = jnp.concatenate(
        [t9, jnp.zeros((t9.shape[0], 128 - t9.shape[1]), jnp.float32)], 1)
    dn = (((1,), (0,)), ((), ()))
    # one f32 matmul at HIGHEST (Mosaic supports DEFAULT|HIGHEST; the x6
    # split is exact and still one logical matmul): every output element is
    # a sum with at most ONE nonzero product (ranks are unique per dest) —
    # no manual hi/lo split, no bf16 one-hot packing relayout
    acc = jax.lax.dot_general(oh.astype(jnp.float32), t, dn,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
    scratch[...] = acc

    cp = pltpu.make_async_copy(
        scratch, out_ref.at[pl.ds(start_ref[i], L)], sem)
    cp.start()
    cp.wait()  # in-step wait keeps chunk writes strictly ordered


@functools.partial(jax.jit, static_argnames=("max_tris", "chunk",
                                             "interpret"))
def pack_triangles_tpu(
    tris: jnp.ndarray,  # (M, 5, 9) f32; slots >= the cell's count are ZERO
    t_offsets: jnp.ndarray,  # (M,) int32 exclusive cumsum of tri counts
    n_tris: jnp.ndarray,  # (M,) int32 per-cell triangle count (0..5)
    max_tris: int,
    chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pack per-cell triangle rows into the contiguous output stream:
    (max_tris, 9) f32 with rows beyond the total count undefined (the
    consumer masks by the vertex count). Offsets beyond max_tris drop."""
    M = tris.shape[0]
    assert M % chunk == 0
    nchunks = M // chunk
    L = 5 * chunk

    # clamp to capacity: cells whose range would spill past max_tris write
    # into the padding tail instead (same drop semantics as the scatter)
    offs = jnp.minimum(t_offsets, max_tris)
    base = jnp.repeat(offs[::chunk], chunk)
    slot = jnp.arange(5, dtype=jnp.int32)[None, :]
    lrank = jnp.where(slot < n_tris[:, None],
                      (offs - base)[:, None] + slot, L)
    lrank = lrank.reshape(nchunks, 1, L).astype(jnp.int32)
    lrank = jnp.broadcast_to(lrank, (nchunks, 8, L))  # 8-sublane tile pad
    start = offs[::chunk].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((1, 8, L), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 9), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((L, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_pack_kernel, L=L),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((max_tris + L, 128), jnp.float32),
        interpret=interpret,
    )(start, lrank, tris.reshape(-1, 9))
    return out[:max_tris, :9]


def available() -> bool:
    from dynfu_tpu.ops.pallas_config import pallas_enabled

    return pallas_enabled()
