"""Marching cubes on the TSDF volume (TPU, jitted).

Re-design of the reference's two-pass GPU marching cubes
(src/kfusion/cuda/marching_cubes.cu, host driver
src/kfusion/marching_cubes.cpp):

reference                                   TPU formulation
-----------------------------------------   --------------------------------
warp-ballot + atomicAdd voxel compaction    dense cube-index field + masked
(getOccupiedVoxelsKernel, cu:79-141)        jnp.nonzero(size=cap) compaction
thrust::exclusive_scan vertex offsets       jnp.cumsum over compacted counts
(computeOffsetsAndTotalVertices, cu:167)
per-voxel shared-mem vertlist + LUT          vmapped 12-edge interpolation +
texture fetch (TrianglesGenerator,           LUT gathers; scatter into the
cu:185-266)                                  fixed triangle buffer

Semantics preserved:
* a cube participates only if ALL 8 corner weights are nonzero
  (CubeIndexEstimator::computeCubeIndex, cu:37-77);
* inside = tsdf < isoValue (= 0);
* emitted vertices sit on cube edges between voxel CENTERS (+0.5 shift,
  getNodeCoo, cu:185-194), interpolated by t = (iso - f0) / (f1 - f0 + 1e-15)
  (vertex_interp, cu:197-204);
* output is a flat vertex stream, 3 consecutive vertices per triangle, in
  VOLUME-frame coordinates, with a fixed-capacity buffer + count (the
  reference preallocates 6M points, marching_cubes.cpp:23-27).

The reference hardcodes the grid to 128³ (internal.hpp:74,
marching_cubes.cu:152,283-285 — the reason dynfu overrides volume_dims);
here dims flow from TsdfConfig, so 512³ meshes work.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dynfu_tpu.mesh import tables
from dynfu_tpu.volume.tsdf import TsdfConfig, TsdfVolume

MAX_TRIANGLES = 2_000_000  # default vertex-buffer capacity / 3


@functools.partial(jax.jit, static_argnames=("config", "max_voxels", "max_verts"))
def marching_cubes(
    vol: TsdfVolume,
    config: TsdfConfig,
    max_voxels: int = 1 << 17,
    max_verts: int = 3 * 600_000,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Extract the zero isosurface as a triangle soup.

    Returns (vertices (max_verts, 3) float32 volume-frame meters,
             n_verts () int32,
             n_dropped () int32 — occupied cube cells NOT meshed because a
             compaction capacity overflowed (per-column budget, active-column
             cap, or max_voxels); 0 means the output is complete).
    Valid vertices are [0, n_verts); the stream is 3 per triangle with the
    reference's ordering.
    """
    X, Y, Z = config.dims
    vs = np.asarray(config.voxel_size, np.float32)

    F = vol.tsdf.astype(jnp.float32)
    W = vol.weight

    tri_tab = jnp.asarray(tables.TRI_TABLE)  # (256, 16)
    nv_tab = jnp.asarray(tables.NUM_VERTS_TABLE)  # (256,)
    offs = tables.CORNER_OFFSETS  # (8, 3) numpy

    # --- pass 1: cube index field over the (X-1, Y-1, Z-1) cell grid --------
    def corner(i):
        dx, dy, dz = (int(v) for v in offs[i])
        return (
            F[dx : dx + X - 1, dy : dy + Y - 1, dz : dz + Z - 1],
            W[dx : dx + X - 1, dy : dy + Y - 1, dz : dz + Z - 1],
        )

    all_weighted = None
    cube = jnp.zeros((X - 1, Y - 1, Z - 1), jnp.int32)
    for i in range(8):
        fi, wi = corner(i)
        ok = wi != 0
        all_weighted = ok if all_weighted is None else (all_weighted & ok)
        cube = cube + (fi < 0.0).astype(jnp.int32) * (1 << i)

    cube = jnp.where(all_weighted, cube, 0)

    # --- compaction + offsets (thrust scan -> cumsum) -----------------------
    # occupancy needs NO table lookup: every case except 0/255 emits
    # triangles, so occ = (cube not trivial) — pure comparisons over the
    # dense field (TPU gathers are the slow operation here, LUTs come later
    # on the COMPACTED set only)
    occ = (cube != 0) & (cube != 255)
    occ_flat = occ.reshape(-1)
    n_cells = occ_flat.shape[0]
    n_occ_total = jnp.sum(occ.astype(jnp.int32))

    if n_cells < (1 << 18):
        # small volumes: direct masked compaction. The crossover to the
        # hierarchical path is far below this (measured at 128-cube:
        # direct 23.8 ms vs hierarchical 7.8 ms — nonzero's scatter cost
        # scales with the dense cell count at ~7 ms per M cells); the
        # threshold keeps tiny test volumes on the exact-by-construction
        # path where compile time matters more than run time.
        vox_idx = jnp.nonzero(occ_flat, size=max_voxels, fill_value=n_cells)[0]
    else:
        # Large volumes: XLA's nonzero scatters one element per CELL
        # (~950 ms for a 512-cube on this TPU). Occupancy is confined to
        # the truncation band, so compact hierarchically: per z-column,
        # extract the first K occupied z's, then run nonzero only over the
        # (columns x K) candidate table. Candidate order (row-major,
        # ascending z) equals the dense scan order, so downstream output
        # is bit-identical whenever no column overflows K.
        #
        # The extraction itself is BIT-PACKED: column occupancy packs into
        # ceil((Z-1)/32) uint32 words (one pass over the dense field), and
        # each of the K rounds pulls the lowest set bit of the first
        # nonzero word — lsb = w & -w, bit position from the f32 exponent
        # (exact: lsb is a power of two). All K rounds then touch only the
        # (XY, nwords) packed array, ~Z/32 smaller than the dense field
        # (the previous iterated-argmin formulation re-scanned all
        # XY*(Z-1) cells per round: ~100 ms of the 512-cube frame).
        #
        # per-column candidate budget: the occupied band is ~2*trunc/voxel
        # cells per surface crossing; budget two crossings + margin
        K = min(64, 4 + 4 * max(1, int(np.ceil(config.trunc_dist
                                               / config.voxel_size[2]))))
        cz = Z - 1
        nwords = (cz + 31) // 32
        rows = occ.reshape(-1, cz)  # (XY, Z-1), z minor
        bits = jnp.pad(rows, ((0, 0), (0, nwords * 32 - cz)))
        bits = bits.reshape(-1, nwords, 32)
        pow2 = jnp.left_shift(jnp.uint32(1),
                              jnp.arange(32, dtype=jnp.uint32))
        words = jnp.sum(bits.astype(jnp.uint32) * pow2[None, None, :],
                        axis=2, dtype=jnp.uint32)  # (XY, nwords)

        iota_w = jnp.arange(nwords, dtype=jnp.int32)
        cand = []
        for _ in range(K):
            nz = words != jnp.uint32(0)
            widx = jnp.min(jnp.where(nz, iota_w[None, :], jnp.int32(nwords)),
                           axis=1)  # first nonzero word per column
            oh = iota_w[None, :] == widx[:, None]
            w = jnp.sum(jnp.where(oh, words, jnp.uint32(0)), axis=1,
                        dtype=jnp.uint32)
            lsb = w & (jnp.uint32(0) - w)
            # bit position from the f32 exponent (exact for powers of two;
            # lsb == 0 gives e = -127, masked below)
            e = (jax.lax.bitcast_convert_type(lsb.astype(jnp.float32),
                                              jnp.int32) >> 23) - 127
            z = widx * 32 + e
            cand.append(jnp.where(lsb != jnp.uint32(0), z, jnp.int32(cz)))
            words = jnp.where(oh, words ^ lsb[:, None], words)
        cand = jnp.stack(cand, axis=1)  # (XY, K) ascending z or cz sentinel
        cand_valid = cand < cz
        # cells beyond the per-column budget remain as set bits; they are
        # counted into n_dropped via n_occ_total - n_captured below.

        # third level: restrict to ACTIVE columns (a surface crosses only a
        # fraction of them) so the final nonzero runs over max_cols*K
        # candidates instead of XY*K
        n_cols = cand.shape[0]
        max_cols = min(n_cols, max(max_voxels // 2, 1 << 15))
        col_active = cand_valid[:, 0]
        col_idx = jnp.nonzero(col_active, size=max_cols, fill_value=n_cols)[0]
        col_ok = col_idx < n_cols
        safe_col = jnp.minimum(col_idx, n_cols - 1)
        cand_a = cand[safe_col]  # (max_cols, K) coherent row gather
        valid_a = cand_valid[safe_col] & col_ok[:, None]
        row_base = (safe_col.astype(jnp.int32) * cz)[:, None]
        cand_idx = jnp.where(valid_a, row_base + cand_a, n_cells).reshape(-1)
        slot = jnp.nonzero(valid_a.reshape(-1), size=max_voxels,
                           fill_value=cand_idx.shape[0])[0]
        cand_pad = jnp.concatenate(
            [cand_idx, jnp.full((1,), n_cells, jnp.int32)])
        vox_idx = cand_pad[jnp.minimum(slot, cand_idx.shape[0])]
    vox_valid = vox_idx < n_cells
    # any capacity overflow (per-column K, active-column cap, max_voxels)
    # surfaces here as occupied-but-unprocessed cells
    n_dropped = n_occ_total - jnp.sum(vox_valid.astype(jnp.int32))

    # --- pass 2: triangle generation per occupied voxel ---------------------
    # decode flat cell id -> (x, y, z); flat order is x-major C order over
    # (X-1, Y-1, Z-1) with z fastest.
    cy = (Y - 1)
    cz = (Z - 1)
    vx = vox_idx // (cy * cz)
    rem = vox_idx - vx * (cy * cz)
    vy = rem // cz
    vz = rem - vy * cz
    vx = jnp.where(vox_valid, vx, 0)
    vy = jnp.where(vox_valid, vy, 0)
    vz = jnp.where(vox_valid, vz, 0)

    # gather 8 corner tsdf values: (max_voxels, 8)
    fvals = jnp.stack(
        [F[vx + int(offs[i, 0]), vy + int(offs[i, 1]), vz + int(offs[i, 2])]
         for i in range(8)],
        axis=-1,
    )
    cubeidx = jnp.where(vox_valid, cube.reshape(-1)[jnp.minimum(vox_idx, n_cells - 1)], 0)

    # both LUTs in ONE one-hot matmul over the compacted set: columns =
    # [num_verts | tri rows] (a (256, 17) table)
    lut = jnp.concatenate(
        [nv_tab[:, None].astype(jnp.float32), tri_tab.astype(jnp.float32)], axis=1
    )
    oh = (cubeidx[:, None] == jnp.arange(256, dtype=jnp.int32)[None, :]).astype(
        jnp.float32
    )
    lut_rows = jnp.matmul(
        oh.astype(jnp.bfloat16), lut.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # exact: one-hot 0/1 and LUT ints in [-1, 15] are bf16-representable
    occ_nverts = jnp.where(vox_valid, lut_rows[:, 0].astype(jnp.int32), 0)
    v_offsets = jnp.cumsum(occ_nverts) - occ_nverts  # exclusive scan
    total_verts = jnp.minimum(v_offsets[-1] + occ_nverts[-1], max_verts)

    # voxel-center corner positions: (max_voxels, 8, 3)
    base = jnp.stack([vx, vy, vz], axis=-1).astype(jnp.float32)  # (M, 3)
    corner_pos = (base[:, None, :] + offs[None, :, :] + 0.5) * vs[None, None, :]

    # 12 edge-interpolated vertices: (max_voxels, 12, 3)
    ec = tables.EDGE_CORNERS
    p0 = corner_pos[:, ec[:, 0], :]
    p1 = corner_pos[:, ec[:, 1], :]
    f0 = fvals[:, ec[:, 0]]
    f1 = fvals[:, ec[:, 1]]
    t = (0.0 - f0) / (f1 - f0 + 1e-15)
    vertlist = p0 + t[..., None] * (p1 - p0)  # (M, 12, 3)

    # LUT rows: (max_voxels, 15) edge ids (-1 padding) from the fused lookup
    rows = lut_rows[:, 1:16].astype(jnp.int32)  # (M, 15)
    emit = (rows >= 0) & vox_valid[:, None]
    # per-slot edge select as a masked sum over the 12 edges (gather-free;
    # unrolled VPU adds — a tiny-inner-dim einsum lowers poorly on TPU)
    verts = jnp.zeros(rows.shape + (3,), jnp.float32)
    for e in range(12):
        verts = verts + jnp.where(
            (rows == e)[..., None], vertlist[:, None, e, :], 0.0
        )

    # scatter into the output stream at v_offsets + slot
    slot = jnp.arange(15, dtype=jnp.int32)[None, :]
    tgt = jnp.where(emit, v_offsets[:, None] + slot, max_verts)
    out = jnp.zeros((max_verts + 1, 3), jnp.float32)
    out = out.at[tgt.reshape(-1)].set(verts.reshape(-1, 3), mode="drop")
    return out[:max_verts], total_verts.astype(jnp.int32), n_dropped


def mesh_to_world(vertices: jnp.ndarray, vol: TsdfVolume) -> jnp.ndarray:
    """Volume-frame triangle vertices -> world frame using the volume pose.

    (The reference keeps MC output in volume frame and lets the app export it
    directly; DynFusion consumes it in volume frame too. World-frame export
    is provided for the rigid pipeline's convertToMesh, kinfu.cpp:237-259.)
    """
    return jnp.matmul(
        vertices, vol.pose_r.T, precision=jax.lax.Precision.HIGHEST
    ) + vol.pose_t
