"""The warp field: deformation nodes + dual-quaternion blending (DQB).

TPU re-design of the reference's Warpfield/Node classes
(include/dynfu/warp_field.hpp, src/dynfu/warp_field.cpp,
src/dynfu/utils/node.cpp): the node set is a fixed-capacity, mask-padded
struct-of-arrays pytree; every per-vertex CPU loop of the reference
(warpToLive, getUnsupportedVertices, calcDQB) becomes one fused, batched
jitted computation.

Semantics replicated exactly (the solver parity tests depend on them):

* DQB is the *sequential product* of weight-scaled node DQs in nearest-first
  order, normalized on the real part only (warp_field.cpp:127-148). For the
  identity-rotation regime this equals the weighted translation sum used by
  the energy (energy.t:47-55).
* transformation weight w(v) = exp(-|v - dg_v|^2 / (2 dg_w^2)) (node.cpp:29-36).
* unsupported vertex: min_k (dist_k / dg_w_k) >= 1 (warp_field.cpp:34-61).
* node insertion: voxel-grid (5 cm leaf, centroid) downsample of unsupported
  vertices; new node gets dg_se3 = DQB(position), dg_w = 2*epsilon
  (warp_field.cpp:63-95).
* node update composes NEW on the LEFT: dg_se3 <- new * old (node.cpp:19-23).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dynfu_tpu.core import dualquat as dq
from dynfu_tpu.ops import knn

KNN = 8  # warp_field.hpp:27


class WarpField(NamedTuple):
    """Fixed-capacity node set. Active nodes are [0, count); mask is per-slot."""

    pos: jnp.ndarray  # (D, 3) dg_v
    dqs: jnp.ndarray  # (D, 8) dg_se3
    w: jnp.ndarray  # (D,)  dg_w radial basis weight
    mask: jnp.ndarray  # (D,)  bool, active slots
    count: jnp.ndarray  # ()    int32 active count

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


def init_warpfield(positions, dqs=None, weights=None, capacity: int | None = None) -> WarpField:
    positions = jnp.asarray(positions, jnp.float32)
    n = positions.shape[0]
    capacity = capacity or n
    if dqs is None:
        dqs = jnp.tile(dq.dq_identity(), (n, 1))
    else:
        dqs = jnp.asarray(dqs, jnp.float32)
    if weights is None:
        weights = jnp.ones((n,), jnp.float32)
    else:
        weights = jnp.broadcast_to(jnp.asarray(weights, jnp.float32), (n,))

    pad = capacity - n
    pos = jnp.pad(positions, ((0, pad), (0, 0)))
    dqs = jnp.concatenate([dqs, jnp.tile(dq.dq_identity(), (pad, 1))], axis=0)
    w = jnp.pad(weights, (0, pad), constant_values=1.0)
    mask = jnp.arange(capacity) < n
    return WarpField(pos, dqs, w, mask, jnp.int32(n))


def transformation_weights(node_pos, node_w, points):
    """w(v) = exp(-|v - dg_v|^2 / (2 dg_w^2)) — node.cpp:29-36.

    node_pos (..., 3), node_w (...,), points (..., 3) broadcast together.
    """
    d2 = jnp.sum((points - node_pos) ** 2, axis=-1)
    return jnp.exp(-d2 / (2.0 * node_w * node_w))


@functools.partial(jax.jit, static_argnames=("k",))
def find_neighbors(wf: WarpField, points, k: int = KNN):
    """k-NN node indices (Q, k) + sqdists, nearest first (replaces nanoflann)."""
    return knn.knn_brute(points, wf.pos, k, wf.mask)


@functools.partial(jax.jit, static_argnames=("k",))
def neighbor_features(wf: WarpField, points, k: int = KNN):
    """Fused k-NN + node-state fetch, entirely gather-free (MXU one-hot).

    Returns (idx (Q,k), sqd (Q,k), n_pos (Q,k,3), n_dq (Q,k,8), n_w (Q,k),
    n_valid (Q,k)). This replaces the nanoflann query + per-neighbor struct
    reads of the reference (warp_field.cpp:99-122) — element gathers are the
    one operation this TPU does slowly, so the fetch rides the MXU instead.

    On TPU the whole pass runs as one Pallas kernel (ops/knn_pallas.py)
    that keeps the (Q, D) distance block in VMEM — the XLA formulation
    round-trips it through HBM k+1 times. Same selection semantics
    (ascending, ties to lower index); CPU keeps the XLA path.
    """
    points = jnp.asarray(points, jnp.float32)
    table = jnp.concatenate(
        [wf.pos, wf.dqs, wf.w[:, None], wf.mask[:, None].astype(jnp.float32)],
        axis=1,
    )  # (D, 13)
    from dynfu_tpu.ops import knn_pallas

    if knn_pallas.available() and points.ndim == 2:
        idx, sqd, feats = knn_pallas.knn_gather_tpu(
            points, wf.pos, k, table, wf.mask)
    else:
        idx, sqd, feats = knn.knn_gather(points, wf.pos, k, table, wf.mask)
    return (
        idx,
        sqd,
        feats[..., 0:3],
        feats[..., 3:11],
        feats[..., 11],
        feats[..., 12] > 0.5,
    )


def _dqb_from_features(points, n_pos, n_dq, n_w, n_valid) -> jnp.ndarray:
    """DQB given prefetched neighbor state (nearest-first order)."""
    k = n_w.shape[-1]
    weights = transformation_weights(n_pos, n_w, points[..., None, :])  # (Q, k)
    scaled = dq.dq_scale(n_dq, weights)
    # invalid slots multiply by identity (nanoflann would return n<k results)
    scaled = jnp.where(n_valid[..., None], scaled, dq.dq_identity())
    acc = jnp.broadcast_to(dq.dq_identity(), points.shape[:-1] + (8,))
    for i in range(k):  # k == 8, unrolled; each step is a batched quat product
        acc = dq.dq_mul(acc, scaled[..., i, :])
    return dq.dq_normalize(acc)


def _dlb_from_features(points, n_pos, n_dq, n_w, n_valid) -> jnp.ndarray:
    """PROPER dual-quaternion linear blending (Kavan et al.) given
    prefetched neighbor state: normalized weights, sign-aligned linear
    combination of the full dual quaternions, joint normalization.

    The reference's sequential-product DQB (calc_dqb below) cannot blend
    rotations at all — its dq_scale scales only the DUAL part, so node
    rotations would enter the product unweighted. The reference never hit
    this (its solver is translations-only); the SE(3) solver path
    (solver/se3.py) warps through THIS blend instead."""
    w = transformation_weights(n_pos, n_w, points[..., None, :])
    w = jnp.where(n_valid, w, 0.0)
    wsum = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(wsum, 1e-12)
    # antipodal alignment to the nearest (first) neighbor's real part
    ref = n_dq[..., 0:1, :4]
    dots = jnp.sum(n_dq[..., :4] * ref, axis=-1, keepdims=True)
    sign = jnp.where(dots < 0.0, -1.0, 1.0)
    acc = jnp.sum(wn[..., None] * n_dq * sign, axis=-2)
    ident = jnp.broadcast_to(dq.dq_identity(), acc.shape)
    acc = jnp.where(wsum > 1e-12, acc, ident)
    return dq.dq_normalize_joint(acc)


@jax.jit
def warp_points_normals_dlb(wf: WarpField, points, normals):
    """warpToLive through the PROPER DLB blend: points get the full rigid
    transform, normals get the blended ROTATION only (no reference
    quirks). The warp path for SE(3) solver state.

    On TPU the whole warp runs as ONE Pallas kernel (ops/warp_pallas.py):
    k-NN rounds, blend accumulation, and the point/normal transform never
    leave VMEM."""
    from dynfu_tpu.ops import warp_pallas

    points = jnp.asarray(points, jnp.float32)
    if warp_pallas.available() and points.ndim == 2:
        wp, wn, _, _ = warp_pallas.warp_fused_tpu(
            points, jnp.asarray(normals, jnp.float32), wf.pos, wf.dqs,
            wf.w, wf.mask, k=KNN, blend="dlb")
        return wp, wn
    _, _, n_pos, n_dq, n_w, n_valid = neighbor_features(wf, points)
    blend = _dlb_from_features(points, n_pos, n_dq, n_w, n_valid)
    return (dq.dq_transform_point(blend, points),
            dq.dq_rotate_vector(blend, normals))


def calc_dqb(wf: WarpField, points, neighbor_idx=None) -> jnp.ndarray:
    """Blend node transforms at query points: (Q, 8) dual quaternions.

    Reference (warp_field.cpp:127-148): start from the identity DQ, multiply
    by each neighbor's dq scaled (dual-only) by its transformation weight, in
    nearest-first order, then normalize the real part.
    """
    points = jnp.asarray(points, jnp.float32)
    if neighbor_idx is not None:
        # explicit-graph variant (small Q): direct indexed fetch
        n_pos = wf.pos[neighbor_idx]
        n_dq = wf.dqs[neighbor_idx]
        n_w = wf.w[neighbor_idx]
        n_valid = wf.mask[neighbor_idx]
    else:
        _, _, n_pos, n_dq, n_w, n_valid = neighbor_features(wf, points)
    return _dqb_from_features(points, n_pos, n_dq, n_w, n_valid)


@jax.jit
def warp_points_normals(wf: WarpField, points, normals) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """warpToLive: per-point DQB then transform (warp_field.cpp:150-171).

    Note the reference quirk: normals get transformVertex's full transform
    (translation included) because DualQuaternion::transformNormal is
    identical to transformVertex.

    On TPU the whole warp runs as ONE Pallas kernel (ops/warp_pallas.py):
    k-NN rounds, the sequential DQB product, and the transforms never
    leave VMEM (the split formulation pays ~270 MB of k-NN feature
    intermediates in HBM at the 512-cube workload)."""
    from dynfu_tpu.ops import warp_pallas

    points = jnp.asarray(points, jnp.float32)
    if warp_pallas.available() and points.ndim == 2:
        wp, wn, _, _ = warp_pallas.warp_fused_tpu(
            points, jnp.asarray(normals, jnp.float32), wf.pos, wf.dqs,
            wf.w, wf.mask, k=KNN, blend="dqb")
        return wp, wn
    blend = calc_dqb(wf, points)
    return dq.dq_transform_point(blend, points), dq.dq_transform_normal(blend, normals)


@jax.jit
def unsupported_mask(wf: WarpField, points, point_mask=None) -> jnp.ndarray:
    """True where min over 8-NN of dist/dg_w >= 1 (warp_field.cpp:34-61).

    On TPU the ratio falls out of the fused warp kernel's k-NN rounds
    (ops/warp_pallas.py) without the (Q, k, F) feature intermediates."""
    from dynfu_tpu.ops import warp_pallas

    points = jnp.asarray(points, jnp.float32)
    if warp_pallas.available() and points.ndim == 2:
        _, _, _, ratio = warp_pallas.warp_fused_tpu(
            points, jnp.zeros_like(points), wf.pos, wf.dqs, wf.w, wf.mask,
            k=KNN, blend="dqb")
        unsupported = ratio >= 1.0
    else:
        _, sqd, _, _, n_w, valid = neighbor_features(wf, points)
        ratio = jnp.sqrt(sqd) / n_w
        ratio = jnp.where(valid, ratio, jnp.inf)
        unsupported = jnp.min(ratio, axis=-1) >= 1.0
    if point_mask is not None:
        unsupported = unsupported & point_mask
    return unsupported


def voxel_downsample(points, point_mask, leaf: float, capacity: int,
                     weights=None):
    """Voxel-grid centroid downsample (PCL VoxelGrid analog, warp_field.cpp:67-71).

    Returns (centroids (capacity, 3), mask (capacity,)). Cells are hashed into
    a fixed table; centroids are emitted sorted by linear cell id (PCL's leaf
    ordering). Static-shape replacement for the reference's dynamic filter.

    `weights` (point multiplicities) makes centroids over a DEDUPLICATED
    point set exactly equal to the centroids over the original multiset
    (the engine dedups the canonical soup; see DynFusion._dedup_canonical).
    """
    points = jnp.asarray(points, jnp.float32)
    point_mask = jnp.asarray(point_mask, bool)
    wgt = (jnp.ones(points.shape[0], jnp.float32) if weights is None
           else jnp.asarray(weights, jnp.float32))
    # quantize; PCL uses floor(p / leaf)
    cell = jnp.floor(points / leaf).astype(jnp.int32)
    # linear id over a bounded lattice (shift into positive range)
    B = 1 << 10  # 1024 cells per axis is plenty for a 3 m volume at 5 cm
    cid = ((cell[:, 0] & (B - 1)) * B + (cell[:, 1] & (B - 1))) * B + (cell[:, 2] & (B - 1))
    cid = jnp.where(point_mask, cid, -1)

    # segment-reduce into a hash table of size H
    H = max(2 * capacity, 1024)
    slot = jnp.where(cid >= 0, cid % H, H)  # masked points -> overflow slot H
    w_eff = jnp.where(point_mask, wgt, 0.0)
    sums = jnp.zeros((H + 1, 3), jnp.float32).at[slot].add(
        w_eff[:, None] * points)
    cnts = jnp.zeros((H + 1,), jnp.float32).at[slot].add(w_eff)
    # representative cell id per slot (min, to sort deterministically)
    reps = jnp.full((H + 1,), jnp.iinfo(jnp.int32).max, jnp.int32).at[slot].min(
        jnp.where(cid >= 0, cid, jnp.iinfo(jnp.int32).max)
    )

    occupied = cnts[:H] > 0
    order = jnp.argsort(jnp.where(occupied, reps[:H], jnp.iinfo(jnp.int32).max))
    top = order[:capacity]
    cent = sums[top] / jnp.maximum(cnts[top, None], 1.0)
    out_mask = occupied[top]
    return jnp.where(out_mask[:, None], cent, 0.0), out_mask


def insert_nodes(
    wf: WarpField,
    new_pos,
    new_mask,
    dg_w: float,
    blend: str = "dqb",
) -> WarpField:
    """Masked append of new nodes with dg_se3 = blend(pos), dg_w given.

    Mirrors Warpfield::update's insertion loop (warp_field.cpp:76-83); the
    KD-tree rebuild is unnecessary here (brute-force k-NN has no index).
    blend="dlb" seeds new nodes through the proper Kavan blend (the SE(3)
    solver path); "dqb" keeps the reference's sequential-product quirk.
    """
    new_pos = jnp.asarray(new_pos, jnp.float32)
    n_new = new_pos.shape[0]
    if blend == "dlb":
        _, _, n_pos, n_dq, n_w, n_valid = neighbor_features(wf, new_pos)
        new_dq = _dlb_from_features(new_pos, n_pos, n_dq, n_w, n_valid)
    else:
        new_dq = calc_dqb(wf, new_pos)

    # target slots: count, count+1, ... for each masked-in new node
    offsets = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    slots = wf.count + offsets
    in_range = new_mask & (slots < wf.capacity)
    slots = jnp.where(in_range, slots, wf.capacity)  # out-of-range -> dropped

    pos = jnp.concatenate([wf.pos, jnp.zeros((1, 3), jnp.float32)], 0).at[slots].set(
        jnp.where(in_range[:, None], new_pos, 0.0)
    )[: wf.capacity]
    dqs = jnp.concatenate([wf.dqs, jnp.zeros((1, 8), jnp.float32)], 0).at[slots].set(
        jnp.where(in_range[:, None], new_dq, 0.0)
    )[: wf.capacity]
    w = jnp.concatenate([wf.w, jnp.zeros((1,), jnp.float32)], 0).at[slots].set(
        jnp.where(in_range, dg_w, 0.0)
    )[: wf.capacity]
    added = jnp.sum(in_range.astype(jnp.int32))
    count = wf.count + added
    mask = jnp.arange(wf.capacity) < count
    return WarpField(pos, dqs, w, mask, count)


def _unsupported_tiered(wf: WarpField, verts, vert_mask, cap: int):
    """unsupported_mask with a 1-NN prefilter (same decisions, ~1/8 the
    selection rounds over the full vertex set):

    * d1 < dg_w(n1): the nearest node certifies SUPPORT (it is in the
      8-NN and its ratio is < 1);
    * d1 >= max active dg_w: every node's ratio is >= d1/dgw_max >= 1
      (k-NN distances only grow), so UNSUPPORTED is certain;
    * the ambiguous shell between the two bounds (nearest node farther
      than its own dg_w but closer than the largest dg_w anywhere —
      typically a few hundred vertices at coverage boundaries) gets the
      exact 8-round ratio on a `cap`-compacted subset. Vertices past the
      cap stay 'supported' this frame and are re-examined next frame,
      the same graceful deferral as the downsample compaction cap."""
    n = verts.shape[0]
    idx1, sqd1, _, _, n_w1, n_valid1 = neighbor_features(wf, verts, 1)
    d1 = jnp.sqrt(sqd1[:, 0])
    ratio1 = jnp.where(n_valid1[:, 0], d1 / jnp.maximum(n_w1[:, 0], 1e-12),
                       jnp.inf)
    dgw_max = jnp.max(jnp.where(wf.mask, wf.w, 0.0))
    supported = ratio1 < 1.0
    unsup_sure = (d1 >= dgw_max) & vert_mask & ~supported
    ambiguous = vert_mask & ~supported & ~unsup_sure
    aidx = jnp.nonzero(ambiguous, size=cap, fill_value=n)[0]
    aok = aidx < n
    apts = jnp.where(aok[:, None], verts[jnp.minimum(aidx, n - 1)], 0.0)
    aunsup = unsupported_mask(wf, apts, aok)
    unsup = unsup_sure.at[jnp.where(aok, aidx, n)].set(aunsup, mode="drop")
    return unsup


@functools.partial(jax.jit,
                   static_argnames=("epsilon", "leaf", "max_new", "blend"))
def update_warpfield(wf: WarpField, verts, vert_mask, epsilon: float, leaf: float = 0.05,
                     max_new: int = 1024, blend: str = "dqb",
                     vert_weights=None, aabb=None) -> WarpField:
    """Warpfield::update (warp_field.cpp:63-95): find unsupported vertices,
    voxel-grid downsample them, insert as new nodes with dg_w = 2*epsilon.

    `vert_weights` carries soup multiplicities when `verts` is the
    deduplicated canonical — downsample centroids stay exactly
    soup-weighted.

    `aabb` = ((lo3), (hi3)) sanity-gates candidate positions: the engine's
    surface lives inside the TSDF volume, so an unsupported vertex OUTSIDE
    it is a vertex dragged away by a rogue warp, not new geometry —
    inserting a node there bakes the rogue warp into the field permanently
    (the 512-cube fusion cascade, scripts/diag/diag_fusion_band.py)."""
    unsup = _unsupported_tiered(wf, verts, vert_mask,
                                cap=min(verts.shape[0], 4 * max_new))
    if aabb is not None:
        lo, hi = (jnp.asarray(a, jnp.float32) for a in aabb)
        unsup = unsup & jnp.all((verts >= lo) & (verts <= hi), axis=-1)
    # compact the (sparse) unsupported set before the downsample: the hash
    # scatters in voxel_downsample cost one row per INPUT point (24.6 ms
    # over the full 262k vertex buffer at 512-cube) while the unsupported
    # set is typically a few hundred points. Candidates past the 4*max_new
    # compaction cap simply stay unsupported and are picked up next frame.
    n = verts.shape[0]
    cap = min(n, 4 * max_new)
    idx = jnp.nonzero(unsup, size=cap, fill_value=n)[0]
    ok = idx < n
    safe = jnp.minimum(idx, n - 1)
    cand_pts = jnp.where(ok[:, None], verts[safe], 0.0)
    cand_w = None if vert_weights is None else jnp.where(
        ok, vert_weights[safe], 0.0)
    cand, cand_mask = voxel_downsample(cand_pts, ok, leaf, max_new,
                                       weights=cand_w)
    return insert_nodes(wf, cand, cand_mask, 2.0 * epsilon, blend=blend)


@jax.jit
def compose_translations(wf: WarpField, translations) -> WarpField:
    """Apply solver output: dg_se3 <- DQ(t) * dg_se3 for each node.

    Mirrors copyResultToCPUFromFloat3 + Node::updateTransformation
    (opt_solver.cpp:270-285, node.cpp:19-23): translation-only update,
    composed on the LEFT.
    """
    t_dq = dq.dq_from_translation(jnp.asarray(translations, jnp.float32))
    new = dq.dq_mul(t_dq, wf.dqs)
    dqs = jnp.where(wf.mask[:, None], new, wf.dqs)
    return wf._replace(dqs=dqs)
