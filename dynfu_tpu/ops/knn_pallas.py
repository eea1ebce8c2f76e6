"""Pallas TPU kernel: fused k-NN-vs-nodes + feature fetch in VMEM.

The engine's hottest recurring pattern is "for each of Q~262k vertices,
find the k nearest of D<=2048 warp-field nodes and fetch their state"
(warp, solver graph, unsupported mask, fusion-band DQB — four calls per
frame). The XLA formulation (ops/knn.knn_gather) materializes the (Q, D)
f32 distance matrix in HBM (~1 GB at 512-cube), re-reads it k times for
the iterative argmin, and builds k (Q, D) one-hot operands for the fetch
matmuls — ~10+ GB of HBM traffic per call, 20-30 ms each.

This kernel keeps everything on chip: each grid step loads a TQ-query
tile, computes its (TQ, D) distance block in VMEM (VPU broadcast sums, no
matmul — the K=3 contraction is the documented XLA tiling pathology),
runs the k argmin rounds in VMEM, and fetches features with (TQ, D) x
(D, F) one-hot matmuls whose operands never leave VMEM. HBM traffic
drops to the inputs/outputs (~100 MB): measured 27.8 -> ~3 ms for the
512-cube warp stage.

Semantics match ops/knn.knn_gather exactly: ascending distance, ties to
the lower index (nanoflann order), masked-out nodes never selected
(distance pushed to _FAR^2), invalid feature rows fetch zeros only if the
caller masks them (the engine gates on the fetched mask column).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e9  # masked/padded coordinate (d2 ~ 1e18, finite in f32)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _knn_kernel(q_ref, pts_ref, tab_ref, sqd_ref, idx_ref, feat_ref, *, k, fp):
    """Transposed layout: nodes on SUBLANES, queries on LANES — the min /
    argmin reductions then run along sublanes, keeping every lane
    independent (lane-axis reductions need cross-lane shuffles and were
    measured 6x slower)."""
    D = pts_ref.shape[0]
    qx, qy, qz = q_ref[0:1, :], q_ref[1:2, :], q_ref[2:3, :]  # (1, TQ)
    px, py, pz = pts_ref[:, 0:1], pts_ref[:, 1:2], pts_ref[:, 2:3]  # (D, 1)
    dx = px - qx
    dy = py - qy
    dz = pz - qz
    d2 = dx * dx + dy * dy + dz * dz  # (D, TQ) in VMEM

    rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    tabT = tab_ref[:]  # (fp, D)
    for r in range(k):
        m = jnp.min(d2, axis=0)  # (TQ,) sublane reduction
        am = jnp.argmin(d2, axis=0).astype(jnp.int32)  # ties -> lower index
        sqd_ref[r, :] = m
        idx_ref[r, :] = am
        oh = (rows == am[None, :]).astype(jnp.float32)  # (D, TQ)
        feat_ref[r * fp:(r + 1) * fp, :] = jnp.dot(
            tabT, oh, preferred_element_type=jnp.float32)
        # selected entries go to +inf — NOT _FAR^2 (1e18), which sits
        # BELOW a masked node's actual distance (~3e18): with fewer than
        # k valid nodes that would re-select valid nodes at full weight
        # where the XLA path returns weight-0 masked slots
        d2 = jnp.where(oh > 0, jnp.float32(jnp.inf), d2)


@functools.partial(jax.jit, static_argnames=("k", "tq", "interpret"))
def knn_gather_tpu(
    queries: jnp.ndarray,  # (Q, 3) f32
    points: jnp.ndarray,  # (D, 3) f32 node positions
    k: int,
    table: jnp.ndarray,  # (D, F) f32 per-node features to fetch
    point_mask: jnp.ndarray | None = None,  # (D,) bool
    tq: int = 512,
    interpret: bool = False,  # CPU-testable semantics (tests/test_knn.py)
):
    """(idx (Q,k) i32, sqd (Q,k) f32, feats (Q,k,F) f32) — drop-in for
    ops/knn.knn_gather, computed by the fused VMEM kernel."""
    Q, _ = queries.shape
    D, F = table.shape
    Dp = _round_up(max(D, 128), 128)
    Fp = _round_up(max(F, 8), 8)
    Qp = _round_up(max(Q, tq), tq)

    pts = points
    if point_mask is not None:
        pts = jnp.where(point_mask[:, None], points, _FAR)
    ptsP = jnp.full((Dp, 4), _FAR, jnp.float32).at[:D, :3].set(pts)
    tabT = jnp.zeros((Fp, Dp), jnp.float32).at[:F, :D].set(table.T)
    # queries transposed: (4, Qp), lanes = queries
    qT = jnp.full((4, Qp), 2.0 * _FAR, jnp.float32).at[:3, :Q].set(queries.T)

    grid = (Qp // tq,)
    sqd, idx, feats = pl.pallas_call(
        functools.partial(_knn_kernel, k=k, fp=Fp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, Dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k * Fp, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, Qp), jnp.float32),
            jax.ShapeDtypeStruct((k, Qp), jnp.int32),
            jax.ShapeDtypeStruct((k * Fp, Qp), jnp.float32),
        ],
        interpret=interpret,
    )(qT, ptsP, tabT)

    feats = feats[:, :Q].reshape(k, Fp, Q)[:, :F]  # (k, F, Q)
    feats = jnp.transpose(feats, (2, 0, 1))  # (Q, k, F)
    return idx[:, :Q].T, sqd[:, :Q].T, feats


def available() -> bool:
    """Pallas path is for real TPU execution; CPU tests keep the XLA
    formulation. Gated off by DYNFU_NO_PALLAS=1 (A/B benching) and inside
    multi-device traces (ops/pallas_config.no_pallas — GSPMD cannot
    partition a pallas_call)."""
    from dynfu_tpu.ops.pallas_config import pallas_enabled

    return pallas_enabled()
