"""Pallas TPU kernel: windowed 1-NN + coordinate fetch for correspondence.

The engine's correspondence stage (live marching-cubes vertices vs warped
canonical vertices, ops/knn.nn1_gather_xwindow) is elementwise-distance
work over per-query-block windows. The XLA formulation materializes each
(block, W) distance matrix in HBM and re-reads it for min / argmin / the
one-hot fetch (~13 GB of d-matrix traffic at the 512-cube workload). This
kernel keeps the whole sweep on chip:

* the full TRANSPOSED point set (8, P) stays resident in VMEM (~8 MB at
  P=262k) — windows are dynamic lane slices, so the window start needs no
  block-aligned index map;
* each grid step processes one TQ-query tile against its window in
  SW-point sub-tiles: distances, running lane-min/argmin, and the
  winner's coordinate fetch (transposed-rhs one-hot dot) never leave VMEM;
* per-query-block window starts and the order-free exactness bounds
  (knn._window_bounds) arrive as scalar-prefetch arrays.

Semantics match knn._window_sweep with values=None: ties to the lowest
point index inside the window, BIG-masked points never selected, the
certificate releases `exact` only when the window provably contains the
global 1-NN. Fetched values are the CENTERED point coordinates (the
caller un-centers), like the XLA path.

Reference provenance: replaces the nanoflann 1-NN of findCorrespondingFrame
(src/dynfu/dyn_fusion.cpp:212-242).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e37


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _corr_kernel(lo_ref, pre_ref, suf_ref, qT_ref, psT_ref, vals_ref,
                 ex_ref, *, W, SW, TQ, FP):
    """FP = payload row count: 0 fetches the point coordinates (rows 0-7 of
    psT, the original contract); FP > 0 fetches psT rows 8..8+FP instead
    (arbitrary per-point payload — e.g. the solve's data-graph rows riding
    the correspondence, engine/dynfusion._nonrigid_frame)."""
    """Points on SUBLANES, queries on LANES (the same orientation as
    ops/knn_pallas: sublane reductions are the fast direction; measured
    6x over lane reductions). Window coordinates arrive as (1, SW) lane
    rows and are flipped to (SW, 1) columns by tiny one-hot matmuls on
    the MXU (cheaper than a VMEM relayout)."""
    i = pl.program_id(0)
    lo = pl.multiple_of(lo_ref[i], 128)
    qx = qT_ref[0:1, :]
    qy = qT_ref[1:2, :]
    qz = qT_ref[2:3, :]  # (1, TQ)
    rows = jax.lax.broadcasted_iota(jnp.int32, (SW, TQ), 0)
    f32 = jnp.float32
    # (8, 8) selectors: column c of pv^T via pv^T @ e_c, i.e.
    # dot_general(pv (8, SW), eye (8, 8), contract sublane-sublane)
    eye8 = (jax.lax.broadcasted_iota(jnp.int32, (8, 8), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (8, 8), 1)
            ).astype(jnp.bfloat16)
    dn_ss = (((0,), (0,)), ((), ()))

    def sub(s, carry):
        best_d, best_j, vals = carry
        off = lo + s * SW
        pv = psT_ref[0:8, pl.ds(off, SW)]  # (8, SW) f32 coords
        # transpose via MXU: (8, SW)^T @ (8, 8) -> (SW, 8); coords exact
        # in the bf16 hi/lo split
        p_hi = pv.astype(jnp.bfloat16)
        p_lo = (pv - p_hi.astype(f32)).astype(jnp.bfloat16)
        pvT = (jax.lax.dot_general(p_hi, eye8, dn_ss,
                                   preferred_element_type=f32)
               + jax.lax.dot_general(p_lo, eye8, dn_ss,
                                     preferred_element_type=f32))
        px = pvT[:, 0:1]  # (SW, 1)
        py = pvT[:, 1:2]
        pz = pvT[:, 2:3]
        valid = px < _BIG
        pxz = jnp.where(valid, px, 0.0)
        pyz = jnp.where(valid, py, 0.0)
        pzz = jnp.where(valid, pz, 0.0)
        dx = pxz - qx
        dy = pyz - qy
        dz = pzz - qz
        d = dx * dx + dy * dy + dz * dz  # (SW, TQ)
        d = jnp.where(valid, d, jnp.float32(jnp.inf))
        dmin = jnp.min(d, axis=0)  # (TQ,) sublane reduction
        jmin = jnp.min(jnp.where(d == dmin[None, :], rows, SW), axis=0)
        take = dmin < best_d  # strict: earlier sub-tiles win ties
        return (jnp.where(take, dmin, best_d),
                jnp.where(take, off + jmin, best_j), vals)

    FO = max(8, FP)
    best0 = jnp.full((TQ,), jnp.float32(jnp.inf))
    j0 = jnp.zeros((TQ,), jnp.int32)
    vals0 = jnp.zeros((FO, TQ), jnp.float32)
    best_d, best_j, _ = jax.lax.fori_loop(0, W // SW, sub,
                                          (best0, j0, vals0))

    # single fetch pass now that the global winner is known: one-hot per
    # sub-tile against best_j, standard (F, SW) @ (SW, TQ) matmul
    def fetch(s, vals):
        off = lo + s * SW
        oh = ((rows + off) == best_j[None, :]).astype(jnp.bfloat16)
        if FP:
            pv = psT_ref[8:8 + FP, pl.ds(off, SW)]
        else:
            pv = psT_ref[0:8, pl.ds(off, SW)]
        p_hi = pv.astype(jnp.bfloat16)
        p_lo = (pv - p_hi.astype(f32)).astype(jnp.bfloat16)
        v = jax.lax.dot_general(p_hi, oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=f32)
        v = v + jax.lax.dot_general(p_lo, oh, (((1,), (0,)), ((), ())),
                                    preferred_element_type=f32)
        return vals + v

    vals = jax.lax.fori_loop(0, W // SW, fetch, vals0)

    gap = jnp.minimum(qx[0, :] - pre_ref[i], suf_ref[i] - qx[0, :])
    gap = jnp.maximum(gap, 0.0)
    exact = (best_d <= gap * gap) & (qx[0, :] < _BIG)
    vals_ref[:] = vals
    ex_ref[:] = exact.astype(jnp.int32)[None, :]


@functools.partial(jax.jit,
                   static_argnames=("tq", "sw", "window", "interpret"))
def nn1_window_sweep_tpu(
    qs: jnp.ndarray,  # (Qp, 3) centered queries, BIG-masked invalid
    ps: jnp.ndarray,  # (Pp, 3) centered points, BIG-masked invalid
    lo_el: jnp.ndarray,  # (nqb,) int32 window start ELEMENT per query tile
    #                       (multiple of 128; nqb = Qp // tq)
    pre: jnp.ndarray,  # (nqb,) f32 max valid x among points left of window
    suf: jnp.ndarray,  # (nqb,) f32 min valid x among points right of window
    tq: int = 1024,
    sw: int = 512,
    window: int = 12288,
    interpret: bool = False,
    vals_payload: jnp.ndarray | None = None,  # (Pp, F) per-point payload
):
    """(vals (Qp, 3|F), exact (Qp,) bool): the window-1-NN's centered
    coordinates, or — with `vals_payload` — its payload row (fetched
    through the same hi/lo-split one-hot matmul; ints up to 2^16 and
    ~16-bit-relative floats survive exactly / faithfully).
    Drop-in for `_window_sweep` given precomputed window starts/bounds at
    the query-tile granularity. ps must arrive padded to a multiple of
    128 >= window (lo_el is clipped against that length)."""
    Qp, _ = qs.shape
    Pp = ps.shape[0]
    assert Qp % tq == 0 and window % sw == 0
    assert Pp % 128 == 0 and Pp >= window
    nqb = Qp // tq

    F = 0 if vals_payload is None else vals_payload.shape[1]
    FP = 0 if F == 0 else -(-F // 8) * 8
    FO = max(8, FP)
    qT = jnp.full((8, Qp), 2.0 * _BIG, jnp.float32).at[:3].set(qs.T)
    psT = jnp.full((8 + FP, Pp), 2.0 * _BIG, jnp.float32).at[:3].set(ps.T)
    if FP:
        psT = psT.at[8:8 + F].set(vals_payload.T)
        psT = psT.at[8 + F:8 + FP].set(0.0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nqb,),
        in_specs=[
            pl.BlockSpec((8, tq), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 + FP, Pp), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((FO, tq), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq), lambda i, *_: (0, i),
                         memory_space=pltpu.VMEM),
        ],
    )
    vals, ex = pl.pallas_call(
        functools.partial(_corr_kernel, W=window, SW=sw, TQ=tq, FP=FP),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((FO, Qp), jnp.float32),
            jax.ShapeDtypeStruct((1, Qp), jnp.int32),
        ],
        interpret=interpret,
    )(lo_el, pre, suf, qT, psT)
    if F:
        return vals[:F].T, ex[0] > 0
    return vals[:3].T, ex[0] > 0


def available() -> bool:
    """Pallas path is for real TPU execution; CPU tests keep the XLA
    formulation. Gated off by DYNFU_NO_PALLAS=1 (A/B benching) and inside
    multi-device traces (ops/pallas_config.no_pallas — GSPMD cannot
    partition a pallas_call)."""
    from dynfu_tpu.ops.pallas_config import pallas_enabled

    return pallas_enabled()
