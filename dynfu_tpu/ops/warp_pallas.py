"""Pallas TPU kernel: fully-fused warp — k-NN vs nodes + blend + transform.

`ops/knn_pallas.knn_gather_tpu` already keeps the k-NN + feature fetch in
VMEM, but the warp path still pays for its (Q, k, F) feature OUTPUT in HBM
(~134 MB at the 512-cube workload), a relayout transpose of it, and the
8-step dual-quaternion blend as XLA elementwise passes over (Q, 8) arrays.
This kernel finishes the ENTIRE warp in VMEM: per query tile it runs the k
argmin rounds, fetches each round's node state as an (F, TQ) one-hot
matmul, accumulates the dual-quaternion blend IN REGISTER ROWS, and writes
only the final warped point, warped normal, blended DQ, and the
unsupported ratio — ~20 MB of output instead of ~270 MB of intermediates.

Two blend semantics, selected statically:

* "dqb" — the reference's sequential product of dual-part-weight-scaled
  DQs in nearest-first order, real-only normalization, and its
  transform-the-normal-with-translation quirk (warp_field.cpp:127-171);
  bit-compatible with wfield.warp_points_normals.
* "dlb" — proper Kavan blending: normalized weights, sign-aligned linear
  combination, joint normalization, rotation-only normal transform;
  bit-compatible with wfield.warp_points_normals_dlb.

The unsupported ratio min_k(dist_k / dg_w_k) falls out of the same rounds
(warp_field.cpp:34-61) — callers get warp + unsupported-mask for one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 1e9


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _qmul(a, b):
    """Quaternion product on (4, TQ) row stacks."""
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qconj(a):
    aw, ax, ay, az = a
    return (aw, -ax, -ay, -az)


def _warp_kernel(q_ref, n_ref, pts_ref, tab_ref, out_ref, *, k, blend):
    """Nodes on SUBLANES, queries on LANES (fast sublane reductions).

    tab rows: 0-2 node pos, 3-10 node dq, 11 dg_w, 12 mask.
    out rows: 0-2 warped point, 3-5 warped normal, 6 unsupported ratio,
    8-15 blended dq (16 rows padded to the f32 tile)."""
    qx, qy, qz = q_ref[0:1, :], q_ref[1:2, :], q_ref[2:3, :]  # (1, TQ)
    px, py, pz = pts_ref[:, 0:1], pts_ref[:, 1:2], pts_ref[:, 2:3]
    dx = px - qx
    dy = py - qy
    dz = pz - qz
    d2 = dx * dx + dy * dy + dz * dz  # (D, TQ)

    rows = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
    tabT = tab_ref[:]  # (16, D)
    TQ = q_ref.shape[1]

    if blend == "dqb":
        acc = [jnp.ones((1, TQ), jnp.float32)] + [
            jnp.zeros((1, TQ), jnp.float32) for _ in range(7)]
    else:
        acc = [jnp.zeros((1, TQ), jnp.float32) for _ in range(8)]
        ref_real = None
        wsum = jnp.zeros((1, TQ), jnp.float32)
    ratio = jnp.full((1, TQ), jnp.float32(jnp.inf))

    for r in range(k):
        m = jnp.min(d2, axis=0)[None, :]  # (1, TQ)
        am = jnp.argmin(d2, axis=0).astype(jnp.int32)
        oh = (rows == am[None, :]).astype(jnp.float32)  # (D, TQ)
        feat = jnp.dot(tabT, oh, preferred_element_type=jnp.float32)
        # rows: 0-2 pos, 3-10 dq, 11 dg_w, 12 mask
        valid = feat[12:13, :] > 0.5
        dg_w = jnp.maximum(feat[11:12, :], 1e-12)
        n_dq = [feat[3 + c:4 + c, :] for c in range(8)]
        w = jnp.exp(-m / (2.0 * dg_w * dg_w))
        ratio = jnp.minimum(ratio,
                            jnp.where(valid, jnp.sqrt(m) / dg_w, jnp.inf))
        if blend == "dqb":
            # dual-only scale, identity for invalid, sequential product
            sc = [jnp.where(valid, n_dq[c], (1.0 if c == 0 else 0.0))
                  for c in range(4)]
            sc += [jnp.where(valid, n_dq[4 + c] * w, 0.0) for c in range(4)]
            real = _qmul(acc[:4], sc[:4])
            dual = tuple(a + b for a, b in zip(
                _qmul(acc[:4], sc[4:]), _qmul(acc[4:], sc[:4])))
            acc = list(real) + list(dual)
        else:
            wn = jnp.where(valid, w, 0.0)
            if ref_real is None:
                ref_real = [n_dq[c] for c in range(4)]  # nearest neighbor
            dot = sum(n_dq[c] * ref_real[c] for c in range(4))
            sign = jnp.where(dot < 0.0, -1.0, 1.0)
            acc = [a + wn * sign * n_dq[c] for c, a in enumerate(acc)]
            wsum = wsum + wn
        # selected entries go to +inf — NOT _FAR^2 (1e18), which sits
        # BELOW a masked node's actual distance (~3e18): with fewer than
        # k valid nodes that would re-select valid nodes at full weight
        # where the XLA path returns weight-0 masked slots
        d2 = jnp.where(oh > 0, jnp.float32(jnp.inf), d2)

    if blend == "dqb":
        # real-only normalization (reference quirk)
        mag = jnp.sqrt(sum(acc[c] * acc[c] for c in range(4)))
        mag = jnp.maximum(mag, 1e-30)
        real = tuple(acc[c] / mag for c in range(4))
        dual = tuple(acc[4 + c] for c in range(4))
    else:
        # identity where no support, joint normalization
        supported = wsum > 1e-12
        acc[0] = jnp.where(supported, acc[0], 1.0)
        acc = [jnp.where(supported, a, 0.0) if c else a
               for c, a in enumerate(acc)]
        mag = jnp.sqrt(jnp.maximum(
            sum(acc[c] * acc[c] for c in range(4)), 1e-30))
        real = tuple(acc[c] / mag for c in range(4))
        dual = tuple(acc[4 + c] / mag for c in range(4))

    # translation = 2 * dual * conj(real), vector part
    tq4 = _qmul(tuple(2.0 * d for d in dual), _qconj(real))
    tx, ty, tz = tq4[1], tq4[2], tq4[3]

    def rotate(vx, vy, vz):
        p4 = (jnp.zeros_like(vx), vx, vy, vz)
        o = _qmul(_qmul(real, p4), _qconj(real))
        return o[1], o[2], o[3]

    rx, ry, rz = rotate(qx, qy, qz)
    out_ref[0:1, :] = rx + tx
    out_ref[1:2, :] = ry + ty
    out_ref[2:3, :] = rz + tz

    nx, ny, nz = n_ref[0:1, :], n_ref[1:2, :], n_ref[2:3, :]
    nrx, nry, nrz = rotate(nx, ny, nz)
    if blend == "dqb":
        # reference quirk: "normals" get the FULL transform
        out_ref[3:4, :] = nrx + tx
        out_ref[4:5, :] = nry + ty
        out_ref[5:6, :] = nrz + tz
    else:
        out_ref[3:4, :] = nrx
        out_ref[4:5, :] = nry
        out_ref[5:6, :] = nrz
    out_ref[6:7, :] = ratio
    out_ref[7:8, :] = jnp.zeros_like(ratio)
    for c in range(4):
        out_ref[8 + c:9 + c, :] = real[c]
        out_ref[12 + c:13 + c, :] = dual[c]


@functools.partial(jax.jit, static_argnames=("k", "blend", "tq", "interpret"))
def warp_fused_tpu(
    queries: jnp.ndarray,  # (Q, 3) f32 points to warp
    normals: jnp.ndarray,  # (Q, 3) f32
    node_pos: jnp.ndarray,  # (D, 3)
    node_dqs: jnp.ndarray,  # (D, 8)
    node_w: jnp.ndarray,  # (D,)
    node_mask: jnp.ndarray,  # (D,) bool
    k: int = 8,
    blend: str = "dqb",
    tq: int = 1024,
    interpret: bool = False,
):
    """(warped (Q,3), warped_normals (Q,3), blend_dq (Q,8), ratio (Q,))
    — the full warp of wfield.warp_points_normals[_dlb] plus the
    unsupported ratio, one kernel."""
    Q = queries.shape[0]
    D = node_pos.shape[0]
    Dp = _round_up(max(D, 128), 128)
    Qp = _round_up(max(Q, tq), tq)

    pts = jnp.where(node_mask[:, None], node_pos, _FAR)
    ptsP = jnp.full((Dp, 4), _FAR, jnp.float32).at[:D, :3].set(pts)
    tab = jnp.concatenate(
        [node_pos, node_dqs, node_w[:, None],
         node_mask[:, None].astype(jnp.float32)], axis=1)  # (D, 13)
    tabT = jnp.zeros((16, Dp), jnp.float32).at[:13, :D].set(tab.T)
    qT = jnp.full((4, Qp), 2.0 * _FAR, jnp.float32).at[:3, :Q].set(queries.T)
    nT = jnp.zeros((4, Qp), jnp.float32).at[:3, :Q].set(normals.T)

    grid = (Qp // tq,)
    out = pl.pallas_call(
        functools.partial(_warp_kernel, k=k, blend=blend),
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tq), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Dp, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, Dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((16, tq), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((16, Qp), jnp.float32)],
        interpret=interpret,
    )(qT, nT, ptsP, tabT)[0]

    warped = out[0:3, :Q].T
    wnorm = out[3:6, :Q].T
    ratio = out[6, :Q]
    bdq = out[8:16, :Q].T
    return warped, wnorm, bdq, ratio


def available() -> bool:
    """Pallas path is for real TPU execution; CPU tests keep the XLA
    formulation. Gated off by DYNFU_NO_PALLAS=1 (A/B benching) and inside
    multi-device traces (ops/pallas_config.no_pallas — GSPMD cannot
    partition a pallas_call)."""
    from dynfu_tpu.ops.pallas_config import pallas_enabled

    return pallas_enabled()
