"""Gauss-Newton solver for the non-rigid warp-field energy.

Replaces the reference's external Opt/Terra toolchain (energy declared in
include/dynfu/utils/terra/energy.t, driven through CombinedSolver in
src/dynfu/utils/opt_solver.cpp). The energy is small and fixed, so instead of
a JIT-compiled DSL we assemble the normal equations directly and solve them
with Jacobi-preconditioned CG — the same GN+PCG structure Opt generates —
entirely on device (the reference bounced robust weights through the CPU
every nonlinear iteration; opt_solver.cpp:135-140).

Energy (energy.t:47-55, 73-78), unknowns = per-node translations t (D, 3)
(rotations are declared upstream but appear in no term):

  data:  r_v = sqrt(tukey_v) * (live_v - canonical_v - sum_k w_vk t_{n_k})
  reg:   r_nj = w_reg * (t_j - t_n)    for each node n, neighbor j
  w_reg = sqrt(lambda / (D * KNN))                       (opt_solver.cpp:30)
  tukey_v = (1 - (|err_v|/tukeyOffset / psi_data)^2)^2 if < psi_data else 0
                                                        (opt_solver.cpp:204-231)

Solve flow replicates the Opt harness with earlyOut=true (the reference's
only mode, dyn_fusion.cpp:189 / opt tests): robust weights computed ONCE from
the incoming warp state, one full linear solve (the energy is linear in t,
so GN converges in a single step up to CG tolerance), then translations are
composed into the nodes (opt_solver.cpp:270-285).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from dynfu_tpu.core import dualquat as dq
from dynfu_tpu.warp import field as wfield

_hi = jax.lax.Precision.HIGHEST


class SolveStats(NamedTuple):
    initial_cost: jnp.ndarray
    final_cost: jnp.ndarray
    cg_iters: jnp.ndarray


def tukey_biweights(warped_canonical, live, tukey_offset: float, psi_data: float):
    """Tukey biweight per vertex from the current DQB residual
    (opt_solver.cpp:204-231)."""
    err = jnp.linalg.norm(live - warped_canonical, axis=-1) / tukey_offset
    w = (1.0 - (err / psi_data) ** 2) ** 2
    return jnp.where(err < psi_data, w, 0.0)


def huber_weights(wf: wfield.WarpField, reg_idx, psi_reg: float):
    """Huber weights on node-pair disagreement (opt_solver.cpp:233-268).

    Computed for API parity; the reference declares them in the energy file
    but never uses them in any term (energy.t:70,76). The reference also only
    keeps the LAST neighbor's weight per node (loop overwrite bug); we keep
    that reduction to match observable behavior.
    """
    n_pos = wf.pos[reg_idx]  # (D, K, 3)
    t1 = dq.dq_transform_point(wf.dqs[:, None, :], n_pos)
    t2 = dq.dq_transform_point(wf.dqs[reg_idx], n_pos)
    e = jnp.linalg.norm(t1 - t2, axis=-1)  # (D, K)
    w = jnp.where(jnp.abs(e) <= psi_reg, 1.0, psi_reg / jnp.maximum(jnp.abs(e), 1e-30))
    return w[:, -1]  # last-neighbor overwrite, as upstream


def _apply_data(t, data_idx, data_w):
    """M(t)_v = sum_k w_vk t_{n_k} : (N, 3)."""
    return jnp.sum(data_w[..., None] * t[data_idx], axis=-2)


def _apply_data_T(y, data_idx, data_w, D):
    """M^T(y)_n = sum_{v,k: n_k = n} w_vk y_v : (D, 3)."""
    contrib = data_w[..., None] * y[:, None, :]  # (N, K, 3)
    return jnp.zeros((D, 3), y.dtype).at[data_idx].add(contrib)


def _apply_reg_normal(t, reg_idx, reg_w2, edge_mask):
    """(L^T L t) with L the (masked) edge incidence r_nj = t_j - t_n, scaled
    by w_reg^2 (reg_w2)."""
    D = t.shape[0]
    e = (t[reg_idx] - t[:, None, :]) * edge_mask[..., None]  # (D, K, 3)
    grad_j = jnp.zeros((D, 3), t.dtype).at[reg_idx].add(e)
    grad_n = -jnp.sum(e, axis=1)
    return reg_w2 * (grad_j + grad_n)


def build_graphs(wf: wfield.WarpField, canonical_v, knn_k: int = wfield.KNN):
    """Data graph: each vertex + its K nearest nodes (opt_solver.cpp:56-72).
    Reg graph: each node + its K nearest nodes incl. itself
    (opt_solver.cpp:74-105; the KD query at a node's own position returns the
    node itself first, giving one always-zero residual per node)."""
    data_idx, _ = wfield.find_neighbors(wf, canonical_v, knn_k)
    reg_idx, _ = wfield.find_neighbors(wf, wf.pos, knn_k)
    return data_idx, reg_idx


def solve(
    wf: wfield.WarpField,
    canonical_v,
    live_v,
    vert_mask=None,
    *,
    tukey_offset: float = 4.652,
    psi_data: float = 0.01,
    lambda_reg: float = 200.0,
    psi_reg: float = 1e-4,
    linear_iter: int = 256,
    cg_tol: float = 1e-12,
    knn_k: int = wfield.KNN,
):
    """One warp solve: returns (updated WarpField, SolveStats).

    Equivalent to CombinedSolver::initializeProblemInstance + solveAll
    (earlyOut path) + copyResultToCPUFromFloat3.
    """
    canonical_v = jnp.asarray(canonical_v, jnp.float32)
    live_v = jnp.asarray(live_v, jnp.float32)
    N = canonical_v.shape[0]
    D = wf.capacity
    if vert_mask is None:
        vert_mask = jnp.ones((N,), bool)

    # --- graphs (CPU k-NN loops upstream; one MXU pass here) ---------------
    data_idx, _ = wfield.find_neighbors(wf, canonical_v, knn_k)
    reg_idx, _ = wfield.find_neighbors(wf, wf.pos, knn_k)

    # data weights at canonical vertices (energy.t:50-53)
    n_pos = wf.pos[data_idx]
    n_w = wf.w[data_idx]
    n_valid = wf.mask[data_idx]
    data_w = wfield.transformation_weights(n_pos, n_w, canonical_v[:, None, :])
    data_w = jnp.where(n_valid, data_w, 0.0)

    # robust data weights from the CURRENT warp state (once; earlyOut flow)
    warped, _ = wfield.warp_points_normals(wf, canonical_v, canonical_v)
    s2 = tukey_biweights(warped, live_v, tukey_offset, psi_data)  # tukey
    s2 = jnp.where(vert_mask, s2, 0.0)

    # per-term reg weight; D is the ACTIVE node count (opt_solver.cpp:22,30)
    D_active = jnp.maximum(wf.count.astype(jnp.float32), 1.0)
    reg_w2 = lambda_reg / (D_active * knn_k)  # w_reg^2

    # masked reg edges: both endpoints active, self-edges contribute zero
    # residual regardless (t_n - t_n) so they need no special casing.
    edge_mask = (wf.mask[:, None] & wf.mask[reg_idx]).astype(jnp.float32)

    delta = live_v - canonical_v  # energy data constant

    def A_op(t):
        """Normal-equations operator J^T J t (tukey enters as s^2)."""
        mt = _apply_data(t, data_idx, data_w)  # (N, 3)
        at = _apply_data_T(s2[:, None] * mt, data_idx, data_w, D)
        return at + _apply_reg_normal(t, reg_idx, reg_w2, edge_mask)

    b = _apply_data_T(s2[:, None] * delta, data_idx, data_w, D)

    # Jacobi preconditioner: diag(J^T J)
    diag_data = jnp.zeros((D,), jnp.float32).at[data_idx].add(
        s2[:, None] * data_w * data_w
    )
    self_edge = reg_idx == jnp.arange(D)[:, None]
    eff_edge = edge_mask * (1.0 - self_edge.astype(jnp.float32))
    in_deg = jnp.zeros((D,), jnp.float32).at[reg_idx].add(eff_edge)
    out_deg = jnp.sum(eff_edge, axis=1)
    diag = diag_data + reg_w2 * (in_deg + out_deg)
    inv_diag = jnp.where(diag > 0, 1.0 / jnp.maximum(diag, 1e-30), 0.0)

    # --- Jacobi-PCG on the normal equations (Opt's GN inner loop) ----------
    def precond(r):
        return inv_diag[:, None] * r

    t0 = jnp.zeros((D, 3), jnp.float32)
    r0 = b - A_op(t0)
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)

    def cond(state):
        _, r, _, _, rz, i = state
        return (i < linear_iter) & (rz > cg_tol)

    def body(state):
        t, r, z, p, rz, i = state
        ap = A_op(p)
        denom = jnp.vdot(p, ap)
        alpha = jnp.where(denom > 0, rz / jnp.maximum(denom, 1e-30), 0.0)
        t = t + alpha * p
        r = r - alpha * ap
        z = precond(r)
        rz_new = jnp.vdot(r, z)
        beta = jnp.where(rz > 0, rz_new / jnp.maximum(rz, 1e-30), 0.0)
        p = z + beta * p
        return (t, r, z, p, rz_new, i + 1)

    t, r, _, _, rz, iters = jax.lax.while_loop(cond, body, (t0, r0, z0, p0, rz0, 0))

    # costs for reporting (reportFinalCosts analog)
    def cost(tt):
        rd = jnp.sqrt(s2)[:, None] * (delta - _apply_data(tt, data_idx, data_w))
        e = (tt[reg_idx] - tt[:, None, :]) * edge_mask[..., None]
        return jnp.sum(rd * rd) + reg_w2 * jnp.sum(e * e)

    stats = SolveStats(cost(t0), cost(t), iters)

    t = jnp.where(wf.mask[:, None], t, 0.0)
    return wfield.compose_translations(wf, t), stats
