"""Microbenchmark: SE(3) fusion solve decomposition at the 512-cube
workload (solve ≈ 124 ms of the 233 ms fusion frame — the largest stage).

Phases (each a jitted subgraph mirroring solver/se3.py):
  neighbor   fused k-NN + node-state fetch over the canonical (N, k=8)
  grams      monomial Gram assembly (gram_pallas or XLA) over N rows
  assemble   + data/reg normal-equation assembly to the (6D, 6D) system
  pcg        40 Jacobi-PCG iterations on a prebuilt system
  solve      the full se3.solve (relinearize from params preset)

Usage (TPU): /opt/venv/bin/python scripts/diag/ubench_se3.py [dims]
"""
import sys
import time

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.engine.dynfusion import DynFusion  # noqa: E402
from dynfu_tpu.engine.params import DynFuParams, KinFuParams  # noqa: E402
from dynfu_tpu.io.datasets import sphere_depth  # noqa: E402
from dynfu_tpu.solver import se3 as S  # noqa: E402
from dynfu_tpu.utils.timers import sync  # noqa: E402
from dynfu_tpu.warp import field as wfield  # noqa: E402

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 512
rows, cols = 480, 640
intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
caps = DynFuParams.caps_for_volume(dims, fusion=True)
params = DynFuParams(
    kinfu=KinFuParams(rows=rows, cols=cols, intr=intr,
                      volume_dims=(dims,) * 3),
    solver_rotations=True, **caps)
engine = DynFusion(params, mode="fusion")
cx, cy = cols / 2 - 0.5, rows / 2 - 0.5
for i in range(2):
    engine(sphere_depth((0.004 * i, 0.0, 1.5), 0.5, rows, cols,
                        525.0, 525.0, cx, cy))
wf = engine.warpfield
c = engine.canonical
cv = c.vertices
live = cv + jnp.asarray([0.004, 0.0, 0.0])
mask = c.mask
dp = engine.dynfu_params
D = wf.capacity
N = cv.shape[0]
print(f"D={D} N={N} relinearize={dp.se3_relinearize}", flush=True)


def clock(name, fn, iters=5):
    out = fn()
    sync(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(jax.tree_util.tree_leaves(out)[-1])
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms",
          flush=True)
    return out


nf = clock("neighbor ", jax.jit(
    lambda: wfield.neighbor_features(wf, cv, dp.knn)))
data_idx, n_sqd, n_pos, n_dq0, n_w, n_valid = nf


@jax.jit
def grams():
    w_raw = wfield.transformation_weights(n_pos, n_w, cv[:, None, :])
    w_raw = jnp.where(n_valid, w_raw, 0.0)
    data_w = w_raw / jnp.maximum(jnp.sum(w_raw, -1, keepdims=True), 1e-12)
    s2 = jnp.where(mask, 1.0, 0.0)
    delta = live - cv
    from dynfu_tpu.solver import gram_pallas

    if gram_pallas.available():
        return gram_pallas.monomial_grams_tpu(
            data_idx, data_w, s2, cv, delta, D)
    return S._monomial_grams(data_idx, data_w, s2, cv, delta, D)


B, Bu, Bw = clock("grams    ", grams)


@jax.jit
def assemble():
    B2, Bu2, Bw2 = grams()
    pos_c = jnp.where(wf.mask[:, None], wf.pos, 0.0)
    A_d, b_d = S._assemble_data(B2, Bu2, Bw2, pos_c, D)
    reg_idx, _ = wfield.find_neighbors(wf, wf.pos, dp.knn)
    edge_mask = (wf.mask[:, None] & wf.mask[reg_idx]).astype(jnp.float32)
    A_r, b_r, _ = S._assemble_reg(wf, reg_idx, edge_mask, 1.0, D)
    return (A_d + A_r).reshape(D * 6, D * 6), (b_d + b_r).reshape(D * 6)


A, b = clock("assemble ", assemble)
clock("pcg40    ", jax.jit(lambda: S._pcg(A, b, jnp.zeros_like(b), 40,
                                          1e-30)))
clock("solve    ", lambda: S.solve(
    wf, cv, live, vert_mask=mask, knn_k=dp.knn,
    relinearize=dp.se3_relinearize, incremental=True,
    rot_prior=dp.se3_rot_prior, max_update=dp.fusion_corr_dist))

# --- assembly sub-probes -------------------------------------------------
pos_c = jnp.where(wf.mask[:, None], wf.pos, 0.0)


@jax.jit
def blocks_only():
    B2, Bu2, Bw2 = grams()
    A_d, b_d = S._assemble_data(B2, Bu2, Bw2, pos_c, D)
    return b_d  # forces A too? no — return A_d slice to force it
    

@jax.jit
def data_only():
    B2, Bu2, Bw2 = grams()
    A_d, b_d = S._assemble_data(B2, Bu2, Bw2, pos_c, D)
    return A_d


@jax.jit
def reg_only():
    reg_idx, _ = wfield.find_neighbors(wf, wf.pos, dp.knn)
    edge_mask = (wf.mask[:, None] & wf.mask[reg_idx]).astype(jnp.float32)
    A_r, b_r, _ = S._assemble_reg(wf, reg_idx, edge_mask, 1.0, D)
    return A_r


clock("data_asm ", data_only)
clock("reg_asm  ", reg_only)

# --- differential: same fused output shape, one term at a time ----------
@jax.jit
def asm_data_fused():
    B2, Bu2, Bw2 = grams()
    A_d, b_d = S._assemble_data(B2, Bu2, Bw2, pos_c, D)
    return A_d.reshape(D * 6, D * 6)[:8, :8], b_d.reshape(-1)[:8]


@jax.jit
def asm_reg_fused():
    reg_idx, _ = wfield.find_neighbors(wf, wf.pos, dp.knn)
    edge_mask = (wf.mask[:, None] & wf.mask[reg_idx]).astype(jnp.float32)
    A_r, b_r, _ = S._assemble_reg(wf, reg_idx, edge_mask, 1.0, D)
    return A_r.reshape(D * 6, D * 6)[:8, :8], b_r.reshape(-1)[:8]


clock("data_fusd", asm_data_fused)
clock("reg_fusd ", asm_reg_fused)
