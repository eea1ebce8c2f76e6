"""Microbenchmark: GN-solve + warp + insertion cost decomposition at the
512-cube workload (262k verts, 1024 nodes) on TPU.

Run: /opt/venv/bin/python scripts/ubench_solve.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dynfu_tpu.ops import knn  # noqa: E402
from dynfu_tpu.solver import gn  # noqa: E402
from dynfu_tpu.utils.timers import sync  # noqa: E402
from dynfu_tpu.warp import field as wfield  # noqa: E402

N = 1 << 18
D = 1024
ITERS = 10


def clock(name, fn, *args, iters=ITERS):
    out = fn(*args)
    leaf = min(jax.tree_util.tree_leaves(out),
               key=lambda x: getattr(x, "size", 1 << 62))
    sync(leaf)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = min(jax.tree_util.tree_leaves(out),
               key=lambda x: getattr(x, "size", 1 << 62))
    sync(leaf)
    print(f"{name:32s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    # surface-like vertex cloud: sphere + noise
    u = rng.normal(size=(N, 3))
    u /= np.linalg.norm(u, axis=1, keepdims=True)
    verts = jnp.asarray(1.5 + 0.5 * u + 0.002 * rng.normal(size=(N, 3)),
                        jnp.float32)
    live = verts + jnp.asarray(0.004 * rng.normal(size=(N, 3)), jnp.float32)
    npos = jnp.asarray(1.5 + 0.5 * (lambda v: v / np.linalg.norm(
        v, axis=1, keepdims=True))(rng.normal(size=(D, 3))), jnp.float32)
    wf = wfield.init_warpfield(npos, weights=0.06 * np.ones(D))
    mask = jnp.ones((N,), bool)

    clock("solve_full", lambda: gn.solve(
        wf, verts, live, vert_mask=mask, linear_iter=256,
        nonlinear_iter=16, num_iter=24, early_out=True))

    clock("neighbor_features_8nn", lambda: wfield.neighbor_features(wf, verts))
    clock("find_neighbors_8nn", lambda: wfield.find_neighbors(wf, verts))
    clock("warp_points_normals", lambda: wfield.warp_points_normals(
        wf, verts, verts))
    clock("unsupported_mask_8nn", lambda: wfield.unsupported_mask(
        wf, verts, mask))

    # fused min-ratio unsupported test: one pass, no top-k
    @jax.jit
    def unsupported_fused(wf, pts):
        d = knn.pairwise_sqdist(pts, wf.pos)
        r2 = d / jnp.maximum(wf.w * wf.w, 1e-30)[None, :]
        r2 = jnp.where(wf.mask[None, :], r2, jnp.inf)
        return jnp.min(r2, axis=1) >= 1.0

    clock("unsupported_fused_minratio", unsupported_fused, wf, verts)

    clock("voxel_downsample", lambda: wfield.voxel_downsample(
        verts, mask, 0.05, 512))

    # assembly probes
    data_idx, sqd = wfield.find_neighbors(wf, verts)
    data_w = jnp.exp(-sqd / (2 * 0.06 ** 2)).astype(jnp.float32)
    s2 = jnp.ones((N,), jnp.float32)
    delta = live - verts

    assemble = jax.jit(lambda: gn._dense_data_normal(
        verts, data_idx, data_w, s2, delta, D))
    clock("dense_data_normal_HIGHEST", assemble)

    import functools
    _mm_high = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGH)

    @jax.jit
    def assemble_high():
        chunk = 8192
        iota = jnp.arange(D, dtype=data_idx.dtype)

        def body(c, carry):
            A, b = carry
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * chunk, chunk, 0)
            idx_c, w_c, s2_c, d_c = sl(data_idx), sl(data_w), sl(s2), sl(delta)
            Wc = jnp.zeros((chunk, D), jnp.float32)
            for r in range(8):
                Wc = Wc + (idx_c[:, r, None] == iota[None, :]) * w_c[:, r, None]
            sW = s2_c[:, None] * Wc
            A = A + _mm_high(Wc.T, sW)
            b = b + _mm_high(sW.T, d_c)
            return A, b

        A0 = jnp.zeros((D, D), jnp.float32)
        b0 = jnp.zeros((D, 3), jnp.float32)
        return jax.lax.fori_loop(0, N // chunk, body, (A0, b0))

    A_hi, _ = clock("dense_data_normal_HIGH", assemble_high)
    A_ref, _ = assemble()
    err = float(jnp.max(jnp.abs(A_hi - A_ref)) / jnp.max(jnp.abs(A_ref)))
    print(f"  HIGH vs HIGHEST rel err: {err:.2e}")

    # PCG probe
    A = A_ref + 0.2 * jnp.eye(D)
    b = jnp.asarray(rng.normal(size=(D, 3)), jnp.float32)

    @jax.jit
    def run_pcg(A, b):
        # mirror gn.solve's pcg: warm-start zeros, 256 iters
        diag = jnp.diagonal(A)
        inv_diag = jnp.where(diag > 0, 1.0 / jnp.maximum(diag, 1e-30), 0.0)
        t = jnp.zeros((D, 3), jnp.float32)
        r = b
        z = inv_diag[:, None] * r
        p = z
        rz = jnp.vdot(r, z)

        def step(i, st):
            t, r, z, p, rz = st
            ap = jnp.matmul(A, p, precision=jax.lax.Precision.HIGHEST)
            alpha = rz / jnp.maximum(jnp.vdot(p, ap), 1e-30)
            t = t + alpha * p
            r = r - alpha * ap
            z = inv_diag[:, None] * r
            rz_new = jnp.vdot(r, z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            return t, r, z, z + beta * p, rz_new

        t, *_ = jax.lax.fori_loop(0, 256, step, (t, r, z, p, rz))
        return t

    clock("pcg_256_fori", run_pcg, A, b)

    # tukey from precomputed warped (no knn)
    @jax.jit
    def tukey_only(w, l):
        return gn.tukey_biweights(w, l, 4.652, 0.01)

    clock("tukey_only", tukey_only, verts, live)


if __name__ == "__main__":
    main()
