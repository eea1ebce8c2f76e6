"""Microbenchmark: marching-cubes cost decomposition at 512-cube on TPU.

Times the full kernel plus isolated probes of its constituent costs so the
next optimization targets the real bottleneck. Run on the TPU box:
    /opt/venv/bin/python scripts/ubench_mc.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.io.datasets import sphere_depth  # noqa: E402
from dynfu_tpu.mesh.mc import marching_cubes  # noqa: E402
from dynfu_tpu.ops import imgproc  # noqa: E402
from dynfu_tpu.utils.timers import sync  # noqa: E402
from dynfu_tpu.volume import tsdf as tv  # noqa: E402

DIMS = 512
MAX_VOX = 1 << 17
MAX_VERTS = 1 << 18
ITERS = 10


def clock(name, fn, *args):
    out = fn(*args)
    leaf = min(jax.tree_util.tree_leaves(out),
               key=lambda x: getattr(x, "size", 1 << 62))
    sync(leaf)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = min(jax.tree_util.tree_leaves(out),
               key=lambda x: getattr(x, "size", 1 << 62))
    sync(leaf)
    print(f"{name:28s} {(time.perf_counter() - t0) / ITERS * 1e3:8.2f} ms")
    return out


def main():
    rows, cols = 480, 640
    fx = fy = 525.0
    cx, cy = cols / 2 - 0.5, rows / 2 - 0.5
    intr = Intr(fx, fy, cx, cy)
    config = tv.TsdfConfig(dims=(DIMS,) * 3, size=(3.0, 3.0, 3.0))
    vol = tv.create(config, (jnp.eye(3), jnp.asarray([-1.5, -1.5, 0.5])))
    depth = jnp.asarray(sphere_depth((0.0, 0.0, 1.5), 0.5, rows, cols,
                                     fx, fy, cx, cy), jnp.int32)
    dists = imgproc.compute_dists(depth, intr)
    pose = (jnp.eye(3), jnp.zeros(3))
    vol = tv.integrate_separable(vol, dists, pose, intr, config)

    verts, n, nd = clock("mc_full", marching_cubes, vol, config,
                         MAX_VOX, MAX_VERTS)
    print(f"  n_verts={int(n)} n_dropped={int(nd)}")

    X, Y, Z = config.dims
    nwords = (Z + 31) // 32
    pow2 = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))

    @jax.jit
    def pack_occ(F, W):
        def pack_cols(bits):
            b = bits.reshape(X, Y, nwords, 32)
            return jnp.sum(b.astype(jnp.uint32) * pow2, axis=3,
                           dtype=jnp.uint32)

        def pairz(w):
            nxt = jnp.concatenate([w[..., 1:], jnp.zeros_like(w[..., :1])],
                                  axis=-1)
            down = jnp.right_shift(w, jnp.uint32(1)) | jnp.left_shift(
                nxt, jnp.uint32(31))
            return w & down

        def cell4(w):
            return w[:-1, :-1] & w[1:, :-1] & w[:-1, 1:] & w[1:, 1:]

        ins_w = pack_cols(F < 0)
        val_w = pack_cols(W != 0)
        occ_w = cell4(pairz(val_w)) & ~cell4(pairz(ins_w)) \
            & ~cell4(pairz(~ins_w))
        return jnp.sum(jax.lax.population_count(occ_w).astype(jnp.int32))

    clock("pass1_pack_occ", pack_occ, vol.tsdf, vol.weight)

    # pass-2 probes at the compacted size
    rng = np.random.default_rng(0)
    vidx = jnp.asarray(np.sort(rng.integers(0, (X - 1) * (Y - 1) * (Z - 1),
                                            size=MAX_VOX)), jnp.int32)

    @jax.jit
    def corner_gathers(F, vox_idx):
        cyy, czz = Y - 1, Z - 1
        vx = vox_idx // (cyy * czz)
        rem = vox_idx - vx * (cyy * czz)
        vy = rem // czz
        vz = rem - vy * czz
        fv = jnp.stack([F[vx + dx, vy + dy, vz + dz]
                        for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
                       axis=-1).astype(jnp.float32)
        return jnp.sum(fv)

    clock("pass2_8corner_gathers", corner_gathers, vol.tsdf, vidx)

    tgt = jnp.asarray(rng.integers(0, MAX_VERTS, size=(MAX_VOX, 15)),
                      jnp.int32)
    src = jnp.asarray(rng.random((MAX_VOX, 15, 3), np.float32))

    @jax.jit
    def emit_scatter(tgt, src):
        out = jnp.zeros((MAX_VERTS + 1, 3), jnp.float32)
        out = out.at[tgt.reshape(-1)].set(src.reshape(-1, 3), mode="drop")
        return jnp.sum(out)

    clock("pass2_emit_scatter_15x", emit_scatter, tgt, src)

    maxc = max(MAX_VOX // 4, 1 << 15)
    K = 32
    vmask = jnp.asarray(rng.random((maxc * K,)) < 0.04)

    @jax.jit
    def slot_nonzero(m):
        return jnp.nonzero(m, size=MAX_VOX, fill_value=m.shape[0])[0][-1]

    clock("slot_nonzero_colsxK", slot_nonzero, vmask)

    vmask12 = jnp.asarray(rng.random((maxc * 12,)) < 0.1)

    @jax.jit
    def slot_nonzero12(m):
        return jnp.nonzero(m, size=MAX_VOX, fill_value=m.shape[0])[0][-1]

    clock("slot_nonzero_colsx12", slot_nonzero12, vmask12)

    colmask = jnp.asarray(rng.random(((X - 1) * (Y - 1),)) < 0.02)

    @jax.jit
    def col_nonzero(m):
        return jnp.nonzero(m, size=maxc, fill_value=m.shape[0])[0][-1]

    clock("col_nonzero_XY", col_nonzero, colmask)

    # --- variant probes ----------------------------------------------------
    # (a) pair-packed corner fetch: interleave (z, z+1) into u32 densely,
    #     then 4 gathers instead of 8
    @jax.jit
    def corner_gathers_pair(F, vox_idx):
        nxt = jnp.concatenate([F[:, :, 1:], F[:, :, :1]], axis=2)
        pair = jax.lax.bitcast_convert_type(
            jnp.stack([F, nxt], axis=-1), jnp.uint32)  # (X, Y, Z)
        cyy, czz = Y - 1, Z - 1
        vx = vox_idx // (cyy * czz)
        rem = vox_idx - vx * (cyy * czz)
        vy = rem // czz
        vz = rem - vy * czz
        pv = jnp.stack([pair[vx + dx, vy + dy, vz]
                        for dx in (0, 1) for dy in (0, 1)], axis=-1)
        both = jax.lax.bitcast_convert_type(pv, jnp.float16)  # (M, 4, 2)
        return jnp.sum(both.astype(jnp.float32))

    clock("pass2_pair_gathers_u32", corner_gathers_pair, vol.tsdf, vidx)

    # (b) triangle-granularity emission: 5 rows of 9 floats per voxel
    tgt5 = jnp.asarray(rng.integers(0, MAX_VERTS // 3, size=(MAX_VOX, 5)),
                       jnp.int32)
    src5 = jnp.asarray(rng.random((MAX_VOX, 5, 9), np.float32))

    @jax.jit
    def emit_scatter_tri(tgt, src):
        out = jnp.zeros((MAX_VERTS // 3 + 1, 9), jnp.float32)
        out = out.at[tgt.reshape(-1)].set(src.reshape(-1, 9), mode="drop")
        return jnp.sum(out)

    clock("pass2_emit_scatter_tri5", emit_scatter_tri, tgt5, src5)

    # (c) packbits-based packing (u8 intermediate instead of u32x32)
    pow2_8 = jnp.left_shift(jnp.uint8(1), jnp.arange(8, dtype=jnp.uint8))
    nwords = (Z + 31) // 32

    @jax.jit
    def pack_occ_u8(F, W):
        def pack_cols(bits):
            b = bits.reshape(X, Y, nwords, 4, 8)
            by = jnp.sum(b.astype(jnp.uint8) * pow2_8, axis=4,
                         dtype=jnp.uint8)  # (X, Y, nw, 4)
            return jax.lax.bitcast_convert_type(by, jnp.uint32)

        def pairz(w):
            nxt = jnp.concatenate([w[..., 1:], jnp.zeros_like(w[..., :1])],
                                  axis=-1)
            down = jnp.right_shift(w, jnp.uint32(1)) | jnp.left_shift(
                nxt, jnp.uint32(31))
            return w & down

        def cell4(w):
            return w[:-1, :-1] & w[1:, :-1] & w[:-1, 1:] & w[1:, 1:]

        ins_w = pack_cols(F < 0)
        val_w = pack_cols(W != 0)
        occ_w = cell4(pairz(val_w)) & ~cell4(pairz(ins_w)) \
            & ~cell4(pairz(~ins_w))
        return jnp.sum(jax.lax.population_count(occ_w).astype(jnp.int32))

    n_occ = clock("pass1_pack_occ_u8", pack_occ_u8, vol.tsdf, vol.weight)
    print(f"  n_occ={int(n_occ)}")

    # (d) capacity scaling: pass-2 costs scale with max_voxels
    verts2, n2, nd2 = clock("mc_full_cap64k", marching_cubes, vol, config,
                            1 << 16, MAX_VERTS)
    print(f"  n_verts={int(n2)} n_dropped={int(nd2)}")

    # (e) the K-round LSB extraction loop in isolation
    maxc = max(MAX_VOX // 4, 1 << 15)
    K28 = 28
    words0 = jnp.asarray(
        rng.integers(0, 1 << 32, size=(maxc, nwords), dtype=np.uint64)
        .astype(np.uint32))

    @jax.jit
    def k_loop(words):
        iota_w = jnp.arange(nwords, dtype=jnp.int32)
        acc = jnp.int32(0)
        for _ in range(K28):
            nz = words != jnp.uint32(0)
            widx = jnp.min(jnp.where(nz, iota_w[None, :], jnp.int32(nwords)),
                           axis=1)
            oh = iota_w[None, :] == widx[:, None]
            w = jnp.sum(jnp.where(oh, words, jnp.uint32(0)), axis=1,
                        dtype=jnp.uint32)
            lsb = w & (jnp.uint32(0) - w)
            e = (jax.lax.bitcast_convert_type(lsb.astype(jnp.float32),
                                              jnp.int32) >> 23) - 127
            acc = acc + jnp.sum(widx * 32 + e)
            words = jnp.where(oh, words ^ lsb[:, None], words)
        return acc

    clock("k_loop_28_rounds", k_loop, words0)


if __name__ == "__main__":
    main()
