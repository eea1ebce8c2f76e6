#!/usr/bin/env python
"""Microbench round 2: MC emission via windowed scatter-add / sort; corner
fetch via (2,2,1)-window gather."""

import time

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynfu_tpu.utils.timers import sync  # noqa: E402

X = Y = Z = 512
M = 1 << 16
ITERS = 20
MAXT = 3 * M

rng = np.random.RandomState(0)
vol = jnp.asarray(rng.randint(0, 1 << 30, (X, Y, Z), dtype=np.int64)
                  .astype(np.uint32))
vx = jnp.asarray(rng.randint(0, X - 1, M), jnp.int32)
vy = jnp.asarray(rng.randint(0, Y - 1, M), jnp.int32)
vz = jnp.asarray(rng.randint(0, Z - 1, M), jnp.int32)

tris = jnp.asarray(rng.rand(M, 5, 9), jnp.float32)
# exact-cumsum offsets like MC: each voxel emits k in [0,5] triangles
k = rng.randint(0, 6, M)
offs_np = np.concatenate([[0], np.cumsum(k)[:-1]]).astype(np.int32)
offs = jnp.asarray(offs_np)
kj = jnp.asarray(k, jnp.int32)


def clock(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = f(*args)
    sync(jax.tree_util.tree_leaves(out)[0])
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name}: {ms:.2f} ms", flush=True)
    return out


# A. current: per-triangle scatter (5M rows of 9 floats)
def scat(tris, offs, kj):
    slot = jnp.arange(5, dtype=jnp.int32)[None, :]
    tgt = jnp.where(slot < kj[:, None], offs[:, None] + slot, MAXT)
    out = jnp.zeros((MAXT + 1, 9), jnp.float32)
    return out.at[tgt.reshape(-1)].set(tris.reshape(-1, 9), mode="drop")


clock("scatter_per_tri", scat, tris, offs, kj)


# B. windowed scatter-add: ONE (5, 9) window write per voxel; slots >= k
#    carry zeros so overlapping windows compose by addition
def scat_window(tris, offs, kj):
    slot = jnp.arange(5, dtype=jnp.int32)[None, :]
    upd = jnp.where((slot < kj[:, None])[:, :, None], tris, 0.0)
    out = jnp.zeros((MAXT + 5, 9), jnp.float32)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1, 2), inserted_window_dims=(),
        scatter_dims_to_operand_dims=(0,))
    out = jax.lax.scatter_add(out, offs[:, None], upd, dnums,
                              mode=jax.lax.GatherScatterMode.CLIP)
    return out


clock("scatter_add_window5x9", scat_window, tris, offs, kj)


# C. sort-as-scatter: sort (tgt, 9 payload columns); ranks == slots since
#    offsets are an exact cumsum
def sort_emit(tris, offs, kj):
    slot = jnp.arange(5, dtype=jnp.int32)[None, :]
    tgt = jnp.where(slot < kj[:, None], offs[:, None] + slot, MAXT).reshape(-1)
    flat = tris.reshape(-1, 9)
    ops = (tgt,) + tuple(flat[:, i] for i in range(9))
    s = jax.lax.sort(ops, num_keys=1)
    return jnp.stack(s[1:], 1)[:MAXT]


clock("sort_as_scatter", sort_emit, tris, offs, kj)


# D. corner fetch via ONE gather of (2,2,1) windows
def win_gather(vol, vx, vy, vz):
    idx = jnp.stack([vx, vy, vz], 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(),
        start_index_map=(0, 1, 2))
    return jax.lax.gather(vol, idx, dn, slice_sizes=(2, 2, 1),
                          mode=jax.lax.GatherScatterMode.CLIP)


clock("gather_2x2x1_window", win_gather, vol, vx, vy, vz)


# E. baseline again for comparison on this process
def elem_gather(vol, vx, vy, vz):
    xy = [(0, 0), (1, 0), (1, 1), (0, 1)]
    return jnp.stack([vol[vx + dx, vy + dy, vz] for dx, dy in xy], -1)


clock("elem_gather_4x64k", elem_gather, vol, vx, vy, vz)
