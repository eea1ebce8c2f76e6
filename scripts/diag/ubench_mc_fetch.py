#!/usr/bin/env python
"""Microbench: MC pass-2 corner-fetch and triangle-emission formulations.

Decides between element gathers (current), interleaved row gathers, packed
column row gathers + in-register select, and scatter vs stamp/cummax+gather
emission. One TPU process; run alone."""

import time

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynfu_tpu.utils.timers import sync  # noqa: E402

X = Y = Z = 512
M = 1 << 16          # compacted candidates
C = 1 << 14          # active columns
K = 4                # per-column budget shown in per-col variants (M = C*K)
ITERS = 20

rng = np.random.RandomState(0)
vol = jnp.asarray(rng.randint(0, 1 << 30, (X, Y, Z), dtype=np.int64)
                  .astype(np.uint32))
# candidates clustered near a surface band (roughly like MC occupancy)
vx = jnp.asarray(rng.randint(0, X - 1, M), jnp.int32)
vy = jnp.asarray(rng.randint(0, Y - 1, M), jnp.int32)
vz = jnp.asarray(rng.randint(0, Z - 1, M), jnp.int32)
colx = jnp.asarray(np.sort(rng.randint(0, X - 1, C)), jnp.int32)
coly = jnp.asarray(rng.randint(0, Y - 1, C), jnp.int32)
candz = jnp.asarray(np.sort(rng.randint(0, Z - 1, (C, K)), axis=1), jnp.int32)


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


# 1. current: 4 element-gathers over the (X, Y, Z) volume
def elem_gather(vol, vx, vy, vz):
    xy = [(0, 0), (1, 0), (1, 1), (0, 1)]
    return jnp.stack([vol[vx + dx, vy + dy, vz] for dx, dy in xy], -1)


clock("elem_gather_4x64k", elem_gather, vol, vx, vy, vz)


# 2. interleaved table build + ONE row gather of 4 words
def interleaved(vol, vx, vy, vz):
    t = jnp.stack([vol[:-1, :-1], vol[1:, :-1], vol[1:, 1:], vol[:-1, 1:]],
                  -1)  # (X-1, Y-1, Z, 4)
    flat = t.reshape(-1, 4)
    idx = (vx * (Y - 1) + vy) * Z + vz
    return flat[idx]


clock("interleave_build_plus_row_gather", interleaved, vol, vx, vy, vz)


# 2b. row gather alone from a prebuilt interleaved table
tbl = jnp.asarray(rng.randint(0, 1 << 30, ((X - 1) * (Y - 1) * Z, 4),
                              dtype=np.int64).astype(np.uint32))
idxflat = (vx * (Y - 1) + vy) * Z + vz


def row_gather(tbl, idx):
    return tbl[idx]


clock("row_gather_64k_x4w", row_gather, tbl, idxflat)


# 3. per-column row gather: 4 corner columns x C rows of Z words
def col_rows(vol, colx, coly):
    v2 = vol.reshape(X * Y, Z)
    out = []
    for dx, dy in [(0, 0), (1, 0), (1, 1), (0, 1)]:
        out.append(v2[(colx + dx) * Y + (coly + dy)])
    return jnp.stack(out, 1)  # (C, 4, Z)


slabs = clock("col_row_gather_16k_x4xZ", col_rows, vol, colx, coly)


# 4. in-slab select of K candidates per column: one-hot masked sum (VPU)
def slab_select(slabs, candz):
    oh = (candz[:, :, None] == jnp.arange(Z, dtype=jnp.int32)[None, None, :])
    return jnp.einsum("ckz,cfz->ckf", oh.astype(jnp.bfloat16),
                      jax.lax.bitcast_convert_type(
                          slabs, jnp.float16)[..., 0].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)


clock("slab_onehot_select", slab_select, slabs, candz)


# 5. scatter emission (current): 5*M rows of 9 floats
tris = jnp.asarray(rng.rand(M, 5, 9), jnp.float32)
tgt = jnp.asarray(np.sort(rng.randint(0, 3 * M, M * 5)), jnp.int32).reshape(M, 5)
MAXT = 3 * M


def scat(tris, tgt):
    out = jnp.zeros((MAXT + 1, 9), jnp.float32)
    return out.at[tgt.reshape(-1)].set(tris.reshape(-1, 9), mode="drop")


clock("scatter_327k_rows9f", scat, tris, tgt)


# 6. stamp + cummax + row-gather emission
offs = jnp.asarray(np.sort(rng.randint(0, MAXT, M)), jnp.int32)


def stamp_gather(tris, offs):
    vox = jnp.arange(M, dtype=jnp.int32)
    stamp = jnp.zeros(MAXT, jnp.int32).at[offs].max(vox + 1, mode="drop")
    vox_of = jax.lax.cummax(stamp) - 1
    slot = jnp.arange(MAXT, dtype=jnp.int32)
    safe = jnp.maximum(vox_of, 0)
    rank = jnp.clip(slot - offs[safe], 0, 4)
    return tris.reshape(M * 5, 9)[safe * 5 + rank]


clock("stamp_cummax_row_gather", stamp_gather, tris, offs)
