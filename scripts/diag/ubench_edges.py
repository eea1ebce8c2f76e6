"""Microbenchmark: isosurface_edge_vertices internal decomposition at the
512-cube workload (the largest stage of the round-4 parity frame).

Phases timed separately (each a jitted subgraph of mesh/edges.py):
  bitplanes   pack + occupancy + used-axis planes (word-parallel VPU)
  extract     + column compaction (nonzero over X*Y*3 + LSB rounds)
  full        + value gathers + interpolation (the complete extraction)

Run: /opt/venv/bin/python scripts/diag/ubench_edges.py [dims]
"""

import sys
import time

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.io.datasets import sphere_depth  # noqa: E402
from dynfu_tpu.mesh import edges as E  # noqa: E402
from dynfu_tpu.ops import compaction, imgproc  # noqa: E402
from dynfu_tpu.utils.timers import sync  # noqa: E402
from dynfu_tpu.volume import tsdf as tv  # noqa: E402

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MAX_EDGES = 49152

intr = Intr(525.0, 525.0, 319.5, 239.5)
cfg = tv.TsdfConfig(dims=(dims,) * 3, z_chunk=32)
vol = tv.TsdfVolume(jnp.zeros((dims,) * 3, jnp.float16),
                    jnp.zeros((dims,) * 3, jnp.uint8),
                    jnp.eye(3), jnp.asarray([-1.5, -1.5, 0.5]))
d = sphere_depth((0.0, 0.0, 1.5), 0.5, 480, 640, 525.0, 525.0, 319.5, 239.5)
dists = imgproc.compute_dists(jnp.asarray(d, jnp.int32), intr)
vol = tv.integrate_separable(vol, dists, (jnp.eye(3), jnp.zeros(3)), intr,
                             cfg, fresh=True)


def _planes(Fh, W, X, Y):
    ins_w = compaction.pack_columns(Fh < 0)
    val_w = compaction.pack_columns(W != 0)

    def cell4(w):
        return w[:-1, :-1] & w[1:, :-1] & w[:-1, 1:] & w[1:, 1:]

    pz = compaction.pair_and_z
    occ = cell4(pz(val_w)) & ~cell4(pz(ins_w)) & ~cell4(pz(~ins_w))
    sx = (ins_w[:-1] ^ ins_w[1:]) & (val_w[:-1] & val_w[1:])
    used_x = sx & E._or_z_prev(E._or_axis_prev(occ, 1, Y))
    sy = (ins_w[:, :-1] ^ ins_w[:, 1:]) & (val_w[:, :-1] & val_w[:, 1:])
    used_y = sy & E._or_z_prev(E._or_axis_prev(occ, 0, X))
    sz = E._pair_xor_z(ins_w) & pz(val_w)
    used_z = sz & E._or_axis_prev(E._or_axis_prev(occ, 0, X), 1, Y)
    return used_x, used_y, used_z


@jax.jit
def bitplanes(Fh, W):
    X, Y, Z = Fh.shape
    ux, uy, uz = _planes(Fh, W, X, Y)
    nw = uz.shape[-1]
    ux = jnp.concatenate([ux, jnp.zeros((1, Y, nw), jnp.uint32)], axis=0)
    uy = jnp.concatenate([uy, jnp.zeros((X, 1, nw), jnp.uint32)], axis=1)
    return ux | uz, uy  # force all three materialized


def _allw(Fh, W):
    X, Y, Z = Fh.shape
    nw = (Z + 31) // 32
    ux, uy, uz = _planes(Fh, W, X, Y)
    ux = jnp.concatenate([ux, jnp.zeros((1, Y, nw), jnp.uint32)], axis=0)
    uy = jnp.concatenate([uy, jnp.zeros((X, 1, nw), jnp.uint32)], axis=1)
    return jnp.stack([ux, uy, uz], axis=2).reshape(X * Y * 3, nw)


@jax.jit
def nonzero_cols(Fh, W):
    # planes + the active-column nonzero ONLY
    allw = _allw(Fh, W)
    col_active = jnp.any(allw != jnp.uint32(0), axis=1)
    return jnp.nonzero(col_active, size=2 * MAX_EDGES,
                       fill_value=allw.shape[0])[0]


@functools.partial(jax.jit, static_argnames=("k",))
def rounds_only(Fh, W, k=28):
    # planes + nonzero + K LSB rounds, no slot assignment
    allw = _allw(Fh, W)
    ncols, nwords = allw.shape
    col_idx = jnp.nonzero(jnp.any(allw != jnp.uint32(0), axis=1),
                          size=2 * MAX_EDGES, fill_value=ncols)[0]
    ok = col_idx < ncols
    words = jnp.where(ok[:, None],
                      allw[jnp.minimum(col_idx, ncols - 1)], jnp.uint32(0))
    iota_w = jnp.arange(nwords, dtype=jnp.int32)
    cands = []
    for _ in range(k):
        nz = words != jnp.uint32(0)
        widx = jnp.min(jnp.where(nz, iota_w[None, :], jnp.int32(nwords)),
                       axis=1)
        oh = iota_w[None, :] == widx[:, None]
        w = jnp.sum(jnp.where(oh, words, jnp.uint32(0)), axis=1,
                    dtype=jnp.uint32)
        lsb = w & (jnp.uint32(0) - w)
        e = (jax.lax.bitcast_convert_type(lsb.astype(jnp.float32),
                                          jnp.int32) >> 23) - 127
        cands.append(jnp.where(lsb != jnp.uint32(0), widx * 32 + e,
                               jnp.int32(nwords * 32)))
        words = jnp.where(oh, words ^ lsb[:, None], words)
    return jnp.stack(cands, axis=1)


@functools.partial(jax.jit, static_argnames=())
def extract(Fh, W):
    X, Y, Z = Fh.shape
    allw = _allw(Fh, W)
    flat, n_total, n_cap = compaction.extract_columns(
        allw, per_column=28, max_cols=2 * MAX_EDGES, max_out=MAX_EDGES,
        row_stride=Z, fill=X * Y * 3 * Z)
    return flat, n_cap


def clock(name, fn, *args, iters=10):
    out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(jax.tree_util.tree_leaves(out)[-1])
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms",
          flush=True)
    return out


clock("bitplanes", bitplanes, vol.tsdf, vol.weight)
clock("nonzero  ", nonzero_cols, vol.tsdf, vol.weight)
clock("rounds   ", rounds_only, vol.tsdf, vol.weight)
clock("extract  ", extract, vol.tsdf, vol.weight)
out = clock("full     ", lambda: E.isosurface_edge_vertices(
    vol, cfg, max_edges=MAX_EDGES))
print("n_edges:", int(out[1]), "dropped:", int(out[2]))
