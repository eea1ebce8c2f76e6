"""Microbenchmark: round-5 decomposition of isosurface_edge_vertices at the
production 512-cube settings (edge_col_budget=8, packed_cols rank-select,
max_edges=49152) + the fused-bitplane path (bitplanes precomputed by the
integrate — emit_bitplanes=True).

Phases:
  pack        pack_columns(tsdf<0) + pack_columns(weight!=0) only
  planes      + occupancy + used-axis word planes
  extract     + packed-cols column compaction (production settings)
  full        complete extraction (packs internally)
  full_pre    complete extraction with bitplanes PASSED IN (the engine's
              fused-integrate path) — full minus pack is the expected gap

Run: /opt/venv/bin/python scripts/diag/ubench_edges2.py [dims]
"""

import sys
import time

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from dynfu_tpu.core.camera import Intr  # noqa: E402
from dynfu_tpu.io.datasets import sphere_depth  # noqa: E402
from dynfu_tpu.mesh import edges as E  # noqa: E402
from dynfu_tpu.ops import compaction, imgproc  # noqa: E402
from dynfu_tpu.utils.timers import sync  # noqa: E402
from dynfu_tpu.volume import tsdf as tv  # noqa: E402

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 512
MAX_EDGES = 49152
BUDGET = 8

intr = Intr(525.0, 525.0, 319.5, 239.5)
cfg = tv.TsdfConfig(dims=(dims,) * 3, z_chunk=32)
vol = tv.TsdfVolume(jnp.zeros((dims,) * 3, jnp.float16),
                    jnp.zeros((dims,) * 3, jnp.uint8),
                    jnp.eye(3), jnp.asarray([-1.5, -1.5, 0.5]))
d = sphere_depth((0.0, 0.0, 1.5), 0.5, 480, 640, 525.0, 525.0, 319.5, 239.5)
dists = imgproc.compute_dists(jnp.asarray(d, jnp.int32), intr)
vol, planes_pre = tv.integrate_separable(
    vol, dists, (jnp.eye(3), jnp.zeros(3)), intr, cfg, fresh=True,
    emit_bitplanes=True)


@jax.jit
def pack(Fh, W):
    return compaction.pack_columns(Fh < 0), compaction.pack_columns(W != 0)


def _used(ins_w, val_w, X, Y):
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


def _allw(Fh, W, pre=None):
    X, Y, Z = Fh.shape
    nw = (Z + 31) // 32
    ins_w, val_w = pre if pre is not None else (
        compaction.pack_columns(Fh < 0), compaction.pack_columns(W != 0))
    ux, uy, uz = _used(ins_w, val_w, X, Y)
    ux = jnp.concatenate([ux, jnp.zeros((1, Y, nw), jnp.uint32)], axis=0)
    uy = jnp.concatenate([uy, jnp.zeros((X, 1, nw), jnp.uint32)], axis=1)
    return jnp.stack([ux, uy, uz], axis=2).reshape(X * Y * 3, nw)


@jax.jit
def planes(Fh, W):
    return _allw(Fh, W)


@jax.jit
def extract(Fh, W):
    X, Y, Z = Fh.shape
    allw = _allw(Fh, W)
    flat, n_total, n_cap = compaction.extract_columns(
        allw, per_column=BUDGET,
        max_cols=min(X * Y * 3, max(2 * MAX_EDGES, 1 << 15)),
        max_out=MAX_EDGES, row_stride=Z, fill=X * Y * 3 * Z,
        packed_cols=True)
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


clock("pack     ", pack, vol.tsdf, vol.weight)
clock("planes   ", planes, vol.tsdf, vol.weight)
clock("extract  ", extract, vol.tsdf, vol.weight)
out = clock("full     ", lambda: E.isosurface_edge_vertices(
    vol, cfg, max_edges=MAX_EDGES, col_budget=BUDGET))
out2 = clock("full_pre ", lambda: E.isosurface_edge_vertices(
    vol, cfg, max_edges=MAX_EDGES, col_budget=BUDGET,
    bitplanes=planes_pre))
print("n_edges:", int(out[1]), "dropped:", int(out[2]),
      "| pre n_edges:", int(out2[1]))
