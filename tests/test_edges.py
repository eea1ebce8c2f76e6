"""Unique isosurface vertex extraction (mesh/edges.py).

The extracted edge-vertex set must equal unique(marching-cubes soup
positions) exactly — same occupancy rule, same interpolation
(marching_cubes.cu:37-77, 197-204) — and the engine's unique-vertex
correspondence path (DynFuParams.corr_unique_edges) must track like the
soup path."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.engine.dynfusion import DynFusion
from dynfu_tpu.engine.params import DynFuParams, KinFuParams
from dynfu_tpu.io.datasets import sphere_depth
from dynfu_tpu.mesh.edges import isosurface_edge_vertices
from dynfu_tpu.mesh.mc import marching_cubes
from dynfu_tpu.ops import imgproc
from dynfu_tpu.volume import tsdf as tv

ROWS, COLS = 120, 160
INTR = Intr(131.25, 131.25, COLS / 2 - 0.5, ROWS / 2 - 0.5)


def _integrated_volume(depth, dims=64):
    cfg = tv.TsdfConfig(dims=(dims,) * 3, z_chunk=32)
    vol = tv.TsdfVolume(jnp.zeros((dims,) * 3, jnp.float16),
                        jnp.zeros((dims,) * 3, jnp.uint8),
                        jnp.eye(3), jnp.asarray([-1.5, -1.5, 0.5]))
    dists = imgproc.compute_dists(jnp.asarray(depth, jnp.int32), INTR)
    vol = tv.integrate_separable(vol, dists, (jnp.eye(3), jnp.zeros(3)),
                                 INTR, cfg, fresh=True)
    return vol, cfg


def _unique_rows(a):
    return np.unique(np.asarray(a).round(decimals=6), axis=0)


def test_edge_vertices_equal_unique_soup_sphere():
    d = sphere_depth((0.0, 0.0, 1.5), 0.5, ROWS, COLS,
                     INTR.fx, INTR.fy, INTR.cx, INTR.cy)
    vol, cfg = _integrated_volume(d)
    soup, n, drop = marching_cubes(vol, cfg, max_voxels=1 << 13,
                                   max_verts=1 << 15)
    ev, ne, edrop = isosurface_edge_vertices(vol, cfg, max_edges=1 << 14)
    assert int(drop) == 0 and int(edrop) == 0
    uniq_soup = _unique_rows(np.asarray(soup)[:int(n)])
    ev_np = np.asarray(ev)[:int(ne)]
    # every extracted vertex is unique already (one per edge)
    assert len(_unique_rows(ev_np)) == int(ne)
    np.testing.assert_allclose(uniq_soup, _unique_rows(ev_np), atol=1e-6)


def test_edge_vertices_equal_unique_soup_scene():
    # multi-object scene with occlusion boundaries (partial-weight cells)
    ds = []
    for c, r in [((0.0, 0.0, 1.5), 0.45), ((0.45, 0.3, 1.3), 0.2),
                 ((-0.4, -0.3, 1.7), 0.25)]:
        d = sphere_depth(c, r, ROWS, COLS, INTR.fx, INTR.fy, INTR.cx,
                         INTR.cy)
        ds.append(np.where(d == 0, np.iinfo(np.int32).max, d))
    d = np.stack(ds).min(axis=0)
    d = np.where(d == np.iinfo(np.int32).max, 0, d).astype(np.int32)
    vol, cfg = _integrated_volume(d)
    soup, n, drop = marching_cubes(vol, cfg, max_voxels=1 << 13,
                                   max_verts=1 << 15)
    ev, ne, edrop = isosurface_edge_vertices(vol, cfg, max_edges=1 << 14)
    assert int(drop) == 0 and int(edrop) == 0
    uniq_soup = _unique_rows(np.asarray(soup)[:int(n)])
    np.testing.assert_allclose(uniq_soup,
                               _unique_rows(np.asarray(ev)[:int(ne)]),
                               atol=1e-6)


def test_engine_unique_edges_tracks_like_soup():
    base = DynFuParams(
        kinfu=KinFuParams(rows=ROWS, cols=COLS, intr=INTR,
                          volume_dims=(64,) * 3),
        max_vertices=1 << 13, max_mc_voxels=1 << 11,
        max_nodes=128, max_new_nodes=64)
    errs = {}
    for tag, p in [("soup", base),
                   ("edges", dataclasses.replace(
                       base, corr_unique_edges=True,
                       max_edge_verts=1 << 12))]:
        eng = DynFusion(p)
        for i in range(5):
            d = sphere_depth((0.004 * i, 0.0, 1.5), 0.5, ROWS, COLS,
                             INTR.fx, INTR.fy, INTR.cx, INTR.cy)
            eng(d)
        wv, wm = eng.warped_cloud()
        v = np.asarray(wv)[np.asarray(wm)]
        center = np.asarray((0.004 * 4, 0.0, 1.5)) - np.asarray(
            (-1.5, -1.5, 0.5))
        errs[tag] = np.median(np.abs(
            np.linalg.norm(v - center, axis=-1) - 0.5)) * 1e3
        fs = eng.last_frame_stats
        assert int(fs.corr_dropped) == 0 and int(fs.mc_dropped) == 0
        # lazy soup extraction matches the always-emitting path's count
        mv, mn = eng.mesh()
        assert int(mn) > 0
    # same tracking quality (the weighting deviation is sub-voxel-floor)
    assert abs(errs["edges"] - errs["soup"]) < 1.0, errs


def test_edge_vertex_fused_normals_match_extract_normals():
    """with_normals=True: the lerped endpoint lattice gradients must agree
    with tsdf.extract_normals' 6-trilinear-sample gradient (the 4x-fewer-
    gathers fusion hot path) — same direction to a few degrees on smooth
    geometry, identical NaN boundary rule."""
    d = sphere_depth((0.0, 0.0, 1.5), 0.5, ROWS, COLS,
                     INTR.fx, INTR.fy, INTR.cx, INTR.cy)
    vol, cfg = _integrated_volume(d)
    ev, ne, edrop, en = isosurface_edge_vertices(
        vol, cfg, max_edges=1 << 14, convention="corner", with_normals=True)
    assert int(edrop) == 0
    ref = tv.extract_normals(vol, ev, cfg, frame="volume")
    ev_n, ref_n, fused_n = (np.asarray(x)[:int(ne)] for x in (ev, ref, en))
    both = np.isfinite(ref_n[:, 0]) & np.isfinite(fused_n[:, 0])
    # identical boundary/validity rule (rounded-voxel interior gate)
    np.testing.assert_array_equal(np.isfinite(ref_n[:, 0]),
                                  np.isfinite(fused_n[:, 0]))
    assert both.sum() > 100
    cos = np.sum(ref_n[both] * fused_n[both], axis=-1)
    assert np.median(cos) > 0.99  # ~6° at this 47 mm voxel; shrinks with
    assert np.percentile(cos, 1) > 0.8  # resolution (both are O(voxel))
    # the real bar: against the ANALYTIC sphere normal the fused
    # formulation is at least as accurate as the trilinear one (measured
    # 0.9476 vs 0.9431 median cos at 64-cube)
    center = np.asarray([1.5, 1.5, 1.0])
    true_n = ev_n - center
    true_n /= np.linalg.norm(true_n, axis=-1, keepdims=True)
    med_fused = np.median(np.sum(true_n[both] * fused_n[both], axis=-1))
    med_tri = np.median(np.sum(true_n[both] * ref_n[both], axis=-1))
    assert med_fused > med_tri - 0.005, (med_fused, med_tri)


def test_extract_columns_packed_cols_equivalence():
    """The rank-select active-column compaction (packed_cols=True — the
    edge extraction's replacement for the one-scatter-per-element
    `nonzero`, ops/compaction.py) must reproduce the plain path exactly,
    including capacity-overflow truncation order."""
    from dynfu_tpu.ops import compaction

    rng = np.random.RandomState(3)
    for ncols, nwords, density, max_cols in [
        (1000, 4, 0.05, 256), (1000, 4, 0.5, 64),  # overflow case
        (4096, 2, 0.01, 512), (333, 1, 0.3, 512),
    ]:
        occ = (rng.rand(ncols, nwords * 32) < density)
        w = compaction.pack_columns(jnp.asarray(occ))
        a = compaction.extract_columns(
            w, per_column=16, max_cols=max_cols, max_out=2048,
            row_stride=nwords * 32, fill=-7)
        b = compaction.extract_columns(
            w, per_column=16, max_cols=max_cols, max_out=2048,
            row_stride=nwords * 32, fill=-7, packed_cols=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_rank_select_matches_nonzero():
    """rank_select (ops/compaction.py) — the single-level set-bit index
    compaction behind foreground tracking (engine/dynfusion.py fg_aabb) —
    must match jnp.nonzero exactly, including ascending-prefix truncation
    on overflow and fill padding."""
    from dynfu_tpu.ops import compaction

    rng = np.random.RandomState(7)
    for n, density in [(100, 0.3), (4096, 0.01), (200_000, 0.002),
                       (65, 1.0), (64, 0.0)]:
        m = rng.rand(n) < density
        want = np.nonzero(m)[0]
        size = int(len(want)) + 5
        got = np.asarray(compaction.rank_select(
            jnp.asarray(m), size=size, fill=n))
        np.testing.assert_array_equal(got[:len(want)], want)
        assert np.all(got[len(want):] == n)
        # overflow truncates to the ascending prefix
        if len(want) >= 2:
            small = max(1, len(want) // 2)
            got2 = np.asarray(compaction.rank_select(
                jnp.asarray(m), size=small, fill=n))
            np.testing.assert_array_equal(got2, want[:small])
