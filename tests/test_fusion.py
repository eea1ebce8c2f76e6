"""Warped (non-rigid) canonical-volume integration — volume/fusion.py.

Validates the compacted fused program against (a) the rigid integrator under
an identity warp (the DynamicFusion fusion model reduces to rigid fusion
when the field is identity) and (b) a dense, uncompacted reference
transcription of the same update rule (any warp field) — the same style of
oracle the MC and imgproc suites use.
"""

import numpy as np

import jax
import jax.numpy as jnp

from dynfu_tpu.core import dualquat as dq
from dynfu_tpu.core import se3
from dynfu_tpu.ops import imgproc
from dynfu_tpu.volume import fusion
from dynfu_tpu.volume import tsdf as tv
from dynfu_tpu.warp import field as wfield

from test_pipeline import INTR, H, W, sphere_depth

CONFIG = tv.TsdfConfig(dims=(64, 64, 64), size=(1.0, 1.0, 1.0),
                       trunc_dist=0.03, max_weight=64, z_chunk=64)
VOL_POSE = (np.eye(3, dtype=np.float32),
            np.asarray([-0.5, -0.5, 0.25], np.float32))
CAM = se3.identity()
CENTER = (0.0, 0.0, 0.75)
RADIUS = 0.22


def _seed_volume():
    vol = tv.create(CONFIG, pose=VOL_POSE)
    depth = jnp.asarray(sphere_depth(CENTER, RADIUS), jnp.int32)
    dists = imgproc.compute_dists(depth, INTR)
    vol = tv.integrate(vol, dists, CAM, INTR, CONFIG)
    return vol, dists


def _sphere_nodes(n=128, dg_w=0.35, dqs=None, seed=0):
    """Nodes on the canonical sphere surface with wide support radii."""
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    world = np.asarray(CENTER) + RADIUS * d
    volf = world - VOL_POSE[1]  # volume frame (identity rotation)
    return wfield.init_warpfield(volf.astype(np.float32), dqs=dqs,
                                 weights=dg_w)


def test_identity_warp_matches_rigid():
    """With an identity field, warped integration must reproduce the rigid
    integrator on every voxel it updates (same formula, same corner
    convention — tsdf_volume.cu:50-94)."""
    vol0, dists = _seed_volume()
    wf = _sphere_nodes()

    rigid = tv.integrate(vol0, dists, CAM, INTR, CONFIG)
    warped, stats = fusion.integrate_warped(
        vol0, wf, dists, CAM, INTR, CONFIG, max_active=1 << 16)

    assert int(stats.n_captured) == int(stats.n_band) > 0
    assert int(stats.n_updated) > 1000

    upd = np.asarray(warped.weight) != np.asarray(vol0.weight)
    upd |= np.asarray(warped.tsdf) != np.asarray(vol0.tsdf)
    assert upd.sum() == int(stats.n_updated) > 0

    t_r = np.asarray(rigid.tsdf, np.float32)[upd]
    t_w = np.asarray(warped.tsdf, np.float32)[upd]
    w_r = np.asarray(rigid.weight)[upd]
    w_w = np.asarray(warped.weight)[upd]
    # the two paths build camera coords with different (equally valid)
    # f32 summation orders; allow rare floor()-boundary pixel flips
    same = (t_r == t_w) & (w_r == w_w)
    assert same.mean() > 0.995
    assert np.abs(t_r - t_w)[np.abs(t_r - t_w) < 0.5].max() <= 2e-3


def test_matches_dense_reference():
    """Fused+compacted program == dense uncompacted transcription of the
    update rule, bit for bit, under a non-trivial warp field."""
    vol0, _ = _seed_volume()
    # second observation: slightly shifted sphere (a deformation)
    depth = jnp.asarray(
        sphere_depth((CENTER[0] + 0.01, CENTER[1] - 0.008, CENTER[2]),
                     RADIUS), jnp.int32)
    dists = imgproc.compute_dists(depth, INTR)

    rng = np.random.default_rng(3)
    trans = (0.01 * rng.normal(size=(128, 3))).astype(np.float32)
    dqs = np.zeros((128, 8), np.float32)
    dqs[:, 0] = 1.0
    dqs[:, 5:8] = trans / 2.0
    wf = _sphere_nodes(dqs=dqs)
    knn_k = 4

    warped, stats = fusion.integrate_warped(
        vol0, wf, dists, CAM, INTR, CONFIG, max_active=1 << 16, knn_k=knn_k)
    assert int(stats.n_captured) == int(stats.n_band)

    # --- dense reference -------------------------------------------------
    X, Y, Z = CONFIG.dims
    F = np.asarray(vol0.tsdf, np.float32)
    Wt = np.asarray(vol0.weight, np.float32)
    band = (Wt > 0) & (F < 1.0)
    # dilation by 2 (matching integrate_warped's default) via numpy rolls
    dil = band.copy()
    for ax in range(3):
        for r in (1, 2):
            for s in (r, -r):
                sh = np.roll(band, s, axis=ax)
                # roll wraps; clear the wrapped slab
                idx = [slice(None)] * 3
                idx[ax] = slice(0, r) if s > 0 else slice(-r, None)
                sh[tuple(idx)] = False
                dil |= sh
        band = dil.copy()  # separable: dilate x, then y, then z

    ii = np.argwhere(dil)
    p_vol = ii.astype(np.float32) * np.asarray(CONFIG.voxel_size, np.float32)

    _, sqd, n_pos, n_dq, n_w, n_valid = wfield.neighbor_features(
        wf, jnp.asarray(p_vol), knn_k)
    blend = wfield._dqb_from_features(jnp.asarray(p_vol), n_pos, n_dq, n_w,
                                      n_valid)
    p_w = np.asarray(dq.dq_transform_point(blend, jnp.asarray(p_vol)))
    supported = np.asarray(
        jnp.min(jnp.where(n_valid, sqd / jnp.maximum(n_w * n_w, 1e-30),
                          jnp.inf), axis=-1)) < 1.0

    pw_world = p_w + np.asarray(VOL_POSE[1])  # identity volume rotation
    vc = pw_world  # identity camera
    u = INTR.fx * vc[:, 0] / vc[:, 2] + INTR.cx
    v = INTR.fy * vc[:, 1] / vc[:, 2] + INTR.cy
    in_img = (u >= 0) & (v >= 0) & (u < W) & (v < H) & (vc[:, 2] > 0)
    ui = np.clip(np.floor(u).astype(np.int32), 0, W - 1)
    vi = np.clip(np.floor(v).astype(np.int32), 0, H - 1)
    Dp = np.asarray(dists, np.float32)[vi, ui]
    sdf = Dp - np.linalg.norm(vc, axis=1)
    upd = supported & in_img & (Dp != 0) & (sdf >= -CONFIG.trunc_dist)

    tp = F[ii[:, 0], ii[:, 1], ii[:, 2]]
    wp = Wt[ii[:, 0], ii[:, 1], ii[:, 2]]
    tin = np.minimum(1.0, sdf / CONFIG.trunc_dist)
    tnew = np.where(upd, (tp * wp + tin) / (wp + 1.0), tp).astype(np.float16)
    wnew = np.where(upd, np.minimum(wp + 1.0, CONFIG.max_weight), wp)

    ref_t = np.asarray(vol0.tsdf).copy()
    ref_w = np.asarray(vol0.weight).copy()
    ref_t[ii[:, 0], ii[:, 1], ii[:, 2]] = tnew
    ref_w[ii[:, 0], ii[:, 1], ii[:, 2]] = wnew.astype(np.uint8)

    got_t = np.asarray(warped.tsdf)
    got_w = np.asarray(warped.weight)
    mism = (got_t != ref_t) | (got_w != ref_w)
    # f32 rounding in the two vc paths can flip a handful of floor() pixels
    assert mism.mean() < 1e-4, f"{mism.sum()} mismatched voxels"
    assert int(stats.n_updated) == int(upd.sum())


def test_unsupported_voxels_untouched():
    """Voxels outside every node's support keep their canonical value
    (warp_field.cpp:34-61 unsupported rule)."""
    vol0, dists = _seed_volume()
    # nodes far from the sphere with tiny radii: nothing is supported
    far = np.tile(np.asarray([[0.05, 0.05, 0.05]], np.float32), (16, 1))
    wf = wfield.init_warpfield(far, weights=1e-4)
    warped, stats = fusion.integrate_warped(
        vol0, wf, dists, CAM, INTR, CONFIG, max_active=1 << 16)
    assert int(stats.n_updated) == 0
    np.testing.assert_array_equal(np.asarray(warped.tsdf),
                                  np.asarray(vol0.tsdf))
    np.testing.assert_array_equal(np.asarray(warped.weight),
                                  np.asarray(vol0.weight))
