"""Rotated-camera fast paths (homography re-mapping) vs the generic
gather-based integrate/raycast."""

import numpy as np

import jax.numpy as jnp

from dynfu_tpu.core import se3
from dynfu_tpu.core.camera import Intr
from dynfu_tpu.volume import tsdf as tv

INTR = Intr(60.0, 60.0, 31.5, 23.5)
H, W = 48, 64


def cfg():
    return tv.TsdfConfig(dims=(32, 32, 32), size=(1.0, 1.0, 1.0),
                         trunc_dist=0.08, z_chunk=8, raycast_step_factor=0.4)


def rotated_pose(deg, axis=(0, 1, 0)):
    r = np.deg2rad(deg) * np.asarray(axis, np.float32)
    return se3.from_rodrigues(jnp.asarray(r), jnp.zeros(3))


def sphere_dists(pose):
    """dists image of a sphere at volume center seen from the rotated cam."""
    R, t = np.asarray(pose[0]), np.asarray(pose[1])
    u = (np.arange(W) - INTR.cx) / INTR.fx
    v = ((np.arange(H) - INTR.cy) / INTR.fy)[:, None]
    d = np.stack([np.broadcast_to(u, (H, W)), np.broadcast_to(v, (H, W)),
                  np.ones((H, W))], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    dirs = d @ R.T  # rays in world frame
    center = np.asarray([0.0, 0.0, 0.6]) - t
    b = -2.0 * dirs @ center
    c = center @ center - 0.2**2
    disc = b * b - 4 * c
    hit = disc > 0
    s = (-b - np.sqrt(np.maximum(disc, 0))) / 2.0
    return jnp.asarray(np.where(hit & (s > 0), s, 0.0).astype(np.float16))


POSE_T = (-0.5, -0.5, 0.1)


def test_integrate_rotated_matches_generic():
    c = cfg()
    pose = rotated_pose(15.0)
    dists = sphere_dists(pose)
    vol_pose = (np.eye(3, dtype=np.float32), np.asarray(POSE_T, np.float32))

    ref = tv.integrate(tv.create(c, vol_pose), dists, pose, INTR, c)
    got = tv.integrate_rotated(tv.create(c, vol_pose), dists, pose, INTR, c)

    rt = np.asarray(ref.tsdf, np.float32)
    gt = np.asarray(got.tsdf, np.float32)
    # both point-sample the same image through equivalent projections; the
    # homography path quantizes pixels once more, so allow a small fraction
    # of boundary voxels to differ
    close = np.isclose(rt, gt, atol=0.05)
    assert close.mean() > 0.98, f"only {close.mean():.3f} voxels agree"
    # updated region overlaps strongly
    ru = np.asarray(ref.weight) > 0
    gu = np.asarray(got.weight) > 0
    inter = (ru & gu).sum()
    union = (ru | gu).sum()
    assert inter / max(union, 1) > 0.9


def test_raycast_rotated_matches_generic():
    c = cfg()
    vol_pose = (np.eye(3, dtype=np.float32), np.asarray(POSE_T, np.float32))
    pose0 = se3.identity()
    dists = sphere_dists(pose0)
    vol = tv.integrate_separable(tv.create(c, vol_pose), dists, pose0, INTR, c)

    pose = rotated_pose(12.0)
    ref_p, ref_n = tv.raycast(vol, pose, INTR, (H, W), c)
    got_p, got_n = tv.raycast_rotated(vol, pose, INTR, (H, W), c)
    ref_p, got_p = np.asarray(ref_p), np.asarray(got_p)
    rh = ~np.isnan(ref_p[..., 0])
    gh = ~np.isnan(got_p[..., 0])
    inter = (rh & gh).sum()
    assert inter > 0.85 * max(rh.sum(), 1)
    # agreeing pixels land on the same surface (sub-voxel tolerance; the two
    # paths use different march parameterizations)
    both = rh & gh
    err = np.linalg.norm(ref_p[both] - got_p[both], axis=-1)
    assert np.median(err) < 0.04  # ~1 voxel


def test_raycast_rotated_normals_rotate():
    """Fronto-parallel plane: normals must be ~-z in ANY camera frame that
    looks at it head-on after rotation compensation."""
    c = cfg()
    vol_pose = (np.eye(3, dtype=np.float32), np.asarray(POSE_T, np.float32))
    dists = jnp.full((H, W), 0.55, jnp.float16)
    vol = tv.integrate_separable(tv.create(c, vol_pose), dists, se3.identity(),
                                 INTR, c)
    pose = rotated_pose(10.0)
    p, n = tv.raycast_rotated(vol, pose, INTR, (H, W), c)
    n = np.asarray(n)
    ok = ~np.isnan(n[..., 0])
    assert ok.sum() > 100
    R = np.asarray(pose[0])
    world_n = n[ok] @ R.T  # back to world: plane normal ~ (0, 0, -1)
    assert np.median(world_n[:, 2]) < -0.9


def test_raycast_march_arbitrary_direction():
    """The any-direction marcher handles poses the slab sweep cannot
    (rays with non-positive volume z), matching the sweep where both apply."""
    c = cfg()
    vol_pose = (np.eye(3, dtype=np.float32), np.asarray(POSE_T, np.float32))
    dists = sphere_dists(se3.identity())
    vol = tv.integrate_separable(tv.create(c, vol_pose), dists, se3.identity(),
                                 INTR, c)
    # where both apply: small tilt — compare against the sweep
    pose = rotated_pose(10.0)
    p1, _ = tv.raycast(vol, pose, INTR, (H, W), c)
    p2, _ = tv.raycast_march(vol, pose, INTR, (H, W), c)
    p1, p2 = np.asarray(p1), np.asarray(p2)
    both = ~np.isnan(p1[..., 0]) & ~np.isnan(p2[..., 0])
    assert both.sum() > 0.7 * max((~np.isnan(p1[..., 0])).sum(), 1)
    err = np.linalg.norm(p1[both] - p2[both], axis=-1)
    assert np.median(err) < 0.05

    # a pose the sweep CANNOT march: camera past the object looking back
    # (-z rays). Needs a fully-observed surface, so fill an analytic sphere.
    x = (np.arange(32) + 0.0) * (1.0 / 32)
    g = np.stack(np.meshgrid(x, x, x, indexing="ij"), -1)
    sd = np.linalg.norm(g - np.asarray([0.5, 0.5, 0.5]), axis=-1) - 0.2
    full = tv.create(c, vol_pose)._replace(
        tsdf=jnp.asarray(np.clip(sd / c.trunc_dist, -1, 1).astype(np.float16)),
        weight=jnp.ones((32, 32, 32), jnp.uint8),
    )
    R180, _ = se3.from_rodrigues(jnp.asarray([0.0, np.pi, 0.0]), jnp.zeros(3))
    # world pos of volume center +z: volume z 0.5 -> world 0.6; camera at 1.3
    back_pose = (R180, jnp.asarray([0.0, 0.0, 1.3], jnp.float32))
    pm, _ = tv.raycast_march(full, back_pose, INTR, (H, W), c)
    pm = np.asarray(pm)
    hit = ~np.isnan(pm[..., 0])
    assert hit.sum() > 50  # back side visible
    # hit depth ~ camera_z - (sphere back at world z 0.8) = 0.5
    assert abs(np.median(pm[..., 2][hit]) - 0.5) < 0.05
