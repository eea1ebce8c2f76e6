"""USE_DEPTH ICP variant + KinFu.get_mesh API."""

import numpy as np

import jax.numpy as jnp

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.ops import imgproc
from dynfu_tpu.rigid import icp

INTR = Intr(160.0, 160.0, 79.5, 59.5)
H, W = 120, 160


def heightfield_depth():
    u = np.arange(W)[None, :]
    v = np.arange(H)[:, None]
    z = 1.5 + 0.08 * np.sin(u / 12.0) + 0.06 * np.cos(v / 9.0)
    return (z * 1000).astype(np.int32)


def depth_pyr_from(depth, levels=4):
    """(depth, normals) pyramid like the USE_DEPTH build (kinfu.cpp:151-159)."""
    d = jnp.asarray(depth)
    pyr = []
    for lvl in range(levels):
        _, n = imgproc.compute_points_normals(d, INTR.level(lvl))
        pyr.append((d, n))
        d = imgproc.depth_pyramid_down(d)
    return pyr


def test_depth_icp_identity():
    pyr = depth_pyr_from(heightfield_depth())
    (R, t), ok = icp.estimate_transform_depth(pyr, pyr, INTR)
    assert bool(ok)
    # mm-integer depth quantization bounds the fixed point looser than the
    # float points variant
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=2e-3)
    # the residual rotation couples into a compensating translation along
    # the weakly constrained directions (~r*z); bound the combined drift
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=5e-3)


def test_depth_icp_recovers_z_translation():
    """A camera moved by tz sees the (locally planar) surface at depth - tz."""
    d0 = heightfield_depth()
    tz = 0.01
    d1 = d0 - int(tz * 1000)
    prev = depth_pyr_from(d0)
    curr = depth_pyr_from(d1)
    (R, t), ok = icp.estimate_transform_depth(curr, prev, INTR)
    assert bool(ok)
    assert abs(float(t[2]) - tz) < 3e-3
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=5e-3)


def test_kinfu_get_mesh():

    from dynfu_tpu.engine.kinfu import KinFu
    from dynfu_tpu.engine.params import KinFuParams
    from dynfu_tpu.io.datasets import sphere_depth

    params = KinFuParams(
        rows=96, cols=128, intr=Intr(140.0, 140.0, 63.5, 47.5),
        volume_dims=(64, 64, 64), volume_size=(1.0, 1.0, 1.0),
        volume_pose_t=(-0.5, -0.5, 0.25),
    )
    kf = KinFu(params)
    d = sphere_depth((0.0, 0.0, 0.7), 0.2, 96, 128, 140.0, 140.0, 63.5, 47.5)
    kf(d)
    verts, faces = kf.get_mesh(max_voxels=1 << 13, max_verts=3 * 8192)
    assert len(verts) > 100 and len(faces) > 100
    # only the camera-facing cap is observed; its vertices must lie on the
    # sphere surface (world frame), i.e. at distance ~0.2 from the center
    r = np.linalg.norm(verts - np.asarray([0.0, 0.0, 0.7]), axis=-1)
    assert np.abs(np.median(r) - 0.2) < 0.03
