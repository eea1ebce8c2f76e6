"""End-to-end engine tests: rigid KinFu on a static/moving camera and the
full DynFusion non-rigid loop on a deforming synthetic scene.

The synthetic depth generators here are also the drive fixtures referenced by
the verify workflow.
"""

import dataclasses

import numpy as np

import jax.numpy as jnp

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.engine.dynfusion import DynFusion
from dynfu_tpu.engine.kinfu import KinFu
from dynfu_tpu.engine.params import DynFuParams, KinFuParams

H, W = 96, 128
INTR = Intr(140.0, 140.0, W / 2 - 0.5, H / 2 - 0.5)


def sphere_depth(center, radius, cam_t=np.zeros(3), h=H, w=W, intr=INTR):
    """Analytic depth image (int32 mm) of a sphere seen from a camera at
    cam_t looking down +z."""
    u = (np.arange(w) - intr.cx) / intr.fx
    v = ((np.arange(h) - intr.cy) / intr.fy)[:, None]
    d = np.stack([np.broadcast_to(u, (h, w)), np.broadcast_to(v, (h, w)),
                  np.ones((h, w))], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    oc = np.asarray(cam_t, np.float64) - np.asarray(center, np.float64)
    b = 2.0 * d @ oc
    c = oc @ oc - radius * radius
    disc = b * b - 4 * c
    hit = disc > 0
    t = (-b - np.sqrt(np.maximum(disc, 0.0))) / 2.0
    z = t * d[..., 2]
    depth = np.where(hit & (z > 0), z * 1000.0, 0.0)
    return depth.astype(np.int32)


def small_kinfu_params(**kw):
    base = KinFuParams(
        cols=W, rows=H, intr=INTR,
        volume_dims=(64, 64, 64), volume_size=(1.0, 1.0, 1.0),
        volume_pose_t=(-0.5, -0.5, 0.25),
        tsdf_trunc_dist=0.03, raycast_step_factor=0.75,
    )
    return dataclasses.replace(base, **kw)


def small_dynfu_params():
    return DynFuParams(
        kinfu=small_kinfu_params(),
        max_nodes=512, max_vertices=3 * 4096, max_mc_voxels=1 << 13,
        max_new_nodes=256, node_sample_step=32,
    )


CENTER = (0.0, 0.0, 0.75)  # world frame; volume spans [-.5,.5]x[-.5,.5]x[.25,1.25]
RADIUS = 0.22

# a single sphere leaves rotations about its center unobservable; the rigid
# tests use three non-collinear spheres so ICP is fully constrained.
SCENE = [
    (CENTER, RADIUS),
    ((0.28, 0.18, 0.85), 0.10),
    ((-0.25, -0.22, 0.9), 0.12),
]


def scene_depth(cam_t=np.zeros(3), spheres=SCENE):
    ds = [sphere_depth(c, r, cam_t=cam_t) for c, r in spheres]
    stack = np.stack(ds)
    stack = np.where(stack == 0, np.iinfo(np.int32).max, stack)
    out = stack.min(axis=0)
    return np.where(out == np.iinfo(np.int32).max, 0, out).astype(np.int32)


def test_kinfu_static_camera():
    kf = KinFu(small_kinfu_params())
    d = scene_depth()
    assert kf(d) is False  # frame 0
    assert kf(d) is False  # frame 1
    assert kf(d) is True  # frame 2
    R, t = kf.get_camera_pose()
    # residual bounded by the 64-cube voxel quantization of the raycast
    # model plus the homography re-mapping of the rotated fast path
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1.2e-2)
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1.2e-2)


def test_kinfu_fused_frame_matches_dispatch_path():
    """The single-program rigid frame (engine/kinfu.py _rigid_frame:
    in-program stencil ICP + device pose composition + overlapped packed
    readback) must reproduce the per-stage dispatch path — same
    formulations, host pose — on a depth-diverse scene. Also exercises
    the lagged _resolve_pending pose-history bookkeeping."""
    moves = [np.asarray([0.004 * i, -0.002 * i, 0.003 * i])
             for i in range(5)]

    def drive(fused):
        kf = KinFu(small_kinfu_params(fused_frame=fused))
        for m in moves:
            kf(scene_depth(cam_t=m))
        R, t = kf.get_camera_pose()
        assert len(kf.poses) == len(moves)
        return np.asarray(R), np.asarray(t)

    Rf, tf = drive(True)
    Ru, tu = drive(False)
    # identical code composed differently: only fusion-reassociation f32
    # noise may differ (measured 0.000 mm on this scene)
    np.testing.assert_allclose(tf, tu, atol=1e-4)
    np.testing.assert_allclose(Rf, Ru, atol=1e-4)
    # and it actually tracks
    np.testing.assert_allclose(tf, moves[-1], atol=8e-3)


def test_kinfu_moving_camera_tracks_pose():
    # exact raycast mode: this test measures tracking accuracy, not speed
    kf = KinFu(small_kinfu_params(raycast_mode="exact"))
    moves = [np.zeros(3), np.array([0.004, 0.0, 0.006]),
             np.array([0.008, -0.004, 0.012])]
    for m in moves:
        kf(scene_depth(cam_t=m))
    R, t = kf.get_camera_pose()
    np.testing.assert_allclose(np.asarray(t), moves[-1], atol=6e-3)
    np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=8e-3)


def test_kinfu_render():
    kf = KinFu(small_kinfu_params())
    d = scene_depth()
    kf(d), kf(d)
    img = np.asarray(kf.render(0))
    assert img.shape == (H, W, 3) and img.dtype == np.uint8
    both = np.asarray(kf.render(3))
    assert both.shape == (H, 2 * W, 3)


def surface_error(verts, mask, center, radius):
    v = np.asarray(verts)[np.asarray(mask)]
    return np.abs(np.linalg.norm(v - np.asarray(center), axis=-1) - radius)


def test_dynfusion_bootstrap_and_track():
    """Frame 0 bootstraps canonical + nodes; subsequent frames track a small
    translation of the sphere; warped canonical must land on the live
    surface within millimeters."""
    df = DynFusion(small_dynfu_params())
    assert df(sphere_depth(CENTER, RADIUS)) is False
    assert df.warpfield is not None
    assert int(df.warpfield.count) > 3
    c_verts, c_mask = df.canonical.vertices, df.canonical.mask
    assert int(jnp.sum(c_mask)) > 500
    # canonical surface correct (volume frame: center - volume_pose_t)
    cen_vol = np.asarray(CENTER) - np.asarray((-0.5, -0.5, 0.25))
    err = surface_error(c_verts, c_mask, cen_vol, RADIUS)
    assert np.median(err) < 0.01

    # live frames: sphere translated by 5 mm then 10 mm
    for i, dx in enumerate((0.005, 0.010)):
        center_i = (CENTER[0] + dx, CENTER[1], CENTER[2])
        assert df(sphere_depth(center_i, RADIUS)) is True
        wv, wmask = df.warped_cloud()
        cen_i_vol = np.asarray(center_i) - np.asarray((-0.5, -0.5, 0.25))
        werr = surface_error(wv, np.asarray(wmask), cen_i_vol, RADIUS)
        assert np.median(werr) < 0.008, f"frame {i+1} median {np.median(werr)}"


def test_dynfusion_foreground_tracking():
    """fg_aabb foreground tracking (VolumeDeform's masks, as a volume box):
    a deforming sphere in front of a static far wall. The tracked set is
    compacted to the box, so correspondence/solve scale with it; the wall
    stays in the canonical, is exported by warped_cloud, and does NOT move
    (its vertices see ~zero node weights). Nodes are sampled from the
    foreground only."""
    import dataclasses

    # wall: fronto-parallel plane at 1.1 m filling the whole image
    def scene(center):
        s = sphere_depth(center, RADIUS)
        wall = np.full_like(s, 1100)
        return np.where(s > 0, s, wall)

    # volume spans z in [0.25, 1.25] -> wall z_vol = 0.85; box z < 0.8
    params = dataclasses.replace(
        small_dynfu_params(),
        fg_aabb=((0.0, 0.0, 0.0), (1.0, 1.0, 0.6)),
        # the live tracked set is the SOUP at this small config (unique
        # edges default off < 384-cube): ~4.9k soup verts in the box
        max_fg_verts=1 << 13, node_sample_step=16)
    df = DynFusion(params)
    assert df(scene(CENTER)) is False
    # nodes sampled from the foreground box only
    pos = np.asarray(df.warpfield.pos)[np.asarray(df.warpfield.mask)]
    assert pos.shape[0] > 3 and np.all(pos[:, 2] < 0.6)
    # the tracked canonical is the compacted box subset
    assert df._fg_canonical.vertices.shape[0] == 1 << 13
    n_fg = int(jnp.sum(df._fg_canonical.mask))
    assert 0 < n_fg <= 1 << 13

    for i, dx in enumerate((0.005, 0.010)):
        center_i = (CENTER[0] + dx, CENTER[1], CENTER[2])
        assert df(scene(center_i)) is True
        assert int(df.last_frame_stats.corr_dropped) == 0  # no fg overflow
        wv, wmask = df.warped_cloud()
        wv, wmask = np.asarray(wv), np.asarray(wmask)
        cen_i_vol = np.asarray(center_i) - np.asarray((-0.5, -0.5, 0.25))
        # foreground tracked
        fg = wmask & (wv[:, 2] < 0.6) & (wv[:, 2] > 0.0)
        err = np.abs(np.linalg.norm(wv[fg] - cen_i_vol, axis=-1) - RADIUS)
        assert np.median(err) < 0.008, f"frame {i+1}: {np.median(err)}"
        # background untouched: wall vertices stay on the wall plane
        bg = wmask & (wv[:, 2] > 0.8)
        assert bg.sum() > 100
        assert float(np.abs(wv[bg, 2] - 0.85).max()) < 0.02


def test_dynfusion_node_insertion_for_unsupported_canonical():
    """Warpfield::update inserts nodes where the WARPED CANONICAL frame is
    unsupported (min_k dist/dg_w >= 1) — the reference updates from
    getCanonicalWarpedToLive(), dyn_fusion.cpp:142. With very sparse initial
    sampling the canonical sphere itself has unsupported regions."""
    params = dataclasses.replace(small_dynfu_params(), node_sample_step=4096)
    df = DynFusion(params)
    df(sphere_depth(CENTER, RADIUS))
    n0 = int(df.warpfield.count)
    assert n0 <= 4  # sparse bootstrap
    df(sphere_depth(CENTER, RADIUS))
    assert int(df.warpfield.count) > n0


def test_dynfusion_solver_stats_exposed():
    df = DynFusion(small_dynfu_params())
    df(sphere_depth(CENTER, RADIUS))
    df(sphere_depth((CENTER[0] + 0.004, CENTER[1], CENTER[2]), RADIUS))
    s = df.last_solve_stats
    assert float(s.final_cost) <= float(s.initial_cost)


def test_dynfusion_fixed_mode_tracks_camera_motion():
    """strict_parity=False wires the rigid ICP the reference stubbed out:
    a STATIC object seen from a translating camera must be explained by the
    pose, leaving the warp field ~identity."""
    df = DynFusion(small_dynfu_params(), strict_parity=False)
    for i in range(3):
        m = np.array([0.003 * i, 0.0, 0.004 * i])
        df(scene_depth(cam_t=m))
    R, t = df.get_camera_pose()
    np.testing.assert_allclose(np.asarray(t), [0.006, 0.0, 0.008], atol=8e-3)
    # warp field stays near identity: node translations ~ 0
    from dynfu_tpu.core import dualquat as dqm

    trans = np.asarray(dqm.dq_translation(df.warpfield.dqs))
    active = np.asarray(df.warpfield.mask)
    assert np.abs(trans[active]).max() < 0.05


def test_fixed_mode_render_preserves_icp_pyramid():
    """render() must not clobber the rigid-ICP reference pyramid in fixed
    mode (it previously replaced it with a single-level list)."""
    df = DynFusion(small_dynfu_params(), strict_parity=False)
    df(scene_depth())
    df(scene_depth())
    img = np.asarray(df.render(0))
    assert img.shape[0] == H
    # next frame must still track without error
    df(scene_depth(cam_t=np.array([0.002, 0.0, 0.002])))
    assert len(df.prev_pyr) == df.levels


def test_fixed_mode_with_se3_rotations():
    """mode="fixed" + solver_rotations: the non-parity mesh pipeline runs
    the SE(3) solve (incremental convention) with DLB warp end to end and
    still tracks the translating sphere."""
    import dataclasses

    params = dataclasses.replace(small_dynfu_params(),
                                 solver_rotations=True, se3_relinearize=2)
    df = DynFusion(params, mode="fixed")
    for i in range(4):
        df(sphere_depth((CENTER[0] + 0.004 * i, CENTER[1], CENTER[2]),
                        RADIUS))
    wv, wm = df.warped_cloud()
    cen_live = np.asarray((CENTER[0] + 0.012, CENTER[1], CENTER[2])) \
        - np.asarray((-0.5, -0.5, 0.25))
    err = surface_error(wv, np.asarray(wm), cen_live, RADIUS)
    assert np.median(err) < 0.02
    # rotations on a translating sphere are weakly observable (normal-spin
    # not at all); the rot_prior step damping bounds the noise-fit spin
    # without biasing true rotations (see solver/se3.py)
    assert float(df.last_frame_stats.solve.mean_rot_deg) < 15.0


def test_uint16_depth_input_matches_int32():
    """uint16 depth (the Kinect wire format — the reference's ushort,
    kinfu.cpp:16-18) must produce bit-identical engine results to int32:
    the widening happens INSIDE the jitted frame so the hot loop uploads
    half the bytes."""
    outs = {}
    for dt in (np.int32, np.uint16):
        eng = DynFusion(small_dynfu_params())
        for i in range(4):
            c = (CENTER[0] + 0.004 * i, CENTER[1], CENTER[2])
            eng(np.asarray(sphere_depth(c, RADIUS), dt))
        wv, wm = eng.warped_cloud()
        outs[dt] = (np.asarray(wv), np.asarray(wm))
    np.testing.assert_array_equal(outs[np.int32][0], outs[np.uint16][0])
    np.testing.assert_array_equal(outs[np.int32][1], outs[np.uint16][1])


def test_kinfu_fused_frame_degenerate_reset_lags_one_frame():
    """Fused rigid path failure flow: a depth frame with no usable
    geometry makes the stencil ICP degenerate; the packed ok=False rides
    the overlapped readback, so the reset lands when the NEXT call
    resolves it (documented one-frame lag, engine/kinfu.py _rigid_frame).
    After the reset the engine re-bootstraps and keeps tracking."""
    kf = KinFu(small_kinfu_params())
    kf(scene_depth())
    kf(scene_depth())
    assert kf.frame_counter == 2
    empty = np.zeros((H, W), np.int32)
    kf(empty)  # degenerate frame dispatched; not yet resolved
    # next call resolves the pending failure -> reset -> frame 0 bootstrap
    kf(scene_depth())
    assert kf.frame_counter in (0, 1)  # reset happened (then bootstrapped)
    # engine recovers: a fresh static pair tracks to identity again
    kf(scene_depth())
    kf(scene_depth())
    R, t = kf.get_camera_pose()
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=1.5e-2)
