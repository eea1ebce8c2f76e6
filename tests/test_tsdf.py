"""TSDF volume: integrate parity vs loop transcription, interpolation,
raycast + extraction on analytic surfaces."""

import numpy as np

import jax.numpy as jnp

from dynfu_tpu.core import se3
from dynfu_tpu.core.camera import Intr
from dynfu_tpu.volume import tsdf as tv

INTR = Intr(30.0, 30.0, 15.5, 11.5)  # tiny 24x32 camera


def small_config(**kw):
    d = dict(dims=(16, 16, 16), size=(1.0, 1.0, 1.0), trunc_dist=0.1,
             max_weight=4, z_chunk=8)
    d.update(kw)
    return tv.TsdfConfig(**d)


def plane_dists(z_m, h=24, w=32, intr=INTR):
    """dists image of a fronto-parallel plane at depth z (meters)."""
    x = (np.arange(w) - intr.cx) / intr.fx
    y = ((np.arange(h) - intr.cy) / intr.fy)[:, None]
    lam = np.sqrt(x[None, :] ** 2 + y**2 + 1.0)
    return (z_m * lam).astype(np.float16)


def ref_integrate(tsdf, weight, dists, vol2cam_R, vol2cam_t, intr, cfg):
    """Literal transcription of TsdfIntegrator (tsdf_volume.cu:50-94)."""
    X, Y, Z = cfg.dims
    vs = cfg.voxel_size
    H, W = dists.shape
    out_t, out_w = tsdf.copy(), weight.copy()
    f32 = np.float32
    for x in range(X):
        for y in range(Y):
            for z in range(Z):
                vx = np.array([x * vs[0], y * vs[1], z * vs[2]], f32)
                vc = (vol2cam_R.astype(f32) @ vx + vol2cam_t.astype(f32)).astype(f32)
                u = f32(intr.fx) * vc[0] / vc[2] + f32(intr.cx)
                v = f32(intr.fy) * vc[1] / vc[2] + f32(intr.cy)
                if u < 0 or v < 0 or u >= W or v >= H:
                    continue
                Dp = f32(dists[int(np.floor(v)), int(np.floor(u))])
                if Dp == 0 or vc[2] <= 0:
                    continue
                sdf = Dp - f32(np.sqrt(np.sum(vc * vc, dtype=f32)))
                if sdf >= -f32(cfg.trunc_dist):
                    t_in = min(1.0, sdf / cfg.trunc_dist)
                    w_prev = float(out_w[x, y, z])
                    t_prev = float(out_t[x, y, z])
                    out_t[x, y, z] = np.float16((t_prev * w_prev + t_in) / (w_prev + 1))
                    out_w[x, y, z] = min(int(w_prev) + 1, cfg.max_weight)
    return out_t, out_w


def test_integrate_matches_reference_loops():
    cfg = small_config()
    pose = (np.eye(3, dtype=np.float32), np.array([-0.5, -0.5, 0.3], np.float32))
    vol = tv.create(cfg, pose)
    dists = plane_dists(0.7)
    cam = se3.identity()

    got = tv.integrate(vol, jnp.asarray(dists), cam, INTR, cfg)
    want_t, want_w = ref_integrate(
        np.zeros(cfg.dims, np.float16), np.zeros(cfg.dims, np.uint8),
        dists, pose[0], pose[1], INTR, cfg,
    )
    np.testing.assert_allclose(
        np.asarray(got.tsdf, np.float32), want_t.astype(np.float32), atol=2e-3
    )
    np.testing.assert_array_equal(np.asarray(got.weight), want_w)


def test_integrate_weight_clamps_at_max():
    cfg = small_config(max_weight=3)
    pose = (np.eye(3, dtype=np.float32), np.array([-0.5, -0.5, 0.3], np.float32))
    vol = tv.create(cfg, pose)
    dists = jnp.asarray(plane_dists(0.7))
    cam = se3.identity()
    for _ in range(5):
        vol = tv.integrate(vol, dists, cam, INTR, cfg)
    assert int(np.asarray(vol.weight).max()) == 3


def test_integrate_separable_emits_bitplanes():
    """emit_bitplanes returns exactly pack_columns(tsdf<0 / weight!=0) of
    the post-update volume — the fused emission the engine frame feeds to
    the unique-edge extraction (both the word-aligned z-chunk path and the
    unaligned fallback)."""
    from dynfu_tpu.ops import compaction

    for dims, z_chunk in (((16, 16, 64), 32), ((16, 16, 48), 48)):
        cfg = small_config(dims=dims, z_chunk=z_chunk)
        pose = (np.eye(3, dtype=np.float32),
                np.array([-0.5, -0.5, 0.3], np.float32))
        vol = tv.create(cfg, pose)
        dists = jnp.asarray(plane_dists(0.7))
        cam = se3.identity()
        out, (ins_w, val_w) = tv.integrate_separable(
            vol, dists, cam, INTR, cfg, fresh=True, emit_bitplanes=True)
        ref = tv.integrate_separable(vol, dists, cam, INTR, cfg, fresh=True)
        np.testing.assert_array_equal(np.asarray(out.tsdf),
                                      np.asarray(ref.tsdf))
        want_ins = compaction.pack_columns(ref.tsdf < 0)
        want_val = compaction.pack_columns(ref.weight != 0)
        assert int((np.asarray(want_ins) != 0).sum()) > 0  # real crossings
        np.testing.assert_array_equal(np.asarray(ins_w), np.asarray(want_ins))
        np.testing.assert_array_equal(np.asarray(val_w), np.asarray(want_val))


def test_clear():
    cfg = small_config()
    vol = tv.create(cfg)
    vol = vol._replace(tsdf=vol.tsdf + np.float16(0.5), weight=vol.weight + 2)
    vol = tv.clear(vol)
    assert float(jnp.abs(vol.tsdf).max()) == 0
    assert int(vol.weight.max()) == 0


def test_interpolate_trilinear_and_nan_outside():
    t = np.zeros((4, 4, 4), np.float16)
    t[1, 1, 1] = 1.0
    p = jnp.asarray([[1.5, 1.0, 1.0], [1.0, 1.0, 1.0], [-0.5, 1.0, 1.0],
                     [3.5, 1.0, 1.0]], jnp.float32)
    got = np.asarray(tv.interpolate(jnp.asarray(t), p))
    assert abs(got[0] - 0.5) < 1e-3
    assert abs(got[1] - 1.0) < 1e-3
    assert np.isnan(got[2]) and np.isnan(got[3])


def sphere_volume(cfg, center, radius):
    """Analytic truncated SDF of a sphere, weights=1."""
    X, Y, Z = cfg.dims
    vs = cfg.voxel_size
    x = (np.arange(X) + 0.0) * vs[0]
    y = (np.arange(Y) + 0.0) * vs[1]
    z = (np.arange(Z) + 0.0) * vs[2]
    g = np.stack(np.meshgrid(x, y, z, indexing="ij"), -1)
    d = np.linalg.norm(g - np.asarray(center), axis=-1) - radius
    t = np.clip(d / cfg.trunc_dist, -1, 1).astype(np.float16)
    vol = tv.create(cfg)
    return vol._replace(
        tsdf=jnp.asarray(t), weight=jnp.ones(cfg.dims, jnp.uint8)
    )


def test_raycast_sphere():
    cfg = tv.TsdfConfig(dims=(64, 64, 64), size=(1.0, 1.0, 1.0), trunc_dist=0.05,
                        raycast_step_factor=0.5)
    center, radius = (0.5, 0.5, 0.5), 0.2
    vol = sphere_volume(cfg, center, radius)
    # camera at volume frame origin corner looking toward +z through center:
    # place camera at (0.5, 0.5, 0.05) looking down +z
    cam = (jnp.eye(3), jnp.asarray([0.5, 0.5, 0.05], jnp.float32))
    pts, nrm = tv.raycast(vol, cam, INTR, (24, 32), cfg)
    pts, nrm = np.asarray(pts), np.asarray(nrm)
    hit = ~np.isnan(pts[..., 0])
    assert hit.sum() > 50  # central rays hit the sphere
    # hit points lie on the sphere (world == volume frame; camera at +0.05)
    world = pts[hit] + np.asarray([0.5, 0.5, 0.05])
    r = np.linalg.norm(world - np.asarray(center), axis=-1)
    assert np.abs(r - radius).max() < 0.01
    # normals point outward (toward camera => negative z mostly)
    outward = (world - np.asarray(center)) / r[:, None]
    dots = np.sum(nrm[hit] * outward, axis=-1)
    assert (dots > 0.95).mean() > 0.95


def test_raycast_depth_variant():
    cfg = tv.TsdfConfig(dims=(64, 64, 64), size=(1.0, 1.0, 1.0), trunc_dist=0.05,
                        raycast_step_factor=0.5)
    vol = sphere_volume(cfg, (0.5, 0.5, 0.5), 0.2)
    cam = (jnp.eye(3), jnp.asarray([0.5, 0.5, 0.05], jnp.float32))
    depth, _ = tv.raycast_depth(vol, cam, INTR, (24, 32), cfg)
    depth = np.asarray(depth)
    assert depth.max() > 0
    # central pixel: sphere front at z = 0.5 - 0.2 - 0.05 = 0.25 m = 250 mm
    assert abs(int(depth[11, 15]) - 250) < 15


def test_extract_cloud_sphere():
    cfg = tv.TsdfConfig(dims=(32, 32, 32), size=(1.0, 1.0, 1.0), trunc_dist=0.08)
    center, radius = (0.5, 0.5, 0.5), 0.25
    vol = sphere_volume(cfg, center, radius)
    pts, mask = tv.extract_cloud(vol, cfg, capacity=8192)
    pts, mask = np.asarray(pts), np.asarray(mask)
    assert mask.sum() > 500
    r = np.linalg.norm(pts[mask] - np.asarray(center), axis=-1)
    # FullScan6 interpolates between voxel CENTERS; allow one voxel tolerance
    assert np.abs(r - radius).max() < 0.04


def test_extract_normals_sphere():
    cfg = tv.TsdfConfig(dims=(32, 32, 32), size=(1.0, 1.0, 1.0), trunc_dist=0.08)
    center, radius = (0.5, 0.5, 0.5), 0.25
    vol = sphere_volume(cfg, center, radius)
    pts, mask = tv.extract_cloud(vol, cfg, capacity=8192)
    nrm = np.asarray(tv.extract_normals(vol, pts, cfg))
    pts, mask = np.asarray(pts), np.asarray(mask)
    ok = mask & ~np.isnan(nrm[:, 0])
    assert ok.sum() > 300
    outward = pts[ok] - np.asarray(center)
    outward /= np.linalg.norm(outward, axis=-1, keepdims=True)
    dots = np.sum(nrm[ok] * outward, axis=-1)
    assert (dots > 0.95).mean() > 0.95


def test_integrate_raycast_roundtrip_plane():
    cfg = tv.TsdfConfig(dims=(64, 64, 64), size=(1.0, 1.0, 1.0), trunc_dist=0.05,
                        raycast_step_factor=0.25, z_chunk=16)
    pose = (np.eye(3, dtype=np.float32), np.array([-0.5, -0.5, 0.1], np.float32))
    vol = tv.create(cfg, pose)
    dists = jnp.asarray(plane_dists(0.55))
    cam = se3.identity()
    vol = tv.integrate(vol, dists, cam, INTR, cfg)
    pts, nrm = tv.raycast(vol, cam, INTR, (24, 32), cfg)
    pts = np.asarray(pts)
    hit = ~np.isnan(pts[..., 0])
    assert hit.sum() > 200
    # surface should sit at z ~= 0.55 in camera frame
    z = pts[..., 2][hit]
    assert abs(np.median(z) - 0.55) < 0.01
    nrm = np.asarray(nrm)
    # plane normal faces the camera: n ~ (0, 0, -1)
    assert np.nanmedian(nrm[..., 2][hit]) < -0.95
