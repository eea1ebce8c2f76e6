"""Depth preprocessing ops vs direct numpy transcriptions of the reference
kernel semantics (src/kfusion/cuda/imgproc.cu)."""

import numpy as np

import jax.numpy as jnp

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.ops import imgproc

RNG = np.random.RandomState(7)
INTR = Intr(525.0, 525.0, 320.0 - 0.5, 240.0 - 0.5)


def random_depth(h=32, w=40, holes=0.2):
    d = RNG.randint(400, 4000, size=(h, w)).astype(np.int32)
    d[RNG.rand(h, w) < holes] = 0
    return d


# --- numpy references (literal transcription of the CUDA loops) -------------


def ref_bilateral(src, ksz, sigma_spatial, sigma_depth_m):
    H, W = src.shape
    inv_sp = 0.5 / sigma_spatial**2
    inv_sd = 0.5 / (sigma_depth_m * 1000.0) ** 2
    out = np.zeros_like(src)
    for y in range(H):
        for x in range(W):
            value = float(src[y, x])
            tx = min(x - ksz // 2 + ksz, W - 1)
            ty = min(y - ksz // 2 + ksz, H - 1)
            s1 = s2 = 0.0
            for cy in range(max(y - ksz // 2, 0), ty):
                for cx in range(max(x - ksz // 2, 0), tx):
                    depth = float(src[cy, cx])
                    space2 = (x - cx) ** 2 + (y - cy) ** 2
                    color2 = (value - depth) ** 2
                    w = np.exp(-(space2 * inv_sp + color2 * inv_sd))
                    s1 += depth * w
                    s2 += w
            out[y, x] = np.rint(s1 / s2)
    return out


def ref_pyrdown(src, sigma_depth_m):
    H, W = src.shape
    Ho, Wo = H // 2, W // 2
    out = np.zeros((Ho, Wo), src.dtype)
    thresh = sigma_depth_m * 1000.0 * 3
    for y in range(Ho):
        for x in range(Wo):
            center = int(src[2 * y, 2 * x])
            tx = min(2 * x - 2 + 5, W - 1)
            ty = min(2 * y - 2 + 5, H - 1)
            s = cnt = 0
            for cy in range(max(0, 2 * y - 2), ty):
                for cx in range(max(0, 2 * x - 2), tx):
                    val = int(src[cy, cx])
                    if abs(val - center) < thresh:
                        s += val
                        cnt += 1
            out[y, x] = 0 if cnt == 0 else s // cnt
    return out


def ref_points_normals(depth, intr):
    H, W = depth.shape
    pts = np.full((H, W, 3), np.nan, np.float32)
    nrm = np.full((H, W, 3), np.nan, np.float32)

    def reproj(x, y, z):
        return np.array(
            [z * (x - intr.cx) / intr.fx, z * (y - intr.cy) / intr.fy, z], np.float32
        )

    for y in range(H - 1):
        for x in range(W - 1):
            z00 = depth[y, x] * 0.001
            z01 = depth[y, x + 1] * 0.001
            z10 = depth[y + 1, x] * 0.001
            if z00 * z01 * z10 != 0:
                v00 = reproj(x, y, z00)
                v01 = reproj(x + 1, y, z01)
                v10 = reproj(x, y + 1, z10)
                n = np.cross(v01 - v00, v10 - v00)
                n = n / np.linalg.norm(n)
                nrm[y, x] = -n
                pts[y, x] = v00
    return pts, nrm


# --- tests -------------------------------------------------------------------


def test_bilateral_matches_reference_loops():
    d = random_depth(24, 32)
    got = np.asarray(imgproc.bilateral_filter(jnp.asarray(d), 7, 4.5, 0.04))
    want = ref_bilateral(d, 7, 4.5, 0.04)
    # float accumulation order differs; allow 1 mm of rounding slack
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_truncate_depth():
    d = random_depth()
    got = np.asarray(imgproc.truncate_depth(jnp.asarray(d), 2.0))
    want = d.copy()
    want[d > 2000] = 0
    np.testing.assert_array_equal(got, want)


def test_pyramid_down_matches_reference_loops():
    d = random_depth(24, 32)
    got = np.asarray(imgproc.depth_pyramid_down(jnp.asarray(d), 0.04))
    want = ref_pyrdown(d, 0.04)
    np.testing.assert_array_equal(got, want)


def test_compute_dists():
    d = random_depth(16, 20)
    got = np.asarray(imgproc.compute_dists(jnp.asarray(d), INTR), np.float32)
    x = np.arange(20) - INTR.cx
    y = np.arange(16)[:, None] - INTR.cy
    lam = np.sqrt((x / INTR.fx) ** 2 + (y / INTR.fy) ** 2 + 1)
    want = (d * lam * 0.001).astype(np.float16).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)
    assert imgproc.compute_dists(jnp.asarray(d), INTR).dtype == jnp.float16


def test_points_normals_match_reference_loops():
    d = random_depth(16, 20)
    pts, nrm = imgproc.compute_points_normals(jnp.asarray(d), INTR)
    wpts, wnrm = ref_points_normals(d, INTR)
    np.testing.assert_allclose(np.asarray(pts), wpts, atol=1e-5, equal_nan=True)
    np.testing.assert_allclose(np.asarray(nrm), wnrm, atol=1e-4, equal_nan=True)


def test_normals_mask_depth_zeroes_invalid():
    d = random_depth(16, 20)
    masked, normals = imgproc.compute_normals_and_mask_depth(jnp.asarray(d), INTR)
    masked, normals = np.asarray(masked), np.asarray(normals)
    nanmask = np.isnan(normals[..., 0])
    assert (masked[nanmask] == 0).all()
    assert (masked[~nanmask] == d[~nanmask]).all()


def test_resize_depth_normals():
    d = random_depth(16, 20, holes=0.3)
    _, n = imgproc.compute_points_normals(jnp.asarray(d), INTR)
    dd, nd = imgproc.resize_depth_normals(jnp.asarray(d), n)
    dd, nd = np.asarray(dd), np.asarray(nd)
    n = np.asarray(n)
    for y in range(8):
        for x in range(10):
            q = d[2 * y : 2 * y + 2, 2 * x : 2 * x + 2].astype(np.int64)
            if q[0, 0] * q[0, 1] != 0 and q[1, 0] * q[1, 1] != 0:
                assert dd[y, x] == q.sum() // 4
                want_n = n[2 * y : 2 * y + 2, 2 * x : 2 * x + 2].sum((0, 1)) * 0.25
                np.testing.assert_allclose(nd[y, x], want_n, atol=1e-5, equal_nan=True)
            else:
                assert dd[y, x] == 0
                assert np.isnan(nd[y, x]).all()


def test_resize_points_normals():
    d = random_depth(16, 20, holes=0.3)
    p, n = imgproc.compute_points_normals(jnp.asarray(d), INTR)
    pd, nd = imgproc.resize_points_normals(p, n)
    p, n, pd, nd = map(np.asarray, (p, n, pd, nd))
    for y in range(8):
        for x in range(10):
            q = p[2 * y : 2 * y + 2, 2 * x : 2 * x + 2]
            if not np.isnan(q[..., 0]).any():
                np.testing.assert_allclose(pd[y, x], q.mean((0, 1)), atol=1e-5)
            else:
                assert np.isnan(pd[y, x]).all() and np.isnan(nd[y, x]).all()


def test_render_images_shapes_and_background():
    d = np.zeros((16, 20), np.int32)  # all invalid -> pure background
    _, n = imgproc.compute_points_normals(jnp.asarray(d), INTR)
    img = np.asarray(imgproc.render_image_depth(jnp.asarray(d), n, INTR, (0.0, 0.0, 0.0)))
    assert img.shape == (16, 20, 3) and img.dtype == np.uint8
    # background gradient: row 0 darker than last row (bgr1 -> bgr2)
    assert img[0].mean() < img[-1].mean()

    p = jnp.full((16, 20, 3), jnp.nan)
    img2 = np.asarray(imgproc.render_image_points(p, n, (0.0, 0.0, 0.0)))
    np.testing.assert_array_equal(img, img2)


def test_tangent_colors():
    n = np.zeros((4, 5, 3), np.float32)
    n[..., 2] = 1.0
    img = np.asarray(imgproc.render_tangent_colors(jnp.asarray(n)))
    # b = (5 - 3.5)*25.5 = 38, g = 127, r = 127
    assert (img[..., 0] == 38).all() and (img[..., 1] == 127).all() and (img[..., 2] == 127).all()


def test_merge_point_normal():
    c = RNG.rand(10, 3).astype(np.float32)
    n = RNG.rand(10, 3).astype(np.float32)
    out = np.asarray(imgproc.merge_point_normal(jnp.asarray(c), jnp.asarray(n)))
    np.testing.assert_allclose(out[:, :3], c)
    np.testing.assert_allclose(out[:, 3:], n)
