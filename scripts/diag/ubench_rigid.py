"""Per-stage wall times of the RIGID KinFu frame at 512-cube.

Reproduces the run_rigid_benchmark workload (translating camera, three
spheres), builds real engine state, then times each stage in isolation
with host-readback sync. Also times the integrate/raycast fast-path
variants so the dispatch cost of a near-identity-but-not-identity pose is
visible.

Usage: PYTHONPATH=.:~/.axon_site /opt/venv/bin/python scripts/ubench_rigid.py [dims]
"""
import dataclasses
import json
import sys
import time

import numpy as np

from dynfu_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

import jax.numpy as jnp
import jax.tree_util as jtu

from dynfu_tpu.core.camera import Intr
from dynfu_tpu.engine.kinfu import KinFu
from dynfu_tpu.engine.params import KinFuParams
from dynfu_tpu.io.datasets import sphere_depth
from dynfu_tpu.ops import imgproc
from dynfu_tpu.rigid import icp
from dynfu_tpu.utils.timers import sync
from dynfu_tpu.volume import tsdf as tv

dims = int(sys.argv[1]) if len(sys.argv) > 1 else 512
rows, cols = 480, 640
iters = 10

intr = Intr(525.0, 525.0, cols / 2 - 0.5, rows / 2 - 0.5)
params = dataclasses.replace(
    KinFuParams.default_params(), rows=rows, cols=cols, intr=intr,
    volume_dims=(dims,) * 3,
)
engine = KinFu(params)
cx, cy = intr.cx, intr.cy
scene = [((0.0, 0.0, 1.5), 0.5), ((0.55, 0.35, 1.6), 0.2),
         ((-0.5, -0.4, 1.7), 0.25)]


def frame(i):
    cam_t = np.asarray([0.002 * i, -0.001 * i, 0.003 * i])
    ds = []
    for c, r in scene:
        d = sphere_depth(tuple(np.asarray(c) - cam_t), r, rows, cols,
                         525.0, 525.0, cx, cy)
        ds.append(np.where(d == 0, np.iinfo(np.int32).max, d))
    out = np.stack(ds).min(axis=0)
    return np.where(out == np.iinfo(np.int32).max, 0, out).astype(np.int32)


for i in range(3):
    engine(frame(i))
sync(engine.prev_pyr[0][0])

pose = engine.poses[-1]
print(json.dumps({"aligned": engine._aligned(pose),
                  "angle_rad": engine._rotation_angle(pose)}), flush=True)

depth = jnp.asarray(frame(3), jnp.int32)
p = engine.params
config = engine.tsdf_config
stages = {}


def probe(out):
    return min(jtu.tree_leaves(out), key=lambda x: getattr(x, "size", 1 << 62))


def clock(name, fn):
    out = fn()
    sync(probe(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    sync(probe(out))
    stages[name] = round((time.perf_counter() - t0) / iters * 1e3, 2)
    print(json.dumps({name: stages[name]}), flush=True)
    return out


dists, curr_pyr = clock("preprocess_pyramid", lambda: engine._preprocess(depth))
clock("icp_stencil", lambda: icp.estimate_transform_stencil(
    curr_pyr, engine.prev_pyr, p.intr, iters=p.icp_iter_num,
    dist_thres=p.icp_dist_thres, angle_thres=p.icp_angle_thres,
    radii=p.icp_stencil_radii))
vol_c = clock("clear", lambda: tv.clear(engine.vol))
clock("integrate_separable_identity", lambda: tv.integrate_separable(
    vol_c, dists, engine.poses[0], p.intr, config))
clock("integrate_rotated_realpose", lambda: tv.integrate_rotated(
    vol_c, dists, pose, p.intr, config))
clock("raycast_separable_identity", lambda: tv.raycast_separable(
    engine.vol, engine.poses[0], p.intr, (p.rows, p.cols), config))
clock("raycast_rotated_realpose", lambda: tv.raycast_rotated(
    engine.vol, pose, p.intr, (p.rows, p.cols), config))
pts, nrm = engine.prev_pyr[0]
clock("resize_pyramid", lambda: imgproc.resize_points_normals(pts, nrm))


def full():
    engine(frame(4))
    return engine.prev_pyr[0][0]


out = full()
sync(out)
t0 = time.perf_counter()
for _ in range(iters):
    out = full()
sync(out)
stages["full_frame"] = round((time.perf_counter() - t0) / iters * 1e3, 2)

print(json.dumps({"metric": f"rigid_stage_ms_{dims}cube", "stages_ms": stages}),
      flush=True)
